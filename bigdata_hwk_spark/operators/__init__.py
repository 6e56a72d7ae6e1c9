from .outliers import (
    cell_stats,
    exact_outlier_counts,
    exact_outliers,
    exact_outliers_topk,
    mr_approx_outliers_summary,
    smallest_cells,
)

__all__ = [
    "cell_stats",
    "exact_outlier_counts",
    "exact_outliers",
    "exact_outliers_topk",
    "mr_approx_outliers_summary",
    "smallest_cells",
]
