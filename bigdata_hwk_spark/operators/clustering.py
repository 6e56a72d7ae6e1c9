"""Grid-based density clustering over the 2-D point projection.

Extension surface (no reference counterpart, but the natural completion
of the reference's grid family): the outlier operators
(``operators/outliers.py``) use the cell grid to find points with FEW
neighbors; density clustering is the same grid asking the opposite
question — which contiguous regions are DENSE, and how do they group
into clusters. This is the cell-graph core of grid DBSCAN variants
(STING, Wang et al. 1997; CLIQUE, Agrawal et al. 1998; GriDBSCAN,
Mahran & Mahar 2008 — all public): a cell is *dense* when it holds at
least ``minpts`` points, and clusters are connected components of the
8-adjacency graph over dense cells.

Scale shape: the corpus is touched ONCE (one map-side-combined groupBy
to the non-empty-cell histogram — the same fold `cell_histogram` runs);
everything after operates on the dense-cell table, which is bounded by
area/side², orders of magnitude smaller than the points. Edges are
built without a theta join: each dense cell emits its 4 forward
neighbor offsets (plan-time literal array, codegen) and an equi-join on
the shifted (cx, cy) finds adjacent dense cells — each undirected edge
exactly once. Components use the shared
``dedup.connected_components`` (driver union-find under the gate,
large-star/small-star alternation above it — O(log n) rounds either
way). Cluster ids are min cell keys: deterministic under any
partitioning and identical in the oracle's recursive-CTE closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .outliers import with_cell

GRID_DBSCAN_SIDE = 2.0    # cell side in point units (ε-grid)
GRID_DBSCAN_MINPTS = 50   # dense-cell threshold
# cell key = cx * stride + cy: injective while |cy| < stride/2, and
# identical integer arithmetic in both engines
_KEY_STRIDE = 1 << 22

# forward half of the 8-neighborhood: each undirected adjacency is
# generated exactly once (the mirrored half would duplicate every edge)
_FORWARD_OFFSETS = ((0, 1), (1, -1), (1, 0), (1, 1))


def _cell_key(cx, cy):
    return (cx.cast("bigint") * _KEY_STRIDE + cy.cast("bigint")).alias("k")


def grid_dbscan_clusters(
    points: DataFrame,
    side: float = GRID_DBSCAN_SIDE,
    minpts: int = GRID_DBSCAN_MINPTS,
) -> DataFrame:
    """(cluster_id, n_cells, n_points): density clusters as connected
    components of 8-adjacent dense cells (count ≥ ``minpts`` per cell of
    ``side``); ``cluster_id`` = min cell key in the component; isolated
    dense cells form singleton clusters."""
    from ..session import persist_once
    from .dedup import connected_components

    dense = persist_once(
        with_cell(points, side)
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= minpts)
        .select(_cell_key(F.col("cx"), F.col("cy")), "cx", "cy", "c")
    )
    offsets = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di, dj in _FORWARD_OFFSETS
        ]
    )
    shifted = dense.select(
        F.col("k").alias("key_a"), F.explode(offsets).alias("o"), "cx", "cy"
    ).select(
        "key_a",
        (F.col("cx") + F.col("o.di")).alias("cx"),
        (F.col("cy") + F.col("o.dj")).alias("cy"),
    )
    edges = shifted.join(
        dense.select(F.col("k").alias("key_b"), "cx", "cy"), ["cx", "cy"]
    ).select("key_a", "key_b")
    comp = connected_components(edges, "key_a", "key_b")
    labeled = dense.join(
        comp.withColumnRenamed("node", "k"), "k", "left"
    ).select(
        F.coalesce(F.col("cluster_id"), F.col("k")).alias("cluster_id"),
        "c",
    )
    return labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("c").cast("bigint").alias("n_points"),
    )


def grid_dbscan_clusters_sql(
    points_body: str,
    side: float = GRID_DBSCAN_SIDE,
    minpts: int = GRID_DBSCAN_MINPTS,
) -> str:
    """Oracle: identical grid/key arithmetic; components by recursive-CTE
    transitive closure (min reachable key = cluster id) — O(component²)
    closure rows, fine at oracle SF, which is exactly why the engine side
    uses the star alternation instead."""
    return f"""
WITH RECURSIVE pts AS ({points_body}),
h AS (
  SELECT CAST(floor(x / {side!r}) AS INT) AS cx,
         CAST(floor(y / {side!r}) AS INT) AS cy,
         count(*) AS c
  FROM pts GROUP BY 1, 2),
d AS (
  SELECT CAST(cx AS BIGINT) * {_KEY_STRIDE} + cy AS k, cx, cy, c
  FROM h WHERE c >= {minpts}),
e AS (
  SELECT a.k AS u, b.k AS v
  FROM d a JOIN d b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND a.k <> b.k),
reach(u, v) AS (
  SELECT k, k FROM d
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
comp AS (SELECT u AS k, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(d.c) AS BIGINT) AS n_points
FROM comp JOIN d USING (k)
GROUP BY cluster_id
"""
