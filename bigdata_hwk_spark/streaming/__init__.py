from .frequent_items import (
    ExactHistogram,
    ReservoirSample,
    StickySampling,
    StreamReport,
    replay_frequent_items,
    run_structured_stream,
)

__all__ = [
    "ExactHistogram",
    "ReservoirSample",
    "StickySampling",
    "StreamReport",
    "replay_frequent_items",
    "run_structured_stream",
]
