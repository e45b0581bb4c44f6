"""Transform stages — one module per Vector transform (SURVEY.md §2.1)."""

from .aggregate import aggregate, aggregate_sequenced
from .dedupe import LRUDedupe, dedupe_exact, dedupe_windowed
from .filter import filter_stage
from .incremental import incremental_to_absolute
from .log_to_metric import LogToMetric, log_to_metric, metric_to_log
from .reduce import reduce_stage
from .remap import Remap, remap, remap_vrl, remap_with_drops
from .route import (
    UNMATCHED,
    exclusive_route,
    exclusive_route_tagged,
    route,
    route_tagged,
)
from .sample import sample_count, sample_hash
from .tag_cardinality import tag_cardinality_limit
from .throttle import throttle
from .window import window_stage

__all__ = [
    "aggregate",
    "aggregate_sequenced",
    "LRUDedupe",
    "dedupe_exact",
    "dedupe_windowed",
    "filter_stage",
    "incremental_to_absolute",
    "LogToMetric",
    "log_to_metric",
    "metric_to_log",
    "reduce_stage",
    "Remap",
    "remap",
    "remap_vrl",
    "remap_with_drops",
    "UNMATCHED",
    "exclusive_route",
    "exclusive_route_tagged",
    "route",
    "route_tagged",
    "sample_count",
    "sample_hash",
    "tag_cardinality_limit",
    "throttle",
    "window_stage",
]
