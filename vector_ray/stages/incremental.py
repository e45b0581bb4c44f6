"""incremental_to_absolute — running-sum normalization of counters.

Reference: src/transforms/incremental_to_absolute.rs:14-40 — per
MetricSeries, incremental values become a running sum emitted as
absolute; absolute metrics pass through.

Ray mapping: groupby(series).map_groups(cumsum by ts).  Partitioning
assumption: one series' rows fit one worker (true — a series is a
single metric's history).
"""

from __future__ import annotations

import pandas as pd

SERIES_KEY = ["name", "namespace", "tags"]


def incremental_to_absolute(ds, ts_field: str = "ts"):
    def _cumsum(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(ts_field, kind="mergesort")
        inc = group["kind"] == "incremental"
        group = group.copy()
        group.loc[inc, "value"] = group.loc[inc, "value"].cumsum()
        group["kind"] = "absolute"
        return group

    return ds.groupby(SERIES_KEY).map_groups(_cumsum, batch_format="pandas")
