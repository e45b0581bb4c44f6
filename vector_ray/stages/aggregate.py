"""aggregate transform — windowed per-series metric aggregation.

Reference: src/transforms/aggregate.rs — every ``interval_ms`` flush
one aggregate per MetricSeries; modes Auto/Sum/Latest/Count/Diff/Max/
Min/Mean/Stdev (aggregate.rs:48-77), update logic :132-249.

Batch restatement on event time: window = floor(ts / interval);
group key = (name, namespace, tags, kind) — the canonical-tags string
reproduces MetricSeries equality.  Modes:

- Auto: incremental → Sum, absolute → Latest (aggregate.rs:134-152)
- Sum/Count/Max/Min/Mean/Stdev: Ray Data built-in aggregates
  (partial-per-block + final combine — no raw-row shuffle)
- Latest: last value in ts order per (series, window)
- Diff: Latest minus previous window's Latest per series

Output: one row per (series, window): (name, namespace, tags, kind,
window_start:timestamp, value:float64, count:int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SERIES_KEY = ["name", "namespace", "tags", "kind"]
WIN_COL = "window_start"

_BUILTIN = {"sum", "count", "max", "min", "mean", "stdev"}


def _window(ds, interval_ms: int, ts_field: str = "ts"):
    iv_us = int(interval_ms) * 1000

    def _w(batch: pa.Table) -> pa.Table:
        ts = batch[ts_field]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // iv_us) * iv_us
        return batch.append_column(WIN_COL, pa.array(win).cast(pa.timestamp("us")))

    return ds.map_batches(_w, batch_format="pyarrow")


def aggregate(ds, mode: str = "auto", interval_ms: int = 10_000, ts_field: str = "ts"):
    mode = mode.lower()
    windowed = _window(ds, interval_ms, ts_field)
    keys = SERIES_KEY + [WIN_COL]

    if mode in _BUILTIN:
        return _builtin(windowed, keys, mode)
    if mode == "latest":
        return _latest(windowed, keys, ts_field)
    if mode == "auto":
        # split by kind: incremental → sum, absolute → latest
        inc = windowed.filter(expr="kind == 'incremental'")
        ab = windowed.filter(expr="kind == 'absolute'")
        parts = []
        if inc.count() > 0:
            parts.append(_builtin(inc, keys, "sum"))
        if ab.count() > 0:
            parts.append(_latest(ab, keys, ts_field))
        if len(parts) == 1:
            return parts[0]
        return parts[0].union(parts[1])
    if mode == "diff":
        latest = _latest(windowed, keys, ts_field)

        def _diff(group: pd.DataFrame) -> pd.DataFrame:
            group = group.sort_values(WIN_COL, kind="mergesort")
            group["value"] = group["value"].diff()
            return group.dropna(subset=["value"])

        return latest.groupby(SERIES_KEY).map_groups(_diff, batch_format="pandas")
    raise ValueError(f"unknown aggregate mode {mode!r}")


def _builtin(ds, keys, mode):
    """Distributive/algebraic modes run as partial per-batch aggregation
    + tiny combine (stages/partial_agg) — series keys are
    low-cardinality, so no raw-row shuffle is ever needed."""
    import ray.data as rd

    from .partial_agg import grouped_aggregate

    if mode == "count":
        df = grouped_aggregate(ds, keys, [("value", "count", "count")])
        df["value"] = df["count"].astype("float64")
        return rd.from_pandas(df)
    df = grouped_aggregate(
        ds, keys, [("value", mode, "value"), ("value", "count", "count")]
    )
    return rd.from_pandas(df)


def _latest(ds, keys, ts_field):
    def _last(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(ts_field, kind="mergesort")
        last = group.iloc[[-1]]
        out = last[[c for c in keys]].copy()
        out["value"] = last["value"].values
        out["count"] = np.int64(len(group))
        return out

    return ds.groupby(keys).map_groups(_last, batch_format="pandas")
