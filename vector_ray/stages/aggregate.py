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
        us = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
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
        # single pass: kind is part of the series key, so incremental
        # series sum and absolute series take-latest in ONE partial
        # aggregate (sum + last-by-ts computed together per group)
        import ray.data as rd

        df = _partial_sum_and_last(windowed, keys, ts_field)
        inc = df["kind"] == "incremental"
        df = df.copy()
        df.loc[~inc, "value"] = df.loc[~inc, "last_value"]
        df.loc[inc, "value"] = df.loc[inc, "sum_value"]
        return rd.from_pandas(df.drop(columns=["sum_value", "last_value", "last_ts"]))
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


def _partial_sum_and_last(ds, keys, ts_field) -> pd.DataFrame:
    """One partial pass computing, per group: sum(value), count, and the
    value at max ts (last).  Per batch: pandas sort+groupby tail; the
    driver combine re-reduces partials the same way (mergeable because
    max-ts-of-maxes = global max ts)."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + ["value", ts_field]).to_pandas()
        df = df.sort_values(ts_field, kind="mergesort")
        g = df.groupby(keys, sort=False, dropna=False)
        out = g.agg(
            sum_value=("value", "sum"),
            count=("value", "count"),
            last_value=("value", "last"),
            last_ts=(ts_field, "last"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None).to_pandas()
    if partials.empty:
        return partials
    partials = partials.sort_values("last_ts", kind="mergesort")
    g = partials.groupby(keys, sort=True, dropna=False)
    return g.agg(
        sum_value=("sum_value", "sum"),
        count=("count", "sum"),
        last_value=("last_value", "last"),
        last_ts=("last_ts", "last"),
    ).reset_index()


def _latest_df(ds, keys, ts_field) -> pd.DataFrame:
    df = _partial_sum_and_last(ds, keys, ts_field)
    if df.empty:
        return df
    df = df.copy()
    df["value"] = df["last_value"]
    return df.drop(columns=["sum_value", "last_value", "last_ts"])


def _latest(ds, keys, ts_field):
    import ray.data as rd

    return rd.from_pandas(_latest_df(ds, keys, ts_field))
