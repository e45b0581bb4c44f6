"""Distribution / histogram / summary metric payloads, columnar-first.

Reference semantics: lib/vector-core/src/event/metric/value.rs:20-87
(MetricValue::Distribution {samples}, ::AggregatedHistogram {buckets,
count, sum}, ::AggregatedSummary {quantiles, count, sum}) and the
aggregate transform's incremental merge (src/transforms/aggregate.rs).

The columnar restatement keeps distributions in LONG form — one row per
(series, window, sample_value) with a summed ``sample_rate`` — which is
the shape every downstream Arrow kernel (and the DuckDB oracle) can
operate on directly.  The nested ``list<struct>`` payload the reference
carries per event is produced only at the sink edge (``nest_samples``).

- distribution_agg: merge single-sample distribution metrics per
  (series, window): identical sample values collapse, rates sum —
  partial per-batch aggregation, no raw-row shuffle.
- aggregated_histogram: long samples → per-window bucket counts for a
  fixed ascending ``limits`` vector (+inf bucket implicit), plus
  per-window count/sum — MetricValue::AggregatedHistogram in long form.
- aggregated_summary: long samples → per-window quantile values
  (linear interpolation over rate-expanded samples) —
  MetricValue::AggregatedSummary in long form.
- nest_samples / nest_buckets: long → list<struct> payload columns.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import SERIES_KEY, WIN_COL, _window
from .partial_agg import as_dataset, grouped_aggregate, map_result


def distribution_agg(ds, interval_ms: int = 10_000, ts_field: str = "ts",
                     combine_limit: int = 500_000):
    """Merge distribution-typed metric rows into per-(series, window)
    long-form samples: (name, namespace, tags, kind, window_start,
    sample_value, sample_rate).

    The group key includes the raw sample value, so partial cardinality
    tracks row count — grouped_aggregate's distributed-combine guard
    WILL trigger at scale, and the rename/cast below must work on both
    the small-path DataFrame and the guarded-path Dataset (map_result)."""

    windowed = _window(ds, interval_ms, ts_field)
    keys = SERIES_KEY + [WIN_COL, "value"]
    res = grouped_aggregate(
        windowed, keys, [("sample_rate", "sum", "sample_rate")],
        combine_limit=combine_limit,
    )

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"value": "sample_value"})
        df["sample_rate"] = df["sample_rate"].astype("int64")
        return df

    return as_dataset(map_result(res, _fin))


def aggregated_histogram(long_ds, limits: Sequence[float], combine_limit: int = 500_000):
    """Long-form samples → per-window histogram buckets.

    Bucket i counts samples with value ≤ limits[i] (non-cumulative,
    first matching bucket — the reference's bucket layout); values
    above the last limit land in the +inf bucket (upper = +inf).
    Output long form: one row per (series, window, bucket_upper) with
    bucket_count, plus per-window total count and sum columns.
    """
    import ray.data as rd

    lim = np.asarray(sorted(limits), dtype=np.float64)

    def _bucketize(batch: pa.Table) -> pa.Table:
        v = batch["sample_value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lim, vals, side="left")
        upper = np.where(idx < len(lim), lim[np.clip(idx, 0, len(lim) - 1)], np.inf)
        r = batch["sample_rate"]
        if isinstance(r, pa.ChunkedArray):
            r = r.combine_chunks()
        rates = r.cast(pa.float64()).to_numpy(zero_copy_only=False)
        return batch.append_column("bucket_upper", pa.array(upper)).append_column(
            "weighted", pa.array(vals * rates)
        )

    bucketed = long_ds.map_batches(_bucketize, batch_format="pyarrow", batch_size=None)
    keys = SERIES_KEY + [WIN_COL, "bucket_upper"]
    res = grouped_aggregate(
        bucketed,
        keys,
        [("sample_rate", "sum", "bucket_count"), ("weighted", "sum", "bucket_sum")],
        combine_limit=combine_limit,
    )

    def _totals(df: pd.DataFrame) -> pd.DataFrame:
        # per-window totals (count, sum) alongside each bucket row —
        # vectorized, works on the whole table or any window-complete
        # partition of it
        df = df.copy()
        df["bucket_count"] = df["bucket_count"].astype("int64")
        totals = df.groupby(SERIES_KEY + [WIN_COL], dropna=False).agg(
            count=("bucket_count", "sum"), sum=("bucket_sum", "sum")
        ).reset_index()
        return df.drop(columns=["bucket_sum"]).merge(totals, on=SERIES_KEY + [WIN_COL])

    if isinstance(res, pd.DataFrame):
        return rd.from_pandas(_totals(res))
    # distributed-combine path: the totals need every bucket row of a
    # (series, window) co-located.  Hash the window key into a FIXED
    # number of partitions (the throttle pattern — group count stays P,
    # not one Ray group per window) and run the vectorized totals+merge
    # inside each partition.
    from ..functions.hashes import hash_columns

    PART = "__hist_part"
    from ..functions.hashes import default_partitions

    num_partitions = default_partitions()
    wkeys = SERIES_KEY + [WIN_COL]

    def _part(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch, wkeys)
        return batch.append_column(
            PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    def _tot_group(g: pd.DataFrame) -> pd.DataFrame:
        return _totals(g.drop(columns=[PART]))

    parted = res.map_batches(_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby(PART).map_groups(_tot_group, batch_format="pandas")


def aggregated_summary(long_ds, quantiles: Sequence[float] = (0.5, 0.9, 0.99)):
    """Long-form samples → per-window quantiles (linear interpolation
    over rate-expanded sample values) + count + sum."""
    qs = list(quantiles)

    def _summary(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.repeat(g["sample_value"].to_numpy(), g["sample_rate"].to_numpy())
        base = {k: g[k].iloc[0] for k in SERIES_KEY + [WIN_COL]}
        rows = []
        for q in qs:
            rows.append(
                {**base, "quantile": q, "qvalue": float(np.quantile(vals, q)),
                 "count": int(len(vals)), "sum": float(vals.sum())}
            )
        return pd.DataFrame(rows)

    return long_ds.groupby(SERIES_KEY + [WIN_COL]).map_groups(
        _summary, batch_format="pandas"
    )


def nest_samples(long_ds, value_col: str = "sample_value", rate_col: str = "sample_rate",
                 payload_col: str = "samples"):
    """Long form → one row per (series, window) carrying the nested
    ``list<struct<value, rate>>`` payload (sink-edge shape, matching
    MetricValue::Distribution).  Offsets are built vectorized from the
    sorted group runs — no per-row Python."""

    def _nest(g: pd.DataFrame) -> pd.DataFrame:
        keys = SERIES_KEY + [WIN_COL]
        g = g.sort_values(keys + [value_col], kind="mergesort")
        grp = g.groupby(keys, sort=False, dropna=False)
        sizes = grp.size().to_numpy()
        heads = grp.head(1)[keys].reset_index(drop=True)
        offsets = np.zeros(len(sizes) + 1, dtype=np.int32)
        np.cumsum(sizes, out=offsets[1:])
        struct = pa.StructArray.from_arrays(
            [
                pa.array(g[value_col].to_numpy(), type=pa.float64()),
                pa.array(g[rate_col].to_numpy(), type=pa.int64()),
            ],
            names=["value", "rate"],
        )
        payload = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
        out = pa.Table.from_pandas(heads, preserve_index=False).append_column(
            payload_col, payload
        )
        return out.to_pandas()

    # one Ray group per series (windows nest inside, vectorized)
    return long_ds.groupby(SERIES_KEY).map_groups(_nest, batch_format="pandas")
