"""Tumbling / hopping (sliding) event-time window aggregation.

Beyond the reference's fixed-interval aggregate: rows are assigned to
every hopping window that contains them (size = m × slide) with a
vectorized per-batch expansion, then aggregated with the partial
combiner (stages/partial_agg) — no raw-row shuffle.  Tumbling windows
are the m=1 special case (equivalent to stages/aggregate's interval).

Ray-native shape: window assignment is a flat map (each row → m rows
with a ``window_start`` column) fused with the partial aggregate.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .partial_agg import grouped_aggregate

WIN_COL = "window_start"


def assign_hopping(batch: pa.Table, ts_field: str, size_ms: int, slide_ms: int) -> pa.Table:
    """Explode each row into one copy per containing hopping window."""
    if size_ms % slide_ms != 0:
        raise ValueError("size_ms must be a multiple of slide_ms")
    m = size_ms // slide_ms
    ts = batch[ts_field]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    us = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
    slide_us = slide_ms * 1000
    size_us = size_ms * 1000
    base = (us // slide_us) * slide_us  # latest window start containing the row
    n = batch.num_rows
    idx = np.repeat(np.arange(n, dtype=np.int64), m)
    offsets = np.tile(np.arange(m, dtype=np.int64) * slide_us, n)
    starts = base[idx] - offsets
    valid = starts >= 0
    out = batch.take(pa.array(idx[valid]))
    return out.append_column(
        WIN_COL, pa.array(starts[valid]).cast(pa.timestamp("us"))
    )


def hopping_agg(
    ds,
    keys: Sequence[str],
    aggs: Sequence[Tuple[str, str, str]],
    ts_field: str = "ts",
    size_ms: int = 60_000,
    slide_ms: int = 30_000,
    combine_limit: int = 500_000,
):
    """Hopping-window grouped aggregate → DataFrame of
    (keys..., window_start, aggs...) when the combine fits the driver;
    past ``combine_limit`` partial rows, a Ray Dataset of the same
    schema (grouped_aggregate's cardinality guard)."""
    exploded = ds.map_batches(
        lambda b: assign_hopping(b, ts_field, size_ms, slide_ms),
        batch_format="pyarrow",
        batch_size=None,
    )
    return grouped_aggregate(
        exploded, list(keys) + [WIN_COL], aggs, combine_limit=combine_limit
    )


def tumbling_agg(ds, keys, aggs, ts_field: str = "ts", size_ms: int = 60_000):
    return hopping_agg(ds, keys, aggs, ts_field, size_ms, size_ms)
