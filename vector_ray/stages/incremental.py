"""incremental_to_absolute — running-sum normalization of counters.

Reference: src/transforms/incremental_to_absolute.rs:14-40 +
MetricSet::make_absolute — per MetricSeries, incremental values add
into the series' cached absolute value and emit as absolute; an
ABSOLUTE metric passes through unchanged AND resets the cache (so
inc 10, abs 100, inc 10 → 10, 100, 110 — the reference test matrix at
incremental_to_absolute.rs:139-230).

Ray mapping (round-3 shape): hash(series) % num_partitions fixed
partitions — NOT one Ray group per series — with the reset-aware
running sum computed vectorized inside each partition: segments are
delimited by absolute rows (cumsum of the absolute flag), and each
row's output is segment-head absolute value + cumsum of incremental
values within the segment.  No per-key Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SERIES_KEY = ["name", "namespace", "tags"]

_PART = "__i2a_part"


def incremental_to_absolute(ds, ts_field: str = "ts", num_partitions: int = 0):
    from ..functions.hashes import default_partitions, ensure_columns, hash_columns

    num_partitions = num_partitions or default_partitions()

    def _part(batch: pa.Table) -> pa.Table:
        batch = ensure_columns(batch, SERIES_KEY)
        h = hash_columns(batch, SERIES_KEY)
        return batch.append_column(
            _PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    def _absolute(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            SERIES_KEY + [ts_field], kind="mergesort"
        ).reset_index(drop=True)
        is_abs = (part["kind"] == "absolute").to_numpy()
        sid = part.groupby(SERIES_KEY, sort=False, dropna=False).ngroup().to_numpy()
        # segment = run of rows from one absolute row (inclusive) to the
        # next; seg 0 = rows before the series' first absolute row
        seg = pd.Series(is_abs.astype(np.int64)).groupby(sid).cumsum().to_numpy()
        val = part["value"].to_numpy(dtype=np.float64)
        inc_val = np.where(is_abs, 0.0, val)
        keys = [sid, seg]
        csum = pd.Series(inc_val).groupby(keys).cumsum().to_numpy()
        head_abs = pd.Series(np.where(is_abs, val, np.nan)).groupby(keys)
        base = head_abs.transform("first").to_numpy()
        out = np.where(np.isnan(base), 0.0, base) + csum
        part = part.drop(columns=[_PART])
        part["value"] = out
        part["kind"] = "absolute"
        return part

    return (
        ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
        .groupby(_PART)
        .map_groups(_absolute, batch_format="pandas")
    )
