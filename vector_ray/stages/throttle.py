"""throttle transform — per-key rate limiting per time window.

Reference: src/transforms/throttle/transform.rs:22-67 (GCRA token
bucket of ``threshold`` events per ``window_secs`` per ``key_field``
bucket; ``exclude`` bypass; config throttle/config.rs:43-61).

Batch/event-time restatement: within each (key, window) bucket —
window = floor(ts / window_secs) — keep the first ``threshold`` events
in ``ts`` order; excluded events always pass.  This is the exact
steady-state admission count of the token bucket evaluated on event
time, which is the reproducible semantics for bounded inputs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_condition

WINDOW_COL = "__throttle_win"
EXCL_COL = "__throttle_excl"


def throttle(
    ds,
    threshold: int,
    window_secs: float,
    ts_field: str = "ts",
    key_field: Optional[str] = None,
    exclude=None,
    order_by: Optional[str] = None,
):
    excl = compile_condition(exclude) if exclude is not None else None
    order_by = order_by or ts_field

    def _annotate(batch: pa.Table) -> pa.Table:
        ts = batch[ts_field]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        # normalize to microseconds first (inputs may carry s/ms/ns units)
        secs = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy() / 1_000_000.0
        win = np.floor(secs / window_secs).astype(np.int64)
        batch = batch.append_column(WINDOW_COL, pa.array(win))
        if excl is not None:
            m = excl(batch)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            batch = batch.append_column(EXCL_COL, m)
        return batch

    annotated = ds.map_batches(_annotate, batch_format="pyarrow", batch_size=None)
    # partition by hash(key, window) % P: co-locates each (key, window)
    # bucket WITHOUT giving Ray one group per bucket (group count stays
    # fixed at P) and without putting a hot key's whole history in one
    # task (only one window's worth of a key lands together, modulo the
    # P-way spread).  Inside a partition the admission ranks are a
    # single vectorized pandas groupby-cumcount.
    from ..functions.hashes import default_partitions, ensure_columns, hash_columns

    keys = ([key_field] if key_field else []) + [WINDOW_COL]
    num_partitions = default_partitions()
    PART = "__throttle_part"

    def _part(batch: pa.Table) -> pa.Table:
        batch = ensure_columns(batch, keys)  # missing key field → null key
        h = hash_columns(batch, keys)
        return batch.append_column(
            PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    annotated = annotated.map_batches(_part, batch_format="pyarrow", batch_size=None)

    def _admit(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_by, kind="mergesort")
        if EXCL_COL in group.columns:
            excluded = group[group[EXCL_COL]]
            candidates = group[~group[EXCL_COL]]
        else:
            excluded = group.iloc[0:0]
            candidates = group
        rank = candidates.groupby(keys, sort=False).cumcount()
        admitted = candidates[rank < threshold]
        out = pd.concat([admitted, excluded]).sort_values(order_by, kind="mergesort")
        return out.drop(
            columns=[c for c in (WINDOW_COL, EXCL_COL, PART) if c in out.columns]
        )

    return annotated.groupby(PART).map_groups(_admit, batch_format="pandas")
