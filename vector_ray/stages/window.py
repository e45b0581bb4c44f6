"""window transform — sliding context buffer around trigger events.

Reference: src/transforms/window/transform.rs:50-96, config
window/config.rs:24-45.  Semantics: events pass through when
``forward_when`` matches; when ``flush_when`` matches, emit the last
``num_events_before`` buffered events, the trigger, and the next
``num_events_after`` events; everything else is dropped.

Ray mapping (round 3): rows are hash-bucketed by ``group_by`` into a
FIXED number of partitions (the throttle pattern — Ray group count
stays P regardless of key cardinality), each partition is sorted by
(key, order_by), and the context windows for ALL keys in the partition
are marked in one vectorized pass: trigger indices → per-run-clamped
[lo, hi) ranges → a difference array → cumsum > 0.  No per-key Ray
group, no per-trigger Python slice assignment over big ranges.

Reference-parity notes (transform.rs:50-96): forwarded events pass
through without occupying buffer/after slots, and forward wins over
flush.  DOCUMENTED DEVIATION: the batch restatement is an interval
cover — a row inside a LATER trigger's before-window is kept even if
the streaming automaton had already discarded it while draining a
nearby earlier trigger's after-counter (closely-spaced triggers).  The
interval semantics are the order-insensitive, restartable ones a batch
engine can honor deterministically.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..expr import compile_condition

_PART = "__window_part"


def window_stage(
    ds,
    flush_when,
    group_by: List[str],
    order_by: str,
    num_events_before: int = 5,
    num_events_after: int = 5,
    forward_when=None,
    num_partitions: int = 0,
):
    flush = compile_condition(flush_when)
    forward = compile_condition(forward_when) if forward_when else None

    from ..functions.hashes import default_partitions, ensure_columns, hash_columns

    num_partitions = num_partitions or default_partitions()

    def _part(batch: pa.Table) -> pa.Table:
        batch = ensure_columns(batch, group_by)  # missing group field → null key
        h = hash_columns(batch, group_by)
        return batch.append_column(
            _PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    def _win(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(group_by + [order_by], kind="mergesort").reset_index(
            drop=True
        )
        n = len(part)
        t = pa.Table.from_pandas(part, preserve_index=False)
        fmask = np.asarray(flush(t).to_numpy(zero_copy_only=False), dtype=bool)
        keep = np.zeros(n, dtype=bool)
        fwd = np.zeros(n, dtype=bool)
        if forward is not None:
            fwd = np.asarray(forward(t).to_numpy(zero_copy_only=False), dtype=bool)
            keep |= fwd
            # forward takes precedence: a forwarded event neither
            # triggers a window nor occupies buffer/after slots
            # (transform.rs:70-75 checks `pass` before `flush`)
            fmask &= ~fwd
        # context windows are counted over NON-forwarded rows only, so
        # drop to that coordinate space before marking ranges
        sub = np.nonzero(~fwd)[0]
        m = len(sub)
        krun_all = part.groupby(group_by, sort=False, dropna=False).ngroup().to_numpy()
        krun = krun_all[sub] if m else krun_all
        idx = np.arange(m, dtype=np.int64)
        change = np.ones(m, dtype=bool)
        if m > 1:
            change[1:] = krun[1:] != krun[:-1]
        run_start = np.maximum.accumulate(np.where(change, idx, 0))
        starts_idx = np.nonzero(change)[0]
        run_end_ex = np.repeat(
            np.append(starts_idx[1:], m), np.diff(np.append(starts_idx, m))
        ) if m else idx
        trig = np.nonzero(fmask[sub])[0] if m else np.empty(0, dtype=np.int64)
        lo = np.maximum(run_start[trig], trig - num_events_before)
        hi = np.minimum(run_end_ex[trig], trig + num_events_after + 1)
        delta = np.zeros(m + 1, dtype=np.int64)
        np.add.at(delta, lo, 1)
        np.add.at(delta, hi, -1)
        keep[sub] |= np.cumsum(delta[:-1]) > 0
        return part[keep].drop(columns=[_PART])

    parted = ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby(_PART).map_groups(_win, batch_format="pandas")
