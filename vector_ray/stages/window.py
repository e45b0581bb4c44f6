"""window transform — sliding context buffer around trigger events.

Reference: src/transforms/window/transform.rs:50-96, config
window/config.rs:24-45.  Semantics: events pass through when
``forward_when`` matches; when ``flush_when`` matches, emit the last
``num_events_before`` buffered events, the trigger, and the next
``num_events_after`` events; everything else is dropped.

Order-dependent → per stream key (``group_by``), rows sorted by
``order_by``, the deque logic runs inside map_groups.  Partitioning
assumption: one key's rows fit one worker.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..expr import compile_condition


def window_stage(
    ds,
    flush_when,
    group_by: List[str],
    order_by: str,
    num_events_before: int = 5,
    num_events_after: int = 5,
    forward_when=None,
):
    flush = compile_condition(flush_when)
    forward = compile_condition(forward_when) if forward_when else None

    def _win(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        t = pa.Table.from_pandas(group, preserve_index=False)
        fmask = np.asarray(flush(t).to_numpy(zero_copy_only=False), dtype=bool)
        keep = np.zeros(len(group), dtype=bool)
        if forward is not None:
            keep |= np.asarray(forward(t).to_numpy(zero_copy_only=False), dtype=bool)
        idx = np.nonzero(fmask)[0]
        for i in idx:
            lo = max(0, i - num_events_before)
            hi = min(len(group), i + num_events_after + 1)
            keep[lo:hi] = True
        return group[keep]

    return ds.groupby(group_by).map_groups(_win, batch_format="pandas")
