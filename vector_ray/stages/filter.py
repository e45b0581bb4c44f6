"""filter transform — keep rows matching a condition.

Reference: src/transforms/filter.rs:19-29 (config), :88-97 (exec) —
stateless per-event predicate; here a vectorized mask per Arrow batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..expr import compile_condition


def filter_stage(ds, condition, **kw):
    """ds.map_batches(batch.filter(mask)) with a compiled condition."""
    cond = compile_condition(condition)

    def _filter(batch: pa.Table) -> pa.Table:
        m = cond(batch)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return batch.filter(m)

    kw.setdefault("batch_size", None)
    return ds.map_batches(_filter, batch_format="pyarrow", **kw)
