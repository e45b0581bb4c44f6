"""unnest — explode a list column into one row per element.

VRL's ``unnest(.events)`` analog (object fns gap named in VERDICT):
each row fans out to len(list) rows, scalar columns repeat.  Fully
vectorized per batch — ``list_flatten`` for the values and
``list_parent_indices`` + ``take`` for the scalars; rows with null or
empty lists drop (matching unnest semantics).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def unnest_batch(batch: pa.Table, column: str, out_col: str | None = None) -> pa.Table:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    cols = {}
    for name in batch.column_names:
        if name == column:
            cols[out_col or name] = flat
        else:
            c = batch[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[name] = c.take(parents)
    return pa.table(cols)


def unnest(ds, column: str, out_col: str | None = None, **kw):
    kw.setdefault("batch_size", None)
    return ds.map_batches(
        lambda b: unnest_batch(b, column, out_col), batch_format="pyarrow", **kw
    )
