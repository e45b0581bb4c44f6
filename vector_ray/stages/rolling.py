"""Rolling (count-based sliding) aggregates per key.

``rolling_agg`` appends, for every row, an aggregate over the last
``window_n`` rows of its key (ordered by ``order_by``) — the batch
restatement of a per-key sliding window (SQL frame ``ROWS BETWEEN n-1
PRECEDING AND CURRENT ROW``).

Scale shape: one shuffle by key hash into a FIXED number of
partitions; inside each partition the per-key rolling computation is a
single vectorized pandas ``groupby(...).rolling(...)`` (C kernels) —
group count stays bounded regardless of key cardinality.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashes import default_partitions, ensure_columns, hash_columns

_PART = "__roll_part"

# (value_col, fn, alias); fn in {"sum", "mean", "min", "max", "count"}
RollSpec = Tuple[str, str, str]


def rolling_agg(ds, group_by: Sequence[str], specs: Sequence[RollSpec],
                window_n: int, order_by: str, num_partitions: int = 0):
    group_by = list(group_by)
    specs = list(specs)
    num_partitions = num_partitions or default_partitions()

    def _part(batch: pa.Table) -> pa.Table:
        batch = ensure_columns(batch, group_by)  # missing group field → null key
        h = hash_columns(batch, group_by)
        return batch.append_column(
            _PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow", batch_size=None)

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group_by + [order_by], kind="mergesort")
        g = df.groupby(group_by, sort=False, dropna=False)
        for col, fn, alias in specs:
            r = g[col].rolling(window_n, min_periods=1)
            df[alias] = getattr(r, fn)().to_numpy()
        return df.drop(columns=[_PART])

    return parted.groupby(_PART).map_groups(_roll, batch_format="pandas")
