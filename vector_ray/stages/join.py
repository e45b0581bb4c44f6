"""Large-large joins.

Vector itself has no join operator (enrichment tables cover the
small-side case — see enrich.py); a data-processing engine at 100 TB
needs one.  Two implementations:

- ``hash_join``: Ray Data's native ``Dataset.join`` (hash-partitioned;
  available in this Ray version) when it works in the current session,
- ``bucketed_join``: the portable explicit pattern from first
  principles — add ``bucket = hash(key) % B`` to both sides, tag the
  side, union, group by bucket, and pandas-merge the two sides inside
  each group.  B bounds per-task memory; skewed keys can be salted
  upstream (stages/salted.py) before bucketing.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashes import hash_columns

BUCKET_COL = "__join_bucket"
SIDE_COL = "__join_side"


def hash_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    how: str = "inner",
    num_partitions: int = 16,
):
    """Native Ray Data hash join with the bucketed fallback."""
    try:
        return left.join(
            right,
            join_type=how,
            num_partitions=num_partitions,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
        )
    except Exception:
        return bucketed_join(left, right, on, right_on=right_on, how=how,
                             num_buckets=num_partitions)


def bucketed_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    how: str = "inner",
    num_buckets: int = 16,
):
    """Explicit partitioned hash join: bucket both sides by key hash,
    co-group, merge per bucket with pandas."""
    on = list(on)
    right_on = list(right_on) if right_on else on

    def _tag(side: str, keys: List[str]):
        def _fn(batch: pa.Table) -> pa.Table:
            h = hash_columns(batch, keys)
            batch = batch.append_column(
                BUCKET_COL, pa.array((h % np.uint64(num_buckets)).view(np.int64))
            )
            return batch.append_column(SIDE_COL, pa.array([side] * batch.num_rows))

        return _fn

    lt = left.map_batches(_tag("l", on), batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(_tag("r", right_on), batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g[SIDE_COL] == "l"].drop(columns=[SIDE_COL, BUCKET_COL])
        r = g[g[SIDE_COL] == "r"].drop(columns=[SIDE_COL, BUCKET_COL])
        l = l.dropna(axis=1, how="all") if len(l) else l
        r = r.dropna(axis=1, how="all") if len(r) else r
        if len(l) == 0 or (len(r) == 0 and how == "inner"):
            return pd.DataFrame()
        out = l.merge(r, how=how, left_on=on, right_on=right_on,
                      suffixes=("", "_r"))
        return out

    return both.groupby(BUCKET_COL).map_groups(_merge, batch_format="pandas")
