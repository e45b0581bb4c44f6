"""top-k per group — "top N series by value per window" telemetry op.

Standard scale shape: per-batch LOCAL top-k (vectorized argpartition
inside map_batches — the combiner), then a groupby over the surviving
≤ k·blocks rows picks the global top-k per group.  The shuffle carries
only candidates, never the input.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def topk_per_group(ds, group_by: Sequence[str], value_col: str, k: int,
                   ascending: bool = False, tie_col: str | None = None):
    """Keep each group's top-``k`` rows by ``value_col`` (ties broken by
    ``tie_col`` ascending for determinism)."""
    group_by = list(group_by)

    def _local(batch: pa.Table) -> pa.Table:
        # rank on a PROJECTED frame (keys + value only) and take row
        # indices on the Arrow table — wide payload columns never cross
        # into pandas (same projection the aggregate path does)
        need = list(dict.fromkeys(group_by + [value_col] + ([tie_col] if tie_col else [])))
        df = batch.select(need).to_pandas()
        by = [value_col] + ([tie_col] if tie_col else [])
        asc = [ascending] + ([True] if tie_col else [])
        df["__i"] = np.arange(len(df))
        out = (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(group_by, sort=False, dropna=False)
            .head(k)
        )
        idx = np.sort(out["__i"].to_numpy())
        return batch.take(pa.array(idx))

    local = ds.map_batches(_local, batch_format="pyarrow", batch_size=None)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        by = [value_col] + ([tie_col] if tie_col else [])
        asc = [ascending] + ([True] if tie_col else [])
        return g.sort_values(by, ascending=asc, kind="mergesort").head(k)

    return local.groupby(group_by).map_groups(_merge, batch_format="pandas")
