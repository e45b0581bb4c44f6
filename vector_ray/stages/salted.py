"""Salted-key aggregation for hot keys.

The token table's ``source`` column is deliberately skewed (web=60%).
A plain hash-partitioned groupby sends 60% of all rows to one reducer.
Salting splits each hot key into S sub-keys — ``(key, hash(row) % S)``
— aggregates the salted keys (S× more, each ≤ 1/S of the hot key's
rows), then de-salts with a second tiny aggregate.  Both layers use
distributive/algebraic functions only (count/sum/min/max, mean via
sum+count).

This composes with partial_agg.grouped_aggregate: that path already
collapses per-block before any exchange, which neutralizes skew for
low-cardinality keys; salted_groupby is for MEDIUM-cardinality keys
where per-block partials stay large and a real shuffle is needed.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashes import hash_numeric_column, hash_string_column

SALT_COL = "__salt"


def add_salt(ds, salt: int, salt_on: str = None):
    """Append a uniform salt column in [0, salt) derived from row content
    (salt_on column when given, else a per-batch counter — deterministic
    either way)."""

    def _salt(batch: pa.Table) -> pa.Table:
        if salt_on is not None:
            col = batch[salt_on]
            t = col.type
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                h = hash_string_column(col)
            else:
                h = hash_numeric_column(col)
            s = (h % np.uint64(salt)).astype(np.int64)
        else:
            s = np.arange(batch.num_rows, dtype=np.int64) % salt
        return batch.append_column(SALT_COL, pa.array(s))

    return ds.map_batches(_salt, batch_format="pyarrow", batch_size=None)


def salted_groupby_agg(
    ds,
    keys: Sequence[str],
    aggs: Sequence[Tuple[str, str, str]],
    salt: int = 16,
    salt_on: str = None,
) -> pd.DataFrame:
    """Two-level skew-safe aggregate: salted shuffle → de-salt combine.

    aggs: (column, fn, alias) with fn in {count, sum, min, max, mean}.
    """
    keys = list(keys)
    salted = add_salt(ds, salt, salt_on)

    # level 1: Ray groupby over (keys + salt) — hot keys split S ways
    from ray.data.aggregate import Count, Max, Min, Sum

    level1_aggs = []
    names = {}
    for col, fn, alias in aggs:
        if fn == "count":
            level1_aggs.append(Count(alias_name=f"{alias}__c"))
            names[alias] = ("count", f"{alias}__c")
        elif fn == "sum":
            level1_aggs.append(Sum(col, alias_name=f"{alias}__s"))
            names[alias] = ("sum", f"{alias}__s")
        elif fn == "min":
            level1_aggs.append(Min(col, alias_name=f"{alias}__m"))
            names[alias] = ("min", f"{alias}__m")
        elif fn == "max":
            level1_aggs.append(Max(col, alias_name=f"{alias}__x"))
            names[alias] = ("max", f"{alias}__x")
        elif fn == "mean":
            level1_aggs.append(Sum(col, alias_name=f"{alias}__s"))
            level1_aggs.append(Count(alias_name=f"{alias}__c"))
            names[alias] = ("mean", f"{alias}__s", f"{alias}__c")
        else:
            raise ValueError(f"unsupported agg {fn!r}")

    level1 = salted.groupby(keys + [SALT_COL]).aggregate(*level1_aggs)
    pdf = level1.to_pandas()

    # level 2 (tiny): combine the S salted rows per key on the driver
    combine = {}
    for alias, spec in names.items():
        if spec[0] in ("count", "sum"):
            combine[spec[1]] = "sum"
        elif spec[0] == "min":
            combine[spec[1]] = "min"
        elif spec[0] == "max":
            combine[spec[1]] = "max"
        else:  # mean
            combine[spec[1]] = "sum"
            combine[spec[2]] = "sum"
    final = pdf.groupby(keys, sort=True, dropna=False).agg(combine).reset_index()
    out = final[keys].copy()
    for alias, spec in names.items():
        if spec[0] == "mean":
            out[alias] = final[spec[1]] / final[spec[2]]
        else:
            out[alias] = final[spec[1]]
    return out
