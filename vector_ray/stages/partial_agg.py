"""Partial (combiner-style) grouped aggregation.

A bare ``ds.groupby(keys).aggregate(...)`` sort-shuffles every row.
For low-cardinality keys (metric series, route counters) the right
shape at 100 TB is: aggregate each batch locally with pyarrow's C++
``Table.group_by`` (map side), emit one tiny partial table per block,
then combine the partials — a shuffle of kilobytes instead of the
dataset.  This mirrors Vector's in-transform aggregation maps
(src/transforms/aggregate.rs state) re-expressed as map+combine.

Supported leaf aggregations: count, sum, min, max, mean (via sum+count).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import pandas as pd
import pyarrow as pa

# (column, fn, alias); fn in {"count","sum","min","max","mean"}
AggSpec = Tuple[str, str, str]


def grouped_aggregate(ds, keys: Sequence[str], aggs: Sequence[AggSpec], num_cpus=None,
                      combine_limit: int = 500_000):
    """Partial-aggregate per batch, then combine.

    The partials are ≤ (distinct keys per block) rows each.  When their
    total stays under ``combine_limit`` they are combined on the driver
    and a pandas DataFrame is returned (the counter / metric-series
    case).  Past the limit — someone handed this high-cardinality keys —
    the combine runs as a distributed ``groupby().aggregate()`` over the
    partials instead and a Ray ``Dataset`` is returned, so the driver
    never materializes the group table (cardinality-cliff guard).
    """
    keys = list(keys)
    # map-side plan: mean decomposes into sum+count; stdev into
    # sum + sum-of-squares + count (algebraic combine)
    leaf: List[Tuple[str, str]] = []
    sq_cols: List[str] = []
    for col, fn, _ in aggs:
        if fn == "mean":
            leaf.append((col, "sum"))
            leaf.append((col, "count"))
        elif fn == "stdev":
            leaf.append((col, "sum"))
            leaf.append((col, "count"))
            leaf.append((col + "__sq", "sum"))
            sq_cols.append(col)
        elif fn == "count":
            leaf.append((keys[0], "count"))
        else:
            leaf.append((col, fn))
    leaf = list(dict.fromkeys(leaf))
    sq_cols = list(dict.fromkeys(sq_cols))
    pa_aggs = [(c, f) for c, f in leaf]

    def _partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for col in sq_cols:
            v = batch[col]
            batch = batch.append_column(col + "__sq", pc.multiply(v, v))
        cols = keys + [c for c, _ in pa_aggs]
        return (
            batch.select(list(dict.fromkeys(cols)))
            .group_by(keys)
            .aggregate(pa_aggs)
        )

    kw = {"num_cpus": num_cpus} if num_cpus else {}
    partials_ds = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None, **kw
    ).materialize()
    if partials_ds.count() > combine_limit:
        return _distributed_combine(partials_ds, keys, aggs, leaf)
    partials = partials_ds.to_pandas()
    if partials.empty:
        return pd.DataFrame(columns=keys + [a for _, _, a in aggs])

    # combine: sum of counts/sums, min of mins, max of maxes
    combine = {}
    for c, f in leaf:
        col = f"{c}_{f}"
        combine[col] = "sum" if f in ("count", "sum") else f
    final = partials.groupby(keys, sort=True, dropna=False).agg(combine).reset_index()
    return _project(final, keys, aggs)


def as_dataset(res):
    """Uniform handle for a ``grouped_aggregate`` result: pandas (small
    combine) and Ray Dataset (distributed combine past combine_limit)
    both come back as a Dataset."""
    import ray.data as rd

    if isinstance(res, pd.DataFrame):
        return rd.from_pandas(res)
    return res


def map_result(res, pandas_fn):
    """Apply a vectorized pandas transform to a ``grouped_aggregate``
    result regardless of which side of the cardinality cliff it landed
    on: directly on the DataFrame, or per-batch on the Dataset."""
    if isinstance(res, pd.DataFrame):
        return pandas_fn(res)

    def _batch(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(pandas_fn(batch.to_pandas()), preserve_index=False)

    return res.map_batches(_batch, batch_format="pyarrow", batch_size=None)


def _project(final: pd.DataFrame, keys, aggs) -> pd.DataFrame:
    out = final[keys].copy()
    for col, fn, alias in aggs:
        if fn == "mean":
            out[alias] = final[f"{col}_sum"] / final[f"{col}_count"]
        elif fn == "stdev":
            import numpy as np

            n = final[f"{col}_count"]
            s = final[f"{col}_sum"]
            ss = final[f"{col}__sq_sum"]
            # POPULATION stdev (divide by n): aggregate.rs:296-313 sums
            # squared deviations over entries.len() — parity confirmed
            # by its absolute_stdev test (25..55 step 5 → exactly 10.0)
            var = (ss - s * s / n) / n
            out[alias] = np.sqrt(var.clip(lower=0.0))
        elif fn == "count":
            out[alias] = final[f"{keys[0]}_count"].astype("int64")
        else:
            out[alias] = final[f"{col}_{fn}"]
    return out


def _distributed_combine(partials_ds, keys, aggs, leaf):
    """High-cardinality path: combine the per-block partials with a
    distributed groupby (shuffles partial rows only, never raw rows) and
    project aliases per output block — returns a Ray Dataset."""
    from ray.data.aggregate import Max, Min, Sum

    ray_aggs = []
    for c, f in leaf:
        col = f"{c}_{f}"
        if f in ("count", "sum"):
            ray_aggs.append(Sum(col, alias_name=col))
        elif f == "min":
            ray_aggs.append(Min(col, alias_name=col))
        elif f == "max":
            ray_aggs.append(Max(col, alias_name=col))
        else:  # pragma: no cover - leaf only holds the four kinds above
            raise ValueError(f"unexpected partial leaf {f!r}")
    agged = partials_ds.groupby(list(keys)).aggregate(*ray_aggs)

    def _proj_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(_project(df, list(keys), aggs), preserve_index=False)

    return agged.map_batches(_proj_batch, batch_format="pyarrow", batch_size=None)
