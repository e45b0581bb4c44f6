"""Large-large joins, semi-joins and anti-joins.

Vector itself has no join operator (enrichment tables cover the
small-side case — see enrich.py); a data-processing engine at 100 TB
needs one.  Implementations:

- ``hash_join``: Ray Data's native ``Dataset.join`` (hash-partitioned)
  with pandas-style join names mapped to the native ones; falls back to
  ``bucketed_join`` if native join construction fails (the fallback
  covers construction-time errors only — the native join is lazy, so
  execution-time failures surface at execution like any other stage).
- ``bucketed_join``: the portable explicit pattern from first
  principles — add ``bucket = hash(key) % B`` to both sides, tag the
  side, union, group by bucket, and pandas-merge the two sides inside
  each group.  B bounds per-task memory; skewed keys can be salted
  upstream (stages/salted.py) before bucketing.
- ``semi_join`` / ``anti_join``: keep / drop left rows whose key
  appears in a key set.  When the key set is small it is broadcast
  once (``ray.put``) and applied per batch with ``pc.is_in`` — the
  left side is never shuffled; past ``broadcast_limit`` keys they fall
  through to the partitioned join.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashes import default_pool, hash_columns

BUCKET_COL = "__join_bucket"
SIDE_COL = "__join_side"

# pandas-style name → Ray native Dataset.join name
_NATIVE_OF_HOW = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "outer": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}


def hash_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    how: str = "inner",
    num_partitions: Optional[int] = None,
):
    """Native Ray Data hash join with the bucketed fallback.

    The native join spawns ``num_partitions`` aggregator actors whose
    default CPU reservation is half the cluster; a pipeline with two
    chained joins then deadlocks on a small node.  We cap each join's
    aggregator budget at ~¼ of the cluster's CPUs so several joins and
    their map stages can run concurrently.

    NOTE: a list-typed non-key column is rejected by the native join at
    execution time — pack such payloads as FixedSizeBinary
    (functions/vectors.matrix_to_fixed_binary) before joining.
    """
    if how not in _NATIVE_OF_HOW:
        raise ValueError(f"unsupported join type {how!r}")
    total_cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    if num_partitions is None:
        num_partitions = max(2, min(16, total_cpus))
    agg_cpus = max(0.05, min(1.0, (total_cpus / 4) / num_partitions))
    try:
        return left.join(
            right,
            join_type=_NATIVE_OF_HOW[how],
            num_partitions=num_partitions,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
            aggregator_ray_remote_args={"num_cpus": agg_cpus},
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
    co-group, merge per bucket with pandas.

    Each side's column list is taken from the input datasets' schemas
    up front (never inferred from per-bucket null patterns), and right
    columns that collide with left names are renamed ``*_r`` before the
    union so block schemas stay disjoint and stable across buckets.
    """
    on = list(on)
    right_on = list(right_on) if right_on else on
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols_in = list(right_schema.names)
    # rename colliding non-key right columns up front
    rename = {
        c: f"{c}_r"
        for c in right_cols_in
        if c in left_cols and not (c in right_on and c in on and right_on.index(c) == on.index(c))
    }
    # a right key that shares its name AND position with the left key
    # keeps its name (pandas merges them into one column anyway)
    right_on_renamed = [rename.get(c, c) for c in right_on]
    right_cols = [rename.get(c, c) for c in right_cols_in]

    # one canonical union schema for BOTH sides: Ray's union + groupby
    # concatenates blocks, and sides with different column sets would
    # misalign — pad each side's missing columns with typed nulls
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        if t in (bytes, bytearray):
            return pa.binary()
        if t is str:
            return pa.string()
        try:
            return pa.from_numpy_dtype(t)
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    type_of = {}
    for name, t in zip(left_schema.names, left_schema.types):
        type_of[name] = _pa_type(t)
    for name, t in zip(right_schema.names, right_schema.types):
        type_of.setdefault(rename.get(name, name), _pa_type(t))
    union_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def _tag(side: str, keys: List[str], renames: dict):
        def _fn(batch: pa.Table) -> pa.Table:
            if renames:
                batch = batch.rename_columns([renames.get(c, c) for c in batch.column_names])
            h = hash_columns(batch, keys)
            cols = {
                c: (batch[c] if c in batch.column_names
                    else pa.nulls(batch.num_rows, type=type_of[c]))
                for c in union_cols
            }
            cols[BUCKET_COL] = pa.array((h % np.uint64(num_buckets)).view(np.int64))
            cols[SIDE_COL] = pa.array([side] * batch.num_rows)
            return pa.table(cols)

        return _fn

    lt = left.map_batches(_tag("l", on, {}), batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(
        _tag("r", right_on_renamed, rename), batch_format="pyarrow", batch_size=None
    )
    both = lt.union(rt)

    # per-bucket joins run as pyarrow's C++ hash join — exact type
    # preservation (no pandas float upcasts), native semi/anti, and
    # the same key-coalescing output shape as Ray's native join, so
    # the fallback and native paths agree
    _ARROW_OF_HOW = {
        "inner": "inner", "left": "left outer", "right": "right outer",
        "outer": "full outer", "semi": "left semi", "anti": "left anti",
    }
    if how == "right":
        out_cols = [c for c in left_cols if c not in on] + right_cols
    elif how in ("semi", "anti"):
        out_cols = left_cols
    else:
        out_cols = left_cols + [c for c in right_cols if c not in right_on_renamed]

    def _merge(t: pa.Table) -> pa.Table:
        side = t[SIDE_COL]
        l = t.filter(pc.equal(side, "l")).select(left_cols)
        r = t.filter(pc.equal(side, "r")).select(right_cols)
        out = l.join(r, keys=on, right_keys=right_on_renamed,
                     join_type=_ARROW_OF_HOW[how])
        return out.select(out_cols)

    return both.groupby(BUCKET_COL).map_groups(_merge, batch_format="pyarrow")


class _BroadcastKeyFilter:
    """Actor-pool batch filter against a broadcast key array (resolved
    once per actor in __init__; mask via ``pc.is_in`` per batch)."""

    def __init__(self, keys_ref, col: str, keep_matches: bool):
        self.keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.col = col
        self.keep = keep_matches

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[self.col], value_set=self.keys)
        m = pc.fill_null(m, False)
        if not self.keep:
            m = pc.invert(m)
        return batch.filter(m)


def _key_filter_join(left, keys_ds, on, keys_on, broadcast_limit, keep_matches):
    on = [on] if isinstance(on, str) else list(on)
    keys_on = on if keys_on is None else ([keys_on] if isinstance(keys_on, str) else list(keys_on))
    how = "semi" if keep_matches else "anti"
    if len(on) != 1:
        return hash_join(left, keys_ds, on=on, right_on=keys_on, how=how)
    keys = keys_ds.select_columns(keys_on).materialize()
    if keys.count() > broadcast_limit:
        return hash_join(left, keys, on=on, right_on=keys_on, how=how)
    blocks = [t for t in ray.get(keys.to_arrow_refs()) if t.num_columns > 0]
    if not blocks:
        return left if not keep_matches else left.limit(0)
    tbl = pa.concat_tables(blocks, promote_options="default")
    key_arr = pc.unique(tbl[keys_on[0]].combine_chunks())
    keys_ref = ray.put(key_arr)
    return left.map_batches(
        _BroadcastKeyFilter,
        fn_constructor_args=(keys_ref, on[0], keep_matches),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=default_pool(divisor=8),
    )


def semi_join(left, keys_ds, on, keys_on=None, broadcast_limit: int = 2_000_000):
    """Left rows whose key appears in ``keys_ds`` (broadcast filter when
    small, partitioned join past ``broadcast_limit`` keys)."""
    return _key_filter_join(left, keys_ds, on, keys_on, broadcast_limit, True)


def anti_join(left, keys_ds, on, keys_on=None, broadcast_limit: int = 2_000_000):
    """Left rows whose key does NOT appear in ``keys_ds``."""
    return _key_filter_join(left, keys_ds, on, keys_on, broadcast_limit, False)
