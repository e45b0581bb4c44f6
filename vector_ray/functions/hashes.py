"""Vectorized 64-bit hashing over Arrow columns.

Vector hashes with seahash for sample/dedupe key identity (reference
src/transforms/sample/transform.rs:144-227, dedupe key hashing).  We
need the same *properties* — deterministic, uniform, cheap, stable
across processes — not the same bits.  Primary implementation is
polars' vectorized xxhash-based ``hash`` (seeded, stable within the
pinned polars version); fallback is a numpy FNV-1a over the raw bytes.

All hashes return uint64 numpy arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:
    import polars as pl

    _HAS_POLARS = True
except Exception:  # pragma: no cover
    _HAS_POLARS = False

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    if isinstance(col, pa.Array):
        return col
    return pa.array(col)


def hash_string_column(col, seed: int = 0) -> np.ndarray:
    """uint64 hash per row of a string/binary Arrow column."""
    arr = _as_array(col)
    if _HAS_POLARS:
        s = pl.Series("x", arr)
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    return _fnv_strings(arr, seed)


def _fnv_strings(arr: pa.Array, seed: int) -> np.ndarray:  # pragma: no cover
    """Pure-numpy FNV-1a over variable-length bytes (fallback path)."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    else:
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    out = np.full(len(arr), _FNV_OFFSET ^ np.uint64(seed), dtype=np.uint64)
    lengths = np.diff(off)
    maxlen = lengths.max() if len(lengths) else 0
    for k in range(int(maxlen)):
        active = lengths > k
        idx = off[:-1][active] + k
        out[active] = ((out[active] ^ data[idx].astype(np.uint64)) * _FNV_PRIME) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
    return out


def hash_numeric_column(col, seed: int = 0) -> np.ndarray:
    """uint64 mix of a numeric column (splitmix64 finalizer)."""
    arr = _as_array(col)
    x = np.asarray(arr.cast(pa.int64()).to_numpy(zero_copy_only=False)).astype(np.uint64)
    x ^= np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def hash_columns(batch: pa.Table, columns: list[str], seed: int = 0) -> np.ndarray:
    """Combined uint64 hash of a tuple of columns (order-sensitive).

    Mirrors dedupe's typed cache key — the type id is implied by the
    column's Arrow type, which is fixed per column, so hashing values is
    sufficient (reference src/transforms/dedupe/transform.rs:47-66 mixes
    a type id because VRL values are dynamically typed; Arrow columns
    are not).  Null hashes to a distinct constant.
    """
    out = np.full(batch.num_rows, np.uint64(seed) ^ _FNV_OFFSET, dtype=np.uint64)
    for c in columns:
        col = batch[c]
        t = col.type
        if pa.types.is_null(t):
            # all-null key column (ensure_columns fill): constant hash,
            # overwritten by the null sentinel below
            h = np.zeros(batch.num_rows, dtype=np.uint64)
        elif pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            h = hash_string_column(col, seed)
        elif pa.types.is_timestamp(t):
            h = hash_numeric_column(col.cast(pa.int64()), seed)
        elif pa.types.is_floating(t):
            arr = _as_array(col)
            bits = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64).view(np.uint64)
            h = hash_numeric_column(pa.array(bits.view(np.int64)), seed)
        else:
            h = hash_numeric_column(col, seed)
        nulls = np.asarray(_as_array(col).is_null())
        if nulls.any():
            h = np.where(nulls, np.uint64(0x9E3779B97F4A7C15) ^ np.uint64(seed), h)
        # boost-style hash_combine
        out ^= (h + np.uint64(0x9E3779B97F4A7C15) + (out << np.uint64(6)) + (out >> np.uint64(2))) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
    return out


def ensure_columns(batch: pa.Table, columns: list[str]) -> pa.Table:
    """Append all-null string columns for key fields a block lacks.

    Heterogeneous inputs (from_items, mixed JSON) produce blocks with
    differing schemas; the reference keys missing fields as None (e.g.
    reduce's group-by discriminant, dedupe match fields), so a missing
    key column participates as nulls rather than erroring.  The column
    is null-TYPED (not string) so Ray can unify it with blocks where
    the field exists under any concrete type."""
    for c in columns:
        if c not in batch.column_names:
            batch = batch.append_column(c, pa.nulls(batch.num_rows))
    return batch


def default_partitions(floor: int = 32, cap: int = 1024) -> int:
    """Default hash-partition count for group-keyed stages.

    A fixed 32 caps a stage's phase-2 parallelism at 32 tasks — fine on
    one node, a 256-node cluster would idle.  Scale with the cluster:
    2 tasks per CPU, floored at 32 (partition overhead is trivial) and
    capped at 1024 (each partition is one sort group; millions of tiny
    groups would swamp the shuffle)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(floor, min(cap, cpus * 2)) if cpus else floor


def default_pool(divisor: int = 8, floor: int = 2, cap: int = 512) -> tuple:
    """Autoscaling actor-pool bounds ``(1, N)`` for stateful
    ``map_batches`` stages.

    A hardcoded ``(1, 2)`` pool is right on a 4-physical-core sandbox
    but caps the stage at 2 actors on a 256-node cluster.  N scales
    with the cluster — ``cluster CPUs // divisor`` clamped to
    ``[floor, cap]`` — so heavy stages (model-ish actors, verify
    passes) take a proportional slice while leaving CPUs for the
    fused read/transform stages (a pool reserving every CPU starves
    the upstream read).  The autoscaling lower bound of 1 means idle
    pools release their slots.  ``VECTOR_RAY_POOL_MAX`` overrides N
    for a deployment."""
    import os

    env = os.environ.get("VECTOR_RAY_POOL_MAX")
    if env:
        return (1, max(1, int(env)))
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    n = max(floor, min(cap, cpus // divisor)) if cpus else floor
    return (1, max(1, n))
