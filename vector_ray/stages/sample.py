"""sample transform — rate / ratio sampling, hash-consistent or counted.

Reference: src/transforms/sample/transform.rs:56-91 (modes), :144-227
(exec); config sample/config.rs:52-94.  Semantics reproduced:

- ``rate`` mode with ``key_field``: consistent hashing — keep when
  ``hash(key) % rate == 0`` (seahash in the reference; our stable
  64-bit hash here — same property, different bits).
- ``ratio`` mode with ``key_field``: keep when
  ``hash(key) <= ratio * u64::MAX``.
- count mode (no key_field, ``rate``): keep every rate-th event per
  ``group_by`` key — order-dependent; distributed version defines
  order by ``order_by`` inside a per-key map_groups.
- ``exclude`` condition: matching events bypass sampling (always kept).
- kept rows get a ``sample_rate`` column (transform.rs:212-220).

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


def sample_hash(
    ds,
    key_field: str,
    rate: Optional[int] = None,
    ratio: Optional[float] = None,
    exclude=None,
    seed: int = 0,
    hash_fn: str = "stable",
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
            keep = (h % np.uint64(rate)) == 0
        else:
            keep = h.astype(np.float64) <= ratio * U64_MAX
        if excl is not None:
            m = excl(batch)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            keep = keep | np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
        out = batch.filter(pa.array(keep))
        return out.append_column("sample_rate", pa.array(np.full(out.num_rows, sample_rate)))

    return ds.map_batches(_sample, batch_format="pyarrow")


def sample_count(ds, rate: int, group_by: Optional[str] = None, order_by: str = None):
    """Count-based 1-in-rate sampling per group_by key.

    Order within a key is defined by ``order_by`` (required for
    determinism in a distributed run); keeps rows 0, rate, 2·rate…
    of each key's ordered stream — transform.rs:171-189 semantics.
    """
    if order_by is None:
        raise ValueError("order_by is required for deterministic count-based sampling")

    def _take(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_by, kind="mergesort")
        out = group.iloc[::rate].copy()
        out["sample_rate"] = float(rate)
        return out

    if group_by is None:
        # single global stream: one group — only sensible for small data
        ds = ds.map_batches(
            lambda b: b.append_column("__g", pa.array(np.zeros(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
        )
        return ds.groupby("__g").map_groups(_take, batch_format="pandas").drop_columns(["__g"])
    return ds.groupby(group_by).map_groups(_take, batch_format="pandas")
