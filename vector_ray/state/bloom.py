"""A small vectorized Bloom filter (numpy bit array, k derived hashes).

Used by tag_cardinality_limit's ``probabilistic`` mode — the analog of
the reference's bloom-backed value set
(src/transforms/tag_cardinality_limit/tag_value_set.rs:3-20), which
bounds per-tag-key memory when value cardinality is huge.  Membership
may report false positives (a new value judged "already accepted"),
never false negatives — the same trade-off as the reference.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashes import hash_string_column


def _string_array(values):
    """Normalize input to an Arrow string array without a per-row loop.

    Arrow arrays/chunked arrays are cast via the C++ kernel; only plain
    Python sequences fall back to str() per element.  add and contains
    must go through the SAME normalization so int/str tag values hash
    identically on both sides (the accepted set is added as Python
    values, the probe side arrives as Arrow columns)."""
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_string(values.type) or pa.types.is_large_string(values.type):
            return values
        return values.cast(pa.string())
    return pa.array(["" if v is None else str(v) for v in values], type=pa.string())


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        self.m = max(64, m)
        self.k = max(1, int(round(m / capacity * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing h1 + i*h2."""
        h1 = h
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add_array(self, values) -> None:
        h = hash_string_column(_string_array(values))
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))

    def contains_array(self, values) -> np.ndarray:
        h = hash_string_column(_string_array(values))
        pos = self._positions(h)
        word = self.bits[pos // 64]
        bit = (word >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return bit.all(axis=1).astype(bool)
