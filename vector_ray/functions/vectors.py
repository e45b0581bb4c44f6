"""Zero-copy access to Arrow list columns as numpy matrices.

Embedding / signature columns are ``list<float>`` / ``list<int64>``
with a constant per-row length.  The generic path
(``to_pylist()`` + ``np.stack``) copies every element through Python
objects; at 100 TB that is the difference between a memcpy and hours.
These helpers reinterpret the flat Arrow values buffer directly:

- fixed_size_list: values buffer reshaped (n, d) — zero copy.
- list/large_list with uniform stride: validated via the offsets
  buffer, then the same reshape — zero copy.
- ragged lists: explicit error (callers that allow ragged data must
  handle it themselves; silently densifying would corrupt rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NP_OF_ARROW = {
    pa.float32(): np.float32,
    pa.float64(): np.float64,
    pa.int64(): np.int64,
    pa.int32(): np.int32,
    pa.uint64(): np.uint64,
    pa.uint32(): np.uint32,
    pa.int16(): np.int16,
    pa.int8(): np.int8,
}


def _combined(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def list_to_matrix(col, dtype=None) -> np.ndarray:
    """View a constant-length Arrow list column as an (n, d) matrix.

    Zero-copy when possible (no nulls, uniform stride); the only copy
    is an optional dtype cast requested by the caller.
    """
    arr = _combined(col)
    if isinstance(arr.type, pa.ExtensionType):
        # e.g. Ray's ArrowTensorType — unwrap to the storage list array
        arr = arr.storage
    if arr.null_count:
        raise ValueError("list_to_matrix: column has null rows")
    t = arr.type
    if pa.types.is_fixed_size_list(t):
        d = t.list_size
        values = arr.values
        flat = _values_as_numpy(values)
        # arr.values already accounts for the parent offset in pyarrow's
        # FixedSizeListArray.values? It does NOT slice by parent offset —
        # handle explicitly.
        start = arr.offset * d
        flat = flat[start : start + len(arr) * d]
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        odtype = np.int64 if pa.types.is_large_list(t) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odtype)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        lens = np.diff(off)
        if len(lens) == 0:
            return np.empty((0, 0), dtype=dtype or np.float32)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("list_to_matrix: ragged list column")
        flat = _values_as_numpy(arr.values)[off[0] : off[0] + len(arr) * d]
    else:
        raise TypeError(f"list_to_matrix: not a list type: {t}")
    m = flat.reshape(len(arr), d)
    if dtype is not None and m.dtype != dtype:
        m = m.astype(dtype)
    return m


def _values_as_numpy(values: pa.Array) -> np.ndarray:
    npdt = _NP_OF_ARROW.get(values.type)
    if npdt is None:
        raise TypeError(f"list_to_matrix: unsupported value type {values.type}")
    buf = values.buffers()[1]
    return np.frombuffer(buf, dtype=npdt)[values.offset : values.offset + len(values)]


def matrix_to_list(m: np.ndarray, value_type: pa.DataType | None = None) -> pa.Array:
    """Build an Arrow list array from an (n, d) matrix without a Python
    row loop (FixedSizeList over the flat buffer)."""
    n, d = m.shape
    flat = pa.array(np.ascontiguousarray(m).reshape(-1))
    if value_type is not None:
        flat = flat.cast(value_type)
    return pa.FixedSizeListArray.from_arrays(flat, d)


def matrix_to_fixed_binary(m: np.ndarray) -> pa.Array:
    """Pack an (n, d) matrix into a FixedSizeBinary(d·itemsize) column —
    the layout that survives Ray's native hash join (list columns are
    rejected as non-key join fields; binary passes through)."""
    m = np.ascontiguousarray(m)
    width = m.shape[1] * m.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), m.shape[0], [None, pa.py_buffer(m.reshape(-1))]
    )


def fixed_binary_to_matrix(col, dtype) -> np.ndarray:
    """Inverse of matrix_to_fixed_binary: zero-copy (n, d) view.

    Accepts FixedSizeBinary, or plain binary with uniform payload width
    (what a pandas round-trip through a join fallback produces)."""
    arr = _combined(col)
    if arr.null_count:
        raise ValueError("fixed_binary_to_matrix: column has null rows")
    itemsize = np.dtype(dtype).itemsize
    if pa.types.is_fixed_size_binary(arr.type):
        d = arr.type.byte_width // itemsize
        flat = np.frombuffer(arr.buffers()[1], dtype=dtype)
        start = arr.offset * d
        return flat[start : start + len(arr) * d].reshape(len(arr), d)
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        lens = np.diff(off)
        if len(lens) == 0:
            return np.empty((0, 0), dtype=dtype)
        if not (lens == lens[0]).all():
            raise ValueError("fixed_binary_to_matrix: ragged binary column")
        d = int(lens[0]) // itemsize
        flat = np.frombuffer(arr.buffers()[2], dtype=dtype)
        return flat[off[0] // itemsize : off[0] // itemsize + len(arr) * d].reshape(
            len(arr), d
        )
    raise TypeError(f"fixed_binary_to_matrix: unsupported type {arr.type}")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array, fully vectorized
    (byte-view + unpackbits; no Python ``bin()`` per value)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return (
        np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )
