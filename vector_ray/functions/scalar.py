"""Vectorized scalar-function library — the VRL-stdlib analog (§2.7).

The reference documents ~200 remap functions
(website/cue/reference/remap/functions/); this implements the
vectorizable core as pyarrow.compute kernels over Arrow columns, all
registered in ``FUNCTIONS`` so remap steps can call them by name:

    ("apply", out_col, "upcase", "msg")
    ("apply", out_col, "sha256", "payload")
    ("apply", out_col, "to_unix_timestamp", "ts")

Every function takes (column, *args) and returns an Arrow array of the
same length.  Hash/codec functions that have no Arrow kernel fall back
to a tight per-row loop over Python's hashlib/base64 — still one call
per row but C-backed; fine off the hot path, documented as such.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FUNCTIONS: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        FUNCTIONS[name] = fn
        return fn

    return deco


def call(name: str, col, *args):
    if name not in FUNCTIONS:
        raise ValueError(f"unknown function {name!r} (have {sorted(FUNCTIONS)})")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return FUNCTIONS[name](col, *args)


# ----------------------------------------------------------- strings

register("upcase")(lambda c: pc.utf8_upper(c))
register("downcase")(lambda c: pc.utf8_lower(c))
register("strip_whitespace")(lambda c: pc.utf8_trim_whitespace(c))
register("slice")(lambda c, start, stop=None: pc.utf8_slice_codeunits(c, start, stop))
register("replace")(
    lambda c, pat, rep: pc.replace_substring_regex(c, pattern=pat, replacement=rep)
)
register("truncate")(lambda c, n: pc.utf8_slice_codeunits(c, 0, n))
register("string_length")(lambda c: pc.utf8_length(c))
register("starts_with")(lambda c, p: pc.starts_with(c, pattern=p))
register("ends_with")(lambda c, p: pc.ends_with(c, pattern=p))
register("contains")(lambda c, p: pc.match_substring(c, p))
register("match")(lambda c, p: pc.match_substring_regex(c, p))
register("split")(lambda c, p: pc.split_pattern(c, pattern=p))
register("join")(lambda c, sep: pc.binary_join(c, sep))


@register("redact")
def _redact(c, pattern, replacement="[REDACTED]"):
    """redact() analog: mask regex matches."""
    return pc.replace_substring_regex(c, pattern=pattern, replacement=replacement)


# ----------------------------------------------------------- numeric

register("abs")(lambda c: pc.abs(c))
register("ceil")(lambda c: pc.ceil(c))
register("floor")(lambda c: pc.floor(c))
register("round")(lambda c, nd=0: pc.round(c, ndigits=nd))


@register("mod")
def _mod(c, m):
    return pa.array(c.cast(pa.int64()).to_numpy(zero_copy_only=False) % m)


# -------------------------------------------------------------- types

register("to_int")(lambda c: c.cast(pa.int64()))
register("to_float")(lambda c: c.cast(pa.float64()))
register("to_string")(lambda c: c.cast(pa.string()))
register("to_bool")(lambda c: c.cast(pa.bool_()))
register("is_null")(lambda c: pc.is_null(c))


@register("coalesce")
def _coalesce(c, default):
    return pc.fill_null(c, default)


# --------------------------------------------------------- timestamps

@register("to_unix_timestamp")
def _to_unix(c):
    return pc.divide(c.cast(pa.int64()), 1_000_000)  # us → s


@register("from_unix_timestamp")
def _from_unix(c):
    return pc.multiply(c.cast(pa.int64()), 1_000_000).cast(pa.timestamp("us"))


@register("format_timestamp")
def _format_ts(c, fmt="%Y-%m-%dT%H:%M:%S"):
    # cast to second resolution first: Arrow's %S appends the fractional
    # part for sub-second units
    return pc.strftime(c.cast(pa.timestamp("s")), format=fmt)


@register("parse_timestamp")
def _parse_ts(c, fmt="%Y-%m-%dT%H:%M:%S"):
    return pc.strptime(c, format=fmt, unit="us", error_is_null=True)


# ------------------------------------------------------ hashes/codecs

@register("encode_base64")
def _b64e(c):
    import base64

    return pa.array(
        [None if v is None else base64.b64encode(v.encode() if isinstance(v, str) else v).decode()
         for v in c.to_pylist()]
    )


@register("decode_base64")
def _b64d(c):
    import base64

    return pa.array([None if v is None else base64.b64decode(v).decode() for v in c.to_pylist()])


def _hashlib_fn(algo):
    import hashlib

    def _h(c):
        h = getattr(hashlib, algo)
        return pa.array(
            [None if v is None else h((v if isinstance(v, bytes) else str(v).encode())).hexdigest()
             for v in c.to_pylist()]
        )

    return _h


register("md5")(_hashlib_fn("md5"))
register("sha1")(_hashlib_fn("sha1"))
register("sha256")(_hashlib_fn("sha256"))
register("sha512")(_hashlib_fn("sha512"))


@register("xxhash64")
def _xx(c, seed=0):
    from .hashes import hash_string_column

    return pa.array(hash_string_column(c, seed=seed).view(np.int64))


# ---------------------------------------------------------------- ip

@register("ip_to_int")
def _ip_aton(c):
    """ip_aton analog, vectorized: dotted-quad → uint32 as int64."""
    parts = pc.split_pattern(c, pattern=".")
    flat = pc.list_flatten(parts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    if len(flat) != 4 * len(c):
        # fall back row-wise for malformed rows
        out = []
        for v in c.to_pylist():
            try:
                a, b_, cc, d = (int(x) for x in v.split("."))
                out.append((a << 24) | (b_ << 16) | (cc << 8) | d)
            except Exception:
                out.append(None)
        return pa.array(out, type=pa.int64())
    q = flat.reshape(-1, 4)
    return pa.array((q[:, 0] << 24) | (q[:, 1] << 16) | (q[:, 2] << 8) | q[:, 3])


@register("ip_cidr_contains")
def _cidr(c, cidr: str):
    """cidr_contains analog: membership of each IP in one CIDR block."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    base = int(net.network_address)
    mask = int(net.netmask)
    ips = _ip_aton(c).to_numpy(zero_copy_only=False)
    return pa.array((ips & mask) == base)


# ------------------------------------------------- compression / mac

@register("encode_gzip")
def _gzip_e(c):
    """VRL encode_gzip: bytes/string → gzip bytes (per-row codec; gzip
    has no vectorized kernel — codec functions are cold-path)."""
    import gzip

    return pa.array(
        [None if v is None else gzip.compress(v.encode() if isinstance(v, str) else v)
         for v in c.to_pylist()],
        type=pa.binary(),
    )


@register("decode_gzip")
def _gzip_d(c):
    import gzip

    return pa.array(
        [None if v is None else gzip.decompress(v).decode() for v in c.to_pylist()]
    )


@register("encode_zlib")
def _zlib_e(c):
    import zlib

    return pa.array(
        [None if v is None else zlib.compress(v.encode() if isinstance(v, str) else v)
         for v in c.to_pylist()],
        type=pa.binary(),
    )


@register("decode_zlib")
def _zlib_d(c):
    import zlib

    return pa.array(
        [None if v is None else zlib.decompress(v).decode() for v in c.to_pylist()]
    )


@register("hmac")
def _hmac(c, key, algorithm="sha256"):
    """VRL hmac(value, key, algorithm) → hex digest."""
    import hashlib
    import hmac as _hm

    k = key.encode() if isinstance(key, str) else key
    return pa.array(
        [None if v is None else _hm.new(
            k, (v if isinstance(v, bytes) else str(v).encode()),
            getattr(hashlib, algorithm)).hexdigest()
         for v in c.to_pylist()]
    )


# --------------------------------------------------- object functions

@register("merge_objects")
def _merge_objects(c, other, deep=False):
    """VRL merge(obj1, obj2): JSON-string columns → merged JSON string.
    ``other`` may be a JSON string literal or a second column."""
    import json

    right = (
        other.to_pylist()
        if hasattr(other, "to_pylist")
        else [other] * len(c)
    )

    def _merge(a, b):
        if not deep:
            return {**a, **b}
        out = dict(a)
        for k, v in b.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = _merge(out[k], v)
            else:
                out[k] = v
        return out

    out = []
    for l, r in zip(c.to_pylist(), right):
        if l is None:
            out.append(None)
            continue
        lo = json.loads(l) if isinstance(l, str) else l
        ro = json.loads(r) if isinstance(r, str) else (r or {})
        out.append(json.dumps(_merge(lo, ro), sort_keys=True))
    return pa.array(out)


@register("flatten_object")
def _flatten_object(c, separator="."):
    """VRL flatten(object): nested JSON string → dotted-key JSON string."""
    import json

    def _flat(obj, prefix=""):
        out = {}
        for k, v in obj.items():
            key = f"{prefix}{separator}{k}" if prefix else k
            if isinstance(v, dict):
                out.update(_flat(v, key))
            else:
                out[key] = v
        return out

    return pa.array(
        [None if v is None else json.dumps(_flat(json.loads(v) if isinstance(v, str) else v),
                                           sort_keys=True)
         for v in c.to_pylist()]
    )
