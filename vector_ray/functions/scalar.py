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


class VrlRegex(str):
    """A regex-typed pattern value (VRL ``r'…'`` literals).  Pattern
    arguments dispatch on it: a plain string matches LITERALLY, a
    VrlRegex engages the regex kernels + capture-reference handling —
    the reference's string-vs-regex semantics (replace.cue etc.)."""


def register(name: str):
    def deco(fn):
        FUNCTIONS[name] = fn
        return fn

    return deco


class VrlJsonScalar(pa.ExtensionScalar):
    def as_py(self):
        import json as _json

        v = self.value.as_py() if self.value is not None else None
        return None if v is None else _json.loads(v)


class VrlJsonType(pa.ExtensionType):
    """Tagged JSON-string element: the columnar fallback for VRL's
    heterogeneous arrays (``["a", 1, true]``).  Storage is a JSON
    string per element; ``as_py()`` decodes, so ``to_pylist()`` on a
    ``list<vector_ray.json>`` column transparently yields the original
    mixed Python values — every per-row list function keeps working."""

    def __init__(self):
        super().__init__(pa.string(), "vector_ray.json")

    def __arrow_ext_serialize__(self):
        return b""

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        return cls()

    def __arrow_ext_scalar_class__(self):
        return VrlJsonScalar


VRL_JSON = VrlJsonType()
try:
    pa.register_extension_type(VRL_JSON)
except pa.ArrowKeyError:
    pass


def mixed_json_array(values) -> pa.Array:
    """Python values → vector_ray.json extension array (None stays
    null)."""
    import json as _json

    storage = pa.array(
        [None if v is None else _json.dumps(v, default=str) for v in values],
        type=pa.string(),
    )
    return pa.ExtensionArray.from_storage(VRL_JSON, storage)


def is_vrl_json(t) -> bool:
    return isinstance(t, VrlJsonType)


def obj_array(rows):
    """Rows of python dicts/lists → a typed Arrow array (struct/list)
    when the shape is uniform, else a JSON-string column.  The typed
    form matches the reference's object returns; the JSON fallback
    keeps heterogeneous rows representable in a column."""
    try:
        return pa.array(rows)
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        import json as _json

        if all(r is None or isinstance(r, list) for r in rows):
            # rows are lists with heterogeneous elements → keep them
            # real lists via the tagged-JSON element type (decodes
            # back through as_py), not stringified rows
            # offsets[i] = start of row i (null marks row i null),
            # final entry = total element count
            offsets, flat, pos = [], [], 0
            for r in rows:
                offsets.append(None if r is None else pos)
                if r is not None:
                    flat.extend(r)
                    pos += len(r)
            offsets.append(pos)
            return pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), mixed_json_array(flat)
            )
        return pa.array(
            [None if r is None else _json.dumps(r, sort_keys=True) for r in rows],
            type=pa.string(),
        )


def call(name: str, col, *args, **kwargs):
    if name not in FUNCTIONS:
        raise ValueError(f"unknown function {name!r} (have {sorted(FUNCTIONS)})")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return FUNCTIONS[name](col, *args, **kwargs)


# ----------------------------------------------------------- strings

register("upcase")(lambda c: pc.utf8_upper(c))
register("downcase")(lambda c: pc.utf8_lower(c))
register("strip_whitespace")(lambda c: pc.utf8_trim_whitespace(c))
register("slice")(lambda c, start, end=None: pc.utf8_slice_codeunits(c, start, end))


@register("replace")
def _replace(c, pat, rep, count=-1):
    """replace(value, pattern, with, count) — count<0 = all
    (replace.cue).  A plain-string pattern replaces LITERALLY with the
    replacement verbatim; a ``VrlRegex`` pattern engages the regex
    kernel with ``$0``/``$name``/``$1`` capture references translated
    to RE2's ``\\N`` form (``$$`` escapes a dollar).  A per-row
    pattern column replaces literally row by row."""
    mr = None if count is None or count < 0 else int(count)
    if isinstance(pat, (pa.Array, pa.ChunkedArray)):
        # per-row literal patterns: no Arrow kernel
        out = [
            None if (v is None or p is None)
            else (v.replace(p, rep) if mr is None else v.replace(p, rep, mr))
            for v, p in zip(c.to_pylist(), pat.to_pylist())
        ]
        return pa.array(out, type=pa.string())
    if not isinstance(pat, VrlRegex):
        return pc.replace_substring(
            c, pattern=pat, replacement=rep, max_replacements=mr,
        )
    if isinstance(rep, str) and "$" in rep:
        import re as _re

        gidx, ngroups = {}, None
        try:
            compiled = _re.compile(pat)
            gidx, ngroups = compiled.groupindex, compiled.groups
        except _re.error:
            pass  # RE2-only syntax: still translate positional refs

        def _ref(m):
            name = m.group(1) or m.group(2)
            if name.isdigit():
                # $0 = whole match; out-of-range $N substitutes EMPTY
                # like the reference's Rust regex (RE2 would reject the
                # whole rewrite and error every row)
                if ngroups is not None and int(name) > ngroups:
                    return ""
                return "\\" + name
            if name in gidx:
                return "\\" + str(gidx[name])
            return m.group(0)

        rep = _re.sub(r"\$(?:(\w+)|\{(\w+)\})", _ref,
                      rep.replace("$$", "\x00"))
        rep = rep.replace("\x00", "$")
    return pc.replace_substring_regex(
        c, pattern=str(pat), replacement=rep, max_replacements=mr,
    )


@register("truncate")
def _truncate(c, limit, ellipsis=False, suffix=None):
    """truncate(value, limit, suffix) — appends suffix only to rows
    that were actually truncated (truncate.cue); ellipsis=True is the
    deprecated "..." spelling."""
    cut = pc.utf8_slice_codeunits(c, 0, limit)
    tail = suffix if suffix is not None else ("..." if ellipsis else "")
    if not tail:
        return cut
    was_cut = pc.greater(pc.utf8_length(c), limit)
    return pc.if_else(was_cut, pc.binary_join_element_wise(cut, tail, ""), cut)


register("string_length")(lambda c: pc.utf8_length(c))


def _cased(c, p, case_sensitive):
    if case_sensitive:
        return c, p
    return pc.utf8_lower(c), p.lower()


@register("starts_with")
def _starts_with(c, p, case_sensitive=True):
    c, p = _cased(c, p, case_sensitive)
    return pc.starts_with(c, pattern=p)


@register("ends_with")
def _ends_with(c, p, case_sensitive=True):
    c, p = _cased(c, p, case_sensitive)
    return pc.ends_with(c, pattern=p)


@register("contains")
def _contains(c, p, case_sensitive=True):
    c, p = _cased(c, p, case_sensitive)
    return pc.match_substring(c, p)


register("match")(lambda c, p: pc.match_substring_regex(c, p))


@register("split")
def _split(c, p, limit=None):
    """split(value, pattern, limit) — limit = max number of
    substrings returned (split.cue).  Plain-string patterns split
    LITERALLY; ``VrlRegex`` patterns split by regex; per-row pattern
    columns split literally row by row."""
    ms = None if limit is None else max(int(limit) - 1, 0)
    if isinstance(p, (pa.Array, pa.ChunkedArray)):
        def _one_split(v, pv):
            if not pv:
                return list(v)  # empty separator: between characters
            return v.split(pv) if ms is None else v.split(pv, ms)

        out = [
            None if (v is None or pv is None) else _one_split(v, pv)
            for v, pv in zip(c.to_pylist(), p.to_pylist())
        ]
        return pa.array(out, type=pa.list_(pa.string()))
    kernel = pc.split_pattern_regex if isinstance(p, VrlRegex) else pc.split_pattern
    if ms is None:
        return kernel(c, pattern=str(p))
    return kernel(c, pattern=str(p), max_splits=ms)


register("join")(lambda c, separator="": pc.binary_join(c, separator))


@register("find")
def _find(c, pattern, from_=0):
    """find(value, pattern, from) — byte index of the first match at
    or after ``from``, -1 when absent (find.cue).  Plain strings match
    literally; ``VrlRegex`` matches by regex; per-row pattern columns
    match literally."""
    import re as _re

    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if isinstance(pattern, (pa.Array, pa.ChunkedArray)):
        return pa.array(
            [None if (v is None or p is None) else v.find(p, int(from_))
             for v, p in zip(c.to_pylist(), pattern.to_pylist())],
            type=pa.int64(),
        )
    rx = _re.compile(
        pattern if isinstance(pattern, VrlRegex) else _re.escape(pattern)
    )

    def _one(s):
        m = rx.search(s, int(from_))
        return -1 if m is None else m.start()

    return pa.array(
        [None if v is None else _one(v) for v in c.to_pylist()], type=pa.int64()
    )


# named redact filters (redact.cue filter enum; patterns are the
# well-known public formats)
_REDACT_NAMED = {
    "us_social_security_number": r"\b\d{3}-?\d{2}-?\d{4}\b",
    "credit_card": r"\b(?:\d[ -]*?){13,16}\b",
}


@register("redact")
def _redact(c, pattern=None, replacement="[REDACTED]", redactor=None, *,
            filters=None):
    """redact(value, filters, redactor) — filters is a regex, a named
    filter, or a list of either; redactor "full" (default) masks with
    [REDACTED], {"type": "text", "replacement": …} customizes it,
    "sha2"/"sha3" replace matches with their hash (redact.cue).
    String values only in the columnar model."""
    if filters is not None:
        pattern = filters
    filters = pattern if isinstance(pattern, (list, tuple)) else [pattern]
    patterns = [_REDACT_NAMED.get(f, f) for f in filters]
    if redactor is None and isinstance(replacement, (dict, str)) \
            and replacement not in ("[REDACTED]",):
        # third positional may be the redactor spec per the cue order
        if isinstance(replacement, dict) or replacement in ("full", "sha2", "sha3"):
            redactor, replacement = replacement, "[REDACTED]"
    variant = encoding = None
    if isinstance(redactor, dict):
        replacement = redactor.get("replacement", "[REDACTED]")
        variant = redactor.get("variant")
        encoding = redactor.get("encoding", "base64")
        redactor = redactor.get("type", "text")
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if pa.types.is_struct(c.type):
        # object input (redact.cue ex. 2): redact every string field
        kids = []
        for f in c.type:
            kid = c.field(f.name)
            if pa.types.is_string(kid.type):
                kid = _redact(kid, pattern, replacement, redactor)
            kids.append(kid)
        return pa.StructArray.from_arrays(kids, names=[f.name for f in c.type])
    if redactor in ("sha2", "sha3"):
        # defaults per redact.cue: sha2 → SHA-512/256, sha3 → SHA3-512,
        # base64 output; {"variant": …, "encoding": "base16"} overrides
        import base64
        import hashlib
        import re as _re

        name = (variant or ("SHA-512/256" if redactor == "sha2" else "SHA3-512"))
        _hname = {
            "SHA-224": "sha224", "SHA-256": "sha256", "SHA-384": "sha384",
            "SHA-512": "sha512", "SHA-512/224": "sha512_224",
            "SHA-512/256": "sha512_256", "SHA3-224": "sha3_224",
            "SHA3-256": "sha3_256", "SHA3-384": "sha3_384",
            "SHA3-512": "sha3_512",
        }[name]

        def _digest(b):
            d = hashlib.new(_hname, b).digest()
            if encoding == "base16":
                return d.hex()
            return base64.b64encode(d).decode()

        rxs = [_re.compile(p) for p in patterns]

        def _one(v):
            for rx in rxs:
                v = rx.sub(lambda m: _digest(m.group(0).encode()), v)
            return v

        return pa.array(
            [None if v is None else _one(v) for v in c.to_pylist()],
            type=pa.string(),
        )
    for p in patterns:
        c = pc.replace_substring_regex(c, pattern=p, replacement=replacement)
    return c


# ----------------------------------------------------------- numeric

register("abs")(lambda c: pc.abs(c))


def _f64_and_mask(c):
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    c = c.cast(pa.float64())
    mask = pc.is_null(c).to_numpy(zero_copy_only=False)
    return c.to_numpy(zero_copy_only=False), mask


def _scaled(c, precision, kernel):
    """ceil/floor with decimal precision (ceil.cue/floor.cue): scale,
    round off binary representation error (4.345*100=434.49999…),
    apply, unscale."""
    x, mask = _f64_and_mask(c)
    f = 10.0 ** int(precision)
    x9 = np.round(x * f, 9)
    return pa.array(kernel(x9) / f, mask=mask)


register("ceil")(lambda c, precision=0: _scaled(c, precision, np.ceil))
register("floor")(lambda c, precision=0: _scaled(c, precision, np.floor))


@register("round")
def _round(c, precision=0):
    """round(value, precision) — half away from zero like Rust
    f64::round (round.cue: round(4.345, 2) == 4.35), NOT numpy/Arrow
    banker's rounding."""
    x, mask = _f64_and_mask(c)
    f = 10.0 ** int(precision)
    x9 = np.round(x * f, 9)
    out = np.sign(x9) * np.floor(np.abs(x9) + 0.5) / f
    return pa.array(out, mask=mask)


@register("mod")
def _mod(c, m):
    return pa.array(c.cast(pa.int64()).to_numpy(zero_copy_only=False) % m)


# -------------------------------------------------------------- types

@register("to_int")
def _to_int(c):
    """to_int.cue: timestamps coerce to whole epoch seconds."""
    if pa.types.is_timestamp(c.type):
        return pc.divide(c.cast(pa.timestamp("us")).cast(pa.int64()), 1_000_000)
    return c.cast(pa.int64())


@register("to_float")
def _to_float(c):
    """to_float.cue: timestamps coerce to fractional epoch seconds."""
    if pa.types.is_timestamp(c.type):
        us = c.cast(pa.timestamp("us")).cast(pa.int64())
        return pc.divide(us.cast(pa.float64()), 1_000_000.0)
    return c.cast(pa.float64())
@register("to_string")
def _to_string(c):
    """to_string.cue: timestamps render RFC3339 (`2020-10-21T16:00:00Z`),
    everything else is the plain string cast."""
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if pa.types.is_timestamp(c.type):
        # normalize tz-aware columns to UTC first — strftime renders in
        # the column's zone and the suffix below asserts UTC
        if c.type.tz is not None and c.type.tz != "UTC":
            c = c.cast(pa.timestamp(c.type.unit, "UTC"))
        # arrow %S includes fractional seconds when present
        s = pc.strftime(c, format="%Y-%m-%dT%H:%M:%S")
        # trim trailing fractional zeros like the reference's RFC3339
        s = pc.replace_substring_regex(s, r"(\.\d*?)0+$", r"\1")
        s = pc.replace_substring_regex(s, r"\.$", "")
        return pc.binary_join_element_wise(s, pa.array(["Z"] * len(s)), "")
    return c.cast(pa.string())
@register("to_bool")
def _to_bool(c):
    """Lenient boolean coercion (to_bool.cue): strings
    true/t/yes/y/1 → true, false/f/no/n/0 → false; numbers 0/0.0 →
    false else true; null → false."""
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    t = c.type
    if pa.types.is_boolean(t):
        return pc.fill_null(c, False)
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pc.fill_null(pc.not_equal(c, 0), False)
    if pa.types.is_null(t):
        return pa.array([False] * len(c), type=pa.bool_())
    truthy = {"true", "t", "yes", "y", "1"}
    falsy = {"false", "f", "no", "n", "0"}
    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(False)
            continue
        s = str(v).strip().lower()
        if s in truthy:
            out.append(True)
        elif s in falsy:
            out.append(False)
        else:
            raise ValueError(f"to_bool: unparseable boolean {v!r}")
    return pa.array(out, type=pa.bool_())
register("is_null")(lambda c: pc.is_null(c))


@register("coalesce")
def _coalesce(c, default):
    return pc.fill_null(c, default)


# --------------------------------------------------------- timestamps

_UNIT_US = {
    "seconds": 1_000_000, "milliseconds": 1_000, "microseconds": 1,
    "nanoseconds": None,  # sub-us: scale up instead
}


@register("to_unix_timestamp")
def _to_unix(c, unit="seconds"):
    us = c.cast(pa.timestamp("us")).cast(pa.int64())
    if unit == "nanoseconds":
        return pc.multiply(us, 1_000)
    return pc.divide(us, _UNIT_US[unit])


@register("from_unix_timestamp")
def _from_unix(c, unit="seconds"):
    v = c.cast(pa.int64())
    if unit == "nanoseconds":
        return pc.divide(v, 1_000).cast(pa.timestamp("us"))
    return pc.multiply(v, _UNIT_US[unit]).cast(pa.timestamp("us"))


def _chrono_strftime(fmt: str) -> str:
    """Map chrono-only format specifiers (format_timestamp.cue uses
    chrono's strftime dialect) onto C strftime ones."""
    return (
        fmt.replace("%+", "%Y-%m-%dT%H:%M:%S%:z")
        .replace("%v", "%-d-%b-%Y")
        .replace("%R", "%H:%M")
        .replace("%T", "%H:%M:%S")
        .replace("%D", "%m/%d/%y")
        .replace("%F", "%Y-%m-%d")
    )


@register("format_timestamp")
def _format_ts(c, format="%Y-%m-%dT%H:%M:%S", timezone=None):
    fmt = format
    # cast to second resolution first: Arrow's %S appends the fractional
    # part for sub-second units
    fmt = _chrono_strftime(fmt)
    if "%:z" in fmt or "%-" in fmt:
        # glibc handles %-d; %:z (chrono's +00:00 form) is hand-rolled
        import datetime as _dt

        arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        out = []
        for v in arr.cast(pa.timestamp("s")).to_pylist():
            if v is None:
                out.append(None)
                continue
            v = v.replace(tzinfo=_dt.timezone.utc)
            s = v.strftime(fmt.replace("%:z", "\x01"))
            out.append(s.replace("\x01", "+00:00"))
        return pa.array(out, type=pa.string())
    return pc.strftime(c.cast(pa.timestamp("s")), format=fmt)


@register("parse_timestamp")
def _parse_ts(c, format="%Y-%m-%dT%H:%M:%S", timezone=None):
    """parse_timestamp(value, format, timezone) — chrono dialect
    (parse_timestamp.cue); a named timezone interprets wall-clock
    inputs in that zone and converts to UTC."""
    if format == "%+":
        # RFC 3339 incl. fractional seconds and Z
        import datetime as _dt

        arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        out = []
        for v in arr.to_pylist():
            if v is None:
                out.append(None)
                continue
            try:
                d = _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
            except ValueError:
                out.append(None)
                continue
            if d.tzinfo is not None:
                d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            out.append(d)
        return pa.array(out, type=pa.timestamp("us"))
    fmt = _chrono_strftime(format)
    if "%:z" in fmt or "%-" in fmt or timezone:
        import datetime as _dt

        try:
            from zoneinfo import ZoneInfo
        except ImportError:  # pragma: no cover
            ZoneInfo = None
        tz = ZoneInfo(timezone) if (timezone and ZoneInfo) else None
        pyfmt = fmt.replace("%:z", "%z").replace("%-d", "%d")
        # chrono treats whitespace before a zone offset as optional;
        # Python's strptime demands it — try both spellings
        fmts = [pyfmt]
        if " %z" in pyfmt:
            fmts.append(pyfmt.replace(" %z", "%z"))
        arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        out = []
        for v in arr.to_pylist():
            if v is None:
                out.append(None)
                continue
            d = None
            for f in fmts:
                try:
                    # %d tolerates non-padded days; chrono's %-d input does too
                    d = _dt.datetime.strptime(v, f)
                    break
                except ValueError:
                    continue
            if d is None:
                out.append(None)
                continue
            if d.tzinfo is not None:
                d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            elif tz is not None:
                d = d.replace(tzinfo=tz).astimezone(_dt.timezone.utc).replace(tzinfo=None)
            out.append(d)
        return pa.array(out, type=pa.timestamp("us"))
    return pc.strptime(c, format=fmt, unit="us", error_is_null=True)


# ------------------------------------------------------ hashes/codecs

@register("encode_base64")
def _b64e(c, padding=True, charset="standard"):
    """encode_base64(value, padding, charset) — charset "url_safe"
    uses the URL-safe alphabet (encode_base64.cue)."""
    import base64

    enc = base64.urlsafe_b64encode if charset == "url_safe" else base64.b64encode

    def _one(v):
        s = enc(v.encode("utf-8", "surrogateescape")
                if isinstance(v, str) else v).decode()
        return s.rstrip("=") if not padding else s

    return pa.array([None if v is None else _one(v) for v in c.to_pylist()])


@register("decode_base64")
def _b64d(c, charset="standard"):
    import base64

    dec = base64.urlsafe_b64decode if charset == "url_safe" else base64.b64decode

    def _one(v):
        v = v + "=" * (-len(v) % 4)  # tolerate unpadded input
        return dec(v)

    raw = [None if v is None else _one(v) for v in c.to_pylist()]
    # VRL bytes are one type; Arrow splits string/binary: return string
    # when the whole batch round-trips utf-8 (the common case), else
    # binary.  CAVEAT: a column whose batches mix text and binary
    # payloads can come out string in one batch and binary in another
    # (Arrow strings physically cannot hold non-utf8 bytes) — pin the
    # type with a following encode_base64/to_string step if a sink
    # needs one schema.
    try:
        return pa.array([None if v is None else v.decode() for v in raw])
    except UnicodeDecodeError:
        return pa.array(raw, type=pa.binary())


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
def _cidr(c, cidr):
    """ip_cidr_contains analog: membership of each IP in one CIDR
    block or any of a list of blocks; IPv6 falls back to the stdlib
    per row.  The reference signature is (cidr, ip)
    (ip_cidr_contains.cue); we accept either order and treat whichever
    side contains a "/" as the CIDR, so the engine-idiomatic
    (ip_column, "10.0.0.0/8") keeps working."""
    import ipaddress

    if isinstance(cidr, str) and "/" not in cidr and not isinstance(c, str):
        # reference order: c is the cidr (column or scalar), cidr the ip
        cv = (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        cv = cv.to_pylist() if isinstance(cv, pa.Array) else [cv]
        ip = ipaddress.ip_address(cidr)
        out = []
        for spec in cv:
            if spec is None:
                out.append(None)
                continue
            specs = spec if isinstance(spec, list) else [spec]
            nets = [ipaddress.ip_network(s, strict=False) for s in specs]
            out.append(any(ip.version == n.version and ip in n for n in nets))
        return pa.array(out, type=pa.bool_())
    cidrs = cidr if isinstance(cidr, (list, tuple)) else [cidr]
    nets = [ipaddress.ip_network(x, strict=False) for x in cidrs]
    if len(nets) == 1 and nets[0].version == 4:
        net = nets[0]
        base = int(net.network_address)
        mask = int(net.netmask)
        try:
            ips = _ip_aton(c).to_numpy(zero_copy_only=False)
            return pa.array((ips & mask) == base)
        except Exception:
            pass  # v6 addresses in the column — fall through
    out = []
    for v in (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            a = ipaddress.ip_address(v)
        except ValueError:
            out.append(None)
            continue
        out.append(any(a.version == n.version and a in n for n in nets))
    return pa.array(out, type=pa.bool_())


# ------------------------------------------------- compression / mac

@register("encode_gzip")
def _gzip_e(c, compression_level=6):
    """VRL encode_gzip: bytes/string → gzip bytes (per-row codec; gzip
    has no vectorized kernel — codec functions are cold-path).  Header
    matches the reference's flate2 output byte-for-byte: mtime=0,
    XFL=0, OS=0xff (python's gzip module stamps mtime/OS, breaking
    encode_gzip.cue's byte-exact example)."""
    import struct
    import zlib

    def _one(v):
        data = v.encode("utf-8", "surrogateescape") if isinstance(v, str) else v
        co = zlib.compressobj(compression_level, zlib.DEFLATED, -15)
        body = co.compress(data) + co.flush()
        return (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff" + body
                + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                              len(data) & 0xFFFFFFFF))

    return pa.array(
        [None if v is None else _one(v) for v in c.to_pylist()],
        type=pa.binary(),
    )


@register("decode_gzip")
def _gzip_d(c):
    import gzip

    raw = [None if v is None else gzip.decompress(
        v.encode("utf-8", "surrogateescape") if isinstance(v, str) else v
    ) for v in c.to_pylist()]
    # string when the whole batch round-trips utf-8, else binary (same
    # dual-type caveat as decode_base64 — never lossy-replace bytes)
    try:
        return pa.array([None if v is None else v.decode() for v in raw])
    except UnicodeDecodeError:
        return pa.array(raw, type=pa.binary())


@register("encode_zlib")
def _zlib_e(c):
    import zlib

    return pa.array(
        [None if v is None else zlib.compress(
            v.encode("utf-8", "surrogateescape") if isinstance(v, str) else v)
         for v in c.to_pylist()],
        type=pa.binary(),
    )


@register("decode_zlib")
def _zlib_d(c):
    import zlib

    raw = [None if v is None else zlib.decompress(
        v.encode("utf-8", "surrogateescape") if isinstance(v, str) else v
    ) for v in c.to_pylist()]
    # string when the whole batch round-trips utf-8, else binary (same
    # dual-type caveat as decode_base64 — never lossy-replace bytes)
    try:
        return pa.array([None if v is None else v.decode() for v in raw])
    except UnicodeDecodeError:
        return pa.array(raw, type=pa.binary())


@register("hmac")
def _hmac(c, key, algorithm="SHA-256"):
    """VRL hmac(value, key, algorithm) → RAW digest bytes (hmac.cue:
    callers wrap with encode_base64/encode_base16).  ``algorithm``
    accepts "SHA-224/256/384/512" (any case, dash optional) and may be
    a column (the variable-hash-algorithm doc example)."""
    import hashlib
    import hmac as _hm

    k = key.encode() if isinstance(key, str) else key

    def _algo(a):
        name = str(a).lower().replace("-", "")
        if name not in ("sha1", "sha224", "sha256", "sha384", "sha512"):
            raise ValueError(f"invalid hmac algorithm {a!r}")
        return getattr(hashlib, name)

    algos = (
        [None if a is None else _algo(a) for a in algorithm.to_pylist()]
        if isinstance(algorithm, (pa.Array, pa.ChunkedArray))
        else [_algo(algorithm)] * len(c)
    )
    return pa.array(
        [None if v is None or a is None else _hm.new(
            k, (v if isinstance(v, bytes)
                else str(v).encode("utf-8", "surrogateescape")), a).digest()
         for v, a in zip(c.to_pylist(), algos)],
        type=pa.binary(),
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

    return obj_array(
        [None if v is None else _flat(json.loads(v) if isinstance(v, str) else v)
         for v in c.to_pylist()]
    )


# ------------------------------------------------- syslog / formats

_SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news", "uucp",
    "cron", "authpriv", "ftp", "ntp", "security", "console", "solaris-cron",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6", "local7",
]


@register("to_syslog_level")
def _to_syslog_level(c):
    """VRL to_syslog_level: severity int → keyword (vectorized take)."""
    idx = c.cast(pa.int64())
    table = pa.array(_SYSLOG_LEVELS + [None])
    i = pc.if_else(
        pc.and_(pc.greater_equal(idx, 0), pc.less_equal(idx, 7)),
        idx, pa.scalar(len(_SYSLOG_LEVELS), type=pa.int64()),
    )
    return table.take(i)


@register("to_syslog_facility")
def _to_syslog_facility(c):
    idx = c.cast(pa.int64())
    table = pa.array(_SYSLOG_FACILITIES + [None])
    i = pc.if_else(
        pc.and_(pc.greater_equal(idx, 0), pc.less_equal(idx, 23)),
        idx, pa.scalar(len(_SYSLOG_FACILITIES), type=pa.int64()),
    )
    return table.take(i)


@register("strip_ansi_escape_codes")
def _strip_ansi(c):
    return pc.replace_substring_regex(c, pattern=r"\x1b\[[0-9;]*[A-Za-z]", replacement="")


_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0,
              "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0}


@register("parse_duration")
def _parse_duration(c, unit="s"):
    """VRL parse_duration('1h30m', 's') → seconds (or requested unit).
    Vectorized: extract all (number, unit) groups then fold."""
    import re as _re

    div = _DUR_UNITS[unit]
    pat = _re.compile(r"(\d+(?:\.\d+)?)\s*(ns|us|µs|ms|s|m|h|d|w)")
    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        parts = pat.findall(v)
        if not parts:
            out.append(None)
            continue
        out.append(sum(float(n) * _DUR_UNITS[u] for n, u in parts) / div)
    return pa.array(out, type=pa.float64())


@register("parse_int")
def _parse_int(c, base=None):
    """VRL parse_int: string → int honoring 0x/0o/0b prefixes (base
    auto-detected when None)."""
    out = []
    for v in c.to_pylist():
        try:
            out.append(int(v, base if base is not None else 0))
        except (TypeError, ValueError):
            out.append(None)
    return pa.array(out, type=pa.int64())


# ----------------------------------------------------- case rewriting

# The optional ``original_case`` argument of the *case functions is a
# parser hint in the spec (camelcase.cue etc.) — our splitter already
# handles every listed case, so it is accepted and unused.

@register("snakecase")
def _snakecase(c, original_case=None):
    x = pc.replace_substring_regex(c, pattern=r"([a-z0-9])([A-Z])", replacement=r"\1_\2")
    x = pc.replace_substring_regex(x, pattern=r"[\s-]+", replacement="_")
    return pc.utf8_lower(x)


@register("kebabcase")
def _kebabcase(c, original_case=None):
    x = pc.replace_substring_regex(c, pattern=r"([a-z0-9])([A-Z])", replacement=r"\1-\2")
    x = pc.replace_substring_regex(x, pattern=r"[\s_]+", replacement="-")
    return pc.utf8_lower(x)


@register("camelcase")
def _camelcase(c, original_case=None):
    import re as _re

    pat = _re.compile(r"[-_\s]+(.)")
    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        s = pat.sub(lambda m: m.group(1).upper(), v.strip())
        out.append(s[:1].lower() + s[1:])
    return pa.array(out, type=pa.string())


@register("pascalcase")
def _pascalcase(c, original_case=None):
    cam = _camelcase(c)
    first = pc.utf8_upper(pc.utf8_slice_codeunits(cam, 0, 1))
    rest = pc.utf8_slice_codeunits(cam, 1)
    return pc.binary_join_element_wise(first, rest, "")


# ------------------------------------------------------------ url / qs

# percent-encoding ASCII sets (encode_percent.cue enum; definitions
# from the WHATWG URL standard's percent-encode sets)
_PCT_CONTROLS = set(chr(i) for i in range(0x20)) | {chr(0x7F)}
_PCT_FRAGMENT = _PCT_CONTROLS | set(' "<>`')
_PCT_QUERY = _PCT_CONTROLS | set(' "<>#')
_PCT_SPECIAL = _PCT_QUERY | {"'"}
_PCT_PATH = _PCT_FRAGMENT | set("#?{}")
_PCT_USERINFO = _PCT_PATH | set("/:;=@[\\]^|")
_PCT_COMPONENT = _PCT_USERINFO | set("$%&+,")
_PCT_WWW_FORM = _PCT_COMPONENT | set("!'()~")
_PCT_SETS = {
    "CONTROLS": _PCT_CONTROLS,
    "FRAGMENT": _PCT_FRAGMENT,
    "QUERY": _PCT_QUERY,
    "SPECIAL": _PCT_SPECIAL,
    "PATH": _PCT_PATH,
    "USERINFO": _PCT_USERINFO,
    "COMPONENT": _PCT_COMPONENT,
    "WWW_FORM_URLENCODED": _PCT_WWW_FORM,
}


@register("encode_percent")
def _pct_e(c, ascii_set="NON_ALPHANUMERIC"):
    """encode_percent(value, ascii_set) — NON_ALPHANUMERIC (default)
    encodes everything but [A-Za-z0-9]; the named sets encode only
    their members (encode_percent.cue)."""
    from urllib.parse import quote

    if ascii_set == "NON_ALPHANUMERIC":
        return pa.array(
            [None if v is None else quote(v, safe="") for v in c.to_pylist()]
        )
    chars = _PCT_SETS[ascii_set]

    def _one(v):
        return "".join(
            "".join(f"%{b:02X}" for b in ch.encode()) if ch in chars or ord(ch) > 0x7E
            else ch
            for ch in v
        )

    return pa.array([None if v is None else _one(v) for v in c.to_pylist()])


@register("decode_percent")
def _pct_d(c):
    from urllib.parse import unquote

    return pa.array([None if v is None else unquote(v) for v in c.to_pylist()])


@register("parse_query_string")
def _parse_qs(c):
    """Query string → sorted-key JSON object string (arrays for repeats)."""
    import json
    from urllib.parse import parse_qs

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        d = parse_qs(v.lstrip("?"), keep_blank_values=True)
        out.append(json.dumps(
            {k: (vs[0] if len(vs) == 1 else vs) for k, vs in sorted(d.items())}
        ))
    return pa.array(out, type=pa.string())


@register("int_to_ip")
def _ip_ntoa(c):
    """uint32 int → dotted quad, vectorized (numpy char ops)."""
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    x = np.asarray(arr.cast(pa.int64()).to_numpy(zero_copy_only=False))
    parts = [((x >> s) & 0xFF).astype(str) for s in (24, 16, 8, 0)]
    dotted = np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
        parts[0], "."), parts[1]), "."), np.char.add(parts[2], ".")), parts[3])
    return pa.array(dotted.tolist(), type=pa.string())


@register("sha3")
def _sha3(c, variant="SHA3-512"):
    """sha3(value, variant) — default SHA3-512 (sha3.cue)."""
    algo = "sha3_" + variant.rsplit("-", 1)[-1]
    return _hashlib_fn(algo)(c)


@register("parse_user_agent")
def _parse_ua(c, mode="fast"):
    """parse_user_agent(value, mode) — heuristic UA classifier with the
    reference's output shape (parse_user_agent.cue): nested
    browser/device/os objects; "fast" gives family+version, "reliable"
    normalizes os names, "enriched" adds major/minor/patch splits and
    device brand/model.  Covers the mainstream engine families (a
    documented subset of uap-core's pattern corpus)."""
    import re as _re

    browsers = [
        ("Opera Mini", _re.compile(r"Opera Mini/([\d.]+)")),
        ("Opera", _re.compile(r"Opera[/ ]([\d.]+)")),
        ("Firefox", _re.compile(r"Firefox[/ ]([\d.]+)")),
        ("Edge", _re.compile(r"Edg(?:e|A|iOS)?/([\d.]+)")),
        ("Internet Explorer", _re.compile(r"MSIE ([\d.]+)")),
        ("Chrome", _re.compile(r"Chrome/([\d.]+)")),
        ("Safari", _re.compile(r"Version/([\d.]+).*Safari")),
        ("curl", _re.compile(r"curl/([\d.]+)")),
    ]
    version_override = _re.compile(r"Version/([\d.]+)")
    nt_names = {
        "5.0": "Windows 2000", "5.1": "Windows XP", "5.2": "Windows XP",
        "6.0": "Windows Vista", "6.1": "Windows 7", "6.2": "Windows 8",
        "6.3": "Windows 8.1", "10.0": "Windows 10",
    }
    ios_rx = _re.compile(r"(?:iPhone|CPU) OS ([\d_]+)")
    mac_rx = _re.compile(r"Mac OS X ([\d_.]+)")
    android_rx = _re.compile(r"Android ([\d.]+)")
    nt_rx = _re.compile(r"Windows NT ([\d.]+)")

    def _split_ver(v):
        parts = (v or "").split(".")
        return (parts + [None, None, None])[:3]

    def _one(v):
        browser_family = browser_version = None
        for fam, rx in browsers:
            m = rx.search(v)
            if m:
                browser_family, browser_version = fam, m.group(1)
                break
        if browser_family in ("Opera", "Opera Mini", "Safari"):
            vo = version_override.search(v)
            if vo:
                browser_version = vo.group(1)

        os_family = os_version = None
        m = nt_rx.search(v)
        if m:
            os_version = "NT " + m.group(1)
            os_family = (nt_names.get(m.group(1), "Windows")
                         if mode != "fast" else "Windows")
        elif ios_rx.search(v) or "iPhone" in v or "iPad" in v:
            mi = ios_rx.search(v)
            os_family = "iOS"
            os_version = mi.group(1).replace("_", ".") if mi else None
        elif android_rx.search(v):
            os_family = "Android"
            os_version = android_rx.search(v).group(1)
        elif mac_rx.search(v):
            os_family = "Mac OS X"
            os_version = mac_rx.search(v).group(1).replace("_", ".")
        elif "Linux" in v or "X11" in v:
            os_family = "Linux"

        if "iPad" in v:
            category, dfam, brand, model = "tablet", "iPad", "Apple", "iPad"
        elif "iPhone" in v:
            category, dfam, brand, model = "smartphone", "iPhone", "Apple", "iPhone"
        elif "Mobile" in v and os_family == "Android":
            category, dfam, brand, model = "smartphone", "Generic Smartphone", None, None
        elif os_family == "Android":
            category, dfam, brand, model = "tablet", "Generic Tablet", None, None
        else:
            category, dfam, brand, model = "pc", "Other", None, None

        if mode == "enriched":
            bmaj, bmin, bpat = _split_ver(
                version_override.search(v).group(1).replace("_", ".")
                if False else (browser_version or "")
            )
            # enriched major/minor/patch come from the ENGINE match,
            # not the Version/ override (uap-core behavior)
            for fam, rx in browsers:
                m = rx.search(v)
                if m:
                    bmaj, bmin, bpat = _split_ver(m.group(1))
                    break
            omaj, omin, opat = _split_ver(os_version.replace("NT ", "")
                                          if os_version else "")
            return {
                "browser": {"family": browser_family, "major": bmaj or None,
                            "minor": bmin, "patch": bpat,
                            "version": browser_version},
                "device": {"brand": brand, "category": category,
                           "family": dfam, "model": model},
                "os": {"family": os_family, "major": omaj or None,
                       "minor": omin, "patch": opat, "patch_minor": None,
                       "version": os_version},
            }
        return {
            "browser": {"family": browser_family, "version": browser_version},
            "device": {"category": category},
            "os": {"family": os_family, "version": os_version},
        }

    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return obj_array([None if v is None else _one(v) for v in arr.to_pylist()])


# -------------------------------------------------- string/array extras

register("reverse_string")(lambda c: pc.utf8_reverse(c))
register("repeat")(lambda c, n: pc.binary_repeat(c, n))
register("pad_left")(lambda c, n, ch=" ": pc.utf8_lpad(c, n, padding=ch))
register("pad_right")(lambda c, n, ch=" ": pc.utf8_rpad(c, n, padding=ch))
@register("format_int")
def _format_int(c, base=16):
    fmt = {2: "b", 8: "o", 10: "d", 16: "x"}[base]
    return pa.array(
        [None if v is None else format(v, fmt) for v in c.to_pylist()],
        type=pa.string(),
    )


@register("parse_regex")
def _parse_regex(c, pattern, numeric_groups=False):
    """VRL parse_regex: named-group regex → JSON object string per row
    (vectorized extract_regex; null on no-match).  numeric_groups adds
    "0".."N" capture indices like the spec (parse_regex.cue)."""
    import json as _json

    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    if numeric_groups:
        import re as _re

        rx = _re.compile(pattern)
        out = []
        for v in arr.to_pylist():
            m = rx.search(v) if v is not None else None
            if m is None:
                out.append(None)
                continue
            d = {str(i): g for i, g in enumerate(m.group(0, *range(1, rx.groups + 1)))}
            d.update(m.groupdict())
            out.append(d)
        return obj_array(out)
    st = pc.extract_regex(arr, pattern=pattern)
    names = [f.name for f in st.type] if len(st) else []
    cols = {n: st.field(n).to_pylist() for n in names}
    valid = pc.is_valid(st).to_pylist() if len(st) else []
    out = []
    for i in range(len(arr)):
        if valid[i]:
            out.append({n: cols[n][i] for n in names})
        else:
            out.append(None)
    return obj_array(out)


@register("parse_regex_all")
def _parse_regex_all(c, pattern, numeric_groups=False):
    """VRL parse_regex_all: all matches per row → array of capture
    objects; ``numeric_groups`` adds "0".."N" indices
    (parse_regex_all.cue)."""
    import re as _re

    pat = _re.compile(pattern)

    def _groups(m):
        d = {}
        if numeric_groups or not pat.groupindex:
            d.update({str(i): g for i, g in
                      enumerate(m.group(0, *range(1, pat.groups + 1)))})
        d.update(m.groupdict())
        return d

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        out.append([_groups(m) for m in pat.finditer(v)])
    return obj_array(out)


@register("unique_items")
def _unique_items(c):
    """VRL unique(array): JSON list string → deduped JSON list string
    (first-occurrence order)."""
    import json as _json

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        items = _json.loads(v) if isinstance(v, str) else list(v)
        seen, res = set(), []
        for x in items:
            k = _json.dumps(x, sort_keys=True) if isinstance(x, (dict, list)) else x
            if k not in seen:
                seen.add(k)
                res.append(x)
        out.append(_json.dumps(res))
    return pa.array(out, type=pa.string())


@register("tally")
def _tally(c):
    """VRL tally: JSON list of strings → {value: count} JSON object."""
    import json as _json
    from collections import Counter

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        items = _json.loads(v) if isinstance(v, str) else list(v)
        out.append(_json.dumps(dict(Counter(str(x) for x in items)), sort_keys=True))
    return pa.array(out, type=pa.string())


@register("includes")
def _includes(c, item):
    import json as _json

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        items = _json.loads(v) if isinstance(v, str) else list(v)
        out.append(item in items)
    return pa.array(out, type=pa.bool_())


@register("get_hostname")
def _get_hostname(c):
    import socket

    return pa.array([socket.gethostname()] * len(c), type=pa.string())


@register("get_env_var")
def _get_env_var(c, name=None):
    """get_env_var(name) — the column holds the variable names
    (get_env_var.cue); a constant ``name`` arg broadcasts instead."""
    import os as _os

    if name is not None:
        return pa.array([_os.environ.get(name)] * len(c), type=pa.string())
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return pa.array(
        [None if v is None else _os.environ.get(v) for v in arr.to_pylist()],
        type=pa.string(),
    )


# ----------------------------------------------------- type predicates

def _json_pred(fn):
    import json as _json

    def _f(c):
        out = []
        for v in c.to_pylist():
            if v is None:
                out.append(None)
                continue
            try:
                out.append(fn(_json.loads(v) if isinstance(v, str) else v))
            except Exception:
                out.append(False)
        return pa.array(out, type=pa.bool_())

    return _f


register("is_boolean")(lambda c: pa.array([isinstance(v, bool) for v in c.to_pylist()]))
register("is_integer")(
    lambda c: pa.array([isinstance(v, int) and not isinstance(v, bool)
                        for v in c.to_pylist()])
)
register("is_float")(lambda c: pa.array([isinstance(v, float) for v in c.to_pylist()]))
register("is_string")(lambda c: pa.array([isinstance(v, str) for v in c.to_pylist()]))
register("is_array")(_json_pred(lambda v: isinstance(v, list)))
register("is_object")(_json_pred(lambda v: isinstance(v, dict)))


@register("is_json")
def _is_json(c, variant=None):
    """is_json(value, variant) — optional variant restricts the JSON
    type: object/array/string/number/bool/null (is_json.cue)."""
    import json as _json

    checks = {
        "object": dict, "array": list, "string": str,
        "number": (int, float), "bool": bool, "null": type(None),
    }
    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(False)
            continue
        try:
            parsed = _json.loads(v)
        except Exception:
            out.append(False)
            continue
        out.append(True if variant is None else isinstance(parsed, checks[variant]))
    return pa.array(out, type=pa.bool_())


@register("is_nullish")
def _is_nullish(c):
    """VRL is_nullish: null, empty/whitespace string, or '-'."""
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    if pa.types.is_string(arr.type):
        trimmed = pc.utf8_trim_whitespace(arr)
        m = pc.or_(pc.is_null(arr),
                   pc.or_(pc.equal(trimmed, ""), pc.equal(trimmed, "-")))
        return pc.fill_null(m, True)
    return pc.is_null(arr)


@register("is_empty")
def _is_empty(c):
    """Empty string / array / object (is_empty.cue)."""
    import json as _json

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
        elif isinstance(v, (list, dict)):
            out.append(len(v) == 0)
        elif isinstance(v, str):
            if v.startswith(("[", "{")):
                try:
                    out.append(len(_json.loads(v)) == 0)
                except Exception:
                    out.append(len(v) == 0)
            else:
                out.append(len(v) == 0)
        else:
            out.append(False)
    return pa.array(out, type=pa.bool_())


register("is_ipv4")(lambda c: pc.match_substring_regex(
    c, r"^(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)$"))
register("is_ipv6")(
    lambda c: pc.and_(
        pc.match_substring_regex(c, r"^(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}$"),
        pc.match_substring(c, ":"),
    )
)


# ------------------------------------------------------------- math

register("exp")(lambda c: pc.exp(c.cast(pa.float64())))
register("ln")(lambda c: pc.ln(c.cast(pa.float64())))
register("log2")(lambda c: pc.log2(c.cast(pa.float64())))
register("log10")(lambda c: pc.log10(c.cast(pa.float64())))
register("sqrt")(lambda c: pc.sqrt(c.cast(pa.float64())))
register("pow")(lambda c, p: pc.power(c.cast(pa.float64()), p))


@register("format_number")
def _format_number(c, scale=2, decimal_separator=".", grouping_separator=","):
    """format_number(value, scale, decimal_separator,
    grouping_separator) — spec argument order (format_number.cue)."""
    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        s = f"{v:,.{scale}f}"
        s = s.replace(",", "\x00").replace(".", decimal_separator).replace(
            "\x00", grouping_separator)
        out.append(s)
    return pa.array(out, type=pa.string())


# -------------------------------------------------- strings / objects

register("strip_left")(lambda c, ch: pc.utf8_ltrim(c, characters=ch))
register("strip_right")(lambda c, ch: pc.utf8_rtrim(c, characters=ch))
register("encode_base16")(
    lambda c: pa.array([None if v is None else
                        (v.encode("utf-8", "surrogateescape")
                         if isinstance(v, str) else v).hex()
                        for v in c.to_pylist()])
)
register("decode_base16")(
    lambda c: pa.array([None if v is None else bytes.fromhex(v).decode()
                        for v in c.to_pylist()])
)


@register("encode_json")
def _encode_json(c):
    """Canonical JSON re-encoding (sorted keys) of JSON-string values."""
    import json as _json

    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(_json.dumps(_json.loads(v) if isinstance(v, str) else v,
                                   sort_keys=True, separators=(",", ":")))
        except Exception:
            out.append(_json.dumps(v, separators=(",", ":")))
    return pa.array(out, type=pa.string())


@register("get_path")
def _get_path(c, path):
    """VRL path get over JSON-object strings: 'a.b[0].c' or the
    spec's array form ["a", "b", 0, "c"] (get.cue)."""
    import json as _json
    import re as _re

    steps = []
    if isinstance(path, (list, tuple)):
        steps = [p if isinstance(p, int) else str(p) for p in path]
        path = ""
    for part in path.split(".") if path else []:
        m = _re.match(r"([^\[\]]*)((?:\[\d+\])*)$", part)
        if m.group(1):
            steps.append(m.group(1))
        for idx in _re.findall(r"\[(\d+)\]", m.group(2)):
            steps.append(int(idx))
    out = []
    for v in c.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            cur = _json.loads(v) if isinstance(v, str) else v
            for s in steps:
                cur = cur[s]
            out.append(cur if isinstance(cur, str)
                       else _json.dumps(cur, sort_keys=True))
        except Exception:
            out.append(None)
    return pa.array(out, type=pa.string())


@register("uuid_v5")
def _uuid_v5(c, namespace="dns"):
    """Deterministic name-based UUID (RFC 4122 v5)."""
    import uuid as _uuid

    ns = {"dns": _uuid.NAMESPACE_DNS, "url": _uuid.NAMESPACE_URL,
          "oid": _uuid.NAMESPACE_OID, "x500": _uuid.NAMESPACE_X500}[namespace]
    return pa.array(
        [None if v is None else str(_uuid.uuid5(ns, str(v))) for v in c.to_pylist()]
    )


@register("match_any")
def _match_any(c, patterns):
    m = pc.match_substring_regex(c, patterns[0])
    for p in patterns[1:]:
        m = pc.or_(m, pc.match_substring_regex(c, p))
    return m


# ---- round-3 batch: casts, arrays/objects, IP family, codecs, parsers
# (vector_ray/functions/scalar_ext.py registers into this table)
from . import scalar_ext  # noqa: E402,F401  (registration side effect)
from . import binary_formats  # noqa: E402,F401  (parse_cbor/parse_dnstap/...)

# named-log parsers live in vector_ray/parse.py — register them by
# their VRL names so remap "apply" steps reach them
from .. import parse as _parse_mod  # noqa: E402

def _wrap_table_parser(fn):
    """parse.py named-log parsers return ``(cols, err_mask)``; the VRL
    registry convention is one Arrow array per call — fold the columns
    into a struct array with failed rows null (a fallible call then
    errors exactly those rows)."""
    def wrapped(c, *a, **kw):
        cols, err = fn(c, *a, **kw)
        if isinstance(cols, pa.Table):
            names = cols.column_names
            arrs = [cols[n].combine_chunks() for n in names]
        else:
            names = list(cols)
            arrs = [
                v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                for v in cols.values()
            ]
        mask = None
        if err is not None:
            import pyarrow.compute as _pc

            mask = _pc.fill_null(err, False)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
        return pa.StructArray.from_arrays(arrs, names=names, mask=mask)

    wrapped.__doc__ = fn.__doc__
    return wrapped


for _name in (
    "parse_apache_log", "parse_nginx_log", "parse_glog", "parse_klog",
    "parse_aws_vpc_flow_log", "parse_aws_alb_log",
    "parse_linux_authorization", "parse_common_log", "parse_url",
):
    if _name not in FUNCTIONS:
        FUNCTIONS[_name] = _wrap_table_parser(getattr(_parse_mod, _name))

from .. import codecs as _codecs_mod  # noqa: E402

if "parse_cef" not in FUNCTIONS:
    def _parse_cef_vrl(c, translate_custom_fields=False):
        """parse_cef(value, translate_custom_fields) — flat object with
        the camelCase header names + extension keys (parse_cef.cue);
        a syslog prefix before "CEF:" is ignored;
        ``translate_custom_fields`` folds cs1/cs1Label pairs into
        {label: value}.  (The table-shaped codec variant remains at
        codecs.parse_cef.)"""
        import re as _re

        headers = ["cefVersion", "deviceVendor", "deviceProduct",
                   "deviceVersion", "deviceEventClassId", "name", "severity"]
        split_re = _re.compile(r"(?<!\\)\|")
        ext_re = _re.compile(r"([\w.]+)=((?:[^=\s]|\\=|\s(?!\S+=))*)")
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        out = []
        for v in c.to_pylist():
            if v is None:
                out.append(None)
                continue
            at = v.find("CEF:")
            if at < 0:
                out.append(None)
                continue
            parts = split_re.split(v[at + 4:], maxsplit=7)
            if len(parts) < 7:
                out.append(None)
                continue
            row = {h: p.replace("\\|", "|").replace("\\\\", "\\")
                   for h, p in zip(headers, parts[:7])}
            ext = parts[7] if len(parts) > 7 else ""
            kv = {m.group(1): m.group(2).replace("\\=", "=").strip()
                  for m in ext_re.finditer(ext)}
            if translate_custom_fields:
                labels = {k[:-5]: lv for k, lv in kv.items()
                          if k.endswith("Label")}
                folded = {}
                for k, val in kv.items():
                    if k.endswith("Label"):
                        continue
                    folded[labels.get(k, k)] = val
                kv = folded
            row.update(kv)
            out.append(row)
        return pa.array(
            [None if r is None else list(r.items()) for r in out],
            type=pa.map_(pa.string(), pa.string()),
        )

    FUNCTIONS["parse_cef"] = _parse_cef_vrl
if "parse_syslog" not in FUNCTIONS:
    def _parse_syslog_vrl(c, rfc="5424"):
        """parse_syslog(value) — the reference's object shape
        (parse_syslog.cue): severity/facility keywords from pri,
        version, parsed timestamp, procid int when numeric, and each
        RFC 5424 structured-data element nested under its SD-ID.
        (The table-shaped codec variant remains at
        codecs.decode_syslog.)"""
        import json as _json

        tbl, err = _codecs_mod.decode_syslog(c, rfc)
        sd_objs = [None if s in (None, "") else _json.loads(s)
                   for s in _codecs_mod.parse_syslog_sd(tbl["sd"]).to_pylist()]             if "sd" in tbl.column_names else [None] * tbl.num_rows
        ts = FUNCTIONS["parse_timestamp"](tbl["stamp"], "%+")             if "stamp" in tbl.column_names else None
        rows = tbl.to_pylist()
        out = []
        for i, r in enumerate(rows):
            if err[i].as_py():
                out.append(None)
                continue
            pri = r.get("pri")
            row = {}
            if pri is not None:
                row["severity"] = _SYSLOG_LEVELS[pri & 7]
                fac = pri >> 3
                row["facility"] = (_SYSLOG_FACILITIES[fac]
                                   if fac < len(_SYSLOG_FACILITIES) else str(fac))
            if ts is not None and ts[i].is_valid:
                row["timestamp"] = ts[i].as_py()
            for k_src, k_dst in (("hostname", "hostname"), ("appname", "appname"),
                                 ("msgid", "msgid"), ("msg", "message")):
                v = r.get(k_src)
                if v not in (None, "-"):
                    row[k_dst] = v
            procid = r.get("procid")
            if procid not in (None, "-"):
                row["procid"] = int(procid) if str(procid).isdigit() else procid
            if sd_objs[i]:
                row.update(sd_objs[i])
            if rfc == "5424":
                row["version"] = 1
            out.append(row)
        return obj_array(out)

    FUNCTIONS["parse_syslog"] = _parse_syslog_vrl

_DESC_POOL_CACHE: dict = {}


def _proto_message_class(desc_file, message_type: str):
    """Message class from a FileDescriptorSet given as a file PATH (the
    VRL surface: parse_proto.cue/encode_proto.cue take `desc_file`) or
    raw bytes.  Pools are cached per descriptor so per-batch calls
    don't re-parse the set."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    if isinstance(desc_file, (pa.Array, pa.ChunkedArray)):
        desc_file = desc_file[0].as_py()
    key = desc_file if isinstance(desc_file, str) else hash(desc_file)
    pool = _DESC_POOL_CACHE.get(key)
    if pool is None:
        raw = desc_file
        if isinstance(desc_file, str):
            with open(desc_file, "rb") as fh:
                raw = fh.read()
        pool = descriptor_pool.DescriptorPool()
        # tolerate dependency-order-agnostic sets: retry files whose
        # imports haven't loaded yet until a full pass makes no progress
        pending = list(descriptor_pb2.FileDescriptorSet.FromString(raw).file)
        while pending:
            still = []
            for f in pending:
                try:
                    pool.Add(f)
                except TypeError:
                    still.append(f)
            if len(still) == len(pending):
                pool.Add(still[0])  # re-raise the real error
            pending = still
        _DESC_POOL_CACHE[key] = pool
    if isinstance(message_type, (pa.Array, pa.ChunkedArray)):
        message_type = message_type[0].as_py()
    return message_factory.GetMessageClass(pool.FindMessageTypeByName(message_type))


def _proto_is_repeated(field) -> bool:
    rep = getattr(field, "is_repeated", None)
    if rep is not None:
        return bool(rep)
    return field.label == field.LABEL_REPEATED


def _proto_enum_name(field, v):
    """Enum number → name; unknown numbers (proto3 open enums — a newer
    producer added a variant) pass through as the raw int instead of
    crashing."""
    entry = field.enum_type.values_by_number.get(v)
    return entry.name if entry is not None else v


def _proto_msg_to_obj(msg):
    """Message → native Python object keeping wire types: int64 stays
    int, bytes stays bytes (MessageToDict would follow the proto3-JSON
    mapping and render them as decimal/base64 STRINGS, silently
    corrupting typed fields — VRL's parse_proto returns native
    values).  Well-known types (google.protobuf.Timestamp/Duration/
    wrappers/Struct) keep their canonical JSON scalar form."""
    from google.protobuf.descriptor import FieldDescriptor
    from google.protobuf.json_format import MessageToDict

    def _sub(m):
        if m.DESCRIPTOR.full_name.startswith("google.protobuf."):
            return MessageToDict(m, preserving_proto_field_name=True)
        return _proto_msg_to_obj(m)

    out = {}
    for field, value in msg.ListFields():
        if field.type == FieldDescriptor.TYPE_MESSAGE:
            if field.message_type.GetOptions().map_entry:
                vf = field.message_type.fields_by_name["value"]
                if vf.type == FieldDescriptor.TYPE_MESSAGE:
                    out[field.name] = {k: _sub(v) for k, v in value.items()}
                elif vf.type == FieldDescriptor.TYPE_ENUM:
                    # map<k, Enum> values name-map like plain enum fields
                    out[field.name] = {
                        k: _proto_enum_name(vf, v) for k, v in value.items()
                    }
                else:
                    out[field.name] = dict(value)
            elif _proto_is_repeated(field):
                out[field.name] = [_sub(m) for m in value]
            else:
                out[field.name] = _sub(value)
        elif field.type == FieldDescriptor.TYPE_ENUM:
            out[field.name] = (
                [_proto_enum_name(field, v) for v in value]
                if _proto_is_repeated(field)
                else _proto_enum_name(field, value)
            )
        elif _proto_is_repeated(field):
            out[field.name] = list(value)
        else:
            out[field.name] = value
    return out


def _proto_obj_to_msg(d: dict, msg):
    """dict → message without ParseDict's proto3-JSON coercions (bytes
    values stay raw bytes instead of requiring base64 text)."""
    from google.protobuf.descriptor import FieldDescriptor

    for key, value in d.items():
        if value is None:
            continue
        field = msg.DESCRIPTOR.fields_by_name.get(key)
        if field is None:
            raise ValueError(
                f"unknown field {key!r} for {msg.DESCRIPTOR.full_name}"
            )
        if field.type == FieldDescriptor.TYPE_MESSAGE:

            def _fill(v, target):
                if isinstance(v, dict):
                    if not v:
                        # {} means PRESENT empty message (proto3
                        # message fields have explicit presence)
                        target.SetInParent()
                    else:
                        _proto_obj_to_msg(v, target)
                else:
                    # well-known types take their proto3-JSON scalar
                    # form (Timestamp RFC3339 string, wrappers, ...)
                    from google.protobuf.json_format import ParseDict

                    ParseDict(v, target)

            if field.message_type.GetOptions().map_entry:
                vf = field.message_type.fields_by_name["value"]
                target = getattr(msg, key)
                for k, v in value.items():
                    if vf.type == FieldDescriptor.TYPE_MESSAGE:
                        _fill(v, target[k])
                    elif vf.type == FieldDescriptor.TYPE_ENUM and isinstance(
                        v, str
                    ):
                        target[k] = vf.enum_type.values_by_name[v].number
                    else:
                        target[k] = v
            elif _proto_is_repeated(field):
                for item in value:
                    _fill(item, getattr(msg, key).add())
            else:
                _fill(value, getattr(msg, key))
        elif field.type == FieldDescriptor.TYPE_ENUM and isinstance(
            value, (str, list)
        ):
            num = lambda v: (
                field.enum_type.values_by_name[v].number
                if isinstance(v, str) else v
            )
            if _proto_is_repeated(field):
                getattr(msg, key).extend([num(v) for v in value])
            else:
                setattr(msg, key, num(value))
        elif field.type == FieldDescriptor.TYPE_BYTES:
            # str → utf-8 bytes, symmetric for singular AND repeated
            enc = lambda v: (
                v.encode("utf-8", "surrogateescape")
                if isinstance(v, str) else v
            )
            if _proto_is_repeated(field):
                getattr(msg, key).extend([enc(v) for v in value])
            else:
                setattr(msg, key, enc(value))
        elif _proto_is_repeated(field):
            getattr(msg, key).extend(value)
        else:
            setattr(msg, key, value)
    return msg


if "parse_proto" not in FUNCTIONS:
    def _parse_proto_vrl(c, desc_file, message_type):
        """parse_proto(value, desc_file, message_type) → object
        (parse_proto.cue; vrl stdlib parse_proto): decodes each row's
        binary payload to the full message as a nested object with
        native value types."""
        cls = _proto_message_class(desc_file, message_type)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        out = []
        for v in c.to_pylist():
            if v is None:
                out.append(None)
                continue
            if isinstance(v, str):
                v = v.encode("utf-8", "surrogateescape")
            msg = cls.FromString(v)  # raises on invalid payload (fallible)
            out.append(_proto_msg_to_obj(msg))
        return obj_array(out)

    FUNCTIONS["parse_proto"] = _parse_proto_vrl

if "match_datadog_query" not in FUNCTIONS:
    def _match_datadog_query(c, query):
        """Datadog search query over an event (match_datadog_query.cue):
        struct columns expose their fields as the searchable table
        (message free-text, tags list, attribute columns); plain string
        columns are the message (vector_ray/datadog_search.py holds the
        full dialect; table-level conditions use
        {"type": "datadog_search"} blocks)."""
        import pyarrow as _pa

        from ..datadog_search import compile_datadog_search

        if isinstance(c, _pa.ChunkedArray):
            c = c.combine_chunks()
        if _pa.types.is_struct(c.type):
            tbl = _pa.table(
                {f.name: c.field(f.name) for f in c.type}
            )
        else:
            tbl = _pa.table({"message": c})
        return compile_datadog_search(query)(tbl)

    FUNCTIONS["match_datadog_query"] = _match_datadog_query

if "encode_proto" not in FUNCTIONS:
    def _encode_proto(c, desc_file, message_type):
        """encode_proto(object, desc_file, message_type) → bytes
        (encode_proto.cue): each row's object populates the message's
        fields (nested objects/arrays included, native value types —
        bytes fields take raw bytes, not base64 text) and serializes."""
        cls = _proto_message_class(desc_file, message_type)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        out = []
        for v in c.to_pylist():
            if v is None:
                out.append(None)
                continue
            if not isinstance(v, dict):
                raise TypeError("encode_proto needs an object value")
            out.append(_proto_obj_to_msg(v, cls()).SerializeToString())
        return pa.array(out, type=pa.binary())

    FUNCTIONS["encode_proto"] = _encode_proto
