"""Round-3 stdlib batch — casts, arrays/objects, IP family, codecs,
network fingerprints, parsers (VRL analogs, §2.7).

Registered into the same ``FUNCTIONS`` registry as functions/scalar.py
(imported from there).  Conventions unchanged: ``fn(col, *args) ->
Arrow array`` of the same length; args may be scalars or aligned Arrow
arrays.  Object-valued results use Arrow ``map<string, string>`` —
the columnar stand-in for VRL's dynamic objects.

Reference specs: website/cue/reference/remap/functions/<name>.cue.
Documented deviations: hash bit-values differ where the reference uses
seahash; random_*/uuid_v4 take a deterministic seed (resume-safe);
encode_lz4 uses the LZ4 frame format pyarrow ships.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .scalar import FUNCTIONS, register

MAP_SS = pa.map_(pa.string(), pa.string())


def _arr(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _np_or_scalar(x):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return _arr(x).to_numpy(zero_copy_only=False)
    return x


def _rowmap(col, fn, out_type=None):
    """Per-row Python fallback (C-backed libs inside) — documented as
    off-the-hot-path, same convention as scalar.py's hashlib loops."""
    vals = _arr(col).to_pylist()
    return pa.array([None if v is None else fn(v) for v in vals], type=out_type)


# ------------------------------------------------------------- casts

register("string")(lambda c: _arr(c).cast(pa.string()))
register("int")(lambda c: _arr(c).cast(pa.string()).cast(pa.int64())
                if pa.types.is_string(_arr(c).type) else _arr(c).cast(pa.int64()))
register("float")(lambda c: _arr(c).cast(pa.float64()))
register("timestamp")(lambda c: _arr(c).cast(pa.timestamp("us")))


@register("bool")
def _bool(c):
    c = _arr(c)
    if pa.types.is_boolean(c.type):
        return c
    if pa.types.is_string(c.type):
        return pc.equal(pc.utf8_lower(c), "true")
    return pc.not_equal(c.cast(pa.float64()), 0.0)


@register("array")
def _array(c):
    """Wrap each scalar into a single-element list (list passthrough)."""
    c = _arr(c)
    if pa.types.is_list(c.type) or pa.types.is_large_list(c.type):
        return c
    offsets = pa.array(np.arange(len(c) + 1, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, c)


@register("length")
def _length(c):
    c = _arr(c)
    if pa.types.is_string(c.type) or pa.types.is_binary(c.type):
        return pc.utf8_length(c) if pa.types.is_string(c.type) else pc.binary_length(c)
    if pa.types.is_list(c.type) or pa.types.is_large_list(c.type) or pa.types.is_map(c.type):
        return pc.list_value_length(c)
    if pa.types.is_struct(c.type):
        return pa.array(np.full(len(c), c.type.num_fields, dtype=np.int64))
    raise ValueError(f"length: unsupported type {c.type}")


register("strlen")(lambda c: pc.utf8_length(c))
register("exists")(lambda c: _arr(c).is_valid())
register("is_timestamp")(
    lambda c: pa.array(np.full(len(_arr(c)), pa.types.is_timestamp(_arr(c).type)))
)
register("is_regex")(lambda c: pa.array(np.zeros(len(_arr(c)), dtype=bool)))


@register("assert")
def _assert(c, message="assertion failed"):
    c = _arr(c)
    if not pc.all(pc.fill_null(c.cast(pa.bool_()), False)).as_py() and len(c):
        raise AssertionError(message)
    return c


@register("assert_eq")
def _assert_eq(c, other, message="assertion failed"):
    c = _arr(c)
    eq = pc.equal(c, other if not isinstance(other, pa.ChunkedArray) else other.combine_chunks())
    if len(c) and not pc.all(pc.fill_null(eq, False)).as_py():
        raise AssertionError(message)
    return c


# ------------------------------------------------------------ strings


@register("screamingsnakecase")
def _scream(c):
    return pc.utf8_upper(FUNCTIONS["snakecase"](c))


# RE2 (Arrow's regex engine) has no lookahead — two sequential
# replaces: strip trailing slashes, then everything up to the last '/'
@register("basename")
def _basename(c):
    trimmed = pc.replace_substring_regex(c, pattern=r"/+$", replacement="")
    return pc.replace_substring_regex(trimmed, pattern=r"^.*/", replacement="")


@register("dirname")
def _dirname(c):
    import posixpath

    return _rowmap(c, lambda s: posixpath.dirname(s.rstrip("/") or "/") or ".",
                   pa.string())


@register("split_path")
def _split_path(c):
    trimmed = pc.replace_substring_regex(c, pattern=r"^/+|/+$", replacement="")
    return pc.split_pattern(trimmed, pattern="/")


@register("contains_all")
def _contains_all(c, needles):
    c = _arr(c)
    out = None
    for n in needles:
        m = pc.match_substring(c, n)
        out = m if out is None else pc.and_(out, m)
    return out if out is not None else pa.array(np.ones(len(c), dtype=bool))


@register("sieve")
def _sieve(c, permitted_pattern, replace_single="", replace_repeated=None):
    """Keep only substrings matching the pattern; single non-matching
    chars become replace_single, runs become replace_repeated."""
    if replace_repeated is None:
        replace_repeated = replace_single
    rx = re.compile(permitted_pattern)

    def _one(s):
        out, last = [], 0
        for m in rx.finditer(s):
            gap = m.start() - last
            if gap == 1:
                out.append(replace_single)
            elif gap > 1:
                out.append(replace_repeated)
            out.append(m.group(0))
            last = m.end()
        gap = len(s) - last
        if gap == 1:
            out.append(replace_single)
        elif gap > 1:
            out.append(replace_repeated)
        return "".join(out)

    return _rowmap(c, _one, pa.string())


@register("chunks")
def _chunks(c, n):
    n = int(n)
    return _rowmap(c, lambda s: [s[i : i + n] for i in range(0, len(s), n)],
                   pa.list_(pa.string()))


@register("decode_mime_q")
def _decode_mime_q(c):
    from email.header import decode_header

    def _one(s):
        parts = decode_header(s)
        return "".join(
            p.decode(enc or "ascii", errors="replace") if isinstance(p, bytes) else p
            for p, enc in parts
        )

    return _rowmap(c, _one, pa.string())


@register("encode_punycode")
def _encode_punycode(c, validate=True):
    import idna

    def _one(s):
        try:
            return idna.encode(s, uts46=True).decode("ascii")
        except idna.IDNAError:
            if validate:
                raise
            return s.encode("idna").decode("ascii")

    return _rowmap(c, _one, pa.string())


@register("decode_punycode")
def _decode_punycode(c, validate=True):
    import idna

    def _one(s):
        try:
            return idna.decode(s)
        except idna.IDNAError:
            if validate:
                raise
            return s

    return _rowmap(c, _one, pa.string())


@register("shannon_entropy")
def _shannon_entropy(c):
    def _one(s):
        b = s.encode() if isinstance(s, str) else s
        if not b:
            return 0.0
        counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / len(b)
        return float(-(p * np.log2(p)).sum())

    return _rowmap(c, _one, pa.float64())


# --------------------------------------------------------------- math


@register("log")
def _log(c, base=None):
    c = _arr(c).cast(pa.float64())
    if base is None:
        return pc.ln(c)
    return pc.logb(c, float(base))


@register("haversine")
def _haversine(lat1, lon1, lat2, lon2, measurement_system="kilometers"):
    """Great-circle distance; args may be aligned arrays or scalars."""
    a1, o1 = np.radians(_np_or_scalar(lat1)), np.radians(_np_or_scalar(lon1))
    a2, o2 = np.radians(_np_or_scalar(lat2)), np.radians(_np_or_scalar(lon2))
    h = (np.sin((a2 - a1) / 2) ** 2
         + np.cos(a1) * np.cos(a2) * np.sin((o2 - o1) / 2) ** 2)
    r = 6371.0 if measurement_system == "kilometers" else 3960.0
    return pa.array(np.atleast_1d(2 * r * np.arcsin(np.sqrt(h))))


# ------------------------------------------------------------- hashes


@register("sha2")
def _sha2(c, variant="SHA-512/224"):
    import hashlib

    name = variant.replace("SHA-512/", "sha512_").replace("SHA-", "sha").replace("/", "_")

    def _one(s):
        h = hashlib.new(name)
        h.update(s.encode() if isinstance(s, str) else s)
        return h.hexdigest()

    return _rowmap(c, _one, pa.string())


@register("crc")
def _crc(c, algorithm="CRC-32"):
    import binascii

    if algorithm not in ("CRC-32", "CRC-32/ISO-HDLC"):
        raise ValueError(f"crc: only CRC-32 implemented, got {algorithm!r}")
    return _rowmap(c, lambda s: str(binascii.crc32(s.encode() if isinstance(s, str) else s)
                                    & 0xFFFFFFFF), pa.string())


@register("seahash")
def _seahash(c):
    """Stable 64-bit string hash — seahash-equivalent PROPERTIES, our
    bits (same note as the sample stage)."""
    from .hashes import hash_string_column

    return pa.array(hash_string_column(_arr(c)).view(np.int64))


register("xxhash")(lambda c, seed=0: FUNCTIONS["xxhash64"](c, seed))


@register("community_id")
def _community_id(proto, src_ip, src_port, dst_ip, dst_port, seed=0):
    """Corelight Community ID v1 flow hash (public spec
    corelight/community-id-spec): sha1 over seed + sorted endpoint
    tuple, base64, "1:" prefix."""
    import base64
    import hashlib
    import socket
    import struct

    protos = _np_or_scalar(proto)
    sips = _arr(src_ip).to_pylist()
    dips = _arr(dst_ip).to_pylist()
    sps = _np_or_scalar(src_port)
    dps = _np_or_scalar(dst_port)
    n = len(sips)

    def _pack_ip(ip):
        try:
            return socket.inet_aton(ip)
        except OSError:
            return socket.inet_pton(socket.AF_INET6, ip)

    out = []
    for i in range(n):
        p = int(protos[i] if hasattr(protos, "__len__") else protos)
        sip, dip = _pack_ip(sips[i]), _pack_ip(dips[i])
        sp = int(sps[i] if hasattr(sps, "__len__") else sps)
        dp = int(dps[i] if hasattr(dps, "__len__") else dps)
        if (sip, sp) > (dip, dp):
            sip, dip, sp, dp = dip, sip, dp, sp
        h = hashlib.sha1()
        h.update(struct.pack("!H", int(seed)))
        h.update(sip)
        h.update(dip)
        h.update(struct.pack("!BBHH", p, 0, sp, dp))
        out.append("1:" + base64.b64encode(h.digest()).decode("ascii"))
    return pa.array(out, type=pa.string())


# ----------------------------------------------------------- IP family

register("ip_aton")(lambda c: FUNCTIONS["ip_to_int"](c))
register("ip_ntoa")(lambda c: FUNCTIONS["int_to_ip"](c))


@register("ip_pton")
def _ip_pton(c):
    import socket

    def _one(s):
        try:
            return socket.inet_aton(s)
        except OSError:
            return socket.inet_pton(socket.AF_INET6, s)

    return _rowmap(c, _one, pa.binary())


@register("ip_ntop")
def _ip_ntop(c):
    import socket

    def _one(b):
        if len(b) == 4:
            return socket.inet_ntoa(b)
        return socket.inet_ntop(socket.AF_INET6, b)

    return _rowmap(c, _one, pa.string())


@register("ip_to_ipv6")
def _ip_to_ipv6(c):
    import ipaddress

    def _one(s):
        a = ipaddress.ip_address(s)
        if a.version == 6:
            return str(a)
        return f"::ffff:{a}"

    return _rowmap(c, _one, pa.string())


@register("ipv6_to_ipv4")
def _ipv6_to_ipv4(c):
    import ipaddress

    def _one(s):
        a = ipaddress.ip_address(s)
        if a.version == 4:
            return str(a)
        if a.ipv4_mapped is None:
            raise ValueError(f"IPV6 address {s} is not compatible with IPV4")
        return str(a.ipv4_mapped)

    return _rowmap(c, _one, pa.string())


@register("ip_subnet")
def _ip_subnet(c, subnet):
    import ipaddress

    def _one(s):
        net = ipaddress.ip_network((s, subnet.lstrip("/")), strict=False)
        return str(net.network_address)

    return _rowmap(c, _one, pa.string())


# ------------------------------------------------------------- syslog

_FACILITIES = ["kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
               "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
               "solaris-cron", "local0", "local1", "local2", "local3", "local4",
               "local5", "local6", "local7"]
_SEVERITIES = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]


@register("to_syslog_facility_code")
def _to_fac_code(c):
    lut = {n: i for i, n in enumerate(_FACILITIES)}
    return _rowmap(c, lambda s: lut[s.lower()], pa.int64())


@register("to_syslog_severity")
def _to_sev_code(c):
    lut = {n: i for i, n in enumerate(_SEVERITIES)}
    lut.update({"panic": 0, "error": 3, "warn": 4})
    return _rowmap(c, lambda s: lut[s.lower()], pa.int64())


# ---------------------------------------------------- block compression


def _codec_encode(codec_name):
    def enc(c):
        codec = pa.Codec(codec_name)
        return _rowmap(c, lambda b: codec.compress(
            b.encode() if isinstance(b, str) else b, asbytes=True), pa.binary())

    return enc


def _stream_decode(codec_name):
    """Framed codecs (zstd/lz4-frame) carry their own size — decompress
    through Arrow's CompressedInputStream."""
    def dec(c):
        def _one(b):
            if isinstance(b, str):
                b = b.encode()
            st = pa.CompressedInputStream(pa.BufferReader(b), codec_name)
            return bytes(st.read())

        return _rowmap(c, _one, pa.binary())

    return dec


register("encode_zstd")(_codec_encode("zstd"))
register("decode_zstd")(_stream_decode("zstd"))
# LZ4 FRAME format (pyarrow's lz4 codec) — the reference's lz4_flex
# block format is size-prefixed raw blocks; frame is the interoperable
# container
register("encode_lz4")(_codec_encode("lz4"))
register("decode_lz4")(_stream_decode("lz4"))
register("encode_snappy")(_codec_encode("snappy"))


@register("decode_snappy")
def _decode_snappy(c):
    """Snappy raw format stores the uncompressed length as a leading
    varint (snappy format spec §1) — parse it and hand Arrow the size
    it requires for one-shot decompression."""
    codec = pa.Codec("snappy")

    def _one(b):
        if isinstance(b, str):
            b = b.encode()
        n = shift = i = 0
        while True:
            byte = b[i]
            n |= (byte & 0x7F) << shift
            i += 1
            if not byte & 0x80:
                break
            shift += 7
        return codec.decompress(b, decompressed_size=n, asbytes=True)

    return _rowmap(c, _one, pa.binary())


@register("encode_charset")
def _encode_charset(c, charset):
    return _rowmap(c, lambda s: s.encode(charset), pa.binary())


@register("decode_charset")
def _decode_charset(c, charset):
    return _rowmap(c, lambda b: (b if isinstance(b, bytes) else b.encode()).decode(charset),
                   pa.string())


# -------------------------------------------------- arrays and objects


@register("append")
def _append(c, items):
    """Append items (a python list) to every row's list."""
    items = list(items) if isinstance(items, (list, tuple)) else [items]
    return _rowmap(c, lambda l: list(l) + items)


register("push")(lambda c, item: _rowmap(c, lambda l: list(l) + [item]))
register("pop")(lambda c: _rowmap(c, lambda l: list(l)[:-1]))


@register("compact")
def _compact(c):
    c = _arr(c)
    empties = (None, "", [], {})
    if pa.types.is_map(c.type) or pa.types.is_struct(c.type):
        return _to_map_array([
            None if d is None else {k: v for k, v in d.items() if v not in empties}
            for d in _map_to_dicts(c)
        ])
    return _rowmap(c, lambda l: [v for v in l if v not in empties])


@register("flatten")
def _flatten(c, separator="."):
    c = _arr(c)
    if pa.types.is_list(c.type) and pa.types.is_list(c.type.value_type):
        # per-row one-level flatten (pc.list_flatten removes the OUTER
        # nesting and would change the row count)
        return _rowmap(
            c,
            lambda l: [x for sub in l
                       for x in (sub if isinstance(sub, list) else [sub])],
        )
    if pa.types.is_struct(c.type) or pa.types.is_map(c.type):
        return FUNCTIONS["flatten_object"](c, separator)
    return c


@register("unique")
def _unique(c):
    """Dedupe a LIST column per row, first-occurrence order (the older
    unique_items operates on JSON-string lists; this is the list-typed
    variant)."""
    c = _arr(c)
    if pa.types.is_string(c.type):
        return FUNCTIONS["unique_items"](c)
    return _rowmap(c, lambda l: list(dict.fromkeys(l)))


@register("zip")
def _zip(a, b):
    av = _arr(a).to_pylist()
    bv = _arr(b).to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else b
    out = []
    for i, l in enumerate(av):
        r = bv[i] if isinstance(bv, list) and isinstance(bv[i], list) else bv
        out.append(None if l is None else [list(t) for t in zip(l, r)])
    return pa.array(out)


@register("match_array")
def _match_array(c, pattern, match_all=False):
    rx = re.compile(pattern)
    if match_all:
        op = lambda l: all(rx.search(str(v)) is not None for v in l)  # noqa: E731
    else:
        op = lambda l: any(rx.search(str(v)) is not None for v in l)  # noqa: E731
    return _rowmap(c, op, pa.bool_())


def _to_map_array(dicts):
    return pa.array(
        [None if d is None else [(str(k), None if v is None else str(v))
                                 for k, v in d.items()] for d in dicts],
        type=MAP_SS,
    )


def _map_to_dicts(c):
    c = _arr(c)
    if pa.types.is_struct(c.type):
        return c.to_pylist()
    return [None if v is None else dict(v) for v in c.to_pylist()]


@register("keys")
def _keys(c):
    return pa.array([None if d is None else list(d.keys()) for d in _map_to_dicts(c)],
                    type=pa.list_(pa.string()))


@register("values")
def _values(c):
    return pa.array([None if d is None else [None if v is None else str(v)
                                             for v in d.values()]
                     for d in _map_to_dicts(c)], type=pa.list_(pa.string()))


register("get")(lambda c, path: FUNCTIONS["get_path"](c, path))
register("merge")(lambda c, other: FUNCTIONS["merge_objects"](c, other))


@register("map_keys")
def _map_keys(c, fn_name):
    f = FUNCTIONS[fn_name]
    return _to_map_array([
        None if d is None else {f(pa.array([k]))[0].as_py(): v for k, v in d.items()}
        for d in _map_to_dicts(c)
    ])


@register("map_values")
def _map_values(c, fn_name):
    f = FUNCTIONS[fn_name]
    return _to_map_array([
        None if d is None else {k: f(pa.array([str(v)]))[0].as_py() for k, v in d.items()}
        for d in _map_to_dicts(c)
    ])


@register("object_from_array")
def _object_from_array(c):
    """list<list[k, v]> or list<struct<key,value>> → map."""
    def _one(l):
        out = {}
        for item in l:
            if isinstance(item, dict):
                out[item.get("key")] = item.get("value")
            else:
                out[item[0]] = item[1] if len(item) > 1 else None
        return out

    return _to_map_array([None if l is None else _one(l)
                          for l in _arr(c).to_pylist()])


@register("unflatten")
def _unflatten(c, separator=".", recursive=True):
    def _one(d):
        out = {}
        for k, v in d.items():
            parts = k.split(separator)
            cur = out
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
                if not isinstance(cur, dict):
                    break
            else:
                cur[parts[-1]] = v
        return out

    dicts = [None if d is None else _one(d) for d in _map_to_dicts(c)]
    return pa.array([None if d is None else json.dumps(d) for d in dicts],
                    type=pa.string())


@register("set")
def _set(c, key, value):
    def _upd(d):
        d = dict(d)
        d[key] = value
        return d

    return _to_map_array([None if d is None else _upd(d) for d in _map_to_dicts(c)])


@register("del")
def _del(c, key):
    def _upd(d):
        d = dict(d)
        d.pop(key, None)
        return d

    return _to_map_array([None if d is None else _upd(d) for d in _map_to_dicts(c)])


register("remove")(lambda c, key: FUNCTIONS["del"](c, key))


@register("filter")
def _filter(c, fn_name):
    """Keep list elements where FUNCTIONS[fn_name] is truthy —
    vectorized: flatten once, apply once, rebuild offsets."""
    c = _arr(c)
    f = FUNCTIONS[fn_name]
    flat = pc.list_flatten(c)
    keep = f(flat)
    keep_np = np.asarray(pc.fill_null(keep.cast(pa.bool_()), False).to_numpy(
        zero_copy_only=False), dtype=bool)
    lengths = pc.list_value_length(c).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    kept_counts = np.add.reduceat(keep_np, starts[:-1]) if len(flat) else np.zeros(
        len(lengths), dtype=np.int64)
    kept_counts = np.where(lengths == 0, 0, kept_counts)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    flat.filter(pa.array(keep_np)))


# ------------------------------------------------------------- parsers


@register("parse_json")
def _parse_json(c, max_depth=None):
    def _one(s):
        v = json.loads(s)
        if isinstance(v, dict):
            return {k: (json.dumps(x) if isinstance(x, (dict, list))
                        else (None if x is None else str(x))) for k, x in v.items()}
        return {"_value": json.dumps(v)}

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


@register("parse_csv")
def _parse_csv(c, delimiter=","):
    import csv
    import io

    def _one(s):
        return next(csv.reader(io.StringIO(s), delimiter=delimiter), [])

    return _rowmap(c, _one, pa.list_(pa.string()))


@register("parse_key_value")
def _parse_key_value(c, key_value_delimiter="=", field_delimiter=" "):
    def _one(s):
        out = {}
        for part in s.split(field_delimiter):
            if key_value_delimiter in part:
                k, v = part.split(key_value_delimiter, 1)
                out[k.strip()] = v.strip().strip('"')
        return out

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


register("parse_logfmt")(lambda c: FUNCTIONS["parse_key_value"](c, "=", " "))


@register("parse_grok")
def _parse_grok(c, pattern):
    from ..parse import grok_to_regex

    rx = re.compile(grok_to_regex(pattern)[0])

    def _one(s):
        m = rx.search(s)
        return m.groupdict() if m else None

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


@register("parse_groks")
def _parse_groks(c, patterns):
    from ..parse import grok_to_regex

    rxs = [re.compile(grok_to_regex(p)[0]) for p in patterns]

    def _one(s):
        for rx in rxs:
            m = rx.search(s)
            if m:
                return m.groupdict()
        return None

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


@register("parse_ruby_hash")
def _parse_ruby_hash(c):
    def _one(s):
        t = re.sub(r"\bnil\b", "null", s.replace("=>", ":"))
        v = json.loads(t)
        return {k: (None if x is None else str(x)) for k, x in v.items()}

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


@register("parse_xml")
def _parse_xml(c):
    """Flat XML → map of child-tag → text (single level; attributes
    join as tag@attr)."""
    import xml.etree.ElementTree as ET

    def _one(s):
        root = ET.fromstring(s)
        out = {}
        for k, v in root.attrib.items():
            out[f"{root.tag}@{k}"] = v
        for child in root:
            out[child.tag] = (child.text or "").strip()
        return out

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


@register("parse_influxdb")
def _parse_influxdb(c):
    from ..codecs import parse_influx_line

    return _to_map_array([None if s is None else parse_influx_line(s)
                          for s in _arr(c).to_pylist()])


@register("parse_bytes")
def _parse_bytes(c, unit="byte", base=None):
    units = {"b": 1, "kb": 1000, "mb": 1000**2, "gb": 1000**3, "tb": 1000**4,
             "kib": 1024, "mib": 1024**2, "gib": 1024**3, "tib": 1024**4}
    if base == "2":
        units.update({"kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4})
    rx = re.compile(r"^\s*([\d.]+)\s*([A-Za-z]+)?\s*$")

    def _one(s):
        m = rx.match(s)
        if not m:
            raise ValueError(f"parse_bytes: unable to parse {s!r}")
        qty = float(m.group(1))
        u = (m.group(2) or "B").lower()
        if u not in units:
            raise ValueError(f"parse_bytes: unknown unit {u!r}")
        return float(qty * units[u])

    return _rowmap(c, _one, pa.float64())


register("parse_float")(lambda c: _arr(c).cast(pa.string()).cast(pa.float64()))


@register("parse_etld")
def _parse_etld(c, plus_parts=0):
    """Effective TLD without a PSL database: the registrable suffix is
    approximated as the final label (+ known 2-level suffixes).
    DOCUMENTED DEVIATION: the reference embeds the full public-suffix
    list; this container has no data file for it."""
    two_level = {"co.uk", "org.uk", "ac.uk", "com.au", "net.au", "org.au",
                 "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx"}

    def _one(s):
        labels = s.lower().rstrip(".").split(".")
        tail2 = ".".join(labels[-2:]) if len(labels) >= 2 else None
        n = 2 if tail2 in two_level else 1
        k = min(len(labels), n + int(plus_parts))
        return ".".join(labels[-k:])

    return _rowmap(c, _one, pa.string())


# ----------------------------------------------------- time / identity


@register("now")
def _now(c):
    """Wall-clock now, one value per row (inherently nondeterministic —
    same as the reference's now())."""
    import time

    t = int(time.time() * 1e6)
    return pa.array(np.full(len(_arr(c)), t, dtype=np.int64)).cast(pa.timestamp("us"))


register("get_timezone_name")(
    lambda c: pa.array(["UTC"] * len(_arr(c)), type=pa.string())
)


@register("uuid_v4")
def _uuid_v4(c, seed=0):
    """Deterministic-seeded UUIDv4 stream (resume-safe DEVIATION from
    the reference's entropy source; layout bits are v4-correct)."""
    rng = np.random.RandomState(int(seed))
    n = len(_arr(c))
    raw = rng.bytes(16 * n)
    out = []
    import uuid as _uuid

    for i in range(n):
        b = bytearray(raw[16 * i : 16 * i + 16])
        b[6] = (b[6] & 0x0F) | 0x40
        b[8] = (b[8] & 0x3F) | 0x80
        out.append(str(_uuid.UUID(bytes=bytes(b))))
    return pa.array(out, type=pa.string())


@register("uuid_v7")
def _uuid_v7(c, seed=0):
    """UUIDv7 from a timestamp column (ms precision) + seeded random
    tail — sortable by time, deterministic given (column, seed)."""
    import uuid as _uuid

    ts = _arr(c).cast(pa.timestamp("ms")).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rng = np.random.RandomState(int(seed))
    raw = rng.bytes(10 * len(ts))
    out = []
    for i, t in enumerate(ts):
        b = bytearray(int(t).to_bytes(6, "big") + raw[10 * i : 10 * i + 10])
        b[6] = (b[6] & 0x0F) | 0x70
        b[8] = (b[8] & 0x3F) | 0x80
        out.append(str(_uuid.UUID(bytes=bytes(b))))
    return pa.array(out, type=pa.string())


@register("random_int")
def _random_int(c, lo, hi, seed=0):
    rng = np.random.RandomState(int(seed))
    return pa.array(rng.randint(int(lo), int(hi), size=len(_arr(c))).astype(np.int64))


@register("random_float")
def _random_float(c, lo, hi, seed=0):
    rng = np.random.RandomState(int(seed))
    return pa.array(rng.uniform(float(lo), float(hi), size=len(_arr(c))))


@register("random_bool")
def _random_bool(c, seed=0):
    rng = np.random.RandomState(int(seed))
    return pa.array(rng.randint(0, 2, size=len(_arr(c))).astype(bool))


@register("random_bytes")
def _random_bytes(c, length=16, seed=0):
    rng = np.random.RandomState(int(seed))
    n = len(_arr(c))
    raw = rng.bytes(int(length) * n)
    return pa.array([raw[i * int(length):(i + 1) * int(length)] for i in range(n)],
                    type=pa.binary())


# --------------------------------------------- enrichment-table bridge


@register("get_enrichment_table_record")
def _get_enrichment_record(c, table, select=None):
    """Probe an EnrichTable by single-column key — returns the selected
    columns as a map per row (find_table_row analog)."""
    batch = pa.table({table.key_columns[0]: _arr(c)})
    joined = table.probe(batch, [table.key_columns[0]], select=select)
    cols = [n for n in joined.column_names if n != table.key_columns[0]]
    dicts = joined.select(cols).to_pylist()
    return _to_map_array([
        {k: (None if v is None else str(v)) for k, v in d.items()} for d in dicts
    ])


register("find_enrichment_table_records")(
    lambda c, table, select=None: FUNCTIONS["get_enrichment_table_record"](c, table, select)
)


# -------------------------------------------------- encoders (objects)


@register("encode_key_value")
def _encode_key_value(c, key_value_delimiter="=", field_delimiter=" "):
    return pa.array([
        None if d is None else field_delimiter.join(
            f"{k}{key_value_delimiter}{v}" for k, v in d.items())
        for d in _map_to_dicts(c)
    ], type=pa.string())


@register("encode_logfmt")
def _encode_logfmt(c):
    def _quote(v):
        s = str(v)
        return f'"{s}"' if (" " in s or "=" in s or '"' in s) else s

    return pa.array([
        None if d is None else " ".join(f"{k}={_quote(v)}" for k, v in d.items())
        for d in _map_to_dicts(c)
    ], type=pa.string())


@register("object")
def _object(c):
    c = _arr(c)
    if pa.types.is_map(c.type) or pa.types.is_struct(c.type):
        return c
    raise ValueError(f"object: expected map/struct column, got {c.type}")


@register("to_regex")
def _to_regex(c):
    """Columnar regexes stay strings; this validates they compile."""
    for s in _arr(c).to_pylist():
        if s is not None:
            re.compile(s)
    return _arr(c).cast(pa.string())


@register("parse_tokens")
def _parse_tokens(c):
    """Tokenize a log line: whitespace-separated, honoring "quotes" and
    [brackets] as single tokens (VRL parse_tokens)."""
    rx = re.compile(r'"([^"]*)"|\[([^\]]*)\]|(\S+)')

    def _one(s):
        return [g1 or g2 or g3 for g1, g2, g3 in rx.findall(s)]

    return _rowmap(c, _one, pa.list_(pa.string()))


@register("replace_with")
def _replace_with(c, pattern, fn_name):
    """Regex replace where each match is rewritten by FUNCTIONS[fn_name]
    (the closure analog: the match text is the closure argument)."""
    rx = re.compile(pattern)
    f = FUNCTIONS[fn_name]

    def _one(s):
        return rx.sub(lambda m: f(pa.array([m.group(0)]))[0].as_py(), s)

    return _rowmap(c, _one, pa.string())


@register("for_each")
def _for_each(c, fn_name):
    """Apply FUNCTIONS[fn_name] to every element of every row's list —
    vectorized: one flatten, one call, offsets reused."""
    c = _arr(c)
    f = FUNCTIONS[fn_name]
    flat = pc.list_flatten(c)
    mapped = f(flat)
    lengths = pc.list_value_length(c).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    offs = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offs[1:])
    return pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), mapped)


@register("uuid_from_friendly_id")
def _uuid_from_friendly_id(c):
    import uuid as _uuid

    alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    lut = {ch: i for i, ch in enumerate(alphabet)}

    def _one(s):
        n = 0
        for ch in s:
            n = n * 62 + lut[ch]
        return str(_uuid.UUID(int=n))

    return _rowmap(c, _one, pa.string())


@register("validate_json_schema")
def _validate_json_schema(c, schema_json):
    import jsonschema

    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    validator = jsonschema.Draft202012Validator(schema)

    def _one(s):
        try:
            validator.validate(json.loads(s))
            return True
        except Exception:
            return False

    return _rowmap(c, _one, pa.bool_())


@register("parse_aws_cloudwatch_log_subscription_message")
def _parse_cw_sub(c):
    def _one(s):
        v = json.loads(s)
        return {
            "owner": str(v.get("owner", "")),
            "log_group": str(v.get("logGroup", "")),
            "log_stream": str(v.get("logStream", "")),
            "message_type": str(v.get("messageType", "")),
            "subscription_filters": json.dumps(v.get("subscriptionFilters", [])),
            "log_events": json.dumps(v.get("logEvents", [])),
        }

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


# ------------------------------------------------------------- secrets

_SECRET_STORE: dict = {}


@register("set_secret")
def _set_secret(c, key, value):
    """Process-local secret store (the reference stores per-event secret
    metadata; columnar analog is a per-worker store)."""
    _SECRET_STORE[key] = value
    return _arr(c)


@register("get_secret")
def _get_secret(c, key):
    v = _SECRET_STORE.get(key)
    return pa.array([v] * len(_arr(c)), type=pa.string())


@register("remove_secret")
def _remove_secret(c, key):
    _SECRET_STORE.pop(key, None)
    return _arr(c)


# -------------------------------------------------------------- crypto


def _aes_ctx(algorithm, key, iv):
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    m = re.match(r"AES-(128|192|256)-(CFB|CBC|CTR)(-PKCS7)?$", algorithm)
    if not m:
        raise ValueError(
            f"unsupported algorithm {algorithm!r} (AES-<bits>-<CFB|CBC|CTR>[-PKCS7])"
        )
    bits = int(m.group(1))
    kb = key.encode() if isinstance(key, str) else key
    ivb = iv.encode() if isinstance(iv, str) else iv
    if len(kb) * 8 != bits:
        raise ValueError(f"{algorithm} needs a {bits // 8}-byte key, got {len(kb)}")
    mode = {"CFB": modes.CFB, "CBC": modes.CBC, "CTR": modes.CTR}[m.group(2)]
    return Cipher(algorithms.AES(kb), mode(ivb)), m.group(2) == "CBC"


@register("encrypt")
def _encrypt(c, algorithm, key, iv):
    cipher, pad = _aes_ctx(algorithm, key, iv)

    def _one(v):
        b = v.encode() if isinstance(v, str) else v
        if pad:
            from cryptography.hazmat.primitives import padding

            p = padding.PKCS7(128).padder()
            b = p.update(b) + p.finalize()
        enc = cipher.encryptor()
        return enc.update(b) + enc.finalize()

    return _rowmap(c, _one, pa.binary())


@register("decrypt")
def _decrypt(c, algorithm, key, iv):
    cipher, pad = _aes_ctx(algorithm, key, iv)

    def _one(b):
        if isinstance(b, str):
            b = b.encode()
        dec = cipher.decryptor()
        out = dec.update(b) + dec.finalize()
        if pad:
            from cryptography.hazmat.primitives import padding

            u = padding.PKCS7(128).unpadder()
            out = u.update(out) + u.finalize()
        return out

    return _rowmap(c, _one, pa.binary())


@register("encrypt_ip")
def _encrypt_ip(c, key):
    """ipcrypt-deterministic (public spec draft-denis-ipcrypt): AES-128
    single-block over the 16-byte (v4-mapped) address."""
    import ipaddress

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    kb = key.encode() if isinstance(key, str) else key
    if len(kb) != 16:
        raise ValueError("encrypt_ip needs a 16-byte key")
    enc = Cipher(algorithms.AES(kb), modes.ECB()).encryptor()

    def _one(s):
        a = ipaddress.ip_address(s)
        b = a.packed if a.version == 6 else ipaddress.ip_address(
            f"::ffff:{a}").packed
        out = enc.update(b)
        return str(ipaddress.ip_address(out))

    return _rowmap(c, _one, pa.string())


@register("decrypt_ip")
def _decrypt_ip(c, key):
    import ipaddress

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    kb = key.encode() if isinstance(key, str) else key
    if len(kb) != 16:
        raise ValueError("decrypt_ip needs a 16-byte key")
    dec = Cipher(algorithms.AES(kb), modes.ECB()).decryptor()

    def _one(s):
        b = ipaddress.ip_address(s).packed
        out = ipaddress.ip_address(dec.update(b))
        return str(out.ipv4_mapped) if out.ipv4_mapped else str(out)

    return _rowmap(c, _one, pa.string())
