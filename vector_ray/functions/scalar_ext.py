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
encode_lz4/decode_lz4 use the reference's lz4_flex BLOCK format (size-prefixed raw blocks via pyarrow's lz4_raw codec); decode also auto-detects the frame container by magic.
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
def _scream(c, original_case=None):
    return pc.utf8_upper(FUNCTIONS["snakecase"](c))


# RE2 (Arrow's regex engine) has no lookahead — two sequential
# replaces: strip trailing slashes, then everything up to the last '/'
@register("basename")
def _basename(c):
    """basename.cue: "/" (and "") have no final component → null."""
    trimmed = pc.replace_substring_regex(c, pattern=r"/+$", replacement="")
    base = pc.replace_substring_regex(trimmed, pattern=r"^.*/", replacement="")
    return pc.if_else(pc.equal(base, ""), pa.scalar(None, pa.string()), base)


@register("dirname")
def _dirname(c):
    import posixpath

    return _rowmap(c, lambda s: posixpath.dirname(s.rstrip("/") or "/") or ".",
                   pa.string())


@register("split_path")
def _split_path(c):
    """split_path.cue: absolute paths keep a leading "/" component;
    "" → [], "/" → ["/"]."""
    def _one(s):
        parts = [p for p in s.split("/") if p]
        return (["/"] + parts) if s.startswith("/") else parts

    return _rowmap(c, _one, pa.list_(pa.string()))


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
    """chunks(value, chunk_size) splits BYTES, not codepoints
    (chunks.cue: chunks("ab你好", 4) == ["ab�", "�好"]) — multibyte
    codepoints broken at a boundary decode lossily."""
    n = int(n)

    def _one(s):
        b = s.encode() if isinstance(s, str) else s
        return [b[i : i + n].decode("utf-8", "replace")
                for i in range(0, len(b), n)]

    return _rowmap(c, _one, pa.list_(pa.string()))


@register("decode_mime_q")
def _decode_mime_q(c):
    """RFC 2047 encoded-word decoding, plus the spec's bare
    ``?b?…`` / ``?q?…`` form with no charset prefix
    (decode_mime_q.cue third example)."""
    import base64
    import quopri
    from email.header import decode_header

    bare = re.compile(r"^\?([bqBQ])\?(.*?)(\?=)?$")

    def _one(s):
        m = bare.match(s)
        if m:
            enc, payload = m.group(1).lower(), m.group(2)
            if enc == "b":
                payload = payload + "=" * (-len(payload) % 4)
                return base64.b64decode(payload).decode("utf-8", "replace")
            return quopri.decodestring(
                payload.replace("_", " ").encode()).decode("utf-8", "replace")
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
    """Per-label punycode decode; preserves a trailing root dot
    (decode_punycode.cue decodes "xn--8hbb.….xn--eib." label by
    label)."""
    import idna

    def _label(l):
        if l.lower().startswith("xn--"):
            return l[4:].encode("ascii").decode("punycode")
        return l

    def _one(s):
        try:
            return idna.decode(s)
        except idna.IDNAError:
            try:
                return ".".join(_label(l) for l in s.split("."))
            except (UnicodeError, UnicodeDecodeError):
                if validate:
                    raise
                return s

    return _rowmap(c, _one, pa.string())


@register("shannon_entropy")
def _shannon_entropy(c, segmentation="byte"):
    """shannon_entropy.cue: entropy over bytes (default), codepoints,
    or graphemes (approximated as codepoints with combining marks
    merged into the preceding cluster — full UAX#29 needs a
    segmentation library the container doesn't ship)."""
    import collections
    import math
    import unicodedata

    def _segments(s):
        if segmentation == "byte":
            return s.encode() if isinstance(s, str) else s
        if isinstance(s, bytes):
            s = s.decode("utf-8", "replace")
        if segmentation == "codepoint":
            return list(s)
        clusters, cur = [], ""
        for ch in s:
            if cur and unicodedata.combining(ch):
                cur += ch
            else:
                if cur:
                    clusters.append(cur)
                cur = ch
        if cur:
            clusters.append(cur)
        return clusters

    if segmentation not in ("byte", "codepoint", "grapheme"):
        raise ValueError(
            f"invalid segmentation {segmentation!r} (byte|codepoint|grapheme)")

    def _one(s):
        if segmentation == "byte":
            # vectorized hot default
            b = s.encode() if isinstance(s, str) else s
            if not b:
                return 0.0
            counts = np.bincount(np.frombuffer(b, dtype=np.uint8),
                                 minlength=256)
            p = counts[counts > 0] / len(b)
            return float(-(p * np.log2(p)).sum())
        segs = _segments(s)
        n = len(segs)
        if not n:
            return 0.0
        counts = collections.Counter(segs)
        return float(-sum((k / n) * math.log2(k / n)
                          for k in counts.values()))

    return _rowmap(c, _one, pa.float64())


# --------------------------------------------------------------- math


@register("log")
def _log(c, base_or_level=None, rate_limit_secs=None, level=None):
    """Dual role: VRL ``log(value, level, rate_limit_secs)`` is the
    event logger (returns null, log.cue) — engaged when the second
    arg is a level string; with no/numeric second arg this is the
    math logarithm (our pre-existing registry meaning)."""
    if level is not None:
        base_or_level = level
    if isinstance(base_or_level, str):
        import logging

        logging.getLogger("vector_ray.vrl").info(
            "%s", _arr(c)[0].as_py() if len(_arr(c)) else "")
        return pa.nulls(len(_arr(c)))
    c = _arr(c).cast(pa.float64())
    if base_or_level is None:
        return pc.ln(c)
    return pc.logb(c, float(base_or_level))


@register("haversine")
def _haversine(lat1, lon1, lat2, lon2, measurement_system="kilometers"):
    """Great-circle distance AND initial bearing (haversine.cue
    returns {distance, bearing}); args may be aligned arrays or
    scalars.  IUGG mean earth radius 6371.0088 km / 3958.7613 mi,
    distance rounded to 7 decimals and bearing to 3 like the spec
    examples."""
    a1, o1 = np.radians(_np_or_scalar(lat1)), np.radians(_np_or_scalar(lon1))
    a2, o2 = np.radians(_np_or_scalar(lat2)), np.radians(_np_or_scalar(lon2))
    h = (np.sin((a2 - a1) / 2) ** 2
         + np.cos(a1) * np.cos(a2) * np.sin((o2 - o1) / 2) ** 2)
    r = 6371.0088 if measurement_system == "kilometers" else 3958.7613832
    dist = np.round(np.atleast_1d(2 * r * np.arcsin(np.sqrt(h))), 7)
    y = np.sin(o2 - o1) * np.cos(a2)
    x = np.cos(a1) * np.sin(a2) - np.sin(a1) * np.cos(a2) * np.cos(o2 - o1)
    bearing = np.round(np.atleast_1d(np.degrees(np.arctan2(y, x))) % 360.0, 3)
    return pa.StructArray.from_arrays(
        [pa.array(dist), pa.array(bearing)], names=["distance", "bearing"]
    )


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


# CRC parameter catalog — (width, poly, init, refin, refout, xorout)
# from the public CRC RevEng database (the names crc.cue exposes).
_CRC_CATALOG = {
    "CRC_8_SMBUS": (8, 0x07, 0x00, False, False, 0x00),
    "CRC_8_MAXIM_DOW": (8, 0x31, 0x00, True, True, 0x00),
    "CRC_16_ARC": (16, 0x8005, 0x0000, True, True, 0x0000),
    "CRC_16_IBM_SDLC": (16, 0x1021, 0xFFFF, True, True, 0xFFFF),
    "CRC_16_IBM_3740": (16, 0x1021, 0xFFFF, False, False, 0x0000),
    "CRC_16_KERMIT": (16, 0x1021, 0x0000, True, True, 0x0000),
    "CRC_16_XMODEM": (16, 0x1021, 0x0000, False, False, 0x0000),
    "CRC_16_MODBUS": (16, 0x8005, 0xFFFF, True, True, 0x0000),
    "CRC_16_USB": (16, 0x8005, 0xFFFF, True, True, 0xFFFF),
    "CRC_32_ISO_HDLC": (32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
    "CRC_32_CKSUM": (32, 0x04C11DB7, 0x00000000, False, False, 0xFFFFFFFF),
    "CRC_32_BZIP2": (32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0xFFFFFFFF),
    "CRC_32_ISCSI": (32, 0x1EDC6F41, 0xFFFFFFFF, True, True, 0xFFFFFFFF),
    "CRC_32_JAMCRC": (32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0x00000000),
    "CRC_32_MPEG_2": (32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0x00000000),
    "CRC_32_XFER": (32, 0x000000AF, 0x00000000, False, False, 0x00000000),
    "CRC_64_ECMA_182": (64, 0x42F0E1EBA9EA3693, 0x0, False, False, 0x0),
    "CRC_64_GO_ISO": (64, 0x000000000000001B, 0xFFFFFFFFFFFFFFFF, True, True,
                      0xFFFFFFFFFFFFFFFF),
    "CRC_64_XZ": (64, 0x42F0E1EBA9EA3693, 0xFFFFFFFFFFFFFFFF, True, True,
                  0xFFFFFFFFFFFFFFFF),
    "CRC_64_REDIS": (64, 0xAD93D23594C935A9, 0x0, True, True, 0x0),
}


def _crc_compute(data: bytes, width, poly, init, refin, refout, xorout) -> int:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    crc = init
    for byte in data:
        if refin:
            byte = int(f"{byte:08b}"[::-1], 2)
        crc ^= byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
            crc &= mask
    if refout:
        crc = int(f"{crc:0{width}b}"[::-1], 2)
    return crc ^ xorout


@register("crc")
def _crc(c, algorithm="CRC_32_ISO_HDLC"):
    """crc(value, algorithm) — generic bitwise CRC over the RevEng
    parameter catalog (crc.cue names; default CRC_32_ISO_HDLC = the
    zlib crc32); returns the checksum as a decimal string."""
    if algorithm in ("CRC-32", "CRC-32/ISO-HDLC"):
        algorithm = "CRC_32_ISO_HDLC"
    if algorithm not in _CRC_CATALOG:
        raise ValueError(
            f"crc: unknown algorithm {algorithm!r} (have {sorted(_CRC_CATALOG)})")
    params = _CRC_CATALOG[algorithm]
    if algorithm == "CRC_32_ISO_HDLC":
        import binascii

        return _rowmap(
            c, lambda s: str(binascii.crc32(s.encode() if isinstance(s, str) else s)
                             & 0xFFFFFFFF), pa.string())
    return _rowmap(
        c, lambda s: str(_crc_compute(s.encode() if isinstance(s, str) else s,
                                      *params)), pa.string())


_SEA_M = 0x6EED0E9DA4D94A4F
_U64 = 0xFFFFFFFFFFFFFFFF


def _sea_diffuse(x: int) -> int:
    x = (x * _SEA_M) & _U64
    x ^= (x >> 32) >> (x >> 60)
    return (x * _SEA_M) & _U64


@register("seahash")
def _seahash(c):
    """Real SeaHash (public algorithm, seahash crate / ticki's spec):
    4 lanes round-robin, diffuse(x*M; x^=(x>>32)>>(x>>60); x*M),
    finalize diffuse(a^b^c^d^len).  Bit-for-bit with seahash.cue
    examples."""
    def _one(s):
        b = s.encode() if isinstance(s, str) else s
        lanes = [0x16F11FE89B0D677C, 0xB480A793D8E6C86C,
                 0x6FE2E5AAF078EBC9, 0x14F994A4C5259381]
        for i in range(0, len(b), 8):
            chunk = int.from_bytes(b[i : i + 8], "little")
            lanes[(i // 8) % 4] = _sea_diffuse(lanes[(i // 8) % 4] ^ chunk)
        h = _sea_diffuse(
            lanes[0] ^ lanes[1] ^ lanes[2] ^ lanes[3] ^ len(b))
        return h - (1 << 64) if h >= (1 << 63) else h

    return _rowmap(c, _one, pa.int64())


# ---- real xxHash (public algorithm, Cyan4973/xxHash spec)

_XXH32_P = (2654435761, 2246822519, 3266489917, 668265263, 374761393)
_XXH64_P = (11400714785074694791, 14029467366897019727, 1609587929392839161,
            9650029242287828579, 2870177450012600261)


def _rotl32(x, r):
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & _U64


def _xxh32(b: bytes, seed: int = 0) -> int:
    P1, P2, P3, P4, P5 = _XXH32_P
    n = len(b)
    i = 0
    if n >= 16:
        v1 = (seed + P1 + P2) & 0xFFFFFFFF
        v2 = (seed + P2) & 0xFFFFFFFF
        v3 = seed & 0xFFFFFFFF
        v4 = (seed - P1) & 0xFFFFFFFF
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(b[i + 4 * j : i + 4 * j + 4], "little")
                v = (v + lane * P2) & 0xFFFFFFFF
                v = (_rotl32(v, 13) * P1) & 0xFFFFFFFF
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & 0xFFFFFFFF
    else:
        h = (seed + P5) & 0xFFFFFFFF
    h = (h + n) & 0xFFFFFFFF
    while i <= n - 4:
        h = (h + int.from_bytes(b[i : i + 4], "little") * P3) & 0xFFFFFFFF
        h = (_rotl32(h, 17) * P4) & 0xFFFFFFFF
        i += 4
    while i < n:
        h = (h + b[i] * P5) & 0xFFFFFFFF
        h = (_rotl32(h, 11) * P1) & 0xFFFFFFFF
        i += 1
    h ^= h >> 15
    h = (h * P2) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * P3) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _xxh64_round(acc, lane):
    acc = (acc + lane * _XXH64_P[1]) & _U64
    return (_rotl64(acc, 31) * _XXH64_P[0]) & _U64


def _xxh64_merge(h, acc):
    h ^= _xxh64_round(0, acc)
    return (h * _XXH64_P[0] + _XXH64_P[3]) & _U64


def _xxh64(b: bytes, seed: int = 0) -> int:
    P1, P2, P3, P4, P5 = _XXH64_P
    n = len(b)
    i = 0
    if n >= 32:
        v = [(seed + P1 + P2) & _U64, (seed + P2) & _U64, seed & _U64,
             (seed - P1) & _U64]
        while i <= n - 32:
            for j in range(4):
                lane = int.from_bytes(b[i + 8 * j : i + 8 * j + 8], "little")
                v[j] = _xxh64_round(v[j], lane)
            i += 32
        h = (_rotl64(v[0], 1) + _rotl64(v[1], 7) + _rotl64(v[2], 12)
             + _rotl64(v[3], 18)) & _U64
        for j in range(4):
            h = _xxh64_merge(h, v[j])
    else:
        h = (seed + P5) & _U64
    h = (h + n) & _U64
    while i <= n - 8:
        h ^= _xxh64_round(0, int.from_bytes(b[i : i + 8], "little"))
        h = (_rotl64(h, 27) * P1 + P4) & _U64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(b[i : i + 4], "little") * P1) & _U64
        h = (_rotl64(h, 23) * P2 + P3) & _U64
        i += 4
    while i < n:
        h ^= (b[i] * P5) & _U64
        h = (_rotl64(h, 11) * P1) & _U64
        i += 1
    h ^= h >> 33
    h = (h * P2) & _U64
    h ^= h >> 29
    h = (h * P3) & _U64
    h ^= h >> 32
    return h


@register("xxhash")
def _xxhash(c, variant="XXH32", seed=0):
    """xxhash(value, variant) — real XXH32 (default) / XXH64
    (xxhash.cue).  XXH3 variants are not implemented (documented
    gap)."""
    if variant in ("XXH32", 32, "32"):
        return _rowmap(
            c, lambda s: _xxh32(s.encode() if isinstance(s, str) else s, seed),
            pa.int64())

    def _one(s):
        h = _xxh64(s.encode() if isinstance(s, str) else s, seed)
        return h - (1 << 64) if h >= (1 << 63) else h

    if variant in ("XXH64", 64, "64"):
        return _rowmap(c, _one, pa.int64())
    raise ValueError(f"xxhash: unsupported variant {variant!r}")


# upgrade the early stand-in registration to the real algorithm
register("xxhash64")(lambda c, seed=0: FUNCTIONS["xxhash"](c, "XXH64", seed))


@register("community_id")
def _community_id(source_ip, destination_ip=None, protocol=None,
                  source_port=0, destination_port=0, seed=0):
    src_ip, dst_ip, proto = source_ip, destination_ip, protocol
    src_port, dst_port = source_port, destination_port
    """Corelight Community ID v1 flow hash (public spec
    corelight/community-id-spec): sha1 over seed + sorted endpoint
    tuple, base64, "1:" prefix.  Argument order follows
    community_id.cue: (source_ip, destination_ip, protocol,
    source_port, destination_port, seed)."""
    import base64
    import hashlib
    import socket
    import struct

    def _strs(x, n=None):
        if isinstance(x, str):
            return [x] * (n or 1)
        return _arr(x).to_pylist()

    sips = _strs(src_ip)
    n = len(sips)
    dips = _strs(dst_ip, n)
    protos = _np_or_scalar(proto)
    sps = _np_or_scalar(src_port)
    dps = _np_or_scalar(dst_port)

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
            b.encode("utf-8", "surrogateescape") if isinstance(b, str) else b,
            asbytes=True), pa.binary())

    return enc


def _stream_decode(codec_name):
    """Framed codecs (zstd/lz4-frame) carry their own size — decompress
    through Arrow's CompressedInputStream."""
    def dec(c):
        def _one(b):
            if isinstance(b, str):
                b = b.encode("utf-8", "surrogateescape")
            st = pa.CompressedInputStream(pa.BufferReader(b), codec_name)
            return bytes(st.read())

        return _rowmap(c, _one, pa.binary())

    return dec


register("encode_zstd")(_codec_encode("zstd"))
register("decode_zstd")(_stream_decode("zstd"))
@register("encode_lz4")
def _encode_lz4(c, prepend_size=True):
    """encode_lz4.cue: the reference's lz4_flex BLOCK format — raw lz4
    block, optionally (default) prefixed with the uncompressed size as
    4 LE bytes.  (pyarrow's "lz4_raw" codec is the block format; "lz4"
    is the frame container — decode_lz4 accepts both.)"""
    import struct

    codec = pa.Codec("lz4_raw")

    def _one(b):
        data = b.encode("utf-8", "surrogateescape") if isinstance(b, str) else b
        block = codec.compress(data, asbytes=True)
        return (struct.pack("<I", len(data)) + block) if prepend_size else block

    return _rowmap(c, _one, pa.binary())


def _lz4_block_size(b: bytes) -> int:
    """Decompressed size of a bare LZ4 block, by walking its sequences
    (token nibbles + LSIC length extensions — the public block spec).
    Needed because Arrow's lz4_raw decompress wants the exact size."""
    pos, out = 0, 0
    n = len(b)
    while pos < n:
        token = b[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                x = b[pos]
                pos += 1
                lit += x
                if x != 255:
                    break
        out += lit
        pos += lit
        if pos >= n:
            break  # last sequence: literals only
        pos += 2  # match offset
        mlen = token & 0xF
        if mlen == 15:
            while True:
                x = b[pos]
                pos += 1
                mlen += x
                if x != 255:
                    break
        out += mlen + 4
    return out


@register("decode_lz4")
def _decode_lz4(c, buf_size=None, prepended_size=True, use_prepended_size=None):
    """decode_lz4.cue: size-prepended block (default), bare block (size
    recovered by walking the block; ``buf_size`` overrides), or an lz4
    FRAME (auto-detected by magic)."""
    import struct

    if use_prepended_size is not None:  # decode_lz4.cue argument name
        prepended_size = use_prepended_size
    raw = pa.Codec("lz4_raw")

    def _one(b):
        if isinstance(b, str):
            b = b.encode("utf-8", "surrogateescape")
        if b[:4] == b"\x04\x22\x4d\x18":  # frame magic
            st = pa.CompressedInputStream(pa.BufferReader(b), "lz4")
            return bytes(st.read())
        if prepended_size and len(b) >= 4:
            (size,) = struct.unpack("<I", b[:4])
            try:
                return raw.decompress(b[4:], size, asbytes=True)
            except Exception:
                pass  # fall through to the bare-block path
        size = buf_size if buf_size is not None else _lz4_block_size(b)
        return raw.decompress(b, size, asbytes=True)

    return _rowmap(c, _one, pa.binary())
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
    return _rowmap(
        c,
        lambda b: (b if isinstance(b, bytes)
                   else b.encode("utf-8", "surrogateescape")).decode(charset),
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
def _compact(c, recursive=True, null=True, string=True, object=True,
             array=True, nullish=False):
    """compact(value, …) — drop empty values from objects/arrays per
    the cue option set: null, "" (string), {} (object), [] (array);
    ``recursive`` compacts nested containers first; ``nullish`` also
    drops whitespace-only/"-" strings (compact.cue)."""
    from .scalar import obj_array

    def _is_empty(v):
        if v is None:
            return null
        if isinstance(v, str):
            if string and v == "":
                return True
            return nullish and (v.strip() == "" or v == "-")
        if isinstance(v, dict):
            return object and not v
        if isinstance(v, list):
            return array and not v
        return False

    def _one(v):
        if recursive:
            if isinstance(v, dict):
                v = {k: _one(x) for k, x in v.items()}
            elif isinstance(v, list):
                v = [_one(x) for x in v]
        if isinstance(v, dict):
            return {k: x for k, x in v.items() if not _is_empty(x)}
        if isinstance(v, list):
            return [x for x in v if not _is_empty(x)]
        return v

    c = _arr(c)
    if pa.types.is_map(c.type) or pa.types.is_struct(c.type):
        rows = _map_to_dicts(c)
        out = [None if d is None else _one(d) for d in rows]
        if pa.types.is_map(c.type):
            return _to_map_array(out)
        return obj_array(out)
    return obj_array([None if l is None else _one(l) for l in c.to_pylist()])


@register("flatten")
def _flatten(c, separator="."):
    from .scalar import is_vrl_json

    c = _arr(c)
    if pa.types.is_list(c.type) and (
        pa.types.is_list(c.type.value_type)
        or is_vrl_json(c.type.value_type)
    ):
        # recursive per-row flatten to a single level (flatten.cue:
        # [1,[2,3,4],[5,[6,7],8],9] → [1..9]); pc.list_flatten would
        # remove the OUTER nesting and change the row count
        def _rec(l, out):
            for x in l:
                if isinstance(x, list):
                    _rec(x, out)
                else:
                    out.append(x)
            return out

        # rebuild through obj_array: flattened rows may STILL be
        # heterogeneous (["a", [1, true]] → ["a", 1, true]) and a bare
        # pa.array() cannot infer a mixed element type
        from .scalar import obj_array

        return obj_array(
            [None if l is None else _rec(l, []) for l in c.to_pylist()]
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
def _zip(a, b=None):
    """zip(array_0, array_1) pairs two arrays (truncating to the
    shorter); zip(array_of_arrays) transposes (zip.cue)."""
    av = _arr(a).to_pylist()
    if b is None:
        return pa.array(
            [None if l is None else [list(t) for t in zip(*l)] for l in av]
        )
    bv = _arr(b).to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else b
    out = []
    for i, l in enumerate(av):
        r = bv[i] if isinstance(bv, list) and isinstance(bv[i], list) else bv
        out.append(None if l is None else [list(t) for t in zip(l, r)])
    return pa.array(out)


@register("match_array")
def _match_array(c, pattern, all=False):
    rx = re.compile(pattern)
    if all:
        op = lambda l: not any(rx.search(str(v)) is None for v in l)  # noqa: E731
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


@register("get")
def _get(c, path=None):
    """get(value, path) — per-row dynamic path segments supported
    (column keys, the for_each tally idiom)."""
    if _has_column(path):
        rows, kind = _obj_rows(c)
        if kind is None:
            raise ValueError("get() needs a map/struct/array column")
        n = len(rows)
        segs = path if isinstance(path, (list, tuple)) else [path]
        seg_rows = [_per_row(s, n) for s in segs]
        out = []
        for i, d in enumerate(rows):
            ks = []
            for sr in seg_rows:
                seg = sr[i]
                ks.extend(seg if isinstance(seg, list) else [seg])
            if d is None or any(k is None for k in ks):
                out.append(None)
                continue
            cur = d
            for k in ks:
                try:
                    cur = cur[k]
                except (KeyError, IndexError, TypeError):
                    cur = None
                    break
            if cur is None and isinstance(d, dict) and len(ks) >= 1:
                # flat-map compatibility: dotted key form
                cur = d.get(".".join(str(k) for k in ks))
            out.append(cur)
        from .scalar import obj_array

        return obj_array(out)
    return FUNCTIONS["get_path"](c, path)
register("merge")(
    lambda c, other, deep=False: FUNCTIONS["merge_objects"](c, other, deep)
)


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
def _object_from_array(c, keys=None):
    """list<list[k, v]> / list<struct<key,value>> → map; with
    ``keys``, pairs keys[i] with values[i].  Null keys drop the entry
    (object_from_array.cue)."""
    def _one(l):
        out = {}
        for item in l:
            if isinstance(item, dict):
                k = item.get("key")
                if k is not None:
                    out[k] = item.get("value")
            elif item is not None and item[0] is not None:
                out[item[0]] = item[1] if len(item) > 1 else None
        return out

    from .scalar import obj_array

    vals = _arr(c).to_pylist()
    if keys is not None:
        return obj_array(
            [None if l is None else
             {k: v for k, v in zip(keys, l) if k is not None}
             for l in vals]
        )
    return obj_array([None if l is None else _one(l) for l in vals])


@register("unflatten")
def _unflatten(c, separator=".", recursive=True):
    """unflatten(value, separator, recursive) — dotted keys → nested
    objects (unflatten.cue): ``recursive`` re-unflattens nested map
    values; scalar/object conflicts resolve in favor of the object."""
    from .scalar import obj_array

    def _one(d, depth=True):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict) and recursive:
                v = _one(v)
            parts = k.split(separator)
            cur = out
            ok = True
            for p in parts[:-1]:
                nxt = cur.get(p)
                if not isinstance(nxt, dict):
                    nxt = {}
                    cur[p] = nxt
                cur = nxt
            leaf = parts[-1]
            if isinstance(cur.get(leaf), dict) and not isinstance(v, dict):
                continue  # object wins over conflicting scalar
            cur[leaf] = v
        return out

    dicts = [None if d is None else _one(d) for d in _map_to_dicts(c)]
    return obj_array(dicts)


def _path_key(key):
    """set/remove accept the spec's array paths (set.cue: ["a","b"]).
    Our maps are flat string maps, so nested paths address dotted
    keys."""
    if isinstance(key, (list, tuple)):
        return ".".join(str(k) for k in key)
    return key


def _obj_rows(c):
    """Rows of a map/struct/list column as plain Python objects, or
    None if the column isn't object-shaped."""
    c = _arr(c)
    if pa.types.is_map(c.type):
        return [None if v is None else dict(v) for v in c.to_pylist()], "map"
    if pa.types.is_struct(c.type) or pa.types.is_list(c.type) \
            or pa.types.is_large_list(c.type):
        return c.to_pylist(), "py"
    return None, None


def _rebuild_obj(rows, kind):
    if kind == "map":
        return _to_map_array(rows)
    try:
        return pa.array(rows)
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        import json as _json

        return pa.array(
            [None if r is None else _json.dumps(r, sort_keys=True) for r in rows],
            type=pa.string(),
        )


def _path_set(obj, path, value):
    """VRL path assignment (set.cue): string segments key into maps,
    int segments index arrays; intermediate containers are created."""
    if not isinstance(path, (list, tuple)):
        path = [path]
    cur = obj
    for i, seg in enumerate(path):
        last = i == len(path) - 1
        if isinstance(seg, int):
            if not isinstance(cur, list):
                return obj
            while len(cur) <= seg:
                cur.append(None)
            if last:
                cur[seg] = value
            else:
                if not isinstance(cur[seg], (dict, list)):
                    cur[seg] = {} if isinstance(path[i + 1], str) else []
                cur = cur[seg]
        else:
            if not isinstance(cur, dict):
                return obj
            if last:
                cur[seg] = value
            else:
                if not isinstance(cur.get(seg), (dict, list)):
                    cur[seg] = {} if isinstance(path[i + 1], str) else []
                cur = cur[seg]
    return obj


def _path_remove(obj, path, compact=False):
    """VRL path removal (remove.cue): negative ints index from the
    end; ``compact`` drops emptied containers on the way back up."""
    if not isinstance(path, (list, tuple)):
        path = [path]
    parents = []
    cur = obj
    for seg in path[:-1]:
        parents.append((cur, seg))
        if isinstance(seg, int) and isinstance(cur, list):
            if not -len(cur) <= seg < len(cur):
                return obj
            cur = cur[seg]
        elif isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return obj
    leaf = path[-1]
    if isinstance(leaf, int) and isinstance(cur, list):
        if -len(cur) <= leaf < len(cur):
            del cur[leaf]
    elif isinstance(cur, dict):
        cur.pop(leaf, None)
    if compact:
        for parent, seg in reversed(parents):
            child = parent[seg]
            if isinstance(child, (dict, list)) and not child:
                if isinstance(seg, int):
                    del parent[seg]
                else:
                    parent.pop(seg, None)
            else:
                break
    return obj


def _typed_map_array(dicts):
    """Map array with a typed value column when all values share an
    Arrow-inferable type (int counts stay ints — the for_each tally
    shape); falls back to the flat string map."""
    vals = [v for d in dicts if d for v in d.values() if v is not None]
    try:
        vt = pa.array(vals).type if vals else pa.string()
        return pa.array(
            [None if d is None else list(d.items()) for d in dicts],
            type=pa.map_(pa.string(), vt),
        )
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        raise ValueError(
            "object value types can't unify in a columnar batch "
            f"({sorted({type(v).__name__ for v in vals})}) — encode "
            "values to one type (to_string/to_int) before set()"
        )


def _per_row(x, n):
    """Per-row values for set/get args: an Arrow array → python list,
    a scalar → repeated."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return _arr(x).to_pylist()
    return [x] * n


def _has_column(x):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return True
    if isinstance(x, (list, tuple)):
        return any(isinstance(s, (pa.Array, pa.ChunkedArray)) for s in x)
    return False


@register("set")
def _set(c, path, data=None, *, key=None, value=None):
    if key is not None:
        path = key
    if value is not None:
        data = value
    key, value = path, data
    """set(value, path, data) — nested object/array path assignment
    (set.cue); flat maps address dotted keys for compatibility.
    Path segments and the value may be COLUMNS (per-row dynamic keys —
    the for_each tally idiom builds a per-row map this way)."""
    rows, kind = _obj_rows(c)
    if kind is not None and (_has_column(key) or _has_column(value)):
        import copy

        n = len(rows)
        segs = key if isinstance(key, (list, tuple)) else [key]
        seg_rows = [_per_row(s, n) for s in segs]
        val_rows = _per_row(value, n)
        out = []
        for i, d in enumerate(rows):
            if d is None:
                out.append(None)
                continue
            ks = []
            for sr in seg_rows:
                seg = sr[i]
                # a list-typed per-row segment IS that row's path array
                ks.extend(seg if isinstance(seg, list) else [seg])
            if any(k is None for k in ks):
                out.append(d)
                continue
            if isinstance(d, dict):
                nd = dict(d)
                nd[".".join(str(k) for k in ks)] = val_rows[i]
            else:
                # array (or nested) rows: per-row path assignment
                nd = _path_set(copy.deepcopy(d), ks, val_rows[i])
            out.append(nd)
        if kind == "map" or all(isinstance(r, dict) for r in out if r is not None):
            return _typed_map_array(out)
        return _rebuild_obj(out, "py")
    if kind == "map" and not (isinstance(key, (list, tuple))
                              and any(isinstance(s, int) for s in key)):
        key = _path_key(key)

        def _upd(d):
            d = dict(d)
            d[key] = value
            return d

        return _to_map_array([None if d is None else _upd(d) for d in rows])
    if kind is None:
        raise ValueError("set() needs a map/struct/array column")
    import copy

    return _rebuild_obj(
        [None if r is None else _path_set(copy.deepcopy(r), key, value)
         for r in rows], "py")


@register("del")
def _del(c, key):
    key = _path_key(key)

    def _upd(d):
        d = dict(d)
        d.pop(key, None)
        return d

    return _to_map_array([None if d is None else _upd(d) for d in _map_to_dicts(c)])


@register("remove")
def _remove(c, path=None, compact=False, *, key=None):
    if key is not None:
        path = key
    key = path
    """remove(value, path, compact) — nested path removal with
    negative array indexing and optional empty-container compaction
    (remove.cue)."""
    rows, kind = _obj_rows(c)
    if kind == "map" and not compact and not (
            isinstance(key, (list, tuple))
            and any(isinstance(s, int) for s in key)):
        return FUNCTIONS["del"](c, _path_key(key))
    if kind is None:
        raise ValueError("remove() needs a map/struct/array column")
    import copy

    return _rebuild_obj(
        [None if r is None else _path_remove(copy.deepcopy(r), key, compact)
         for r in rows], "py")


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
def _parse_key_value(c, key_value_delimiter="=", field_delimiter=" ",
                     whitespace="lenient", accept_standalone_key=True):
    """parse_key_value(value, key_value_delimiter, field_delimiter,
    whitespace, accept_standalone_key) — logfmt-style parsing
    (parse_key_value.cue): quoted values, lenient whitespace (an
    unquoted value runs until the next key token), standalone keys
    become true, duplicate keys accumulate into arrays."""
    from .scalar import obj_array

    def _one(s):
        out = {}
        fields = []
        # split on field_delimiter but respect double quotes
        buf, q = [], False
        for ch in s:
            if ch == '"':
                q = not q
                buf.append(ch)
            elif not q and s is not None and ch == field_delimiter:
                fields.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        fields.append("".join(buf))

        def _put(k, v):
            if k in out:
                if isinstance(out[k], list):
                    out[k].append(v)
                else:
                    out[k] = [out[k], v]
            else:
                out[k] = v

        pend_k = None  # lenient mode: accumulate value words
        pend_v = []
        for part in fields:
            stripped = part.strip()
            if not stripped:
                continue
            # a part is a new key token if it contains the kv delimiter
            # OUTSIDE quotes before any quote
            qi = stripped.find('"')
            di = stripped.find(key_value_delimiter)
            is_kv = di >= 0 and (qi < 0 or di < qi)
            if is_kv:
                if pend_k is not None:
                    _put(pend_k, " ".join(pend_v) if pend_v else True)
                k, v = stripped.split(key_value_delimiter, 1)
                k, v = k.strip().strip('"'), v.strip()
                if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                    _put(k, v[1:-1])
                    pend_k, pend_v = None, []
                elif whitespace == "lenient":
                    pend_k, pend_v = k, ([v] if v else [])
                else:
                    _put(k, v)
                    pend_k, pend_v = None, []
            elif pend_k is not None and whitespace == "lenient"                     and field_delimiter.strip() == "":
                # continuation word of an unquoted lenient value
                pend_v.append(stripped)
            elif accept_standalone_key:
                if pend_k is not None:
                    _put(pend_k, " ".join(pend_v) if pend_v else True)
                    pend_k, pend_v = None, []
                _put(stripped.strip('"'), True)
            else:
                if pend_k is not None:
                    _put(pend_k, " ".join(pend_v) if pend_v else True)
                    pend_k, pend_v = None, []
        if pend_k is not None:
            _put(pend_k, " ".join(pend_v) if pend_v else True)
        return out

    return obj_array([None if s is None else _one(s)
                      for s in _arr(c).to_pylist()])


register("parse_logfmt")(lambda c: FUNCTIONS["parse_key_value"](c, "=", " "))


@register("parse_grok")
def _parse_grok(c, pattern, aliases=None):
    from ..parse import grok_to_regex

    rx = re.compile(grok_to_regex(pattern, extra_patterns=aliases)[0])

    def _one(s):
        m = rx.search(s)
        return m.groupdict() if m else None

    return _to_map_array([None if s is None else _one(s)
                          for s in _arr(c).to_pylist()])


_GROK_ALIAS_CACHE: dict = {}


@register("parse_groks")
def _parse_groks(c, patterns, aliases=None, alias_sources=None):
    """parse_groks(value, patterns, aliases, alias_sources) — first
    matching pattern wins; ``aliases`` adds custom grok pattern names
    usable inside the patterns, ``alias_sources`` loads additional
    aliases from JSON files (parse_groks.cue)."""
    from ..parse import grok_to_regex

    aliases = dict(aliases or {})
    if alias_sources:
        if isinstance(alias_sources, str):
            alias_sources = [alias_sources]
        for src in alias_sources:
            # cached per path: this runs inside the per-batch scalar
            # call — re-reading the file per block would put disk I/O
            # in the hot path (reference caches loaded sources too)
            loaded = _GROK_ALIAS_CACHE.get(src)
            if loaded is None:
                with open(src, encoding="utf-8") as fh:
                    loaded = json.load(fh)
                if not isinstance(loaded, dict):
                    raise ValueError(
                        f"alias source {src!r} is not a JSON object")
                _GROK_ALIAS_CACHE[src] = loaded
            aliases.update(loaded)

    rxs = [re.compile(grok_to_regex(p, extra_patterns=aliases)[0]) for p in patterns]

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
    """Ruby-hash literals → string map; nested objects/arrays keep
    JSON serialization (parse_ruby_hash.cue nesting), scalars
    stringify like parse_json."""
    from .scalar import obj_array

    def _one(s):
        t = re.sub(r"\bnil\b", "null", s.replace("=>", ":"))
        return json.loads(t)

    return obj_array([None if s is None else _one(s)
                      for s in _arr(c).to_pylist()])


@register("parse_xml")
def _parse_xml(c, include_attr=True, attr_prefix="@", text_key="text",
               always_use_text_key=False, parse_bool=True, parse_null=True,
               parse_number=True):
    """parse_xml.cue conventions: attributes as ``@attr`` keys, text
    nodes under ``text_key`` (collapsed to the bare value for
    text-only elements unless ``always_use_text_key``), repeated
    sibling tags as arrays, and true/null/number coercion flags."""
    import xml.etree.ElementTree as ET

    from .scalar import obj_array

    def _coerce(s):
        if s is None:
            return None
        if parse_bool and s in ("true", "false"):
            return s == "true"
        if parse_null and s == "null":
            return None
        if parse_number:
            # strict digit shapes only — python's int()/float() accept
            # underscores ("1_0" → 10) and inf spellings that must stay
            # strings
            import re as _re

            if _re.fullmatch(r"-?[0-9]+", s, _re.ASCII):
                return int(s)
            if _re.fullmatch(
                r"-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?", s, _re.ASCII
            ) and not _re.fullmatch(r"-?[0-9]+", s, _re.ASCII):
                return float(s)
        return s

    def _elem(e):
        out = {}
        if include_attr:
            for k, v in e.attrib.items():
                out[f"{attr_prefix}{k}"] = _coerce(v)
        for child in e:
            v = _elem(child)
            if child.tag in out:
                prev = out[child.tag]
                if isinstance(prev, list):
                    prev.append(v)
                else:
                    out[child.tag] = [prev, v]
            else:
                out[child.tag] = v
        text = (e.text or "").strip()
        if text:
            if out or always_use_text_key:
                out[text_key] = _coerce(text)
            else:
                return _coerce(text)
        return out

    def _one(s):
        root = ET.fromstring(s)
        return {root.tag: _elem(root)}

    return obj_array([None if s is None else _one(s)
                      for s in _arr(c).to_pylist()])


@register("parse_influxdb")
def _parse_influxdb(c):
    """parse_influxdb(value) — line-protocol line → ARRAY of
    vector-metric-shaped objects {name, tags, timestamp, kind,
    gauge:{value}} per field, matching parse_influxdb.cue (bools → 1/0,
    ints/uints → float, ns epoch → RFC 3339)."""
    import datetime as _dt

    from .scalar import obj_array
    from ..codecs import parse_influx_line

    def _one(s):
        flat = parse_influx_line(s)
        if flat is None:
            return None
        measurement = flat.get("measurement")
        tags = {k[4:]: v for k, v in flat.items() if k.startswith("tag.")}
        ts = flat.get("timestamp")
        iso = None
        if ts not in (None, ""):
            d = _dt.datetime.fromtimestamp(int(ts) / 1e9, _dt.timezone.utc)
            iso = d.replace(tzinfo=None)
        out = []
        for k, v in flat.items():
            if not k.startswith("field."):
                continue
            sv = str(v)
            if sv in ("true", "True"):
                fv = 1.0
            elif sv in ("false", "False"):
                fv = 0.0
            else:
                fv = float(sv.rstrip("iu"))
            out.append({
                "name": f"{measurement}_{k[6:]}",
                "tags": tags,
                "timestamp": iso,
                "kind": "absolute",
                "gauge": {"value": fv},
            })
        return out

    return obj_array([None if s is None else _one(s)
                      for s in _arr(c).to_pylist()])


@register("parse_bytes")
def _parse_bytes(c, unit="B", base=2):
    """parse_bytes(value, unit, base) — parse a byte quantity and
    express it IN ``unit`` (parse_bytes.cue: parse_bytes("1024KiB",
    unit: "MiB") == 1.0).  ``base`` (2 default, or "10") resolves
    ambiguous KB/MB/… suffixes; KiB/MiB/… are always binary."""
    def _units(b):
        k = 1024 if str(b) == "2" else 1000
        u = {"b": 1, "byte": 1, "bytes": 1,
             "kb": k, "mb": k**2, "gb": k**3, "tb": k**4, "pb": k**5,
             "kib": 1024, "mib": 1024**2, "gib": 1024**3, "tib": 1024**4,
             "pib": 1024**5}
        return u

    units = _units(base)
    out_size = units.get(str(unit).lower())
    if out_size is None:
        raise ValueError(f"parse_bytes: unknown unit {unit!r}")
    rx = re.compile(r"^\s*([\d.]+)\s*([A-Za-z]+)?\s*$")

    def _one(s):
        m = rx.match(s)
        if not m:
            raise ValueError(f"parse_bytes: unable to parse {s!r}")
        qty = float(m.group(1))
        u = (m.group(2) or "B").lower()
        if u not in units:
            raise ValueError(f"parse_bytes: unknown unit {u!r}")
        return float(qty * units[u]) / out_size

    return _rowmap(c, _one, pa.float64())


register("parse_float")(lambda c: _arr(c).cast(pa.string()).cast(pa.float64()))


# well-known single + two-level public suffixes (honest subset — the
# reference embeds the full Mozilla public-suffix list; this container
# has no data file for it, documented deviation)
_KNOWN_SUFFIXES = {
    "com", "net", "org", "edu", "gov", "mil", "int", "io", "co", "uk",
    "de", "fr", "jp", "au", "br", "cn", "mx", "in", "ru", "nl", "it",
    "es", "dev", "app", "ai",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "com.br", "com.cn", "com.mx",
    "co.in", "co.nz", "com.sg",
}


@register("parse_etld")
def _parse_etld(c, plus_parts=0, psl=None):
    """parse_etld(value, plus_parts, psl) → struct {etld, etld_plus,
    known_suffix} (parse_etld.cue).  Suffix knowledge comes from an
    embedded well-known subset, or a caller-supplied PSL file path."""
    suffixes = set(_KNOWN_SUFFIXES)
    if psl:
        with open(psl) as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith("//"):
                    suffixes.add(line.lstrip("*."))

    etlds, pluses, knowns = [], [], []
    for s in _arr(c).to_pylist():
        if s is None:
            etlds.append(None), pluses.append(None), knowns.append(None)
            continue
        labels = s.lower().rstrip(".").split(".")
        n = 1
        known = False
        # longest known suffix wins
        for k in range(len(labels), 0, -1):
            if ".".join(labels[-k:]) in suffixes:
                n, known = k, True
                break
        etlds.append(".".join(labels[-n:]))
        k = min(len(labels), n + int(plus_parts))
        pluses.append(".".join(labels[-k:]))
        knowns.append(known)
    return pa.StructArray.from_arrays(
        [pa.array(etlds, pa.string()), pa.array(pluses, pa.string()),
         pa.array(knowns, pa.bool_())],
        names=["etld", "etld_plus", "known_suffix"],
    )


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

    arr = _arr(c)
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
    ts = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    ts = np.where(np.isnan(ts.astype(np.float64)), 0, ts) // 1000
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


def _kv_encode_row(d, fields_ordering, key_value_delimiter,
                   field_delimiter, flatten_boolean):
    """Shared key-value/logfmt encoder (encode_key_value.cue):
    nested objects flatten to dotted keys, unordered fields sort
    lexicographically after the ordered prefix, values containing
    whitespace/delimiters quote, flatten_boolean renders true as a
    bare key and drops false."""

    def _flat(obj, prefix=""):
        out = {}
        for k, v in obj.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(_flat(v, key))
            else:
                out[key] = v
        return out

    flat = _flat(d)
    ordered = [k for k in (fields_ordering or []) if k in flat]
    rest = sorted(k for k in flat if k not in set(ordered))

    def _render(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        s = str(v)
        if (" " in s or '"' in s or field_delimiter in s or s == ""):
            return '"' + s.replace('"', '\\"') + '"'
        return s

    parts = []
    for k in ordered + rest:
        v = flat[k]
        if flatten_boolean and isinstance(v, bool):
            if v:
                parts.append(k)
            continue
        parts.append(f"{k}{key_value_delimiter}{_render(v)}")
    return field_delimiter.join(parts)


@register("encode_key_value")
def _encode_key_value(c, fields_ordering=None, key_value_delimiter="=",
                      field_delimiter=" ", flatten_boolean=False):
    return pa.array([
        None if d is None else _kv_encode_row(
            d, fields_ordering, key_value_delimiter, field_delimiter,
            flatten_boolean)
        for d in _map_to_dicts(c)
    ], type=pa.string())


@register("encode_logfmt")
def _encode_logfmt(c, fields_ordering=None):
    """encode_logfmt(value, fields_ordering) = key-value encoding with
    logfmt defaults (encode_logfmt.cue)."""
    return FUNCTIONS["encode_key_value"](c, fields_ordering)


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
    rx = re.compile(r'"((?:\\.|[^"\\])*)"|\[([^\]]*)\]|(\S+)')

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


def _register_fallback_format_checkers(checker) -> None:
    """jsonschema only enforces a spec format when its optional
    validator package is installed; the reference's Rust jsonschema
    enforces them natively.  Register stdlib-based checkers for any
    spec format missing from this environment so enforcement doesn't
    depend on which optional deps happen to be present."""
    have = checker.checkers

    def add(name, fn):
        if name not in have:
            checker.checks(name)(fn)

    import datetime as _dt
    import ipaddress as _ip
    import re as _re
    import uuid as _uuid

    def _str_check(fn):
        def check(v):
            if not isinstance(v, str):
                return True
            try:
                fn(v)
                return True
            except (ValueError, _re.error):
                return False
        return check

    add("date-time",
        _str_check(lambda v: _dt.datetime.fromisoformat(
            v.replace("Z", "+00:00"))))
    add("date", _str_check(_dt.date.fromisoformat))
    add("time",
        _str_check(lambda v: _dt.time.fromisoformat(
            v.replace("Z", "+00:00"))))
    add("ipv4", _str_check(_ip.IPv4Address))
    add("ipv6", _str_check(_ip.IPv6Address))
    add("uuid", _str_check(_uuid.UUID))
    add("regex", _str_check(_re.compile))
    def _json_pointer(v):
        if v and not v.startswith("/"):
            raise ValueError("json pointer must start with /")

    add("json-pointer", _str_check(_json_pointer))


@register("validate_json_schema")
def _validate_json_schema(c, schema_json, ignore_unknown_formats=False):
    """validate_json_schema(value, schema_definition,
    ignore_unknown_formats) — schema_definition is inline JSON or a
    file path (validate_json_schema.cue).  Unknown-format leniency is
    jsonschema's default behavior, so the flag only gates strictness."""
    import jsonschema

    if isinstance(schema_json, str) and not schema_json.lstrip().startswith("{"):
        with open(schema_json) as fh:
            schema_json = fh.read()
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    # doc-example matrix (validate_json_schema.cue): with the flag
    # false, formats are enforced and an unvalidatable format is a
    # schema error; with the flag true, format declarations don't
    # constrain values at all
    checker = jsonschema.FormatChecker() if not ignore_unknown_formats else None
    if checker is not None:
        _register_fallback_format_checkers(checker)
    if not ignore_unknown_formats:
        # the reference's rust jsonschema crate treats a format string
        # it can't validate as a schema error when the flag is false
        def _formats(node):
            if isinstance(node, dict):
                if isinstance(node.get("format"), str):
                    yield node["format"]
                for v in node.values():
                    yield from _formats(v)
            elif isinstance(node, list):
                for v in node:
                    yield from _formats(v)

        # only formats outside the 2020-12 vocabulary are "unknown";
        # spec formats whose optional validator package is missing
        # just validate passively (jsonschema's normal behavior)
        spec_formats = {
            "date-time", "date", "time", "duration", "email", "idn-email",
            "hostname", "idn-hostname", "ipv4", "ipv6", "uri",
            "uri-reference", "iri", "iri-reference", "uuid",
            "uri-template", "json-pointer", "relative-json-pointer",
            "regex",
        }
        unknown = {
            f for f in _formats(schema)
            if f not in spec_formats and f not in checker.checkers
        }
        if unknown:
            raise ValueError(
                f"unknown JSON-schema formats {sorted(unknown)} "
                "(set ignore_unknown_formats to allow)"
            )
    validator = jsonschema.Draft202012Validator(schema, format_checker=checker)

    def _one(s):
        try:
            validator.validate(json.loads(s))
            return True
        except Exception:
            return False

    return _rowmap(c, _one, pa.bool_())


@register("parse_aws_cloudwatch_log_subscription_message")
def _parse_cw_sub(c):
    """parse_aws_cloudwatch_log_subscription_message.cue: typed nested
    output — subscription_filters as a string array, log_events as
    objects with ms-epoch timestamps rendered RFC3339."""
    import datetime as _dt

    from .scalar import obj_array

    def _ts(ms):
        d = _dt.datetime.fromtimestamp(ms / 1000.0, _dt.timezone.utc)
        return d.strftime("%Y-%m-%dT%H:%M:%S.") + f"{d.microsecond // 1000:03d}Z"

    def _one(s):
        v = json.loads(s)
        return {
            "owner": str(v.get("owner", "")),
            "message_type": str(v.get("messageType", "")),
            "log_group": str(v.get("logGroup", "")),
            "log_stream": str(v.get("logStream", "")),
            "subscription_filters": [str(f) for f in v.get("subscriptionFilters", [])],
            "log_events": [
                {
                    "id": str(e.get("id", "")),
                    "message": e.get("message"),
                    "timestamp": _ts(int(e["timestamp"])) if "timestamp" in e else None,
                }
                for e in v.get("logEvents", [])
            ],
        }

    return obj_array([None if s is None else _one(s)
                      for s in _arr(c).to_pylist()])


# ------------------------------------------------------------- secrets

_SECRET_STORE: dict = {}


@register("set_secret")
def _set_secret(c, value):
    """Registry fallback: process-local store keyed by the first arg
    (the VRL program path intercepts these names and uses the event's
    ``__meta_secrets.*`` columns instead — vrl.py _call_secret)."""
    for k in set(_arr(c).to_pylist()):
        if k is not None:
            _SECRET_STORE[k] = value
    return pa.nulls(len(_arr(c)))


@register("get_secret")
def _get_secret(c):
    return pa.array(
        [None if k is None else _SECRET_STORE.get(k)
         for k in _arr(c).to_pylist()],
        type=pa.string(),
    )


@register("remove_secret")
def _remove_secret(c):
    for k in set(_arr(c).to_pylist()):
        _SECRET_STORE.pop(k, None)
    return pa.nulls(len(_arr(c)))


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


def _const_arg(x, what="argument"):
    """Scalar call args may arrive as broadcast Arrow arrays from the
    VRL program path (a variable assigned from a literal) — accept a
    constant column as its value; truly per-row values are rejected
    with a clear error rather than silently using row 0."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        vals = {v for v in x.to_pylist() if v is not None}
        if len(vals) != 1:
            raise ValueError(f"per-row {what} values aren't supported here")
        return next(iter(vals))
    return x


@register("encrypt")
def _encrypt(c, algorithm, key, iv):
    cipher, pad = _aes_ctx(
        _const_arg(algorithm, "algorithm"), _const_arg(key, "key"),
        _const_arg(iv, "iv"))

    def _one(v):
        b = v.encode("utf-8", "surrogateescape") if isinstance(v, str) else v
        if pad:
            from cryptography.hazmat.primitives import padding

            p = padding.PKCS7(128).padder()
            b = p.update(b) + p.finalize()
        enc = cipher.encryptor()
        return enc.update(b) + enc.finalize()

    return _rowmap(c, _one, pa.binary())


@register("decrypt")
def _decrypt(c, algorithm, key, iv):
    cipher, pad = _aes_ctx(
        _const_arg(algorithm, "algorithm"), _const_arg(key, "key"),
        _const_arg(iv, "iv"))

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

    raw = [None if v is None else _one(
               v if not isinstance(v, str)
               else v.encode("utf-8", "surrogateescape"))
           for v in _arr(c).to_pylist()]
    # string when the whole batch round-trips utf-8, else binary
    # (same dual-type caveat as decode_base64)
    try:
        return pa.array([None if v is None else v.decode() for v in raw])
    except UnicodeDecodeError:
        return pa.array(raw, type=pa.binary())


@register("encrypt_ip")
def _encrypt_ip(c, key, mode="aes128"):
    """ipcrypt-deterministic (public spec draft-denis-ipcrypt): AES-128
    single-block over the 16-byte (v4-mapped) address.  mode="pfx"
    (prefix-preserving, 32-byte key) needs the ipcrypt-pfx bit-walk
    spec, which isn't available in this container — honest error."""
    import ipaddress

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    key = _const_arg(key, "key")
    if _const_arg(mode, "mode") != "aes128":
        raise NotImplementedError(
            "encrypt_ip mode 'pfx' (ipcrypt prefix-preserving) isn't "
            "implemented — spec not available in this container")
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
def _decrypt_ip(c, key, mode="aes128"):
    import ipaddress

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    key = _const_arg(key, "key")
    if _const_arg(mode, "mode") != "aes128":
        raise NotImplementedError(
            "decrypt_ip mode 'pfx' (ipcrypt prefix-preserving) isn't "
            "implemented — spec not available in this container")
    kb = key.encode() if isinstance(key, str) else key
    if len(kb) != 16:
        raise ValueError("decrypt_ip needs a 16-byte key")
    dec = Cipher(algorithms.AES(kb), modes.ECB()).decryptor()

    def _one(s):
        b = ipaddress.ip_address(s).packed
        out = ipaddress.ip_address(dec.update(b))
        return str(out.ipv4_mapped) if out.ipv4_mapped else str(out)

    return _rowmap(c, _one, pa.string())
