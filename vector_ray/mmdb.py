"""MaxMind-DB (mmdb) binary format reader — from the public spec.

Implements the MaxMind DB file format 2.0 (spec published at
maxmind.github.io/MaxMind-DB/): a bit-level binary search tree over IP
prefixes, a typed data section, and a metadata map at the tail marked
by ``\\xab\\xcd\\xefMaxMind.com``.  This backs the geoip/mmdb
enrichment tables (reference src/enrichment_tables/geoip.rs:27-42,
mmdb.rs:46-78) without any external mmdb library.

Scale shape: the per-IP tree walk here is the correctness reference;
the batch path converts the tree to a sorted (start_ip, end_ip, attrs)
range table once (``to_range_table`` / ``IpRangeTable.from_mmdb``) and
probes it with a vectorized ``searchsorted`` inside map_batches —
broadcast once per actor, no per-row Python in the pipeline.
"""

from __future__ import annotations

import ipaddress
import struct
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = 16  # 16 zero bytes between tree and data section


class MmdbReader:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        idx = self.buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise ValueError("not an mmdb file (metadata marker missing)")
        self.metadata, _ = self._decode(idx + len(_METADATA_MARKER), base=0)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])  # bits
        self.ip_version = int(self.metadata["ip_version"])
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_start = self.tree_size + _DATA_SEPARATOR
        self._ipv4_root: Optional[int] = None

    # ------------------------------------------------------ tree walk

    def _read_record(self, node: int, bit: int) -> int:
        off = node * self.node_bytes
        b = self.buf
        if self.record_size == 24:
            s = off + 3 * bit
            return (b[s] << 16) | (b[s + 1] << 8) | b[s + 2]
        if self.record_size == 28:
            if bit == 0:
                return ((b[off + 3] & 0xF0) << 20) | (b[off] << 16) | (b[off + 1] << 8) | b[off + 2]
            return ((b[off + 3] & 0x0F) << 24) | (b[off + 4] << 16) | (b[off + 5] << 8) | b[off + 6]
        if self.record_size == 32:
            s = off + 4 * bit
            return struct.unpack_from(">I", b, s)[0]
        raise ValueError(f"unsupported record size {self.record_size}")

    def ipv4_root(self) -> int:
        """Node reached by walking 96 zero bits (the ::ffff:0:0/96
        IPv4-mapped prefix) in an IPv6 tree; node 0 for IPv4 trees."""
        if self._ipv4_root is None:
            node = 0
            if self.ip_version == 6:
                for _ in range(96):
                    if node >= self.node_count:
                        break
                    node = self._read_record(node, 0)
            self._ipv4_root = node
        return self._ipv4_root

    def lookup_ipv4(self, ip: int) -> Optional[dict]:
        """Per-IP reference walk (tests / spot checks — batch pipelines
        use the range-table conversion instead)."""
        node = self.ipv4_root()
        for depth in range(31, -1, -1):
            if node >= self.node_count:
                break
            node = self._read_record(node, (ip >> depth) & 1)
        if node == self.node_count:
            return None
        if node > self.node_count:
            value, _ = self._decode(node - self.node_count - _DATA_SEPARATOR + self.data_start)
            return value
        return None

    def networks_ipv4(self) -> Iterator[Tuple[int, int, dict]]:
        """DFS over the IPv4 subtree: yields (start_ip, prefix_len,
        record) for every data leaf."""
        stack = [(self.ipv4_root(), 0, 0)]
        cache: Dict[int, dict] = {}
        while stack:
            node, prefix, depth = stack.pop()
            if node == self.node_count:
                continue
            if node > self.node_count:
                off = node - self.node_count - _DATA_SEPARATOR + self.data_start
                if off not in cache:
                    cache[off], _ = self._decode(off)
                yield prefix, depth, cache[off]
                continue
            if depth >= 32:
                continue
            stack.append((self._read_record(node, 1), prefix | (1 << (31 - depth)), depth + 1))
            stack.append((self._read_record(node, 0), prefix, depth + 1))

    # ------------------------------------------------ data section

    def _decode(self, offset: int, base: Optional[int] = None) -> Tuple[Any, int]:
        """Decode one value at absolute ``offset``; returns (value,
        next_offset).  ``base`` overrides the pointer base (metadata is
        decoded with base=0 semantics but contains no pointers)."""
        buf = self.buf
        ctrl = buf[offset]
        offset += 1
        typ = ctrl >> 5
        if typ == 0:  # extended type
            typ = buf[offset] + 7
            offset += 1
        if typ == 1:  # pointer
            size = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if size == 0:
                p = (v << 8) | buf[offset]
                offset += 1
            elif size == 1:
                p = (v << 16) | (buf[offset] << 8) | buf[offset + 1]
                p += 2048
                offset += 2
            elif size == 2:
                p = (v << 24) | (buf[offset] << 16) | (buf[offset + 1] << 8) | buf[offset + 2]
                p += 526336
                offset += 3
            else:
                p = struct.unpack_from(">I", buf, offset)[0]
                offset += 4
            value, _ = self._decode(self.data_start + p)
            return value, offset
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + ((buf[offset] << 8) | buf[offset + 1])
            offset += 2
        elif size == 31:
            size = 65821 + ((buf[offset] << 16) | (buf[offset + 1] << 8) | buf[offset + 2])
            offset += 3
        if typ == 2:  # utf8 string
            return buf[offset : offset + size].decode("utf-8"), offset + size
        if typ == 3:  # double
            return struct.unpack_from(">d", buf, offset)[0], offset + 8
        if typ == 4:  # bytes
            return bytes(buf[offset : offset + size]), offset + size
        if typ in (5, 6, 9, 10):  # uint16/32/64/128
            v = int.from_bytes(buf[offset : offset + size], "big") if size else 0
            return v, offset + size
        if typ == 7:  # map
            out = {}
            for _ in range(size):
                k, offset = self._decode(offset)
                out[k], offset = self._decode(offset)
            return out, offset
        if typ == 8:  # int32
            v = int.from_bytes(buf[offset : offset + size], "big", signed=False)
            if size and (buf[offset] & 0x80):
                v -= 1 << (8 * size)
            return v, offset + size
        if typ == 11:  # array
            out = []
            for _ in range(size):
                v, offset = self._decode(offset)
                out.append(v)
            return out, offset
        if typ == 14:  # boolean (size IS the value)
            return bool(size), offset
        if typ == 15:  # float
            return struct.unpack_from(">f", buf, offset)[0], offset + 4
        raise ValueError(f"unsupported mmdb type {typ}")


def _flatten(record: dict, prefix: str = "") -> Dict[str, Any]:
    """Nested record → dotted scalar keys ('country.iso_code', …);
    arrays keep their first element (mmdb city 'subdivisions' style)."""
    out: Dict[str, Any] = {}
    for k, v in record.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        elif isinstance(v, list):
            if v and isinstance(v[0], dict):
                out.update(_flatten(v[0], key + ".0."))
        else:
            out[key] = v
    return out


def to_range_table(path: str, fields: Optional[List[str]] = None) -> pa.Table:
    """Convert an mmdb's IPv4 space to a sorted (start_ip, end_ip,
    attrs…) Arrow table — the broadcastable form IpRangeTable probes
    with vectorized searchsorted."""
    reader = MmdbReader(path)
    starts: List[int] = []
    ends: List[int] = []
    flats: List[Dict[str, Any]] = []
    for start, depth, record in reader.networks_ipv4():
        starts.append(start)
        ends.append(start + (1 << (32 - depth)) - 1)
        flats.append(_flatten(record))
    if fields is None:
        seen: Dict[str, None] = {}
        for f in flats:
            for k in f:
                seen.setdefault(k)
        fields = list(seen)
    order = np.argsort(np.asarray(starts, dtype=np.int64), kind="stable")
    cols: Dict[str, pa.Array] = {
        "start_ip": pa.array(np.asarray(starts, dtype=np.int64)[order]),
        "end_ip": pa.array(np.asarray(ends, dtype=np.int64)[order]),
    }
    for k in fields:
        vals = [flats[i].get(k) for i in order]
        cols[k.replace(".", "_")] = pa.array(vals)
    return pa.table(cols)


def _path_get(record: dict, path: tuple):
    cur = record
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return None
        cur = cur[p]
    return cur


#: Vector's GeoIP City field layout (src/enrichment_tables/geoip.rs:180-230):
#: named top-level fields; the LAST subdivision is the most specific one.
_CITY_LAYOUT = {
    "city_name": ("city", "names", "en"),
    "continent_code": ("continent", "code"),
    "country_code": ("country", "iso_code"),
    "country_name": ("country", "names", "en"),
    "timezone": ("location", "time_zone"),
    "latitude": ("location", "latitude"),
    "longitude": ("location", "longitude"),
    "metro_code": ("location", "metro_code"),
    "postal_code": ("postal", "code"),
}

#: ISP / ASN / Connection-Type / Anonymous-IP records are already flat
#: with Vector's field names (geoip.rs:232-260 passes them through).


def vector_city_record(record: dict) -> Dict[str, Any]:
    """mmdb City record → Vector's geoip field set (geoip.rs city_lookup
    expected layout, incl. most-specific-subdivision region fields)."""
    out = {k: _path_get(record, path) for k, path in _CITY_LAYOUT.items()}
    subs = record.get("subdivisions")
    sub = subs[-1] if isinstance(subs, list) and subs else None
    out["region_code"] = _path_get(sub, ("iso_code",)) if isinstance(sub, dict) else None
    out["region_name"] = _path_get(sub, ("names", "en")) if isinstance(sub, dict) else None
    return out


def to_city_range_table(path: str) -> pa.Table:
    """to_range_table with Vector's City field layout."""
    reader = MmdbReader(path)
    starts: List[int] = []
    ends: List[int] = []
    flats: List[Dict[str, Any]] = []
    for start, depth, record in reader.networks_ipv4():
        starts.append(start)
        ends.append(start + (1 << (32 - depth)) - 1)
        flats.append(vector_city_record(record))
    order = np.argsort(np.asarray(starts, dtype=np.int64), kind="stable")
    cols: Dict[str, pa.Array] = {
        "start_ip": pa.array(np.asarray(starts, dtype=np.int64)[order]),
        "end_ip": pa.array(np.asarray(ends, dtype=np.int64)[order]),
    }
    fields = list(_CITY_LAYOUT) + ["region_code", "region_name"]
    for k in fields:
        typ = pa.float64() if k in ("latitude", "longitude") else (
            pa.int64() if k == "metro_code" else pa.string()
        )
        cols[k] = pa.array([flats[i].get(k) for i in order], type=typ)
    return pa.table(cols)
