"""Binary-format stdlib functions: parse_cbor, parse_dnstap,
tag_types_externally, set_semantic_meaning.

These close the last gaps against the reference's remap function list
(website/cue/reference/remap/functions/parse_cbor.cue, parse_dnstap.cue,
tag_types_externally.cue, set_semantic_meaning.cue).

- CBOR: from-scratch RFC 8949 reader (major types 0-7, definite and
  indefinite lengths, half/single/double floats, tags pass through).
- dnstap: from-scratch protobuf wire read of the public dnstap.proto
  message layout plus a DNS wire-format reader (RFC 1035 header /
  question / answer sections with name decompression, EDNS0 OPT with
  RFC 8914 extended errors) — the same surface the reference decodes in
  lib/dnsmsg-parser + src/sources/dnstap (we parse the remap-visible
  subset).

Column convention matches the other parsers: nested results flatten to
map<string,string> with JSON-encoded nested values; the full nested
Python dict is exposed via ``parse_dnstap_payload`` / ``cbor_loads``
for tests and row-level consumers.
"""

from __future__ import annotations

import base64
import ipaddress
import json
import struct
from typing import Any, Dict, List, Optional, Tuple

import pyarrow as pa

from .scalar import register

# local copies of scalar_ext's two tiny helpers: importing scalar_ext
# here would cycle (scalar_ext → scalar → binary_formats) when a user
# imports scalar_ext first
MAP_SS = pa.map_(pa.string(), pa.string())


def _arr(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col

# ------------------------------------------------------------------ CBOR

_BREAK = object()


def _cbor_item(buf: bytes, pos: int) -> Tuple[Any, int]:
    ib = buf[pos]
    pos += 1
    mt, ai = ib >> 5, ib & 0x1F
    arg: Optional[int]
    if ai < 24:
        arg = ai
    elif ai == 24:
        arg = buf[pos]
        pos += 1
    elif ai == 25:
        arg = int.from_bytes(buf[pos : pos + 2], "big")
        pos += 2
    elif ai == 26:
        arg = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
    elif ai == 27:
        arg = int.from_bytes(buf[pos : pos + 8], "big")
        pos += 8
    elif ai == 31:
        arg = None  # indefinite length / break
    else:
        raise ValueError(f"cbor: reserved additional info {ai}")

    if mt == 0:
        return arg, pos
    if mt == 1:
        return -1 - arg, pos
    if mt in (2, 3):  # byte / text string
        if arg is None:  # indefinite: concatenation of definite chunks
            parts = []
            while buf[pos] != 0xFF:
                chunk, pos = _cbor_item(buf, pos)
                parts.append(chunk if mt == 2 else chunk.encode())
            pos += 1
            data = b"".join(parts)
        else:
            data = buf[pos : pos + arg]
            pos += arg
        return (bytes(data) if mt == 2 else data.decode("utf-8")), pos
    if mt == 4:  # array
        out: List[Any] = []
        if arg is None:
            while True:
                v, pos = _cbor_item(buf, pos)
                if v is _BREAK:
                    return out, pos
                out.append(v)
        for _ in range(arg):
            v, pos = _cbor_item(buf, pos)
            out.append(v)
        return out, pos
    if mt == 5:  # map
        m: Dict[Any, Any] = {}
        if arg is None:
            while True:
                k, pos = _cbor_item(buf, pos)
                if k is _BREAK:
                    return m, pos
                v, pos = _cbor_item(buf, pos)
                m[k] = v
            return m, pos
        for _ in range(arg):
            k, pos = _cbor_item(buf, pos)
            v, pos = _cbor_item(buf, pos)
            m[k] = v
        return m, pos
    if mt == 6:  # tag: decode and return the tagged item (RFC 8949 §3.4)
        return _cbor_item(buf, pos)
    # mt == 7: simple values / floats / break
    if ai == 20:
        return False, pos
    if ai == 21:
        return True, pos
    if ai in (22, 23):  # null / undefined
        return None, pos
    if ai == 25:
        return struct.unpack(">e", buf[pos - 2 : pos])[0], pos
    if ai == 26:
        return struct.unpack(">f", buf[pos - 4 : pos])[0], pos
    if ai == 27:
        return struct.unpack(">d", buf[pos - 8 : pos])[0], pos
    if ai == 31:
        return _BREAK, pos
    return arg, pos  # simple value 0..19 / 24


def cbor_loads(data: bytes) -> Any:
    v, pos = _cbor_item(data, 0)
    if v is _BREAK:
        raise ValueError("cbor: unexpected break")
    if pos != len(data):
        raise ValueError(f"cbor: {len(data) - pos} trailing bytes")
    return v


def _stringify(v: Any) -> Optional[str]:
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (dict, list)):
        return json.dumps(_jsonable(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _jsonable(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


@register("parse_cbor")
def _parse_cbor(c):
    """CBOR payload column (binary, or base64 string) → map<str,str>.

    Non-map roots land under ``_value`` (same convention as parse_json,
    scalar_ext.py)."""
    arr = _arr(c)
    is_binary = pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)

    def _one(raw):
        if raw is None:
            return None
        data = raw if is_binary else base64.b64decode(raw)
        v = cbor_loads(bytes(data))
        if isinstance(v, dict):
            return {str(k): _stringify(x) for k, x in v.items()}
        return {"_value": json.dumps(_jsonable(v))}

    return pa.array(
        [None if r is None else list(_one(r).items()) for r in arr.to_pylist()],
        type=MAP_SS,
    )


# ------------------------------------------------------- semantic meaning

#: Meanings registered by set_semantic_meaning calls; keyed by meaning
#: name → target description.  Assignment-time metadata only — the
#: reference documents the function as having NO runtime behavior
#: (set_semantic_meaning.cue: "assigns meaning at startup").
SEMANTIC_MEANINGS: Dict[str, str] = {}


@register("set_semantic_meaning")
def _set_semantic_meaning(c, meaning: str, target: str = ""):
    SEMANTIC_MEANINGS[str(meaning)] = str(target)
    return pa.nulls(len(_arr(c)))


# --------------------------------------------------- tag_types_externally


def _tag_value(v: Any) -> Any:
    """Recursive external type tagging (tag_types_externally.cue):
    scalars become {"<type>": value}; objects/arrays recurse; null
    stays null."""
    if v is None:
        return None
    if isinstance(v, bool):
        return {"boolean": v}
    if isinstance(v, int):
        return {"integer": v}
    if isinstance(v, float):
        return {"float": v}
    if isinstance(v, bytes):
        return {"string": v.decode("utf-8", "replace")}
    if isinstance(v, str):
        return {"string": v}
    if isinstance(v, dict):
        return {str(k): _tag_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_tag_value(x) for x in v]
    return {"string": str(v)}


@register("tag_types_externally")
def _tag_types_externally(c):
    """Every row value is tagged recursively; nested objects/arrays
    keep their native (typed struct/list) form like the reference's
    object/array return, falling back to JSON strings only when the
    rows are not columnar-representable."""
    from .scalar import obj_array

    arr = _arr(c)
    return obj_array([_tag_value(v) for v in arr.to_pylist()])


# ---------------------------------------------------------------- dnstap

_DNSTAP_MESSAGE_TYPES = {
    1: "AuthQuery", 2: "AuthResponse",
    3: "ResolverQuery", 4: "ResolverResponse",
    5: "ClientQuery", 6: "ClientResponse",
    7: "ForwarderQuery", 8: "ForwarderResponse",
    9: "StubQuery", 10: "StubResponse",
    11: "ToolQuery", 12: "ToolResponse",
    13: "UpdateQuery", 14: "UpdateResponse",
}
_SOCKET_FAMILY = {1: "INET", 2: "INET6"}
_SOCKET_PROTOCOL = {1: "UDP", 2: "TCP", 3: "DOT", 4: "DOH",
                    5: "DNSCryptUDP", 6: "DNSCryptTCP", 7: "DOQ"}

_RR_TYPES = {
    1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX", 16: "TXT",
    28: "AAAA", 33: "SRV", 35: "NAPTR", 41: "OPT", 43: "DS", 46: "RRSIG",
    47: "NSEC", 48: "DNSKEY", 50: "NSEC3", 51: "NSEC3PARAM", 52: "TLSA",
    64: "SVCB", 65: "HTTPS", 99: "SPF", 252: "AXFR", 255: "ANY", 257: "CAA",
}
_RR_CLASSES = {1: "IN", 3: "CH", 4: "HS", 254: "NONE", 255: "ANY"}
_RCODE_NAMES = {
    0: "NoError", 1: "FormErr", 2: "ServFail", 3: "NXDomain", 4: "NotImp",
    5: "Refused", 6: "YXDomain", 7: "YXRRSet", 8: "NXRRSet", 9: "NotAuth",
    10: "NotZone", 16: "BADVERS", 17: "BADKEY", 18: "BADTIME", 19: "BADMODE",
    20: "BADNAME", 21: "BADALG", 22: "BADTRUNC", 23: "BADCOOKIE",
}
_OPT_NAMES = {
    1: "LLQ", 2: "UL", 3: "NSID", 5: "DAU", 6: "DHU", 7: "N3U",
    8: "ClientSubnet", 9: "EDNSExpire", 10: "Cookie", 11: "Keepalive",
    12: "Padding", 13: "CHAIN", 14: "KeyTag", 15: "EDE",
}
# RFC 8914 extended DNS error purposes
_EDE_PURPOSES = {
    0: "Other", 1: "Unsupported DNSKEY Algorithm", 2: "Unsupported DS Digest Type",
    3: "Stale Answer", 4: "Forged Answer", 5: "DNSSEC Indeterminate",
    6: "DNSSEC Bogus", 7: "Signature Expired", 8: "Signature Not Yet Valid",
    9: "DNSKEY Missing", 10: "RRSIGs Missing", 11: "No Zone Key Bit Set",
    12: "NSEC Missing", 13: "Cached Error", 14: "Not Ready",
    15: "Blocked", 16: "Censored", 17: "Filtered", 18: "Prohibited",
    19: "Stale NXDomain Answer", 20: "Not Authoritative", 21: "Not Supported",
    22: "No Reachable Authority", 23: "Network Error", 24: "Invalid Data",
}


def _dns_name(buf: bytes, pos: int, lowercase: bool = False) -> Tuple[str, int]:
    """Read a (possibly compressed) domain name; returns (name., end)."""
    labels: List[str] = []
    end = -1
    hops = 0
    while True:
        ln = buf[pos]
        if ln & 0xC0 == 0xC0:
            if end < 0:
                end = pos + 2
            pos = ((ln & 0x3F) << 8) | buf[pos + 1]
            hops += 1
            if hops > 128:
                raise ValueError("dns: compression loop")
        elif ln == 0:
            if end < 0:
                end = pos + 1
            name = ".".join(labels) + "." if labels else "."
            return (name.lower() if lowercase else name), end
        else:
            labels.append(buf[pos + 1 : pos + 1 + ln].decode("ascii", "replace"))
            pos += 1 + ln


def _render_rdata(buf: bytes, pos: int, rdlen: int, rtype: int, lc: bool) -> str:
    end = pos + rdlen
    try:
        if rtype == 1 and rdlen == 4:
            return str(ipaddress.IPv4Address(buf[pos:end]))
        if rtype == 28 and rdlen == 16:
            return str(ipaddress.IPv6Address(buf[pos:end]))
        if rtype in (2, 5, 12):  # NS / CNAME / PTR
            return _dns_name(buf, pos, lc)[0]
        if rtype == 15:  # MX
            pref = int.from_bytes(buf[pos : pos + 2], "big")
            return f"{pref} {_dns_name(buf, pos + 2, lc)[0]}"
        if rtype == 16:  # TXT: sequence of <len><chars>
            parts, p = [], pos
            while p < end:
                ln = buf[p]
                parts.append(buf[p + 1 : p + 1 + ln].decode("utf-8", "replace"))
                p += 1 + ln
            return " ".join(parts)
        if rtype == 6:  # SOA
            mname, p = _dns_name(buf, pos, lc)
            rname, p = _dns_name(buf, p, lc)
            nums = struct.unpack(">IIIII", buf[p : p + 20])
            return " ".join([mname, rname] + [str(n) for n in nums])
    except (IndexError, ValueError):
        pass
    return base64.b64encode(buf[pos:end]).decode()


def _parse_opt(buf: bytes, pos: int, rclass: int, ttl: int, rdlen: int) -> dict:
    opt: Dict[str, Any] = {
        "udpPayloadSize": rclass,
        "extendedRcode": (ttl >> 24) & 0xFF,
        "ednsVersion": (ttl >> 16) & 0xFF,
        "do": bool((ttl >> 15) & 1),
    }
    options, ede = [], []
    end = pos + rdlen
    while pos + 4 <= end:
        code = int.from_bytes(buf[pos : pos + 2], "big")
        ln = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        val = buf[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if code == 15 and len(val) >= 2:  # RFC 8914 extended error
            info = int.from_bytes(val[:2], "big")
            ede.append({
                "infoCode": info,
                "purpose": _EDE_PURPOSES.get(info, "Unknown"),
                "extraText": val[2:].decode("utf-8", "replace"),
            })
        else:
            options.append({
                "optCode": code,
                "optName": _OPT_NAMES.get(code, f"Opt{code}"),
                "optValue": base64.b64encode(val).decode(),
            })
    if options:
        opt["options"] = options
    if ede:
        opt["ede"] = ede
    return opt


def parse_dns_message(buf: bytes, lowercase: bool = False) -> dict:
    """RFC 1035 wire-format message → the reference's requestData shape
    (header / question / answers / authority / additional / opt)."""
    (mid, flags, qd, an, ns, ar) = struct.unpack(">HHHHHH", buf[:12])
    rcode = flags & 0xF
    header = {
        "id": mid,
        "qr": (flags >> 15) & 1,
        "opcode": (flags >> 11) & 0xF,
        "aa": bool((flags >> 10) & 1),
        "tc": bool((flags >> 9) & 1),
        "rd": bool((flags >> 8) & 1),
        "ra": bool((flags >> 7) & 1),
        "ad": bool((flags >> 5) & 1),
        "cd": bool((flags >> 4) & 1),
        "rcode": rcode,
        "qdCount": qd, "anCount": an, "nsCount": ns, "arCount": ar,
    }
    pos = 12
    question = []
    for _ in range(qd):
        name, pos = _dns_name(buf, pos, lowercase)
        qtype, qclass = struct.unpack(">HH", buf[pos : pos + 4])
        pos += 4
        question.append({
            "domainName": name,
            "questionType": _RR_TYPES.get(qtype, str(qtype)),
            "questionTypeId": qtype,
            "class": _RR_CLASSES.get(qclass, str(qclass)),
        })
    out: Dict[str, Any] = {"header": header, "question": question}
    full_rcode = rcode
    for section, count in (("answers", an), ("authority", ns), ("additional", ar)):
        records = []
        for _ in range(count):
            name, pos = _dns_name(buf, pos, lowercase)
            rtype, rclass, ttl, rdlen = struct.unpack(">HHIH", buf[pos : pos + 10])
            pos += 10
            if rtype == 41:  # EDNS0 OPT pseudo-record
                out["opt"] = _parse_opt(buf, pos, rclass, ttl, rdlen)
                full_rcode = (out["opt"]["extendedRcode"] << 4) | rcode
            else:
                records.append({
                    "domainName": name,
                    "recordType": _RR_TYPES.get(rtype, str(rtype)),
                    "recordTypeId": rtype,
                    "class": _RR_CLASSES.get(rclass, str(rclass)),
                    "ttl": ttl,
                    "rData": _render_rdata(buf, pos, rdlen, rtype, lowercase),
                })
            pos += rdlen
        if records:
            out[section] = records
    out["fullRcode"] = full_rcode
    # the reference folds the EDNS extended bits into the displayed
    # header rcode too (parse_dnstap.cue responseData.header.rcode=16)
    out["header"]["rcode"] = full_rcode
    out["rcodeName"] = _RCODE_NAMES.get(full_rcode, str(full_rcode))
    return out


def _ip(b: bytes) -> str:
    if len(b) == 4:
        return str(ipaddress.IPv4Address(b))
    if len(b) == 16:
        return str(ipaddress.IPv6Address(b))
    return base64.b64encode(b).decode()


def parse_dnstap_payload(data, lowercase_hostnames: bool = False) -> dict:
    """base64 string or raw bytes of one Dnstap protobuf frame → nested
    dict in the reference's parse_dnstap output shape
    (parse_dnstap.cue example; field numbers from the public
    dnstap.proto)."""
    from ..otlp import _fields

    raw = base64.b64decode(data) if isinstance(data, str) else bytes(data)
    out: Dict[str, Any] = {"extraInfo": ""}
    msg = None
    for f, _wt, v in _fields(raw):
        if f == 1:
            out["serverId"] = v.decode("utf-8", "replace")
        elif f == 2:
            out["serverVersion"] = v.decode("utf-8", "replace")
        elif f == 3:
            out["extraInfo"] = v.decode("utf-8", "replace")
        elif f == 15:
            out["dataTypeId"] = v
            out["dataType"] = "Message" if v == 1 else str(v)
        elif f == 14:
            msg = v
    if msg is None:
        return out
    lc = lowercase_hostnames
    q_sec = q_nsec = r_sec = r_nsec = None
    mtype = 0
    for f, wt, v in _fields(msg):
        if f == 1:
            mtype = v
        elif f == 2:
            out["socketFamily"] = _SOCKET_FAMILY.get(v, str(v))
        elif f == 3:
            out["socketProtocol"] = _SOCKET_PROTOCOL.get(v, str(v))
        elif f == 4:
            out["sourceAddress"] = _ip(v)
        elif f == 5:
            out["responseAddress"] = _ip(v)
        elif f == 6:
            out["sourcePort"] = v
        elif f == 7:
            out["responsePort"] = v
        elif f == 8:
            q_sec = v
        elif f == 9:
            q_nsec = int.from_bytes(v, "little")
        elif f == 10:
            out["requestData"] = parse_dns_message(v, lc)
        elif f == 11:
            out["queryZone"] = _dns_name(v, 0, lc)[0]
        elif f == 12:
            r_sec = v
        elif f == 13:
            r_nsec = int.from_bytes(v, "little")
        elif f == 14:
            out["responseData"] = parse_dns_message(v, lc)
    out["messageTypeId"] = mtype
    out["messageType"] = _DNSTAP_MESSAGE_TYPES.get(mtype, str(mtype))
    # query-type messages (odd ids) stamp query time; responses stamp
    # response time — matching the reference's time selection.
    sec, nsec = (q_sec, q_nsec) if mtype % 2 == 1 else (r_sec, r_nsec)
    if sec is None:
        sec, nsec = (r_sec, r_nsec) if mtype % 2 == 1 else (q_sec, q_nsec)
    if sec is not None:
        ns = int(sec) * 1_000_000_000 + int(nsec or 0)
        out["time"] = ns
        out["timePrecision"] = "ns"
        # RFC3339 with nanosecond precision (datetime only carries µs)
        import datetime as _dt

        base = _dt.datetime.fromtimestamp(ns // 1_000_000_000,
                                          _dt.timezone.utc)
        out["timestamp"] = (
            base.strftime("%Y-%m-%dT%H:%M:%S")
            + f".{ns % 1_000_000_000:09d}Z"
        )
    return out


@register("parse_dnstap")
def _parse_dnstap(c, lowercase_hostnames: bool = False):
    arr = _arr(c)
    is_binary = pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)

    from .scalar import obj_array

    return obj_array([
        None if r is None else parse_dnstap_payload(
            r if not is_binary else bytes(r), lowercase_hostnames
        )
        for r in arr.to_pylist()
    ])
