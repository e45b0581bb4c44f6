"""Codecs — decode/encode kernels over Arrow batches (lib/codecs analog).

Decoders (reference lib/codecs/src/decoding/format/): json, csv,
logfmt, syslog.  Encoders (encoding/format/): json(ndjson), csv,
logfmt.  Parquet is the native in/out; these kernels cover text
interchange when a pipeline ingests or emits line-oriented formats.
Framing (newline-delimited) is implicit: one row = one line.

All decoders return (columns_table, error_mask) like parse.RegexParser,
so remap error-routing composes.
"""

from __future__ import annotations

import io
import json
import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from . import parse as _parse

# ------------------------------------------------------------- decode

def decode_json(col, keys: List[str], types: Optional[Dict[str, pa.DataType]] = None):
    """JSON object per line → one column per requested key."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    types = types or {}
    parsed = []
    err = []
    for v in col.to_pylist():
        try:
            d = json.loads(v)
            parsed.append(d if isinstance(d, dict) else None)
        except Exception:
            parsed.append(None)
        err.append(parsed[-1] is None)
    cols = {
        k: pa.array([None if p is None else p.get(k) for p in parsed], type=types.get(k))
        for k in keys
    }
    return pa.table(cols), pa.array(err)


def decode_json_auto(col):
    """Schema-inferring JSON deserializer
    (lib/codecs/src/decoding/format/json.rs test matrix):

    - an object payload → one event;
    - a top-level ARRAY expands to one event per element
      (deserialize_json_array);
    - an empty payload produces NO event (deserialize_skip_empty);
    - invalid JSON errors that input row (deserialize_error_invalid_json);
    - non-object scalars land under a ``message`` column (the
      non-object-event namespace behavior).

    Returns (expanded table, per-INPUT-row error mask) — the table's
    row count can exceed the input's.  Column set/types infer from the
    batch; pipelines needing a stable schema should use ``decode_json``
    with explicit keys.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    rows: List[dict] = []
    err: List[bool] = []
    for v in col.to_pylist():
        if v is None or (isinstance(v, (str, bytes)) and not v.strip()):
            err.append(False)  # empty payload: no event, no error
            continue
        try:
            d = json.loads(v)
        except Exception:
            err.append(True)
            continue
        err.append(False)
        items = d if isinstance(d, list) else [d]
        for it in items:
            rows.append(it if isinstance(it, dict) else {"message": it})
    # pa.Table.from_pylist infers columns from the FIRST row only;
    # union the key set explicitly so later-row-only fields survive
    keys: Dict[str, None] = {}
    for r in rows:
        for k in r:
            keys.setdefault(k)
    cols = {}
    for k in keys:
        vals = [r.get(k) for r in rows]
        try:
            cols[k] = pa.array(vals)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # heterogeneous value types across rows (legal JSON, no
            # single Arrow type): JSON-encode to strings instead of
            # failing the batch
            cols[k] = pa.array(
                [None if v is None else json.dumps(v) for v in vals], type=pa.string()
            )
    t = pa.table(cols) if cols else pa.table({"message": pa.array([], type=pa.string())})
    return t, pa.array(err)


def decode_csv(col, headers: List[str], types: Optional[Dict[str, pa.DataType]] = None):
    """CSV line per row → typed columns, via pyarrow's C++ CSV reader
    (quoting/escapes handled; one reassembled buffer per batch)."""
    from pyarrow import csv as pa_csv

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lines = col.to_pylist()
    buf = ("\n".join(x if x is not None else "" for x in lines) + "\n").encode()
    opts = pa_csv.ReadOptions(column_names=headers)
    conv = pa_csv.ConvertOptions(column_types=types or {})
    pars = pa_csv.ParseOptions(invalid_row_handler=lambda row: "skip")
    try:
        t = pa_csv.read_csv(io.BytesIO(buf), read_options=opts, convert_options=conv,
                            parse_options=pars)
    except Exception:
        t = pa.table({h: pa.array([None] * len(lines)) for h in headers})
    if t.num_rows != len(lines):
        # a skipped invalid row breaks positional alignment → per-row fallback
        rows, err = [], []
        for x in lines:
            try:
                one = pa_csv.read_csv(
                    io.BytesIO((x or "").encode() + b"\n"), read_options=opts,
                    convert_options=conv)
                rows.append({h: one[h][0].as_py() for h in headers})
                err.append(False)
            except Exception:
                rows.append({h: None for h in headers})
                err.append(True)
        return pa.Table.from_pylist(rows), pa.array(err)
    return t, pa.array([False] * len(lines))


_LOGFMT_VAL = r'(?:"(?P<q>(?:[^"\\]|\\.)*)"|(?P<u>\S+))'


def decode_logfmt(col, keys: List[str]):
    """logfmt (`k=v k2="v 2"`) → one string column per requested key.

    Vectorized: one RE2 extract per key (no per-row Python).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    cols = {}
    found_any = None
    for k in keys:
        pat = rf'(?:^|\s){k}=(?:"(?P<v_q>(?:[^"\\]|\\.)*)"|(?P<v_u>[^\s"]*))'
        ext = pc.extract_regex(col, pattern=pat)
        q = pc.struct_field(ext, "v_q")
        u = pc.struct_field(ext, "v_u")
        # RE2 non-participating groups extract as "" (not null): prefer the
        # quoted capture when non-empty, else the unquoted one; rows with
        # no match at all go null.  (Quoted escapes stay raw — documented.)
        val = pc.if_else(pc.not_equal(pc.fill_null(q, ""), ""), q, u)
        ok = pc.is_valid(ext)
        cols[k] = pc.if_else(ok, val, pa.scalar(None, type=pa.string()))
        found_any = ok if found_any is None else pc.or_(found_any, ok)
    err = pc.invert(found_any) if found_any is not None else pa.array([True] * len(col))
    return pa.table(cols), err


def decode_key_value(col, keys: List[str], pair_sep: str = ",", kv_sep: str = "="):
    """parse_key_value VRL-function analog: "a=1,b=2" → one string column
    per requested key (vectorized, one RE2 extract per key).  Also the
    unpack path for the canonical metric ``tags`` encoding."""
    import re as _re

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ps, ks = _re.escape(pair_sep), _re.escape(kv_sep)
    cols = {}
    any_found = None
    for k in keys:
        pat = rf"(?:^|{ps}){_re.escape(k)}{ks}(?P<v>[^{ps}]*)"
        ext = pc.extract_regex(col, pattern=pat)
        ok = pc.is_valid(ext)
        v = pc.struct_field(ext, "v")
        cols[k] = pc.if_else(ok, v, pa.scalar(None, type=pa.string()))
        any_found = ok if any_found is None else pc.or_(any_found, ok)
    err = pc.invert(any_found) if any_found is not None else pa.array([True] * len(col))
    return pa.table(cols), err


SYSLOG_3164_GROK = (
    r"<%{POSINT:pri:int}>%{DATA:stamp} %{HOSTNAME:hostname} "
    r"(?P<appname>[^\s\[:]+)(?:\[%{POSINT:procid:int}\])?: %{GREEDYDATA:msg}"
)
SYSLOG_5424_GROK = (
    r"<%{POSINT:pri:int}>1 %{TIMESTAMP_ISO8601:stamp} %{NOTSPACE:hostname} "
    r"%{NOTSPACE:appname} %{NOTSPACE:procid} %{NOTSPACE:msgid} "
    r"(?:-|\[%{DATA:sd}\]) ?%{GREEDYDATA:msg}"
)


def decode_syslog(col, rfc: str = "either"):
    """Syslog line → (pri/host/app/msg... columns, error mask).

    ``rfc``: "5424" | "3164" | "either" (default).  "either" mirrors the
    reference deserializer's syslog_loose ``Variant::Either``
    (decoding/format/syslog.rs:282): each line parses as RFC 5424
    first, falling back to RFC 3164; only lines matching neither error.
    3164 lines surface the 5424 column set with 5424-only fields null.
    """
    if rfc in ("5424", "3164"):
        parser = _parse.GrokParser(SYSLOG_5424_GROK if rfc == "5424" else SYSLOG_3164_GROK)
        cols, err = parser.parse(col)
        return pa.table(cols), err
    if rfc != "either":
        raise ValueError(f"decode_syslog: unknown rfc {rfc!r}")
    new_cols, new_err = _parse.GrokParser(SYSLOG_5424_GROK).parse(col)
    t = pa.table(new_cols)
    err = pc.fill_null(new_err, True)
    if not pc.any(err).as_py():
        return t, err
    old_cols, old_err = _parse.GrokParser(SYSLOG_3164_GROK).parse(col)
    old_err = pc.fill_null(old_err, True)
    use_old = pc.and_(err, pc.invert(old_err))
    for name in t.column_names:
        if name in old_cols:
            old = old_cols[name]
            new = t[name].combine_chunks() if isinstance(t[name], pa.ChunkedArray) else t[name]
            if old.type != new.type:
                old = old.cast(new.type)
            t = t.set_column(t.column_names.index(name), name, pc.if_else(use_old, old, new))
    return t, pc.and_(err, old_err)


# ------------------------------------------------------------- encode

def encode_ndjson(batch: pa.Table) -> pa.Array:
    """One JSON object string per row (polars vectorized writer)."""
    try:
        import polars as pl

        s = pl.from_arrow(batch).write_ndjson()
        lines = s.splitlines()
        return pa.array(lines, type=pa.string())
    except Exception:
        return pa.array([json.dumps(r, default=str) for r in batch.to_pylist()])


def encode_csv(batch: pa.Table, include_header: bool = False) -> pa.Array:
    from pyarrow import csv as pa_csv

    sink = io.BytesIO()
    pa_csv.write_csv(batch, sink)
    lines = sink.getvalue().decode().splitlines()
    if not include_header:
        lines = lines[1:]
    return pa.array(lines, type=pa.string())


def _csv_field_str(col: pa.Array) -> Tuple[pa.Array, bool]:
    """Stringify one column per the reference CSV serializer's value
    rules (encoding/format/csv.rs:248-262): numbers/bools via their
    shortest repr, timestamps RFC3339 AutoSi with Z, null/unsupported
    become empty.  Returns (strings, is_numeric) for non_numeric
    quoting."""
    t = col.type
    numeric = pa.types.is_integer(t) or pa.types.is_floating(t)
    if pa.types.is_timestamp(t):
        # Arrow's %S renders fractional seconds for sub-second units
        s = pc.strftime(pc.cast(col, pa.timestamp("us")), format="%Y-%m-%dT%H:%M:%S")
        # AutoSi: trim subseconds to the nearest SI step (ms/us), drop if zero
        s = pc.replace_substring_regex(s, pattern=r"\.000000$", replacement="")
        s = pc.replace_substring_regex(s, pattern=r"(\.\d{3})000$", replacement=r"\1")
        s = pc.binary_join_element_wise(s, "Z", "")
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        s = pc.cast(col, pa.string())
    elif numeric or pa.types.is_boolean(t):
        s = pc.cast(col, pa.string())
    elif pa.types.is_binary(t):
        s = pc.cast(col, pa.string())
    else:  # Array/Object/other — not supported by CSV (csv.rs:259)
        s = pa.nulls(len(col), pa.string())
    return pc.fill_null(s, ""), numeric


def encode_csv_fields(
    batch: pa.Table,
    fields: List[str],
    delimiter: str = ",",
    quote: str = '"',
    quote_style: str = "necessary",
    double_quote: bool = True,
    escape: str = '"',
) -> pa.Array:
    """CSV line per row with an explicit field order — the reference's
    configurable CSV serializer (encoding/format/csv.rs
    CsvSerializerOptions): duplicate fields repeat, missing fields are
    empty, quote_style ∈ necessary|always|never|non_numeric, quotes
    escape by doubling (double_quote) or with ``escape``.  Vectorized:
    one pass of Arrow kernels per field."""
    if not fields:
        raise ValueError("At least one CSV field must be specified")
    n = batch.num_rows
    parts = []
    for i, name in enumerate(fields):
        if name in batch.column_names:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s, numeric = _csv_field_str(col)
        else:
            s, numeric = pa.array([""] * n, type=pa.string()), False
        if quote_style == "never":
            need = pa.array([False] * n)
        elif quote_style == "always":
            need = pa.array([True] * n)
        elif quote_style == "non_numeric":
            need = pa.array([not numeric] * n)
        else:  # necessary: quote/delimiter/terminator present
            pat = "[" + re.escape(quote + delimiter) + "\n\r]"
            need = pc.match_substring_regex(s, pat)
        rep = (quote + quote) if double_quote else (escape + quote)
        escaped = pc.replace_substring(s, pattern=quote, replacement=rep)
        quoted = pc.binary_join_element_wise(
            pa.array([quote] * n), escaped, pa.array([quote] * n), "")
        s = pc.if_else(pc.fill_null(need, False), quoted, s)
        if i:
            parts.append(pa.array([delimiter] * n))
        parts.append(s)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def encode_logfmt(batch: pa.Table) -> pa.Array:
    """k=v logfmt per row, vectorized via binary_join_element_wise.
    String values with spaces get quoted."""
    n = batch.num_rows
    pieces = []
    for i, name in enumerate(batch.column_names):
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_string(col.type):
            sval = col.cast(pa.string())
        else:
            needs_quote = pc.match_substring(col, " ")
            quoted = pc.binary_join_element_wise(
                pa.array(['"'] * n), col, pa.array(['"'] * n), ""
            )
            sval = pc.if_else(pc.fill_null(needs_quote, False), quoted, col)
        prefix = ("" if i == 0 else " ") + name + "="
        pieces.append(pa.array([prefix] * n))
        pieces.append(pc.fill_null(sval, "null"))
    return pc.binary_join_element_wise(*pieces, "")


# GELF additional-field names: word chars, dots, dashes (plus '@' —
# the reference is lenient there because Graylog's own GELF output
# emits it).  lib/codecs/src/gelf.rs:75.
GELF_FIELD_RX = re.compile(r"^[\w.\-@]*$")
_GELF_SPEC_KEYS = frozenset(
    ("version", "host", "short_message", "full_message", "timestamp",
     "level", "facility", "line", "file")
)


def decode_gelf(col, extra_keys: Optional[List[str]] = None, strict: bool = True):
    """GELF decoder (lib/codecs/src/decoding/format/gelf.rs:128-220).

    Each line is a JSON object with required string fields ``version``,
    ``host``, ``short_message``; optional ``full_message``/``facility``/
    ``file`` (strings), ``timestamp`` (fractional epoch seconds →
    timestamp[us]; filled with decode time when omitted, per spec),
    ``level`` (u8), ``line`` (float — gelf.rs:168).  Additional fields
    are underscore-prefixed; ``_id`` is always dropped (spec).  With
    ``strict`` (the reference's default ValidationMode::Strict):
    version must be "1.1", additional names must be ``_``-prefixed and
    match ``[\\w.\\-@]*``, additional values must be string-or-number.
    Declared ``extra_keys`` surface with the underscore stripped.
    Returns (table, error_mask); a failed row is all-null + masked."""
    import datetime as _dt

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    extra_keys = extra_keys or []
    cols = ("version", "host", "message", "full_message", "timestamp",
            "level", "facility", "line", "file", *extra_keys)
    rows = {k: [] for k in cols}
    err = []
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

    def _fail():
        for k in rows:
            rows[k].append(None)
        err.append(True)

    for v in col.to_pylist():
        try:
            d = json.loads(v)
        except Exception:
            _fail()
            continue
        if not isinstance(d, dict):
            _fail()
            continue
        ver, host, msg = d.get("version"), d.get("host"), d.get("short_message")
        if not (isinstance(ver, str) and isinstance(host, str) and isinstance(msg, str)):
            _fail()
            continue
        if strict and ver != "1.1":
            _fail()
            continue
        full, fac, file_ = d.get("full_message"), d.get("facility"), d.get("file")
        ts, level, line = d.get("timestamp"), d.get("level"), d.get("line")
        num = lambda x: isinstance(x, (int, float)) and not isinstance(x, bool)
        if any(x is not None and not isinstance(x, str) for x in (full, fac, file_)):
            _fail()
            continue
        if ts is not None and not num(ts):
            _fail()
            continue
        if level is not None and not (isinstance(level, int)
                                      and not isinstance(level, bool)
                                      and 0 <= level <= 255):
            _fail()
            continue
        if line is not None and not num(line):
            _fail()
            continue
        if strict:
            bad = False
            for k, val in d.items():
                if k in _GELF_SPEC_KEYS or k == "_id":
                    continue
                if (not k.startswith("_") or not GELF_FIELD_RX.match(k)
                        or not (isinstance(val, str) or num(val))):
                    bad = True
                    break
            if bad:
                _fail()
                continue
        rows["version"].append(ver)
        rows["host"].append(host)
        rows["message"].append(msg)
        rows["full_message"].append(full)
        rows["timestamp"].append(
            now if ts is None else _dt.datetime.utcfromtimestamp(0)
            + _dt.timedelta(microseconds=round(ts * 1e6))
        )
        rows["level"].append(level)
        rows["facility"].append(fac)
        rows["line"].append(None if line is None else float(line))
        rows["file"].append(file_)
        for k in extra_keys:
            rows[k].append(None if k == "id" else d.get("_" + k))
        err.append(False)
    tbl = pa.table({
        "version": pa.array(rows["version"], type=pa.string()),
        "host": pa.array(rows["host"], type=pa.string()),
        "message": pa.array(rows["message"], type=pa.string()),
        "full_message": pa.array(rows["full_message"], type=pa.string()),
        "timestamp": pa.array(rows["timestamp"], type=pa.timestamp("us")),
        "level": pa.array(rows["level"], type=pa.int64()),
        "facility": pa.array(rows["facility"], type=pa.string()),
        "line": pa.array(rows["line"], type=pa.float64()),
        "file": pa.array(rows["file"], type=pa.string()),
        **{k: pa.array(rows[k]) for k in extra_keys},
    })
    return tbl, pa.array(err)


def parse_cef(col, extension_keys: Optional[List[str]] = None):
    """CEF (Common Event Format) decoder — VRL parse_cef semantics:

        CEF:ver|vendor|product|device_version|sig_id|name|severity|k=v k=v...

    Header fields may escape ``|`` with a backslash; extension values
    run to the next `` key=`` boundary.  Returns (table, error_mask)."""
    import re

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    header_names = ["cef_version", "device_vendor", "device_product",
                    "device_version", "signature_id", "name", "severity"]
    ext_re = re.compile(r"(\w+)=((?:[^=]|\\=)*?)(?=\s+\w+=|$)")
    known = set(extension_keys or [])
    rows = {k: [] for k in header_names}
    ext_rows: Dict[str, list] = {k: [] for k in known}
    err = []
    split_re = re.compile(r"(?<!\\)\|")
    for v in col.to_pylist():
        ok = isinstance(v, str) and v.startswith("CEF:")
        parts = split_re.split(v[4:], maxsplit=7) if ok else []
        if not ok or len(parts) < 7:
            for k in rows:
                rows[k].append(None)
            for k in ext_rows:
                ext_rows[k].append(None)
            err.append(True)
            continue
        for name, val in zip(header_names, parts[:7]):
            rows[name].append(val.replace("\\|", "|").replace("\\\\", "\\"))
        ext = parts[7] if len(parts) > 7 else ""
        kv = {m.group(1): m.group(2).strip() for m in ext_re.finditer(ext)}
        for k in ext_rows:
            ext_rows[k].append(kv.get(k))
        err.append(False)
    tbl = pa.table({
        **{k: pa.array(rows[k], type=pa.string()) for k in header_names},
        **{k: pa.array(ext_rows[k], type=pa.string()) for k in sorted(ext_rows)},
    })
    return tbl, pa.array(err)


def decode_protobuf(col, descriptor_set: bytes, message_type: str,
                    keys: Optional[List[str]] = None):
    """Protobuf decoder (lib/codecs/src/decoding/format/protobuf.rs
    semantics): ``descriptor_set`` is a serialized FileDescriptorSet
    (protoc --descriptor_set_out), ``message_type`` the fully-qualified
    message name.  Each row's binary payload decodes to the requested
    top-level fields.  Returns (table, error_mask)."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory
    from google.protobuf.json_format import MessageToDict

    pool = descriptor_pool.DescriptorPool()
    fds = descriptor_pb2.FileDescriptorSet.FromString(descriptor_set)
    for f in fds.file:
        pool.Add(f)
    desc = pool.FindMessageTypeByName(message_type)
    cls = message_factory.GetMessageClass(desc)
    if keys is None:
        keys = [f.name for f in desc.fields]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    rows = {k: [] for k in keys}
    err = []
    for v in col.to_pylist():
        try:
            msg = cls.FromString(v)
            d = MessageToDict(msg, preserving_proto_field_name=True)
        except Exception:
            for k in keys:
                rows[k].append(None)
            err.append(True)
            continue
        for k in keys:
            val = d.get(k)
            rows[k].append(json.dumps(val) if isinstance(val, (dict, list)) else val)
        err.append(False)
    return pa.table({k: pa.array(rows[k]) for k in keys}), pa.array(err)


# ------------------------------------------------------ avro (datum)

class _AvroReader:
    """Minimal Apache Avro binary datum decoder — from the public Avro
    1.11 specification (zigzag varints, length-prefixed bytes/strings,
    records/arrays/maps/unions/enums/fixed).  No external library."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _varint(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read(self, schema):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union: branch index then value
            idx = self._varint()
            return self.read(schema[idx])
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            v = self.buf[self.pos] != 0
            self.pos += 1
            return v
        if t in ("int", "long"):
            return self._varint()
        if t == "float":
            import struct as _s

            v = _s.unpack_from("<f", self.buf, self.pos)[0]
            self.pos += 4
            return v
        if t == "double":
            import struct as _s

            v = _s.unpack_from("<d", self.buf, self.pos)[0]
            self.pos += 8
            return v
        if t in ("bytes", "string"):
            n = self._varint()
            v = self.buf[self.pos : self.pos + n]
            self.pos += n
            return v.decode("utf-8") if t == "string" else bytes(v)
        if t == "record":
            return {f["name"]: self.read(f["type"]) for f in schema["fields"]}
        if t == "enum":
            return schema["symbols"][self._varint()]
        if t == "fixed":
            n = schema["size"]
            v = bytes(self.buf[self.pos : self.pos + n])
            self.pos += n
            return v
        if t == "array":
            out = []
            while True:
                n = self._varint()
                if n == 0:
                    break
                if n < 0:  # block with byte size prefix
                    n = -n
                    self._varint()
                for _ in range(n):
                    out.append(self.read(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = self._varint()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self._varint()
                for _ in range(n):
                    k = _AvroReader.read(self, "string")
                    out[k] = self.read(schema["values"])
            return out
        raise ValueError(f"unsupported avro type {t!r}")


def decode_avro(col, schema: dict, keys: Optional[List[str]] = None):
    """Avro binary datum per row → top-level record fields
    (lib/codecs avro deserializer analog; schema is the parsed Avro
    record schema).  Returns (table, error_mask)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if keys is None:
        keys = [f["name"] for f in schema["fields"]]
    rows = {k: [] for k in keys}
    err = []
    for v in col.to_pylist():
        try:
            rec = _AvroReader(v).read(schema)
        except Exception:
            for k in keys:
                rows[k].append(None)
            err.append(True)
            continue
        for k in keys:
            val = rec.get(k)
            rows[k].append(
                json.dumps(val) if isinstance(val, (dict, list)) else val
            )
        err.append(False)
    return pa.table({k: pa.array(rows[k]) for k in keys}), pa.array(err)


def encode_gelf(batch: pa.Table, host_col: str = "host",
                message_col: str = "message") -> pa.Array:
    """GELF encoder: one JSON line per row with required version/host/
    short_message; remaining columns become underscore-prefixed
    additional fields (GELF spec).

    Per-event validation (encoding/format/gelf.rs
    gelf_serializing_invalid_error): a row missing host or
    short_message encodes as NULL rather than emitting an invalid GELF
    document or failing the batch."""
    cols = batch.column_names
    # a missing COLUMN is a misconfiguration, not a per-event error —
    # fail loudly rather than emitting an all-NULL batch
    for required in (host_col, message_col):
        if required not in cols:
            raise KeyError(f"encode_gelf: column {required!r} not in batch "
                           f"(have {cols})")
    standard = {"level", "full_message", "timestamp"}
    extras = [c for c in cols if c not in (host_col, message_col) and c not in standard]
    data = {c: batch[c].to_pylist() for c in cols}
    out = []
    for i in range(batch.num_rows):
        host = data[host_col][i]
        msg = data[message_col][i]
        if host is None or msg is None:
            out.append(None)  # required-field error: per-event skip
            continue
        d = {"version": "1.1", "host": host, "short_message": msg}
        for c in standard & set(cols):
            v = data[c][i]
            if v is not None:
                d[c] = v
        for c in extras:
            v = data[c][i]
            if v is not None:
                d["_" + c] = v
        out.append(json.dumps(d, sort_keys=True))
    return pa.array(out, type=pa.string())


class _AvroWriter:
    """Minimal Avro binary datum encoder (inverse of _AvroReader)."""

    def __init__(self):
        self.out = bytearray()

    def _varint(self, n: int) -> None:
        z = (n << 1) ^ (n >> 63)  # zigzag
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def write(self, schema, value) -> None:
        t = schema if isinstance(schema, str) else (
            schema if isinstance(schema, list) else schema["type"])
        if isinstance(schema, list):  # union
            for idx, branch in enumerate(schema):
                bt = branch if isinstance(branch, str) else branch["type"]
                if (value is None) == (bt == "null"):
                    if value is None and bt != "null":
                        continue
                    self._varint(idx)
                    return self.write(branch, value)
            raise ValueError("no union branch for value")
        if t == "null":
            return
        if t == "boolean":
            self.out.append(1 if value else 0)
        elif t in ("int", "long"):
            self._varint(int(value))
        elif t == "float":
            import struct as _s

            self.out += _s.pack("<f", value)
        elif t == "double":
            import struct as _s

            self.out += _s.pack("<d", value)
        elif t in ("bytes", "string"):
            b = value.encode("utf-8") if t == "string" else value
            self._varint(len(b))
            self.out += b
        elif t == "record":
            for f in schema["fields"]:
                self.write(f["type"], value[f["name"]])
        elif t == "enum":
            self._varint(schema["symbols"].index(value))
        elif t == "fixed":
            self.out += value
        elif t == "array":
            if value:
                self._varint(len(value))
                for x in value:
                    self.write(schema["items"], x)
            self._varint(0)
        elif t == "map":
            if value:
                self._varint(len(value))
                for k, v in value.items():
                    self.write("string", k)
                    self.write(schema["values"], v)
            self._varint(0)
        else:
            raise ValueError(f"unsupported avro type {t!r}")


def encode_avro(batch: pa.Table, schema: dict) -> pa.Array:
    """Rows → Avro binary datums per the record ``schema`` (top-level
    fields read from same-named columns)."""
    names = [f["name"] for f in schema["fields"]]
    data = {n: batch[n].to_pylist() for n in names}
    out = []
    for i in range(batch.num_rows):
        w = _AvroWriter()
        w.write(schema, {n: data[n][i] for n in names})
        out.append(bytes(w.out))
    return pa.array(out, type=pa.binary())


def parse_syslog_sd(col):
    """RFC 5424 STRUCTURED-DATA → JSON object string per row:
    '[id@123 k="v" k2="v2"][id2 a="b"]' → {"id@123": {...}, "id2": {...}}.
    Escaped characters (\\" \\] \\\\) unescape per the RFC."""
    import re as _re

    el_re = _re.compile(r'\[([^\s\]]+)((?:\s+[^\s=\]]+=\s*"(?:[^"\\]|\\.)*")*)\]')
    kv_re = _re.compile(r'([^\s=\]]+)=\s*"((?:[^"\\]|\\.)*)"')
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        s = v if v.lstrip().startswith("[") else f"[{v}]"
        d = {}
        for m in el_re.finditer(s):
            sd_id, body = m.group(1), m.group(2)
            d[sd_id] = {
                k: val.replace('\\"', '"').replace("\\]", "]").replace("\\\\", "\\")
                for k, val in kv_re.findall(body)
            }
        out.append(json.dumps(d, sort_keys=True) if d else None)
    return pa.array(out, type=pa.string())


_AVRO_MAGIC = b"Obj\x01"


def write_avro_ocf(path: str, batch: pa.Table, schema: dict,
                   codec: str = "null", sync: bytes = b"\x00" * 16) -> None:
    """Write an Avro Object Container File (public Avro 1.11 spec:
    magic, metadata map with avro.schema/avro.codec, sync-marked data
    blocks).  Codec: null or deflate (raw zlib)."""
    import zlib

    w = _AvroWriter()
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    w.out += _AVRO_MAGIC
    w._varint(len(meta))
    for k, v in meta.items():
        w.write("string", k)
        w.write("bytes", v)
    w._varint(0)  # end of metadata map
    w.out += sync
    body = _AvroWriter()
    names = [f["name"] for f in schema["fields"]]
    data = {n: batch[n].to_pylist() for n in names}
    for i in range(batch.num_rows):
        body.write(schema, {n: data[n][i] for n in names})
    payload = bytes(body.out)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    w._varint(batch.num_rows)
    w._varint(len(payload))
    w.out += payload
    w.out += sync
    with open(path, "wb") as f:
        f.write(bytes(w.out))


def read_avro_ocf(path: str) -> pa.Table:
    """Read an Avro Object Container File → Arrow table of top-level
    record fields (codec null/deflate; complex values as JSON strings)."""
    import zlib

    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    r = _AvroReader(buf)
    r.pos = 4
    meta = {}
    while True:
        n = r._varint()
        if n == 0:
            break
        if n < 0:
            n = -n
            r._varint()
        for _ in range(n):
            k = r.read("string")
            meta[k] = r.read("bytes")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf[r.pos : r.pos + 16]
    r.pos += 16
    names = [f["name"] for f in schema["fields"]]
    rows = {k: [] for k in names}
    while r.pos < len(buf):
        count = r._varint()
        size = r._varint()
        payload = buf[r.pos : r.pos + size]
        r.pos += size
        if buf[r.pos : r.pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        r.pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _AvroReader(payload)
        for _ in range(count):
            rec = br.read(schema)
            for k in names:
                v = rec.get(k)
                rows[k].append(
                    json.dumps(v) if isinstance(v, (dict, list)) else v
                )
    return pa.table({k: pa.array(rows[k]) for k in names})


# ------------------------------------------------- influxdb + native_json


def parse_influx_line(line: str) -> dict:
    """Parse ONE InfluxDB line-protocol line into a flat dict:
    measurement, tag.<k>, field.<k> (stringified), timestamp (ns).

    Escaping per the public line-protocol spec: ``\\,`` ``\\ `` ``\\=``
    inside identifiers/tags; string field values in double quotes with
    ``\\"`` escapes; integer fields carry an ``i`` suffix, booleans are
    t/f/true/false.  (lib/codecs decoding/format/influxdb.rs parses via
    the influxdb_line_protocol crate — same grammar.)"""
    out: dict = {}

    def _split_unescaped(s: str, sep: str):
        parts, cur, i = [], [], 0
        while i < len(s):
            ch = s[i]
            if ch == "\\" and i + 1 < len(s):
                cur.append(s[i : i + 2])
                i += 2
                continue
            if ch == sep:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            i += 1
        parts.append("".join(cur))
        return parts

    def _unescape(s: str) -> str:
        return re.sub(r"\\([,= ])", r"\1", s)

    # split off the field set + optional timestamp at the first
    # unescaped, un-quoted space
    segments, cur, in_quotes, i = [], [], False, 0
    while i < len(line):
        ch = line[i]
        if ch == "\\" and i + 1 < len(line):
            cur.append(line[i : i + 2])
            i += 2
            continue
        if ch == '"':
            in_quotes = not in_quotes
        if ch == " " and not in_quotes:
            segments.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    segments.append("".join(cur))
    segments = [s for s in segments if s != ""]
    if len(segments) < 2:
        raise ValueError(f"influx line missing field set: {line!r}")
    series, fieldset = segments[0], segments[1]
    if len(segments) > 2:
        out["timestamp"] = segments[2]

    series_parts = _split_unescaped(series, ",")
    out["measurement"] = _unescape(series_parts[0])
    for tag in series_parts[1:]:
        k, _, v = tag.partition("=")
        out[f"tag.{_unescape(k)}"] = _unescape(v)

    for fld in _split_unescaped(fieldset, ","):
        k, _, v = fld.partition("=")
        out[f"field.{_unescape(k)}"] = v
    return out


def decode_influxdb(col, default_ts_ns: int = 0) -> pa.Table:
    """InfluxDB line-protocol column → metric rows, one per NUMERIC
    field: name = measurement_field, kind=absolute (gauge), canonical
    tags string, value float64, ts timestamp[us]
    (decoding/format/influxdb.rs:87-146; string fields are skipped
    exactly as the reference does)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    names, tags_out, values, ts_out = [], [], [], []
    for line in col.to_pylist():
        if line is None or not line.strip():
            continue
        try:
            d = parse_influx_line(line)
            if "measurement" not in d or not any(k.startswith("field.") for k in d):
                raise ValueError("no fields")
            ts_ns = int(d.get("timestamp", default_ts_ns))
        except ValueError as exc:
            # reference parity: a malformed line is a decode error
            # (decoding/format/influxdb.rs deserialize_error test)
            raise ValueError(f"invalid influxdb line {line!r}: {exc}") from exc
        tags = {k[4:]: v for k, v in d.items() if k.startswith("tag.")}
        canon = ",".join(f"{k}={tags[k]}" for k in sorted(tags))
        for k, v in d.items():
            if not k.startswith("field."):
                continue
            fname = k[6:]
            if v.startswith('"'):
                continue  # string fields cannot be modelled (reference parity)
            try:
                if v in ("t", "T", "true", "True"):
                    fv = 1.0
                elif v in ("f", "F", "false", "False"):
                    fv = 0.0
                elif v.endswith(("i", "u")):
                    fv = float(int(v[:-1]))
                else:
                    fv = float(v)
            except ValueError as exc:
                raise ValueError(
                    f"invalid influxdb line {line!r}: bad field value {v!r}"
                ) from exc
            names.append(f"{d['measurement']}_{fname}")
            tags_out.append(canon)
            values.append(fv)
            ts_out.append(ts_ns // 1000)
    return pa.table({
        "name": pa.array(names, type=pa.string()),
        "namespace": pa.array([""] * len(names), type=pa.string()),
        "tags": pa.array(tags_out, type=pa.string()),
        "kind": pa.array(["absolute"] * len(names), type=pa.string()),
        "value": pa.array(values, type=pa.float64()),
        "ts": pa.array(ts_out, type=pa.int64()).cast(pa.timestamp("us")),
    })


def decode_native_json(col) -> pa.Table:
    """Vector native JSON event format → typed rows
    (lib/codecs/src/decoding/format/native_json.rs; the schema is the
    public vector data model: {"log": {...}} | {"metric": {"name",
    "kind", "counter"/"gauge"/"set"/... }}).

    Logs land as (event_type="log", fields=map); metrics land as
    (event_type="metric", name, kind, value, tags) — the engine's
    canonical metric columns."""
    import json as _json

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    etype, fields, names, kinds, values, tags_l = [], [], [], [], [], []
    for s in col.to_pylist():
        if s is None:
            continue
        ev = _json.loads(s)
        if "log" in ev:
            etype.append("log")
            fields.append([(k, _json.dumps(v) if isinstance(v, (dict, list))
                            else (None if v is None else str(v)))
                           for k, v in ev["log"].items()])
            names.append(None)
            kinds.append(None)
            values.append(None)
            tags_l.append(None)
        elif "metric" in ev:
            m = ev["metric"]
            etype.append("metric")
            fields.append(None)
            names.append(m.get("name"))
            kinds.append(m.get("kind", "absolute"))
            val = None
            for mv_key in ("counter", "gauge"):
                if mv_key in m:
                    val = float(m[mv_key]["value"])
            values.append(val)
            tags = m.get("tags") or {}
            tags_l.append(",".join(f"{k}={tags[k]}" for k in sorted(tags)))
        else:
            raise ValueError(f"native_json: unknown event shape {sorted(ev)}")
    return pa.table({
        "event_type": pa.array(etype, type=pa.string()),
        "fields": pa.array(fields, type=pa.map_(pa.string(), pa.string())),
        "name": pa.array(names, type=pa.string()),
        "kind": pa.array(kinds, type=pa.string()),
        "value": pa.array(values, type=pa.float64()),
        "tags": pa.array(tags_l, type=pa.string()),
    })


# ------------------------------------------------------- native (protobuf)


def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_varint((field << 3) | 2) + _pb_varint(len(payload)) + payload


def _pb_vint(field: int, v: int) -> bytes:
    return _pb_varint(field << 3) + _pb_varint(v)


def _native_value_decode(buf: bytes) -> object:
    """event.proto Value (lib/vector-core/proto/event.proto:60-71):
    raw_bytes=1, timestamp=2, integer=4, float=5, boolean=6, map=7,
    array=8, null=9."""
    import struct as _struct

    from .otlp import _fields

    for f, _wt, v in _fields(buf):
        if f == 1:
            return v.decode("utf-8", "replace")
        if f == 2:
            sec = nanos = 0
            for tf, _tw, tv in _fields(v):
                if tf == 1:
                    sec = tv
                elif tf == 2:
                    nanos = tv
            return sec * 1_000_000_000 + nanos
        if f == 4:
            return v - (1 << 64) if v >= (1 << 63) else v
        if f == 5:
            return _struct.unpack("<d", v)[0]
        if f == 6:
            return bool(v)
        if f == 7:
            out = {}
            for mf, _mw, mv in _fields(v):
                if mf == 1:
                    k, val = _native_map_entry(mv)
                    out[k] = val
            return out
        if f == 8:
            return [_native_value_decode(iv) for i, _w, iv in _fields(v) if i == 1]
        if f == 9:
            return None
    return None


def _native_map_entry(buf: bytes):
    from .otlp import _fields

    k, val = "", None
    for f, _wt, v in _fields(buf):
        if f == 1:
            k = v.decode("utf-8", "replace")
        elif f == 2:
            val = _native_value_decode(v)
    return k, val


def decode_native(col) -> pa.Table:
    """Vector native protobuf event format → typed rows
    (lib/codecs/src/decoding/format/native.rs; wire schema is the
    public lib/vector-core/proto/event.proto EventWrapper).  Output
    shape matches decode_native_json: logs/traces land as
    (event_type, fields=map), metrics as (event_type="metric", name,
    kind, value, tags)."""
    from .otlp import _fields

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()

    def _stringify(v):
        if v is None:
            return None
        if isinstance(v, (dict, list)):
            return json.dumps(v)
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    etype, fields, names, kinds, values, tags_l = [], [], [], [], [], []
    for raw in col.to_pylist():
        if raw is None:
            continue
        kind_name, payload = None, None
        for f, _wt, v in _fields(bytes(raw)):
            if f in (1, 2, 3):
                kind_name = {1: "log", 2: "metric", 3: "trace"}[f]
                payload = v
        if kind_name in ("log", "trace"):
            fmap = {}
            for f, _wt, v in _fields(payload):
                if f == 1:
                    k, val = _native_map_entry(v)
                    fmap[k] = _stringify(val)
            etype.append(kind_name)
            fields.append(list(fmap.items()))
            names.append(None)
            kinds.append(None)
            values.append(None)
            tags_l.append(None)
        elif kind_name == "metric":
            import struct as _struct

            name = ""
            kind = "incremental"
            val = None
            tags = {}
            for f, _wt, v in _fields(payload):
                if f == 1:
                    name = v.decode("utf-8", "replace")
                elif f == 3:  # tags_v1 map<string,string>
                    tk, tv = "", ""
                    for mf, _mw, mv in _fields(v):
                        if mf == 1:
                            tk = mv.decode("utf-8", "replace")
                        elif mf == 2:
                            tv = mv.decode("utf-8", "replace")
                    tags[tk] = tv
                elif f == 4:
                    kind = "absolute" if v == 1 else "incremental"
                elif f in (5, 6):  # Counter / Gauge {value=1 double}
                    for cf, _cw, cv in _fields(v):
                        if cf == 1:
                            val = _struct.unpack("<d", cv)[0]
            etype.append("metric")
            fields.append(None)
            names.append(name)
            kinds.append(kind)
            values.append(val)
            tags_l.append(",".join(f"{k}={tags[k]}" for k in sorted(tags)))
        else:
            raise ValueError("native: EventWrapper without log/metric/trace")
    return pa.table({
        "event_type": pa.array(etype, type=pa.string()),
        "fields": pa.array(fields, type=pa.map_(pa.string(), pa.string())),
        "name": pa.array(names, type=pa.string()),
        "kind": pa.array(kinds, type=pa.string()),
        "value": pa.array(values, type=pa.float64()),
        "tags": pa.array(tags_l, type=pa.string()),
    })


def encode_native(batch: pa.Table) -> pa.Array:
    """Symmetric encoder (lib/codecs/src/encoding/format/native.rs):
    rows in decode_native's output shape → EventWrapper frames.  Log
    field values encode as raw_bytes strings (our field maps are
    string→string); metric rows encode name/kind/tags and the value as
    a Counter for incremental kind, Gauge for absolute."""
    import struct as _struct

    out = []
    for row in batch.to_pylist():
        if row.get("event_type") == "metric":
            m = _pb_len(1, row["name"].encode())
            for kv in (row.get("tags") or "").split(","):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    m += _pb_len(3, _pb_len(1, k.encode()) + _pb_len(2, v.encode()))
            kind_abs = row.get("kind") == "absolute"
            m += _pb_vint(4, 1 if kind_abs else 0)
            if row.get("value") is not None:
                payload = _pb_varint((1 << 3) | 1) + _struct.pack("<d", row["value"])
                m += _pb_len(6 if kind_abs else 5, payload)
            out.append(_pb_len(2, m))
        else:
            fm = row.get("fields") or []
            items = fm.items() if isinstance(fm, dict) else fm
            body = b""
            for k, v in items:
                val = _pb_vint(9, 0) if v is None else _pb_len(1, str(v).encode())
                body += _pb_len(1, _pb_len(1, k.encode()) + _pb_len(2, val))
            fno = 3 if row.get("event_type") == "trace" else 1
            out.append(_pb_len(fno, body))
    return pa.array(out, type=pa.binary())


def encode_protobuf(batch: pa.Table, descriptor_set: bytes, message_type: str) -> pa.Array:
    """Protobuf encoder (lib/codecs/src/encoding/format/protobuf.rs
    semantics, symmetric to decode_protobuf): each row's columns become
    one serialized message of ``message_type``.  String cells holding
    JSON objects/arrays fill nested/repeated fields."""
    from google.protobuf import descriptor_pb2, descriptor_pool, json_format, message_factory

    pool = descriptor_pool.DescriptorPool()
    fds = descriptor_pb2.FileDescriptorSet.FromString(descriptor_set)
    for f in fds.file:
        pool.Add(f)
    desc = pool.FindMessageTypeByName(message_type)
    cls = message_factory.GetMessageClass(desc)
    field_names = {f.name for f in desc.fields}
    rows = batch.to_pylist()
    out = []
    for row in rows:
        d = {}
        for k, v in row.items():
            if k not in field_names or v is None:
                continue
            if isinstance(v, str) and v[:1] in ("{", "["):
                try:
                    v = json.loads(v)
                except ValueError:
                    pass
            d[k] = v
        msg = json_format.ParseDict(d, cls(), ignore_unknown_fields=True)
        out.append(msg.SerializeToString())
    return pa.array(out, type=pa.binary())


# ------------------------------------------------------- arrow IPC stream

def _coerce_to_field(batch: pa.Table, field: pa.Field) -> pa.Array:
    """Coerce one batch column to an output schema field, per the
    reference's Arrow serializer rules (encoding/format/arrow.rs
    build_record_batch): wrong-kind values become null, integer targets
    range-check per row, Utf8 targets JSON-serialize nested values and
    stringify scalars, timestamp targets accept native/RFC3339-string/
    raw-integer sources.  Per-row type mixing cannot occur here (an
    Arrow column has one type), so kind rules apply per column."""
    n = batch.num_rows
    t = field.type
    if field.name not in batch.column_names:
        return pa.nulls(n, t)
    col = batch[field.name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    src = col.type

    def _nulls():
        return pa.nulls(n, t)

    if pa.types.is_integer(t):
        if pa.types.is_integer(src):
            lo, hi = (0, 2 ** t.bit_width - 1) if not pa.types.is_signed_integer(t) \
                else (-(2 ** (t.bit_width - 1)), 2 ** (t.bit_width - 1) - 1)
            ok = pc.and_kleene(pc.greater_equal(col, lo), pc.less_equal(col, hi))
            masked = pc.if_else(ok, col, pa.scalar(None, src))
            return pc.cast(masked, t)
        return _nulls()
    if pa.types.is_floating(t):
        if pa.types.is_integer(src) or pa.types.is_floating(src):
            return pc.cast(col, t)
        return _nulls()
    if pa.types.is_boolean(t):
        return col if pa.types.is_boolean(src) else _nulls()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        if pa.types.is_binary(src) or pa.types.is_large_binary(src) \
                or pa.types.is_string(src) or pa.types.is_large_string(src):
            return pc.cast(col, t)
        return _nulls()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        if pa.types.is_string(src) or pa.types.is_large_string(src):
            return pc.cast(col, t)
        if pa.types.is_struct(src) or pa.types.is_list(src) or pa.types.is_large_list(src) \
                or pa.types.is_map(src):
            return pa.array(
                [None if v is None else json.dumps(v, separators=(",", ":"), default=str)
                 for v in col.to_pylist()],
                type=t,
            )
        try:
            return pc.cast(col, t)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return _nulls()
    if pa.types.is_timestamp(t):
        if pa.types.is_timestamp(src):
            return pc.cast(col, t, safe=False)
        if pa.types.is_integer(src):  # raw epoch in the target unit
            return pc.cast(pc.cast(col, pa.int64()), t)
        if pa.types.is_string(src) or pa.types.is_large_string(src):
            import datetime as _dt

            out = []
            for v in col.to_pylist():
                try:
                    d = _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
                    if d.tzinfo is not None:
                        d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                    out.append(d)
                except (ValueError, TypeError):
                    out.append(None)
            return pc.cast(pa.array(out, type=pa.timestamp("us")), t, safe=False)
        return _nulls()
    if pa.types.is_decimal(t):
        if pa.types.is_integer(src) or pa.types.is_floating(src):
            # two-step: widen to max precision first (pyarrow requires
            # worst-case precision for int casts), then narrow
            wide = pa.decimal256(76, t.scale)
            return pc.cast(pc.cast(col, wide, safe=False), t, safe=False)
        return _nulls()
    raise ValueError(
        f"unsupported Arrow target type {t} for field {field.name!r}"
    )


def coerce_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project + coerce a batch onto a static output schema (the
    build_record_batch step of the reference's Arrow serializer).
    A null (or coerced-away) value in a non-nullable field errors."""
    arrays = []
    for field in schema:
        arr = _coerce_to_field(batch, field)
        if not field.nullable and arr.null_count:
            raise ValueError(f"null value for non-nullable field {field.name!r}")
        arrays.append(arr)
    return pa.Table.from_arrays(arrays, schema=schema)


def encode_arrow(batch: pa.Table, schema: pa.Schema) -> bytes:
    """Encode a batch as an Arrow IPC *stream* against a static schema
    (encoding/format/arrow.rs encode_events_to_arrow_ipc_stream).
    Empty input and missing schema are errors."""
    if schema is None:
        raise ValueError("arrow encoding requires a schema")
    if batch.num_rows == 0:
        raise ValueError("no events to encode")
    out = coerce_to_schema(batch, schema)
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, schema) as writer:
        writer.write_table(out)
    return sink.getvalue()


def decode_arrow(data: bytes) -> pa.Table:
    """Read an Arrow IPC stream back into a table (round-trip of
    encode_arrow; decoder side is our extension — the reference ships
    the serializer only)."""
    with pa.ipc.open_stream(io.BytesIO(data)) as reader:
        return reader.read_all()


def encode_cef(
    batch: pa.Table,
    device_vendor: str = "Datadog",
    device_product: str = "Vector",
    device_version: str = "",
    device_event_class_id: str = "",
    version: str = "0",
    name_col: str = "name",
    severity_col: str = "severity",
    extensions: Optional[Dict[str, str]] = None,
) -> pa.Array:
    """CEF serializer (encoding/format/cef.rs:260-345):

        CEF:{version}|{vendor}|{product}|{device_version}|{class_id}|{name}|{severity}|{ext}

    Header values escape ``\\`` and ``|``; extension values escape
    ``\\`` and ``=``; extensions render sorted by key, joined with
    spaces, and a null/empty value drops that extension for the row
    (the reference skips empty values).  Severity must be an integer
    0..10 — a row with an out-of-range or non-numeric severity encodes
    as NULL (the serializer's per-event error; the batch survives).
    """

    def _esc_header(s: str) -> str:
        return s.replace("\\", "\\\\").replace("|", "\\|")

    def _esc_col(col, extra: str):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_string(col.type):
            col = col.cast(pa.string())
        col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
        return pc.replace_substring(col, pattern=extra, replacement="\\" + extra)

    n = batch.num_rows
    sev = batch[severity_col]
    if isinstance(sev, pa.ChunkedArray):
        sev = sev.combine_chunks()
    try:
        sev_int = sev.cast(pa.int64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        out = []
        for v in sev.to_pylist():
            try:
                out.append(None if v is None else int(v))
            except (TypeError, ValueError):
                out.append(None)
        sev_int = pa.array(out, type=pa.int64())
    # per-EVENT error like the reference serializer: an invalid or
    # out-of-range severity nulls that row's output instead of failing
    # the whole batch (cef.rs SeverityMaxValueSnafu is per encode call)
    bad = pc.fill_null(pc.or_(pc.less(sev_int, 0), pc.greater(sev_int, 10)), True)
    sev_int = pc.if_else(bad, pa.scalar(None, type=pa.int64()), sev_int)

    head = "CEF:{}|{}|{}|{}|{}|".format(
        version,
        _esc_header(device_vendor),
        _esc_header(device_product),
        _esc_header(device_version),
        _esc_header(device_event_class_id),
    )
    pieces = [
        pa.array([head] * n, type=pa.string()),
        _esc_col(batch[name_col], "|"),
        pa.array(["|"] * n, type=pa.string()),
        sev_int.cast(pa.string()),
    ]
    ext_pieces = []
    for key in sorted(extensions or {}):
        col = batch[(extensions or {})[key]]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # empty string values drop the extension like nulls do
        if pa.types.is_string(col.type):
            col = pc.if_else(pc.equal(col, ""), pa.scalar(None, type=pa.string()), col)
        v = _esc_col(col, "=")
        kp = pa.array([key + "="] * n, type=pa.string())
        ext_pieces.append(pc.binary_join_element_wise(kp, v, "", null_handling="emit_null"))
    if ext_pieces:
        ext = pc.binary_join_element_wise(*ext_pieces, " ", null_handling="skip") \
            if len(ext_pieces) > 1 else pc.fill_null(ext_pieces[0], "")
        bar = pc.if_else(
            pc.equal(ext, ""), pa.scalar("", type=pa.string()), pa.scalar("|", type=pa.string())
        )
        pieces += [bar, ext]
    return pc.binary_join_element_wise(*pieces, "")


def encode_json_metric(batch: pa.Table) -> pa.Array:
    """Metric rows → the reference's metric JSON shape
    (lib/codecs/src/encoding/format/json.rs serialize_json_metric_*):

        {"name":..,"namespace"?,"tags"?:{..sorted..},"timestamp"?,
         "kind":..,"counter"|{..}|"gauge"|"set"|"distribution":{..}}

    Field order matches the serializer (name, namespace, tags,
    timestamp, kind, value struct); tags decode from the canonical
    ``k=v,k=v`` encoding and render byte-sorted (BTreeMap order);
    histogram/summary/distribution rows render as single-sample
    Distribution payloads with their statistic kind.  Timestamps are
    microsecond RFC3339 (the engine's resolution; the reference prints
    whatever sub-second precision the event carries).
    """
    cols = {c: batch[c].to_pylist() for c in batch.column_names}
    n = batch.num_rows
    has = cols.__contains__
    out = []
    for i in range(n):
        d = {"name": cols["name"][i]}
        ns = cols["namespace"][i] if has("namespace") else None
        if ns:
            d["namespace"] = ns
        tags = cols["tags"][i] if has("tags") else None
        if tags:
            # canonical k=v,k=v may repeat a key (multi-value TagValueSet)
            # and carry bare keys (TagValue::Bare → null).  Full encoding
            # serializes a multi-value tag as a list
            # (json.rs serialize_metric_tags_full: {"a":["first",null,..]});
            # single-value tags stay scalars.
            grouped: Dict[str, list] = {}
            for piece in tags.split(","):
                if not piece:
                    continue
                k, _, v = piece.partition("=")
                grouped.setdefault(k, []).append(v if "=" in piece else None)
            d["tags"] = {
                k: (vs[0] if len(vs) == 1 else vs) for k, vs in sorted(grouped.items())
            }
        ts = cols["ts"][i] if has("ts") else None
        if ts is not None:
            d["timestamp"] = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        d["kind"] = cols["kind"][i] if has("kind") else "incremental"
        vt = cols["value_type"][i] if has("value_type") else "counter"
        v = cols["value"][i] if has("value") else None
        if vt in ("counter", "gauge"):
            d[vt] = {"value": v}
        elif vt == "set":
            d["set"] = {"values": [cols["set_value"][i]] if has("set_value") else []}
        else:  # histogram / summary / distribution
            rate = cols["sample_rate"][i] if has("sample_rate") else None
            d["distribution"] = {
                "samples": [{"value": v, "rate": int(rate) if rate is not None else 1}],
                "statistic": "summary" if vt == "summary" else "histogram",
            }
        out.append(json.dumps(d, separators=(",", ":")))
    return pa.array(out, type=pa.string())
