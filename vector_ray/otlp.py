"""OTLP (OpenTelemetry protocol) logs decoding — from public specs.

Reference parity target: lib/codecs OTLP support.  The payload is an
``ExportLogsServiceRequest`` / ``LogsData`` protobuf
(opentelemetry-proto, public schema):

    LogsData { repeated ResourceLogs resource_logs = 1 }
    ResourceLogs { Resource resource = 1; repeated ScopeLogs scope_logs = 2 }
    Resource { repeated KeyValue attributes = 1 }
    ScopeLogs { InstrumentationScope scope = 1; repeated LogRecord log_records = 2 }
    LogRecord { fixed64 time_unix_nano = 1; int32 severity_number = 2;
                string severity_text = 3; AnyValue body = 5;
                repeated KeyValue attributes = 6; bytes trace_id = 9;
                bytes span_id = 10 }
    AnyValue  { oneof { string=1 bool=2 int64=3 double=4 ArrayValue=5
                KvlistValue=6 bytes=7 } }
    KeyValue  { string key = 1; AnyValue value = 2 }

Decoded with a from-scratch protobuf WIRE-format reader (varint /
64-bit / length-delimited groups per the public encoding spec) — no
generated classes needed.  One input payload fans out to one output
row per LogRecord (codec-level flat_map).
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator, List, Optional, Tuple

import pyarrow as pa


def _fields(buf: bytes) -> Iterator[Tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) from a protobuf buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wt = key >> 3, key & 0x7
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, v
        elif wt == 1:  # 64-bit
            yield field, wt, buf[pos : pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _any_value(buf: bytes) -> Any:
    for field, _, v in _fields(buf):
        if field == 1:
            return v.decode("utf-8")
        if field == 2:
            return bool(v)
        if field == 3:
            return v - (1 << 64) if v >= (1 << 63) else v
        if field == 4:
            return struct.unpack("<d", v)[0]
        if field == 5:  # ArrayValue { repeated AnyValue values = 1 }
            return [_any_value(x) for f2, _, x in _fields(v) if f2 == 1]
        if field == 6:  # KvlistValue { repeated KeyValue values = 1 }
            return dict(_key_value(x) for f2, _, x in _fields(v) if f2 == 1)
        if field == 7:
            return v.hex()
    return None


def _key_value(buf: bytes) -> Tuple[str, Any]:
    key, val = "", None
    for field, _, v in _fields(buf):
        if field == 1:
            key = v.decode("utf-8")
        elif field == 2:
            val = _any_value(v)
    return key, val


def _log_record(buf: bytes) -> dict:
    out = {"time_unix_nano": None, "severity_number": None, "severity_text": None,
           "body": None, "attributes": {}, "trace_id": None, "span_id": None}
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 1:
            out["time_unix_nano"] = struct.unpack("<Q", v)[0]
        elif field == 2:
            out["severity_number"] = v
        elif field == 3:
            out["severity_text"] = v.decode("utf-8")
        elif field == 5:
            out["body"] = _any_value(v)
        elif field == 6:
            k, val = _key_value(v)
            out["attributes"][k] = val
        elif field == 9:
            out["trace_id"] = v.hex()
        elif field == 10:
            out["span_id"] = v.hex()
    return out


def parse_logs_data(payload: bytes) -> List[dict]:
    """LogsData / ExportLogsServiceRequest bytes → flat log-record dicts
    (resource attributes merged in as ``resource.*`` keys)."""
    records = []
    for f1, _, resource_logs in _fields(payload):
        if f1 != 1:
            continue
        resource_attrs = {}
        scopes = []
        for f2, _, v in _fields(resource_logs):
            if f2 == 1:  # Resource
                for f3, _, kv in _fields(v):
                    if f3 == 1:
                        k, val = _key_value(kv)
                        resource_attrs[k] = val
            elif f2 == 2:
                scopes.append(v)
        for scope_logs in scopes:
            for f3, _, lr in _fields(scope_logs):
                if f3 == 2:
                    rec = _log_record(lr)
                    rec["resource"] = resource_attrs
                    records.append(rec)
    return records


def decode_otlp_logs(col) -> Tuple[pa.Table, pa.Array]:
    """Binary OTLP logs payloads → one row per LogRecord.

    Output columns: input_row, time_unix_nano, severity_number,
    severity_text, body (string), attributes (JSON string), trace_id,
    span_id, resource (JSON string).  error_mask is per INPUT payload.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    rows = {k: [] for k in ("input_row", "time_unix_nano", "severity_number",
                            "severity_text", "body", "attributes", "trace_id",
                            "span_id", "resource")}
    err = []
    for i, payload in enumerate(col.to_pylist()):
        try:
            recs = parse_logs_data(payload)
        except Exception:
            err.append(True)
            continue
        err.append(False)
        for r in recs:
            rows["input_row"].append(i)
            rows["time_unix_nano"].append(r["time_unix_nano"])
            rows["severity_number"].append(r["severity_number"])
            rows["severity_text"].append(r["severity_text"])
            body = r["body"]
            rows["body"].append(
                body if isinstance(body, str) or body is None else json.dumps(body)
            )
            rows["attributes"].append(json.dumps(r["attributes"], sort_keys=True))
            rows["trace_id"].append(r["trace_id"])
            rows["span_id"].append(r["span_id"])
            rows["resource"].append(json.dumps(r["resource"], sort_keys=True))
    tbl = pa.table(
        {
            "input_row": pa.array(rows["input_row"], type=pa.int64()),
            "time_unix_nano": pa.array(rows["time_unix_nano"], type=pa.uint64()),
            "severity_number": pa.array(rows["severity_number"], type=pa.int64()),
            "severity_text": pa.array(rows["severity_text"], type=pa.string()),
            "body": pa.array(rows["body"], type=pa.string()),
            "attributes": pa.array(rows["attributes"], type=pa.string()),
            "trace_id": pa.array(rows["trace_id"], type=pa.string()),
            "span_id": pa.array(rows["span_id"], type=pa.string()),
            "resource": pa.array(rows["resource"], type=pa.string()),
        }
    )
    return tbl, pa.array(err)
