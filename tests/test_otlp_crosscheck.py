"""Cross-check the from-scratch OTLP wire reader against messages
serialized by google.protobuf dynamic classes (independent encoder)."""

import json
import random

import pyarrow as pa
from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

from vector_ray.otlp import decode_otlp_logs


def _build_otlp_classes():
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "otlp_logs.proto"
    fdp.package = "o"

    def msg(name):
        m = fdp.message_type.add()
        m.name = name
        return m

    def field(m, name, number, ftype, label="LABEL_OPTIONAL", type_name=None):
        f = m.field.add()
        f.name, f.number = name, number
        f.type = getattr(f, ftype)
        f.label = getattr(f, label)
        if type_name:
            f.type_name = type_name
        return f

    any_v = msg("AnyValue")
    field(any_v, "string_value", 1, "TYPE_STRING")
    field(any_v, "bool_value", 2, "TYPE_BOOL")
    field(any_v, "int_value", 3, "TYPE_INT64")
    field(any_v, "double_value", 4, "TYPE_DOUBLE")
    kv = msg("KeyValue")
    field(kv, "key", 1, "TYPE_STRING")
    field(kv, "value", 2, "TYPE_MESSAGE", type_name=".o.AnyValue")
    res = msg("Resource")
    field(res, "attributes", 1, "TYPE_MESSAGE", "LABEL_REPEATED", ".o.KeyValue")
    lr = msg("LogRecord")
    field(lr, "time_unix_nano", 1, "TYPE_FIXED64")
    field(lr, "severity_number", 2, "TYPE_INT32")
    field(lr, "severity_text", 3, "TYPE_STRING")
    field(lr, "body", 5, "TYPE_MESSAGE", type_name=".o.AnyValue")
    field(lr, "attributes", 6, "TYPE_MESSAGE", "LABEL_REPEATED", ".o.KeyValue")
    field(lr, "trace_id", 9, "TYPE_BYTES")
    field(lr, "span_id", 10, "TYPE_BYTES")
    sl = msg("ScopeLogs")
    field(sl, "log_records", 2, "TYPE_MESSAGE", "LABEL_REPEATED", ".o.LogRecord")
    rl = msg("ResourceLogs")
    field(rl, "resource", 1, "TYPE_MESSAGE", type_name=".o.Resource")
    field(rl, "scope_logs", 2, "TYPE_MESSAGE", "LABEL_REPEATED", ".o.ScopeLogs")
    ld = msg("LogsData")
    field(ld, "resource_logs", 1, "TYPE_MESSAGE", "LABEL_REPEATED", ".o.ResourceLogs")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return {
        n: message_factory.GetMessageClass(pool.FindMessageTypeByName(f"o.{n}"))
        for n in ("AnyValue", "KeyValue", "Resource", "LogRecord", "ScopeLogs",
                  "ResourceLogs", "LogsData")
    }


def test_otlp_reader_matches_protobuf_encoder():
    cls = _build_otlp_classes()
    rng = random.Random(7)
    expected = []
    data = cls["LogsData"]()
    rlogs = data.resource_logs.add()
    rlogs.resource.attributes.add(key="service.name",
                                  value=cls["AnyValue"](string_value="svc"))
    slogs = rlogs.scope_logs.add()
    for i in range(25):
        rec = slogs.log_records.add()
        rec.time_unix_nano = rng.randrange(2**63)
        rec.severity_number = rng.randrange(1, 25)
        rec.severity_text = rng.choice(["TRACE", "INFO", "ERROR"])
        kind = rng.choice(["s", "i", "d", "b"])
        if kind == "s":
            rec.body.string_value = f"msg {i}"
            body = f"msg {i}"
        elif kind == "i":
            rec.body.int_value = rng.randrange(-10**9, 10**9)
            body = json.dumps(rec.body.int_value)
        elif kind == "d":
            rec.body.double_value = rng.random()
            body = json.dumps(rec.body.double_value)
        else:
            rec.body.bool_value = True
            body = "true"  # non-string bodies render as JSON
        rec.attributes.add(key="i", value=cls["AnyValue"](int_value=i))
        rec.trace_id = bytes([i]) * 16
        expected.append(
            (rec.time_unix_nano, rec.severity_number, rec.severity_text, body,
             bytes([i]).hex() * 16)
        )
    payload = data.SerializeToString()
    t, err = decode_otlp_logs(pa.array([payload], type=pa.binary()))
    assert err.to_pylist() == [False]
    assert t.num_rows == 25
    for row_i, (ts, sev, sevt, body, trace) in enumerate(expected):
        assert t["time_unix_nano"][row_i].as_py() == ts
        assert t["severity_number"][row_i].as_py() == sev
        assert t["severity_text"][row_i].as_py() == sevt
        assert str(t["body"][row_i].as_py()) == body
        assert json.loads(t["attributes"][row_i].as_py()) == {"i": row_i}
        assert t["trace_id"][row_i].as_py() == trace
        assert json.loads(t["resource"][row_i].as_py()) == {"service.name": "svc"}
