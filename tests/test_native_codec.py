"""Cross-check the from-scratch native (protobuf) codec against
google.protobuf dynamic classes built from the public event.proto
layout (lib/vector-core/proto/event.proto) — an independent
encoder/decoder pair, same approach as test_otlp_crosscheck."""

import pyarrow as pa
from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

from vector_ray.codecs import decode_native, encode_native


def _build_native_classes():
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "vector_event.proto"
    fdp.package = "v"

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

    ts = msg("Timestamp")
    field(ts, "seconds", 1, "TYPE_INT64")
    field(ts, "nanos", 2, "TYPE_INT32")

    val = msg("Value")
    field(val, "raw_bytes", 1, "TYPE_BYTES")
    field(val, "timestamp", 2, "TYPE_MESSAGE", type_name=".v.Timestamp")
    field(val, "integer", 4, "TYPE_INT64")
    field(val, "float", 5, "TYPE_DOUBLE")
    field(val, "boolean", 6, "TYPE_BOOL")
    field(val, "map", 7, "TYPE_MESSAGE", type_name=".v.ValueMap")
    field(val, "array", 8, "TYPE_MESSAGE", type_name=".v.ValueArray")
    field(val, "null", 9, "TYPE_INT32")  # enum ValueNull on the wire

    fe = msg("FieldsEntry")  # wire-identical to map<string, Value>
    field(fe, "key", 1, "TYPE_STRING")
    field(fe, "value", 2, "TYPE_MESSAGE", type_name=".v.Value")

    vm = msg("ValueMap")
    field(vm, "fields", 1, "TYPE_MESSAGE", "LABEL_REPEATED", ".v.FieldsEntry")
    va = msg("ValueArray")
    field(va, "items", 1, "TYPE_MESSAGE", "LABEL_REPEATED", ".v.Value")

    log = msg("Log")
    field(log, "fields", 1, "TYPE_MESSAGE", "LABEL_REPEATED", ".v.FieldsEntry")

    te = msg("TagsEntry")  # map<string, string>
    field(te, "key", 1, "TYPE_STRING")
    field(te, "value", 2, "TYPE_STRING")

    counter = msg("Counter")
    field(counter, "value", 1, "TYPE_DOUBLE")
    gauge = msg("Gauge")
    field(gauge, "value", 1, "TYPE_DOUBLE")

    metric = msg("Metric")
    field(metric, "name", 1, "TYPE_STRING")
    field(metric, "tags_v1", 3, "TYPE_MESSAGE", "LABEL_REPEATED", ".v.TagsEntry")
    field(metric, "kind", 4, "TYPE_INT32")
    field(metric, "counter", 5, "TYPE_MESSAGE", type_name=".v.Counter")
    field(metric, "gauge", 6, "TYPE_MESSAGE", type_name=".v.Gauge")
    field(metric, "namespace", 11, "TYPE_STRING")

    ew = msg("EventWrapper")
    field(ew, "log", 1, "TYPE_MESSAGE", type_name=".v.Log")
    field(ew, "metric", 2, "TYPE_MESSAGE", type_name=".v.Metric")
    field(ew, "trace", 3, "TYPE_MESSAGE", type_name=".v.Log")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return {
        n: message_factory.GetMessageClass(pool.FindMessageTypeByName(f"v.{n}"))
        for n in ("EventWrapper", "Value", "Timestamp")
    }


def test_decode_log_event():
    cls = _build_native_classes()
    ew = cls["EventWrapper"]()
    f = ew.log.fields.add()
    f.key = "message"
    f.value.raw_bytes = b"hello world"
    f = ew.log.fields.add()
    f.key = "status"
    f.value.integer = 500
    f = ew.log.fields.add()
    f.key = "latency"
    f.value.float = 0.25
    f = ew.log.fields.add()
    f.key = "ok"
    f.value.boolean = True
    f = ew.log.fields.add()
    f.key = "missing"
    f.value.null = 0

    out = decode_native(pa.array([ew.SerializeToString()], type=pa.binary()))
    assert out["event_type"].to_pylist() == ["log"]
    fields = dict(out["fields"].to_pylist()[0])
    assert fields["message"] == "hello world"
    assert fields["status"] == "500"
    assert fields["latency"] == "0.25"
    assert fields["ok"] == "true"
    assert fields["missing"] is None


def test_decode_nested_map_and_array():
    cls = _build_native_classes()
    ew = cls["EventWrapper"]()
    f = ew.log.fields.add()
    f.key = "ctx"
    inner = f.value.map.fields.add()
    inner.key = "a"
    inner.value.integer = 1
    f = ew.log.fields.add()
    f.key = "arr"
    f.value.array.items.add().raw_bytes = b"x"
    f.value.array.items.add().integer = 2

    out = decode_native(pa.array([ew.SerializeToString()], type=pa.binary()))
    import json

    fields = dict(out["fields"].to_pylist()[0])
    assert json.loads(fields["ctx"]) == {"a": 1}
    assert json.loads(fields["arr"]) == ["x", 2]


def test_decode_metric_event():
    cls = _build_native_classes()
    ew = cls["EventWrapper"]()
    m = ew.metric
    m.name = "requests"
    m.kind = 1  # absolute
    m.gauge.value = 42.5
    t = m.tags_v1.add()
    t.key = "host"
    t.value = "web-1"

    out = decode_native(pa.array([ew.SerializeToString()], type=pa.binary()))
    assert out["event_type"].to_pylist() == ["metric"]
    assert out["name"].to_pylist() == ["requests"]
    assert out["kind"].to_pylist() == ["absolute"]
    assert out["value"].to_pylist() == [42.5]
    assert out["tags"].to_pylist() == ["host=web-1"]


def test_encode_roundtrip_and_foreign_parse():
    rows = pa.table({
        "event_type": ["log", "metric", "trace"],
        "fields": pa.array(
            [[("msg", "a"), ("lvl", "info")], None, [("span", "s1")]],
            type=pa.map_(pa.string(), pa.string()),
        ),
        "name": [None, "cpu", None],
        "kind": [None, "incremental", None],
        "value": [None, 3.5, None],
        "tags": [None, "core=0,node=n1", None],
    })
    encoded = encode_native(rows)

    # our decoder round-trips
    back = decode_native(encoded)
    assert back["event_type"].to_pylist() == ["log", "metric", "trace"]
    assert dict(back["fields"].to_pylist()[0]) == {"msg": "a", "lvl": "info"}
    assert back["name"].to_pylist()[1] == "cpu"
    assert back["kind"].to_pylist()[1] == "incremental"
    assert back["value"].to_pylist()[1] == 3.5
    assert back["tags"].to_pylist()[1] == "core=0,node=n1"
    assert dict(back["fields"].to_pylist()[2]) == {"span": "s1"}

    # google.protobuf parses our bytes (independent decoder)
    cls = _build_native_classes()
    ew = cls["EventWrapper"]()
    ew.ParseFromString(encoded.to_pylist()[0])
    got = {f.key: f.value.raw_bytes for f in ew.log.fields}
    assert got == {"msg": b"a", "lvl": b"info"}
    ew.ParseFromString(encoded.to_pylist()[1])
    assert ew.metric.name == "cpu"
    assert ew.metric.kind == 0
    assert ew.metric.counter.value == 3.5
    assert {t.key: t.value for t in ew.metric.tags_v1} == {
        "core": "0", "node": "n1"
    }


def test_topology_decode_transform(ray_session):
    """decoding.codec analog: a decode step in a topology config."""
    import json

    from vector_ray.topology import build

    rows = [
        {"message": json.dumps({"log": {"msg": "a", "lvl": "info"}})},
        {"message": json.dumps(
            {"metric": {"name": "cpu", "kind": "absolute",
                        "gauge": {"value": 1.5}, "tags": {"h": "n1"}}})},
    ]
    cfg = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "dec": {"type": "decode", "inputs": ["in"],
                    "codec": "native_json", "field": "message"},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["dec"]}},
    }
    out = build(cfg)["out"].to_pandas().sort_values("event_type")
    assert list(out["event_type"]) == ["log", "metric"]
    assert out.iloc[1]["name"] == "cpu" and out.iloc[1]["value"] == 1.5
