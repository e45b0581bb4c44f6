"""Codec kernels: json/csv/logfmt/syslog decode, ndjson/csv/logfmt encode."""

import datetime as dt
import json
import json as j

import pyarrow as pa

from vector_ray import codecs


def test_decode_json():
    col = pa.array(['{"a": 1, "b": "x"}', "BAD", '{"a": 3}'])
    t, err = codecs.decode_json(col, ["a", "b"], {"a": pa.int64()})
    assert t["a"].to_pylist() == [1, None, 3]
    assert t["b"].to_pylist() == ["x", None, None]
    assert err.to_pylist() == [False, True, False]


def test_decode_csv():
    col = pa.array(['1,"x,y",2.5', "2,z,0.5"])
    t, err = codecs.decode_csv(col, ["id", "name", "v"], {"id": pa.int64()})
    assert t["id"].to_pylist() == [1, 2]
    assert t["name"].to_pylist() == ["x,y", "z"]
    assert err.to_pylist() == [False, False]


def test_decode_logfmt():
    col = pa.array(['level=info msg="hello world" code=7', "level=warn code=9", "garbage"])
    t, err = codecs.decode_logfmt(col, ["level", "msg", "code"])
    assert t["level"].to_pylist() == ["info", "warn", None]
    assert t["msg"].to_pylist()[0] == "hello world"
    assert t["code"].to_pylist() == ["7", "9", None]
    assert err.to_pylist() == [False, False, True]


def test_decode_syslog_5424():
    line = "<34>1 2024-01-01T00:00:05Z host1 app 123 ID7 - hello from syslog"
    t, err = codecs.decode_syslog(pa.array([line, "nope"]))
    assert err.to_pylist() == [False, True]
    assert t["pri"][0].as_py() == 34
    assert t["hostname"][0].as_py() == "host1"
    assert t["msg"][0].as_py() == "hello from syslog"


def test_decode_syslog_3164():
    line = "<13>Jan  1 00:00:00 myhost myapp[42]: something happened"
    t, err = codecs.decode_syslog(pa.array([line]), rfc="3164")
    assert err.to_pylist() == [False]
    assert t["appname"][0].as_py() == "myapp"
    assert t["procid"][0].as_py() == 42


def test_encode_ndjson_roundtrip():
    b = pa.table({"a": pa.array([1, 2]), "s": pa.array(["x", "y"])})
    lines = codecs.encode_ndjson(b).to_pylist()
    assert [json.loads(l) for l in lines] == [{"a": 1, "s": "x"}, {"a": 2, "s": "y"}]


def test_encode_csv():
    b = pa.table({"a": pa.array([1]), "s": pa.array(["x,y"])})
    assert codecs.encode_csv(b).to_pylist() == ['1,"x,y"']
    assert codecs.encode_csv(b, include_header=True).to_pylist()[0] == '"a","s"'


def test_encode_logfmt():
    b = pa.table({"level": pa.array(["info", "warn"]), "msg": pa.array(["ok", "two words"]), "n": pa.array([1, 2])})
    lines = codecs.encode_logfmt(b).to_pylist()
    assert lines[0] == "level=info msg=ok n=1"
    assert lines[1] == 'level=warn msg="two words" n=2'


def test_decode_key_value():
    col = pa.array(["a=1,b=hello", "b=only", "nope"])
    t, err = codecs.decode_key_value(col, ["a", "b"])
    assert t["a"].to_pylist() == ["1", None, None]
    assert t["b"].to_pylist() == ["hello", "only", None]
    assert err.to_pylist() == [False, False, True]


def test_parse_key_value_in_remap_unpacks_metric_tags():
    """metric_to_log tags → columns via the parse_key_value remap step."""
    import ray.data as rd

    from vector_ray.stages import log_to_metric, metric_to_log, remap

    events = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.0, 2.0]),
                "host": pa.array(["h1", "h2"]),
            }
        )
    )
    metrics = log_to_metric(
        events,
        [{"type": "counter", "field": "value", "name": "n",
          "tags": {"type": "{{event_type}}", "host": "{{host}}"}}],
    )
    logs = metric_to_log(metrics)
    out = remap(logs, [("parse_key_value", "tags", ["type", "host"])]).take_all()
    got = sorted((r["type"], r["host"]) for r in out)
    assert got == [("click", "h1"), ("view", "h2")]


def test_decode_gelf():
    from vector_ray.codecs import decode_gelf

    t, e = decode_gelf(
        pa.array([
            '{"version":"1.1","host":"h1","short_message":"boom","level":5,"_app":"web"}',
            'not json',
            '{"version":"1.1","host":"h2","short_message":"ok","timestamp":17.5}',
        ]),
        extra_keys=["app"],
    )
    assert t["message"].to_pylist() == ["boom", None, "ok"]
    assert t["app"].to_pylist() == ["web", None, None]
    ts = t["timestamp"].to_pylist()
    assert ts[0] is not None and ts[1] is None  # omitted → decode time (spec)
    assert ts[2] == dt.datetime(1970, 1, 1, 0, 0, 17, 500000)
    assert e.to_pylist() == [False, True, False]


def test_gelf_reference_parity():
    """Port of lib/codecs/src/decoding/format/gelf.rs tests (gelf.rs:279-483)."""
    from vector_ray.codecs import decode_gelf

    # gelf_deserialize_correctness: every spec field + dotted/dashed adds
    full = j.dumps({
        "version": "1.1", "host": "example.org",
        "short_message": "A short message that helps you identify what is going on",
        "full_message": "Backtrace here\n\nmore stuff",
        "timestamp": 1385053862.3072, "level": 1, "facility": "foo",
        "line": 42, "file": "/tmp/bar",
        "_an.add-field_int": 2001.1002, "_an.add-field_str": "A Space Odyssey",
    })
    t, e = decode_gelf(pa.array([full]),
                       extra_keys=["an.add-field_int", "an.add-field_str"])
    assert e.to_pylist() == [False]
    r = t.to_pylist()[0]
    assert r["version"] == "1.1" and r["host"] == "example.org"
    assert r["full_message"] == "Backtrace here\n\nmore stuff"
    assert r["timestamp"] == dt.datetime(2013, 11, 21, 17, 11, 2, 307200)
    assert r["level"] == 1 and r["facility"] == "foo"
    assert r["line"] == 42.0 and r["file"] == "/tmp/bar"  # line is Float (gelf.rs:168)
    assert r["an.add-field_int"] == 2001.1002
    assert r["an.add-field_str"] == "A Space Odyssey"

    # edge cases: timestamp filled when omitted; _id always dropped
    t, e = decode_gelf(pa.array([
        '{"host":"example.org","short_message":"foobar","version":"1.1"}',
        '{"host":"example.org","short_message":"foobar","version":"1.1","_id":"S3creTz"}',
    ]), extra_keys=["id"])
    assert e.to_pylist() == [False, False]
    assert t["timestamp"].to_pylist()[0] is not None
    assert t["id"].to_pylist() == [None, None]

    # error conditions (strict default, gelf.rs:385-434)
    bad = [
        '{"host":"example.org","short_message":"foobar","version":"1.1","_bad%key":"raboof"}',
        '{"host":"example.org","short_message":"foobar","version":"1.1","bad-key":"raboof"}',
        '{"host":"example.org","version":"1.1"}',
        '{"short_message":"foobar","version":"1.1"}',
        '{"host":42,"short_message":"foobar","version":"1.1"}',
        '{"host":"example.org","version":"1.1","short_message":"foobar","level":"baz"}',
    ]
    _, e = decode_gelf(pa.array(bad))
    assert e.to_pylist() == [True] * len(bad)

    # relaxed mode accepts what strict rejects (gelf.rs:435-483)
    odd = j.dumps({"version": "1.0", "host": "example.org",
                   "short_message": "msg", "timestamp": 1385053862.3072,
                   "level": 1, "incorrect^_extra_field": None})
    _, e = decode_gelf(pa.array([odd]))
    assert e.to_pylist() == [True]
    t, e = decode_gelf(pa.array([odd]), strict=False)
    assert e.to_pylist() == [False]
    assert t["version"].to_pylist() == ["1.0"]


def test_parse_cef():
    from vector_ray.codecs import parse_cef

    t, e = parse_cef(
        pa.array([
            "CEF:0|Security|threatmanager|1.0|100|worm stopped|10|src=10.0.0.1 dst=2.1.2.2 spt=1232",
            "garbage",
        ]),
        extension_keys=["src", "dst", "spt"],
    )
    assert t["device_vendor"].to_pylist() == ["Security", None]
    assert t["name"].to_pylist() == ["worm stopped", None]
    assert t["src"].to_pylist() == ["10.0.0.1", None]
    assert t["spt"].to_pylist() == ["1232", None]
    assert e.to_pylist() == [False, True]


def test_parse_apache_nginx_log():
    from vector_ray.parse import parse_apache_log, parse_nginx_log

    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x.gif HTTP/1.0" 200 2326'
    t, e = parse_apache_log(pa.array([line, "junk"]))
    assert t["host"].to_pylist() == ["127.0.0.1", None]
    assert t["status"].to_pylist() == [200, None]
    assert e.to_pylist() == [False, True]

    n = '1.2.3.4 - u [10/Oct/2000:13:55:36 -0700] "POST /api HTTP/1.1" 404 153 "r" "curl/8"'
    t2, _ = parse_nginx_log(pa.array([n]))
    assert t2["agent"].to_pylist() == ["curl/8"]
    assert t2["size"].to_pylist() == [153]


def test_gzip_hmac_object_fns():
    from vector_ray.functions.scalar import call

    c = pa.array(["payload", None])
    assert call("decode_gzip", call("encode_gzip", c)).to_pylist() == ["payload", None]
    assert call("decode_zlib", call("encode_zlib", c)).to_pylist() == ["payload", None]
    import hashlib
    import hmac as hm

    got = call("hmac", pa.array(["m"]), "k", "sha1").to_pylist()[0]
    assert got == hm.new(b"k", b"m", hashlib.sha1).digest()  # raw bytes (hmac.cue)
    merged = call("merge_objects", pa.array(['{"a":1}']), '{"b":2}').to_pylist()[0]
    assert merged == '{"a": 1, "b": 2}'
    flat = call("flatten_object", pa.array(['{"a":{"b":1}}'])).to_pylist()[0]
    assert flat == {"a.b": 1}


def test_decode_protobuf_roundtrip():
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    from vector_ray.codecs import decode_protobuf

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "test.proto"
    fdp.package = "t"
    m = fdp.message_type.add()
    m.name = "Event"
    f1 = m.field.add()
    f1.name, f1.number, f1.type, f1.label = "name", 1, f1.TYPE_STRING, f1.LABEL_OPTIONAL
    f2 = m.field.add()
    f2.name, f2.number, f2.type, f2.label = "count", 2, f2.TYPE_INT64, f2.LABEL_OPTIONAL
    fds = descriptor_pb2.FileDescriptorSet()
    fds.file.append(fdp)
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("t.Event"))
    payload = cls(name="hello", count=42).SerializeToString()
    t, e = decode_protobuf(
        pa.array([payload, b"\xff\xff\xff"], type=pa.binary()),
        fds.SerializeToString(), "t.Event",
    )
    assert t["name"].to_pylist() == ["hello", None]
    assert str(t["count"].to_pylist()[0]) == "42"
    assert e.to_pylist() == [False, True]


def test_decode_avro_datum():
    from vector_ray.codecs import decode_avro

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "name", "type": "string"},
        {"name": "n", "type": "long"},
    ]}
    datum = bytes([0x04]) + b"hi" + bytes([0x06])  # "hi", zigzag(3)
    t, e = decode_avro(pa.array([datum, b"\x99"], type=pa.binary()), schema)
    assert t["name"].to_pylist() == ["hi", None]
    assert t["n"].to_pylist() == [3, None]
    assert e.to_pylist() == [False, True]

    schema2 = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "long"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
    ]}
    d2 = bytes([0x02, 0x0A, 0x04, 0x02, 0x04, 0x00])
    t2, _ = decode_avro(pa.array([d2], type=pa.binary()), schema2)
    assert t2["x"].to_pylist() == [5]
    import json as j

    assert j.loads(t2["xs"].to_pylist()[0]) == [1, 2]


def test_stdlib_round2_batch():
    from vector_ray.functions.scalar import call

    assert call("to_syslog_level", pa.array([0, 4, 7, 9])).to_pylist() == [
        "emerg", "warning", "debug", None]
    assert call("parse_duration", pa.array(["1h30m", "250ms", "x"])).to_pylist() == [
        5400.0, 0.25, None]
    assert call("parse_int", pa.array(["0x10", "42", "zz"])).to_pylist() == [16, 42, None]
    assert call("snakecase", pa.array(["HelloWorld"])).to_pylist() == ["hello_world"]
    assert call("pascalcase", pa.array(["hello_world"])).to_pylist() == ["HelloWorld"]
    assert call("int_to_ip", pa.array([3232235777])).to_pylist() == ["192.168.1.1"]
    import json as j

    qs = j.loads(call("parse_query_string", pa.array(["a=1&b=2&a=3"])).to_pylist()[0])
    assert qs == {"a": ["1", "3"], "b": "2"}


def test_decode_otlp_logs():
    """Hand-encoded OTLP wire bytes (independent mini-encoder) decode to
    flattened log-record rows."""
    import struct as _s

    from vector_ray.otlp import decode_otlp_logs

    def vi(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def ld(field, payload):
        return vi((field << 3) | 2) + vi(len(payload)) + payload

    def varint_field(field, v):
        return vi(field << 3) + vi(v)

    def f64(field, v):
        return vi((field << 3) | 1) + _s.pack("<Q", v)

    any_str = lambda s: ld(1, s.encode())
    any_int = lambda n: varint_field(3, n)
    kv = lambda k, av: ld(1, k.encode()) + ld(2, av)

    lr1 = (f64(1, 1_700_000_000_000_000_000) + varint_field(2, 9)
           + ld(3, b"INFO") + ld(5, any_str("hello world"))
           + ld(6, kv("http.status", any_int(200)))
           + ld(9, bytes.fromhex("aa" * 16)))
    lr2 = ld(5, any_str("second"))
    scope_logs = ld(2, lr1) + ld(2, lr2)
    resource = ld(1, kv("service.name", any_str("api")))
    resource_logs = ld(1, resource) + ld(2, scope_logs)
    logs_data = ld(1, resource_logs)

    t, e = decode_otlp_logs(pa.array([logs_data, b"\xff\x01garbage"], type=pa.binary()))
    assert e.to_pylist() == [False, True]
    assert t.num_rows == 2
    assert t["body"].to_pylist() == ["hello world", "second"]
    assert t["severity_text"].to_pylist() == ["INFO", None]
    assert t["time_unix_nano"].to_pylist()[0] == 1_700_000_000_000_000_000
    import json as j

    assert j.loads(t["attributes"].to_pylist()[0]) == {"http.status": 200}
    assert j.loads(t["resource"].to_pylist()[0]) == {"service.name": "api"}
    assert t["trace_id"].to_pylist()[0] == "aa" * 16


def test_gelf_avro_encode_roundtrip():
    import json

    from vector_ray.codecs import decode_avro, decode_gelf, encode_avro, encode_gelf

    t = pa.table({"host": ["h1"], "message": ["boom"],
                  "level": pa.array([3], type=pa.int64()), "app": ["web"]})
    dec, err = decode_gelf(encode_gelf(t), extra_keys=["app"])
    assert dec["message"].to_pylist() == ["boom"]
    assert dec["level"].to_pylist() == [3]
    assert dec["app"].to_pylist() == ["web"]
    assert err.to_pylist() == [False]

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "name", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "opt", "type": ["null", "double"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
    ]}
    t2 = pa.table({
        "name": ["alice", "bob"], "n": pa.array([3, -7], type=pa.int64()),
        "opt": pa.array([1.5, None]),
        "xs": pa.array([[1, 2], [9]], type=pa.list_(pa.int64())),
    })
    dec2, err2 = decode_avro(encode_avro(t2, schema), schema)
    assert dec2["name"].to_pylist() == ["alice", "bob"]
    assert dec2["n"].to_pylist() == [3, -7]
    assert dec2["opt"].to_pylist() == [1.5, None]
    assert [json.loads(x) for x in dec2["xs"].to_pylist()] == [[1, 2], [9]]
    assert err2.to_pylist() == [False, False]


def test_parse_syslog_structured_data():
    import json

    from vector_ray.codecs import decode_syslog, parse_syslog_sd

    line = ('<165>1 2003-10-11T22:14:15.003Z mymachine evntslog 1234 ID47 '
            '[exampleSDID@32473 iut="3" eventSource="App"] BOMAn event')
    t, e = decode_syslog(pa.array([line]))
    assert e.to_pylist() == [False]
    d = json.loads(parse_syslog_sd(t["sd"]).to_pylist()[0])
    assert d == {"exampleSDID@32473": {"iut": "3", "eventSource": "App"}}
    multi = parse_syslog_sd(pa.array(['[a@1 x="1"][b@2 y="esc\\"q"]']))
    got = json.loads(multi.to_pylist()[0])
    assert got == {"a@1": {"x": "1"}, "b@2": {"y": 'esc"q'}}


def test_avro_ocf_roundtrip_and_source(ray_session, tmp_path):
    import json

    from vector_ray.codecs import read_avro_ocf, write_avro_ocf
    from vector_ray.topology import build

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "name", "type": "string"},
        {"name": "n", "type": "long"},
    ]}
    t = pa.table({"name": ["a", "b"], "n": pa.array([1, 2], type=pa.int64())})
    p = str(tmp_path / "x.avro")
    write_avro_ocf(p, t, schema, codec="deflate")
    back = read_avro_ocf(p)
    assert back["name"].to_pylist() == ["a", "b"]
    assert back["n"].to_pylist() == [1, 2]

    cfg = {
        "sources": {"src": {"type": "avro", "path": p}},
        "transforms": {},
        "sinks": {"out": {"type": "blackhole", "inputs": ["src"]}},
    }
    sinks = build(cfg)
    assert sorted(sinks["out"].to_pandas()["n"]) == [1, 2]


def test_protobuf_encode_decode_roundtrip():
    """encode_protobuf ∘ decode_protobuf == identity (cross-checked
    against google.protobuf itself, like the OTLP crosscheck)."""
    from google.protobuf import descriptor_pb2

    from vector_ray.codecs import decode_protobuf, encode_protobuf

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "ev.proto"
    fdp.package = "t"
    m = fdp.message_type.add()
    m.name = "Ev"
    f1 = m.field.add()
    f1.name, f1.number, f1.type, f1.label = "msg", 1, 9, 1  # string
    f2 = m.field.add()
    f2.name, f2.number, f2.type, f2.label = "n", 2, 3, 1  # int64
    fds = descriptor_pb2.FileDescriptorSet()
    fds.file.append(fdp)
    blob = fds.SerializeToString()

    batch = pa.table({"msg": ["hello", "world"], "n": [7, 9]})
    enc = encode_protobuf(batch, blob, "t.Ev")
    dec, err = decode_protobuf(enc, blob, "t.Ev")
    assert not any(err.to_pylist())
    assert dec["msg"].to_pylist() == ["hello", "world"]
    assert [int(v) for v in dec["n"].to_pylist()] == [7, 9]


def test_encode_csv_fields_reference_parity():
    """Port of encoding/format/csv.rs tests (csv.rs:334-560)."""
    import pytest

    from vector_ray.codecs import encode_csv_fields

    batch = pa.table({
        "foo": ["bar"], "int": pa.array([123]),
        "comma": ["abc,bcd"], "float": pa.array([3.1415925]),
        "space": ["sp ace"],
        "time": pa.array([dt.datetime(2023, 2, 27, 7, 4, 49, 363000)],
                         type=pa.timestamp("us")),
        "quote": ['the "quote" should be escaped'], "bool": pa.array([True]),
        "other": ["data"],
    })
    out = encode_csv_fields(batch, ["foo", "int", "comma", "float", "missing",
                                    "space", "time", "quote", "bool"])
    assert out.to_pylist() == [
        'bar,123,"abc,bcd",3.1415925,,sp ace,2023-02-27T07:04:49.363Z,'
        '"the ""quote"" should be escaped",true'
    ]

    # serialize_order: duplicates repeat, order respected
    b2 = pa.table({f"field{i}": [f"value{i}"] for i in range(1, 6)})
    out = encode_csv_fields(b2, ["field1", "field5", "field5", "field3", "field2"])
    assert out.to_pylist() == ["value1,value5,value5,value3,value2"]

    # correct_quoting styles
    b3 = pa.table({"f1": ["hello world"], "f2": pa.array([1]),
                   "f3": ['foo"bar'], "f4": ["baz,bas"]})
    flds = ["f1", "f2", "f3", "f4"]
    assert encode_csv_fields(b3, flds).to_pylist() == \
        ['hello world,1,"foo""bar","baz,bas"']
    assert encode_csv_fields(b3, flds, quote_style="never").to_pylist() == \
        ['hello world,1,foo"bar,baz,bas']
    assert encode_csv_fields(b3, flds, quote_style="always").to_pylist() == \
        ['"hello world","1","foo""bar","baz,bas"']
    assert encode_csv_fields(b3, flds, quote_style="non_numeric").to_pylist() == \
        ['"hello world",1,"foo""bar","baz,bas"']

    # custom delimiter / escape char / quote char
    b4 = pa.table({"field1": ["value1"], "field2": ["value2"]})
    assert encode_csv_fields(b4, ["field1", "field2"], delimiter="\t").to_pylist() == \
        ["value1\tvalue2"]
    b5 = pa.table({"field1": ['foo"bar']})
    assert encode_csv_fields(b5, ["field1"], double_quote=False,
                             escape="\\").to_pylist() == ['"foo\\"bar"']
    b6 = pa.table({"field1": ['foo " $ bar']})
    assert encode_csv_fields(b6, ["field1"], quote="$").to_pylist() == \
        ['$foo " $$ bar$']

    # multiple events → one line each; empty fields list errors
    b7 = pa.table({"a": ["x", "y", "z"]})
    assert encode_csv_fields(b7, ["a"]).to_pylist() == ["x", "y", "z"]
    with pytest.raises(ValueError, match="At least one CSV field"):
        encode_csv_fields(b7, [])


def test_encode_cef_serialize_extensions():
    """Port of encoding/format/cef.rs serialize_extensions: sorted
    extensions, typed value rendering, escaping of = and backslash."""
    from vector_ray.codecs import encode_cef

    t = pa.table({
        "name": ["Event name"],
        "severity": [1],
        "foo": ["bar"],
        "comma": ["abc,bcd"],
        "space": ["sp ace"],
        "quote": ['the "quote" should be escaped'],
        "bool": [True],
        "int": [123],
        "float": [3.1415925],
        "time": ["2023-02-27T07:04:49.363Z"],
    })
    out = encode_cef(
        t,
        device_vendor="Datadog",
        device_product="Vector",
        device_version="0",
        device_event_class_id="Telemetry Event",
        extensions={k: k for k in
                    ("foo", "comma", "space", "quote", "bool", "int", "float", "time")},
    ).to_pylist()
    assert out == [
        'CEF:0|Datadog|Vector|0|Telemetry Event|Event name|1|'
        'bool=true comma=abc,bcd float=3.1415925 foo=bar int=123 '
        'quote=the "quote" should be escaped space=sp ace '
        'time=2023-02-27T07:04:49.363Z'
    ]


def test_encode_cef_escaping_and_errors():
    from vector_ray.codecs import encode_cef

    t = pa.table({"name": ["a|b\\c"], "severity": [3], "v": ["x=y\\z"]})
    out = encode_cef(t, device_vendor="V|x", extensions={"k": "v"}).to_pylist()
    assert out[0].startswith("CEF:0|V\\|x|")
    assert "a\\|b\\\\c" in out[0]
    assert "k=x\\=y\\\\z" in out[0]

    # null/empty extension values drop that extension for the row
    t2 = pa.table({"name": ["n", "n"], "severity": [1, 1], "v": ["", "ok"]})
    o = encode_cef(t2, extensions={"k": "v"}).to_pylist()
    assert o[0].endswith("|n|1") and o[1].endswith("|n|1|k=ok")

    # per-event severity error: the bad row nulls, the good row encodes
    o = encode_cef(pa.table({"name": ["n", "m"], "severity": [11, 2]})).to_pylist()
    assert o[0] is None and o[1].endswith("|m|2")


def test_encode_json_metric():
    """Ports of encoding/format/json.rs serialize_json_metric_counter /
    _set / _histogram_without_timestamp (timestamp at the engine's
    microsecond resolution)."""
    import datetime as dt

    from vector_ray.codecs import encode_json_metric

    counter = pa.table({
        "name": ["foos"],
        "namespace": ["vector"],
        "tags": ["Key3=Value3,key1=value1,key2=value2"],
        "kind": ["incremental"],
        "value_type": ["counter"],
        "value": [100.0],
        "sample_rate": pa.array([None], type=pa.int64()),
        "set_value": pa.array([None], type=pa.string()),
        "ts": pa.array([dt.datetime(2018, 11, 14, 8, 9, 10, 11)], type=pa.timestamp("us")),
    })
    assert encode_json_metric(counter).to_pylist() == [
        '{"name":"foos","namespace":"vector",'
        '"tags":{"Key3":"Value3","key1":"value1","key2":"value2"},'
        '"timestamp":"2018-11-14T08:09:10.000011Z",'
        '"kind":"incremental","counter":{"value":100.0}}'
    ]

    mset = pa.table({
        "name": ["users"], "namespace": [""], "tags": [""],
        "kind": ["incremental"], "value_type": ["set"], "value": [1.0],
        "sample_rate": pa.array([None], type=pa.int64()),
        "set_value": ["bob"],
        "ts": pa.array([None], type=pa.timestamp("us")),
    })
    assert encode_json_metric(mset).to_pylist() == [
        '{"name":"users","kind":"incremental","set":{"values":["bob"]}}'
    ]

    histo = pa.table({
        "name": ["glork"], "namespace": [""], "tags": [""],
        "kind": ["incremental"], "value_type": ["histogram"], "value": [10.0],
        "sample_rate": pa.array([1], type=pa.int64()),
        "set_value": pa.array([None], type=pa.string()),
        "ts": pa.array([None], type=pa.timestamp("us")),
    })
    assert encode_json_metric(histo).to_pylist() == [
        '{"name":"glork","kind":"incremental",'
        '"distribution":{"samples":[{"value":10.0,"rate":1}],"statistic":"histogram"}}'
    ]


def test_decode_syslog_either_variant():
    """syslog_loose Variant::Either analog: 5424 first, 3164 fallback,
    only lines matching neither error."""
    from vector_ray.codecs import decode_syslog

    lines = pa.array([
        "<34>1 2003-10-11T22:14:15.003Z mymachine su - ID47 - 'su root' failed",
        "<34>Oct 11 22:14:15 mymachine su: 'su root' failed",
        "total garbage",
    ])
    t, err = decode_syslog(lines)
    assert err.to_pylist() == [False, False, True]
    rows = t.to_pylist()
    assert rows[0]["hostname"] == "mymachine" and rows[0]["appname"] == "su"
    assert rows[1]["hostname"] == "mymachine" and rows[1]["appname"] == "su"
    assert rows[1]["msg"] == "'su root' failed"


def test_decode_json_auto_matrix():
    """Ports of decoding/format/json.rs deserialize_json / _json_array /
    _skip_empty / _error_invalid_json / non-object payloads."""
    from vector_ray.codecs import decode_json_auto

    col = pa.array([
        '{ "foo": 123 }',
        '[{ "foo": 123 }, { "bar": 456 }]',
        "",
        "{ foo",
        '"plain string"',
    ])
    t, err = decode_json_auto(col)
    assert err.to_pylist() == [False, False, False, True, False]
    rows = t.to_pylist()
    assert len(rows) == 4  # 1 + 2 (array expands) + 0 (empty) + 1
    assert rows[0]["foo"] == 123
    assert rows[1]["foo"] == 123 and rows[2]["bar"] == 456
    assert rows[3]["message"] == "plain string"


def test_decode_json_auto_mixed_types():
    """Heterogeneous value types for one key JSON-stringify instead of
    failing the batch."""
    from vector_ray.codecs import decode_json_auto

    t, err = decode_json_auto(pa.array(['{"a": 1}', '{"a": "x"}']))
    assert err.to_pylist() == [False, False]
    assert t["a"].to_pylist() == ["1", '"x"']


def test_encode_json_metric_multivalue_and_bare_tags():
    """Multi-value tags serialize as lists; bare tags as null values
    (json.rs serialize_metric_tags_full)."""
    from vector_ray.codecs import encode_json_metric

    t = pa.table({
        "name": ["counter"], "namespace": [""],
        "tags": ["a=first,a,a=second"],
        "kind": ["incremental"], "value_type": ["counter"], "value": [1.0],
        "sample_rate": pa.array([None], type=pa.int64()),
        "set_value": pa.array([None], type=pa.string()),
        "ts": pa.array([None], type=pa.timestamp("us")),
    })
    assert encode_json_metric(t).to_pylist() == [
        '{"name":"counter","tags":{"a":["first",null,"second"]},'
        '"kind":"incremental","counter":{"value":1.0}}'
    ]


def test_encode_gelf_validation_and_underscore_coercion():
    """Ports of encoding/format/gelf.rs gelf_serializing_coerced /
    _invalid_error: extra fields get the underscore prefix; rows
    missing host or message encode as NULL (per-event error)."""
    from vector_ray.codecs import encode_gelf

    t = pa.table({
        "host": ["example.org", None, "example.org"],
        "message": ["Some message", "m", None],
        "noUnderScore": [0, 1, 2],
    })
    out = encode_gelf(t).to_pylist()
    assert out[1] is None and out[2] is None
    doc = json.loads(out[0])
    assert doc["_noUnderScore"] == 0
    assert doc["short_message"] == "Some message" and doc["version"] == "1.1"
