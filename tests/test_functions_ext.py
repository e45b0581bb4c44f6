"""Round-3 stdlib batch tests (functions/scalar_ext.py) — spec behavior
from website/cue/reference/remap/functions/<name>.cue examples."""

import numpy as np
import pyarrow as pa
import pytest

from vector_ray.functions.scalar import FUNCTIONS, call


def s(*vals):
    return pa.array(list(vals))


def test_casts():
    assert call("int", s("42")).to_pylist() == [42]
    assert call("float", s("1.5")).to_pylist() == [1.5]
    assert call("bool", s("true", "false")).to_pylist() == [True, False]
    assert call("string", pa.array([7])).to_pylist() == ["7"]
    assert call("strlen", s("héllo")).to_pylist() == [5]
    assert call("length", pa.array([[1, 2, 3]])).to_pylist() == [3]
    assert call("exists", pa.array(["a", None])).to_pylist() == [True, False]


def test_assertions():
    call("assert", pa.array([True, True]))
    with pytest.raises(AssertionError):
        call("assert", pa.array([True, False]))
    call("assert_eq", s("a"), pa.array(["a"]))


def test_path_functions():
    assert call("basename", s("/usr/local/bin/tool")).to_pylist() == ["tool"]
    assert call("dirname", s("/usr/local/bin/tool")).to_pylist() == ["/usr/local/bin"]
    # split_path.cue: absolute paths keep the leading "/" component
    assert call("split_path", s("/a/b/c")).to_pylist() == [["/", "a", "b", "c"]]
    assert call("split_path", s("/")).to_pylist() == [["/"]]
    assert call("split_path", s("")).to_pylist() == [[]]
    assert call("split_path", s("a/b")).to_pylist() == [["a", "b"]]


def test_string_helpers():
    assert call("screamingsnakecase", s("inputString")).to_pylist() == ["INPUT_STRING"]
    assert call("contains_all", s("the quick fox"), ["quick", "fox"]).to_pylist() == [True]
    assert call("contains_all", s("the quick fox"), ["quick", "dog"]).to_pylist() == [False]
    assert call("chunks", s("abcdef"), 4).to_pylist() == [["abcd", "ef"]]
    got = call("sieve", s("test123%456.fun"), r"[a-z0-9.]+", "").to_pylist()
    assert got == ["test123456.fun"]
    ent = call("shannon_entropy", s("aaaa")).to_pylist()[0]
    assert ent == 0.0
    ent2 = call("shannon_entropy", s("abcd")).to_pylist()[0]
    assert abs(ent2 - 2.0) < 1e-9


def test_punycode_roundtrip():
    enc = call("encode_punycode", s("www.CAFé.com")).to_pylist()
    assert enc == ["www.xn--caf-dma.com"]
    dec = call("decode_punycode", s("www.xn--caf-dma.com")).to_pylist()
    assert dec == ["www.café.com"]


def test_math_and_hash():
    assert abs(call("log", pa.array([math_e := 2.718281828459045])).to_pylist()[0] - 1.0) < 1e-9
    assert call("log", pa.array([100.0]), 10).to_pylist() == [2.0]
    # haversine.cue example: (0,0)->(10,10) = {distance 1568.5227233, bearing 44.561}
    d = call("haversine", pa.array([0.0]), pa.array([0.0]), 10.0, 10.0).to_pylist()[0]
    assert abs(d["distance"] - 1568.5227233) < 1e-4 and abs(d["bearing"] - 44.561) < 1e-2
    dm = call("haversine", pa.array([0.0]), pa.array([0.0]), 10.0, 10.0,
              "miles").to_pylist()[0]
    assert abs(dm["distance"] - 974.6348468) < 1e-4
    crc = call("crc", s("hello")).to_pylist()
    import binascii

    assert crc == [str(binascii.crc32(b"hello"))]
    h = call("sha2", s("abc"), "SHA-256").to_pylist()[0]
    import hashlib

    assert h == hashlib.sha256(b"abc").hexdigest()
    assert call("seahash", s("x")).to_pylist() == call("seahash", s("x")).to_pylist()


def test_community_id_known_vector():
    """Corelight spec v1 example: tcp 66.35.250.204:80 -> 128.232.110.120:34855."""
    got = call(
        "community_id",
        pa.array(["66.35.250.204"]), pa.array(["128.232.110.120"]),
        pa.array([6]), pa.array([80]), pa.array([34855]),
    ).to_pylist()
    # symmetric: reversed direction gives the same id
    rev = call(
        "community_id",
        pa.array(["128.232.110.120"]), pa.array(["66.35.250.204"]),
        pa.array([6]), pa.array([34855]), pa.array([80]),
    ).to_pylist()
    assert got == rev == ["1:LQU9qZlK+B5F3KDmev6m5PMibrg="]


def test_ip_family():
    assert call("ip_to_ipv6", s("192.168.0.1")).to_pylist() == ["::ffff:192.168.0.1"]
    assert call("ipv6_to_ipv4", s("::ffff:192.168.0.1")).to_pylist() == ["192.168.0.1"]
    assert call("ip_subnet", s("192.168.10.32"), "/16").to_pylist() == ["192.168.0.0"]
    assert call("ip_ntop", call("ip_pton", s("10.1.2.3"))).to_pylist() == ["10.1.2.3"]
    with pytest.raises(Exception):
        call("ipv6_to_ipv4", s("2404:6800:4003:c02::64")).to_pylist()


def test_syslog_codes():
    assert call("to_syslog_facility_code", s("kern", "local7")).to_pylist() == [0, 23]
    assert call("to_syslog_severity", s("alert", "info")).to_pylist() == [1, 6]


def test_block_compression_roundtrip():
    data = s("the quick brown fox " * 20)
    for name in ("zstd", "lz4", "snappy"):
        enc = call(f"encode_{name}", data)
        dec = call(f"decode_{name}", enc)
        assert dec.to_pylist()[0].decode() == data.to_pylist()[0]
        assert len(enc.to_pylist()[0]) < len(data.to_pylist()[0])


def test_charset():
    enc = call("encode_charset", s("héllo"), "latin-1").to_pylist()[0]
    assert enc == "héllo".encode("latin-1")
    assert call("decode_charset", pa.array([enc]), "latin-1").to_pylist() == ["héllo"]


def test_array_functions():
    l = pa.array([[1, 2, 2, None, 3]])
    assert call("compact", l).to_pylist() == [[1, 2, 2, 3]]
    assert call("unique", pa.array([["a", "b", "a"]])).to_pylist() == [["a", "b"]]
    assert call("push", pa.array([["a"]]), "b").to_pylist() == [["a", "b"]]
    assert call("pop", pa.array([["a", "b"]])).to_pylist() == [["a"]]
    assert call("append", pa.array([["a"]]), ["b", "c"]).to_pylist() == [["a", "b", "c"]]
    assert call("flatten", pa.array([[[1, 2], [3]]])).to_pylist() == [[1, 2, 3]]
    assert call("zip", pa.array([["a", "b"]]), pa.array([["1", "2"]])).to_pylist() == [
        [["a", "1"], ["b", "2"]]]
    assert call("match_array", pa.array([["foo", "bar"]]), "^b").to_pylist() == [True]
    assert call("match_array", pa.array([["foo", "bar"]]), "^z").to_pylist() == [False]


def test_for_each_and_filter():
    l = pa.array([["ab", "cde"], ["f"]])
    up = call("for_each", l, "upcase").to_pylist()
    assert up == [["AB", "CDE"], ["F"]]
    # filter needs a predicate fn — use starts_with via a registered helper
    FUNCTIONS["_starts_x"] = lambda c: __import__("pyarrow").compute.starts_with(c, pattern="x")
    kept = call("filter", pa.array([["x1", "y2", "x3"], ["y4"]]), "_starts_x").to_pylist()
    assert kept == [["x1", "x3"], []]


def test_object_functions():
    m = pa.array([[("a", "1"), ("b", None)]], type=pa.map_(pa.string(), pa.string()))
    assert call("keys", m).to_pylist() == [["a", "b"]]
    assert call("values", m).to_pylist() == [["1", None]]
    got = call("set", m, "c", "3").to_pylist()
    assert dict(got[0])["c"] == "3"
    got = call("del", m, "a").to_pylist()
    assert "a" not in dict(got[0])
    mk = call("map_keys", m, "upcase").to_pylist()
    assert dict(mk[0]) == {"A": "1", "B": None}
    obj = call("object_from_array", pa.array([[["k", "v"]]])).to_pylist()
    assert dict(obj[0]) == {"k": "v"}
    comp = call("compact", m).to_pylist()
    assert dict(comp[0]) == {"a": "1"}


def test_parsers():
    j = call("parse_json", s('{"a": 1, "b": "x"}')).to_pylist()
    assert dict(j[0]) == {"a": "1", "b": "x"}
    csvr = call("parse_csv", s('a,"b,c",d')).to_pylist()
    assert csvr == [["a", "b,c", "d"]]
    kv = call("parse_key_value", s('k1=v1 k2="v 2"'), "=", " ").to_pylist()
    assert dict(kv[0])["k1"] == "v1"
    lf = call("parse_logfmt", s("level=info msg=hello")).to_pylist()
    assert dict(lf[0]) == {"level": "info", "msg": "hello"}
    rb = call("parse_ruby_hash", s('{"a" => 1, "b" => nil}')).to_pylist()
    assert rb[0] == {"a": 1, "b": None}
    x = call("parse_xml", s('<row id="7"><name>zed</name><age>30</age></row>')).to_pylist()
    # parse_xml.cue conventions: @-prefixed attrs, numbers coerced,
    # text-only children collapse to their value
    assert x[0] == {"row": {"@id": 7, "name": "zed", "age": 30}}
    g = call("parse_grok", s("2020 alpha"), "%{NUMBER:year} %{WORD:w}").to_pylist()
    assert dict(g[0]) == {"year": "2020", "w": "alpha"}
    toks = call("parse_tokens",
                s('127.0.0.1 - [10/Oct/2000:13:55:36] "GET /x" 200')).to_pylist()
    assert toks == [["127.0.0.1", "-", "10/Oct/2000:13:55:36", "GET /x", "200"]]
    # base defaults to 2 (parse_bytes.cue): ambiguous kb is binary
    b = call("parse_bytes", s("1 MiB", "2kb"), "byte").to_pylist()
    assert b == [1048576.0, 2048.0]
    b10 = call("parse_bytes", s("4TB"), "MB", "10").to_pylist()
    assert b10 == [4000000.0]
    etld = call("parse_etld", s("sub.example.co.uk")).to_pylist()
    assert etld[0]["etld"] == "co.uk" and etld[0]["known_suffix"] is True
    assert call("parse_etld", s("sub.example.co.uk"), 1).to_pylist()[0][
        "etld_plus"] == "example.co.uk"


def test_parse_influxdb():
    got = call(
        "parse_influxdb",
        s('cpu,host=a,region=us usage=0.5,idle=99i 1556813561098000000'),
    ).to_pylist()
    metrics = got[0]
    assert [m["name"] for m in metrics] == ["cpu_usage", "cpu_idle"]
    assert metrics[0]["tags"] == {"host": "a", "region": "us"}
    assert metrics[0]["gauge"]["value"] == 0.5
    assert metrics[1]["gauge"]["value"] == 99.0
    assert metrics[0]["kind"] == "absolute"
    assert metrics[0]["timestamp"].year == 2019


def test_decode_influxdb_table():
    from vector_ray.codecs import decode_influxdb

    t = decode_influxdb(s(
        "cpu,host=a usage=0.5,idle=99i,state=\"up\" 1556813561098000000",
        "mem value=1.0",
    ))
    df = t.to_pandas()
    assert sorted(df["name"]) == ["cpu_idle", "cpu_usage", "mem_value"]  # string field skipped
    assert (df["kind"] == "absolute").all()
    cpu = df[df["name"] == "cpu_usage"].iloc[0]
    assert cpu["tags"] == "host=a"
    assert cpu["value"] == 0.5
    assert str(cpu["ts"]).startswith("2019-05-02")


def test_decode_influxdb_invalid_line_errors():
    """decoding/format/influxdb.rs deserialize_error parity."""
    import pytest

    from vector_ray.codecs import decode_influxdb

    with pytest.raises(ValueError, match="invalid influxdb line"):
        decode_influxdb(s("some invalid string"))


def test_decode_native_json():
    from vector_ray.codecs import decode_native_json

    t = decode_native_json(s(
        '{"log": {"message": "hello", "n": 5}}',
        '{"metric": {"name": "req", "kind": "incremental", "counter": {"value": 2.5}, "tags": {"svc": "a"}}}',
    ))
    df = t.to_pandas()
    assert df["event_type"].tolist() == ["log", "metric"]
    assert dict(df["fields"][0]) == {"message": "hello", "n": "5"}
    m = df.iloc[1]
    assert (m["name"], m["kind"], m["value"], m["tags"]) == ("req", "incremental", 2.5, "svc=a")


def test_crypto_roundtrip():
    key = "k" * 32
    iv = "i" * 16
    enc = call("encrypt", s("secret message"), "AES-256-CFB", key, iv)
    dec = call("decrypt", enc, "AES-256-CFB", key, iv).to_pylist()
    assert dec[0] == "secret message"  # utf-8 plaintext renders as string
    enc2 = call("encrypt", s("padded!"), "AES-128-CBC-PKCS7", "k" * 16, iv)
    dec2 = call("decrypt", enc2, "AES-128-CBC-PKCS7", "k" * 16, iv).to_pylist()
    assert dec2[0] == "padded!"


def test_encrypt_ip_roundtrip():
    key = "0123456789abcdef"
    enc = call("encrypt_ip", s("192.168.1.1", "10.0.0.7"), key).to_pylist()
    assert all(":" in e for e in enc)  # encrypted form is an ipv6 address
    dec = call("decrypt_ip", pa.array(enc), key).to_pylist()
    assert dec == ["192.168.1.1", "10.0.0.7"]


def test_secrets_store():
    # registry convention: first arg IS the key column (the VRL program
    # path routes these to per-event __meta_secrets.* columns instead)
    call("set_secret", s("dd_api_key"), "abc123")
    assert call("get_secret", s("dd_api_key", "dd_api_key")).to_pylist() == [
        "abc123", "abc123"]
    call("remove_secret", s("dd_api_key"))
    assert call("get_secret", s("dd_api_key")).to_pylist() == [None]


def test_uuid_and_random_deterministic():
    u1 = call("uuid_v4", s("a", "b"), 7).to_pylist()
    u2 = call("uuid_v4", s("a", "b"), 7).to_pylist()
    assert u1 == u2 and u1[0] != u1[1]
    assert all(v[14] == "4" for v in u1)
    ts = pa.array([1700000000000000], type=pa.timestamp("us"))
    u7 = call("uuid_v7", ts).to_pylist()
    assert u7[0][14] == "7"
    r = call("random_int", s("a", "b", "c"), 0, 10, 42).to_pylist()
    assert r == call("random_int", s("a", "b", "c"), 0, 10, 42).to_pylist()
    assert all(0 <= v < 10 for v in r)


def test_encode_object_formats():
    m = pa.array([[("lvl", "info"), ("msg", "hi there")]],
                 type=pa.map_(pa.string(), pa.string()))
    assert call("encode_logfmt", m).to_pylist() == ['lvl=info msg="hi there"']
    # documented arg order: (value, fields_ordering, kv_delim, field_delim)
    assert call("encode_key_value", m, None, ":", ",").to_pylist() == [
        "lvl:info,msg:\"hi there\""]
    assert call("encode_key_value", m, ["msg", "lvl"]).to_pylist() == [
        'msg="hi there" lvl=info']


def test_replace_with_and_validate():
    got = call("replace_with", s("hello world"), r"\w+", "upcase").to_pylist()
    assert got == ["HELLO WORLD"]
    schema = '{"type": "object", "required": ["a"]}'
    ok = call("validate_json_schema", s('{"a": 1}', '{"b": 1}'), schema).to_pylist()
    assert ok == [True, False]


def test_enrichment_bridge():
    from vector_ray.enrich import EnrichTable

    lut = EnrichTable(pa.table({"k": ["a", "b"], "v": ["1", "2"]}), ["k"])
    got = call("get_enrichment_table_record", s("b", "a"), lut).to_pylist()
    assert [dict(d) for d in got] == [{"v": "2"}, {"v": "1"}]


def test_decode_influxdb_malformed_field_value_contextual():
    """A bad numeric field value produces the contextual decode error,
    not a bare ValueError (ADVICE r4)."""
    import pytest

    from vector_ray.codecs import decode_influxdb

    with pytest.raises(ValueError, match="invalid influxdb line"):
        decode_influxdb(s("m v=abc"))


def test_parse_xml_numeric_guard():
    # python int() underscores must not corrupt id-like strings
    v = call("parse_xml", s("<r><a>1_0</a><b>7</b></r>")).to_pylist()[0]
    assert v == {"r": {"a": "1_0", "b": 7}}


def test_shannon_entropy_validates_segmentation():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="segmentation"):
        call("shannon_entropy", s("x"), "bytes")


def test_to_string_tz_aware_renders_utc():
    import datetime as dt

    import pyarrow as pa

    arr = pa.array(
        [dt.datetime(2020, 1, 1, 12)], type=pa.timestamp("us", "UTC")
    ).cast(pa.timestamp("us", "America/New_York"))
    assert call("to_string", arr).to_pylist() == ["2020-01-01T12:00:00Z"]


def test_parse_encode_proto_roundtrip_vrl_shape():
    """VRL-surface proto functions: desc FILE PATH + whole-object
    encode / nested-object decode (parse_proto.cue, encode_proto.cue),
    using the reference's own descriptor set."""
    import base64

    import pyarrow as pa

    from vector_ray.functions import scalar

    desc = "/root/reference/lib/vector-vrl/tests/resources/protobuf_descriptor_set.desc"
    wire = base64.b64decode("Cgdzb21lb25lIggKBjEyMzQ1Ng==")
    out = scalar.call(
        "parse_proto", pa.array([wire]), desc, "test_protobuf.Person"
    )
    assert out[0].as_py() == {"name": "someone", "phones": [{"number": "123456"}]}
    obj = pa.array([{"name": "someone", "phones": [{"number": "123456"}]}])
    enc = scalar.call("encode_proto", obj, desc, "test_protobuf.Person")
    assert enc[0].as_py() == wire
    with pytest.raises(Exception):
        scalar.call("parse_proto", pa.array([b"\xff\xff garbage"]), desc,
                    "test_protobuf.Person")


def test_validate_json_schema_doc_matrix():
    """The four-doc-example matrix: formats enforced iff
    ignore_unknown_formats is false (validate_json_schema.cue)."""
    import pyarrow as pa

    from vector_ray.functions import scalar

    p = "/root/reference/lib/vector-vrl/tests/resources/json-schema_definition.json"
    def run(payload, flag):
        return scalar.call(
            "validate_json_schema", pa.array([payload]), p, flag
        )[0].as_py()

    assert run('{ "productUser": "valid@email.com" }', False) is True
    assert run('{ "productUser": "invalidEmail" }', False) is False
    assert run('{ "productUser": "a-custom-formatted-string" }', False) is False
    assert run('{ "productUser": "a-custom-formatted-string" }', True) is True


def test_proto_native_types_roundtrip(tmp_path):
    """Review r5: int64 must stay int (not decimal string), bytes must
    stay bytes (not base64), repeated fields stay lists — MessageToDict
    proto3-JSON coercions are bypassed."""
    import pyarrow as pa
    from google.protobuf import descriptor_pb2

    from vector_ray.functions import scalar

    fds = descriptor_pb2.FileDescriptorSet()
    f = fds.file.add(); f.name = "t.proto"; f.package = "t"; f.syntax = "proto3"
    m = f.message_type.add(); m.name = "Ev"
    for i, (name, typ, lab) in enumerate(
        [("a", 3, 1), ("b", 12, 1), ("s", 9, 1), ("r", 5, 3)], 1
    ):  # int64, bytes, string, repeated int32
        fld = m.field.add()
        fld.name = name; fld.number = i; fld.type = typ; fld.label = lab
    p = str(tmp_path / "t.desc")
    open(p, "wb").write(fds.SerializeToString())
    obj = {"a": 2**60 + 3, "b": b"\x01\x02", "s": "x", "r": [1, 2, 3]}
    enc = scalar.call("encode_proto", pa.array([obj]), p, "t.Ev")
    dec = scalar.call("parse_proto", enc, p, "t.Ev")
    assert dec[0].as_py() == obj


def test_flatten_heterogeneous_elements():
    """Review r5: flatten over still-mixed elements must not crash on
    pa.array inference."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    d, _ = compile_program('flatten(["a", [1, true]])').eval_value(
        pa.table({"x": [1]})
    )
    assert d.to_pylist() == [["a", 1, True]]


def test_json_schema_spec_format_without_checker_dep():
    """Review r5: a spec-vocabulary format (date-time) whose optional
    validator dep may be missing must not raise 'unknown format'."""
    import pyarrow as pa

    from vector_ray.functions import scalar

    schema = '{"type": "object", "properties": {"t": {"type": "string", "format": "date-time"}}}'
    out = scalar.call(
        "validate_json_schema", pa.array(['{"t": "whatever"}']), schema, False
    )
    assert out[0].as_py() in (True, False)  # validates, no raise


def test_parse_groks_alias_sources(tmp_path):
    """parse_groks.cue 'Parse using aliases from file' (skip_test in
    the reference because the path is fictional — realized here)."""
    import json as _json

    import pyarrow as pa

    from vector_ray.vrl import compile_program

    p = tmp_path / "aliases.json"
    p.write_text(_json.dumps({
        "PATTERN_A": "%{PATTERN_B}",
        "PATTERN_B": "username=%{USERNAME:username}",
    }))
    src = (
        f'parse_groks!("username=foo", patterns: [ "%{{PATTERN_A}}" ], '
        f'alias_sources: [ "{p}" ])'
    )
    d, e = compile_program(src).eval_value(pa.table({"x": [1]}))
    assert not e[0].as_py()
    assert dict(d[0].as_py()) == {"username": "foo"}


def test_proto_edge_cases(tmp_path):
    """Second-pass review: open-enum ints, map<k,Enum> names, repeated
    bytes from str, WKT Timestamp proto3-JSON form, empty-submessage
    presence, dependency-order-agnostic descriptor sets."""
    import pyarrow as pa
    from google.protobuf import descriptor_pb2, timestamp_pb2

    from vector_ray.functions import scalar

    fds = descriptor_pb2.FileDescriptorSet()
    f = fds.file.add()
    f.name = "t2.proto"; f.package = "t2"; f.syntax = "proto3"
    f.dependency.append("google/protobuf/timestamp.proto")
    en = f.enum_type.add(); en.name = "E"
    for i, n in enumerate(["E0", "E1", "E2"]):
        v = en.value.add(); v.name = n; v.number = i
    sub = f.message_type.add(); sub.name = "Sub"
    fl = sub.field.add(); fl.name = "x"; fl.number = 1; fl.type = 5
    m = f.message_type.add(); m.name = "Ev"
    for i, (name, typ, lab, tname) in enumerate(
        [("e", 14, 1, ".t2.E"), ("rb", 12, 3, None),
         ("ts", 11, 1, ".google.protobuf.Timestamp"),
         ("sub", 11, 1, ".t2.Sub")], 1,
    ):
        fld = m.field.add()
        fld.name = name; fld.number = i; fld.type = typ; fld.label = lab
        if tname:
            fld.type_name = tname
    me = m.nested_type.add(); me.name = "MEntry"; me.options.map_entry = True
    k = me.field.add(); k.name = "key"; k.number = 1; k.type = 9
    v = me.field.add(); v.name = "value"; v.number = 2; v.type = 14
    v.type_name = ".t2.E"
    fld = m.field.add()
    fld.name = "m"; fld.number = 5; fld.type = 11; fld.label = 3
    fld.type_name = ".t2.Ev.MEntry"
    # deps appended AFTER the dependent file on purpose
    fds.file.append(descriptor_pb2.FileDescriptorProto.FromString(
        timestamp_pb2.DESCRIPTOR.serialized_pb))
    p = str(tmp_path / "t2.desc")
    open(p, "wb").write(fds.SerializeToString())

    obj = {"e": "E1", "rb": ["x", b"\x01"], "ts": "2024-01-01T00:00:00Z",
           "sub": {}, "m": {"a": "E2"}}
    enc = scalar.call("encode_proto", pa.array([obj]), p, "t2.Ev")
    got = scalar.call("parse_proto", enc, p, "t2.Ev")[0].as_py()
    assert got["e"] == "E1"
    assert got["rb"] == [b"x", b"\x01"]          # str coerced like singular
    assert got["ts"] == "2024-01-01T00:00:00Z"   # WKT JSON scalar form
    assert got["sub"] == {}                      # presence kept
    assert got["m"] == {"a": "E2"}               # map enums name-mapped
    # unknown open-enum wire value decodes to the raw int, no crash
    wire = bytes([0x08, 99])
    assert scalar.call("parse_proto", pa.array([wire]), p, "t2.Ev")[0].as_py() == {"e": 99}


def test_json_schema_fallback_format_checkers():
    """Spec formats enforce via stdlib fallbacks even without optional
    validator packages (uuid/ipv4 are never shipped with jsonschema)."""
    import pyarrow as pa

    from vector_ray.functions import scalar

    schema = ('{"type": "object", "properties": {'
              '"u": {"type": "string", "format": "uuid"},'
              '"ip": {"type": "string", "format": "ipv4"}}}')

    def run(payload):
        return scalar.call(
            "validate_json_schema", pa.array([payload]), schema, False
        )[0].as_py()

    assert run('{"u": "123e4567-e89b-12d3-a456-426614174000"}') is True
    assert run('{"u": "not-a-uuid"}') is False
    assert run('{"ip": "10.0.0.1"}') is True
    assert run('{"ip": "999.0.0.1"}') is False
