"""Codec kernels: json/csv/logfmt/syslog decode, ndjson/csv/logfmt encode."""

import json

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
