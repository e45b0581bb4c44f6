"""remap/parse kernels: grok extraction, error routing (remap.rs:564-646
drop/reroute semantics), token-table message render round-trip."""

import pyarrow as pa
import ray.data as rd

from vector_ray import parse, schema
from vector_ray.stages import remap, remap_with_drops


def test_grok_to_regex_types():
    regex, types = parse.grok_to_regex("%{WORD:verb} %{POSINT:code:int}")
    assert "(?P<verb>" in regex and "(?P<code>" in regex
    assert types == {"code": pa.int64()}


def test_grok_parse_apache_like():
    msgs = pa.table(
        {"message": pa.array(['alice web - [123] "GET /seq/x HTTP/1.1" 200 55 first=1 last=2', "garbage"])}
    )
    g = parse.GrokParser(parse.ACCESS_GROK)
    out = g.apply(msgs, "message")
    assert out["status"][0].as_py() == 200
    assert out["bytes"][0].as_py() == 55
    assert out["__error"].to_pylist() == [False, True]


def test_render_and_parse_roundtrip():
    b = schema.token_batch(0, 200)
    b = parse.render_messages(b)
    g = parse.GrokParser(parse.ACCESS_GROK)
    out = g.apply(b, "message")
    assert out["__error"].to_pylist() == [False] * 200
    # parsed fields equal their generators
    assert out["src"].to_pylist() == b["source"].to_pylist()
    assert out["bytes"].to_pylist() == b["n_tok"].cast(pa.int64()).to_pylist()
    first = [t[0] for t in b["tokens"].to_pylist()]
    assert out["first_tok"].to_pylist() == first
    # token arrays untouched (the end-to-end invariant)
    assert out["tokens"].to_pylist() == b["tokens"].to_pylist()


def test_remap_with_drops():
    ds = rd.from_arrow(
        pa.table({"message": pa.array(["level=INFO code=7", "level=WARN code=9", "nope"])})
    )
    ok, dropped = remap_with_drops(
        ds,
        [("parse_regex", "message", r"level=(?P<level>\w+) code=(?P<code>\d+)")],
    )
    ok_rows = ok.take_all()
    assert [r["level"] for r in ok_rows] == ["INFO", "WARN"]
    assert [r["message"] for r in dropped.take_all()] == ["nope"]


def test_remap_steps():
    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3]), "y": pa.array(["a", "b", "c"])}))
    import pyarrow.compute as pc

    out = remap(
        ds,
        [
            ("set", "x2", lambda b: pc.multiply(b["x"], 2)),
            ("set_literal", "tag", "t1"),
            ("rename", "y", "label"),
            ("coerce", "x", pa.float64()),
            ("filter", ".x2 >= 4"),
        ],
        drop_on_error=True,
    )
    rows = out.take_all()
    assert [r["x2"] for r in rows] == [4, 6]
    assert rows[0]["label"] == "b" and rows[0]["tag"] == "t1"
    assert isinstance(rows[0]["x"], float)


def test_parse_json_step():
    ds = rd.from_arrow(pa.table({"props": pa.array(['{"k": 5}', '{"k": 9}', "BAD"])}))
    ok, dropped = remap_with_drops(ds, [("parse_json", "props", ["k"], {"k": pa.int64()})])
    assert sorted(r["k"] for r in ok.take_all()) == [5, 9]
    assert dropped.count() == 1


def test_named_log_parsers():
    from vector_ray.parse import (
        parse_aws_alb_log,
        parse_aws_vpc_flow_log,
        parse_common_log,
        parse_glog,
        parse_klog,
        parse_linux_authorization,
    )

    g, eg = parse_glog(pa.array(
        ["I0817 07:45:01.123456  1234 main.go:42] started server", "junk"]))
    assert g["file"].to_pylist() == ["main.go", None]
    assert g["line"].to_pylist() == [42, None]
    assert eg.to_pylist() == [False, True]
    assert g["level"].to_pylist() == ["info", None]
    assert g["id"].to_pylist() == [1234, None]
    k, _ = parse_klog(pa.array(["W0817 07:45:01.000001  9 pod.go:7] evicted"]))
    assert k["level"].to_pylist() == ["warning"]
    # klog has no year in the line — current year is inferred
    assert k["timestamp"].to_pylist()[0].month == 8

    v, _ = parse_aws_vpc_flow_log(pa.array(
        ["2 123456789010 eni-1235b8ca 172.31.16.139 172.31.16.21 20641 22 6 20 "
         "4249 1418530010 1418530070 ACCEPT OK"]))
    assert v["action"].to_pylist() == ["ACCEPT"]
    assert v["start"].to_pylist() == [1418530010]

    a, ea = parse_aws_alb_log(pa.array(
        ['http 2018-07-02T22:23:00.186641Z app/my-lb/50dc6c495c0c9188 '
         '192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 '
         '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
         'arn:aws:elb:tg/x "Root=1-abc" "-" "-" 0 2018-07-02T22:22:48.364000Z '
         '"forward" "-" "-" "8080" "200 302" "-" "-"',
         'short line']))
    assert ea.to_pylist() == [False, True]
    assert a["elb_status_code"].to_pylist() == ["200", None]
    assert a["user_agent"].to_pylist() == ["curl/7.46.0", None]
    assert a["request_method"].to_pylist() == ["GET", None]
    assert a["target_port_list"].to_pylist() == [["8080"], None]
    assert a["target_status_code_list"].to_pylist() == [["200", "302"], None]

    l, _ = parse_linux_authorization(pa.array(
        ["Aug 17 07:45:01 web1 sshd[4321]: Accepted publickey for root",
         "Aug 17 07:45:02 web1 cron: session opened"]))
    assert l["appname"].to_pylist() == ["sshd", "cron"]
    assert l["procid"].to_pylist() == [4321, None]
    assert l["timestamp"].to_pylist()[0].month == 8

    c, _ = parse_common_log(pa.array(
        ['127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 23']))
    assert c["status"].to_pylist() == [200]
