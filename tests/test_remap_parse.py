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
