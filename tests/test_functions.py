"""Scalar-function library (VRL-stdlib analog) — python-oracle checks."""

import base64
import hashlib

import pyarrow as pa
import pytest

from vector_ray.functions.scalar import FUNCTIONS, call


def col(*vals):
    return pa.array(list(vals))


def test_strings():
    assert call("upcase", col("abc", "D")).to_pylist() == ["ABC", "D"]
    assert call("downcase", col("AbC")).to_pylist() == ["abc"]
    assert call("slice", col("hello"), 1, 3).to_pylist() == ["el"]
    assert call("replace", col("a-b-c"), "-", "+").to_pylist() == ["a+b+c"]
    assert call("redact", col("user=bob pw=123"), r"pw=\d+").to_pylist() == [
        "user=bob [REDACTED]"
    ]
    assert call("string_length", col("héllo")).to_pylist() == [5]
    assert call("split", col("a,b,c"), ",").to_pylist() == [["a", "b", "c"]]


def test_numeric_types():
    assert call("abs", col(-2, 3)).to_pylist() == [2, 3]
    assert call("mod", col(10, 7), 3).to_pylist() == [1, 1]
    assert call("to_int", col("42")).to_pylist() == [42]
    assert call("to_float", col(1)).to_pylist() == [1.0]
    assert call("coalesce", pa.array([None, 5], type=pa.int64()), 0).to_pylist() == [0, 5]
    assert call("round", col(1.256, 3.4), 1).to_pylist() == [1.3, 3.4]


def test_timestamps():
    ts = pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))
    assert call("to_unix_timestamp", ts).to_pylist() == [1_700_000_000]
    back = call("from_unix_timestamp", pa.array([1_700_000_000]))
    assert back.type == pa.timestamp("us")
    s = call("format_timestamp", ts)
    assert s.to_pylist() == ["2023-11-14T22:13:20"]
    rt = call("parse_timestamp", s)
    assert rt.to_pylist() == ts.to_pylist()
    assert call("parse_timestamp", col("not a date")).to_pylist() == [None]


def test_hashes_codecs():
    assert call("encode_base64", col("hi")).to_pylist() == [base64.b64encode(b"hi").decode()]
    assert call("decode_base64", call("encode_base64", col("round"))).to_pylist() == ["round"]
    assert call("sha256", col("x")).to_pylist() == [hashlib.sha256(b"x").hexdigest()]
    assert call("md5", col("x")).to_pylist() == [hashlib.md5(b"x").hexdigest()]
    h = call("xxhash64", col("a", "a", "b")).to_pylist()
    assert h[0] == h[1] != h[2]


def test_ip():
    assert call("ip_to_int", col("1.2.3.4")).to_pylist() == [(1 << 24) + (2 << 16) + (3 << 8) + 4]
    assert call("ip_cidr_contains", col("10.1.2.3", "192.168.0.1"), "10.0.0.0/8").to_pylist() == [
        True,
        False,
    ]


def test_unknown_function():
    with pytest.raises(ValueError, match="unknown function"):
        call("nope", col("x"))


def test_apply_in_remap():
    import ray.data as rd

    from vector_ray.stages import remap

    ds = rd.from_arrow(pa.table({"msg": pa.array(["hello", "world"])}))
    out = remap(
        ds,
        [
            ("apply", "up", "upcase", "msg"),
            ("apply", "h", "sha256", "msg"),
        ],
        drop_on_error=True,
    )
    rows = sorted(out.take_all(), key=lambda r: r["msg"])
    assert rows[0]["up"] == "HELLO"
    assert rows[0]["h"] == hashlib.sha256(b"hello").hexdigest()


def test_registry_size():
    assert len(FUNCTIONS) >= 30


def test_stdlib_extras_round2b():
    import json

    from vector_ray.functions.scalar import call

    assert call("reverse_string", pa.array(["abc", None])).to_pylist() == ["cba", None]
    assert call("pad_left", pa.array(["7"]), 3, "0").to_pylist() == ["007"]
    assert call("find", pa.array(["hello"]), "ll").to_pylist() == [2]
    assert call("format_int", pa.array([255])).to_pylist() == ["ff"]
    got = call("parse_regex", pa.array(["a=1 b=2", "nope"]), r"a=(?P<a>\d+) b=(?P<b>\d+)")
    assert got.to_pylist()[0] == {"a": "1", "b": "2"}
    assert got.to_pylist()[1] is None
    alls = call("parse_regex_all", pa.array(["x=1 x=2"]), r"x=(?P<v>\d+)")
    assert alls.to_pylist()[0] == [{"v": "1"}, {"v": "2"}]
    assert json.loads(call("unique_items", pa.array(["[1,2,1,3]"])).to_pylist()[0]) == [1, 2, 3]
    assert json.loads(call("tally", pa.array(['["a","b","a"]'])).to_pylist()[0]) == {"a": 2, "b": 1}
    assert call("includes", pa.array(["[1,2]"]), 2).to_pylist() == [True]


def test_stdlib_big_batch():
    import json
    import uuid

    from vector_ray.functions.scalar import FUNCTIONS, call

    assert len(FUNCTIONS) >= 95
    assert call("is_nullish", pa.array([" ", "-", "x", None])).to_pylist() == [
        True, True, False, True]
    assert call("is_json", pa.array(['{"a":1}', "nope"])).to_pylist() == [True, False]
    assert call("is_ipv4", pa.array(["10.0.0.1", "999.0.0.1"])).to_pylist() == [True, False]
    assert call("is_ipv6", pa.array(["::1", "10.0.0.1"])).to_pylist() == [True, False]
    assert call("format_number", pa.array([1234567.891])).to_pylist() == ["1,234,567.89"]
    assert call("decode_base16", call("encode_base16", pa.array(["hi"]))).to_pylist() == ["hi"]
    assert call("get_path", pa.array(['{"a":{"b":[10,20]}}']), "a.b[1]").to_pylist() == ["20"]
    assert call("uuid_v5", pa.array(["example.com"])).to_pylist()[0] == str(
        uuid.uuid5(uuid.NAMESPACE_DNS, "example.com"))
    assert json.loads(call("encode_json", pa.array(['{"b":2,"a":1}'])).to_pylist()[0]) == {
        "a": 1, "b": 2}
