"""Arrow IPC stream codec — port of encoding/format/arrow.rs tests
(arrow.rs:598-1445), re-expressed columnar: per-row type mismatch
becomes a per-column kind rule (one Arrow column has one type)."""

import datetime as dt
import decimal
import json

import pyarrow as pa
import pytest

from vector_ray.codecs import decode_arrow, encode_arrow


def roundtrip(batch, schema):
    return decode_arrow(encode_arrow(batch, schema))


def test_encode_all_types():
    batch = pa.table({
        "s": ["a", "b"],
        "i8": pa.array([1, -2], type=pa.int64()),
        "u16": pa.array([3, 70000], type=pa.int64()),  # 70000 overflows u16
        "i64": pa.array([2**40, -5], type=pa.int64()),
        "f32": pa.array([1.5, 2.0]),
        "f64": pa.array([7, 8], type=pa.int64()),  # int → float coercion
        "b": [True, False],
        "bin": pa.array([b"\x01", b"\x02"], type=pa.binary()),
    })
    schema = pa.schema([
        ("s", pa.string()), ("i8", pa.int8()), ("u16", pa.uint16()),
        ("i64", pa.int64()), ("f32", pa.float32()), ("f64", pa.float64()),
        ("b", pa.bool_()), ("bin", pa.binary()),
    ])
    out = roundtrip(batch, schema)
    assert out.schema == schema
    assert out["i8"].to_pylist() == [1, -2]
    assert out["u16"].to_pylist() == [3, None]  # out-of-range → null (arrow.rs range guards)
    assert out["i64"].to_pylist() == [2**40, -5]
    assert out["f64"].to_pylist() == [7.0, 8.0]
    assert out["bin"].to_pylist() == [b"\x01", b"\x02"]


def test_encode_null_values_and_missing_fields():
    batch = pa.table({"a": [1, None]})
    schema = pa.schema([("a", pa.int64()), ("missing", pa.string())])
    out = roundtrip(batch, schema)
    assert out["a"].to_pylist() == [1, None]
    assert out["missing"].to_pylist() == [None, None]


def test_encode_type_mismatch_becomes_null():
    # arrow.rs test_encode_type_mismatches: float into Int64 → null
    batch = pa.table({"field": pa.array([3.15, 2.5])})
    out = roundtrip(batch, pa.schema([("field", pa.int64())]))
    assert out["field"].to_pylist() == [None, None]


def test_encode_complex_json_values():
    batch = pa.table({
        "obj": pa.array([{"k": 1, "l": [1, 2]}]),
        "arr": pa.array([[1, 2, 3]]),
    })
    schema = pa.schema([("obj", pa.string()), ("arr", pa.string())])
    out = roundtrip(batch, schema)
    assert json.loads(out["obj"].to_pylist()[0]) == {"k": 1, "l": [1, 2]}
    assert json.loads(out["arr"].to_pylist()[0]) == [1, 2, 3]


def test_encode_unsupported_type_errors():
    batch = pa.table({"x": pa.array([[1]], type=pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="unsupported Arrow target type"):
        encode_arrow(batch, pa.schema([("x", pa.list_(pa.int64()))]))


def test_encode_without_schema_or_events_fails():
    batch = pa.table({"a": [1]})
    with pytest.raises(ValueError, match="requires a schema"):
        encode_arrow(batch, None)
    with pytest.raises(ValueError, match="no events"):
        encode_arrow(batch.slice(0, 0), pa.schema([("a", pa.int64())]))


def test_encode_timestamp_precisions():
    ts = dt.datetime(2023, 5, 4, 12, 30, 45, 123456)
    batch = pa.table({"t": pa.array([ts], type=pa.timestamp("us"))})
    for unit, want in [
        ("s", ts.replace(microsecond=0)),
        ("ms", ts.replace(microsecond=123000)),
        ("us", ts),
        ("ns", ts),
    ]:
        out = roundtrip(batch, pa.schema([("t", pa.timestamp(unit))]))
        assert out["t"].to_pylist() == [want], unit


def test_encode_string_and_integer_timestamps():
    # RFC3339 strings (incl. offset) parse; invalid strings → null
    batch = pa.table({"t": ["2023-05-04T12:30:45Z",
                            "2023-05-04T14:30:45+02:00",
                            "not a timestamp"]})
    out = roundtrip(batch, pa.schema([("t", pa.timestamp("us"))]))
    want = dt.datetime(2023, 5, 4, 12, 30, 45)
    assert out["t"].to_pylist() == [want, want, None]
    # raw integers are epoch values in the target unit (arrow.rs:306)
    batch = pa.table({"t": pa.array([1_700_000_000], type=pa.int64())})
    out = roundtrip(batch, pa.schema([("t", pa.timestamp("s"))]))
    assert out["t"].to_pylist() == [dt.datetime(2023, 11, 14, 22, 13, 20)]


def test_encode_decimal():
    batch = pa.table({"d": pa.array([42, -1], type=pa.int64())})
    out = roundtrip(batch, pa.schema([("d", pa.decimal128(10, 2))]))
    assert out["d"].to_pylist() == [decimal.Decimal("42.00"), decimal.Decimal("-1.00")]
    batch = pa.table({"d": pa.array([3.14159])})
    out = roundtrip(batch, pa.schema([("d", pa.decimal256(20, 3))]))
    assert out["d"].to_pylist() == [decimal.Decimal("3.142")]


def test_non_nullable_violation_errors():
    batch = pa.table({"a": [1, None]})
    with pytest.raises(ValueError, match="non-nullable"):
        encode_arrow(batch, pa.schema([pa.field("a", pa.int64(), nullable=False)]))


def test_arrow_ipc_sink_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from vector_ray.sinks import write_arrow_ipc

    ds = rd.range(100).map_batches(
        lambda b: pa.table({"id": b["id"], "v": b["id"].cast(pa.float64())}),
        batch_format="pyarrow",
    )
    out = str(tmp_path / "arrows")
    write_arrow_ipc(ds, out, schema=pa.schema([("id", pa.int64()), ("v", pa.float32())]))
    import glob

    files = glob.glob(out + "/*.arrows")
    assert files
    tables = []
    for f in files:
        with pa.ipc.open_stream(f) as r:
            tables.append(r.read_all())
    t = pa.concat_tables(tables)
    assert t.num_rows == 100
    assert t.schema.field("v").type == pa.float32()
    assert sorted(t["id"].to_pylist()) == list(range(100))
