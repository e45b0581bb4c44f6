"""AgentDDSketch SketchPayload wire format (vector_ray/ddsketch_wire.py).

Key-mapping parity with lib/vector-core/src/metrics/ddsketch.rs (agent
constants, round-half-even) and byte-level protobuf correctness
verified against an INDEPENDENT decoder (google.protobuf dynamic
message built from the public agent-payload field layout)."""

import numpy as np
import pyarrow as pa
import pytest

from vector_ray.ddsketch_wire import (
    DEFAULT_CONFIG,
    AgentConfig,
    decode_sketch_batch,
    decode_sketch_payload,
    encode_sketch_batch,
    encode_sketch_payload,
    merge_sketches,
    sketch_from_values,
)


# ------------------------------------------------------- key mapping


def test_key_lower_bound_identity():
    """ddsketch.rs test_ddsketch_config_key_lower_bound_identity: the
    key of a bin's lower bound is that bin."""
    c = DEFAULT_CONFIG
    for k in [1, 2, 10, 100, 1000, 5000]:
        lb = c.bin_lower_bound(k)
        assert int(c.keys(np.array([lb]))[0]) == k


def test_key_sign_mirror_and_zero():
    c = DEFAULT_CONFIG
    ks = c.keys(np.array([5.0, -5.0, 0.0, 1e-12, -1e-12]))
    assert ks[0] == -ks[1] > 0
    assert ks[2] == ks[3] == ks[4] == 0


def test_key_relative_accuracy():
    """γ^k <= v < γ^(k+1) within the guaranteed relative accuracy
    (eps = 1/128 agent default)."""
    c = DEFAULT_CONFIG
    vals = np.array([1e-6, 0.5, 1.0, 3.14, 1000.0, 1e9])
    ks = c.keys(vals)
    for v, k in zip(vals, ks):
        lo = c.bin_lower_bound(int(k))
        est = lo  # lower bound itself must be within 2*eps of v
        assert abs(est - v) / v <= 2 * (1.0 / 128.0) * 1.01 + 1e-12


def test_keys_monotonic():
    c = DEFAULT_CONFIG
    v = np.sort(np.random.default_rng(1).uniform(1e-6, 1e6, 1000))
    k = c.keys(v)
    assert (np.diff(k.astype(np.int32)) >= 0).all()


# ------------------------------------------------------ sketch + merge


def test_sketch_summary_stats():
    v = [1.0, 2.0, 3.0, 4.0]
    s = sketch_from_values(v, ts=1700000000)
    assert s.cnt == 4 and s.min == 1.0 and s.max == 4.0
    assert s.sum == pytest.approx(10.0) and s.avg == pytest.approx(2.5)
    assert s.n.sum() == 4


def test_merge_equals_combined():
    rng = np.random.default_rng(7)
    a_vals = rng.uniform(0.1, 100, 500)
    b_vals = rng.uniform(0.1, 100, 300)
    merged = merge_sketches(sketch_from_values(a_vals), sketch_from_values(b_vals))
    combined = sketch_from_values(np.concatenate([a_vals, b_vals]))
    np.testing.assert_array_equal(merged.k, combined.k)
    np.testing.assert_array_equal(merged.n, combined.n)
    assert merged.cnt == combined.cnt
    assert merged.sum == pytest.approx(combined.sum)


def test_quantile_within_relative_accuracy():
    rng = np.random.default_rng(3)
    vals = rng.lognormal(1.0, 1.0, 20_000)
    s = sketch_from_values(vals)
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        est = s.quantile(q)
        assert abs(est - exact) / exact < 0.05


# ----------------------------------------------------------- the wire


def test_roundtrip():
    s = sketch_from_values([0.5, 1.5, 1.5, 200.0, -3.0], ts=1712345678)
    payload = encode_sketch_payload(
        [("latency.ms", "web-1", ["env:prod", "az:a"], s)]
    )
    got = decode_sketch_payload(payload)
    assert len(got) == 1
    metric, host, tags, sk = got[0]
    assert (metric, host, tags) == ("latency.ms", "web-1", ["env:prod", "az:a"])
    assert sk.ts == s.ts and sk.cnt == s.cnt
    assert sk.min == s.min and sk.max == s.max
    assert sk.sum == pytest.approx(s.sum)
    np.testing.assert_array_equal(sk.k, s.k)
    np.testing.assert_array_equal(sk.n, s.n)


def _dynamic_sketch_payload_cls():
    """Independent decoder: build datadog.agentpayload.SketchPayload
    from the PUBLIC field layout via google.protobuf dynamically."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "dd_metric_test.proto"
    fdp.package = "ddtest"
    fdp.syntax = "proto3"
    payload = fdp.message_type.add()
    payload.name = "SketchPayload"
    sketch = payload.nested_type.add()
    sketch.name = "Sketch"
    dog = sketch.nested_type.add()
    dog.name = "Dogsketch"
    F = descriptor_pb2.FieldDescriptorProto

    def add(msg, name, num, ftype, label=F.LABEL_OPTIONAL, type_name=None):
        f = msg.field.add()
        f.name, f.number, f.type, f.label = name, num, ftype, label
        if type_name:
            f.type_name = type_name

    add(dog, "ts", 1, F.TYPE_INT64)
    add(dog, "cnt", 2, F.TYPE_INT64)
    add(dog, "min", 3, F.TYPE_DOUBLE)
    add(dog, "max", 4, F.TYPE_DOUBLE)
    add(dog, "avg", 5, F.TYPE_DOUBLE)
    add(dog, "sum", 6, F.TYPE_DOUBLE)
    add(dog, "k", 7, F.TYPE_SINT32, F.LABEL_REPEATED)
    add(dog, "n", 8, F.TYPE_UINT32, F.LABEL_REPEATED)
    add(sketch, "metric", 1, F.TYPE_STRING)
    add(sketch, "host", 2, F.TYPE_STRING)
    add(sketch, "tags", 4, F.TYPE_STRING, F.LABEL_REPEATED)
    add(
        sketch, "dogsketches", 7, F.TYPE_MESSAGE, F.LABEL_REPEATED,
        ".ddtest.SketchPayload.Sketch.Dogsketch",
    )
    add(
        payload, "sketches", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED,
        ".ddtest.SketchPayload.Sketch",
    )
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    desc = pool.FindMessageTypeByName("ddtest.SketchPayload")
    return message_factory.GetMessageClass(desc)


def test_cross_check_with_google_protobuf():
    pytest.importorskip("google.protobuf")
    cls = _dynamic_sketch_payload_cls()
    s = sketch_from_values([1.0, 2.0, 2.0, 50.0], ts=1712345678)
    raw = encode_sketch_payload([("req.dur", "h-9", ["env:dev"], s)])
    msg = cls()
    msg.ParseFromString(raw)
    assert len(msg.sketches) == 1
    sk = msg.sketches[0]
    assert sk.metric == "req.dur" and sk.host == "h-9"
    assert list(sk.tags) == ["env:dev"]
    d = sk.dogsketches[0]
    assert d.ts == 1712345678 and d.cnt == 4
    assert d.min == 1.0 and d.max == 50.0 and d.sum == pytest.approx(55.0)
    assert list(d.k) == s.k.tolist()
    assert list(d.n) == s.n.tolist()
    # and the reverse: google-encoded bytes parse with OUR decoder
    raw2 = msg.SerializeToString()
    (metric, host, tags, sk2), = decode_sketch_payload(raw2)
    assert metric == "req.dur" and tags == ["env:dev"]
    np.testing.assert_array_equal(sk2.k, s.k)


# ------------------------------------------------------ batch helpers


def test_encode_decode_batch():
    batch = pa.table(
        {
            "name": ["lat", "lat", "lat", "err"],
            "host": ["a", "a", "a", "b"],
            "tags": [["env:p"], ["env:p"], ["env:p"], []],
            "ts": [100, 100, 100, 100],
            "value": [1.0, 2.0, 4.0, 9.0],
        }
    )
    raw = encode_sketch_batch(batch)
    t = decode_sketch_batch(raw)
    names = set(t["name"].to_pylist())
    assert names == {"lat", "err"}
    lat = t.filter(pa.compute.equal(t["name"], "lat"))
    assert lat["cnt"].to_pylist()[0] == 3
    assert sum(lat["n"].to_pylist()) == 3
    assert lat["sum"].to_pylist()[0] == pytest.approx(7.0)


def test_merge_with_empty_sketch_keeps_stats():
    """An empty sketch's placeholder min=max=0.0 / ts=0 must not poison
    the merged stats (quantile() clamps into [min, max])."""
    from vector_ray.ddsketch_wire import merge_sketches, sketch_from_values

    full = sketch_from_values([5.0, 10.0, 20.0], ts=1700000000)
    empty = sketch_from_values([], ts=0)
    for m in (merge_sketches(empty, full), merge_sketches(full, empty)):
        assert m.min == 5.0 and m.max == 20.0
        assert m.ts == 1700000000 and m.cnt == 3


def test_quantile_reference_edges_and_interpolation():
    """ddsketch.rs:666-706 parity: q<=0 -> min exactly, q>=1 -> max
    exactly; interior quantiles use rank-weighted interpolation with
    the first bin's v_low replaced by min."""
    vals = [0.5, 1.5, 1.5, 3.0, 200.0]
    s = sketch_from_values(vals)
    assert s.quantile(0.0) == min(vals)
    assert s.quantile(-0.1) == min(vals)
    assert s.quantile(1.0) == max(vals)
    assert s.quantile(2.0) == max(vals)
    # single-value sketch: every interior quantile lands in the only
    # bin, whose v_low is min -> estimate clamps to the value itself
    one = sketch_from_values([42.0])
    assert abs(one.quantile(0.5) - 42.0) / 42.0 < 0.015
    # interpolation stays within the sketch's relative-error bound
    rng = np.random.default_rng(9)
    data = rng.uniform(1.0, 1000.0, 50_000)
    sk = sketch_from_values(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.999):
        exact = np.quantile(data, q)
        assert abs(sk.quantile(q) - exact) / exact < 0.02


def test_decode_unpacked_repeated_fields():
    """proto3 parsers must accept UNPACKED repeated scalars (one wire-0
    varint per element) for fields 7/8, not only packed blobs."""
    from vector_ray.ddsketch_wire import (
        _decode_dogsketch,
        _double,
        _int64,
        _varint,
        _zigzag,
    )

    s = sketch_from_values([0.5, 1.5, 1.5, -3.0])
    unpacked = b"".join(
        [
            _int64(1, s.ts),
            _int64(2, s.cnt),
            _double(3, s.min),
            _double(4, s.max),
            _double(5, s.avg),
            _double(6, s.sum),
        ]
        + [_varint(7 << 3 | 0) + _varint(_zigzag(int(k))) for k in s.k]
        + [_varint(8 << 3 | 0) + _varint(int(n)) for n in s.n]
    )
    d = _decode_dogsketch(unpacked)
    assert d.cnt == s.cnt and d.min == s.min and d.max == s.max
    assert list(d.k) == list(s.k)
    assert list(d.n) == list(s.n)
