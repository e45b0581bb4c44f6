"""reduce (merge strategies + sessionization) and window (context
buffer) — semantics from reduce/merge_strategy.rs:17-55,
reduce/transform.rs:223-254, window/transform.rs:50-96."""

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages import reduce_stage, window_stage


def txn_table():
    return pa.table(
        {
            "request_id": pa.array(["r1"] * 3 + ["r2"] * 2),
            "message": pa.array(["start", "mid", "end", "a", "b"]),
            "bytes": pa.array([10, 20, 30, 5, 7], type=pa.int64()),
            "timestamp": pa.array([0, 1, 2, 10, 11], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "seq": pa.array([0, 1, 2, 3, 4]),
        }
    )


def test_reduce_defaults():
    out = reduce_stage(rd.from_arrow(txn_table()), ["request_id"], order_by="seq")
    rows = {r["request_id"]: r for r in out.take_all()}
    r1 = rows["r1"]
    assert r1["message"] == "start"  # string → first (discard)
    assert r1["bytes"] == 60  # numeric → sum
    assert r1["_reduce_count"] == 3
    assert str(r1["timestamp"]).startswith("1970-01-01 00:00:00")
    assert r1["timestamp_end"] > r1["timestamp"]  # <ts>_end carries the last
    assert rows["r2"]["bytes"] == 12


def test_reduce_strategies():
    out = reduce_stage(
        rd.from_arrow(txn_table()),
        ["request_id"],
        merge_strategies={
            "message": "concat",
            "bytes": "max",
        },
        order_by="seq",
    )
    rows = {r["request_id"]: r for r in out.take_all()}
    assert rows["r1"]["message"] == "start mid end"
    assert rows["r1"]["bytes"] == 30


def test_reduce_array_and_flat_unique():
    t = pa.table(
        {
            "g": pa.array(["g"] * 4),
            "v": pa.array(["a", "b", "a", "c"]),
            "seq": pa.array([0, 1, 2, 3]),
        }
    )
    out = reduce_stage(
        rd.from_arrow(t), ["g"], merge_strategies={"v": "array"}, order_by="seq"
    ).take_all()
    assert out[0]["v"] == ["a", "b", "a", "c"]
    out2 = reduce_stage(
        rd.from_arrow(t), ["g"], merge_strategies={"v": "flat_unique"}, order_by="seq"
    ).take_all()
    assert out2[0]["v"] == ["a", "b", "c"]


def test_reduce_ends_when_sessionizes():
    t = pa.table(
        {
            "g": pa.array(["g"] * 6),
            "message": pa.array(["a", "b", "END", "c", "END", "d"]),
            "n": pa.array([1, 1, 1, 1, 1, 1], type=pa.int64()),
            "seq": pa.array(range(6)),
        }
    )
    out = reduce_stage(
        rd.from_arrow(t),
        ["g"],
        order_by="seq",
        ends_when=".message == 'END'",
    )
    sizes = sorted(r["_reduce_count"] for r in out.take_all())
    assert sizes == [1, 2, 3]  # [a,b,END] [c,END] [d]


def test_reduce_starts_when_and_max_events():
    t = pa.table(
        {
            "g": pa.array(["g"] * 6),
            "message": pa.array(["S", "x", "S", "y", "z", "w"]),
            "seq": pa.array(range(6)),
        }
    )
    out = reduce_stage(
        rd.from_arrow(t), ["g"], order_by="seq", starts_when=".message == 'S'"
    )
    sizes = sorted(r["_reduce_count"] for r in out.take_all())
    assert sizes == [2, 4]  # [S,x] [S,y,z,w]
    out2 = reduce_stage(rd.from_arrow(t), ["g"], order_by="seq", max_events=2)
    sizes2 = sorted(r["_reduce_count"] for r in out2.take_all())
    assert sizes2 == [2, 2, 2]


def test_window_context_buffer():
    t = pa.table(
        {
            "k": pa.array(["k"] * 10),
            "lvl": pa.array(["i", "i", "i", "e", "i", "i", "i", "i", "i", "i"]),
            "seq": pa.array(range(10)),
        }
    )
    out = window_stage(
        rd.from_arrow(t),
        flush_when=".lvl == 'e'",
        group_by=["k"],
        order_by="seq",
        num_events_before=2,
        num_events_after=1,
    )
    assert sorted(r["seq"] for r in out.take_all()) == [1, 2, 3, 4]


def test_window_forward_when():
    t = pa.table(
        {
            "k": pa.array(["k"] * 5),
            "lvl": pa.array(["keep", "x", "x", "x", "x"]),
            "seq": pa.array(range(5)),
        }
    )
    out = window_stage(
        rd.from_arrow(t),
        flush_when=".lvl == 'never'",
        forward_when=".lvl == 'keep'",
        group_by=["k"],
        order_by="seq",
    )
    assert [r["seq"] for r in out.take_all()] == [0]


def test_reduce_end_every_period():
    # periodic event-time flush: rows in different 10s windows never merge
    t = pa.table(
        {
            "g": pa.array(["g"] * 6),
            "n": pa.array([1] * 6, type=pa.int64()),
            "ts": pa.array([0, 1, 2, 11, 12, 25], type=pa.int64()),  # us would be tiny; use ms math below
            "seq": pa.array(range(6)),
        }
    )
    # ts in µs: windows of 10ms → use ts values in µs scale
    t = t.set_column(t.column_names.index("ts"), "ts",
                     pa.array([0, 1_000, 2_000, 11_000, 12_000, 25_000], type=pa.int64()))
    out = reduce_stage(
        rd.from_arrow(t), ["g"], order_by="seq", end_every_period_ms=10, ts_field="ts"
    )
    sizes = sorted(r["_reduce_count"] for r in out.take_all())
    assert sizes == [1, 2, 3]  # windows [0,10ms) [10,20) [20,30)


def test_log_to_metric_all_mode():
    from vector_ray.stages.log_to_metric import log_to_metric_all

    t = pa.table(
        {
            "name": pa.array(["cpu", "mem"]),
            "kind": pa.array(["incremental", "absolute"]),
            "value": pa.array([1.5, 900.0]),
            "ts": pa.array([1, 2], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    rows = log_to_metric_all(rd.from_arrow(t), ts_field="ts").take_all()
    assert {r["name"] for r in rows} == {"cpu", "mem"}
    assert all(r["tags"] == "" and r["namespace"] == "" for r in rows)
    assert rows[0]["value_type"] == "counter"


def test_reduce_expire_after_gap_sessions(ray_session):
    import numpy as np

    from vector_ray.stages import reduce_stage

    ts = pa.array(
        np.array([0, 1_000_000, 10_000_000, 11_000_000], dtype="int64"),
        type=pa.timestamp("us"),
    )
    t = pa.table({"u": ["a"] * 4, "n": pa.array([1, 2, 3, 4], type=pa.int64()), "ts": ts})
    # gap > 5s splits: sessions {1,2} and {3,4}
    out = reduce_stage(
        rd.from_arrow(t), ["u"], merge_strategies={"n": "array"},
        order_by="ts", expire_after_ms=5_000,
    ).to_pandas()
    got = sorted(tuple(v) for v in out["n"])
    assert got == [(1, 2), (3, 4)]
    assert sorted(out["_reduce_count"]) == [2, 2]


def test_rolling_agg(ray_session):
    import numpy as np

    from vector_ray.stages.rolling import rolling_agg

    ts = pa.array(np.arange(6) * 1_000_000, type=pa.timestamp("us"))
    t = pa.table({"u": ["a"] * 4 + ["b"] * 2,
                  "v": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0]),
                  "ts": ts})
    out = rolling_agg(rd.from_arrow(t), ["u"], [("v", "sum", "s"), ("v", "mean", "m")],
                      window_n=2, order_by="ts").to_pandas().sort_values(["u", "ts"])
    assert out[out.u == "a"]["s"].tolist() == [1.0, 3.0, 5.0, 7.0]
    assert out[out.u == "b"]["m"].tolist() == [10.0, 15.0]


def test_reduce_window_bounded_groups_many_keys(ray_session):
    """VERDICT r2 item 2: high key cardinality must not create one Ray
    group per key — the partition count is fixed, so 20k keys reduce in
    seconds, and the results match a pandas oracle."""
    import time

    import numpy as np

    n_keys = 20_000
    rows = n_keys * 3
    t = pa.table({
        "k": pa.array(np.repeat(np.arange(n_keys, dtype=np.int64), 3)),
        "v": pa.array(np.arange(rows, dtype=np.float64)),
        "seq": pa.array(np.tile(np.arange(3, dtype=np.int64), n_keys)),
        "ts": pa.array(np.arange(rows, dtype=np.int64) * 1_000_000,
                       type=pa.timestamp("us")),
    })
    t0 = time.time()
    out = reduce_stage(rd.from_arrow(t), ["k"], order_by="seq").to_pandas()
    assert len(out) == n_keys
    assert out["_reduce_count"].unique().tolist() == [3]
    s = out.sort_values("k").reset_index(drop=True)
    expect = t.to_pandas().groupby("k")["v"].sum().to_numpy()
    assert np.allclose(s["v"].to_numpy(), expect)
    assert time.time() - t0 < 60

    wt = pa.table({
        "k": pa.array(np.repeat(np.arange(n_keys, dtype=np.int64), 3)),
        "lvl": pa.array(["info", "error", "info"] * n_keys),
        "seq": pa.array(np.tile(np.arange(3, dtype=np.int64), n_keys)),
    })
    wout = window_stage(
        rd.from_arrow(wt), flush_when=".lvl == 'error'", group_by=["k"],
        order_by="seq", num_events_before=1, num_events_after=0,
    ).to_pandas()
    # per key: trigger at seq=1 plus one before → rows seq 0 and 1
    assert len(wout) == n_keys * 2
    assert set(wout["seq"]) == {0, 1}


# ---- reference-parity ports: src/transforms/window/transform.rs tests ----

def _wstream(ray_session=None, *specs):
    """Build a single-key event stream from ('msg', count) specs."""
    msgs = []
    for s in specs:
        if isinstance(s, tuple):
            lo, hi = s
            msgs += [f"A{i:02d}" for i in range(lo, hi + 1)]
        else:
            msgs.append(s)
    t = pa.table({
        "message": pa.array(msgs),
        "host": pa.array(["h"] * len(msgs)),
        "seq": pa.array(list(range(len(msgs))), type=pa.int64()),
    })
    return rd.from_arrow(t)


def _wrun(ds, before, after, forward=False):
    out = window_stage(
        ds, flush_when=".message == 'flush'", group_by=["host"], order_by="seq",
        num_events_before=before, num_events_after=after,
        forward_when=".message == 'forward'" if forward else None,
    ).to_pandas()
    return out.sort_values("seq")["message"].tolist()


def test_window_reference_basic(ray_session):
    """transform.rs test_flush / test_pass / test_zero_flush."""
    assert _wrun(_wstream(None, "flush"), 1, 0) == ["flush"]
    assert _wrun(_wstream(None, "forward"), 1, 0, forward=True) == ["forward"]
    got = _wrun(_wstream(None, (1, 50), "flush", (51, 70)), 0, 0)
    assert got == ["flush"]


def test_window_reference_before_windows(ray_session):
    """transform.rs test_10_in_50 / test_50_in_10 / test_before_and_after
    / test_zero_before."""
    got = _wrun(_wstream(None, (1, 10), "flush"), 50, 0)
    assert got == [f"A{i:02d}" for i in range(1, 11)] + ["flush"]
    got = _wrun(_wstream(None, (1, 50), "flush"), 10, 0)
    assert got == [f"A{i:02d}" for i in range(41, 51)] + ["flush"]
    got = _wrun(_wstream(None, (1, 50), "flush", (51, 70)), 10, 5)
    assert got == [f"A{i:02d}" for i in range(41, 51)] + ["flush"] + [
        f"A{i:02d}" for i in range(51, 56)]
    got = _wrun(_wstream(None, (1, 50), "flush", (51, 70)), 0, 5)
    assert got == ["flush"] + [f"A{i:02d}" for i in range(51, 56)]


def test_window_reference_flush_and_pass(ray_session):
    """transform.rs test_flush_and_pass: forwarded events pass through
    WITHOUT consuming buffer or after-counter slots."""
    ds = _wstream(None, (1, 5), "forward", (6, 10), "forward", "flush",
                  "forward", (11, 15), "forward", (16, 20))
    got = _wrun(ds, 50, 5, forward=True)
    expect = (["A%02d" % i for i in range(1, 6)] + ["forward"]
              + ["A%02d" % i for i in range(6, 11)] + ["forward", "flush",
                 "forward"] + ["A%02d" % i for i in range(11, 16)] + ["forward"])
    assert got == expect


def test_window_reference_zero_pass(ray_session):
    """transform.rs test_zero_pass."""
    ds = _wstream(None, (1, 50), "forward", "flush", (51, 70))
    got = _wrun(ds, 0, 0, forward=True)
    assert got == ["forward", "flush"]


def test_reduce_concat_arrays(ray_session):
    """Port of reduce/transform.rs arrays (typed restatement): concat
    EXTENDS with array values, array collects them nested."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.reduce import reduce_stage

    t = pa.table({
        "request_id": ["1", "2", "1", "2"],
        "foo": pa.array([[1, 3], [2, 4], [5, 7], [6, 8]], type=pa.list_(pa.int64())),
        "seq": [0, 1, 2, 3],
    })
    out = reduce_stage(
        rd.from_arrow(t), group_by=["request_id"], order_by="seq",
        merge_strategies={"foo": "concat"},
    ).take_all()
    got = {r["request_id"]: list(r["foo"]) for r in out}
    assert got == {"1": [1, 3, 5, 7], "2": [2, 4, 6, 8]}

    out = reduce_stage(
        rd.from_arrow(t), group_by=["request_id"], order_by="seq",
        merge_strategies={"foo": "array"},
    ).take_all()
    got = {r["request_id"]: [list(x) for x in r["foo"]] for r in out}
    assert got == {"1": [[1, 3], [5, 7]], "2": [[2, 4], [6, 8]]}


def test_reduce_missing_key_unifies_with_typed_blocks(ray_session):
    """A block missing the group column unifies with blocks where the
    column is int64 (null-typed fill, not string)."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.reduce import reduce_stage

    a = rd.from_arrow(pa.table({"user": pa.array([7], type=pa.int64()),
                                "v": [1.0], "seq": [0]}))
    b = rd.from_arrow(pa.table({"v": [2.0], "seq": [1]}))
    out = reduce_stage(a.union(b), group_by=["user"], order_by="seq",
                       merge_strategies={"v": "sum"}).take_all()
    # pandas upcasts the nullable int key to float (7.0 / NaN) — the
    # point is both groups survive with the right sums
    import math

    got = {(None if r.get("user") is None or (isinstance(r["user"], float)
            and math.isnan(r["user"])) else int(r["user"])): r["v"] for r in out}
    assert got == {7: 1.0, None: 2.0}


def test_merge_strategy_type_matrix():
    """Port of reduce/merge_strategy.rs merging_values (:786-900) +
    the type-mismatch halves of initial_values (:675-784): a value a
    strategy's merger can't accept is warn-SKIPPED per
    transform.rs:68-118, never an event error."""
    import pandas as pd

    from vector_ray.stages.reduce import _merge_series as m

    S = pd.Series
    # merging_values Ok rows
    assert m(S(["foo", "bar"]), "concat") == "foo bar"
    assert m(S(["foo", "bar"]), "concat_newline") == "foo\nbar"
    assert m(S(["foo", "bar"]), "concat_raw") == "foobar"
    assert m(S(["foo", "bar"]), "array") == ["foo", "bar"]
    assert m(S([[4], [2]]), "concat") == [4, 2]
    assert m(S([[], 42], dtype=object), "concat") == [42]
    assert m(S([[34], [42, 43]]), "shortest_array") == [34]
    assert m(S([[34], [42, 43]]), "longest_array") == [42, 43]
    assert sorted(m(S([34, 43, 43]), "flat_unique")) == [34, 43]
    assert m(S([21, 21]), "sum") == 42
    assert m(S([41, 42]), "max") == 42
    assert m(S([43, 42]), "min") == 42
    assert m(S([2.1, 2.1]), "sum") == pytest.approx(4.2)
    # type-mismatch rows: merge("foo", 42/4.2/true/{}/null, Concat).is_err()
    # → the mismatched value is skipped, the string accumulator stays
    assert m(S(["foo", 42], dtype=object), "concat") == "foo"
    assert m(S(["foo", 4.2], dtype=object), "concat") == "foo"
    assert m(S(["foo", True], dtype=object), "concat") == "foo"
    assert m(S(["foo", {}], dtype=object), "concat") == "foo"
    assert m(S(["foo", 42], dtype=object), "concat_newline") == "foo"
    assert m(S(["foo", 42], dtype=object), "concat_raw") == "foo"
    # Sum/Max/Min reject strings and bools (initial_values)
    assert m(S(["foo", 21, 21], dtype=object), "sum") == 42
    assert m(S([True, 41, 42], dtype=object), "max") == 42
    assert m(S(["foo"], dtype=object), "sum") is None
    # LongestArray/ShortestArray reject scalars (initial_values)
    assert m(S(["foo", [1, 2]], dtype=object), "longest_array") == [1, 2]
    assert m(S([42, [7]], dtype=object), "shortest_array") == [7]
