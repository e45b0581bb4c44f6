"""dedupe / sample / throttle matrices — semantics from the reference's
inline tests (dedupe/config.rs:344,:425 LRU eviction; sample/tests.rs;
throttle GCRA admission)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages import (
    LRUDedupe,
    dedupe_exact,
    dedupe_windowed,
    sample_count,
    sample_hash,
    throttle,
)


def dup_table():
    return pa.table(
        {
            "message": pa.array(["m1", "m2", "m1", "m3", "m2", "m1"]),
            "host": pa.array(["h", "h", "h", "h", "h", "h"]),
            "seq": pa.array([0, 1, 2, 3, 4, 5]),
        }
    )


def test_dedupe_exact_first_wins():
    out = dedupe_exact(rd.from_arrow(dup_table()), ["message", "host"], order_by="seq")
    rows = sorted((r["message"], r["seq"]) for r in out.take_all())
    assert rows == [("m1", 0), ("m2", 1), ("m3", 3)]


def test_dedupe_exact_null_vs_value():
    t = pa.table(
        {
            "a": pa.array([None, 1, None, 1], type=pa.int64()),
            "seq": pa.array([0, 1, 2, 3]),
        }
    )
    out = dedupe_exact(rd.from_arrow(t), ["a"], order_by="seq")
    assert sorted(r["seq"] for r in out.take_all()) == [0, 1]  # null ≠ 1, null == null


def test_lru_eviction():
    # cache_size=2: key m1 evicted after m2,m3 inserted → m1 passes again
    # (dedupe/config.rs:344 eviction semantics)
    actor = LRUDedupe(["message"], cache_size=2)
    t = pa.table({"message": pa.array(["m1", "m2", "m3", "m1", "m2"])})
    kept = actor(t)["message"].to_pylist()
    # m1 new, m2 new, m3 new (evicts m1), m1 new again (evicts m2), m2 new
    assert kept == ["m1", "m2", "m3", "m1", "m2"]
    actor2 = LRUDedupe(["message"], cache_size=10)
    kept2 = actor2(t)["message"].to_pylist()
    assert kept2 == ["m1", "m2", "m3"]


def test_dedupe_windowed_stream():
    out = dedupe_windowed(rd.from_arrow(dup_table()), ["message"], cache_size=100)
    assert sorted(r["message"] for r in out.take_all()) == ["m1", "m2", "m3"]


def test_sample_hash_rate_deterministic():
    n = 10_000
    t = pa.table({"k": pa.array([f"key-{i}" for i in range(n)])})
    ds = rd.from_arrow(t)
    out1 = sorted(r["k"] for r in sample_hash(ds, "k", rate=10).take_all())
    out2 = sorted(r["k"] for r in sample_hash(ds, "k", rate=10).take_all())
    assert out1 == out2  # consistent
    assert 0.05 * n < len(out1) < 0.15 * n  # ~1/10
    # same key always same decision: duplicate keys sampled identically
    t2 = pa.table({"k": pa.array(["key-1"] * 50 + ["key-2"] * 50)})
    out3 = sample_hash(rd.from_arrow(t2), "k", rate=10).take_all()
    kept_keys = set(r["k"] for r in out3)
    for k in kept_keys:
        assert sum(1 for r in out3 if r["k"] == k) == 50  # all or none


def test_sample_hash_ratio_and_exclude():
    n = 10_000
    t = pa.table(
        {"k": pa.array([f"key-{i}" for i in range(n)]), "lvl": pa.array(["err" if i < 5 else "info" for i in range(n)])}
    )
    out = sample_hash(rd.from_arrow(t), "k", ratio=0.25, exclude=".lvl == 'err'")
    rows = out.take_all()
    assert 0.18 * n < len(rows) < 0.32 * n
    assert sum(1 for r in rows if r["lvl"] == "err") == 5  # exclude bypasses
    # sampled rows are annotated; bypassed rows are NOT
    # (transform.rs:148-158 pushes excluded events before rate logic)
    assert all(r["sample_rate"] == 4.0 for r in rows if r["lvl"] != "err")
    assert all(r["sample_rate"] is None for r in rows if r["lvl"] == "err")


def test_sample_count_per_group():
    t = pa.table(
        {
            "g": pa.array(["a"] * 10 + ["b"] * 10),
            "seq": pa.array(list(range(10)) + list(range(10))),
        }
    )
    out = sample_count(rd.from_arrow(t), rate=5, group_by="g", order_by="seq")
    rows = sorted((r["g"], r["seq"]) for r in out.take_all())
    assert rows == [("a", 0), ("a", 5), ("b", 0), ("b", 5)]


def test_throttle_per_key_window():
    # 2 keys × 2 windows × 5 events; threshold 2 → 2 kept per (key,window)
    n = 20
    ts = []
    keys = []
    seqs = []
    for k in ("ka", "kb"):
        for w in range(2):
            for j in range(5):
                ts.append((w * 10 + j) * 1_000_000)  # us
                keys.append(k)
                seqs.append(len(seqs))
    t = pa.table(
        {
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "key": pa.array(keys),
            "seq": pa.array(seqs),
        }
    )
    out = throttle(rd.from_arrow(t), threshold=2, window_secs=10, key_field="key", order_by="seq")
    rows = out.take_all()
    assert len(rows) == 8
    # the first 2 of each (key, window) in seq order survive
    kept = sorted(r["seq"] for r in rows)
    assert kept == [0, 1, 5, 6, 10, 11, 15, 16]


def test_throttle_exclude():
    t = pa.table(
        {
            "ts": pa.array([i * 1_000_000 for i in range(6)], type=pa.int64()).cast(pa.timestamp("us")),
            "lvl": pa.array(["err", "info", "info", "info", "err", "info"]),
            "seq": pa.array(list(range(6))),
        }
    )
    out = throttle(
        rd.from_arrow(t), threshold=1, window_secs=100, exclude=".lvl == 'err'", order_by="seq"
    )
    rows = sorted(r["seq"] for r in out.take_all())
    assert rows == [0, 1, 4]  # both errs bypass + first non-err


def test_dedupe_ignore_mode():
    # ignore mode: key = all fields except the listed (and order_by) —
    # dedupe/common.rs `ignore` semantics
    t = pa.table(
        {
            "message": pa.array(["m1", "m1", "m2"]),
            "host": pa.array(["h1", "h1", "h1"]),
            "noise": pa.array(["a", "b", "c"]),  # ignored → first two are dups
            "seq": pa.array([0, 1, 2]),
        }
    )
    out = dedupe_exact(rd.from_arrow(t), ignore=["noise"], order_by="seq")
    assert sorted(r["seq"] for r in out.take_all()) == [0, 2]
    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        dedupe_exact(rd.from_arrow(t), fields=["message"], ignore=["noise"])


def test_dedupe_timed_ttl(ray_session):
    import numpy as np

    from vector_ray.stages.dedupe import dedupe_timed

    ts = pa.array(
        np.array([0, 1_000_000, 5_000_000, 6_000_000, 11_000_000], dtype="int64"),
        type=pa.timestamp("us"),
    )
    t = pa.table({
        "k": pa.array(["a"] * 5),
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "ts": ts,
    })
    # ttl 5s: keep t=0, drop t=1, keep t=5, drop t=6, keep t=11
    out = dedupe_timed(rd.from_arrow(t), ["k"], ttl_ms=5_000).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 5]


def test_line_agg_modes(ray_session):
    from vector_ray.stages.line_agg import line_agg

    lines = ["ERROR boom", "  at foo", "  at bar", "INFO ok", "ERROR two", "  at baz"]
    t = pa.table({
        "message": pa.array(lines),
        "n": pa.array(list(range(len(lines))), type=pa.int64()),
    })
    out = line_agg(
        rd.from_arrow(t), start_pattern=r"^(ERROR|INFO)",
        condition_pattern=r"^\s", mode="continue_through", order_by="n",
    ).to_pandas()
    msgs = sorted(out["message"])
    assert "ERROR boom\n  at foo\n  at bar" in msgs
    assert "ERROR two\n  at baz" in msgs
    assert "INFO ok" in msgs

    # halt_with: aggregate until END marker (inclusive)
    lines2 = ["BEGIN a", "mid", "END", "BEGIN b", "END"]
    t2 = pa.table({"message": pa.array(lines2),
                   "n": pa.array(list(range(5)), type=pa.int64())})
    out2 = line_agg(rd.from_arrow(t2), start_pattern=r"^BEGIN",
                    condition_pattern=r"^END", mode="halt_with", order_by="n").to_pandas()
    assert sorted(out2["message"]) == ["BEGIN a\nmid\nEND", "BEGIN b\nEND"]


def test_unnest_stage(ray_session):
    from vector_ray.stages.unnest import unnest

    t = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "vals": pa.array([[10, 20], [], [30]], type=pa.list_(pa.int64())),
    })
    out = unnest(rd.from_arrow(t), "vals").to_pandas().sort_values(["id", "vals"])
    assert out["id"].tolist() == [1, 1, 3]
    assert out["vals"].tolist() == [10, 20, 30]


def test_sample_rate_accuracy_reference_parity(ray_session):
    """Port of sample/tests.rs hash_samples_at_roughly_the_configured_rate:
    rate-2 hash sampling keeps ~1/2 (±3%), ratio-0.04 keeps ~4% (±3%);
    and hash_consistently_samples_the_same_events: two runs agree."""
    import numpy as np

    from vector_ray.stages import sample_hash

    n = 10_000
    keys = pa.array([f"msg-{i}-{i * 7919 % 104729}" for i in range(n)])
    ds = rd.from_arrow(pa.table({"k": keys, "i": pa.array(range(n), type=pa.int64())}))
    kept = sample_hash(ds, "k", rate=2).to_pandas()
    assert abs(len(kept) / n - 0.5) < 0.03
    kept_ratio = sample_hash(rd.from_arrow(pa.table({"k": keys})), "k", ratio=0.04).to_pandas()
    assert abs(len(kept_ratio) / n - 0.04) < 0.03
    # consistency: the same events sample identically across runs
    again = sample_hash(
        rd.from_arrow(pa.table({"k": keys, "i": pa.array(range(n), type=pa.int64())})),
        "k", rate=2,
    ).to_pandas()
    assert sorted(kept["i"]) == sorted(again["i"])


def test_line_agg_per_aggregate_context(ray_session):
    """ADVICE r2 (low): the 2nd..Nth aggregates must carry their OWN
    first line's non-message columns, not the group head's."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.line_agg import line_agg

    t = pa.table({
        "message": pa.array(["ERROR a", "  at x", "ERROR b", "  at y"]),
        "ts": pa.array([1, 2, 3, 4], type=pa.int64()),
        "host": pa.array(["h1", "h1", "h2", "h2"]),
        "src": pa.array(["s"] * 4),
    })
    out = line_agg(
        rd.from_arrow(t), start_pattern=r"^ERROR", condition_pattern=r"^\s",
        mode="continue_through", group_by=["src"], order_by="ts",
    ).to_pandas().sort_values("ts").reset_index(drop=True)
    assert out["message"].tolist() == ["ERROR a\n  at x", "ERROR b\n  at y"]
    assert out["ts"].tolist() == [1, 3]
    assert out["host"].tolist() == ["h1", "h2"]


# ---- reference-parity ports: src/transforms/sample/tests.rs (round 3) ----

def test_sample_always_passes_exclude_at_rate_zero(ray_session):
    """tests.rs always_passes_events_matching_pass_list: rate 0 (nothing
    passes by hash) + exclude match → every event passes, unannotated."""
    t = pa.table({"k": pa.array([f"i am important {i}" for i in range(100)])})
    out = sample_hash(rd.from_arrow(t), "k", rate=0,
                      exclude="contains(.k, 'important')").to_pandas()
    assert len(out) == 100
    assert out["sample_rate"].isna().all()  # bypassed rows carry no rate


def test_sample_ratio_zero_excluded_pass(ray_session):
    """tests.rs handles_key_field: ratio 0.0 + exclude on other_field."""
    t = pa.table({
        "msg": pa.array(["nananana"] * 50),
        "other_field": pa.array(["foo"] * 50),
    })
    out = sample_hash(rd.from_arrow(t), "msg", ratio=0.0,
                      exclude="contains(.other_field, 'foo')").to_pandas()
    assert len(out) == 50


def test_sample_rate_key_custom_and_omitted(ray_session):
    """tests.rs sampler_adds_sampling_rate_to_event: custom key name,
    empty key omits the column, excluded rows not annotated."""
    t = pa.table({"k": pa.array([f"value {i}" for i in range(2000)])})
    out = sample_hash(rd.from_arrow(t), "k", rate=25,
                      sample_rate_key="custom_sample_rate").to_pandas()
    assert "sample_rate" not in out.columns
    assert (out["custom_sample_rate"] == 25.0).all()

    out2 = sample_hash(rd.from_arrow(t), "k", rate=2,
                       sample_rate_key=None).to_pandas()
    assert "sample_rate" not in out2.columns

    out3 = sample_hash(rd.from_arrow(t), "k", ratio=0.1).to_pandas()
    assert (out3["sample_rate"] == 10.0).all()


def test_sample_count_ratio_exact_retention(ray_session):
    """tests.rs sample_at_rates_higher_then_half: the count-mode ratio
    accumulator keeps EXACTLY n·ratio of n events."""
    n = 10_000
    t = pa.table({
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
    })
    for ratio in (0.8, 0.7, 0.9, 0.672):
        out = sample_count(rd.from_arrow(t), ratio=ratio, order_by="seq")
        assert out.count() == int(n * ratio), ratio


def test_sample_count_global_row_guard(ray_session):
    """VERDICT r2 item 8: global count mode refuses unbounded streams."""
    import vector_ray.stages.sample as sample_mod

    t = pa.table({"v": pa.array(np.arange(100, dtype=np.int64)),
                  "seq": pa.array(np.arange(100, dtype=np.int64))})
    old = sample_mod.GLOBAL_COUNT_ROW_LIMIT
    sample_mod.GLOBAL_COUNT_ROW_LIMIT = 50
    try:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="group_by"):
            sample_count(rd.from_arrow(t), rate=5, order_by="seq")
    finally:
        sample_mod.GLOBAL_COUNT_ROW_LIMIT = old
    # under the limit it still works
    out = sample_count(rd.from_arrow(t), rate=5, order_by="seq")
    assert out.count() == 20
