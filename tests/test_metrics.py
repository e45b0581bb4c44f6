"""log_to_metric / aggregate / incremental_to_absolute /
tag_cardinality_limit / metric_to_log semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages import (
    aggregate,
    incremental_to_absolute,
    log_to_metric,
    metric_to_log,
    tag_cardinality_limit,
)


def log_table():
    n = 12
    i = np.arange(n)
    return pa.table(
        {
            "status": pa.array((200 + (i % 3) * 100).astype(np.int64)),
            "duration_ms": pa.array(i.astype(np.float64) * 2),
            "host": pa.array([f"h{k % 2}" for k in i]),
            "ts": pa.array(i * 1_000_000).cast(pa.timestamp("us")),
        }
    )


def test_log_to_metric_counter_and_gauge():
    ds = rd.from_arrow(log_table())
    out = log_to_metric(
        ds,
        [
            {"type": "counter", "field": "status", "name": "status_total", "tags": {"status": "{{status}}"}},
            {"type": "gauge", "field": "duration_ms", "name": "dur", "tags": {"host": "{{host}}"}},
        ],
        ts_field="ts",
    )
    rows = out.take_all()
    counters = [r for r in rows if r["name"] == "status_total"]
    gauges = [r for r in rows if r["name"] == "dur"]
    assert len(counters) == 12 and len(gauges) == 12
    assert all(r["value"] == 1.0 for r in counters)
    assert all(r["kind"] == "incremental" for r in counters)
    assert all(r["kind"] == "absolute" for r in gauges)
    assert {r["tags"] for r in counters} == {"status=200", "status=300", "status=400"}
    assert {r["tags"] for r in gauges} == {"host=h0", "host=h1"}


def test_log_to_metric_increment_by_value_and_canonical_tags():
    ds = rd.from_arrow(log_table())
    out = log_to_metric(
        ds,
        [
            {
                "type": "counter",
                "field": "duration_ms",
                "name": "dur_sum",
                "increment_by_value": True,
                "tags": {"z": "fixed", "a": "{{host}}"},  # keys sort a,z
            }
        ],
        ts_field="ts",
    )
    rows = out.take_all()
    assert rows[0]["tags"].startswith("a=h")
    assert all(",z=fixed" in r["tags"] for r in rows)
    assert sum(r["value"] for r in rows) == sum(float(i * 2) for i in range(12))


def metric_table():
    # 2 series × 6 points, windows of 10s
    rows = []
    for s, kind in (("cpu", "incremental"), ("mem", "absolute")):
        for j in range(6):
            rows.append(
                {
                    "name": s,
                    "namespace": "app",
                    "tags": "host=h0",
                    "kind": kind,
                    "value_type": "counter" if kind == "incremental" else "gauge",
                    "value": float(j + 1),
                    "ts": j * 5_000_000,  # 5s apart → 2 windows of 10s (j=0,1 | 2,3 | 4,5)
                }
            )
    t = pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]})
    return t.set_column(t.column_names.index("ts"), "ts", t["ts"].cast(pa.timestamp("us")))


def test_aggregate_sum_mode():
    out = aggregate(rd.from_arrow(metric_table()), mode="sum", interval_ms=10_000)
    rows = {(r["name"], str(r["window_start"])): r for r in out.take_all()}
    assert len(rows) == 6  # 2 series × 3 windows
    cpu0 = [r for (n, _), r in rows.items() if n == "cpu"]
    assert sorted(r["value"] for r in cpu0) == [3.0, 7.0, 11.0]
    assert all(r["count"] == 2 for r in rows.values())


def test_aggregate_auto_mode():
    out = aggregate(rd.from_arrow(metric_table()), mode="auto", interval_ms=10_000)
    rows = out.take_all()
    cpu = sorted(r["value"] for r in rows if r["name"] == "cpu")
    mem = sorted(r["value"] for r in rows if r["name"] == "mem")
    assert cpu == [3.0, 7.0, 11.0]  # incremental → sum
    assert mem == [2.0, 4.0, 6.0]  # absolute → latest


def test_aggregate_stdev_and_mean():
    out = aggregate(rd.from_arrow(metric_table()), mode="mean", interval_ms=30_000)
    rows = {r["name"]: r for r in out.take_all()}
    assert rows["cpu"]["value"] == 3.5
    out2 = aggregate(rd.from_arrow(metric_table()), mode="stdev", interval_ms=30_000)
    rows2 = {r["name"]: r for r in out2.take_all()}
    # POPULATION stdev (aggregate.rs absolute_stdev parity)
    assert abs(rows2["cpu"]["value"] - np.std([1, 2, 3, 4, 5, 6], ddof=0)) < 1e-9


def test_aggregate_diff_mode():
    out = aggregate(rd.from_arrow(metric_table()), mode="diff", interval_ms=10_000)
    rows = [r for r in out.take_all() if r["name"] == "mem"]
    assert sorted(r["value"] for r in rows) == [2.0, 2.0]  # 4-2, 6-4


def test_incremental_to_absolute():
    out = incremental_to_absolute(rd.from_arrow(metric_table()))
    cpu = sorted(
        (str(r["ts"]), r["value"]) for r in out.take_all() if r["name"] == "cpu"
    )
    assert [v for _, v in cpu] == [1.0, 3.0, 6.0, 10.0, 15.0, 21.0]
    assert all(r["kind"] == "absolute" for r in out.take_all())


def test_tag_cardinality_drop_event():
    t = pa.table(
        {
            "tag_user": pa.array([f"u{i}" for i in [0, 1, 2, 0, 3, 1]]),
            "seq": pa.array([0, 1, 2, 3, 4, 5]),
        }
    )
    out = tag_cardinality_limit(
        rd.from_arrow(t), ["tag_user"], value_limit=2, order_by="seq", limit_exceeded_action="drop_event"
    )
    rows = sorted(r["seq"] for r in out.take_all())
    assert rows == [0, 1, 3, 5]  # u0,u1 accepted (first two); u2,u3 dropped


def test_tag_cardinality_drop_tag():
    t = pa.table(
        {
            "tag_user": pa.array([f"u{i}" for i in [0, 1, 2, 0]]),
            "seq": pa.array([0, 1, 2, 3]),
        }
    )
    out = tag_cardinality_limit(
        rd.from_arrow(t), ["tag_user"], value_limit=2, order_by="seq", limit_exceeded_action="drop_tag"
    )
    rows = {r["seq"]: r["tag_user"] for r in out.take_all()}
    assert rows == {0: "u0", 1: "u1", 2: None, 3: "u0"}


def test_metric_to_log():
    out = metric_to_log(rd.from_arrow(metric_table()))
    r = out.take(1)[0]
    assert set(r) >= {"message", "metric_name", "value", "timestamp"}
    assert r["message"] == "cpu=1"  # Arrow float→string renders 1.0 as "1"


def test_distribution_payload_roundtrip(ray_session):
    """histogram spec → single-sample distributions → merged long form →
    aggregated histogram buckets and nested sink payload."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages import log_to_metric
    from vector_ray.stages.metric_payload import (
        aggregated_histogram,
        aggregated_summary,
        distribution_agg,
        nest_samples,
    )

    ts = pa.array(np.arange(8) * 1_000_000, type=pa.timestamp("us"))
    t = pa.table({
        "svc": pa.array(["a"] * 4 + ["b"] * 4),
        "lat": pa.array([10.0, 10.0, 30.0, 90.0, 5.0, 5.0, 5.0, 200.0]),
        "ts": ts,
    })
    ds = rd.from_arrow(t)
    m = log_to_metric(
        ds, [{"type": "histogram", "field": "lat", "name": "lat_h",
              "tags": {"svc": "{{svc}}"}}], ts_field="ts")
    long = distribution_agg(m, interval_ms=3_600_000).to_pandas()
    a = long[long.tags == "svc=a"].set_index("sample_value")["sample_rate"]
    assert a.to_dict() == {10.0: 2, 30.0: 1, 90.0: 1}

    hist = aggregated_histogram(
        distribution_agg(m, interval_ms=3_600_000), limits=[25.0, 100.0]
    ).to_pandas()
    ha = hist[hist.tags == "svc=a"].set_index("bucket_upper")["bucket_count"]
    assert ha.to_dict() == {25.0: 2, 100.0: 2}
    hb = hist[hist.tags == "svc=b"].set_index("bucket_upper")["bucket_count"]
    assert hb.to_dict() == {25.0: 3, float("inf"): 1}
    assert (hist[hist.tags == "svc=b"]["count"] == 4).all()

    summ = aggregated_summary(
        distribution_agg(m, interval_ms=3_600_000), quantiles=(0.5,)
    ).to_pandas()
    assert summ[summ.tags == "svc=b"]["qvalue"].iloc[0] == 5.0

    nested = nest_samples(distribution_agg(m, interval_ms=3_600_000)).to_pandas()
    row = nested[nested.tags == "svc=a"].iloc[0]
    got = {d["value"]: d["rate"] for d in row["samples"]}
    assert got == {10.0: 2, 30.0: 1, 90.0: 1}


def test_ddsketch_quantile_accuracy(ray_session):
    """Quantile estimates from the sketch must be within the relative
    accuracy bound alpha of the exact quantiles."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages import log_to_metric
    from vector_ray.stages.sketch import ddsketch_agg, ddsketch_quantile

    rng = np.random.default_rng(3)
    vals = rng.lognormal(3.0, 1.0, size=20_000)
    ts = pa.array(np.arange(len(vals)) * 1_000, type=pa.timestamp("us"))
    t = pa.table({"svc": pa.array(["a"] * len(vals)), "lat": pa.array(vals), "ts": ts})
    m = log_to_metric(
        rd.from_arrow(t),
        [{"type": "distribution", "field": "lat", "name": "lat_sk",
          "tags": {"svc": "{{svc}}"}}],
        ts_field="ts",
    )
    alpha = 0.01
    sk = ddsketch_agg(m, interval_ms=10**9, alpha=alpha)
    out = ddsketch_quantile(sk, quantiles=(0.5, 0.9, 0.99), alpha=alpha).to_pandas()
    for q in (0.5, 0.9, 0.99):
        est = out[out["quantile"] == q]["qvalue"].iloc[0]
        exact = np.quantile(vals, q)
        assert abs(est - exact) / exact <= alpha * 1.5, (q, est, exact)
    assert (out["count"] == len(vals)).all()


def test_topk_per_group(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.topk import topk_per_group

    t = pa.table({
        "g": pa.array(["x"] * 5 + ["y"] * 5),
        "eid": pa.array(list(range(10)), type=pa.int64()),
        "v": pa.array([1.0, 9.0, 3.0, 9.0, 2.0, 5.0, 4.0, 8.0, 7.0, 6.0]),
    })
    out = topk_per_group(rd.from_arrow(t), ["g"], "v", k=2, tie_col="eid").to_pandas()
    x = out[out.g == "x"].sort_values("eid")
    assert x["eid"].tolist() == [1, 3]  # both 9.0, tie by eid
    y = out[out.g == "y"]
    assert sorted(y["v"]) == [7.0, 8.0]


def test_aggregate_reference_mode_matrix(ray_session):
    """Ported from src/transforms/aggregate.rs inline tests
    (incremental_auto/absolute_auto/sum/count/mean/min/max/stdev):
    series a records 42, 43 (incremental) and b records 44; the
    absolute_stdev fixture 25..55 step 5 must give EXACTLY 10.0
    (population stdev, aggregate.rs:296-313)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate

    def table(values, kinds, names):
        n = len(values)
        return pa.table({
            "name": pa.array(names),
            "namespace": pa.array([""] * n),
            "tags": pa.array([""] * n),
            "kind": pa.array(kinds),
            "value": pa.array([float(v) for v in values]),
            "ts": pa.array(list(range(n)), type=pa.int64()).cast(pa.timestamp("us")),
        })

    t = table([42, 43, 44], ["incremental"] * 3, ["a", "a", "b"])
    win = 10**9

    def run(mode, tbl=t):
        out = aggregate(rd.from_arrow(tbl), mode=mode, interval_ms=win).to_pandas()
        return dict(zip(out["name"], out["value"]))

    # incremental auto → sum; separate series stay separate
    assert run("auto") == {"a": 85.0, "b": 44.0}
    assert run("sum") == {"a": 85.0, "b": 44.0}
    assert run("count") == {"a": 2.0, "b": 1.0}
    assert run("mean") == {"a": 42.5, "b": 44.0}
    assert run("min") == {"a": 42.0, "b": 44.0}
    assert run("max") == {"a": 43.0, "b": 44.0}

    # absolute auto → latest
    t_abs = table([42, 43, 44], ["absolute"] * 3, ["a", "a", "b"])
    assert run("auto", t_abs) == {"a": 43.0, "b": 44.0}
    assert run("latest", t_abs) == {"a": 43.0, "b": 44.0}

    # absolute_stdev fixture: exactly 10.0 (population)
    t_sd = table([25, 30, 35, 40, 45, 50, 55], ["absolute"] * 7, ["a"] * 7)
    got = run("stdev", t_sd)
    assert got == {"a": 10.0}


def test_incremental_to_absolute_reference_matrix(ray_session):
    """Port of incremental_to_absolute.rs:139-230: repeated incremental
    counters accumulate (10, 20, 30); absolute gauges and counters pass
    through unchanged; an absolute row RESETS the series' running state
    (MetricSet::make_absolute semantics)."""
    import ray.data as rd

    rows = []

    def m(name, kind, value, ts):
        rows.append({"name": name, "namespace": "", "tags": "",
                     "kind": kind, "value": float(value), "ts": ts})

    m("incremental_counter", "incremental", 10.0, 1)
    m("incremental_counter", "incremental", 10.0, 2)
    m("incremental_counter", "incremental", 10.0, 3)
    m("gauge", "absolute", 42.0, 1)
    m("absolute_counter", "absolute", 42.0, 1)
    # reset semantics: absolute mid-stream restarts the running sum
    m("mixed", "incremental", 10.0, 1)
    m("mixed", "absolute", 100.0, 2)
    m("mixed", "incremental", 10.0, 3)

    out = incremental_to_absolute(
        rd.from_arrow(pa.Table.from_pylist(rows))
    ).to_pandas().sort_values(["name", "ts"])
    assert (out["kind"] == "absolute").all()
    got = {(r["name"], r["ts"]): r["value"] for _, r in out.iterrows()}
    assert [got[("incremental_counter", t)] for t in (1, 2, 3)] == [10.0, 20.0, 30.0]
    assert got[("gauge", 1)] == 42.0
    assert got[("absolute_counter", 1)] == 42.0
    assert [got[("mixed", t)] for t in (1, 2, 3)] == [10.0, 100.0, 110.0]


def test_aggregate_sequenced_conflicting_kinds(ray_session):
    """Port of aggregate.rs conflicting_kinds: a kind flip REPLACES the
    accumulated state.  inc,inc,abs,abs → the last absolute; abs,abs,
    inc,inc → the incrementals summed (emitted with the last kind)."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate_sequenced

    def table(seq):
        n = len(seq)
        return pa.table({
            "name": pa.array(["a"] * n),
            "namespace": pa.array([""] * n),
            "tags": pa.array([""] * n),
            "kind": pa.array([k for k, _ in seq]),
            "value": pa.array([float(v) for _, v in seq]),
            "ts": pa.array(list(range(n)), type=pa.int64()).cast(pa.timestamp("us")),
        })

    win = 10**9

    # inc 42, inc 42, abs 43, abs 43 → flush the absolute 43
    t = table([("incremental", 42), ("incremental", 42),
               ("absolute", 43), ("absolute", 43)])
    out = aggregate_sequenced(rd.from_arrow(t), interval_ms=win).take_all()
    assert len(out) == 1
    assert out[0]["kind"] == "absolute" and out[0]["value"] == 43.0

    # abs, abs, inc, inc → the two incrementals sum (replace on flip)
    t = table([("absolute", 43), ("absolute", 43),
               ("incremental", 42), ("incremental", 42)])
    out = aggregate_sequenced(rd.from_arrow(t), interval_ms=win).take_all()
    assert len(out) == 1
    assert out[0]["kind"] == "incremental" and out[0]["value"] == 84.0

    # uniform-kind series match plain auto; separate series independent
    t = table([("incremental", 1), ("incremental", 2)])
    t2 = pa.concat_tables([t, pa.table({
        "name": ["b"], "namespace": [""], "tags": [""],
        "kind": ["absolute"], "value": [7.0],
        "ts": pa.array([5], type=pa.int64()).cast(pa.timestamp("us")),
    })])
    out = {r["name"]: r for r in
           aggregate_sequenced(rd.from_arrow(t2), interval_ms=win).take_all()}
    assert out["a"]["value"] == 3.0 and out["a"]["kind"] == "incremental"
    assert out["b"]["value"] == 7.0 and out["b"]["kind"] == "absolute"


def test_aggregate_sequenced_null_series_key(ray_session):
    """Null series keys (namespace/tags None) must not vanish
    (dropna=False on the fold groupbys)."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate_sequenced

    t = pa.table({
        "name": ["a", "a"],
        "namespace": pa.array([None, None], type=pa.string()),
        "tags": pa.array([None, None], type=pa.string()),
        "kind": ["incremental", "incremental"],
        "value": [1.0, 2.0],
        "ts": pa.array([1, 2], type=pa.int64()).cast(pa.timestamp("us")),
    })
    out = aggregate_sequenced(rd.from_arrow(t), interval_ms=10**9).take_all()
    assert len(out) == 1 and out[0]["value"] == 3.0


def test_aggregate_sequenced_conflicting_value_type(ray_session):
    """Port of aggregate.rs conflicting_value_type: a value-type flip
    (counter → gauge) replaces accumulated state like a kind flip."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate_sequenced

    t = pa.table({
        "name": ["a"] * 4,
        "namespace": [""] * 4,
        "tags": [""] * 4,
        "kind": ["incremental"] * 4,
        "value_type": ["counter", "counter", "gauge", "gauge"],
        "value": [1.0, 2.0, 5.0, 7.0],
        "ts": pa.array([1, 2, 3, 4], type=pa.int64()).cast(pa.timestamp("us")),
    })
    out = aggregate_sequenced(rd.from_arrow(t), interval_ms=10**9).take_all()
    # the gauge segment replaces the counter sum; incremental gauges sum
    assert len(out) == 1
    assert out[0]["value_type"] == "gauge" and out[0]["value"] == 12.0


def test_incremental_to_absolute_null_series_key():
    """dropna regression (ADVICE r4): a null namespace must still form a
    series group — values accumulate, not NaN."""
    t = pa.table({
        "name": ["c", "c", "c"],
        "namespace": pa.array([None, None, None], type=pa.string()),
        "tags": ["", "", ""],
        "kind": ["incremental"] * 3,
        "value": [1.0, 2.0, 3.0],
        "ts": pa.array([0, 1, 2], type=pa.int64()).cast(pa.timestamp("us")),
    })
    out = incremental_to_absolute(rd.from_arrow(t))
    vals = sorted(r["value"] for r in out.take_all())
    assert vals == [1.0, 3.0, 6.0]
