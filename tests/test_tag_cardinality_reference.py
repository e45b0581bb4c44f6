"""Port of the reference's tag_cardinality_limit test matrix
(src/transforms/tag_cardinality_limit/tests.rs:110-594) against the
sequential parity limiter, plus the distributed two-phase path where
semantics coincide (drop_tag has no cross-tag coupling)."""

import pyarrow as pa
import pytest

from vector_ray.stages.tag_cardinality import (
    SequentialTagLimiter,
    tag_cardinality_limit,
    tag_cardinality_limit_sequential,
)

MODES = ["exact", "probabilistic"]  # hashset and bloom variants


def metrics(rows, cols=("tag1", "tag2"), names=None):
    data = {"seq": pa.array(range(len(rows)), pa.int64())}
    if names is not None:
        data["name"] = pa.array(names)
    for i, c in enumerate(cols):
        vals = [r[i] if i < len(r) else None for r in rows]
        if any(isinstance(v, list) for v in vals):
            data[c] = pa.array(vals, type=pa.list_(pa.string()))
        else:
            data[c] = pa.array(vals, type=pa.string())
    return pa.table(data)


@pytest.mark.parametrize("mode", MODES)
def test_drop_event(mode):
    """tests.rs drop_event:119-160 — value_limit 2, third value
    rejects the whole event."""
    t = metrics([("val1",), ("val2",), ("val3",)], cols=("tag1",))
    lim = SequentialTagLimiter(["tag1"], 2, "drop_event", mode)
    out = lim(t)
    assert out["tag1"].to_pylist() == ["val1", "val2"]


@pytest.mark.parametrize("mode", MODES)
def test_drop_tag(mode):
    """tests.rs drop_tag:171-229 — third event keeps tag2 but tag1 is
    removed (nulled in the columnar projection)."""
    t = metrics([("val1", "val1"), ("val2", "val1"), ("val3", "val1")])
    lim = SequentialTagLimiter(["tag1", "tag2"], 2, "drop_tag", mode)
    out = lim(t)
    assert out.num_rows == 3
    assert out["tag1"].to_pylist() == ["val1", "val2", None]
    assert out["tag2"].to_pylist() == ["val1", "val1", "val1"]


@pytest.mark.parametrize("mode", MODES)
def test_drop_tag_multi_value(mode):
    """tests.rs drop_tag_multi_value:239-310 — each multi-value set is
    ONE distinct value; the third distinct set drops the tag."""
    t = metrics(
        [(["val1.a", "val1.b"],), (["val1.a", "val1.c"],), (["val1.b", "val1.c"],)],
        cols=("tag1",),
    )
    lim = SequentialTagLimiter(["tag1"], 2, "drop_tag", mode)
    out = lim(t)
    assert out["tag1"].to_pylist() == [
        ["val1.a", "val1.b"], ["val1.a", "val1.c"], None,
    ]


@pytest.mark.parametrize("mode", MODES)
def test_separate_value_limit_per_tag(mode):
    """tests.rs separate_value_limit_per_tag:324-374 — tag1 hitting its
    limit doesn't consume tag2's slots."""
    t = metrics([("val1", "val1"), ("val2", "val1"), ("val1", "val2")])
    lim = SequentialTagLimiter(["tag1", "tag2"], 2, "drop_event", mode)
    out = lim(t)
    assert out.num_rows == 3  # all three accepted


@pytest.mark.parametrize("swap", [False, True])
def test_drop_event_checks_all_tags(swap):
    """tests.rs drop_event_checks_all_tags:376-406 — a DROPPED event's
    other tag values must not be recorded, independent of tag order."""
    rows = [("val1", "val1"), ("val2", "val1"), ("val3", "val2"), ("val1", "val3")]
    if swap:
        rows = [(b, a) for a, b in rows]
    t = metrics(rows)
    lim = SequentialTagLimiter(["tag1", "tag2"], 2, "drop_event", "exact")
    out = lim(t)
    # event3 dropped (3rd value for one tag); event4 accepted because
    # event3's new value for the OTHER tag was never recorded
    assert out["seq"].to_pylist() == [0, 1, 3]


@pytest.mark.parametrize("mode", MODES)
def test_separate_value_limit_per_metric_name(mode):
    """tests.rs separate_value_limit_per_metric_name:459-594 — metricA
    limit 1, metricB limit 5, metricC (unconfigured) global limit 2."""
    rows = [
        ("val1", "val1"), ("val2", "val1"), ("val1", "val2"),  # metricA
        ("val1", "val1"), ("val2", "val1"), ("val1", "val2"),  # metricB
        ("val1", "val1"), ("val2", "val2"), ("val1", "val3"),  # metricC
    ]
    names = ["metricA"] * 3 + ["metricB"] * 3 + ["metricC"] * 3
    t = metrics(rows, names=names)
    lim = SequentialTagLimiter(
        ["tag1", "tag2"], 2, "drop_tag", mode,
        per_metric_limits={
            "metricA": {"value_limit": 1},
            "metricB": {"value_limit": 5},
        },
        metric_name_col="name",
    )
    out = lim(t)
    a1, a2, a3, b1, b2, b3, c1, c2, c3 = (
        (out["tag1"][i].as_py(), out["tag2"][i].as_py()) for i in range(9)
    )
    # metricA limit 1: a2 loses tag1 (2nd value), a3 loses tag2
    assert a1 == ("val1", "val1")
    assert a2 == (None, "val1")
    assert a3 == ("val1", None)
    # metricB limit 5: everything kept
    assert [b1, b2, b3] == [("val1", "val1"), ("val2", "val1"), ("val1", "val2")]
    # metricC global limit 2: c3's tag2 val3 is the 3rd distinct value
    assert [c1, c2] == [("val1", "val1"), ("val2", "val2")]
    assert c3 == ("val1", None)


# ------------------------- dataset-level drives (Ray) -------------------


def test_sequential_dataset_matches_limiter(ray_session):
    import ray.data as rd

    t = metrics([("val1", "val1"), ("val2", "val1"), ("val3", "val2"),
                 ("val1", "val3")])
    ds = rd.from_arrow(t)
    out = tag_cardinality_limit_sequential(
        ds, ["tag1", "tag2"], 2, "seq", "drop_event", "exact"
    ).to_pandas()
    assert out["seq"].tolist() == [0, 1, 3]


def test_distributed_drop_tag_multi_value(ray_session):
    """Distributed two-phase path handles list-typed (multi-value) tag
    columns via the joined membership key."""
    import ray.data as rd

    t = metrics(
        [(["val1.a", "val1.b"],), (["val1.a", "val1.c"],),
         (["val1.b", "val1.c"],)],
        cols=("tag1",),
    )
    out_ds = tag_cardinality_limit(
        rd.from_arrow(t), ["tag1"], 2, "seq", "drop_tag"
    )
    out = pa.concat_tables(
        b for b in out_ds.iter_batches(batch_format="pyarrow")
    ).sort_by("seq")
    assert out["tag1"].to_pylist() == [
        ["val1.a", "val1.b"], ["val1.a", "val1.c"], None,
    ]


def test_config_sequential_and_per_metric(ray_session):
    from vector_ray.topology import build

    rows = [
        {"seq": 0, "name": "metricA", "tag1": "v1"},
        {"seq": 1, "name": "metricA", "tag1": "v2"},
        {"seq": 2, "name": "other", "tag1": "v1"},
        {"seq": 3, "name": "other", "tag1": "v2"},
        {"seq": 4, "name": "other", "tag1": "v3"},
    ]
    cfg = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "lim": {
                "type": "tag_cardinality_limit", "inputs": ["in"],
                "tag_columns": ["tag1"], "value_limit": 2,
                "order_by": "seq", "limit_exceeded_action": "drop_tag",
                "per_metric": {"metricA": {"value_limit": 1}},
                "metric_name_col": "name",
            }
        },
        "sinks": {"out": {"type": "parquet", "inputs": ["lim"]}},
    }
    out = build(cfg)["out"].to_pandas().sort_values("seq")
    assert out["tag1"].tolist()[:2] == ["v1", None]       # metricA limit 1
    assert out["tag1"].tolist()[2:4] == ["v1", "v2"]      # global limit 2
    assert out["tag1"].tolist()[4] is None
