"""metric_to_log typed-payload parity — ports of the reference's
transform_counter / gauge / set / distribution / histogram / summary
tests (src/transforms/metric_to_log.rs:419-676).

The reference flattens each metric's typed payload into log fields
named ``counter.value``, ``set.values[i]``,
``distribution.samples[i].{value,rate}``,
``aggregated_histogram.buckets[i].{upper_limit,count}`` (+count/sum),
``aggregated_summary.quantiles[i].{quantile,value}`` (+count/sum); tags
unpack to ``tags.<k>`` with the configured host tag promoted to
``host``.  The columnar restatement emits those exact names as columns
(list<struct> for repeated payloads — the [i] index is the list
position).
"""

import pandas as pd
import pyarrow as pa
import pytest

from vector_ray.stages.log_to_metric import metric_to_log_typed


def _row(value_type, **extra):
    base = {
        "name": extra.pop("name"),
        "namespace": "",
        "tags": extra.pop("tags", ""),
        "kind": "absolute",
        "value_type": value_type,
        "value": extra.pop("value", None),
        "ts": pd.Timestamp("2018-11-14T08:09:10.000000011Z").tz_localize(None),
    }
    base.update(extra)
    return base


def _transform(rows, **kw):
    import ray.data as rd

    tbl = pa.Table.from_pylist(rows)
    out = metric_to_log_typed(rd.from_arrow(tbl), **kw).to_pandas()
    return out


def test_transform_counter(ray_session):
    out = _transform(
        [_row("counter", name="counter", value=1.0,
              tags="host=localhost,some_tag=some_value")],
        host_tag="host",
    )
    r = out.iloc[0]
    assert r["counter.value"] == 1.0
    assert r["host"] == "localhost"
    assert r["tags.some_tag"] == "some_value"
    assert r["kind"] == "absolute"
    assert r["name"] == "counter"
    assert str(r["timestamp"]).startswith("2018-11-14 08:09:10")
    assert "gauge.value" not in out.columns


def test_transform_gauge(ray_session):
    out = _transform([_row("gauge", name="gauge", value=1.0)])
    r = out.iloc[0]
    assert r["gauge.value"] == 1.0
    assert r["kind"] == "absolute" and r["name"] == "gauge"


def test_transform_set(ray_session):
    out = _transform(
        [dict(_row("set", name="set"), set_values=["one", "two"])]
    )
    r = out.iloc[0]
    assert list(r["set.values"]) == ["one", "two"]
    assert r["name"] == "set"


def test_transform_distribution(ray_session):
    rows = [dict(
        _row("distribution", name="distro"),
        samples=[{"value": 1.0, "rate": 10}, {"value": 2.0, "rate": 20}],
        statistic="histogram",
    )]
    out = _transform(rows)
    r = out.iloc[0]
    samples = [dict(s) for s in r["distribution.samples"]]
    assert samples == [{"value": 1.0, "rate": 10}, {"value": 2.0, "rate": 20}]
    assert r["distribution.statistic"] == "histogram"


def test_transform_histogram(ray_session):
    rows = [dict(
        _row("histogram", name="histo"),
        buckets=[{"upper_limit": 1.0, "count": 10},
                 {"upper_limit": 2.0, "count": 20}],
        count=30,
        sum=50.0,
    )]
    out = _transform(rows)
    r = out.iloc[0]
    buckets = [dict(b) for b in r["aggregated_histogram.buckets"]]
    assert buckets == [{"upper_limit": 1.0, "count": 10},
                       {"upper_limit": 2.0, "count": 20}]
    assert r["aggregated_histogram.count"] == 30
    assert r["aggregated_histogram.sum"] == 50.0


def test_transform_summary(ray_session):
    rows = [dict(
        _row("summary", name="summary"),
        quantiles=[{"quantile": 50.0, "value": 10.0},
                   {"quantile": 90.0, "value": 20.0}],
        count=30,
        sum=50.0,
    )]
    out = _transform(rows)
    r = out.iloc[0]
    qs = [dict(q) for q in r["aggregated_summary.quantiles"]]
    assert qs == [{"quantile": 50.0, "value": 10.0},
                  {"quantile": 90.0, "value": 20.0}]
    assert r["aggregated_summary.count"] == 30
    assert r["aggregated_summary.sum"] == 50.0


def test_mixed_batch_nulls(ray_session):
    """Counter and gauge in one stream: each typed column is null on
    the other's rows — the columnar union of the reference's per-event
    field sets."""
    out = _transform([
        _row("counter", name="c", value=2.0),
        _row("gauge", name="g", value=3.0),
    ])
    out = out.sort_values("name").reset_index(drop=True)
    assert out.loc[0, "counter.value"] == 2.0
    assert pd.isna(out.loc[0, "gauge.value"])
    assert pd.isna(out.loc[1, "counter.value"])
    assert out.loc[1, "gauge.value"] == 3.0


def test_tags_unpack_without_host_promotion(ray_session):
    out = _transform(
        [_row("counter", name="c", value=1.0,
              tags="host=localhost,region=eu")],
    )
    r = out.iloc[0]
    # no host_tag configured: host stays inside tags.*
    assert r["tags.host"] == "localhost"
    assert r["tags.region"] == "eu"
    assert "host" not in out.columns
