"""log_to_metric tag-rendering parity — ports of the reference tag test
matrix (src/transforms/log_to_metric.rs: count_http_requests_with_tags,
_with_tags_expansion, _with_colliding_dynamic_tags, multi_value_tags_*).
"""

import pyarrow as pa
import ray.data as rd

from vector_ray.stages import log_to_metric


def _tags(rows, tags_spec):
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = log_to_metric(
        ds, [{"type": "counter", "field": "message", "name": "m", "tags": tags_spec}]
    ).take_all()
    return [r["tags"] for r in out]


# count_http_requests_with_tags: tag whose template misses a column is
# dropped; rendered tags survive
def test_missing_column_tag_dropped(ray_session):
    got = _tags(
        [{"message": "l", "code": "200"}],
        {"status": "{{code}}", "host": "{{hostname}}"},
    )
    assert got == ["status=200"]


# per-row null render → tag dropped for that row only (render_tags skip)
def test_per_row_null_drops_single_tag(ray_session):
    got = _tags(
        [
            {"message": "a", "code": "200", "env": "prod"},
            {"message": "b", "code": None, "env": "dev"},
        ],
        {"status": "{{code}}", "env": "{{env}}"},
    )
    assert sorted(got) == ["env=dev", "env=prod,status=200"]


# count_http_requests_with_tags_expansion: "*" expands a map field
def test_star_expansion(ray_session):
    got = _tags(
        [{"message": "l", "dict": {"one": "foo", "two": "baz"}}],
        {"*": "{{ dict }}"},
    )
    assert got == ["one=foo,two=baz"]


# expansion skips per-row-null struct fields
def test_star_expansion_null_field_skipped(ray_session):
    got = _tags(
        [
            {"message": "a", "dict": {"one": "foo", "two": None}},
            {"message": "b", "dict": {"one": None, "two": "baz"}},
        ],
        {"*": "{{ dict }}"},
    )
    assert sorted(got) == ["one=foo", "two=baz"]


# count_http_requests_with_colliding_dynamic_tags: a prefixed expansion
# colliding with a bare expansion keeps BOTH values (multi-value set)
def test_colliding_dynamic_tags_both_kept(ray_session):
    got = _tags(
        [{"message": "l", "map1": {"key1": "val1"}, "map2": {"l1_key1": "val2"}}],
        {"l1_*": "{{ map1 }}", "*": "{{ map2 }}"},
    )
    assert got == ["l1_key1=val1,l1_key1=val2"]


# multi_value_tags_yaml: list config → multi-value tag; literal null is
# a BARE tag (key with no value)
def test_multi_value_tags_with_bare(ray_session):
    got = _tags([{"message": "l"}], {"tag": ["one", None, "two"]})
    assert got == ["tag=one,tag,tag=two"]


# multi_value_tags_expansion analog: literal templates mix with columns
def test_multi_value_tags_templates(ray_session):
    got = _tags(
        [{"message": "l", "a": "x"}, {"message": "m", "a": None}],
        {"tag": ["{{a}}", "lit"]},
    )
    assert sorted(got) == ["tag=lit", "tag=x,tag=lit"]

# count_absolute (log_to_metric.rs): per-spec kind override on a counter
def test_counter_kind_override(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist([{"amount": "33.99"}]))
    out = log_to_metric(
        ds,
        [{"type": "counter", "field": "amount", "name": "amount_total",
          "increment_by_value": True, "kind": "absolute"}],
    ).take_all()
    assert len(out) == 1
    assert out[0]["kind"] == "absolute" and out[0]["value"] == 33.99


# parse_failure: non-numeric increment_by_value emits nothing for that row
def test_parse_failure_skips_row(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"status": "not a number"}, {"status": "42"}]
    ))
    out = log_to_metric(
        ds,
        [{"type": "counter", "field": "status", "name": "status_total",
          "increment_by_value": True}],
    ).take_all()
    assert len(out) == 1 and out[0]["value"] == 42.0
