"""Ports of the reference remap test matrix (src/transforms/remap.rs:670+).

Each test names the reference test it mirrors.  VRL programs are
re-expressed as Remap step lists; per-row fallible ops (int!(), failed
parse) map to parse/assert steps.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages import remap, remap_with_drops


def _rows(out_ds, key=None):
    rows = out_ds.take_all()
    if key:
        rows.sort(key=lambda r: (r.get(key) is None, r.get(key)))
    return rows


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


# check_remap_adds (remap.rs:~865)
def test_remap_adds(ray_session):
    ds = _ds([{"message": "augment me", "copy_from": "buz"}])
    out = remap(
        ds,
        [
            ("set_literal", "foo", "bar"),
            ("set_literal", "bar", "baz"),
            ("set", "copy", lambda b: b["copy_from"]),
        ],
    ).take_all()
    assert out == [
        {"message": "augment me", "copy_from": "buz", "foo": "bar", "bar": "baz", "copy": "buz"}
    ]


# check_remap_doesnt_share_state_between_events (remap.rs:~787)
def test_no_shared_state_between_rows(ray_session):
    ds = _ds([{"message": "event1", "sentinel": "bar"}, {"message": "event2", "sentinel": None}])
    out = _rows(remap(ds, [("set", "foo", lambda b: b["sentinel"])]), key="message")
    assert out[0]["foo"] == "bar"
    assert out[1]["foo"] is None


# check_remap_error: fallible mid-program failure with drop_on_error=false
# forwards the event with ALL program changes rolled back (remap.rs:~920)
def test_error_forwards_rolled_back(ray_session):
    ds = _ds([{"message": "augment me", "bar": "is a string"}, {"message": "ok", "bar": "42"}])
    out = _rows(
        remap(
            ds,
            [
                ("set_literal", "foo", "foo"),
                ("parse_regex", "bar", r"^(?P<not_an_int>\d+)$"),
                ("set_literal", "baz", 12),
            ],
        ),
        key="message",
    )
    bad = next(r for r in out if r["message"] == "augment me")
    good = next(r for r in out if r["message"] == "ok")
    # failed row: original field kept, program changes rolled back
    assert bad["bar"] == "is a string"
    assert bad["foo"] is None and bad["baz"] is None and bad["not_an_int"] is None
    # ok row: full program applied
    assert good == {"message": "ok", "bar": "42", "foo": "foo", "baz": 12, "not_an_int": "42"}


# check_remap_error_drop (remap.rs:~950)
def test_error_drop(ray_session):
    ds = _ds([{"message": "augment me", "bar": "is a string"}])
    out = remap(
        ds,
        [("set_literal", "foo", "foo"), ("parse_regex", "bar", r"^(?P<not_an_int>\d+)$")],
        drop_on_error=True,
    ).take_all()
    assert out == []


# check_remap_error_infallible (remap.rs:~975)
def test_error_infallible(ray_session):
    ds = _ds([{"message": "augment me", "bar": "is a string"}])
    out = remap(ds, [("set_literal", "foo", "foo"), ("set_literal", "baz", 12)]).take_all()
    assert out == [{"message": "augment me", "bar": "is a string", "foo": "foo", "baz": 12}]


# check_remap_abort: abort with drop_on_abort=false forwards rolled back
# (remap.rs:~1000)
def test_abort_forwards_rolled_back(ray_session):
    ds = _ds([{"message": "augment me", "bar": "is a string"}])
    out = remap(
        ds,
        [("set_literal", "foo", "foo"), ("abort", "true"), ("set_literal", "baz", 12)],
    ).take_all()
    assert out == [{"message": "augment me", "bar": "is a string", "foo": None, "baz": None}]


# check_remap_abort_drop (remap.rs:~1030)
def test_abort_drop(ray_session):
    ds = _ds([{"message": "augment me", "bar": "is a string"}])
    out = remap(
        ds,
        [("set_literal", "foo", "foo"), ("abort", "true")],
        drop_on_abort=True,
    ).take_all()
    assert out == []


# drop flags are independent: an abort row survives drop_on_error and
# vice versa (RemapConfig drop_on_error/drop_on_abort are separate fields)
def test_drop_flags_independent(ray_session):
    rows = [
        {"message": "aborts", "bar": "x"},
        {"message": "errors", "bar": "is a string"},
        {"message": "clean", "bar": "7"},
    ]
    steps = [
        ("abort", ".message == 'aborts'"),
        ("parse_regex", "bar", r"^(?P<n>\d+)$"),
    ]
    out = remap(_ds(rows), steps, drop_on_error=True).take_all()
    assert sorted(r["message"] for r in out) == ["aborts", "clean"]
    out = remap(_ds(rows), steps, drop_on_abort=True).take_all()
    assert sorted(r["message"] for r in out) == ["clean", "errors"]


# check_remap_branching (remap.rs:~1167): happy → primary with program
# applied; abort/error → dropped port, rolled back, with
# metadata.dropped.{reason,message,component_id,component_type,component_kind}
def test_branching_reroute_dropped(ray_session):
    rows = [
        {"hello": "world", "n": "1"},
        {"hello": "goodbye", "n": "2"},
        {"hello": "fortytwo", "n": "oops"},
    ]
    steps = [
        ("set_literal", "foo", "bar"),
        ("abort", ".hello == 'goodbye'"),
        ("parse_regex", "n", r"^(?P<n_int>\d+)$"),
    ]
    ok, dropped = remap_with_drops(_ds(rows), steps, component_id="remapper")
    ok_rows = ok.take_all()
    assert len(ok_rows) == 1
    assert ok_rows[0]["hello"] == "world" and ok_rows[0]["foo"] == "bar"

    d = {r["hello"]: r for r in dropped.take_all()}
    assert set(d) == {"goodbye", "fortytwo"}
    for r in d.values():
        # rolled back: program column absent (null)
        assert r["foo"] is None
        assert r["metadata.dropped.component_id"] == "remapper"
        assert r["metadata.dropped.component_type"] == "remap"
        assert r["metadata.dropped.component_kind"] == "transform"
    assert d["goodbye"]["metadata.dropped.reason"] == "abort"
    assert d["goodbye"]["metadata.dropped.message"] == "aborted"
    assert d["fortytwo"]["metadata.dropped.reason"] == "error"
    assert "parse" in d["fortytwo"]["metadata.dropped.message"]


# check_remap_branching_abort_with_message (remap.rs:~1480 analog):
# abort custom message lands in metadata.dropped.message
def test_abort_with_message(ray_session):
    ok, dropped = remap_with_drops(
        _ds([{"hello": "goodbye"}]),
        [("abort", ".hello == 'goodbye'", "custom abort message")],
    )
    d = dropped.take_all()
    assert len(d) == 1 and ok.take_all() == []
    assert d[0]["metadata.dropped.reason"] == "abort"
    assert d[0]["metadata.dropped.message"] == "custom abort message"


# check_remap_branching_assert_with_message (remap.rs:~1420): custom and
# default assert messages, reason "error"
def test_assert_with_message(ray_session):
    rows = [{"hello": 42}, {"hello": 0}]
    steps = [
        ("assert", ".hello == 0", "custom message here"),
        ("assert", ".hello == 1"),
    ]
    ok, dropped = remap_with_drops(_ds(rows), steps, component_id="remapper")
    assert ok.take_all() == []
    d = {r["hello"]: r for r in dropped.take_all()}
    assert d[42]["metadata.dropped.reason"] == "error"
    assert d[42]["metadata.dropped.message"] == "custom message here"
    # first failure wins: row 0 fails the *second* assert only
    assert d[0]["metadata.dropped.message"] == "assertion failed: .hello == 1"


# check_remap_branching_disabled (remap.rs:~1530): without reroute the
# flagged rows are dropped outright
def test_branching_disabled(ray_session):
    rows = [{"hello": "world"}, {"hello": "goodbye"}]
    out = remap(
        _ds(rows),
        [("set_literal", "foo", "bar"), ("abort", ".hello == 'goodbye'")],
        drop_on_error=True,
        drop_on_abort=True,
    ).take_all()
    assert out == [{"hello": "world", "foo": "bar"}]


# test_combined_transforms_unnest / check_remap_emits_multiple analog:
# a list column expands to one event per element via the unnest stage
def test_emits_multiple_via_unnest(ray_session):
    from vector_ray.stages.unnest import unnest

    ds = _ds([{"message": "augment me", "events": ["foo", "bar"]}])
    out = unnest(ds, "events")
    vals = sorted(r["events"] for r in out.take_all())
    assert vals == ["bar", "foo"]


# rollback restores overwritten values, not just nulls new columns
def test_rollback_restores_overwritten(ray_session):
    rows = [{"message": "keep-me", "bar": "nope"}]
    out = remap(
        _ds(rows),
        [("set_literal", "message", "CLOBBERED"), ("parse_regex", "bar", r"^(?P<n>\d+)$")],
    ).take_all()
    assert out[0]["message"] == "keep-me"


# rollback aligns through row-removing filter steps
def test_rollback_after_filter_step(ray_session):
    rows = [
        {"message": "a", "bar": "1"},
        {"message": "drop-me", "bar": "2"},
        {"message": "c", "bar": "zzz"},
    ]
    out = _rows(
        remap(
            _ds(rows),
            [
                ("filter", ".message != 'drop-me'"),
                ("set_literal", "stamp", "s"),
                ("parse_regex", "bar", r"^(?P<n>\d+)$"),
            ],
        ),
        key="message",
    )
    assert [r["message"] for r in out] == ["a", "c"]
    assert out[0]["stamp"] == "s" and out[0]["n"] == "1"
    assert out[1]["stamp"] is None and out[1]["n"] is None


# check_remap_emits_multiple as a remap STEP: one program expands the
# list column and transforms the expanded rows
def test_emits_multiple_remap_step(ray_session):
    ds = _ds([{"message": "augment me", "events": ["foo", "bar"]}])
    out = _rows(
        remap(
            ds,
            [("unnest", "events", "event"), ("set_literal", "stamp", "s")],
        ),
        key="event",
    )
    assert [(r["event"], r["stamp"]) for r in out] == [("bar", "s"), ("foo", "s")]
    assert all(r["message"] == "augment me" for r in out)


# flagged rows survive a row-expanding unnest step (they bypass the
# expansion and still reach the dropped port)
def test_unnest_preserves_flagged_rows(ray_session):
    rows = [
        {"n": "1", "events": ["a", "b"]},
        {"n": "oops", "events": None},
    ]
    ok, dropped = remap_with_drops(
        _ds(rows),
        [("parse_regex", "n", r"^(?P<n_int>\d+)$"), ("unnest", "events", "event")],
    )
    assert sorted(r["event"] for r in ok.take_all()) == ["a", "b"]
    d = dropped.take_all()
    assert len(d) == 1 and d[0]["n"] == "oops"
    assert d[0]["metadata.dropped.reason"] == "error"
