"""Reference-parity: the remap.rs check_* tests re-run with their
ACTUAL VRL source programs through the vrl front-end + remap machinery
(src/transforms/remap.rs:852-1046, :1663-1741)."""

import pyarrow as pa
import pytest

from vector_ray.stages.remap import Remap, _INTERNAL
from vector_ray.vrl import compile_program


def run_remap(source, rows, drop_on_error=False, drop_on_abort=False):
    """transform_one analog: one batch through Remap([('vrl', src)])
    with the given drop flags; returns surviving rows as dicts."""
    import pyarrow.compute as pc

    r = Remap([("vrl", source)])
    out = r(pa.Table.from_pylist(rows))
    keep = pa.array([True] * out.num_rows)
    if drop_on_error:
        keep = pc.and_(keep, pc.invert(out["__error"].combine_chunks()))
    if drop_on_abort:
        keep = pc.and_(keep, pc.invert(out["__abort"].combine_chunks()))
    out = out.filter(keep).drop_columns(list(_INTERNAL))
    return out.to_pylist()


def test_check_remap_adds():
    """remap.rs:852 — plain additions and a field copy."""
    src = '  .foo = "bar"\n  .bar = "baz"\n  .copy = .copy_from\n'
    (row,) = run_remap(src, [{"message": "augment me", "copy_from": "buz"}])
    assert row["message"] == "augment me"
    assert row["copy_from"] == "buz"
    assert row["foo"] == "bar"
    assert row["bar"] == "baz"
    assert row["copy"] == "buz"


def test_check_remap_error():
    """remap.rs:917 — int!() on a non-numeric string errors; with
    drop_on_error=false the event forwards ROLLED BACK: fields the
    program added are absent (null in the columnar analog), fields it
    read are untouched."""
    src = '.foo = "foo"\n.not_an_int = int!(.bar)\n.baz = 12\n'
    (row,) = run_remap(src, [{"message": "augment me", "bar": "is a string"}])
    assert row["bar"] == "is a string"
    assert row["foo"] is None
    assert row["baz"] is None


def test_check_remap_error_drop():
    """remap.rs:945 — same program, drop_on_error=true drops the event."""
    src = '.foo = "foo"\n.not_an_int = int!(.bar)\n.baz = 12\n'
    out = run_remap(
        src, [{"message": "augment me", "bar": "is a string"}], drop_on_error=True
    )
    assert out == []


def test_check_remap_error_infallible():
    """remap.rs:969 — no fallible call, everything lands."""
    src = '.foo = "foo"\n.baz = 12\n'
    (row,) = run_remap(src, [{"message": "augment me", "bar": "is a string"}])
    assert row["foo"] == "foo"
    assert row["bar"] == "is a string"
    assert row["baz"] == 12


def test_check_remap_abort():
    """remap.rs:996 — bare abort mid-program, drop_on_abort=false:
    event forwards rolled back."""
    src = '.foo = "foo"\nabort\n.baz = 12\n'
    (row,) = run_remap(src, [{"message": "augment me", "bar": "is a string"}])
    assert row["bar"] == "is a string"
    assert row["foo"] is None
    assert row["baz"] is None


def test_check_remap_abort_drop():
    """remap.rs:1024 — drop_on_abort=true drops the aborted event."""
    src = '.foo = "foo"\nabort\n.baz = 12\n'
    out = run_remap(
        src, [{"message": "augment me", "bar": "is a string"}], drop_on_abort=True
    )
    assert out == []


def test_check_remap_doesnt_share_state_between_events():
    """remap.rs:777 — `.foo = .sentinel`: one event's field must never
    leak into another (row isolation is structural in the columnar
    model; asserted anyway)."""
    rows = [
        {"message": "a", "sentinel": "first"},
        {"message": "b", "sentinel": None},
    ]
    out = run_remap(".foo = .sentinel", rows)
    assert out[0]["foo"] == "first"
    assert out[1]["foo"] is None


def test_root_string_assignment():
    """remap.rs:826 — `. = "root string";` collapses the event to its
    message (legacy-namespace analog of the root string)."""
    (row,) = run_remap('. = "root string";', [{"message": "x", "copy_from": "buz"}])
    assert row["message"] == "root string"


def test_or_coalesces_missing_path():
    """remap.rs:1741 — `.thang = .thing.cabbage || "beetroot"`: || is
    VALUE-returning; a missing path falls through to the default."""
    rows = [
        {"message": "m", "thing.cabbage": 32},
        {"message": "m", "thing.cabbage": None},
    ]
    out = run_remap('.thang = .thing.cabbage || "beetroot"', rows)
    assert out[0]["thang"] == "32"  # mixed-type blend renders via cast
    assert out[1]["thang"] == "beetroot"


def test_or_value_semantics_same_type():
    t, err, *_ = compile_program('.x = .a || "fallback"').run(
        pa.Table.from_pylist([{"a": "hit"}, {"a": None}])
    )
    assert t["x"].to_pylist() == ["hit", "fallback"]
    assert not err.to_pylist()[0] and not err.to_pylist()[1]


def test_or_boolean_false_falls_through():
    t, *_ = compile_program(".x = .flag || true").run(
        pa.Table.from_pylist([{"flag": False}, {"flag": True}, {"flag": None}])
    )
    assert t["x"].to_pylist() == [True, True, True]


def test_copy_between_chained_programs():
    """remap.rs:1663-1668 — transform 1 sets .thing, transform 2 copies
    it; chained vrl steps inside one Remap behave like chained remaps."""
    r = Remap([("vrl", '.thing = "potato"'), ("vrl", ".thang = .thing")])
    out = r(pa.Table.from_pylist([{"message": "m"}]))
    assert out["thang"].to_pylist() == ["potato"]


def test_emit_multiple_raises_toward_unnest():
    """`. = .events` (remap.rs check_remap_emits_multiple) can't change
    row count in a vectorized step — must fail loudly, pointing at the
    ('unnest', …) remap step, never silently mangle."""
    with pytest.raises(ValueError, match="unnest"):
        compile_program(". = .events").run(
            pa.Table.from_pylist([{"events": [{"m": "a"}, {"m": "b"}]}])
        )
