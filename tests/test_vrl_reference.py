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


# ---- tests/behavior/transforms/remap.toml program ports ----


def test_behavior_remap_source():
    """remap.toml remap_source: `.message = "foo"`."""
    out = run_remap('.message = "foo"', [{"foo": True}])
    assert out == [{"foo": True, "message": "foo"}]


def test_behavior_remap_nested():
    """remap.toml remap_nested: nested path assignments land on the
    dotted columns the condition reads back."""
    src = ".a.b = 123\n.x.y = 456\n.x.z = 789\n"
    out = run_remap(src, [{"m": ""}])
    assert out[0]["a.b"] == 123 and out[0]["x.y"] == 456 and out[0]["x.z"] == 789


def test_behavior_remap_array():
    """remap.toml remap_array: indexed assignment builds arrays with
    null gap-fill.  Columnar deviation: elements unify to one Arrow
    type (ints widen to float beside 2.0; reference arrays are
    heterogeneous per event)."""
    src = '.a[0] = 0\n.a[1] = 1\n.a[2] = 2.0\n.b[2] = "two"\n.b[0] = "zero"\n'
    out = run_remap(src, [{"m": ""}])
    assert out[0]["a"] == [0.0, 1.0, 2.0]
    assert out[0]["b"] == ["zero", None, "two"]


def test_behavior_remap_arithmetic():
    """remap.toml remap_arithmetic: precedence and error-capture."""
    src = (
        ".result_a, err = .a * .b + .c - .d\n"
        ".result_b, err = .a * (.b + .c) - .d\n"
        ".result_c, err = .a + .b * .c / .d\n"
        ".result_d, err = (.a + .b) * (.c / .d)\n"
        ".result_e, err = .e / .c\n"
    )
    out = run_remap(src, [{"a": 3, "b": 7, "c": 12, "d": 6, "e": 9}])
    r = out[0]
    assert r["result_a"] == 27
    assert r["result_b"] == 51
    assert r["result_c"] == 17
    assert r["result_d"] == 20
    assert r["result_e"] == 0.75


def test_behavior_remap_boolean_arithmetic():
    """remap.toml remap_boolean_arithmetic."""
    src = (
        ".result_a, err = .a + .b > 9\n"
        ".result_b, err = .a * .b < 20\n"
        ".result_c, err = 1 >= .a / .b\n"
        ".result_d, err = .a + .b > .c + .d\n"
    )
    out = run_remap(src, [{"a": 3, "b": 7, "c": 12, "d": 6}])
    r = out[0]
    assert (r["result_a"], r["result_b"], r["result_c"], r["result_d"]) == (
        True, False, True, False,
    )


def test_behavior_remap_arithmetic_error():
    """remap.toml remap_arithmetic_error: division by zero captured by
    `, err =` leaves the target null-ish; the event survives even with
    drop_on_error (err was consumed)."""
    src = "a = 10\nb = 0\n.a, err = a / b\n"
    out = run_remap(src, [{"m": ""}], drop_on_error=True)
    assert len(out) == 1
    assert out[0].get("a") is None or out[0]["a"] == 0.0


def test_behavior_remap_abort_flags():
    """remap.toml remap_abort / remap_abort_drop_on_abort: statements
    after abort don't run; drop_on_abort controls survival."""
    src = ".foo = false\nabort\n.bar = false\n"
    kept = run_remap(src, [{"foo": True, "bar": True}], drop_on_abort=False)
    # rollback-as-arrived: the aborted event passes through unchanged
    assert kept == [{"foo": True, "bar": True}]
    dropped = run_remap(src, [{"foo": True, "bar": True}], drop_on_abort=True)
    assert dropped == []


def test_behavior_remap_coercion():
    """remap.toml remap_coercion: to_string/to_int/to_float/to_bool/
    parse_timestamp round-trip."""
    src = (
        ".foo = to_string!(.foo)\n"
        ".bar = to_int!(.bar)\n"
        ".baz = to_float!(.baz)\n"
        ".bev = to_bool!(.bev)\n"
    )
    out = run_remap(
        src, [{"foo": 42, "bar": "37", "baz": "41.5", "bev": "true"}]
    )
    r = out[0]
    assert r["foo"] == "42" and r["bar"] == 37
    assert r["baz"] == 41.5 and r["bev"] is True


def test_behavior_remap_coercion_timestamp():
    """remap.toml remap_coercion timestamp leg:
    to_string(parse_timestamp!(.a, "%+")) renders RFC3339."""
    out = run_remap(
        '.a = to_string(parse_timestamp!(.a, \'%+\'))',
        [{"a": "2020-10-01T02:22:11.223212Z"}],
    )
    assert out[0]["a"] == "2020-10-01T02:22:11.223212Z"
