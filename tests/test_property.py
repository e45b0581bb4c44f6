"""Property-based checks (hypothesis) — beyond the reference's own test
strategy (SURVEY §5.6 notes it has none): the condition compiler agrees
with a row-by-row Python oracle, and exact dedup is idempotent."""

import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from vector_ray.expr import Condition

rows = st.lists(
    st.fixed_dictionaries(
        {
            "x": st.one_of(st.none(), st.integers(-100, 100)),
            "s": st.one_of(st.none(), st.sampled_from(["a", "bb", "ccc", "err!"])),
        }
    ),
    min_size=1,
    max_size=40,
)


def _table(data):
    return pa.table(
        {
            "x": pa.array([r["x"] for r in data], type=pa.int64()),
            "s": pa.array([r["s"] for r in data], type=pa.string()),
        }
    )


def _oracle(row, cond):
    """Row-wise Python evaluation with null→False semantics."""
    x, s = row["x"], row["s"]
    if cond == "gt":
        return x is not None and x > 10
    if cond == "and":
        return x is not None and s is not None and x > 0 and len(s) >= 2
    if cond == "or_not":
        return (s == "err!") or not (x is not None and x >= 0)
    if cond == "contains":
        return s is not None and "c" in s
    raise AssertionError


EXPRS = {
    "gt": ".x > 10",
    "and": ".x > 0 && length(.s) >= 2",
    "or_not": ".s == 'err!' || !(.x >= 0)",
    "contains": "contains(.s, 'c')",
}


@settings(max_examples=60, deadline=None)
@given(data=rows, which=st.sampled_from(sorted(EXPRS)))
def test_condition_matches_python_oracle(data, which):
    t = _table(data)
    got = Condition(EXPRS[which])(t).to_pylist()
    want = [_oracle(r, which) for r in data]
    assert got == want


@settings(max_examples=25, deadline=None)
@given(data=rows)
def test_local_dedupe_idempotent(data):
    """Dedup of a dedup changes nothing (pure-pandas core of
    dedupe_exact's per-batch phase)."""
    df = pd.DataFrame(data)
    df["seq"] = range(len(df))
    once = df.sort_values("seq").groupby(["x", "s"], dropna=False, sort=False).head(1)
    twice = once.sort_values("seq").groupby(["x", "s"], dropna=False, sort=False).head(1)
    assert once.equals(twice)
    # survivor count equals distinct keys
    seen = {(r["x"], r["s"]) for r in data}
    assert len(once) == len(seen)


frames_strategy = st.lists(st.binary(max_size=64), max_size=20)


@given(frames=frames_strategy)
def test_length_delimited_roundtrip_property(frames):
    from vector_ray import framing as fr

    assert fr.frame_length_delimited(fr.enframe_length_delimited(frames)) == frames
    assert fr.frame_varint_length_delimited(
        fr.enframe_varint_length_delimited(frames)) == frames


@given(frames=st.lists(
    st.binary(max_size=64).filter(lambda b: b"\n" not in b and b != b""),
    max_size=20,
))
def test_newline_octet_roundtrip_property(frames):
    from vector_ray import framing as fr

    assert fr.frame_newline(fr.enframe_newline(frames)) == frames
    assert fr.frame_octet_counting(fr.enframe_octet_counting(frames)) == frames


_ident = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_val = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=122),
    min_size=1, max_size=12,
)


@given(rows=st.lists(
    st.fixed_dictionaries({"a": _val, "b": _val, "n": st.integers(-1000, 1000)}),
    min_size=1, max_size=10,
))
@settings(max_examples=25, deadline=None)
def test_csv_encode_decode_roundtrip_property(rows):
    import pyarrow as pa

    from vector_ray.codecs import decode_csv, encode_csv

    t = pa.Table.from_pylist(rows)
    lines = encode_csv(t)
    out, err = decode_csv(
        lines, headers=t.column_names,
        types={"a": pa.string(), "b": pa.string(), "n": pa.int64()},
    )
    assert not any(err.to_pylist())
    assert out.to_pylist() == t.to_pylist()


# ---- VRL arithmetic property: program results match a python model
# (true division, truncated %, string concat via +) ----

_vrl_ops = st.sampled_from(["+", "-", "*", "/", "%"])
_vrl_ints = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=60, deadline=None)
@given(a=_vrl_ints, b=_vrl_ints, c=_vrl_ints, op1=_vrl_ops, op2=_vrl_ops)
def test_vrl_arithmetic_matches_python_model(a, b, c, op1, op2):
    import math

    import pytest

    import pyarrow as pa

    from vector_ray.vrl import compile_program

    def model(x, y, op):
        if op == "/":
            if y == 0:
                return None
            return x / y
        if op == "%":
            if y == 0:
                return None
            out = math.fmod(x, y)
            return int(out) if isinstance(x, int) and isinstance(y, int) else out
        return {"+": x + y, "-": x - y, "*": x * y}[op]

    # left-assoc same-precedence chain: (.a op1 .b) op2 .c — mirror the
    # parser by grouping explicitly
    src = f".r = (.a {op1} .b) {op2} .c"
    t = pa.table({"a": [a], "b": [b], "c": [c]})
    out, err, ab, _ = compile_program(src).run(t)
    mid = model(a, b, op1)
    want = None if mid is None else model(mid, c, op2)
    got = out["r"].to_pylist()[0] if "r" in out.column_names else None
    if want is None:
        # div-by-zero somewhere → the row errors, no value
        assert err.to_pylist() == [True] or got is None
    else:
        assert err.to_pylist() == [False]
        assert got == pytest.approx(want)
