import pyarrow as pa
import pytest

from vector_ray.expr import Condition, parse


def tbl():
    return pa.table(
        {
            "status": pa.array([200, 404, 500, None], type=pa.int64()),
            "msg": pa.array(["ok here", "not found", "server err", None]),
            "host": pa.array(["a", "b", "a", "c"]),
        }
    )


def m(cond):
    return Condition(cond)(tbl()).to_pylist()


def test_comparisons():
    assert m(".status == 500") == [False, False, True, False]
    assert m(".status >= 404") == [False, True, True, False]
    assert m(".status != 200") == [False, True, True, False]  # null → false


def test_bool_ops():
    assert m(".status == 200 || .status == 404") == [True, True, False, False]
    assert m(".status > 100 && .host == 'a'") == [True, False, True, False]
    assert m("!(.status == 200)") == [False, True, True, True]


def test_in_list():
    assert m(".host in ['a', 'c']") == [True, False, True, True]


def test_string_fns():
    assert m("contains(.msg, 'err')") == [False, False, True, False]
    assert m("starts_with(.msg, 'not')") == [False, True, False, False]
    assert m("ends_with(.msg, 'here')") == [True, False, False, False]
    assert m("match(.msg, 'f.und')") == [False, True, False, False]


def test_exists_null():
    assert m("exists(.status)") == [True, True, True, False]
    assert m(".status == null") == [False, False, False, True]
    assert m(".status != null") == [True, True, True, False]
    assert m("exists(.nope)") == [False, False, False, False]


def test_length():
    assert m("length(.msg) > 7") == [False, True, True, False]


def test_parse_errors():
    with pytest.raises(ValueError):
        parse(".a === 1")
    with pytest.raises(ValueError):
        Condition("bogus_fn(.host)")(tbl())


def test_precedence():
    # && binds tighter than ||
    assert m(".host == 'b' || .host == 'a' && .status == 200") == [
        True,
        True,
        False,
        False,
    ]


def test_literal_coercion_dynamic_typing():
    # VRL-ish dynamic typing: string literal vs int column and vice versa
    t = pa.table({"code": pa.array([200, 500]), "s": pa.array(["7", "9"])})
    assert Condition(".code == '500'")(t).to_pylist() == [False, True]
    assert Condition(".s == 9")(t).to_pylist() == [False, True]
    assert Condition(".code >= '404'")(t).to_pylist() == [False, True]


def test_arithmetic():
    t = pa.table({"a": pa.array([1, 5, 10]), "b": pa.array([2, 3, 1])})
    c = lambda e: Condition(e)(t).to_pylist()
    assert c(".a + .b > 6") == [False, True, True]
    assert c(".a * 2 == 10") == [False, True, False]
    assert c(".a - .b >= 0") == [False, True, True]
    assert c(".a / 2 >= 2.5") == [False, True, True]
    assert c(".a % 2 == 1") == [True, True, False]
    assert c("-.a < -4") == [False, True, True]
    assert c("(.a + 1) * 2 >= .b + 10") == [False, False, True]  # 12>=13 is False


def test_nested_struct_field_path():
    t = pa.table(
        {
            "meta": pa.array(
                [{"region": "us", "tier": 1}, {"region": "eu", "tier": 2}],
                type=pa.struct([("region", pa.string()), ("tier", pa.int64())]),
            )
        }
    )
    assert Condition(".meta.region == 'eu'")(t).to_pylist() == [False, True]
    assert Condition(".meta.tier + 1 >= 3")(t).to_pylist() == [False, True]
