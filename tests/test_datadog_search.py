"""DatadogSearch dialect — ported checks from
src/conditions/datadog_search.rs get_checks() (columnar model: tags is
a list<string> of "k:v" entries, @attr is a column)."""

import pyarrow as pa
import pytest

from vector_ray.datadog_search import compile_datadog_search


def ev(**cols):
    """One-row table."""
    return pa.table({k: [v] for k, v in cols.items()})


def matches(query, table):
    return compile_datadog_search(query)(table).to_pylist()[0]


# (query, passing event, failing event) — direct ports
CHECKS = [
    ("_exists_:a", ev(tags=["a:foo"]), ev(tags=["b:foo"])),
    ("_exists_:a-b", ev(tags=["a-b:foo"]), ev(tags=["ab:foo"])),
    ("NOT _exists_:a", ev(tags=["b:foo"]), ev(tags=["a:foo"])),
    ("-_exists_:a", ev(tags=["b:foo"]), ev(tags=["a:foo"])),
    ("_exists_:@b", ev(b="foo"), ev(a="foo")),
    ("NOT _exists_:@b", ev(a="foo"), ev(b="foo")),
    ("-_exists_:@b", ev(a="foo"), ev(b="foo")),
    ("_missing_:a", ev(x="y"), ev(tags=["a:foo"])),
    ("NOT _missing_:a", ev(tags=["a:foo"]), ev(x="y")),
    ("-_missing_:a", ev(tags=["a:foo"]), ev(x="y")),
    ("_missing_:@b", ev(a="foo"), ev(b="foo")),
    ("NOT _missing_:@b", ev(b="foo"), ev(a="foo")),
    ("-_missing_:@b", ev(b="foo"), ev(a="foo")),
    # keyword over message
    ("bla", ev(message="bla"), ev(x="y")),
    ("foo", ev(message='{"key": "foo"}'), ev(x="y")),
    ("NOT bla", ev(message="nothing"), ev(message="bla")),
    ("-bla", ev(message="nothing"), ev(message="bla")),
    ('"bla"', ev(message="bla"), ev(x="y")),
    ('NOT "bla"', ev(x="y"), ev(message="bla")),
    ('-"bla"', ev(x="y"), ev(message="bla")),
    # tag match
    ("a:bla", ev(tags=["a:bla"]), ev(tags=["b:bla"])),
    ("host:foo", ev(host="foo"), ev(tags=["host:foobar"])),
    ("host:foo", ev(host="foo"), ev(host="foobar")),
    ("NOT a:bla", ev(tags=["b:bla"]), ev(tags=["a:bla"])),
    ("NOT host:foo", ev(tags=["host:fo  o"]), ev(host="foo")),
    ("-a:bla", ev(tags=["b:bla"]), ev(tags=["a:bla"])),
    ("-trace_id:foo", ev(x="y"), ev(trace_id="foo")),
    ('a:"bla"', ev(tags=["a:bla"]), ev(a="bla")),  # quoted tag ≠ attr col
    ('NOT a:"bla"', ev(a="bla"), ev(tags=["a:bla"])),
    # boolean attribute
    ("@a:true", ev(a=True), ev(a=False)),
    ("NOT @a:false", ev(a=True), ev(a=False)),
    # attribute equality + wildcards
    ("@b:foo", ev(b="foo"), ev(b="bar")),
    ("@b:foo*", ev(b="foobar"), ev(b="barfoo")),
    ("@b:*foo", ev(b="barfoo"), ev(b="foobar")),
    ("@b:*oob*", ev(b="foobar"), ev(b="fxxbar")),
    # numeric comparisons
    ("@n:>5", ev(n=7), ev(n=3)),
    ("@n:>=5", ev(n=5), ev(n=4)),
    ("@n:<5", ev(n=3), ev(n=7)),
    ("@n:[2 TO 5]", ev(n=3), ev(n=9)),
    # boolean operators
    ("@a:foo AND @b:bar", ev(a="foo", b="bar"), ev(a="foo", b="x")),
    ("@a:foo OR @b:bar", ev(a="x", b="bar"), ev(a="x", b="y")),
    ("@a:foo @b:bar", ev(a="foo", b="bar"), ev(a="foo", b="x")),  # juxt = AND
    ("(@a:foo OR @b:bar) AND @c:z", ev(a="foo", c="z"), ev(a="foo", c="y")),
]


@pytest.mark.parametrize("query,passing,failing", CHECKS,
                         ids=[c[0] for c in CHECKS])
def test_datadog_search_checks(query, passing, failing):
    assert matches(query, passing) is True, f"{query} should match pass event"
    assert matches(query, failing) is False, f"{query} should not match fail event"


def test_wildcard_all_and_condition_dict():
    from vector_ray.expr import compile_condition

    t = ev(message="anything")
    assert matches("*", t) is True
    cond = compile_condition({"type": "datadog_search", "source": "host:web*"})
    got = cond(pa.table({"host": ["web-1", "db-1"]}))
    assert got.to_pylist() == [True, False]


def test_match_datadog_query_function():
    from vector_ray.functions.scalar import call

    got = call("match_datadog_query", pa.array(["error in db", "all fine"]),
               "error").to_pylist()
    assert got == [True, False]


def test_tags_as_joined_string():
    t = pa.table({"tags": ["a:bla,b:x"]})
    assert matches("a:bla", t) is True
    assert matches("c:bla", t) is False


def test_multirow_vectorized():
    t = pa.table({
        "tags": [["a:1"], ["a:2"], [], None],
        "message": ["x", "y", "needle here", "z"],
    })
    got = compile_datadog_search("a:1 OR needle")(t).to_pylist()
    assert got == [True, False, True, False]


def test_trailing_empty_tag_rows_not_truncated():
    """reduceat regression: trailing empty/null list rows must not
    truncate the last non-empty row's segment (ADVICE r4)."""
    t = pa.table({"tags": [["env:prod", "team:x"], []]})
    assert compile_datadog_search("team:x")(t).to_pylist() == [True, False]
    t2 = pa.table({"tags": [["a:1"], ["env:prod", "team:x"], [], None]})
    got = compile_datadog_search("team:x")(t2).to_pylist()
    assert got == [False, True, False, False]
