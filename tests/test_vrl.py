"""VRL program front-end (vector_ray/vrl.py) — language semantics.

Mirrors the reference remap/VRL behavior documented in
src/transforms/remap.rs tests and website/cue/reference/remap/
(assignment, if/else, `??`, fallible `!`, error-capture assignment,
del, abort, conditions erroring to false)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vector_ray.vrl import VrlCondition, compile_program


def run(src, batch):
    return compile_program(src).run(batch)


@pytest.fixture
def events():
    return pa.table(
        {
            "message": [
                '{"level":"info","code":"7"}',
                '{"level":"err","code":"9"}',
                "not json",
            ],
            "host": ["a", "b", "c"],
            "n": [1, 2, 3],
        }
    )


# ----------------------------------------------------------- assignment


def test_path_assignment_and_arithmetic(events):
    t, err, ab, _ = run(".n2 = .n * 2 + 1", events)
    assert t["n2"].to_pylist() == [3, 5, 7]
    assert not pc.any(err).as_py() and not pc.any(ab).as_py()


def test_variable_assignment(events):
    t, *_ = run("x = .n * 10\n.out = x - .n", events)
    assert t["out"].to_pylist() == [9, 18, 27]
    assert "x" not in t.column_names  # variables are not event fields


def test_nested_path_assignment_writes_dotted_column(events):
    t, *_ = run('.meta.kind = "log"', events)
    assert t["meta.kind"].to_pylist() == ["log", "log", "log"]


def test_string_concat_and_coercion(events):
    t, *_ = run('.tag = .host + "-" + to_string(.n)', events)
    assert t["tag"].to_pylist() == ["a-1", "b-2", "c-3"]


def test_division_is_true_division(events):
    t, *_ = run(".half = .n / 2", events)
    assert t["half"].to_pylist() == [0.5, 1.0, 1.5]


def test_modulo(events):
    t, *_ = run(".m = .n % 2", events)
    assert t["m"].to_pylist() == [1, 0, 1]


def test_statement_separator_semicolon(events):
    t, *_ = run(".a = 1; .b = 2", events)
    assert t["a"].to_pylist() == [1, 1, 1]
    assert t["b"].to_pylist() == [2, 2, 2]


def test_comments_and_blank_lines(events):
    t, *_ = run("# set a\n\n.a = 1  # trailing\n", events)
    assert t["a"].to_pylist() == [1, 1, 1]


# ----------------------------------------------------------- if / else


def test_if_else_chain(events):
    t, *_ = run(
        """
        if .n == 1 { .cls = "one" }
        else if .n == 2 { .cls = "two" }
        else { .cls = "many" }
        """,
        events,
    )
    assert t["cls"].to_pylist() == ["one", "two", "many"]


def test_if_as_expression_value(events):
    t, *_ = run('.cls = if .n < 3 { "small" } else { "big" }', events)
    assert t["cls"].to_pylist() == ["small", "small", "big"]


def test_nested_if(events):
    t, *_ = run(
        """
        if .n > 1 {
          if .host == "b" { .who = "bee" } else { .who = "sea" }
        } else { .who = "ay" }
        """,
        events,
    )
    assert t["who"].to_pylist() == ["ay", "bee", "sea"]


def test_if_branch_variable_scoping(events):
    # a variable set in one branch blends with its prior value
    t, *_ = run(
        """
        x = "default"
        if .n == 2 { x = "two" }
        .out = x
        """,
        events,
    )
    assert t["out"].to_pylist() == ["default", "two", "default"]


# --------------------------------------------------- fallibility: ?? / !


def test_coalesce_on_parse_failure(events):
    t, err, *_ = run(
        """
        parsed, e = parse_json(.message)
        .level = parsed.level ?? "unknown"
        """,
        events,
    )
    assert t["level"].to_pylist() == ["info", "err", "unknown"]
    assert not pc.any(err).as_py()  # handled → no flags


def test_coalesce_on_type_failure(events):
    # string + int type mismatch per-column → err rows, all coalesced
    t, err, *_ = run('.x = (.host * 2) ?? "nope"', events)
    assert t["x"].to_pylist() == ["nope", "nope", "nope"]
    assert not pc.any(err).as_py()


def test_bang_flags_failed_rows(events):
    t, err, ab, msgs = run(". = parse_json!(.message)", events)
    assert err.to_pylist() == [False, False, True]
    assert ab.to_pylist() == [False, False, False]
    assert "parse_json" in msgs.to_pylist()[2]
    assert t["level"].to_pylist()[:2] == ["info", "err"]


def test_unhandled_fallible_flags_rows(events):
    # without !, ?? or error capture, a failing call still flags (the
    # reference rejects the program at compile time; we flag at runtime)
    _, err, *_ = run(".p = parse_json(.message)", events)
    assert err.to_pylist() == [False, False, True]


def test_error_capture_assignment(events):
    t, err, *_ = run(
        """
        parsed, e = parse_json(.message)
        .bad = e
        """,
        events,
    )
    assert not pc.any(err).as_py()
    bad = t["bad"].to_pylist()
    assert bad[0] is None and bad[1] is None and "parse_json" in bad[2]


def test_failed_rows_stop_executing(events):
    # after a flagged failure, later statements don't touch the row
    t, err, *_ = run(
        """
        . = parse_json!(.message)
        .level = upcase(.level)
        """,
        events,
    )
    assert err.to_pylist() == [False, False, True]
    assert t["level"].to_pylist()[:2] == ["INFO", "ERR"]
    assert t["level"].to_pylist()[2] is None


def test_coalesce_chain(events):
    t, *_ = run('.x = to_int(.host) ?? to_int(.missing) ?? 0', events)
    assert t["x"].to_pylist() == [0, 0, 0]


# ---------------------------------------------------------- del / abort


def test_del_removes_column(events):
    t, *_ = run("del(.message)", events)
    assert "message" not in t.column_names


def test_del_returns_value(events):
    t, *_ = run(".moved = del(.host)", events)
    assert "host" not in t.column_names
    assert t["moved"].to_pylist() == ["a", "b", "c"]


def test_conditional_del_nulls_rows(events):
    t, *_ = run('if .n == 2 { del(.host) }', events)
    assert t["host"].to_pylist() == ["a", None, "c"]


def test_abort_with_message(events):
    _, err, ab, msgs = run('if .n > 2 { abort "too big" }', events)
    assert ab.to_pylist() == [False, False, True]
    assert err.to_pylist() == [False, False, False]
    assert msgs.to_pylist()[2] == "too big"


def test_abort_bare(events):
    _, _, ab, msgs = run("if .n == 1 { abort }", events)
    assert ab.to_pylist() == [True, False, False]


# ----------------------------------------------- literals & member access


def test_object_and_array_literals(events):
    t, *_ = run('.obj = {"a": .n, "b": "x"}\n.arr = [.n, .n * 2]', events)
    assert t["obj"].to_pylist() == [
        {"a": 1, "b": "x"},
        {"a": 2, "b": "x"},
        {"a": 3, "b": "x"},
    ]
    assert t["arr"].to_pylist() == [[1, 2], [2, 4], [3, 6]]


def test_member_access_struct_and_subscript(events):
    t, *_ = run(
        """
        .obj = {"a": .n}
        .got = .obj.a
        """,
        events,
    )
    assert t["got"].to_pylist() == [1, 2, 3]


def test_subscript_string_key(events):
    t, *_ = run(
        """
        parsed = parse_json(.message) ?? {"level": "?"}
        .lv = parsed["level"]
        """,
        events,
    )
    # parse_json returns map<string,string>; failed row coalesces to struct
    assert t["lv"].to_pylist()[0] == "info"


def test_array_index(events):
    t, *_ = run(".first = [.n, 9][0]", events)
    assert t["first"].to_pylist() == [1, 2, 3]


def test_raw_string_and_regex_literal(events):
    t, *_ = run(".hit = match(.message, r'^\\{')", events)
    assert t["hit"].to_pylist() == [True, True, False]


def test_exists(events):
    t, *_ = run(".has = exists(.host)\n.nope = exists(.ghost)", events)
    assert t["has"].to_pylist() == [True, True, True]
    assert t["nope"].to_pylist() == [False, False, False]


def test_root_read_as_struct(events):
    t, *_ = run(".blob = encode_json(.)", events)
    assert all("host" in s for s in t["blob"].to_pylist())


# -------------------------------------------------------- root assignment


def test_root_assignment_from_object_literal(events):
    t, err, *_ = run('. = {"only": .n}', events)
    assert t.column_names == ["only"]
    assert t["only"].to_pylist() == [1, 2, 3]


def test_conditional_root_assignment(events):
    t, *_ = run('if .n == 2 { . = {"host": "swapped"} }', events)
    assert t["host"].to_pylist() == ["a", "swapped", "c"]
    # columns absent from the new event are nulled on rewritten rows
    assert t["n"].to_pylist() == [1, None, 3]


def test_merge_root_with_parsed_object(events):
    """`. = merge(., parse_json(.x) ?? {})` — the standard enrich idiom:
    parsed keys overlay the event, failed rows keep it unchanged."""
    t, err, *_ = run('. = merge(., parse_json(.message) ?? {})', events)
    assert not pc.any(err).as_py()
    assert t["host"].to_pylist() == ["a", "b", "c"]  # originals kept
    assert t["level"].to_pylist() == ["info", "err", None]


def test_merge_root_with_literal(events):
    t, *_ = run('. = merge(., {"x": 1, "host": "zz"})', events)
    assert t["x"].to_pylist() == [1, 1, 1]
    assert t["host"].to_pylist() == ["zz", "zz", "zz"]
    assert t["n"].to_pylist() == [1, 2, 3]


# -------------------------------------------------------------- assert


def test_assert_flags_failing_rows(events):
    _, err, _, msgs = run('assert(.n < 3, "n too big")', events)
    assert err.to_pylist() == [False, False, True]
    assert msgs.to_pylist()[2] == "n too big"


def test_assert_eq(events):
    _, err, *_ = run("assert_eq(.n, 2)", events)
    assert err.to_pylist() == [True, False, True]


# ------------------------------------------------------------ conditions


def test_condition_final_expression(events):
    cond = VrlCondition('.n > 1 && starts_with(.host, "b")')
    assert cond(events).to_pylist() == [False, True, False]


def test_condition_multi_statement(events):
    cond = VrlCondition(
        """
        threshold = 1
        .n > threshold
        """
    )
    assert cond(events).to_pylist() == [False, True, True]


def test_condition_error_rows_false(events):
    cond = VrlCondition('parsed = parse_json!(.message)\nparsed.level == "err"')
    assert cond(events).to_pylist() == [False, True, False]


def test_compile_condition_falls_back_to_program():
    from vector_ray.expr import compile_condition

    c = compile_condition('x = 2\n.n == x')
    batch = pa.table({"n": [1, 2]})
    assert c(batch).to_pylist() == [False, True]


# -------------------------------------------------------- parse failures


def test_parse_errors():
    for bad in [".x = ", ".x = (1", "if .a {", "del(", "1 +", '.x = f!!(1)']:
        with pytest.raises(ValueError):
            compile_program(bad)


def test_undefined_variable(events):
    with pytest.raises(ValueError, match="undefined variable"):
        run(".x = ghost + 1", events)


def test_null_literal_comparisons(events):
    t, err, ab, _ = run(
        ".r, e = .n / 0\n.handled = e != null\n.missing_chk = .nope == null\n",
        events,
    )
    assert t["handled"].to_pylist() == [True, True, True]
    assert t["missing_chk"].to_pylist() == [True, True, True]
    assert not err.to_numpy(zero_copy_only=False).any()


def test_divide_by_zero_is_catchable(events):
    t, err, ab, _ = run(".r = (.n / 0) ?? -1\n", events)
    assert t["r"].to_pylist() == [-1, -1, -1]
    assert not err.to_numpy(zero_copy_only=False).any()


# ---- round-4 review-pass regressions ----


def test_and_short_circuits_per_row(events):
    # guard idiom: rhs errors must not flag rows the lhs excluded
    t, err, ab, _ = run(
        'if .host == "a" && to_int!(.message) > 0 { .big = true }', events
    )
    # every row has non-numeric message; only host=="a" rows may flag
    assert err.to_pylist() == [True, False, False]


def test_nonboolean_condition_is_false_not_crash(events):
    from vector_ray.vrl import compile_program

    mask = compile_program("upcase(.host)").eval_bool(events)
    assert mask.to_pylist() == [False, False, False]


def test_nonboolean_if_condition_no_crash(events):
    t, err, ab, _ = run('if upcase(.host) { .x = 1 }\n.done = true', events)
    assert t["done"].to_pylist() == [True, True, True]


def test_exists_descends_dotted_prefix_columns():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({
        "user.geo": pa.array([{"city": "x"}, {"city": "y"}],
                             type=pa.struct([("city", pa.string())])),
    })
    out, *_ = compile_program(
        ".has = exists(.user.geo.city)\n.read = .user.geo.city"
    ).run(t)
    assert out["has"].to_pylist() == [True, True]
    assert out["read"].to_pylist() == ["x", "y"]


def test_named_call_arguments_bind_as_keywords():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"url": ["https://example.com/a"]})
    out, err, *_ = compile_program(
        ".u = parse_url!(.url, default_known_ports: true)\n.port = .u.port"
    ).run(t)
    assert out["port"].to_pylist() == [443]
    assert not err.to_pylist()[0]


def test_mixed_array_literal_from_columns():
    """Heterogeneous element COLUMNS fall back to tagged-JSON elements
    (was a hard error before round 5)."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"i": [1, 2], "s": ["b", "c"]})
    out, err, abort, msgs = compile_program(".arr = [.i, .s]").run(t)
    assert not err[0].as_py()
    assert out["arr"].to_pylist() == [[1, "b"], [2, "c"]]


def test_coalesce_does_not_swallow_undefined_variable(events):
    from vector_ray.vrl import VrlNameError

    with pytest.raises(VrlNameError, match="undefined variable"):
        run(".k = parsd ?? -1", events)


def test_modulo_is_truncated_not_floored():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"v": [-7, 7]})
    out, *_ = compile_program(".m = .v % 2\n.s = -7 % 2").run(t)
    assert out["m"].to_pylist() == [-1, 1]
    assert out["s"].to_pylist() == [-1, -1]


def test_or_and_coalesce_rhs_short_circuit_per_row():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    # rhs f! must not flag rows whose lhs already succeeded
    t = pa.table({"a": ["x", None], "n": ["1", "nope"]})
    out, err, ab, _ = compile_program(".v = .a || to_int!(.n)").run(t)
    assert out["v"].to_pylist()[0] == "x"
    assert err.to_pylist() == [False, True]  # only the falsy-lhs row ran rhs
    out, err, ab, _ = compile_program(
        ".v = to_int(.n) ?? to_int!(.a)"
    ).run(pa.table({"a": ["9", "zz"], "n": ["1", "2"]}))
    assert out["v"].to_pylist() == [1, 2]
    assert err.to_pylist() == [False, False]  # lhs ok → rhs never flagged


# ---- closures (map_values / map_keys / filter -> |params| { body }) ----


def test_closure_map_values_object_doc_example():
    """map_values.cue: upcase every value of the event."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"foo": ["foo"], "bar": ["bar"]})
    out, *_ = compile_program(
        ". = map_values(.) -> |value| { upcase!(value) }"
    ).run(t)
    assert out.to_pylist() == [{"foo": "FOO", "bar": "BAR"}]


def test_closure_map_keys_object_doc_example():
    """map_keys.cue: upcase every key."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"foo": ["foo"], "bar": ["bar"]})
    out, *_ = compile_program(". = map_keys(.) -> |key| { upcase(key) }").run(t)
    assert out.column_names == ["FOO", "BAR"]


def test_closure_filter_array_doc_example():
    """filter.cue: drop elements equal to 'foo'."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"tags": [["foo", "bar", "foo", "baz"]]})
    out, *_ = compile_program(
        '.tags = filter(.tags) -> |_index, value| { value != "foo" }'
    ).run(t)
    assert out["tags"].to_pylist() == [["bar", "baz"]]


def test_closure_array_vectorized_with_event_refs():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"tags": [["a", "b"], ["b", "c", "d"], None],
                  "pre": ["x", "y", "z"]})
    out, *_ = compile_program(
        '.tagged = map_values(.tags) -> |v| { .pre + ":" + v }\n'
        'limit = 1\n'
        '.first = filter(.tags) -> |i, v| { i <= limit }'
    ).run(t)
    assert out["tagged"].to_pylist() == [["x:a", "x:b"],
                                         ["y:b", "y:c", "y:d"], None]
    assert out["first"].to_pylist() == [["a", "b"], ["b", "c"], None]


def test_closure_fallible_flags_parent_row_only():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"xs": [["1", "2"], ["3", "oops"]]})
    out, err, ab, _ = compile_program(
        ".n = map_values(.xs) -> |v| { to_int!(v) }"
    ).run(t)
    assert err.to_pylist() == [False, True]
    assert out["n"].to_pylist()[0] == [1, 2]


def test_for_each_requires_two_params():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"tags": [["a"]]})
    with pytest.raises(ValueError, match="for_each"):
        compile_program("for_each(.tags) -> |v| { v }").run(t)


# ---- second review-pass regressions ----


def test_regex_identity_flows_through_variables():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"a": ["a1b2c"]})
    out, *_ = compile_program("pat = r'\\d'\n.parts = split(.a, pat)").run(t)
    assert out["parts"].to_pylist() == [["a", "b", "c"]]
    out, *_ = compile_program('.parts = split("x.y.z", ".")').run(t)
    assert out["parts"].to_pylist() == [["x", "y", "z"]]
    # a column pattern is always literal (columns can't hold regexes)
    t2 = pa.table({"a": ["x.y", "p.q"], "sep": [".", "."]})
    out, *_ = compile_program(".parts = split(.a, .sep)").run(t2)
    assert out["parts"].to_pylist() == [["x", "y"], ["p", "q"]]


def test_replace_dollar_literal_with_literal_pattern():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"a": ["pay x now"]})
    out, err, *_ = compile_program('.v = replace(.a, "x", "$10 fee")').run(t)
    assert out["v"].to_pylist() == ["pay $10 fee now"]
    assert err.to_pylist() == [False]


def test_map_keys_per_row_result_raises():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"foo": ["a", "b"], "sfx": ["1", "2"]})
    with pytest.raises(ValueError, match="per-row"):
        compile_program(". = map_keys(.) -> |key| { key + .sfx }").run(t)


def test_replace_with_count_from_variable():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"a": ["foo foo foo"]})
    out, *_ = compile_program(
        'n = 1\n.v = replace_with(.a, r\'foo\', count: n) -> |m| { "X" }'
    ).run(t)
    assert out["v"].to_pylist() == ["X foo foo"]


def test_pattern_semantics_third_review():
    """Registry-level string-vs-regex dispatch (VrlRegex marker):
    $0 whole-match refs, verbatim literal replacements, per-row
    literal patterns for replace/find, replace_with regex-only."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"a": ["abc123"]})
    out, *_ = compile_program(".v = replace(.a, r'\\d+', \"<$0>\")").run(t)
    assert out["v"].to_pylist() == ["abc<123>"]
    t2 = pa.table({"a": ["pay x with $$"]})
    out, *_ = compile_program('.v = replace(.a, "x", "$10 fee")').run(t2)
    assert out["v"].to_pylist() == ["pay $10 fee with $$"]
    t3 = pa.table({"a": ["x.y", "p+q"], "sep": [".", "+"]})
    out, *_ = compile_program(
        '.r = replace(.a, .sep, "_")\n.f = find(.a, .sep)'
    ).run(t3)
    assert out["r"].to_pylist() == ["x_y", "p_q"]
    assert out["f"].to_pylist() == [1, 1]
    out, *_ = compile_program(
        '.f1 = find("a.c", ".")\n.f2 = find("abc", r\'b|c\')'
    ).run(t)
    assert out["f1"].to_pylist() == [1] and out["f2"].to_pylist() == [1]
    with pytest.raises(ValueError, match="regex"):
        compile_program('.v = replace_with(.a, ".") -> |m| { "X" }').run(t)
    with pytest.raises(ValueError, match="count"):
        compile_program(
            '.v = replace_with(.a, r\'a\', count: .nope) -> |m| { "X" }'
        ).run(t)


def test_decode_gzip_binary_payload_keeps_bytes():
    import pyarrow as pa

    from vector_ray.functions.scalar import call

    payload = bytes([0, 159, 146, 150])  # invalid utf-8
    enc = call("encode_gzip", pa.array([payload], type=pa.binary()))
    dec = call("decode_gzip", enc)
    assert dec.type == pa.binary() and dec.to_pylist()[0] == payload


def test_for_each_accumulates_per_row():
    """for_each.cue Tally elements — sequential over element positions,
    vectorized across rows; outer-variable writes persist between
    iterations (dynamic-key get/set build a per-row typed map)."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"tags": [["foo", "bar", "foo", "baz"], ["a", "a"], None]})
    src = (
        "tally = {}\n"
        "for_each(array!(.tags) ?? []) -> |_index, value| {\n"
        "    count = int(get!(tally, [value])) ?? 0\n"
        "    tally = set!(tally, [value], count + 1)\n"
        "}\n"
        ".tally = tally\n"
        "total = 0\n"
        "for_each(array!(.tags) ?? []) -> |i, v| { total = total + i }\n"
        ".isum = total\n"
    )
    out, err, ab, _ = compile_program(src).run(t)
    rows = out["tally"].to_pylist()
    assert dict(rows[0]) == {"foo": 2, "bar": 1, "baz": 1}
    assert dict(rows[1]) == {"a": 2}
    assert out["isum"].to_pylist()[:2] == [6, 1]  # 0+1+2+3, 0+1


def test_for_each_map_and_null_object():
    """Fourth review pass: for_each over map columns (parse_json
    output) and zero iterations for null objects."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"props": ['{"a":"1","b":"2"}', '{"c":"9"}', None]})
    out, *_ = compile_program(
        'obj, e = parse_json(.props)\nks = ""\n'
        'for_each(obj) -> |k, v| { ks = ks + k + v }\n.r = ks'
    ).run(t)
    assert out["r"].to_pylist()[:2] == ["a1b2", "c9"]
    t2 = pa.table({"o": pa.array(
        [{"x": 1, "y": 2}, None],
        type=pa.struct([("x", pa.int64()), ("y", pa.int64())]))})
    out, *_ = compile_program(
        "total = 0\nfor_each(.o) -> |k, v| { total = total + (int(v) ?? 100) }\n"
        ".t = total"
    ).run(t2)
    assert out["t"].to_pylist() == [3, 0]


def test_dynamic_set_get_shapes():
    import pyarrow as pa

    from vector_ray.functions.scalar import call
    from vector_ray.vrl import compile_program

    # dynamic index into arrays
    t = pa.table({"arr": [[1, 2, 3], [4, 5]], "idx": [1, 0]})
    out, err, *_ = compile_program(".r = set!(.arr, [.idx], 9)").run(t)
    assert out["r"].to_pylist() == [[1, 9, 3], [9, 5]]
    assert err.to_pylist() == [False, False]
    # dynamic get descends nested objects like the static path
    nested = pa.array([{"a": {"b": 7}}])
    assert call("get", nested, [pa.array(["a"]), "b"]).to_pylist() == [7]
    # heterogeneous value types error descriptively, never stringify
    with pytest.raises(ValueError, match="unify"):
        call("set", pa.array([[("a", "x")]],
                             type=pa.map_(pa.string(), pa.string())),
             pa.array(["b"]), pa.array([2]))


def test_replace_out_of_range_group_is_empty():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"a": ["abc123"]})
    out, err, *_ = compile_program(".v = replace(.a, r'\\d+', \"$10 fee\")").run(t)
    assert err.to_pylist() == [False]
    assert out["v"].to_pylist() == ["abc fee"]  # missing group -> empty


def test_per_row_empty_separator_splits_chars():
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"a": ["xyz"], "sep": [""]})
    out, err, *_ = compile_program(".p = split(.a, .sep)").run(t)
    assert out["p"].to_pylist() == [["x", "y", "z"]]


def test_mixed_type_array_literals():
    """["a", 1, true] falls back to list<vector_ray.json> tagged
    elements instead of erroring (the last columnar language gap)."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    batch = pa.table({"x": pa.array([10, 20])})
    p = compile_program('.a = ["a", 1, true, [2, "b"]]; .a')
    d, e = p.eval_value(batch)
    assert not e[0].as_py()
    assert d.to_pylist() == [["a", 1, True, [2, "b"]]] * 2

    # mixed arrays built from COLUMNS, not just literals
    p2 = compile_program('.pair = [.x, "tag"]; .pair')
    d2, e2 = p2.eval_value(batch)
    assert not e2[0].as_py()
    assert d2.to_pylist() == [[10, "tag"], [20, "tag"]]

    # consumed by list functions transparently
    p3 = compile_program('compact(["foo", "", null, 1, [], {}])')
    d3, _ = p3.eval_value(batch)
    assert d3.to_pylist() == [["foo", 1]] * 2

    p4 = compile_program('flatten([1, [2, 3, 4], [5, [6, 7], 8], 9])')
    d4, _ = p4.eval_value(batch)
    assert d4.to_pylist() == [[1, 2, 3, 4, 5, 6, 7, 8, 9]] * 2

    p5 = compile_program(
        'object_from_array([["one", 1], [null, 2], ["two", 3]])')
    d5, _ = p5.eval_value(batch)
    assert d5.to_pylist() == [{"one": 1, "two": 3}] * 2


def test_mixed_array_order_independent_types():
    """[string, int, bool] must keep element types even though
    int→string casts would succeed (no silent stringify regardless of
    which element type comes first)."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"n": [7, 8]})
    out, err, _, _ = compile_program('.mixed = ["tag", .n, true]').run(t)
    assert out["mixed"].to_pylist() == [["tag", 7, True], ["tag", 8, True]]
    # homogeneous-kind unify still works: ints+floats promote
    out2, _, _, _ = compile_program('.nums = [.n, 1.5]').run(t)
    assert out2["nums"].to_pylist() == [[7.0, 1.5], [8.0, 1.5]]


def test_metadata_paths_and_secrets():
    """`%`/`%key.sub` metadata paths (reserved __meta column
    namespace) and the secrets trio over __meta_secrets.*."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"x": [1, 2]})
    p = compile_program(
        '%k = "m1"; %nest.deep = 7; .got = %k; .d = %nest.deep; '
        '.mod = .x % 2; .m10 = 10 % 3'
    )
    out, err, _, _ = p.run(t)
    assert not err[0].as_py()
    assert out["got"].to_pylist() == ["m1", "m1"]
    assert out["d"].to_pylist() == [7, 7]
    assert out["mod"].to_pylist() == [1, 0]   # % stays modulo after values
    assert out["m10"].to_pylist() == [1, 1]

    p2 = compile_program('% = "Metadata"; .metadata = %')
    o2, _, _, _ = p2.run(t)
    assert o2["metadata"].to_pylist() == ["Metadata"] * 2

    p3 = compile_program(
        'set_secret("api_key", "abc122")\n'
        '.k1 = get_secret("api_key")\n'
        'if .x == 2 { remove_secret("api_key") }\n'
        '.k2 = get_secret("api_key")'
    )
    o3, e3, _, _ = p3.run(t)
    assert not e3[0].as_py()
    assert o3["k1"].to_pylist() == ["abc122", "abc122"]
    assert o3["k2"].to_pylist() == ["abc122", None]  # per-row removal


def test_metadata_namespace_semantics():
    """Third-pass review fixes: unified % namespace, metadata survives
    root replacement, root reads exclude metadata, modulo after a
    metapath, quoted keys, per-row secret keys."""
    import pyarrow as pa

    from vector_ray.vrl import compile_program

    t = pa.table({"x": [1, 2]})
    out, err, _, _ = compile_program('%n = 5; .a = %n % 2').run(t)
    assert out["a"].to_pylist() == [1, 1]

    o, _, _, _ = compile_program(
        'if .x == 1 { set_secret("k", "v") }; .got = get_secret("k")'
    ).run(t)
    assert o["got"].to_pylist() == ["v", None]

    o, _, _, _ = compile_program(
        'set_secret("tok","s3"); %m = 1; . = {"z": 1}; '
        '.g = get_secret("tok"); .mm = %m'
    ).run(t)
    assert o["g"].to_pylist() == ["s3", "s3"]
    assert o["mm"].to_pylist() == [1, 1]

    o, _, _, _ = compile_program(
        'set_secret("tok","s3"); %m = 1; .all = .'
    ).run(pa.table({"x": [1]}))
    assert not any(k.startswith("__meta") for k in o["all"][0].as_py())

    o, _, _, _ = compile_program(
        '% = {"a": 1}; .x1 = %a; %b = 2; .y = %'
    ).run(t)
    assert o["x1"].to_pylist() == [1, 1]
    assert o["y"][0].as_py() == {"a": 1, "b": 2}

    o, _, _, _ = compile_program(
        'set_secret("a", "va"); set_secret("b", "vb"); '
        '.k = get_secret(.name)'
    ).run(pa.table({"name": ["a", "b"]}))
    assert o["k"].to_pylist() == ["va", "vb"]

    o, _, _, _ = compile_program('%"api key" = 1; .g = %"api key"').run(t)
    assert o["g"].to_pylist() == [1, 1]


def test_sinks_strip_metadata_columns(ray_session, tmp_path):
    """__meta* columns (metadata + secrets) never reach sink files."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.sinks import write_sinks
    from vector_ray.vrl import compile_program

    prog = compile_program('set_secret("api", "sekrit"); %env = "prod"')

    def _step(b):
        out, err, abort, msgs = prog.run(b)
        return out

    ds = rd.from_arrow(pa.table({"x": [1, 2]})).map_batches(
        _step, batch_format="pyarrow")
    paths = write_sinks({"out": ds}, str(tmp_path))
    found = pq.read_table(paths["out"])
    assert all(not c.startswith("__meta") for c in found.column_names)
    assert found.num_rows == 2


def test_metadata_fourth_pass_fixes():
    """merge() excludes metadata, secrets namespace unreachable via
    %-paths, per-row scalar/struct % resolution, set_secret type guard,
    del(%) clears metadata but not secrets."""
    import pyarrow as pa
    import pytest as _pytest

    from vector_ray.vrl import compile_program

    t = pa.table({"x": [1, 2]})
    o, _, _, _ = compile_program(
        'set_secret("tok","sekrit"); %env = "prod"; '
        '.out = merge(., {"a": 1})'
    ).run(pa.table({"x": [1]}))
    assert not any(k.startswith("__meta") for k in o["out"][0].as_py())

    for bad in ('.l = %secrets.tok', '%"secrets.tok" = 1',
                '% = {"secrets.tok": "v"}'):
        with _pytest.raises(ValueError, match="secret"):
            compile_program(bad).run(t)

    o, _, _, _ = compile_program(
        '% = "s"; if .x == 1 { % = {"a": 1} }; .y = %'
    ).run(t)
    assert o["y"].to_pylist() == [{"a": 1}, "s"]

    with _pytest.raises(ValueError, match="string"):
        compile_program('set_secret("k", 5)').run(t)

    o, _, _, _ = compile_program(
        '%a = 1; set_secret("k","v"); del(%); .y = %; .s = get_secret("k")'
    ).run(t)
    assert o["y"].to_pylist() == [None, None]
    assert o["s"].to_pylist() == ["v", "v"]
