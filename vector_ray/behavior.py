"""Behavior-test harness — config-driven tests like ``vector test``.

Mirrors the reference's unit-test framework (src/config/unit_test/mod.rs:103
build_unit_tests_main; mock components unit_test_components.rs): a TOML
file holds a component ``[config]`` plus ``[[tests]]`` stanzas; each test
injects rows ``insert_at`` a node, runs the real transform subgraph, and
asserts conditions on rows ``extract_from`` an output (or asserts
``no_outputs_from``).

TOML shape::

    [config.transforms.my_filter]
    type = "filter"
    inputs = ["in"]            # 'in' may be a placeholder source
    condition = ".status >= 400"

    [[tests]]
    name = "drops 200s"
    [tests.input]
    insert_at = "my_filter"
    rows = [{status = 200}, {status = 500}]
    [[tests.outputs]]
    extract_from = "my_filter"
    row_conditions = [".status == 500"]   # row i must satisfy entry i
    count = 1

Rows are tagged with a hidden ``__seq`` in insertion order; outputs are
re-sorted by it before row-wise assertions, giving Vector's ordered
semantics on top of unordered distributed execution.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List

import pyarrow as pa

from .expr import compile_condition
from .topology import Topology


class BehaviorTestFailure(AssertionError):
    pass


def _as_rows(ds_or_dict, port: str):
    obj = ds_or_dict
    if isinstance(obj, dict):
        if port not in obj:
            raise BehaviorTestFailure(f"no output port {port!r} (have {list(obj)})")
        obj = obj[port]
    return obj.take_all()


def run_behavior_file(path: str) -> List[str]:
    """Run every [[tests]] stanza in a TOML file; returns passed names,
    raises BehaviorTestFailure on the first failure."""
    import tomllib

    with open(path, "rb") as f:
        doc = tomllib.load(f)
    base_config = doc.get("config", {})
    passed = []
    for test in doc.get("tests", []):
        _run_one(base_config, test, path)
        passed.append(test.get("name", "<unnamed>"))
    return passed


def _run_one(base_config: dict, test: dict, path: str) -> None:
    name = test.get("name", "<unnamed>")
    inp = test["input"]
    insert_at = inp["insert_at"]
    if "source" in inp:
        # `type = "vrl"` test inputs (reference unit_test framework,
        # e.g. tests/behavior/transforms/vrl_test_input.toml): a VRL
        # program builds each input event from scratch
        from .vrl import compile_program

        n = int(inp.get("count", 1))
        prog = compile_program(inp["source"])
        seed = pa.table({"__seq": pa.array(range(n), pa.int64())})
        out, err, abort, msgs = prog.run(seed)
        import pyarrow.compute as _pc

        bad = _pc.or_(err, abort) if len(err) else err
        if len(bad) and _pc.any(bad).as_py():
            i = next(j for j, v in enumerate(bad.to_pylist()) if v)
            raise BehaviorTestFailure(
                f"{name}: vrl input program errored/aborted on row {i}: "
                f"{msgs[i].as_py()}"
            )
        rows = [
            dict(r, __seq=i) for i, r in enumerate(out.to_pylist())
        ]
    else:
        rows = [dict(r, __seq=i) for i, r in enumerate(inp["rows"])]

    config = {
        "sources": dict(base_config.get("sources", {})),
        "transforms": {k: dict(v) for k, v in base_config.get("transforms", {}).items()},
        "sinks": dict(base_config.get("sinks", {})),
    }
    config["sources"]["__test_input"] = {"type": "inline", "rows": rows}
    if insert_at not in config["transforms"]:
        raise BehaviorTestFailure(f"{name}: insert_at node {insert_at!r} not in config")
    config["transforms"][insert_at]["inputs"] = ["__test_input"]
    # mock every other dangling input (placeholder sources like "in") the
    # way the reference replaces unreferenced components with mocks
    known = set(config["sources"]) | set(config["transforms"])
    for node_name, node_cfg in config["transforms"].items():
        node_cfg["inputs"] = [
            inp if inp.split(".")[0] in known else "__test_input"
            for inp in node_cfg.get("inputs", [])
        ]
    # drop placeholder sources/sinks the test doesn't exercise
    topo = Topology(
        {
            "sources": config["sources"],
            "transforms": config["transforms"],
            "sinks": {},
        }
    )

    for out_spec in test.get("outputs", []):
        target = out_spec["extract_from"]
        node, _, port = target.partition(".")
        built = topo._build(node)
        rows_out = _as_rows(built, port) if (port or isinstance(built, dict)) else built.take_all()
        rows_out = sorted(rows_out, key=lambda r: r.get("__seq", 0))
        if "count" in out_spec and len(rows_out) != out_spec["count"]:
            raise BehaviorTestFailure(
                f"{name}: {target} expected {out_spec['count']} rows, got {len(rows_out)}"
            )
        conds = out_spec.get("row_conditions", [])
        if conds:
            if len(rows_out) != len(conds):
                raise BehaviorTestFailure(
                    f"{name}: {target} expected {len(conds)} rows (one per "
                    f"row_condition), got {len(rows_out)}"
                )
            for i, (row, cond) in enumerate(zip(rows_out, conds)):
                t = pa.Table.from_pylist([{k: v for k, v in row.items() if k != "__seq"}])
                m = compile_condition(cond)(t)
                ok = m[0].as_py() if len(m) else False
                if not ok:
                    raise BehaviorTestFailure(
                        f"{name}: {target} row {i} {row} fails condition {cond!r}"
                    )
        for cond in out_spec.get("all_match", []):
            c = compile_condition(cond)
            for i, row in enumerate(rows_out):
                t = pa.Table.from_pylist([{k: v for k, v in row.items() if k != "__seq"}])
                if not (c(t)[0].as_py() if len(t) else False):
                    raise BehaviorTestFailure(
                        f"{name}: {target} row {i} {row} fails all_match {cond!r}"
                    )
        for cond in out_spec.get("any_match", []):
            c = compile_condition(cond)
            hit = False
            for row in rows_out:
                t = pa.Table.from_pylist([{k: v for k, v in row.items() if k != "__seq"}])
                if c(t)[0].as_py() if len(t) else False:
                    hit = True
                    break
            if not hit:
                raise BehaviorTestFailure(
                    f"{name}: {target} no row matches any_match {cond!r}"
                )

    for target in test.get("no_outputs_from", []):
        node, _, port = target.partition(".")
        built = topo._build(node)
        rows_out = _as_rows(built, port) if (port or isinstance(built, dict)) else built.take_all()
        if rows_out:
            raise BehaviorTestFailure(
                f"{name}: expected no output from {target}, got {len(rows_out)} rows"
            )


def run_behavior_dir(dir_path: str) -> Dict[str, List[str]]:
    out = {}
    for f in sorted(glob.glob(os.path.join(dir_path, "*.toml"))):
        out[os.path.basename(f)] = run_behavior_file(f)
    return out
