"""CLI — the `vector` binary analog (reference src/cli.rs subcommands).

    python -m vector_ray run config.toml [--out DIR]     # build + write sinks
    python -m vector_ray graph config.toml               # DOT dump
    python -m vector_ray test tests/behavior/            # behavior TOMLs
    python -m vector_ray validate config.toml            # compile only

Config TOML mirrors the dict schema of topology.build(); conditions are
expression strings, remap steps are arrays.  The CLI owns the Ray
session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_config(path: str) -> dict:
    """Load TOML (default), JSON (.json), or YAML (.yaml/.yml when a
    yaml module is available) — the reference accepts all three config
    formats (src/config/format.rs).  Env vars ($VAR/${VAR:-d}/${VAR:?e})
    and SECRET[backend.key] placeholders are interpolated over the raw
    text before parsing, like the reference's config loader
    (src/config/vars.rs, src/config/loading/secret.rs)."""
    from .config_vars import prepare_config_text

    if path.endswith(".json"):
        parse = json.loads
    elif path.endswith((".yaml", ".yml")):
        try:
            import yaml
        except ImportError as e:
            raise SystemExit("yaml configs need a pyyaml install") from e
        parse = yaml.safe_load
    else:
        import tomllib

        parse = tomllib.loads
    # explicit utf-8: tomllib.load mandates it, and the locale default
    # (LANG=C in containers) would mojibake non-ASCII config strings
    with open(path, encoding="utf-8") as f:
        text = f.read()
    try:
        doc = prepare_config_text(text, parse)
    except ValueError as e:
        raise SystemExit(f"config error: {e}") from e
    # allow either top-level sections or a [config] wrapper
    return doc.get("config", doc)


def _ray_init() -> bool:
    """Init Ray if nobody has; returns True when WE own the session
    (callers only shut down what they started — a host test harness's
    session must survive a CLI call)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def _ray_shutdown(owned: bool) -> None:
    if owned:
        import ray

        ray.shutdown()


def cmd_run(args) -> int:
    owned = _ray_init()
    from .sinks import write_sinks
    from .topology import build

    config = _load_config(args.config)
    t0 = time.time()
    sinks = build(config)
    out = {}
    if args.out:
        formats = {
            name: cfg.get("type", "parquet").removeprefix("sink_")
            for name, cfg in config.get("sinks", {}).items()
        }
        options = {
            name: {k: cfg[k] for k in ("partition_cols", "compression") if k in cfg}
            for name, cfg in config.get("sinks", {}).items()
        }
        paths = write_sinks(sinks, args.out, formats=formats, options=options)
        for name in sinks:
            out[name] = {"path": paths[name]}
    else:
        for name, ds in sinks.items():
            out[name] = {"rows": ds.count()}
    print(json.dumps({"sinks": out, "wall_secs": round(time.time() - t0, 3)}))
    _ray_shutdown(owned)
    return 0


def cmd_graph(args) -> int:
    from .topology import to_dot

    print(to_dot(_load_config(args.config)))
    return 0


def cmd_validate(args) -> int:
    from .topology import Topology

    try:
        Topology(_load_config(args.config))
    except ValueError as e:
        print(f"invalid: {e}", file=sys.stderr)
        return 1
    print("ok")
    return 0


def cmd_test(args) -> int:
    owned = _ray_init()
    from .behavior import BehaviorTestFailure, run_behavior_dir, run_behavior_file

    try:
        if os.path.isdir(args.path):
            results = run_behavior_dir(args.path)
        else:
            results = {os.path.basename(args.path): run_behavior_file(args.path)}
    except BehaviorTestFailure as e:
        print(f"FAILED: {e}", file=sys.stderr)
        return 1
    total = sum(len(v) for v in results.values())
    for f, names in results.items():
        for n in names:
            print(f"passed: {f} :: {n}")
    print(f"{total} behavior tests passed")
    _ray_shutdown(owned)
    return 0


def cmd_list(args) -> int:
    """Print every registered component type (reference `vector list`)."""
    from .topology import _REGISTRY
    from .functions import scalar

    print("components:")
    for name in sorted(_REGISTRY):
        print(f"  {name}")
    print(f"scalar functions: {len(scalar.FUNCTIONS)}")
    return 0


def cmd_generate(args) -> int:
    """Config skeleton from a 'src/t1,t2/sink' expression
    (src/generate.rs generate_example: transforms chain in order; the
    first consumes the source)."""
    import json as _json

    from .topology import _REGISTRY

    parts = args.expression.split("/")
    if len(parts) != 3:
        print("expected 'source/transform,transform/sink'", flush=True)
        return 1
    src, transforms, sink = parts
    cfg = {"sources": {}, "transforms": {}, "sinks": {}}
    errs = []
    if src:
        if src not in _REGISTRY:
            errs.append(f"unknown source type {src!r}")
        cfg["sources"]["source0"] = {"type": src, "path": "<path>"}
    prev = "source0" if src else None
    for i, t in enumerate(x for x in transforms.split(",") if x):
        if t not in _REGISTRY:
            errs.append(f"unknown transform type {t!r}")
        name = f"transform{i}"
        cfg["transforms"][name] = {"type": t, "inputs": [prev] if prev else []}
        prev = name
    if sink:
        cfg["sinks"]["sink0"] = {"type": sink, "inputs": [prev] if prev else [],
                                 "path": "<out-dir>"}
    if errs:
        for e in errs:
            print(f"error: {e}")
        return 1
    print(_json.dumps(cfg, indent=2))
    return 0


def cmd_convert(args) -> int:
    print(json.dumps(_load_config(args.config), indent=2, default=str))
    return 0


def cmd_tap(args) -> int:
    """`vector tap` analog (src/api/ event taps, src/tap/): sample the
    events flowing out of matching components.  ``patterns`` are
    shell-style globs over component names (tap's --outputs-of); each
    sampled event prints as one JSON line tagged with its component
    (and port for multi-output transforms like route)."""
    import fnmatch

    owned = _ray_init()
    try:
        from .topology import Topology

        config = _load_config(args.config)
        topo = Topology(config)
        patterns = args.patterns or ["*"]
        names = [
            n for n in topo.nodes
            if topo.nodes[n]["section"] != "sinks"
            and any(fnmatch.fnmatch(n, p) for p in patterns)
        ]
        if not names:
            print(f"no components match {patterns!r}", file=sys.stderr)
            return 1
        for name in sorted(names):
            built = topo._build(name)
            outputs = (
                built.items() if isinstance(built, dict) else [(None, built)]
            )
            for port, ds in outputs:
                where = name if port is None else f"{name}.{port}"
                try:
                    rows = ds.limit(args.limit).take_all()
                except Exception as e:
                    print(json.dumps({"component": where, "error": str(e)}))
                    continue
                for row in rows:
                    print(json.dumps(
                        {"component": where, "event": row}, default=str))
        return 0
    finally:
        _ray_shutdown(owned)


def cmd_vrl(args) -> int:
    """`vector vrl` analog, two shapes:

    * ``vrl --program '<source>' '<json event>'`` — compile and run a
      full VRL program (vrl.py) against one JSON event; prints the
      transformed event (or the error/abort verdict).
    * ``vrl <fn> <value> [args...]`` — one-shot stdlib-function
      evaluation on JSON literals."""
    import json as _json

    import pyarrow as pa

    def lit(s):
        try:
            return _json.loads(s)
        except Exception:
            return s  # bare string convenience

    if args.program:
        from .vrl import compile_program

        event = lit(args.value if args.function is None else args.function)
        if not isinstance(event, dict):
            print("error: --program needs a JSON-object event")
            return 1
        try:
            prog = compile_program(args.program)
            # from_pylist([{}]) is a 0-column 0-ROW table; anchor the
            # single empty event with a dummy column so n == 1
            batch = (
                pa.table({"__cli_dummy": pa.array([None])})
                if not event
                else pa.Table.from_pylist([event])
            )
            out, err, abort, msgs = prog.run(batch)
            drop = [c for c in out.column_names
                    if c == "__cli_dummy" or c.startswith("__meta")]
            if drop:
                out = out.drop_columns(drop)
        except Exception as e:
            print(f"error: {e}")
            return 1
        if err[0].as_py():
            print(_json.dumps({"error": msgs[0].as_py()}))
            return 1
        if abort[0].as_py():
            print(_json.dumps({"aborted": msgs[0].as_py()}))
            return 1
        print(_json.dumps(out.to_pylist()[0], default=str))
        return 0

    from .functions import scalar

    col = pa.array([lit(args.value)])
    extra = [lit(a) for a in args.args]
    try:
        out = scalar.call(args.function, col, *extra)
    except Exception as e:
        print(f"error: {e}")
        return 1
    val = out[0].as_py() if isinstance(out, (pa.Array, pa.ChunkedArray)) else out
    print(_json.dumps(val, default=str))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vector_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="build the topology and run every sink")
    r.add_argument("config")
    r.add_argument("--out", help="write parquet sinks under this dir")
    r.set_defaults(fn=cmd_run)
    g = sub.add_parser("graph", help="print the topology as DOT")
    g.add_argument("config")
    g.set_defaults(fn=cmd_graph)
    v = sub.add_parser("validate", help="compile the config, report errors")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate)
    t = sub.add_parser("test", help="run behavior TOML tests")
    t.add_argument("path")
    t.set_defaults(fn=cmd_test)
    ls = sub.add_parser("list", help="list registered component types "
                                     "(`vector list` analog, cli.rs)")
    ls.set_defaults(fn=cmd_list)
    gen = sub.add_parser(
        "generate",
        help="print a config skeleton from 'source/transform,transform/sink' "
             "(`vector generate` analog, src/generate.rs): the first "
             "transform consumes the source, each subsequent one chains",
    )
    gen.add_argument("expression")
    gen.set_defaults(fn=cmd_generate)
    vrl = sub.add_parser(
        "vrl",
        help="`vector vrl` analog: vrl <fn> <value> [args...] for one "
             "stdlib call, or vrl --program '<source>' '<json event>' "
             "to run a full VRL program against one event",
    )
    vrl.add_argument("--program", help="VRL source program to run")
    vrl.add_argument("function", nargs="?")
    vrl.add_argument("value", nargs="?")
    vrl.add_argument("args", nargs="*")
    vrl.set_defaults(fn=cmd_vrl)
    tap = sub.add_parser(
        "tap",
        help="sample events flowing out of matching components "
             "(`vector tap` analog): tap config.toml [patterns...] "
             "[--limit N]",
    )
    tap.add_argument("config")
    tap.add_argument("patterns", nargs="*",
                     help="glob patterns over component names (default: *)")
    tap.add_argument("--limit", type=int, default=10,
                     help="events to sample per component output")
    tap.set_defaults(fn=cmd_tap)
    cc = sub.add_parser(
        "convert-config",
        help="load a TOML/JSON/YAML config and print it as JSON "
             "(`vector convert-config` analog)",
    )
    cc.add_argument("config")
    cc.set_defaults(fn=cmd_convert)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
