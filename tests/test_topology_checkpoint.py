"""Topology compile/build (config graph validation, port addressing,
fan-out) and checkpoint/resume (kill after k partitions → rerun skips)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vector_ray.checkpoint import PartitionCheckpointer, run_partitioned
from vector_ray.topology import Topology, build


def events_path(tmp_path):
    p = os.path.join(str(tmp_path), "ev.parquet")
    t = pa.table(
        {
            "id": pa.array(range(10)),
            "status": pa.array([200, 500, 200, 404, 500, 200, 200, 404, 500, 200]),
        }
    )
    pq.write_table(t, p)
    return p


def test_topology_end_to_end(tmp_path):
    cfg = {
        "sources": {"in": {"type": "parquet", "path": events_path(tmp_path)}},
        "transforms": {
            "errs": {"type": "filter", "inputs": ["in"], "condition": ".status >= 400"},
            "split": {
                "type": "route",
                "inputs": ["errs"],
                "routes": {"s5": ".status == 500", "s4": ".status == 404"},
            },
        },
        "sinks": {
            "five": {"type": "blackhole", "inputs": ["split.s5"]},
            "four": {"type": "blackhole", "inputs": ["split.s4"]},
        },
    }
    sinks = build(cfg)
    assert sinks["five"].count() == 3
    assert sinks["four"].count() == 2


def test_topology_validation_errors(tmp_path):
    p = events_path(tmp_path)
    with pytest.raises(ValueError, match="unknown input"):
        Topology(
            {
                "sources": {"in": {"type": "parquet", "path": p}},
                "sinks": {"out": {"type": "blackhole", "inputs": ["nope"]}},
            }
        )
    with pytest.raises(ValueError, match="needs at least one input"):
        Topology({"sinks": {"out": {"type": "blackhole", "inputs": []}}})
    with pytest.raises(ValueError, match="cycle"):
        Topology(
            {
                "transforms": {
                    "a": {"type": "filter", "inputs": ["b"], "condition": ".x > 1"},
                    "b": {"type": "filter", "inputs": ["a"], "condition": ".x > 1"},
                },
            }
        )


def test_topology_union_inputs(tmp_path):
    p = events_path(tmp_path)
    cfg = {
        "sources": {"a": {"type": "parquet", "path": p}, "b": {"type": "parquet", "path": p}},
        "sinks": {"out": {"type": "blackhole", "inputs": ["a", "b"]}},
    }
    assert build(cfg)["out"].count() == 20


def test_demo_source_topology():
    cfg = {
        "sources": {"gen": {"type": "demo_logs", "count": 100, "format": "json"}},
        "transforms": {
            "parsed": {
                "type": "remap",
                "inputs": ["gen"],
                "steps": [("parse_json", "message", ["level", "code"], {"code": pa.int64()})],
                "drop_on_error": True,
            },
            "errors": {"type": "filter", "inputs": ["parsed"], "condition": ".code == 500"},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["errors"]}},
    }
    assert build(cfg)["out"].count() == 10  # k%10==9 of 100


def test_checkpoint_resume(tmp_path):
    base = str(tmp_path / "out")
    inputs = [f"shard-{i}" for i in range(5)]
    calls = []
    fail_once = {"shard-3": True}

    def process(f, outdir):
        calls.append(f)
        if fail_once.pop(f, False):
            raise RuntimeError("killed")
        with open(os.path.join(outdir, "data.txt"), "w") as fh:
            fh.write(f)
        return {"rows": 1}

    with pytest.raises(RuntimeError):
        run_partitioned(inputs, process, base, partition_of=lambda f: f)
    ck = PartitionCheckpointer(base)
    assert ck.pending(inputs) == ["shard-3", "shard-4"]
    # no partial output directory left behind for the failed shard
    assert not os.path.exists(os.path.join(base, "shard-3"))
    # resume: only the missing two run
    calls.clear()
    done = run_partitioned(inputs, process, base, partition_of=lambda f: f)
    assert calls == ["shard-3", "shard-4"]
    assert set(done) == {"shard-3", "shard-4"}
    assert ck.pending(inputs) == []
    m = ck.manifests()
    assert len(m) == 5 and all("wall_secs" in v for v in m.values())


def test_sink_type_collides_with_source_type(tmp_path):
    # regression: a sink of type "parquet" must not resolve to the
    # parquet *source* builder
    cfg = {
        "sources": {"in": {"type": "parquet", "path": events_path(tmp_path)}},
        "sinks": {"out": {"type": "parquet", "inputs": ["in"]}},
    }
    assert build(cfg)["out"].count() == 10


def test_registry_passthroughs(tmp_path):
    """New options reach the stages through the config registry."""
    cfg = {
        "sources": {
            "in": {
                "type": "inline",
                "rows": [
                    {"k": "a", "v": 1.0, "noise": "x", "ts": 0},
                    {"k": "a", "v": 2.0, "noise": "y", "ts": 30_000_000},
                ],
            }
        },
        "transforms": {
            "dedup": {"type": "dedupe", "inputs": ["in"], "ignore": ["noise", "ts"], "order_by": "ts"},
            "hop": {
                "type": "hopping_agg",
                "inputs": ["in"],
                "keys": ["k"],
                "aggs": [["v", "sum", "total"]],
                "ts_field": "ts",
                "size_ms": 60_000,
                "slide_ms": 30_000,
            },
        },
        "sinks": {
            "d": {"type": "blackhole", "inputs": ["dedup"]},
            "h": {"type": "blackhole", "inputs": ["hop"]},
        },
    }
    sinks = build(cfg)
    assert sinks["d"].count() == 2  # v differs → not dups under ignore
    hop_rows = {str(r["window_start"]): r["total"] for r in sinks["h"].take_all()}
    assert hop_rows["1970-01-01 00:00:00"] == 3.0


def test_csv_json_sinks_write_native_formats(ray_session, tmp_path):
    """sink type csv/json must land on disk in that format (not parquet)."""
    import glob
    import json as jsonlib

    import pyarrow.csv as pacsv

    from vector_ray.sinks import write_sinks

    ds = rd.from_arrow(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    paths = write_sinks(
        {"c": ds, "j": ds}, str(tmp_path), formats={"c": "csv", "j": "json"}
    )
    csv_files = glob.glob(paths["c"] + "/*")
    assert csv_files
    got = pacsv.read_csv(csv_files[0])
    assert got.num_rows == 3 and set(got.column_names) == {"a", "b"}
    json_files = glob.glob(paths["j"] + "/*")
    rows = []
    for f in json_files:
        with open(f) as fh:
            rows += [jsonlib.loads(line) for line in fh if line.strip()]
    assert sorted(r["a"] for r in rows) == [1, 2, 3]


def test_python_transform_lifecycle_hooks(ray_session):
    """init() once per actor, process(batch, state) per batch."""
    import pyarrow.compute as pc

    def init():
        return {"offset": 100}

    def process(batch, state):
        return batch.set_column(
            batch.schema.get_field_index("v"), "v",
            pc.add(batch["v"], state["offset"]),
        )

    cfg = {
        "sources": {"src": {"type": "inline", "rows": [{"v": 1}, {"v": 2}, {"v": 3}]}},
        "transforms": {
            "bump": {"type": "python", "inputs": ["src"], "init": init,
                     "process": process, "concurrency": 1},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["bump"]}},
    }
    sinks = build(cfg)
    got = sorted(sinks["out"].to_pandas()["v"])
    assert got == [101, 102, 103]


def test_checkpoint_accepts_legacy_manifest(tmp_path):
    """ADVICE r2 (low): manifests committed under the round-1
    part-<basename> id must still count as done on resume."""
    import json
    import os

    from vector_ray.checkpoint import run_partitioned

    src = tmp_path / "in" / "shard0.parquet"
    src.parent.mkdir()
    src.write_text("x")
    out = tmp_path / "out"
    mdir = out / "_manifest"
    mdir.mkdir(parents=True)
    (mdir / "part-shard0.json").write_text(
        json.dumps({"partition": "part-shard0", "rows": 5})
    )
    calls = []

    def process(f, pdir):
        calls.append(f)
        return {"rows": 0}

    done = run_partitioned([str(src)], process, str(out))
    assert calls == [], "legacy-completed partition was reprocessed"
    assert done == {}


def test_python_transform_timer_hook(ray_session):
    """lua v2 timer analog (src/transforms/lua/v2/mod.rs:28-79): the
    timer hook fires once per elapsed event-time interval and its
    emitted rows join the stream (null-padded to the union schema)."""
    import pyarrow as pa

    from vector_ray.topology import build

    rows = [{"ts": t * 1_000_000, "n": i}
            for i, t in enumerate([1, 2, 11, 22, 35])]

    def init():
        return {"seen": 0, "fires": []}

    def process(batch, state):
        state["seen"] += batch.num_rows
        return batch.append_column(
            "flush", pa.array([False] * batch.num_rows))

    def timer_hook(state, fire_ts_us):
        state["fires"].append(fire_ts_us)
        return [{"ts": fire_ts_us, "n": -1, "flush": True,
                 "seen_so_far": state["seen"]}]

    cfg = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "udf": {"type": "python", "inputs": ["in"],
                    "init": init, "process": process,
                    "timer": {"interval_ms": 10_000, "hook": timer_hook},
                    "ts_field": "ts"},
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["udf"]}},
    }
    out = build(cfg)["out"].to_pandas()
    data = out[~out["flush"]]
    fires = out[out["flush"]].sort_values("ts")
    assert len(data) == 5
    # event time spans 1s..35s → fires at 10s, 20s, 30s boundaries
    assert list(fires["ts"]) == [10_000_000, 20_000_000, 30_000_000]
    assert (data["seen_so_far"].isna()).all()  # padded on data rows


def test_manifest_content_hash(tmp_path, ray_session):
    """Each committed partition manifest carries a content hash of its
    output bytes (per-partition lineage for resume audits)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vector_ray.checkpoint import run_partitioned

    src = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"x": [1, 2, 3]}), src)

    def process(f, out_dir):
        t = pq.read_table(f)
        pq.write_table(t, os.path.join(out_dir, "out.parquet"))
        return {"rows": t.num_rows}

    done = run_partitioned([src], process, str(tmp_path / "out"))
    (pid, meta), = done.items()
    assert meta["rows"] == 3 and len(meta["content_hash"]) == 32
    mpath = tmp_path / "out" / "_manifest" / f"{pid}.json"
    on_disk = json.loads(mpath.read_text())
    assert on_disk["content_hash"] == meta["content_hash"]


def test_cli_generate_and_list(capsys):
    """`generate` prints a chained skeleton (generate.rs analog);
    `list` prints the component registry."""
    import json

    from vector_ray.__main__ import main

    assert main(["generate", "text/remap,filter/parquet"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["transforms"]["transform1"]["inputs"] == ["transform0"]
    assert cfg["sinks"]["sink0"]["inputs"] == ["transform1"]
    assert main(["generate", "text/bogus/parquet"]) == 1
    capsys.readouterr()
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "remap" in out and "scalar functions:" in out


def test_cli_vrl_one_shot(capsys):
    import json

    from vector_ray.__main__ import main

    assert main(["vrl", "upcase", "hello"]) == 0
    assert json.loads(capsys.readouterr().out) == "HELLO"
    assert main(["vrl", "nope", "x"]) == 1


def test_cli_vrl_program(capsys):
    import json

    from vector_ray.__main__ import main

    assert main(["vrl", "--program", '.b = .a * 2\nif .b > 5 { .big = true } else { .big = false }', '{"a": 4}']) == 0
    assert json.loads(capsys.readouterr().out) == {"a": 4, "b": 8, "big": True}
    # a failing fallible call reports the error and exits nonzero
    assert main(["vrl", "--program", ". = parse_json!(.m)", '{"m": "oops"}']) == 1
    assert "error" in json.loads(capsys.readouterr().out)
    assert main(["vrl", "--program", 'abort "no"', '{"a": 1}']) == 1
    assert json.loads(capsys.readouterr().out) == {"aborted": "no"}


def test_cli_json_config(tmp_path, capsys, ray_session):
    """validate accepts JSON configs (config/format.rs multi-format)."""
    import json

    from vector_ray.__main__ import main

    cfg = {
        "sources": {"in": {"type": "inline", "rows": [{"x": 1}]}},
        "transforms": {"t": {"type": "filter", "inputs": ["in"],
                             "condition": ".x == 1"}},
        "sinks": {},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    assert main(["validate", str(p)]) == 0


def test_remap_file_config(ray_session, tmp_path):
    """remap.rs:55 `file` — VRL program loaded from a .vrl file
    (tests/behavior/transforms/remap.toml remap_file)."""
    from vector_ray import topology

    prog = tmp_path / "program.vrl"
    prog.write_text('.message = "foo"\n')
    out = topology.build(
        {
            "sources": {"in": {"type": "inline", "rows": [{"foo": True}]}},
            "transforms": {
                "r": {"type": "remap", "inputs": ["in"], "file": str(prog)}
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["r"]}},
        }
    )["out"]
    rows = out.take_all()
    assert rows[0]["message"] == "foo" and rows[0]["foo"] is True
    with pytest.raises(ValueError, match="mutually exclusive"):
        topology.build(
            {
                "sources": {"in": {"type": "inline", "rows": [{"foo": True}]}},
                "transforms": {
                    "r": {"type": "remap", "inputs": ["in"],
                          "file": str(prog), "source": ".x = 1"}
                },
                "sinks": {"out": {"type": "sink_blackhole", "inputs": ["r"]}},
            }
        )


def test_multi_input_dedupe_into_reduce(ray_session):
    """tests/behavior/transforms/task_transform.toml
    dedupe_into_reduce_with_multiple_inputs: two remap streams union
    into one dedupe (duplicate id collapses across inputs), whose
    output unions with a third stream into a reduce that merges both
    events (counter sums to 2, field3 survives)."""
    from vector_ray import topology

    row = {"message": "some message", "counter": 1}
    out = topology.build(
        {
            "sources": {
                "in1": {"type": "inline", "rows": [dict(row, id=1)]},
                "in2": {"type": "inline", "rows": [dict(row, id=1)]},
                "in3": {"type": "inline", "rows": [dict(row)]},
            },
            "transforms": {
                "field1": {"type": "remap", "inputs": ["in1"],
                           "source": '.field1 = "value1"'},
                "field2": {"type": "remap", "inputs": ["in2"],
                           "source": '.field2 = "value2"'},
                "field3": {"type": "remap", "inputs": ["in3"],
                           "source": '.field3 = "value3"'},
                "dedupe2": {"type": "dedupe", "inputs": ["field1", "field2"],
                            "fields": ["id"]},
                "reduce2": {"type": "reduce",
                            "inputs": ["field3", "dedupe2"],
                            "group_by": ["message"]},
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["reduce2"]}},
        }
    )["out"]
    rows = out.take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["message"] == "some message"
    assert r["field3"] == "value3"
    assert r["counter"] == 2  # one deduped event + the field3 event


def test_cli_tap_samples_component_outputs(ray_session, tmp_path, capsys):
    """`tap` prints sampled events per matching component, including
    route ports (vector tap analog)."""
    import json as _json

    from vector_ray.__main__ import main

    cfg = tmp_path / "tap.toml"
    cfg.write_text("""
[sources.in]
type = "inline"
rows = [
  { level = "error", msg = "boom" },
  { level = "info", msg = "fine" },
]

[transforms.split]
type = "route"
inputs = ["in"]
[transforms.split.routes]
err = '.level == "error"'
ok = '.level == "info"'
""")
    assert main(["tap", str(cfg), "split", "--limit", "5"]) == 0
    lines = [
        _json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    comps = {l["component"] for l in lines}
    assert {"split.err", "split.ok"} <= comps
    err_events = [l["event"] for l in lines if l["component"] == "split.err"]
    assert err_events and err_events[0]["msg"] == "boom"
    # no match → error exit
    assert main(["tap", str(cfg), "nope*"]) == 1
