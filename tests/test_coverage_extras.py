"""static_enrich, trace_to_log, IP-range enrichment, bloom
tag_cardinality, csv/json/text sources+sinks, sort/limit, DOT dump."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.topology import build, to_dot


def test_static_enrich():
    from vector_ray.stages.static_enrich import static_enrich

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2])}))
    out = static_enrich(ds, {"instance_id": "i-abc123", "az": "us-east-1a"})
    rows = out.take_all()
    assert all(r["instance_id"] == "i-abc123" and r["az"] == "us-east-1a" for r in rows)


def test_trace_to_log():
    from vector_ray.stages.static_enrich import trace_to_log

    ds = rd.from_arrow(
        pa.table({"span_name": pa.array(["db.query"]), "span_ts": pa.array([1])})
    )
    r = trace_to_log(ds).take_all()[0]
    assert r["message"] == "db.query" and r["source_type"] == "trace"
    assert "timestamp" in r


def test_ip_range_enrich():
    from vector_ray.enrich_ip import IpRangeTable, ip_enrich

    ranges = pa.table(
        {
            "start_ip": pa.array(["10.0.0.0", "192.168.0.0"]),
            "end_ip": pa.array(["10.255.255.255", "192.168.255.255"]),
            "net": pa.array(["corp", "lan"]),
        }
    )
    table = IpRangeTable(ranges)
    ds = rd.from_arrow(
        pa.table({"ip": pa.array(["10.1.2.3", "192.168.5.5", "8.8.8.8"])})
    )
    rows = ip_enrich(ds, table, "ip").take_all()
    got = {r["ip"]: r["net"] for r in rows}
    assert got == {"10.1.2.3": "corp", "192.168.5.5": "lan", "8.8.8.8": None}


def test_ip_range_overlap_rejected():
    from vector_ray.enrich_ip import IpRangeTable

    bad = pa.table(
        {
            "start_ip": pa.array(["10.0.0.0", "10.0.0.5"]),
            "end_ip": pa.array(["10.0.0.9", "10.0.0.20"]),
            "v": pa.array(["a", "b"]),
        }
    )
    with pytest.raises(ValueError, match="overlapping"):
        IpRangeTable(bad)


def test_bloom_filter():
    from vector_ray.state.bloom import BloomFilter

    bf = BloomFilter(capacity=100, fp_rate=0.01)
    bf.add_array([f"v{i}" for i in range(50)])
    assert bf.contains_array([f"v{i}" for i in range(50)]).all()  # no false negatives
    fp = bf.contains_array([f"other{i}" for i in range(1000)]).mean()
    assert fp < 0.05


def test_tag_cardinality_probabilistic():
    from vector_ray.stages import tag_cardinality_limit

    t = pa.table(
        {
            "tag_user": pa.array([f"u{i}" for i in [0, 1, 2, 0, 3, 1]]),
            "seq": pa.array([0, 1, 2, 3, 4, 5]),
        }
    )
    out = tag_cardinality_limit(
        rd.from_arrow(t), ["tag_user"], value_limit=2, order_by="seq",
        limit_exceeded_action="drop_event", mode="probabilistic",
    )
    kept = sorted(r["seq"] for r in out.take_all())
    # bloom has no false negatives: u0/u1 rows always kept; with this tiny
    # filter no false positives either
    assert kept == [0, 1, 3, 5]


def test_csv_json_text_sources_and_sinks(tmp_path):
    import pyarrow.csv as pa_csv

    p_csv = str(tmp_path / "in.csv")
    pa_csv.write_csv(pa.table({"a": pa.array([1, 2, 3])}), p_csv)
    with open(tmp_path / "in.jsonl", "w") as f:
        f.write('{"a": 5}\n{"a": 6}\n')
    with open(tmp_path / "in.txt", "w") as f:
        f.write("line one\nline two\n")

    cfg = {
        "sources": {
            "c": {"type": "csv", "path": p_csv},
            "j": {"type": "json", "path": str(tmp_path / "in.jsonl")},
            "t": {"type": "text", "path": str(tmp_path / "in.txt")},
        },
        "transforms": {
            "top": {"type": "sort", "inputs": ["c"], "key": "a", "descending": True},
            "lim": {"type": "limit", "inputs": ["top"], "n": 2},
        },
        "sinks": {
            "out_csv": {"type": "csv", "inputs": ["lim"]},
            "out_json": {"type": "json", "inputs": ["j"]},
            "out_txt": {"type": "blackhole", "inputs": ["t"]},
        },
    }
    sinks = build(cfg)
    assert [r["a"] for r in sinks["out_csv"].take_all()] == [3, 2]
    assert sinks["out_json"].count() == 2
    assert sinks["out_txt"].count() == 2


def test_to_dot():
    cfg = {
        "sources": {"gen": {"type": "demo_logs", "count": 1}},
        "transforms": {
            "r": {"type": "route", "inputs": ["gen"], "routes": {"a": ".host == 'h'"}}
        },
        "sinks": {"s": {"type": "blackhole", "inputs": ["r.a"]}},
    }
    dot = to_dot(cfg)
    assert '"gen" -> "r"' in dot and '"r" -> "s" [label="a"]' in dot
    assert "digraph" in dot


def test_cli_subcommands(tmp_path):
    """CLI parity: validate / graph / run (the `vector` binary analog)."""
    import json
    import subprocess
    import sys

    cfg = tmp_path / "c.toml"
    cfg.write_text(
        """
[sources.gen]
type = "demo_logs"
count = 100
format = "json"

[transforms.f]
type = "filter"
inputs = ["gen"]
condition = "contains(.message, '500')"

[sinks.out]
type = "blackhole"
inputs = ["f"]
"""
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "RAY_GRAFT_CPUS": "2",
           "HOME": "/root"}
    r = subprocess.run([sys.executable, "-m", "vector_ray", "validate", str(cfg)],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0 and "ok" in r.stdout
    r = subprocess.run([sys.executable, "-m", "vector_ray", "graph", str(cfg)],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    assert '"gen" -> "f"' in r.stdout
    r = subprocess.run([sys.executable, "-m", "vector_ray", "run", str(cfg)],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["sinks"]["out"]["rows"] == 10  # k%10==9 of 100 → code 500


def test_parse_url():
    from vector_ray.stages import remap

    ds = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "https://user:pw@example.com:8443/a/b?x=1&y=2#frag",
                        "http://plain.org/",
                        "not a url",
                    ]
                )
            }
        )
    )
    out = remap(ds, [("parse_url", "url")]).take_all()
    r = out[0]
    assert (r["scheme"], r["host"], r["port"], r["path"], r["query"], r["fragment"]) == (
        "https", "example.com", 8443, "/a/b", "x=1&y=2", "frag"
    )
    assert r["username"] == "user" and r["password"] == "pw"
    assert out[1]["host"] == "plain.org" and out[1]["port"] is None
    # unparseable row forwards rolled back (no internal flag columns):
    # original field intact, extracted columns null
    assert out[2]["url"] == "not a url" and out[2]["host"] is None


def test_hopping_window_agg():
    from vector_ray.stages.windowed_agg import hopping_agg, tumbling_agg

    # rows at t=0,30,60,90 sec; size=60s slide=30s
    t = pa.table(
        {
            "k": pa.array(["a"] * 4),
            "v": pa.array([1.0, 2.0, 4.0, 8.0]),
            "ts": pa.array([0, 30_000_000, 60_000_000, 90_000_000], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    df = hopping_agg(
        rd.from_arrow(t), ["k"], [("v", "sum", "total")], ts_field="ts",
        size_ms=60_000, slide_ms=30_000,
    )
    got = {str(w): v for w, v in zip(df["window_start"], df["total"])}
    # windows: [-30,30)(clipped→only w=0), [0,60)=1+2, [30,90)=2+4, [60,120)=4+8, [90,150)=8
    assert got["1970-01-01 00:00:00"] == 3.0
    assert got["1970-01-01 00:00:30"] == 6.0
    assert got["1970-01-01 00:01:00"] == 12.0
    assert got["1970-01-01 00:01:30"] == 8.0
    tdf = tumbling_agg(rd.from_arrow(t), ["k"], [("v", "sum", "total")], ts_field="ts", size_ms=60_000)
    assert sorted(tdf["total"]) == [3.0, 12.0]


def test_bucketed_join_matches_pandas():
    from vector_ray.stages.join import bucketed_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3]), "lv": pa.array(["a", "b", "c", "d"])})
    )
    right = rd.from_arrow(
        pa.table({"k2": pa.array([2, 3, 4]), "rv": pa.array(["x", "y", "z"])})
    )
    out = bucketed_join(left, right, on=["k"], right_on=["k2"], how="inner").to_pandas()
    got = sorted((int(r.k), r.lv, r.rv) for r in out.itertuples())
    assert got == [(2, "b", "x"), (2, "c", "x"), (3, "d", "y")]


def test_demo_logs_formats(ray_session):
    from vector_ray.parse import parse_apache_log
    from vector_ray.sources.demo import demo_logs

    for fmt in ("apache_common", "apache_error", "syslog", "bsd_syslog", "json"):
        df = demo_logs(6, fmt).to_pandas()
        assert len(df) == 6 and df["message"].notna().all()
    # apache_common output must round-trip through the apache parser
    msgs = demo_logs(6, "apache_common").to_pandas()["message"]
    t, err = parse_apache_log(pa.array(msgs.tolist()))
    assert not any(err.to_pylist())
    assert set(t["status"].to_pylist()) <= {200, 404, 500}
    sh = demo_logs(5, "shuffle", lines=["x", "y"]).to_pandas()
    assert sh["message"].tolist() == ["x", "y", "x", "y", "x"]


def test_refreshing_enrich_propagates_midstream_change(ray_session, tmp_path):
    """VERDICT r2 item 7 (aws_ec2_metadata.rs refresh_interval): a
    change in the metadata source between batches reaches later
    batches.  The fetch_fn increments a counter file on every fetch, so
    with refresh_every_batches=1 each batch sees a new value."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.static_enrich import refreshing_enrich

    state = tmp_path / "meta.txt"
    state.write_text("0")
    path = str(state)

    def fetch():
        v = int(open(path).read()) + 1
        open(path, "w").write(str(v))
        return {"meta_v": v}

    t = pa.table({"i": pa.array(list(range(6)), type=pa.int64())})
    # 3 blocks of 2 rows → at least 3 sequential batches on one actor
    ds = rd.from_arrow(t).repartition(3)
    out = refreshing_enrich(
        ds, fetch, refresh_every_batches=1, concurrency=1, batch_size=2
    ).to_pandas()
    assert len(out) == 6
    seen = sorted(out["meta_v"].unique())
    assert len(seen) >= 2, f"refresh never propagated: {seen}"
    assert seen[0] >= 1
