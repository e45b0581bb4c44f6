"""The runnable example configs: each must drive the CLI end-to-end
(the 'a reference user could switch' criterion is config-level)."""

import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001/documents.parquet"),
    reason="driver testdata not present",
)
def test_training_data_example(tmp_path):
    out_dir = str(tmp_path / "sinks")
    env = dict(os.environ, RAY_GRAFT_CPUS="4", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "vector_ray", "run",
         os.path.join(REPO, "examples/training_data.toml"), "--out", out_dir],
        env=env, capture_output=True, text=True, timeout=400, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    curated = result["sinks"]["curated"]["path"]
    # hive partitioning by predicted language materialized
    parts = [p for p in os.listdir(curated) if p.startswith("lang_pred=")]
    assert parts, os.listdir(curated)
    df = duckdb.sql(
        f"select * from read_parquet('{curated}/**/*.parquet', hive_partitioning=1)"
    ).df()
    # dedup keeps doc_id unique; the VRL gate kept only keep==true rows
    assert len(df) > 0
    assert df["doc_id"].is_unique
    assert bool(df["keep"].all())
    assert (df["quality_score"] > 0.3).all() and (df["n_ws_tokens"] > 3).all()
