"""default_pool / default_partitions scale with the cluster.

VERDICT r3 item 1: hardcoded (1,2)/(1,4) actor pools would cap a
256-node cluster's stage at 2-4 actors.  The computed pool upper bound
must track ray.cluster_resources()["CPU"], honor the env override, and
no pipeline module may retain a hardcoded cap.
"""

import os
import pathlib

import ray

from vector_ray.functions.hashes import default_partitions, default_pool


def test_default_pool_tracks_cluster_resources(ray_session):
    cpus = int(ray.cluster_resources()["CPU"])
    lo, hi = default_pool(divisor=1)
    assert lo == 1
    assert hi == max(2, min(512, cpus))  # divisor=1 → one actor per CPU
    # the production divisors stay proportional to the cluster
    assert default_pool(divisor=8)[1] == max(2, min(512, cpus // 8))
    assert default_pool(divisor=16)[1] == max(2, min(512, cpus // 16))


def test_default_pool_env_override(ray_session, monkeypatch):
    monkeypatch.setenv("VECTOR_RAY_POOL_MAX", "7")
    assert default_pool() == (1, 7)
    monkeypatch.delenv("VECTOR_RAY_POOL_MAX")
    assert default_pool(divisor=8)[1] >= 2


def test_default_pool_without_ray():
    # import-time safe: no initialized Ray → floor
    import subprocess
    import sys

    code = (
        "from vector_ray.functions.hashes import default_pool;"
        "print(default_pool())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(pathlib.Path(__file__).resolve().parents[1]),
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "(1, 2)"


def test_no_hardcoded_actor_pool_caps_in_source():
    """No (1, 2)/(1, 4) literals left at map_batches call sites."""
    root = pathlib.Path(__file__).resolve().parents[1] / "vector_ray"
    offenders = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if "concurrency=(1," in line.replace(" ", ""):
                offenders.append(f"{p}:{i}")
    assert not offenders, offenders


def test_default_partitions_tracks_cluster(ray_session):
    cpus = int(ray.cluster_resources()["CPU"])
    assert default_partitions() == max(32, min(1024, cpus * 2))
