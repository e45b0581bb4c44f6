"""Job runner — the flagship pipeline as a resumable partitioned job.

The north-rule execution shape: the input's parquet shards are the
checkpoint partitions.  Each partition runs the full
parse → enrich → route pipeline and lands as
``out_dir/part-XXXXX/route=<sink>/*.parquet`` (atomic rename), with a
manifest recording input lineage, per-route row counts, token-volume
stage metrics and wall time.  A killed job reruns only partitions
without manifests; per-sink aggregate counters come from summing the
manifests — no re-scan of finished output.

On a real cluster this driver loop submits one Ray Data job per
partition group via ``ray job submit``; partitions are independent, so
any number can run in parallel (here: sequential, one Dataset per
partition, sized by task_cpus).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import pandas as pd

from .checkpoint import PartitionCheckpointer, run_partitioned
from .pipelines import flagship
from .sources.parquet import list_parquet_files, read_parquet_fast


def run_flagship_resumable(
    tokens_dir: str,
    out_dir: str,
    task_cpus: Optional[float] = None,
    fail_at: Optional[int] = None,
) -> Dict[str, dict]:
    """Run the flagship partition-by-partition with checkpoint manifests.

    fail_at: crash injection for resume tests (raise before partition i
    commits).  Returns this run's newly committed manifests.
    """
    if task_cpus is None:
        task_cpus = flagship.task_cpus_for_node()
    files = list_parquet_files(tokens_dir)
    state = {"i": 0}

    def process(f: str, pdir: str) -> dict:
        state["i"] += 1
        if fail_at is not None and state["i"] == fail_at:
            raise RuntimeError(f"injected failure before partition {fail_at}")
        ds = read_parquet_fast([f], num_cpus=task_cpus)
        tagged = flagship.pipeline(ds, task_cpus=task_cpus)
        t0 = time.time()
        tagged.write_parquet(pdir, partition_cols=["route"])
        write_secs = time.time() - t0
        # stage metrics from the written partition (cheap: local files)
        import glob

        import pyarrow.parquet as pq

        per_route: Dict[str, dict] = {}
        rows = 0
        for route_dir in sorted(glob.glob(os.path.join(pdir, "route=*"))):
            route = os.path.basename(route_dir).split("=", 1)[1]
            n = 0
            toks = 0
            for part in glob.glob(os.path.join(route_dir, "*.parquet")):
                md = pq.read_metadata(part)
                n += md.num_rows
            for part in glob.glob(os.path.join(route_dir, "*.parquet")):
                t = pq.read_table(part, columns=["n_tok"])
                toks += int(pd.Series(t["n_tok"].to_pylist()).sum())
            per_route[route] = {"rows": n, "tokens": toks}
            rows += n
        return {
            "rows": rows,
            "routes": per_route,
            "stage_metrics": {"write_secs": round(write_secs, 3), "task_cpus": task_cpus},
        }

    return run_partitioned(files, process, out_dir)


def sink_counts_from_manifests(out_dir: str) -> Dict[str, int]:
    """Per-sink row counts summed from manifests (no output re-scan)."""
    ck = PartitionCheckpointer(out_dir)
    totals: Dict[str, int] = {}
    for meta in ck.manifests().values():
        for route, m in meta.get("routes", {}).items():
            totals[route] = totals.get(route, 0) + m["rows"]
    return totals
