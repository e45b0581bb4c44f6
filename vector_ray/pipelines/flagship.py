"""Flagship pipeline — parse → enrich → route → aggregate over the
pre-tokenized sequence table (the north-rule pipeline).

    read_parquet(tokens)                       doc_id, tokens, n_tok, source
      → render message (deterministic)         demo_logs analog, oracle-checkable
      → grok parse (vectorized extract_regex)  status/bytes/first_tok/... columns
      → enrich source → (region, tier)         broadcast hash join
      → route by status/size                   ok / errors / big / _unmatched
      → per-sink aggregates                    groupby counters (log_to_metric edge)
      → parquet sinks                          token arrays preserved byte-exact

Every stage streams; the only materialization is the fan-out parent
(route masks) when separate sink datasets are requested — the
single-pass ``tagged`` mode avoids even that.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import parse
from ..enrich import EnrichTable, enrich
from ..schema import token_table_path
from ..stages import route_tagged

ROUTES = {
    "errors": ".status == 500",
    "big": ".n_tok >= 1024",
    "ok": ".status == 200 || .status == 404",
}

ENRICH_ROWS = {
    "source": ["web", "app", "syslog", "k8s", "edge"],
    "region": ["us-east", "eu-west", "us-east", "ap-south", "eu-west"],
    "tier": [1, 2, 1, 3, 2],
}


def enrich_table() -> EnrichTable:
    t = pa.table(
        {
            "source": pa.array(ENRICH_ROWS["source"]),
            "region": pa.array(ENRICH_ROWS["region"]),
            "tier": pa.array(ENRICH_ROWS["tier"], type=pa.int32()),
        }
    )
    return EnrichTable(t, ["source"])


def _parse_stage():
    """One fused kernel: render message → grok parse → keep parsed cols.

    Fused so the synthetic message string never crosses a stage
    boundary (it exists only inside the batch function — zero extra
    object-store traffic for the rendered bytes).
    """
    parser = parse.GrokParser(parse.ACCESS_GROK)

    def _fn(batch: pa.Table) -> pa.Table:
        rendered = parse.render_messages(batch)
        cols, err = parser.parse(rendered["message"])
        out = batch
        for name in ("method", "status", "first_tok", "last_tok"):
            out = out.append_column(name, cols[name])
        return out.filter(pc.invert(err))  # drop unparseable (none by construction)

    return _fn


def task_cpus_for_node() -> float:
    """CPUs reserved per heavy pipeline task.

    On real cluster nodes 1 CPU per task is right (set
    VECTOR_RAY_TASK_CPUS=1).  This sandbox VM's 32 vCPUs are backed by
    ~4 physical cores (measured: flagship wall at num_cpus 1/2/4/8/16/32
    = 35/17/9.8/11/22/35 s), so by default we reserve total/4 CPUs per
    task — capping heavy-stage concurrency at 4 to avoid host
    oversubscription collapse.  See BASELINE.md.
    """
    import ray

    env = os.environ.get("VECTOR_RAY_TASK_CPUS")
    if env:
        return float(env)
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 1.0
    return max(1.0, total / 4)


def pipeline(tokens_ds, materialize_fanout: bool = False, task_cpus: float = 1.0):
    """Build the tagged (single-pass) flagship pipeline → tagged Dataset.

    All stages share the same num_cpus so Ray fuses them into one
    task per input shard (no intermediate object-store traffic).
    """
    parsed = tokens_ds.map_batches(
        _parse_stage(), batch_format="pyarrow", batch_size=None, num_cpus=task_cpus
    )
    enriched = enrich(parsed, enrich_table(), on=["source"], num_cpus=task_cpus)
    return route_tagged(enriched, ROUTES, num_cpus=task_cpus)


def run(
    tokens_dir: Optional[str] = None,
    n_rows: int = 10_000,
    out_dir: Optional[str] = None,
    columns=None,
    task_cpus: Optional[float] = None,
):
    """Execute the flagship; returns (sink_counts, aggregates_df).

    When out_dir is set the tagged stream lands as hive-partitioned
    parquet (one dir per sink) in a single pass; otherwise it is
    consumed by the aggregate only.
    """
    from ..sources.parquet import read_parquet_fast

    if task_cpus is None:
        task_cpus = task_cpus_for_node()
    tokens_dir = tokens_dir or token_table_path(n_rows)
    ds = read_parquet_fast(tokens_dir, columns=columns, num_cpus=task_cpus)
    tagged = pipeline(ds, task_cpus=task_cpus)
    if out_dir:
        tagged.write_parquet(out_dir, partition_cols=["route"], compression="lz4")
        # aggregate from the written files, reading ONLY the narrow
        # columns (the tokens payload — ~98% of the bytes — stays on disk)
        tagged = rd.read_parquet(out_dir, columns=["route", "region", "status", "n_tok"])
    # per-sink aggregate counters (log_to_metric at the sink edge):
    # count + token volume per (route, region, status).  Pre-aggregate
    # per batch (pyarrow C++ group_by) and combine the tiny partials —
    # the tokens lists (~99% of the bytes) never enter any shuffle.
    from ..stages.partial_agg import grouped_aggregate

    agg = grouped_aggregate(
        tagged,
        ["route", "region", "status"],
        num_cpus=task_cpus,
        aggs=[
            ("n_tok", "count", "n_rows"),
            ("n_tok", "sum", "total_tokens"),
            ("n_tok", "max", "max_tokens"),
        ],
    )
    counts = agg.groupby("route")["n_rows"].sum().to_dict()
    return counts, agg
