"""Canonical Arrow schemas + the deterministic synthetic token table.

The authoritative input (BASELINE.json input_hint) is a Parquet table of
pre-tokenized training sequences::

    doc_id: string        "doc-{i:012d}"
    tokens: list<int32>   values in [0, 50257)
    n_tok:  int32         16 + (i*i % 497); every 100th row gets 4096
    source: string        skewed categorical (web 60%, app 25%, syslog
                          10%, k8s 4%, edge 1%) — hot-key skew on purpose

Token values are a counter-based SplitMix64 mix of (row index i, token
position j): fully vectorized, partition-independent (any row range can
be generated without generating the rows before it — the property a
10^12-row generator on a real cluster needs), and recomputable by the
test oracle.  The per-row invariant checked end-to-end is exact
``tokens`` equality (BASELINE.json north_rule).

Metric-event schema mirrors Vector's MetricSeries/MetricData split
(reference lib/vector-core/src/event/metric/series.rs:11-18,
data.rs:12-21): series identity = (name, namespace, canonical tags).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

VOCAB = 50257
SEED = 42

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# Metric table: tags are a canonical sorted-key "k=v,k=v" string so that
# group-by identity reproduces Vector's MetricSeries equality (sorted
# ObjectMap keys, reference lib/vector-core/src/event/metric/series.rs).
METRIC_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("namespace", pa.string()),
        ("tags", pa.string()),
        ("kind", pa.string()),  # incremental | absolute
        ("value_type", pa.string()),  # counter | gauge | set | distribution
        ("value", pa.float64()),
        ("ts", pa.timestamp("us")),
    ]
)

# source distribution: cumulative thresholds over i % 100
_SOURCE_NAMES = np.array(["web", "app", "syslog", "k8s", "edge"])
_SOURCE_CUM = np.array([60, 85, 95, 99, 100])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer (public-domain constant set)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def n_tok_for(i: np.ndarray) -> np.ndarray:
    """Sequence length rule: Zipf-ish with a 1% wide-row tail."""
    i = i.astype(np.int64)
    n = 16 + (i * i) % 497
    n = np.where(i % 100 == 99, 4096, n)
    return n.astype(np.int32)


def source_for(i: np.ndarray) -> np.ndarray:
    """Skewed categorical source label per row index."""
    m = (i % 100).astype(np.int64)
    idx = np.searchsorted(_SOURCE_CUM, m, side="right")
    return _SOURCE_NAMES[idx]


def tokens_for_range(start: int, stop: int) -> pa.ListArray:
    """Generate the exact tokens list column for rows [start, stop).

    token[i][j] = splitmix64(i * 2^32 + j + SEED*PRIME) % VOCAB —
    counter-based so any shard is generated independently.
    """
    i = np.arange(start, stop, dtype=np.uint64)
    n = n_tok_for(i).astype(np.int64)
    offsets = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n, out=offsets[1:])
    total = int(offsets[-1])
    # flat (row, pos) counters
    row = np.repeat(i, n)
    pos = np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1].astype(np.uint64), n)
    ctr = (row << np.uint64(32)) + pos + np.uint64(SEED) * np.uint64(0x100000001B3)
    vals = (_splitmix64(ctr) % np.uint64(VOCAB)).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(vals))


def token_batch(start: int, stop: int) -> pa.Table:
    """One Arrow batch of the canonical token table, rows [start, stop)."""
    i = np.arange(start, stop, dtype=np.int64)
    doc_id = pa.array([f"doc-{k:012d}" for k in i], type=pa.string())
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens_for_range(start, stop),
            "n_tok": pa.array(n_tok_for(i)),
            "source": pa.array(source_for(i), type=pa.string()),
        }
    )


def sf_to_rows(sf_dir: str) -> int:
    """Map a testdata sf dir to the synthetic token-table size."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return {
        "sf0.001": 10_000,
        "sf0.01": 100_000,
        "sf0.1": 2_000_000,
    }.get(name, 10_000)


def token_table_path(n_rows: int, base: str = "/tmp/vector_ray_tokens") -> str:
    """Materialize (once) the token table as partitioned Parquet; return dir.

    Shards are independent (counter-based generator) and are written in
    parallel as Ray tasks when a Ray session exists (never initializes
    one), serially with pyarrow otherwise; the directory commits via
    atomic rename so a partially written cache is never read.
    """
    import pyarrow.parquet as pq

    out = os.path.join(base, f"n{n_rows}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    shard = 100_000
    ranges = [(s, min(s + shard, n_rows)) for s in range(0, n_rows, shard)]

    def _write(s: int, e: int) -> None:
        pq.write_table(token_batch(s, e), os.path.join(tmp, f"part-{s // shard:05d}.parquet"))

    ray_parallel = False
    try:
        import ray

        ray_parallel = ray.is_initialized() and len(ranges) > 1
    except Exception:
        pass
    if ray_parallel:
        import ray

        # generation is memory-bandwidth heavy: cap concurrency at ~4
        total = int(ray.cluster_resources().get("CPU", 4))
        task = ray.remote(num_cpus=max(1, total // 4))(_write)
        ray.get([task.remote(s, e) for s, e in ranges])
    else:
        for s, e in ranges:
            _write(s, e)
    import shutil

    if os.path.exists(out) and not os.path.exists(done):
        # stale partial build (crashed between rename and _SUCCESS) —
        # never stamp _SUCCESS onto it; replace with the fresh build
        shutil.rmtree(out, ignore_errors=True)
    if not os.path.exists(out):
        os.replace(tmp, out)
        with open(done, "w") as f:
            f.write("ok")
    else:  # out exists WITH _SUCCESS: another build won the race
        shutil.rmtree(tmp, ignore_errors=True)
    return out
