"""Scale stress harness — the BASELINE.md large-run numbers reproduce
from here (python tools/stress.py
{flagship10m|resume10m|minhash|simhash|embedding|tagcard1m|aggseries1m}).

Each mode synthesizes its input deterministically, runs the pipeline at
a scale 20-100× the oracle fixtures, asserts the EXACT expected result,
and prints one JSON line with wall time and throughput.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _gen_docs(n):
    import ray.data as rd

    def gen(batch):
        ids = batch["id"].to_numpy()
        texts = [" ".join("w%d" % ((i * 31 + j) % 50) for j in range(40))
                 for i in ids.tolist()]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    return rd.range(n).map_batches(gen, batch_format="pyarrow")


def flagship10m():
    from vector_ray import schema
    from vector_ray.pipelines import flagship

    n = 10_000_000
    tokens_dir = schema.token_table_path(n)
    t0 = time.time()
    counts, _ = flagship.run(tokens_dir=tokens_dir, n_rows=n)
    wall = time.time() - t0
    assert sum(counts.values()) == int(n * 1.01)
    return {"rows": n, "wall": round(wall, 1), "rows_per_sec": round(n / wall)}


def resume10m():
    from vector_ray import schema
    from vector_ray.runner import run_flagship_resumable, sink_counts_from_manifests

    n = 10_000_000
    tokens_dir = schema.token_table_path(n)
    out = "/tmp/stress_resume_out"
    shutil.rmtree(out, ignore_errors=True)
    try:
        run_flagship_resumable(tokens_dir, out, fail_at=61)
        raise AssertionError("expected injected failure")
    except RuntimeError:
        pass
    t0 = time.time()
    second = run_flagship_resumable(tokens_dir, out)
    counts = sink_counts_from_manifests(out)
    shutil.rmtree(out, ignore_errors=True)
    assert sum(counts.values()) == int(n * 1.01)
    return {"resumed_partitions": len(second), "resume_wall": round(time.time() - t0, 1),
            "sink_counts": counts}


def minhash():
    from vector_ray.pipelines.dedup import minhash_lsh_dedup
    from vector_ray.pipelines.dedup_fixture import planted_minhash_corpus

    n = 100_000
    corpus = planted_minhash_corpus(_gen_docs(n)).materialize()
    nc = corpus.count()
    t0 = time.time()
    n_out = minhash_lsh_dedup(corpus, jaccard_threshold=0.7).count()
    wall = time.time() - t0
    assert n_out == n, (n_out, n)
    return {"corpus": nc, "survivors": n_out, "wall": round(wall, 1),
            "docs_per_sec": round(nc / wall)}


def simhash():
    from vector_ray.pipelines.dedup import simhash_dedup
    from vector_ray.pipelines.dedup_fixture import planted_simhash_corpus

    n = 100_000
    corpus = planted_simhash_corpus(_gen_docs(n)).materialize()
    nc = corpus.count()
    t0 = time.time()
    n_out = simhash_dedup(corpus, hamming_k=0).count()
    wall = time.time() - t0
    assert n_out == n, (n_out, n)
    return {"corpus": nc, "survivors": n_out, "wall": round(wall, 1),
            "docs_per_sec": round(nc / wall)}


def embedding():
    import ray.data as rd

    from vector_ray.functions.vectors import matrix_to_list
    from vector_ray.pipelines.dedup import embedding_dedup
    from vector_ray.pipelines.dedup_fixture import planted_embedding_corpus

    n, d = 200_000, 64

    def gen(batch):
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 1)
        m = rng.standard_normal((len(ids), d)).astype(np.float32)
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "embedding": matrix_to_list(m, value_type=pa.float32())})

    emb = rd.range(n).map_batches(gen, batch_format="pyarrow").materialize()
    corpus = planted_embedding_corpus(emb).materialize()
    nc = corpus.count()
    t0 = time.time()
    n_out = embedding_dedup(corpus, threshold=0.999).count()
    wall = time.time() - t0
    assert n_out == n, (n_out, n)
    return {"corpus": nc, "survivors": n_out, "wall": round(wall, 1),
            "vecs_per_sec": round(nc / wall)}


def tagcard1m():
    """1M DISTINCT tag values through tag_cardinality_limit (VERDICT r2
    item 1a done-criterion): the accepted set is computed with a
    distributed groupby→sort→limit, so the driver only ever holds
    value_limit rows — a cardinality 10,000× the limit must pass
    without driver-side distinct-set materialization, and the survivors
    must be exactly the rows carrying the value_limit first-seen
    values."""
    import ray.data as rd

    from vector_ray.stages.tag_cardinality import tag_cardinality_limit

    n, limit = 1_000_000, 100

    def gen(batch):
        ids = batch["id"].to_numpy()
        return pa.table({
            "order": pa.array(ids, type=pa.int64()),
            # every row a DISTINCT tag value; first-seen order == id
            "tag": pa.array(["v%09d" % i for i in ids.tolist()]),
        })

    ds = rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow"
    )
    t0 = time.time()
    out = tag_cardinality_limit(
        ds, ["tag"], value_limit=limit, order_by="order",
        limit_exceeded_action="drop_event",
    )
    kept = out.to_pandas()
    wall = time.time() - t0
    assert len(kept) == limit, len(kept)
    assert sorted(kept["order"]) == list(range(limit))
    return {"rows": n, "distinct": n, "value_limit": limit,
            "wall": round(wall, 1), "rows_per_sec": round(n / wall)}


def aggseries1m():
    """1M distinct (series) keys through aggregate mode=latest (VERDICT
    r2 item 1b done-criterion): partial cardinality 1M > combine_limit
    500k forces the distributed last-by-ts combine; the driver never
    holds the partial table.  Asserts exact per-series latest values."""
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate

    n_series, per = 1_000_000, 3
    n = n_series * per

    def gen(batch):
        ids = batch["id"].to_numpy()
        series = ids % n_series
        seq = ids // n_series  # 0,1,2 per series; latest has seq=2
        return pa.table({
            "name": pa.array(["m"] * len(ids)),
            "namespace": pa.array([""] * len(ids)),
            "tags": pa.array(["s=%d" % s for s in series.tolist()]),
            "kind": pa.array(["absolute"] * len(ids)),
            "ts": pa.array((seq + 1) * 1_000_000, type=pa.int64()),
            "value": pa.array(series * 10 + seq, type=pa.float64()),
        })

    ds = rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow"
    )
    t0 = time.time()
    out = aggregate(ds, mode="latest", interval_ms=10**9, ts_field="ts")
    res = out.to_pandas() if hasattr(out, "to_pandas") else out
    wall = time.time() - t0
    assert len(res) == n_series, len(res)
    # latest value for series s is s*10 + 2
    sample = res.head(1000).copy()
    s = sample["tags"].str.slice(2).astype(int)
    assert (sample["value"].to_numpy() == (s * 10 + 2).to_numpy()).all()
    return {"rows": n, "series": n_series, "wall": round(wall, 1),
            "rows_per_sec": round(n / wall)}


def reduce100k():
    """100k distinct group keys through sessionizing reduce (VERDICT r2
    item 2 done-criterion): the stage runs over 32 FIXED hash
    partitions regardless of key count — Ray never sees one group per
    user.  Each user has two 3-event bursts 2h apart with a 30min
    session gap → exactly 2 sessions per user; asserts the exact
    session count and per-session sums."""
    import ray.data as rd

    from vector_ray.stages.reduce import reduce_stage

    n_users, per = 100_000, 6
    n = n_users * per
    HOUR = 3_600_000_000

    def gen(batch):
        ids = batch["id"].to_numpy()
        user = ids % n_users
        seq = ids // n_users  # 0..5 per user
        # events 0,1,2 at minutes 0,1,2; events 3,4,5 at minutes 120,121,122
        minute = np.where(seq < 3, seq, 120 + (seq - 3))
        ts = minute.astype(np.int64) * 60_000_000
        return pa.table({
            "user": pa.array(["u%d" % u for u in user.tolist()]),
            "ts": pa.array(ts, type=pa.int64()),
            "value": pa.array(np.ones(len(ids)), type=pa.float64()),
        })

    ds = rd.range(n, override_num_blocks=64).map_batches(gen, batch_format="pyarrow")
    t0 = time.time()
    out = reduce_stage(
        ds, group_by=["user"], order_by="ts", ts_field="ts",
        expire_after_ms=30 * 60 * 1000,
        merge_strategies={"value": "sum"},
    )
    res = out.to_pandas() if hasattr(out, "to_pandas") else out
    wall = time.time() - t0
    assert len(res) == 2 * n_users, len(res)
    assert (res["value"].to_numpy() == 3.0).all()
    return {"rows": n, "keys": n_users, "sessions": len(res),
            "wall": round(wall, 1), "rows_per_sec": round(n / wall)}


def framing1g():
    """~1 GB newline-framed log through the chunked framed_source →
    syslog decode → count, asserting exact frame and decode counts —
    scale evidence for the framing family (whole file >> chunk size,
    so the chunk-edge path is exercised thousands of times)."""
    import os

    from vector_ray.framing import frame_newline, framed_source
    from vector_ray.codecs import decode_syslog

    path = "/tmp/vector_ray_stress_frames.log"
    n_lines = 8_000_000
    line = "<34>1 2023-10-11T22:14:15.003Z host-%07d app - ID%d - payload %s\n"
    if not os.path.exists(path) or os.path.getsize(path) < 900 << 20:
        with open(path, "w") as f:
            for i in range(0, n_lines, 100_000):
                f.write("".join(
                    line % (j, j, "x" * 80) for j in range(i, i + 100_000)
                ))
    size_mb = os.path.getsize(path) / 1e6

    t0 = time.time()
    ds = framed_source(path, frame_newline, as_string=True, chunk_bytes=64 << 20)

    def _decode(batch):
        t, err = decode_syslog(batch["message"], rfc="5424")
        assert not pa.compute.any(err).as_py()
        return t.select(["hostname"])

    n = ds.map_batches(_decode, batch_format="pyarrow", batch_size=None).count()
    wall = time.time() - t0
    assert n == n_lines, n
    return {"lines": n, "file_mb": round(size_mb, 1), "wall": round(wall, 1),
            "mb_per_sec": round(size_mb / wall, 1)}


def ivf200k():
    """200 k vectors through the materialized IVF index: build the
    list-partitioned layout once, then search at rising nprobe and
    assert (a) the probe's read plan shrinks proportionally — the scan
    I/O criterion — and (b) every query's own vector is its top hit at
    every nprobe (primary-list containment)."""
    import os
    import shutil

    import numpy as np
    import ray.data as rd

    from vector_ray.pipelines.ann import (
        build_ivf_index, ivf_search, load_ivf_index, probed_list_paths,
        _normalize,
    )

    n, dim, n_lists = 200_000, 64, 64
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((n_lists, dim)) * 5
    assign = rng.integers(0, n_lists, n)
    vecs = (centers[assign] + rng.standard_normal((n, dim)) * 0.3).astype(np.float32)

    idx_dir = "/tmp/vector_ray_stress_ivf"
    shutil.rmtree(idx_dir, ignore_errors=True)
    import pyarrow.parquet as pq
    src_dir = "/tmp/vector_ray_stress_ivf_src"
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir)
    shard = 50_000
    for s in range(0, n, shard):
        pq.write_table(
            pa.table({
                "vec_id": pa.array(np.arange(s, s + shard, dtype=np.int64)),
                "embedding": pa.array(vecs[s:s + shard].tolist(),
                                      type=pa.list_(pa.float32())),
            }),
            os.path.join(src_dir, f"part-{s:07d}.parquet"),
        )

    t0 = time.time()
    build_ivf_index(rd.read_parquet(src_dir), idx_dir,
                    n_lists=n_lists, sample_size=8192)
    build_wall = time.time() - t0

    index = load_ivf_index(idx_dir)
    # queries concentrated in 4 of the 64 clusters — the realistic
    # probe-pruning shape (a scattered query batch legitimately probes
    # most lists; pruning pays off per concentrated batch)
    qidx = np.concatenate(
        [np.nonzero(assign == c)[0][:12] for c in range(4)]
    )
    queries = vecs[qidx]
    qn = _normalize(queries.astype(np.float32))

    out = {"vectors": n, "n_lists": n_lists,
           "build_wall": round(build_wall, 1)}
    prev_files = None
    for nprobe in (2, 8, 32):
        probes = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]
        probe_set = sorted({int(l) for row in probes for l in row})
        n_files = sum(
            len(os.listdir(p)) for _, p in probed_list_paths(idx_dir, probe_set)
        )
        t0 = time.time()
        res = ivf_search(idx_dir, queries, k=5, nprobe=nprobe).to_pandas()
        wall = time.time() - t0
        top = res[res["rank"] == 1].sort_values("query_id")
        assert (top["vec_id"].to_numpy() == qidx).all(), "self-hit failed"
        if prev_files is not None:
            assert n_files >= prev_files, "probe set should grow with nprobe"
        prev_files = n_files
        out[f"nprobe{nprobe}_files"] = n_files
        out[f"nprobe{nprobe}_wall"] = round(wall, 2)
    total_files = sum(
        len(os.listdir(os.path.join(idx_dir, d)))
        for d in os.listdir(idx_dir) if d.startswith("list_id=")
    )
    out["total_index_files"] = total_files
    assert out["nprobe2_files"] < total_files // 4, "nprobe=2 must prune most files"
    shutil.rmtree(src_dir, ignore_errors=True)
    return out


def vrl1m():
    """1 M events through a closure-heavy VRL program — the language
    front-end's scale profile: every stage (parse, arithmetic, if/else,
    closures over list columns) must stay vectorized; asserts exact
    spot-check outputs and reports rows/s."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    n = 1_000_000
    rng = np.random.default_rng(7)

    def gen(batch):
        i = batch["id"]
        base = np.asarray(i, dtype=np.int64)
        ks = rng.integers(0, 100, len(base))
        types = np.where(base % 3 == 0, "error",
                         np.where(base % 3 == 1, "signup", "view"))
        tags = pa.array(
            [[f"t{b % 5}", f"u{b % 7}", ""] for b in base],
            type=pa.list_(pa.string()),
        )
        return pa.table({
            "event_id": pa.array(base),
            "event_type": pa.array(types.tolist()),
            "value": pa.array((base % 1000) / 10.0),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
            "tags": tags,
        })

    ds = rd.range(n).map_batches(gen, batch_format="pyarrow")
    src_prog = """
parsed, e = parse_json(.props)
.k = to_int(parsed.k) ?? -1
if .event_type == "error" { .sev = 3 }
else if .event_type == "signup" { .sev = 6 }
else { .sev = 1 }
.m = (.k - 50) % 7
.clean = map_values(filter(.tags) -> |_i, v| { v != "" }) -> |v| { upcase!(v) }
.tag = .event_type + ":" + to_string(.sev)
del(.props)
"""
    from vector_ray.stages import remap_vrl

    t0 = time.time()
    out = remap_vrl(ds, src_prog).map_batches(
        lambda b: b.select(["event_id", "k", "sev", "m", "clean", "tag"]),
        batch_format="pyarrow",
    ).materialize()
    wall = time.time() - t0
    assert out.count() == n
    rows = out.take(1000)
    by_id = {r["event_id"]: r for r in rows}
    for eid, r in by_id.items():
        want_sev = 3 if eid % 3 == 0 else (6 if eid % 3 == 1 else 1)
        assert r["sev"] == want_sev
        assert r["m"] == int(np.fmod(r["k"] - 50, 7))
        assert r["clean"] == [f"T{eid % 5}".upper(), f"U{eid % 7}".upper()]
        assert r["tag"].endswith(f":{want_sev}")
    return {"rows": n, "wall": round(wall, 1),
            "rows_per_sec": round(n / wall, 0)}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    _init()
    result = {"mode": mode, **globals()[mode]()}
    print(json.dumps(result))
    import ray

    ray.shutdown()
