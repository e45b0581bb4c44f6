"""Scale stress harness — the BASELINE.md large-run numbers reproduce
from here (python tools/stress.py {flagship10m|resume10m|minhash|simhash|embedding}).

Each mode synthesizes its input deterministically, runs the pipeline at
a scale 20-100× the oracle fixtures, asserts the EXACT expected result,
and prints one JSON line with wall time and throughput.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

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


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    _init()
    result = {"mode": mode, **globals()[mode]()}
    print(json.dumps(result))
    import ray

    ray.shutdown()
