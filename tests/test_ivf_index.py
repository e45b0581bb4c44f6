"""Materialized IVF index (pipelines/ann.py build_ivf_index/ivf_search):
the 100 TB layout — scan I/O pruned to the probed partitions."""

import os

import numpy as np
import pytest
import ray.data as rd

from vector_ray.pipelines.ann import (
    brute_force_topk,
    build_ivf_index,
    ivf_search,
    load_ivf_index,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    # 8 well-separated gaussian clusters so lists are meaningful
    centers = rng.standard_normal((8, 16)) * 6
    vecs = np.concatenate(
        [c + rng.standard_normal((64, 16)) * 0.4 for c in centers]
    ).astype("float32")
    ids = np.arange(len(vecs), dtype=np.int64)
    return vecs, ids


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus, tmp_path_factory):
    vecs, ids = corpus
    ds = rd.from_items(
        [{"vec_id": int(i), "embedding": v.tolist()} for i, v in zip(ids, vecs)]
    )
    d = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(ds, d, n_lists=8, sample_size=512)
    return d


def test_index_layout_is_partitioned(index_dir):
    parts = [p for p in os.listdir(index_dir) if p.startswith("list_id=")]
    assert len(parts) >= 4  # clustered data fills most lists
    assert os.path.exists(os.path.join(index_dir, "centroids.parquet"))
    assert load_ivf_index(index_dir).centroids.shape == (8, 16)


def test_full_probe_matches_brute_force(ray_session, corpus, index_dir):
    vecs, ids = corpus
    queries = vecs[[5, 100, 300]]
    got = ivf_search(index_dir, queries, k=5, nprobe=8)  # probe all lists
    ds = rd.from_items(
        [{"vec_id": int(i), "embedding": v.tolist()} for i, v in zip(ids, vecs)]
    )
    want = brute_force_topk(ds, queries, k=5)
    got_sets = {}
    for r in got.take_all():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    want_sets = {}
    for r in want.take_all():
        want_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert got_sets == want_sets


def test_partial_probe_recall_and_self_hit(ray_session, corpus, index_dir):
    vecs, _ = corpus
    qidx = [3, 70, 130, 260, 400]
    got = ivf_search(index_dir, vecs[qidx], k=10, nprobe=2)
    rows = got.take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # the query vector itself must be its own top hit (it lives in the
    # probed primary list by construction)
    for qi, orig in enumerate(qidx):
        best = max(by_q[qi], key=lambda r: r["score"])
        assert best["vec_id"] == orig
        assert best["score"] == pytest.approx(1.0, abs=1e-5)
        assert best["rank"] == 1


def test_search_reads_only_probed_partitions(ray_session, corpus, index_dir):
    """The scale property: with nprobe=1 and a single query, exactly one
    partition directory is opened — unprobed lists never leave storage."""
    vecs, _ = corpus
    import pyarrow.parquet as pq

    from vector_ray.pipelines.ann import load_ivf_index, _normalize

    from vector_ray.pipelines.ann import probed_list_paths

    index = load_ivf_index(index_dir)
    q = _normalize(vecs[[10]])
    lid = int(np.argmax(q @ index.centroids.T))
    # the search's read plan is built from exactly these directories
    pairs = probed_list_paths(index_dir, [lid])
    assert [p[0] for p in pairs] == [lid]
    files = rd.read_parquet(pairs[0][1]).input_files()
    assert files and all(f"list_id={lid}" in f for f in files)
    # and the end-to-end search over that single probe still self-hits
    got = ivf_search(index_dir, vecs[[10]], k=3, nprobe=1).take_all()
    assert max(got, key=lambda r: r["score"])["vec_id"] == 10
    # and the probed partition is a strict subset of the corpus
    probed_rows = pq.read_table(os.path.join(index_dir, f"list_id={lid}")).num_rows
    assert probed_rows < len(vecs)


def test_empty_probe_set(ray_session, index_dir, tmp_path):
    """Probing a list that was never written yields an empty result,
    not a crash."""
    import shutil

    lone = str(tmp_path / "lone")
    shutil.copytree(index_dir, lone)
    # remove every partition but keep centroids → all probes miss
    for p in os.listdir(lone):
        if p.startswith("list_id="):
            shutil.rmtree(os.path.join(lone, p))
    out = ivf_search(lone, np.ones((1, 16), dtype="float32"), k=3, nprobe=2)
    assert out.count() == 0


def test_rebuild_clears_stale_partitions(ray_session, corpus, tmp_path):
    """A rebuild over an existing (possibly partial) index must not
    append duplicates — build_ivf_index clears index_dir first."""
    import ray.data as rd

    vecs, ids = corpus
    ds = rd.from_items(
        [{"vec_id": int(i), "embedding": v.tolist()} for i, v in zip(ids, vecs)]
    )
    d = str(tmp_path / "idx")
    build_ivf_index(ds, d, n_lists=4, sample_size=256)
    n1 = ivf_search(d, vecs[[3]], k=5, nprobe=4).count()
    build_ivf_index(ds, d, n_lists=4, sample_size=256)  # rebuild
    res = ivf_search(d, vecs[[3]], k=5, nprobe=4).to_pandas()
    assert len(res) == n1 == 5
    assert res["vec_id"].is_unique
