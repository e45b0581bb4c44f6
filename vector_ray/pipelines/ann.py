"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k — the correctness baseline.
  The query matrix is broadcast once (ray.put); every batch does one
  numpy matmul against it and emits its LOCAL top-k per query; a
  final tiny groupby-reduce merges local top-ks.  No full-data
  shuffle, no driver-side loop: this is the 100 TB shape.
- ivf_topk: the scale path — k-means-ish coarse quantizer (trained on
  a sample), vectors bucketed by nearest centroid; queries probe only
  ``nprobe`` buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashes import default_pool
from ..functions.vectors import list_to_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-9, None)


def brute_force_topk(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Exact cosine top-k for each query row → Dataset(query_id, vec_id,
    score, rank)."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)

    class LocalTopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = list_to_matrix(batch[vec_col], np.float32)  # zero-copy view
            vn = _normalize(vecs)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            sim = self.q @ vn.T  # (nq, nbatch)
            kk = min(k, sim.shape[1])
            top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            rows_q, rows_id, rows_s = [], [], []
            for qi in range(sim.shape[0]):
                rows_q.extend([qi] * kk)
                rows_id.extend(ids[top[qi]].tolist())
                rows_s.extend(sim[qi, top[qi]].tolist())
            return pa.table(
                {
                    "query_id": pa.array(rows_q, type=pa.int64()),
                    id_col: pa.array(rows_id, type=pa.int64()),
                    "score": pa.array(rows_s, type=pa.float64()),
                }
            )

    local = emb_ds.map_batches(
        LocalTopK, batch_format="pyarrow", concurrency=default_pool(divisor=16)
    )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(_merge, batch_format="pandas")


class IVFIndex:
    """Coarse quantizer trained driver-side on a sample; assignment and
    probing are vectorized batch ops."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids.astype(np.float32))

    @classmethod
    def train(cls, sample: np.ndarray, n_lists: int, iters: int = 10, seed: int = 3):
        rng = np.random.default_rng(seed)
        x = _normalize(np.asarray(sample, dtype=np.float32))
        cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                m = x[assign == c]
                if len(m):
                    cent[c] = m.mean(axis=0)
            cent = _normalize(cent)
        return cls(cent)

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(vecs) @ self.centroids.T, axis=1)


def ivf_topk(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF ANN: bucket by nearest centroid, probe nprobe lists/query."""
    sample = list_to_matrix(
        emb_ds.limit(sample_size).take_batch(sample_size, batch_format="pyarrow")[vec_col],
        np.float32,
    )
    index = IVFIndex.train(sample, n_lists)
    idx_ref = ray.put(index)
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_of_query = {qi: set(probes[qi].tolist()) for qi in range(len(qn))}
    q_ref = ray.put((qn, probe_of_query))

    class ProbeTopK:
        def __init__(self):
            self.index = ray.get(idx_ref)
            self.q, self.probe_of_query = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = list_to_matrix(batch[vec_col], np.float32)  # zero-copy view
            lists = self.index.assign(vecs)
            vn = _normalize(vecs)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            rows_q, rows_id, rows_s = [], [], []
            for qi in range(len(self.q)):
                mask = np.isin(lists, list(self.probe_of_query[qi]))
                if not mask.any():
                    continue
                sim = vn[mask] @ self.q[qi]
                kk = min(k, len(sim))
                top = np.argpartition(-sim, kk - 1)[:kk]
                sel = np.nonzero(mask)[0][top]
                rows_q.extend([qi] * kk)
                rows_id.extend(ids[sel].tolist())
                rows_s.extend(sim[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(rows_q, type=pa.int64()),
                    id_col: pa.array(rows_id, type=pa.int64()),
                    "score": pa.array(rows_s, type=pa.float64()),
                }
            )

    local = emb_ds.map_batches(
        ProbeTopK, batch_format="pyarrow", concurrency=default_pool(divisor=16)
    )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(_merge, batch_format="pandas")
