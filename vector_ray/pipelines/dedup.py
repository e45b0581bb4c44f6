"""Deduplication pipelines over the ``documents`` table.

Five families, each Ray-Data-first and designed for 100 TB (partial
work inside map_batches, one groupby shuffle on a small key):

- exact_dedup: normalize → 64-bit content hash → hash-partition →
  first-wins per group (unbounded-cache dedupe semantics).
- minhash_lsh_dedup: shingle → minhash signature (vectorized numpy)
  → band buckets → groupby(band, bucket) emits candidate pairs →
  verify Jaccard → connected components by min-label propagation →
  keep the representative per component.
- simhash_dedup: 64-bit simhash over token hashes; bucket by rotated
  prefixes; near-dups = hamming distance ≤ k within buckets.
- ngram_jaccard_dedup: exact n-gram-set Jaccard verification between
  candidate pairs (used as the verifier for the LSH families or
  standalone on small groups).
- embedding_dedup: cosine near-dup over an embedding column using
  LSH random-hyperplane buckets + in-bucket numpy matmul.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashes import hash_string_column
from ..functions.text import fingerprint

# ----------------------------------------------------------- exact

def exact_dedup(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per normalized-text fingerprint."""
    hashed = docs.map_batches(
        lambda b: fingerprint(b, text_col), batch_format="pyarrow"
    )

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1).drop(columns=["fp"])

    return hashed.groupby("fp").map_groups(_first, batch_format="pandas")


# --------------------------------------------------------- minhash

class MinHasher:
    """Actor: fully vectorized minhash signatures from char-k-shingles.

    Per batch: normalize (lower + collapse whitespace, Arrow kernels),
    compute a rolling polynomial hash of every k-byte window of the
    concatenated text buffer (k numpy adds over the flat buffer — no
    per-document Python), apply ``num_perm`` multiply-shift hash
    permutations, and take per-document minima with
    ``np.minimum.reduceat``.  O(total_bytes × num_perm) numpy ops.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        # multiply-shift family over Z/2^64 (odd multipliers)
        self.a = (rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm
        self.text_col = text_col
        self.id_col = id_col
        self._B = np.uint64(1099511628211)  # rolling-hash base

    def _shingle_hashes(self, col: pa.Array):
        """(flat_hashes, doc_segment_starts, empty_doc_mask)."""
        norm = pc.replace_substring_regex(
            pc.utf8_lower(col), pattern=r"\s+", replacement=" "
        ).combine_chunks() if isinstance(col, pa.ChunkedArray) else pc.replace_substring_regex(
            pc.utf8_lower(col), pattern=r"\s+", replacement=" "
        )
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        off = np.frombuffer(norm.buffers()[1], dtype=np.int32)[
            norm.offset : norm.offset + len(norm) + 1
        ].astype(np.int64)
        data = np.frombuffer(norm.buffers()[2], dtype=np.uint8).astype(np.uint64)
        lens = np.diff(off)
        n_sh = np.maximum(lens - self.k + 1, np.minimum(lens, 1))  # ≥1 if non-empty
        total = len(data)
        # rolling hash over the flat buffer: H[i] = Σ_{j<k} b[i+j]·B^j
        H = np.zeros(total, dtype=np.uint64)
        powB = np.uint64(1)
        for j in range(self.k):
            end = total - j
            if end > 0:
                H[:end] += data[j:] * powB
            powB = np.uint64((int(powB) * int(self._B)) & 0xFFFFFFFFFFFFFFFF)
        # valid shingle index ranges per doc: [off[d], off[d] + n_sh[d])
        starts = off[:-1]
        idx = np.concatenate(
            [np.arange(s, s + c, dtype=np.int64) for s, c in zip(starts, n_sh) if c > 0]
        ) if len(starts) else np.empty(0, dtype=np.int64)
        flat = H[idx] if len(idx) else np.empty(0, dtype=np.uint64)
        seg = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(n_sh, out=seg[1:])
        return flat, seg, lens == 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One-permutation minhash with densification (Li/Owen/Zhang-style):
        each shingle hash lands in one of ``num_perm`` bins by its top
        bits; the signature is the per-(doc, bin) minimum, and empty
        bins densify deterministically from the doc's global minimum.
        O(total_shingles) scatter-mins — no N×P multiply (this host
        executes 64-bit vector multiplies ~20 M/s, so the classic
        P-permutation form is 60× slower here)."""
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, seg, empty = self._shingle_hashes(col)
        n_docs = batch.num_rows
        P = self.num_perm
        shift = np.uint64(64 - int(np.log2(P)))
        UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
        sigs = np.full((n_docs, P), UMAX, dtype=np.uint64)
        if len(flat):
            n_sh = np.diff(seg)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
            # mix once so bin bits are independent of the raw rolling hash
            h = flat ^ (flat >> np.uint64(33))
            h = h * self.a[0]  # single multiply pass
            bins = (h >> shift).astype(np.int64)
            np.minimum.at(sigs, (doc_idx, bins), h)
        # docs shorter than k: hash the whole normalized text instead
        # (their single rolling window would cross the doc boundary)
        lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        short = (lens < self.k) & (lens > 0)
        if short.any():
            sub = pc.utf8_lower(col.take(pa.array(np.nonzero(short)[0])))
            h = hash_string_column(sub)
            sigs[short] = UMAX
            sigs[short, (h >> shift).astype(np.int64)] = h
        # densify: empty bins get a deterministic fill derived from the
        # doc's global min so identical docs stay identical
        gmin = sigs.min(axis=1)
        need = sigs == UMAX
        if need.any():
            rows, cols_i = np.nonzero(need)
            fill = (gmin[rows] ^ (np.uint64(0x9E3779B97F4A7C15) * (cols_i.astype(np.uint64) + np.uint64(1))))
            sigs[rows, cols_i] = fill
        sigs[empty] = 0
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": pa.array(list(sigs.view(np.int64))),
            }
        )


def minhash_lsh_dedup(
    docs,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rounds: int = 6,
):
    """Full MinHash+LSH near-dup removal; returns the surviving docs.

    Stages: signatures (actor pool) → explode to (band, bucket, id)
    → groupby band-bucket → candidate pairs → Jaccard verify on
    signatures → min-label propagation (bounded rounds, driver holds
    only the edge list — documented small-candidate assumption; at
    100 TB swap the driver union-find for the groupby label-prop
    rounds, same edges).
    """
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_k=shingle_k, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in batch["sig"].to_pylist()])
        out_id, out_band, out_bucket = [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band].astype(np.uint64)
            # mix the band segment to one bucket id
            bucket = seg[:, 0].copy()
            for j in range(1, rows_per_band):
                bucket = bucket * np.uint64(1099511628211) + seg[:, j]
            out_id.extend(ids)
            out_band.extend([b] * len(ids))
            out_bucket.extend(bucket.view(np.int64).tolist())
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_bucket, type=pa.int64()),
                "sig": pa.concat_arrays([batch["sig"].combine_chunks() if isinstance(batch["sig"], pa.ChunkedArray) else batch["sig"]] * bands),
            }
        )

    # materialize: exploded is consumed twice (bucket counts + pair
    # generation) — pin the signatures instead of recomputing them
    exploded = sigs.map_batches(_bands, batch_format="pyarrow").materialize()

    # prefilter: only buckets holding ≥2 docs can yield pairs.  Count
    # per (band,bucket) with a partial per-batch aggregate (tiny), then
    # broadcast the hot-bucket key set and filter before the groupby —
    # the expensive per-group Python runs on ~0 singleton buckets.
    from ..stages.partial_agg import grouped_aggregate

    counts = grouped_aggregate(exploded, ["band", "bucket"], [("bucket", "count", "n")])
    hot = counts[counts["n"] > 1]
    hot_keys = set(zip(hot["band"].astype(int), hot["bucket"].astype(int)))

    def _only_hot(batch: pa.Table) -> pa.Table:
        bands_np = batch["band"].to_numpy()
        buckets_np = batch["bucket"].to_numpy()
        mask = np.fromiter(
            ((int(b), int(k)) in hot_keys for b, k in zip(bands_np, buckets_np)),
            dtype=bool,
            count=len(bands_np),
        )
        return batch.filter(pa.array(mask))

    exploded = exploded.map_batches(_only_hot, batch_format="pyarrow", batch_size=None)

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in g["sig"]])
        out_a, out_b = [], []
        # verify candidates by signature-estimated Jaccard
        for i in range(len(ids)):
            eq = (sig[i + 1 :] == sig[i]).mean(axis=1)
            for j_off in np.nonzero(eq >= jaccard_threshold)[0]:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j_off])
        return pd.DataFrame({"a": out_a, "b": out_b})

    def _pairs_in_band(band_df: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per BAND (bands are few and balanced); the many
        # tiny per-bucket groups run as a local pandas groupby — Ray
        # map_groups overhead is per band, not per bucket
        parts = [
            _bucket_pairs(bdf) for _, bdf in band_df.groupby("bucket", sort=False)
        ]
        if not parts:
            return pd.DataFrame({"a": [], "b": []})
        return pd.concat(parts, ignore_index=True)

    edges = exploded.groupby("band").map_groups(_pairs_in_band, batch_format="pandas")
    edge_df = edges.to_pandas().drop_duplicates()

    # connected components on the (small) duplicate-edge graph
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edge_df["a"], edge_df["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}

    def _survivors(batch: pa.Table) -> pa.Table:
        mask = pa.array([i not in drop for i in batch[id_col].to_pylist()])
        return batch.filter(mask)

    return docs.map_batches(_survivors, batch_format="pyarrow")


# ---------------------------------------------------------- simhash

class SimHasher:
    """Actor: 64-bit simhash over word-token hashes — fully vectorized.

    Tokenize the whole batch with Arrow kernels (split on non-word runs),
    hash every token once, expand to a (n_tokens, 64) ±1 bit matrix with
    numpy shifts, and fold per document with ``np.add.reduceat``.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._shifts = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(col), pattern=r"\W+")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        # drop empty tokens (leading/trailing splits) but keep doc alignment
        nonempty = pc.not_equal(flat, "")
        doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        mask = np.asarray(nonempty.to_numpy(zero_copy_only=False), dtype=bool)
        flat = flat.filter(nonempty)
        doc_idx = doc_idx[mask]
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        if len(flat):
            hs = hash_string_column(flat)
            bits = ((hs[:, None] >> self._shifts[None, :]) & np.uint64(1)).astype(np.int64)
            signs = bits * 2 - 1
            # fold per doc: reduceat over contiguous doc segments
            seg_starts = np.flatnonzero(np.diff(doc_idx, prepend=-1))
            sums = np.add.reduceat(signs, seg_starts, axis=0)
            present = doc_idx[seg_starts]
            hashes = ((sums > 0).astype(np.uint64) << self._shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[present] = hashes
        return batch.append_column("simhash", pa.array(out.view(np.int64)))


def simhash_dedup(docs, hamming_k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup removal by simhash: 4 16-bit block keys (any match →
    same bucket candidate), verify hamming ≤ k, keep min id."""
    hashed = docs.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    def _blocks(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        ids = batch[id_col].to_pylist()
        out_id, out_block, out_key, out_sh = [], [], [], []
        for blk in range(4):
            key = ((sh >> np.uint64(blk * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.extend(ids)
            out_block.extend([blk] * len(ids))
            out_key.extend(key.tolist())
            out_sh.extend(sh.view(np.int64).tolist())
        return pa.table(
            {
                id_col: pa.array(out_id),
                "block": pa.array(out_block, type=pa.int32()),
                "key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(out_sh, type=pa.int64()),
            }
        )

    exploded = hashed.map_batches(_blocks, batch_format="pyarrow")

    def _key_drops(g: pd.DataFrame) -> set:
        if len(g) < 2:
            return set()
        g = g.sort_values(id_col, kind="mergesort")
        sh = g["simhash"].to_numpy().astype(np.uint64)
        ids = g[id_col].tolist()
        drop = set()
        for i in range(len(ids)):
            x = sh[i + 1 :] ^ sh[i]
            ham = np.array([bin(v).count("1") for v in x.tolist()])
            for j_off in np.nonzero(ham <= hamming_k)[0]:
                drop.add(ids[i + 1 + j_off])
        return drop

    def _drops_in_block(block_df: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per 16-bit BLOCK; per-key candidate sets handled
        # by a local pandas groupby inside
        drop: set = set()
        for _, kdf in block_df.groupby("key", sort=False):
            drop |= _key_drops(kdf)
        return pd.DataFrame({"drop": sorted(drop)})

    drops = exploded.groupby("block").map_groups(_drops_in_block, batch_format="pandas")
    drop_set = set(drops.to_pandas()["drop"])

    return docs.map_batches(
        lambda b: b.filter(pa.array([i not in drop_set for i in b[id_col].to_pylist()])),
        batch_format="pyarrow",
    )


# ----------------------------------------------------- ngram jaccard

def ngram_jaccard_matrix(texts: List[str], n: int = 3) -> np.ndarray:
    """Exact pairwise word-n-gram Jaccard (verifier utility)."""
    sets = []
    for t in texts:
        ws = t.lower().split()
        sets.append({tuple(ws[i : i + n]) for i in range(max(1, len(ws) - n + 1))})
    m = np.zeros((len(sets), len(sets)))
    for i in range(len(sets)):
        for j in range(i, len(sets)):
            u = len(sets[i] | sets[j])
            m[i, j] = m[j, i] = len(sets[i] & sets[j]) / u if u else 0.0
    return m


def ngram_jaccard_dedup(docs, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        length_bucket: int = 32):
    """Exact n-gram Jaccard dedup with length-bucket blocking.

    Candidates are restricted to docs in the same word-length bucket
    (near-dups have near-equal length); each bucket verifies exact
    Jaccard pairwise.  Keep min id per duplicate pair.
    """

    def _bucket(batch: pa.Table) -> pa.Table:
        nw = pc.count_substring_regex(batch[text_col], pattern=r"\S+")
        b = pc.divide(nw.cast(pa.int64()), length_bucket)
        return batch.append_column("lb", b)

    bucketed = docs.map_batches(_bucket, batch_format="pyarrow")

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        if len(g) < 2:
            return g.drop(columns=["lb"])
        m = ngram_jaccard_matrix(g[text_col].tolist(), n)
        drop = set()
        for i in range(len(g)):
            if i in drop:
                continue
            for j in range(i + 1, len(g)):
                if m[i, j] >= threshold:
                    drop.add(j)
        return g[~g.index.isin(drop)].drop(columns=["lb"])

    return bucketed.groupby("lb").map_groups(_dedup, batch_format="pandas")


# ------------------------------------------------- embedding cosine

def embedding_dedup(
    emb_ds,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 11,
):
    """Cosine near-dup over embeddings: random-hyperplane LSH buckets →
    in-bucket numpy cosine → drop non-representatives."""
    rng = np.random.default_rng(seed)
    planes_ref = {"planes": None}

    def _bucket(batch: pa.Table) -> pa.Table:
        vecs = np.stack([np.asarray(v, dtype=np.float32) for v in batch[vec_col].to_pylist()])
        if planes_ref["planes"] is None:
            planes_ref["planes"] = np.random.default_rng(seed).standard_normal(
                (vecs.shape[1], n_planes)
            ).astype(np.float32)
        signs = (vecs @ planes_ref["planes"]) > 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        for j in range(n_planes):
            bucket = bucket * 2 + signs[:, j]
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "bucket": pa.array(bucket),
            }
        )

    bucketed = emb_ds.map_batches(_bucket, batch_format="pyarrow")

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        if len(g) < 2:
            return g[[id_col]]
        v = np.stack([np.asarray(x, dtype=np.float32) for x in g[vec_col]])
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.clip(norm, 1e-9, None)
        sim = v @ v.T
        drop = set()
        for i in range(len(g)):
            if i in drop:
                continue
            for j in np.nonzero(sim[i, i + 1 :] >= threshold)[0]:
                drop.add(i + 1 + int(j))
        return g[~g.index.isin(drop)][[id_col]]

    return bucketed.groupby("bucket").map_groups(_dedup, batch_format="pandas")
