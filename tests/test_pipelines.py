"""Flagship pipeline, dedup suite, ANN, text analysis, multimodal
plumbing — over real testdata (documents/embeddings) and the synthetic
token table, with single-process numpy/pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def docs_ds():
    return rd.read_parquet(f"{SF}/documents.parquet")


def test_flagship_counts_match_oracle(tmp_path):
    from vector_ray.pipelines import flagship
    from vector_ray import schema, parse

    n = 2000
    counts, agg = flagship.run(n_rows=n, out_dir=str(tmp_path / "sinks"))
    # oracle: recompute routes in pure numpy from the generators.
    # route COPIES rows to every matching sink (route.rs multi-match).
    i = np.arange(n)
    status = parse.status_for(i)
    n_tok = schema.n_tok_for(np.arange(n))
    assert counts["errors"] == int((status == 500).sum())
    assert counts["big"] == int((n_tok >= 1024).sum())
    assert counts["ok"] == int((status != 500).sum())
    assert "_unmatched" not in counts  # every row matches ≥1 route
    assert agg["n_rows"].sum() == sum(counts.values())


def test_flagship_token_equality(tmp_path):
    """The end-to-end per-row invariant: tokens byte-identical after the
    full parse→enrich→route→write pipeline."""
    from vector_ray.pipelines import flagship
    from vector_ray import schema

    n = 500
    out = str(tmp_path / "sinks")
    flagship.run(n_rows=n, out_dir=out)
    written = pq.read_table(out).sort_by("doc_id")
    # routes can copy rows; dedupe doc_ids then compare against generator
    df = written.to_pandas().drop_duplicates("doc_id").sort_values("doc_id")
    gen = schema.token_batch(0, n)
    gen_tokens = gen["tokens"].to_pylist()
    got_tokens = [list(v) for v in df["tokens"]]
    assert got_tokens == gen_tokens
    assert df["source"].tolist() == gen["source"].to_pylist()


def test_exact_dedup_docs():
    from vector_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(docs_ds()).to_pandas()
    # oracle: min doc_id per normalized text
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    norm = df["text"].str.lower().str.split().str.join(" ")
    expect = df.assign(norm=norm).groupby("norm")["doc_id"].min().sort_values()
    assert sorted(out["doc_id"]) == sorted(expect)


def test_minhash_dedup_drops_near_dupes():
    from vector_ray.pipelines.dedup import minhash_lsh_dedup

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # append exact copies of 5 docs with new ids → must be dropped
    dup = df.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    ds = rd.from_pandas(pd.concat([df, dup], ignore_index=True))
    out = minhash_lsh_dedup(ds, jaccard_threshold=0.9)
    ids = set(out.to_pandas()["doc_id"])
    assert all(d not in ids for d in dup["doc_id"])  # copies dropped
    assert all(d in ids for d in df.head(5)["doc_id"])  # originals kept


def test_simhash_dedup_drops_exact_copies():
    from vector_ray.pipelines.dedup import simhash_dedup

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(100)
    dup = df.head(3).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    ds = rd.from_pandas(pd.concat([df, dup], ignore_index=True))
    out = simhash_dedup(ds, hamming_k=0)
    ids = set(out.to_pandas()["doc_id"])
    assert all(d not in ids for d in dup["doc_id"])
    assert all(d in ids for d in df.head(3)["doc_id"])


def test_ngram_jaccard_dedup():
    from vector_ray.pipelines.dedup import ngram_jaccard_dedup

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(50)
    dup = df.head(2).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    ds = rd.from_pandas(pd.concat([df, dup], ignore_index=True))
    out = ngram_jaccard_dedup(ds, threshold=0.95)
    ids = set(out.to_pandas()["doc_id"])
    assert all(d not in ids for d in dup["doc_id"])


def test_embedding_dedup():
    from vector_ray.pipelines.dedup import embedding_dedup

    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    dup = df.head(4).copy()
    dup["vec_id"] = dup["vec_id"] + 100_000
    ds = rd.from_pandas(pd.concat([df, dup], ignore_index=True))
    out = embedding_dedup(ds, threshold=0.999)
    ids = set(out.to_pandas()["vec_id"])
    assert all(d not in ids for d in dup["vec_id"])
    assert all(d in ids for d in df.head(4)["vec_id"])


def test_brute_force_topk_matches_numpy():
    from vector_ray.pipelines.ann import brute_force_topk

    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    queries = mat[:3]
    out = brute_force_topk(rd.from_pandas(df), queries, k=5).to_pandas()
    # numpy oracle
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = qn @ vn.T
    for qi in range(3):
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        # oracle top-5 with (score desc, id asc) tiebreak
        order = sorted(range(sim.shape[1]), key=lambda j: (-sim[qi, j], df["vec_id"][j]))
        expect = [int(df["vec_id"][j]) for j in order[:5]]
        assert got == expect
    assert got[0] == int(df["vec_id"][2])  # query 2 nearest itself


def test_ivf_topk_recall():
    from vector_ray.pipelines.ann import brute_force_topk, ivf_topk

    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    queries = mat[10:15]
    exact = brute_force_topk(rd.from_pandas(df), queries, k=10).to_pandas()
    approx = ivf_topk(rd.from_pandas(df), queries, k=10, n_lists=8, nprobe=4).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 lists → decent recall


def test_text_analysis():
    from vector_ray.functions.text import LangId, QualityScorer, token_counts

    ds = docs_ds().map_batches(token_counts, batch_format="pyarrow")
    ds = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 2))
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2))
    df = ds.to_pandas()
    # whitespace token count matches pandas oracle
    oracle = pq.read_table(f"{SF}/documents.parquet").to_pandas()["text"].str.split().str.len()
    assert df["n_ws_tokens"].tolist() == oracle.tolist()
    assert ((df["quality_score"] >= 0) & (df["quality_score"] <= 1)).all()
    # docs here are english-ish keyword soup; lang_pred returns a valid label
    assert set(df["lang_pred"]) <= {"en", "fr", "es", "de", "zh", "und"}


def test_multimodal_plumbing():
    from vector_ray.pipelines.multimodal import (
        FrameSampler,
        fake_image_decoder,
        image_features,
        sample_frames,
        synth_media_batch,
    )

    media = rd.from_arrow(synth_media_batch(0, 60))
    feats = image_features(media, batch_size=16, concurrency=(1, 2)).to_pandas()
    assert len(feats) == 20  # every 3rd row is an image
    assert all(len(v) == 3 for v in feats["mean_rgb"])
    # deterministic: same input → same features
    m0 = synth_media_batch(0, 3)
    img = fake_image_decoder(m0["payload"][0].as_py(), 64, 64)
    assert img.shape == (64, 64, 3)
    frames = sample_frames(media, every_ms=500).to_pandas()
    assert (frames.groupby("media_id").size() >= 2).all()


def test_minhash_detects_true_near_dupes():
    """Near-dup (not byte-identical) detection: perturb a few words."""
    from vector_ray.pipelines.dedup import minhash_lsh_dedup

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    near = df.head(3).copy()
    near["doc_id"] = near["doc_id"] + 200_000
    # change ~2% of characters: swap one word per ~50
    near["text"] = near["text"].str.replace("the", "thy", n=2, regex=False)
    ds = rd.from_pandas(pd.concat([df, near], ignore_index=True))
    out = minhash_lsh_dedup(ds, jaccard_threshold=0.7)
    ids = set(out.to_pandas()["doc_id"])
    assert all(d not in ids for d in near["doc_id"])  # near-dups dropped
    assert all(d in ids for d in df.head(3)["doc_id"])  # originals kept


def test_planted_fixture_oracles_sf0001():
    """The planted corpora must dedup to exactly the base ids (this is
    what the driver's DuckDB oracle asserts)."""
    from vector_ray.pipelines.dedup import (
        embedding_dedup,
        minhash_lsh_dedup,
        simhash_dedup,
    )
    from vector_ray.pipelines.dedup_fixture import (
        planted_embedding_corpus,
        planted_minhash_corpus,
        planted_simhash_corpus,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    base = sorted(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist())
    out = minhash_lsh_dedup(planted_minhash_corpus(docs), jaccard_threshold=0.7).to_pandas()
    assert sorted(out["doc_id"]) == base
    docs2 = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out2 = simhash_dedup(planted_simhash_corpus(docs2), hamming_k=0).to_pandas()
    assert sorted(out2["doc_id"]) == base
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vbase = sorted(pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])["vec_id"].to_pylist())
    out3 = embedding_dedup(planted_embedding_corpus(emb), threshold=0.999).to_pandas()
    assert sorted(out3["vec_id"]) == vbase


def test_sample_multiplicative_hash_matches_sql_rule():
    from vector_ray.stages import sample_hash

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    out = sample_hash(ds, "user_id", rate=10, hash_fn="multiplicative").to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id"]).to_pandas()
    expect = ev[((ev.user_id.astype("uint64") * 2654435761) % 2**32) % 10 == 0]
    assert sorted(out["event_id"]) == sorted(expect["event_id"])
    assert (out["sample_rate"] == 10.0).all()


def test_multimodal_audio_and_resize():
    from vector_ray.pipelines.multimodal import (
        audio_features,
        resize_images,
        synth_media_batch,
    )

    media = rd.from_arrow(synth_media_batch(0, 90))
    af = audio_features(media, batch_size=32).to_pandas()
    assert len(af) == 30  # 1/3 of rows are audio
    assert (af["rms"] > 0).all() and (af["peak"] > 0).all()
    rz = resize_images(media, 32, 32, batch_size=32).to_pandas()
    assert len(rz) == 30
    assert (rz["width"] == 32).all()
    assert all(len(p) == 32 * 32 * 3 for p in rz["payload"])


def test_minhash_densification_wrap_borrows_from_own_bin():
    """ADVICE r2 (high): a doc whose ONLY non-empty bin is mid-range must
    densify its wrap-around bins from that bin — not from the UMAX
    sentinel at bin P-1.  Two unrelated short docs must NOT share
    identical fills in their wrap bins."""
    import numpy as np
    import pyarrow as pa

    from vector_ray.pipelines.dedup import MinHasher

    mh = MinHasher(num_perm=16, shingle_k=5, text_col="text", id_col="doc_id")
    # 'short' docs (< k chars) hash the whole text into a single bin
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["abc", "xyz"])})
    out = mh(t)
    sigs = np.array(out["sig"].to_pylist(), dtype=np.int64).view(np.uint64)
    UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    assert (sigs != UMAX).all(), "no bin may keep the UMAX sentinel"
    # each doc's fills derive from its own single hash: since the two
    # texts hash differently, NO bin position may coincide across docs
    assert not (sigs[0] == sigs[1]).any(), (
        "unrelated short docs share fill values — correlated densification"
    )
    # structural check: every row has exactly P distinct fill values
    # (fills are own-hash + distance*odd-const mod 2^64, all distinct)
    assert len(set(sigs[0].tolist())) == 16
    assert len(set(sigs[1].tolist())) == 16


def test_distribution_agg_distributed_combine_path():
    """ADVICE r2 (medium): past combine_limit, grouped_aggregate returns
    a Dataset — distribution_agg / aggregated_histogram must survive
    (they used to call pandas-only APIs and crash)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.metric_payload import aggregated_histogram, distribution_agg

    n = 64
    t = pa.table({
        "name": pa.array(["m"] * n),
        "namespace": pa.array([""] * n),
        "tags": pa.array(["svc=a"] * n),
        "kind": pa.array(["incremental"] * n),
        "value": pa.array(np.arange(n, dtype=np.float64)),
        "sample_rate": pa.array(np.ones(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n) * 1_000_000, type=pa.timestamp("us")),
    })
    ds = rd.from_arrow(t)
    # combine_limit=1 forces the distributed path at any size
    long = distribution_agg(ds, interval_ms=3_600_000 * 1000, combine_limit=1)
    df = long.to_pandas()
    assert len(df) == n
    assert set(df["sample_rate"]) == {1}
    assert "sample_value" in df.columns

    hist = aggregated_histogram(
        distribution_agg(ds, interval_ms=3_600_000 * 1000, combine_limit=1),
        limits=[31.5], combine_limit=1,
    ).to_pandas()
    got = hist.set_index("bucket_upper")["bucket_count"].to_dict()
    assert got == {31.5: 32, float("inf"): 32}
    assert (hist["count"] == 64).all()


def test_aggregate_latest_auto_distributed_combine():
    """VERDICT r2 item 1b: aggregate latest/auto must not materialize the
    series table on the driver past combine_limit."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate

    n = 50
    t = pa.table({
        "name": pa.array(["m"] * n),
        "namespace": pa.array([""] * n),
        "tags": pa.array([f"k={i}" for i in range(n // 2)] * 2),
        "kind": pa.array((["absolute"] * (n // 2)) + (["incremental"] * (n // 2))),
        "value": pa.array(np.arange(n, dtype=np.float64)),
        "ts": pa.array(np.arange(n) * 1_000, type=pa.timestamp("us")),
    })
    ds = rd.from_arrow(t)
    for mode in ("latest", "auto", "sum"):
        small = aggregate(ds, mode=mode, interval_ms=10**9).to_pandas()
        big = aggregate(ds, mode=mode, interval_ms=10**9, combine_limit=1).to_pandas()
        key = ["name", "namespace", "tags", "kind", "window_start"]
        s = small.sort_values(key).reset_index(drop=True)
        b = big.sort_values(key).reset_index(drop=True)
        assert list(s.columns).sort() == list(b.columns).sort()
        assert np.allclose(
            s["value"].to_numpy(), b[s.columns.intersection(b.columns)]["value"].to_numpy()
        ), mode


def test_bucket_edge_cover_chains_within_signature_runs():
    """ADVICE r2 (low): oversized buckets must chain identical-signature
    docs adjacently even when unrelated ids interleave."""
    import numpy as np

    from vector_ray.pipelines.dedup import bucket_edge_cover

    # identical-content docs 1 and 9 (sdig 100) interleaved with
    # unrelated ids 2..8 (distinct sdigs)
    ids = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], dtype=np.int64)
    sdig = np.array([100, 7, 3, 9, 5, 2, 8, 4, 100], dtype=np.int64)
    ea, eb = bucket_edge_cover(ids, sdig, max_pairs=4)
    edges = set(zip(ea.tolist(), eb.tolist()))
    assert (1, 9) in edges, "identical-sig pair not directly connected"
    assert len(ea) <= 2 * len(ids)
    # small bucket still emits all pairs
    ea2, eb2 = bucket_edge_cover(ids[:3], sdig[:3], max_pairs=10)
    assert len(ea2) == 3


def test_audio_spectral_features_pure_tone(ray_session):
    """Spectral centroid of a pure tone lands at the tone frequency
    (real DSP check — np.fft path, no media libs)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.multimodal import AudioFeatures, audio_features

    sr = AudioFeatures.SR
    t = np.arange(sr) / sr  # 1 second
    tone = (np.sin(2 * np.pi * 1000 * t) * 10_000).astype(np.int16)

    def tone_decoder(payload, duration_ms):
        return tone

    media = rd.from_arrow(pa.table({
        "media_id": [1], "kind": ["audio"], "payload": [b"x"],
        "duration_ms": [1000],
    }))
    df = audio_features(media, batch_size=8, decoder=tone_decoder).to_pandas()
    assert abs(df["spectral_centroid"][0] - 1000) < 20
    assert 990 <= df["spectral_rolloff"][0] <= 1100


def test_image_edge_and_entropy_features(ray_session):
    """Edge energy and luma entropy on known patterns: a flat image has
    zero edge energy and zero entropy; a checkerboard maxes both."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.multimodal import image_features

    def flat_decoder(payload, w, h):
        return np.full((h, w, 3), 128, dtype=np.uint8)

    def checker_decoder(payload, w, h):
        y, x = np.mgrid[0:h, 0:w]
        v = ((x + y) % 2) * 255
        return np.repeat(v[:, :, None], 3, axis=2).astype(np.uint8)

    media = rd.from_arrow(pa.table({
        "media_id": [1], "kind": ["image"], "payload": [b"x"],
        "width": [8], "height": [8],
    }))
    flat = image_features(media, batch_size=8, decoder=flat_decoder).to_pandas()
    assert flat["edge_energy"][0] == 0.0 and flat["luma_entropy"][0] == 0.0
    chk = image_features(media, batch_size=8, decoder=checker_decoder).to_pandas()
    assert chk["edge_energy"][0] > 200 and 0.9 < chk["luma_entropy"][0] <= 1.01


def test_topk_preserves_string_id_type(tmp_path):
    """ADVICE r4: configurable id_col must keep its source Arrow type
    (string ids crashed the hardcoded int64 output arrays)."""
    from vector_ray.pipelines.ann import (
        brute_force_topk,
        build_ivf_index,
        ivf_search,
        ivf_topk,
    )

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(200, 16)).astype("float32")
    df = pd.DataFrame(
        {"doc": [f"doc-{i:04d}" for i in range(200)], "embedding": list(mat)}
    )
    queries = mat[:2]
    out = brute_force_topk(
        rd.from_pandas(df), queries, k=3, id_col="doc"
    ).to_pandas()
    assert out["doc"].map(type).eq(str).all()
    assert out.loc[out.query_id.eq(0) & out["rank"].eq(1), "doc"].item() == "doc-0000"

    out2 = ivf_topk(
        rd.from_pandas(df), queries, k=3, n_lists=4, nprobe=4, id_col="doc"
    ).to_pandas()
    assert out2["doc"].map(type).eq(str).all()
    assert out2.loc[out2.query_id.eq(1) & out2["rank"].eq(1), "doc"].item() == "doc-0001"

    idx_dir = str(tmp_path / "ivf_str")
    build_ivf_index(rd.from_pandas(df), idx_dir, n_lists=4, id_col="doc")
    out3 = ivf_search(idx_dir, queries, k=3, nprobe=4, id_col="doc").to_pandas()
    assert out3["doc"].map(type).eq(str).all()
    assert out3.loc[out3.query_id.eq(0) & out3["rank"].eq(1), "doc"].item() == "doc-0000"


def test_ivf_config_rebuilds_on_changed_corpus(tmp_path):
    """ADVICE r4: the config path must not serve stale top-k from an
    old materialized index when the input files change."""
    import pyarrow.parquet as _pq

    from vector_ray.topology import build

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(60, 8)).astype("float32")
    qpath = str(tmp_path / "q.parquet")
    _pq.write_table(
        pa.table({"embedding": [mat[0].tolist()]}), qpath
    )

    def corpus(path, ids, rows):
        _pq.write_table(
            pa.table(
                {"vec_id": pa.array(ids, pa.int64()),
                 "embedding": [r.tolist() for r in rows]}
            ),
            path,
        )

    p1 = str(tmp_path / "corpus1.parquet")
    corpus(p1, list(range(30)), mat[:30])
    idx = str(tmp_path / "idx")

    def cfg(path):
        return {
            "sources": {"emb": {"type": "parquet", "path": path}},
            "transforms": {
                "ann": {
                    "type": "ivf_topk", "inputs": ["emb"], "k": 1,
                    "n_lists": 2, "nprobe": 2, "index_dir": idx,
                    "queries_path": qpath,
                }
            },
            "sinks": {"out": {"type": "parquet", "inputs": ["ann"]}},
        }

    first = build(cfg(p1))["out"].to_pandas()
    assert first.loc[first["rank"].eq(1), "vec_id"].item() == 0

    # new corpus file: vector 0 is gone, ids shifted by 1000
    p2 = str(tmp_path / "corpus2.parquet")
    corpus(p2, [1000 + i for i in range(29)], mat[1:30])
    second = build(cfg(p2))["out"].to_pandas()
    assert second.loc[second["rank"].eq(1), "vec_id"].item() >= 1000


def test_ngram_jaccard_chunking_keeps_far_id_pairs(ray_session):
    """sf0.1 regression: when a length bucket exceeds max_bucket, the
    chunk split must not separate dup pairs whose ids are far apart —
    chunks cut at locality-key (mid-document word window) runs."""
    import numpy as np

    from vector_ray.pipelines.dedup import ngram_jaccard_dedup

    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(2000)]
    base_texts = [
        " ".join(rng.choice(words, size=64, replace=False)) for _ in range(60)
    ]
    ids = list(range(60))
    # duplicates with FAR ids (offset like the planted fixtures)
    dup_ids = [100000 + i for i in range(60)]
    dup_texts = list(base_texts)
    df = pd.DataFrame(
        {"doc_id": ids + dup_ids, "text": base_texts + dup_texts}
    )
    # tiny max_bucket forces chunking inside the single length bucket
    out = ngram_jaccard_dedup(
        rd.from_pandas(df), threshold=0.8, max_bucket=16
    )
    got = sorted(r["doc_id"] for r in out.take_all())
    assert got == ids  # every far-id duplicate dropped, all bases kept
