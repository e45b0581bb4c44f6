"""Config-registry exposure of the LLM-data-pipeline family — a
config-driven user reaches dedup/ANN/text/multimodal without Python
(VERDICT round-3 'What's missing' #2)."""

import numpy as np
import pyarrow as pa
import pytest

from vector_ray import topology


def _doc_rows():
    rows = []
    for i in range(40):
        base = f"the quick brown fox jumps over the lazy dog number {i} " * 4
        rows.append({"doc_id": i, "text": base})
    # plant exact dups and a near-dup cluster
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[1]["text"] + " tail"})
    return rows


def test_exact_dedup_config(ray_session):
    out = topology.build(
        {
            "sources": {"docs": {"type": "inline", "rows": _doc_rows()}},
            "transforms": {
                "dd": {"type": "exact_dedup", "inputs": ["docs"]},
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["dd"]}},
        }
    )["out"]
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert 100 not in ids  # exact dup of doc 0 removed
    assert 0 in ids and 101 in ids


def test_minhash_dedup_config(ray_session):
    out = topology.build(
        {
            "sources": {"docs": {"type": "inline", "rows": _doc_rows()}},
            "transforms": {
                "dd": {
                    "type": "minhash_dedup",
                    "inputs": ["docs"],
                    "jaccard_threshold": 0.7,
                }
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["dd"]}},
        }
    )["out"]
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert 100 not in ids and 101 not in ids  # near-dups collapse
    assert 0 in ids


def test_text_analysis_config(ray_session):
    out = topology.build(
        {
            "sources": {"docs": {"type": "inline", "rows": _doc_rows()[:5]}},
            "transforms": {
                "ta": {
                    "type": "text_analysis",
                    "inputs": ["docs"],
                    "analyses": ["tokens", "quality", "lang"],
                }
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["ta"]}},
        }
    )["out"]
    rows = out.take_all()
    assert {"n_ws_tokens", "quality_score", "lang_pred"} <= set(rows[0])
    assert all(r["lang_pred"] == "en" for r in rows)


def test_ann_topk_config(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8)).astype("float32")
    rows = [
        {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))
    ]
    out = topology.build(
        {
            "sources": {"emb": {"type": "inline", "rows": rows}},
            "transforms": {
                "ann": {
                    "type": "ann_topk",
                    "inputs": ["emb"],
                    "queries": [vecs[7].tolist()],
                    "k": 3,
                }
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["ann"]}},
        }
    )["out"]
    got = out.take_all()
    assert len(got) == 3
    best = max(got, key=lambda r: r["score"])
    assert best["vec_id"] == 7 and best["score"] == pytest.approx(1.0, abs=1e-5)


def test_embedding_dedup_config(ray_session):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((30, 16)).astype("float32")
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(30)]
    # plant a near-duplicate of vector 3
    rows.append({"vec_id": 99, "embedding": (vecs[3] * 1.001).tolist()})
    out = topology.build(
        {
            "sources": {"emb": {"type": "inline", "rows": rows}},
            "transforms": {
                "dd": {
                    "type": "embedding_dedup",
                    "inputs": ["emb"],
                    "threshold": 0.98,
                }
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["dd"]}},
        }
    )["out"]
    ids = sorted(r["vec_id"] for r in out.take_all())
    assert 99 not in ids and 3 in ids


def test_multimodal_config(ray_session):
    from vector_ray.pipelines.multimodal import synth_media_batch

    media = synth_media_batch(0, 12)
    out = topology.build(
        {
            "sources": {
                "media": {
                    "type": "inline",
                    "rows": media.to_pylist(),
                }
            },
            "transforms": {
                "feat": {"type": "image_features", "inputs": ["media"], "batch_size": 8}
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["feat"]}},
        }
    )["out"]
    rows = out.take_all()
    n_images = sum(1 for k in media["kind"].to_pylist() if k == "image")
    assert len(rows) == n_images > 0
    assert "luma_entropy" in rows[0] and "mean_rgb" in rows[0]


def test_text_analysis_config_custom_text_col(ray_session):
    """text_col must reach EVERY stage — LangId previously kept its
    default 'text' and crashed on a renamed column."""
    rows = [dict(r) for r in _doc_rows()[:5]]
    for r in rows:
        r["body"] = r.pop("text")
    out = topology.build(
        {
            "sources": {"docs": {"type": "inline", "rows": rows}},
            "transforms": {
                "ta": {
                    "type": "text_analysis",
                    "inputs": ["docs"],
                    "text_col": "body",
                    "analyses": ["tokens", "quality", "lang", "fingerprint"],
                }
            },
            "sinks": {"out": {"type": "sink_blackhole", "inputs": ["ta"]}},
        }
    )["out"]
    got = out.take_all()
    assert {"n_ws_tokens", "quality_score", "lang_pred"} <= set(got[0])
    assert all(r["lang_pred"] == "en" for r in got)
