"""Planted duplicate-cluster fixtures for oracle-checking near-dup dedup.

The raw ``documents`` corpus contains organic near-duplicates (it is
drawn from a tiny vocabulary — some doc pairs share 96 % of their
words), so "run minhash over documents" has no SQL-expressible
expected output.  These builders derive a corpus from the documents
table whose expected survivor set IS SQL-trivial:

1. every base text is rewritten as a stream of doc-unique tokens
   (word count preserved from the real text; each token derives
   deterministically from (doc_id, position)), so distinct base docs
   are pairwise dissimilar BY CONSTRUCTION — no organic pair can cross
   any reasonable similarity threshold;
2. for a deterministic subset of doc_ids, duplicate variants are
   planted with offset ids (base + 1_000_000, + 2_000_000, …) that ARE
   near-dups of their base by construction.

Dedup keeps the minimum id per duplicate component; base ids are
smaller than every planted offset, so the expected survivor set is
exactly the base ids — in SQL: ``SELECT doc_id FROM documents``.

The builders run per batch with a pandas apply: this is TEST-HARNESS
construction (bounded fixture sizes), not an engine hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PLANT_MOD = (0, 3, 7)  # plant variants for doc_id % 10 in this set
WS_OFFSET = 1_000_000  # whitespace/case variant (normalization-equal)
MUT_OFFSET = 2_000_000  # mutated variant (high-but-<1 Jaccard)
REV_OFFSET = 3_000_000  # word-reversed variant (same token bag)
MIN_MUT_CHARS = 300  # only long docs get a mutation variant


def _salt(text: str, doc_id: int) -> str:
    """Rewrite the text as doc-unique tokens, preserving word count.

    Token = hex of a (doc_id, position) arithmetic hash — tokens of
    different docs share essentially no character 5-grams, so base
    docs are pairwise dissimilar regardless of how similar the
    original texts were."""
    n = max(len(text.split()), 8)
    return " ".join(
        f"t{(doc_id * 1_000_003 + j * 7_919) % 2**32:08x}" for j in range(n)
    )


def _mutate(text: str, doc_id: int, every: int = 24) -> str:
    """Replace every ``every``-th word with a doc-unique token (true
    Jaccard stays well above typical thresholds)."""
    words = text.split()
    for i in range(0, len(words), every):
        words[i] = f"m{doc_id}x{i}"
    return " ".join(words)


def _ws_case_variant(text: str) -> str:
    """Differs only in case and whitespace runs — normalization-equal."""
    return text.upper().replace(" ", "  ")


def _reverse_words(text: str) -> str:
    return " ".join(reversed(text.split()))


def _planted(batch: pa.Table, variants, id_col: str, text_col: str) -> pa.Table:
    df = batch.select([id_col, text_col]).to_pandas()
    base_text = [
        _salt(t, i) for i, t in zip(df[id_col].to_numpy(), df[text_col].to_numpy())
    ]
    out_ids = [df[id_col].to_numpy()]
    out_texts = [np.asarray(base_text, dtype=object)]
    plant = np.isin(df[id_col].to_numpy() % 10, PLANT_MOD)
    lens = df[text_col].str.len().to_numpy()
    for offset, fn, needs_len in variants:
        sel = plant & (lens >= MIN_MUT_CHARS if needs_len else plant)
        ids = df[id_col].to_numpy()[sel]
        texts = [fn(t, i) for i, t in zip(ids, np.asarray(base_text, dtype=object)[sel])]
        out_ids.append(ids + offset)
        out_texts.append(np.asarray(texts, dtype=object))
    return pa.table(
        {
            id_col: pa.array(np.concatenate(out_ids), type=pa.int64()),
            text_col: pa.array(np.concatenate(out_texts), type=pa.string()),
        }
    )


def planted_minhash_corpus(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Base (salted) + normalization-equal copies + mutated copies."""
    variants = [
        (WS_OFFSET, lambda t, i: _ws_case_variant(t), False),
        (MUT_OFFSET, lambda t, i: _mutate(t, i), True),
    ]
    return docs.map_batches(
        lambda b: _planted(b, variants, id_col, text_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def planted_simhash_corpus(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Base (salted) + normalization-equal copies + word-reversed copies
    (simhash is a token-bag hash: reversal is hash-identical)."""
    variants = [
        (WS_OFFSET, lambda t, i: _ws_case_variant(t), False),
        (REV_OFFSET, lambda t, i: _reverse_words(t), False),
    ]
    return docs.map_batches(
        lambda b: _planted(b, variants, id_col, text_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def planted_embedding_corpus(emb, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Base + positively-scaled copies (cosine exactly 1, identical
    hyperplane signs) with offset ids."""
    from ..functions.vectors import list_to_matrix, matrix_to_list

    def _fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = list_to_matrix(batch[vec_col], np.float32)
        plant = np.isin(ids % 10, PLANT_MOD)
        out_ids = np.concatenate([ids, ids[plant] + WS_OFFSET])
        out_m = np.concatenate([m, m[plant] * np.float32(1.5)])
        return pa.table(
            {
                id_col: pa.array(out_ids, type=pa.int64()),
                vec_col: matrix_to_list(out_m, value_type=pa.float32()),
            }
        )

    return emb.map_batches(_fn, batch_format="pyarrow", batch_size=None)
