"""Text-analysis kernels for large-scale training-data pipelines.

All are vectorized per-batch functions over the ``documents`` table
shape (doc_id, text, lang, source, n_chars):

- token_count: whitespace tokens + a BPE-ish word/punct regex count
- quality_score: length / punctuation / stopword-ratio heuristics
- lang_id: character-n-gram + stopword heuristic language guesser
- fingerprint: 64-bit polynomial rolling hash of normalized text

Stateful pieces (compiled regexes, stopword tables) live in callable
classes → actor pools via map_batches(Cls, concurrency=N).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------ counting

_WS_TOKEN_RE = r"\S+"
# BPE-ish: words, numbers, or single punctuation marks (GPT-2-style
# pre-tokenization shape, re-expressed as a plain regex)
_BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_ws_tokens + n_bpe_tokens (vectorized regex counts)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ws = pc.count_substring_regex(col, pattern=_WS_TOKEN_RE)
    bpe = pc.count_substring_regex(col, pattern=_BPE_TOKEN_RE)
    batch = batch.append_column("n_ws_tokens", ws.cast(pa.int64()))
    return batch.append_column("n_bpe_tokens", bpe.cast(pa.int64()))


# ------------------------------------------------------------- quality

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with for on "
    "as at by from not have has had but they you we he she his her its"
).split()


class QualityScorer:
    """Actor-pool stage: doc-quality heuristics (C4/Gopher-style rules,
    re-expressed): length, mean word length, punctuation density,
    stopword ratio, repetition ratio → one [0,1] score."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = frozenset(_STOPWORDS)
        self.word_re = re.compile(r"[a-z']+")
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype(str)
        lower = text.str.lower()
        words = lower.str.findall(self.word_re)
        n_words = words.str.len().clip(lower=1)
        n_chars = text.str.len()
        mean_wlen = lower.str.replace(r"[^a-z']", "", regex=True).str.len() / n_words
        punct_ratio = text.str.count(self.punct_re) / n_chars.clip(lower=1)
        stop = self.stop
        stop_ratio = words.map(lambda ws: sum(w in stop for w in ws) / max(1, len(ws)))
        uniq_ratio = words.map(lambda ws: len(set(ws)) / max(1, len(ws)))
        score = (
            (n_words.clip(5, 500) / 500) * 0.2
            + ((mean_wlen.clip(2, 10) - 2) / 8) * 0.2
            + (1 - punct_ratio.clip(0, 0.5) * 2) * 0.2
            + stop_ratio.clip(0, 0.5) * 2 * 0.2
            + uniq_ratio * 0.2
        )
        batch = batch.copy()
        batch["n_words"] = n_words.astype("int64")
        batch["stop_ratio"] = stop_ratio
        batch["quality_score"] = score
        return batch


# -------------------------------------------------------------- lang id

_LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "es", "y", "que"],
    "de": ["der", "die", "und", "ist", "das"],
    "zh": [],  # detected by CJK codepoint ratio
}


class LangId:
    """Actor-pool stage: stopword-marker + CJK-ratio language guess.

    A deliberately simple, deterministic heuristic (the container has
    no fasttext); the Ray-side plumbing (actor pool, batch size,
    schema) is the real deliverable.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.markers = {
            lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items() if ws
        }
        self.word_re = re.compile(r"[a-zàâçéèêëîïôûùüÿñæœäöüß']+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype(str)
        lower = text.str.lower()
        cjk = text.str.count(self.cjk_re) / text.str.len().clip(lower=1)
        words = lower.str.findall(self.word_re)

        def guess(ws, cjk_ratio):
            if cjk_ratio > 0.2:
                return "zh"
            if not ws:
                return "und"
            best, best_n = "und", 0
            for lang, marks in self.markers.items():
                n = sum(w in marks for w in ws)
                if n > best_n:
                    best, best_n = lang, n
            return best

        batch = batch.copy()
        batch["lang_pred"] = [guess(w, c) for w, c in zip(words, cjk)]
        return batch


# --------------------------------------------------------- fingerprint

_FP_BASE = np.uint64(1099511628211)


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit polynomial rolling hash over normalized text → ``fp`` column.

    Normalization: lowercase + collapse whitespace, so trivially
    reformatted duplicates collide (document-fingerprint dedup key).
    """
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    norm = pc.replace_substring_regex(pc.utf8_lower(col), pattern=r"\s+", replacement=" ")
    from .hashes import hash_string_column

    fp = hash_string_column(norm)
    return batch.append_column("fp", pa.array(fp.view(np.int64)))
