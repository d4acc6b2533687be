"""Text analysis stages for a training-data pipeline (documents table).

Stateful setup (compiled regexes, stopword tables) lives in callable
classes — once per actor, not per batch (actor-pool map_batches).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import fnv1a64_strings
from ..relational.ops import round_half_away

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"},
    "de": {"der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "nicht"},
    "zh": {"的", "是", "在", "了", "和", "有", "我", "不", "人", "这"},
}


class TokenStats:
    """token count + character-class ratios, vectorized via pandas str
    ops; rounding fixed at 6 so an SQL oracle can reproduce values."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = df[self.text_col].fillna("")
        n_chars = t.str.len()
        n_tokens = t.str.split().str.len().fillna(0)
        n_alpha = t.str.count(r"[A-Za-z]")
        n_digit = t.str.count(r"[0-9]")
        n_space = t.str.count(r"\s")
        denom = n_chars.clip(lower=1)
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "n_chars": n_chars.astype("int64"),
                "n_tokens": n_tokens.astype("int64"),
                "alpha_ratio": round_half_away(n_alpha / denom, 6),
                "digit_ratio": round_half_away(n_digit / denom, 6),
                "space_ratio": round_half_away(n_space / denom, 6),
            }
        )


def token_stats(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(TokenStats(text_col, id_col), batch_format="pandas")


class QualityScore:
    """Composite quality score in [0,1]: length band + alpha ratio +
    mean token length band + repetition penalty. Deterministic."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = df[self.text_col].fillna("")
        toks = t.str.split()
        n_tok = toks.str.len().fillna(0).astype("int64")
        n_chars = t.str.len().astype("int64")
        uniq = toks.map(lambda ws: len(set(ws)) if isinstance(ws, list) else 0)
        rep = 1.0 - uniq / n_tok.clip(lower=1)
        len_score = ((n_tok >= 10) & (n_tok <= 5000)).astype(float)
        alpha = t.str.count(r"[A-Za-z一-鿿]") / n_chars.clip(lower=1)
        score = (0.4 * len_score + 0.3 * alpha.clip(0, 1) + 0.3 * (1 - rep)).round(6)
        return pd.DataFrame(
            {self.id_col: df[self.id_col], "quality": score, "rep_ratio": rep.round(6)}
        )


class LangId:
    """n-gram-free heuristic language ID by stopword voting; setup (the
    token regex + stopword tables) happens once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.word_re = re.compile(r"\w+", re.UNICODE)
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in df[self.text_col].fillna(""):
            toks = self.word_re.findall(t.lower())
            best, best_n = "en", -1
            for lang, tab in sorted(self.tables.items()):
                n = sum(1 for w in toks if w in tab)
                # for zh, also count CJK characters
                if lang == "zh":
                    n += sum(1 for c in t if "一" <= c <= "鿿")
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pd.DataFrame({self.id_col: df[self.id_col], "pred_lang": preds})


def lang_id(ds: ray.data.Dataset, text_col="text", id_col="doc_id",
            concurrency: int = 4) -> ray.data.Dataset:
    """Actor-pool stage: LangId holds compiled state per actor."""
    return ds.map_batches(
        LangId, batch_format="pandas",
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        concurrency=concurrency,
    )


class Fingerprint:
    """64-bit document fingerprint: FNV over the token sequence plus a
    rolling window-hash min (robust to small edits) — the content-hash
    dedup key (mbtiles.cpp:104-149 analogue for text)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", window: int = 8):
        self.text_col = text_col
        self.id_col = id_col
        self.window = window

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        full = fnv1a64_strings(df[self.text_col].fillna("").to_numpy())
        mins = []
        for t in df[self.text_col].fillna(""):
            toks = t.split()
            if len(toks) < self.window:
                mins.append(int(fnv1a64_strings([t])[0]) if t else 0)
                continue
            grams = [" ".join(toks[i : i + self.window]) for i in range(len(toks) - self.window + 1)]
            mins.append(int(fnv1a64_strings(grams).min()))
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "fingerprint": full.astype(np.int64),
                "window_min": np.array(mins, dtype=np.uint64).astype(np.int64),
            }
        )


class Chunker:
    """Fixed-token-window document chunking with overlap — the
    context-window packing step of a training-data pipeline. Documents
    split on whitespace; chunk i covers tokens [i*stride, i*stride +
    size) with stride = size - overlap, the trailing short chunk kept;
    empty documents produce no chunks. Emits one row per chunk with
    the token count and a 64-bit FNV-1a of the canonical single-space
    rejoin — so only (doc_id, chunk_idx, counts, hash) ride any
    downstream shuffle, never the text. Runs in map_batches (an
    embarrassingly parallel flat map); at 100 TB the output is
    id-stream-sized and chunk text is re-derivable from the source."""

    def __init__(self, size: int = 64, overlap: int = 16,
                 text_col: str = "text", id_col: str = "doc_id"):
        if overlap >= size:
            raise ValueError("overlap must be < size")
        self.size = size
        self.stride = size - overlap
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, counts, texts = [], [], [], []
        for did, t in zip(df[self.id_col], df[self.text_col].fillna("")):
            toks = t.split()
            n = len(toks)
            i = 0
            start = 0
            while start < n:
                chunk = toks[start:start + self.size]
                ids.append(did)
                idxs.append(i)
                counts.append(len(chunk))
                texts.append(" ".join(chunk))
                i += 1
                start += self.stride
        h = (fnv1a64_strings(np.array(texts, dtype=object))
             .astype(np.int64) if texts else np.empty(0, np.int64))
        return pd.DataFrame({
            self.id_col: pd.array(ids, dtype="int64"),
            "chunk_idx": pd.array(idxs, dtype="int64"),
            "n_tokens": pd.array(counts, dtype="int64"),
            "chunk_hash": h,
        })


def chunk_documents(ds: ray.data.Dataset, size: int = 64,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(Chunker(size, overlap, text_col, id_col),
                          batch_format="pandas")
