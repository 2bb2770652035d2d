"""Text-analysis stages over the ``documents`` table (training-data pipeline ops).

Vectorized per-batch kernels (pyarrow.compute / pandas) — no per-row Python in
hot paths except the md5 fingerprint (hashlib over a C loop via pandas map).
Language-ID and quality scoring are stateful actor-pool stages (stopword tables
and compiled regexes built once per actor in ``__init__``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _docs(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --- token counting (SQL-checkable) -----------------------------------------


def token_counts(sf_dir: str) -> pa.Table:
    """Whitespace token count per doc. Oracle: regexp_split_to_array(trim(text),'\\s+')."""

    def count(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks).cast(pa.int64())
        n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, type=pa.int64()), n)
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(count, batch_format="pyarrow")
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("doc_id")


def char_stats(sf_dir: str) -> pa.Table:
    """Character length per doc (scalar string fn family, SURVEY §2.8)."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "n_chars_c": pc.utf8_length(batch["text"]).cast(pa.int64())}
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("doc_id")


def doc_fingerprint(sf_dir: str) -> pa.Table:
    """md5 content fingerprint per doc (exact-dedup key). Oracle: md5(text)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch["fp"] = batch["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return batch[["doc_id", "fp"]]

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("doc_id")


# --- language ID + quality scoring (actor-pool, heuristic — rows-only check) -

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "por"},
}


class LangQuality:
    """Actor-pool stage: language heuristic + quality score per document.

    State built once per actor (SURVEY §2.3 pattern): compiled tokenizer regex,
    stopword lookup tables, and a CJK codepoint range check for 'zh'.
    """

    def __init__(self):
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        toks = texts.str.lower().str.findall(self.word_re)
        n_tok = toks.map(len)

        def lang_of(ws_text):
            ws, raw = ws_text
            if any("一" <= ch <= "鿿" for ch in raw[:200]):
                return "zh"
            best, best_hits = "und", 0
            s = set(ws[:200])
            for lang, stop in self.stop.items():
                hits = len(s & stop)
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best

        batch["lang_pred"] = list(map(lang_of, zip(toks, texts)))
        # quality: length, punctuation ratio, token diversity, mean token length
        n_chars = texts.str.len().clip(lower=1)
        punct = texts.str.count(r"[^\w\s]") / n_chars
        diversity = toks.map(lambda ws: len(set(ws)) / max(1, len(ws)))
        mean_tok = toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        score = (
            0.3 * np.clip(n_tok / 100.0, 0, 1)
            + 0.3 * diversity
            + 0.2 * (1.0 - np.clip(punct * 5, 0, 1))
            + 0.2 * np.clip(mean_tok / 8.0, 0, 1)
        )
        batch["n_tokens"] = n_tok.astype("int64")
        batch["quality"] = score.round(4)
        return batch[["doc_id", "lang_pred", "n_tokens", "quality"]]


def lang_quality(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangQuality, batch_format="pandas", batch_size=2048, concurrency=2
    )
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("doc_id")


# --- rolling-hash document fingerprinting (winnowing-style, rows-only) ------


def winnow_fingerprints(sf_dir: str, k: int = 5, w: int = 4) -> pa.Table:
    """Winnowing fingerprint (Schleimer et al. 2003, public): min rolling hash
    per window over k-gram token hashes; returns a small set per doc."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_fps = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = text.lower().split()
            if len(toks) < k:
                out_ids.append(doc_id)
                out_fps.append([])
                continue
            hs = rolling_gram_hashes(hash_tokens(toks), k)
            if len(hs) >= w:
                win = np.lib.stride_tricks.sliding_window_view(hs, w)
                fps = np.unique(win.min(axis=1))
            else:
                fps = np.array([hs.min()], dtype=np.uint64)
            out_ids.append(doc_id)
            out_fps.append([int(np.int64(np.uint64(x))) for x in fps[:16]])  # wrap to int64
        return pd.DataFrame({"doc_id": out_ids, "fingerprints": out_fps})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("doc_id")


def hash_str64(s: str) -> int:
    """Stable 64-bit string hash (md5-derived — process-independent)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """Vectorized stable uint64 hash per token (pandas siphash, fixed key —
    process-independent). C-speed; use instead of per-token md5 in hot paths."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


_G1, _G2, _G3 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9)


def rolling_gram_hashes(tok_hashes: np.ndarray, k: int) -> np.ndarray:
    """k-gram hashes from token hashes via a positional mix — no string joins.

    Vectorized rolling combine: gram_i = mix(h[i], h[i+1], ..., h[i+k-1])."""
    n = len(tok_hashes)
    if n < k:
        if n == 0:
            return np.zeros(0, dtype=np.uint64)
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            acc = acc * _G1 + tok_hashes[j : j + 1]
        return acc
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * _G1 + tok_hashes[j : n - k + 1 + j] * _G2
    return acc ^ (acc >> np.uint64(29))
