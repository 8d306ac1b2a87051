"""Text-analysis stages for training-data pipelines over the documents table.

Large-scale pipeline ops beyond the reference's geodesic surface: token
counting, quality scoring, language ID, and document fingerprinting — each a
vectorized ``map_batches`` stage. Regexes are compiled once per actor
(:class:`TextAnalyzer` pattern) or at module import for task mode.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (public-knowledge common-word lists).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "de", "por"},
    "hi": {"का", "के", "में", "है", "और", "से", "को", "पर", "यह", "कि"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "就", "不", "人"},
}


def add_token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace-token count per row (regex ``\\S+``, matches the SQL oracle)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = np.fromiter(
            (len(_TOKEN_RE.findall(t)) if t else 0 for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return batch.append_column(out_col, pa.array(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_quality_score(ds, text_col: str = "text"):
    """Length/space-ratio quality features, fully Arrow-vectorized.

    Emits ``n_chars_q`` (utf8 length), ``n_spaces`` and ``space_ratio`` —
    arithmetic only, so the DuckDB oracle reproduces them exactly.
    """

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        n_chars = pc.utf8_length(t)
        n_spaces = pc.count_substring(t, " ")
        ratio = pc.divide(
            pc.cast(n_spaces, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
        )
        batch = batch.append_column("n_chars_q", pc.cast(n_chars, pa.int64()))
        batch = batch.append_column("n_spaces", pc.cast(n_spaces, pa.int64()))
        return batch.append_column("space_ratio", ratio)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LangIdActor:
    """Stopword-profile language identifier (actor pool; profiles built once).

    A deliberately simple n-gram/stopword heuristic — the point is the
    actor-pool plumbing (stateful setup in ``__init__``, vectorized
    ``__call__``), mirroring how a real fastText-style model would be loaded
    once per actor at scale.
    """

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            words = self.word_re.findall((t or "").lower())
            if not words:
                preds.append("und")
                continue
            best, best_hits = "und", 0
            for lang, prof in self.profiles.items():
                hits = sum(1 for w in words if w in prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def add_lang_id(ds, concurrency: int | tuple[int, int] = 2, batch_size: int = 4096):
    return ds.map_batches(
        LangIdActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def _poly_hash_codepoints(text: str, mod: int = (1 << 61) - 1, base: int = 1000003) -> int:
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """Rolling polynomial hash fingerprint of the normalized text (int64)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fp = np.fromiter(
            (_poly_hash_codepoints(" ".join((t or "").split())) & 0x7FFFFFFFFFFFFFFF for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return batch.append_column(out_col, pa.array(fp, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
