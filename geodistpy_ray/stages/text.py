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


_SPLIT_MUL = 2654435761
_SAMPLE_MUL = 998244353  # distinct multiplier: sample must not correlate with split
_SPLIT_MOD = 1_000_000


def add_split(ds, id_col: str = "doc_id", val_pct: int = 10, test_pct: int = 10, out_col: str = "split"):
    """Deterministic train/val/test assignment by integer-hash of the id.

    ``bucket = ((id % 1e6) * 2654435761) % 1e6`` → val if < val_pct%, test
    if next test_pct%, else train. Pure arithmetic (no RNG), so the
    assignment is stable across runs/partitions and bit-reproducible in SQL
    — the property a training-data pipeline needs so a document never
    migrates between splits between runs. The id is reduced mod 1e6 BEFORE
    the multiply so the product stays < 2^63 for any int64 id (silent
    numpy wraparound would otherwise diverge from the SQL mirror).
    """
    val_cut = val_pct * (_SPLIT_MOD // 100)
    test_cut = (val_pct + test_pct) * (_SPLIT_MOD // 100)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((ids % _SPLIT_MOD) * _SPLIT_MUL) % _SPLIT_MOD
        split = np.where(b < val_cut, "val", np.where(b < test_cut, "test", "train"))
        return batch.append_column(out_col, pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_sql(id_col: str = "doc_id", val_pct: int = 10, test_pct: int = 10) -> str:
    """SQL expression mirroring :func:`add_split` bit-for-bit."""
    val_cut = val_pct * (_SPLIT_MOD // 100)
    test_cut = (val_pct + test_pct) * (_SPLIT_MOD // 100)
    # non-negative inner mod: SQL % follows the dividend's sign, numpy's
    # the divisor's — they must agree for negative ids too
    nn = f"CAST(((({id_col}) % {_SPLIT_MOD} + {_SPLIT_MOD}) % {_SPLIT_MOD}) AS BIGINT)"
    b = f"(({nn} * {_SPLIT_MUL}) % {_SPLIT_MOD})"
    return (
        f"(CASE WHEN {b} < {val_cut} THEN 'val' "
        f"WHEN {b} < {test_cut} THEN 'test' ELSE 'train' END)"
    )


def sample_fraction(ds, pct: int, id_col: str = "doc_id", salt: int = 7):
    """Deterministic ~pct% sample by id hash (no RNG — rerunnable, and a
    row's membership never depends on partitioning). The scale-honest
    alternative to ``Dataset.random_sample`` for reproducible pipelines.
    Uses a DIFFERENT multiplier than :func:`add_split` (a shared multiplier
    with an additive salt makes the sample a fixed shift of the split
    bucket — perfectly correlated, badly biasing sampled statistics)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (((ids + salt) % _SPLIT_MOD) * _SAMPLE_MUL) % _SPLIT_MOD
        return batch.filter(pa.array(b < pct * (_SPLIT_MOD // 100)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def add_host(ds, url_col: str = "url", out_col: str = "host"):
    """url column → host column (vectorized regex extract; the SURVEY §2.4
    url→host scalar function). Unparseable urls get empty-string hosts."""
    import re

    pat = re.compile(_HOST_RE)

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(batch.column(url_col).to_pylist(), dtype="object")
        host = s.str.extract(pat.pattern, expand=False).fillna("")
        return batch.append_column(out_col, pa.array(host.tolist(), pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
