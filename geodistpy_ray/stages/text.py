"""Text-analysis stages for training-data pipelines over the documents table.

Large-scale pipeline ops beyond the reference's geodesic surface: token
counting, quality scoring, language ID, and document fingerprinting — each a
vectorized ``map_batches`` stage. Hot-path string work runs on Arrow RE2
kernels; the one stateful stage (:class:`LangIdActor`) compiles its
patterns once per actor in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    """Whitespace-token count per row (regex ``\\S+``, matches the SQL
    oracle) — a single Arrow kernel, no Python per row."""

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column(text_col), "")
        n = pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64())
        return batch.append_column(out_col, n)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_normalized_text(ds, text_col: str = "text", out_col: str = "norm_text"):
    """Canonical text form for dedup/fingerprinting: lowercase, collapse
    whitespace runs to single spaces, trim — three Arrow kernels (RE2, the
    same regex engine DuckDB uses, so the SQL mirror is exact):
    ``TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))``."""

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim(t, " ")
        return batch.append_column(out_col, t)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# PII patterns, applied IN THIS ORDER (order matters: the phone pattern
# would otherwise eat IPv4 digit runs). RE2 syntax — the same engine on
# both sides, so the DuckDB mirror `redact_pii_sql` is exact.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d()\-\s]{6,}\d", "<PHONE>"),
)


def redact_pii(ds, text_col: str = "text", out_col: str = "redacted"):
    """Scrub emails / IPv4 addresses / phone-number spans to typed
    placeholder tokens — the standard pre-training privacy pass, as chained
    Arrow RE2 kernels (one `replace_substring_regex` per pattern, no Python
    per row). Mirror with :func:`redact_pii_sql` (nested ``REGEXP_REPLACE``
    in the same pattern order — DuckDB is RE2 too, so behavior is
    identical)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column(text_col), "")
        for pat, repl in PII_PATTERNS:
            t = pc.replace_substring_regex(t, pat, repl)
        return batch.append_column(out_col, t)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def redact_pii_sql(expr: str) -> str:
    """The exact SQL mirror of :func:`redact_pii` applied to ``expr``."""
    out = expr
    for pat, repl in PII_PATTERNS:
        # standard SQL string literals: backslash is literal (no doubling);
        # only single quotes need escaping
        sql_pat = pat.replace("'", "''")
        out = f"REGEXP_REPLACE({out}, '{sql_pat}', '{repl}', 'g')"
    return out


def space_ratio_ppm(n_spaces, n_chars) -> np.ndarray:
    """``floor(n_spaces * 1e6 / max(n_chars, 1))`` as int64 — THE quality
    space-ratio key, oracle-critical: it must stay bit-identical to the SQL
    mirror ``FLOOR(CAST(n_spaces AS DOUBLE) * 1000000.0 /
    GREATEST(n_chars, 1))`` (same fp ops, FLOOR not ROUND so integer-ratio
    ties can't split half-even vs half-away). One shared helper so the
    formula cannot drift between the quality queries and the curation
    gates that reuse it."""
    ns = np.asarray(n_spaces).astype(np.float64)
    nc = np.maximum(np.asarray(n_chars), 1).astype(np.float64)
    return np.floor(ns * 1000000.0 / nc).astype(np.int64)


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


def add_json_int_field(ds, col: str, field: str, out_col: str | None = None):
    """Extract an integer field from a flat JSON string column — the event
    property-bag projection (``props`` → typed column) every event pipeline
    front-loads so downstream aggregates never re-parse strings.

    One Arrow RE2 kernel (``extract_regex`` with a named group), null when
    the field is absent — exact-by-construction SQL mirror via
    ``regexp_extract(col, pattern, 1)`` (DuckDB is RE2 too). A production
    variant would swap in a real JSON parser kernel for nested/escaped
    documents; for flat integer fields the regex IS the parser.
    """
    out_col = out_col or field
    pat = f'"{re.escape(field)}"\\s*:\\s*(?P<v>-?\\d+)'

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.extract_regex(pc.fill_null(batch.column(col), ""), pat)
        return batch.append_column(out_col, pc.cast(pc.struct_field(s, "v"), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def json_int_field_sql(col: str, field: str) -> str:
    """The exact SQL mirror of :func:`add_json_int_field` — the field name
    is regex-escaped exactly like the engine side (an unescaped '.' in a
    field name would match any character only in the mirror)."""
    pat = f'"{re.escape(field)}"\\s*:\\s*(-?\\d+)'.replace("'", "''")
    return f"CAST(NULLIF(regexp_extract({col}, '{pat}', 1), '') AS BIGINT)"


class LangIdActor:
    """Stopword-profile language identifier (actor pool; profiles built once).

    A deliberately simple n-gram/stopword heuristic — the point is the
    actor-pool plumbing (stateful setup in ``__init__``, vectorized
    ``__call__``), mirroring how a real fastText-style model would be loaded
    once per actor at scale.
    """

    def __init__(self):
        self.langs = list(_LANG_PROFILES)
        # word → TUPLE of lang indices (a stopword shared by several
        # profiles — e.g. 'la'/'un'/'que' in both fr and es — must count
        # for EVERY owning language, exactly like the per-profile loops)
        wl: dict[str, list[int]] = {}
        for i, lang in enumerate(self.langs):
            for w in _LANG_PROFILES[lang]:
                wl.setdefault(w, []).append(i)
        self.word_langs = {w: tuple(v) for w, v in wl.items()}
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow front-end (the shared dedup.py idiom): lower + RE2 letter-run
        # split — `[^\p{L}\p{Nl}\p{No}]+` reproduces Python's `[^\W\d_]+`
        # findall exactly: Python \w also admits letter-numbers (Nl, '½' 'Ⅻ')
        # beyond \p{L}, while digits (Nd), underscore and marks all separate
        # on both sides (parity pinned against _predict_loop in tests,
        # including Nl/No inputs) — then dictionary_encode so the
        # stopword dict is probed once per UNIQUE batch token, and per-doc
        # hit counts come from vectorized bincounts over occurrences.
        col = batch.column("text")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        arr = pc.fill_null(arr, "")
        n = len(arr)
        L = len(self.langs)
        hits_mat = np.zeros((n, L), dtype=np.int64)
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"[^\p{L}\p{Nl}\p{No}]+")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_idx = doc_idx[nonempty]
        if len(flat):
            de = pc.dictionary_encode(flat)
            idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = de.dictionary.to_pylist()
            get = self.word_langs.get
            # ≤ len(word_langs) vocabulary entries can match at all, so the
            # per-matched-unique loop below is bounded by the profile size,
            # not the corpus
            matched = [(u, ls) for u, ls in enumerate((get(t, ()) for t in vocab)) if ls]
            if matched:
                code = np.full(len(vocab), -1, dtype=np.int64)
                for j, (u, _) in enumerate(matched):
                    code[u] = j
                occ_code = code[idx]
                hit = occ_code >= 0
                occ_code, occ_doc = occ_code[hit], doc_idx[hit]
                for j, (_, ls) in enumerate(matched):
                    sel = occ_code == j
                    if sel.any():
                        cnt = np.bincount(occ_doc[sel], minlength=n)
                        for li in ls:
                            hits_mat[:, li] += cnt
        best = hits_mat.argmax(axis=1)  # first max wins — profile order
        pred = np.where(
            hits_mat.max(axis=1, initial=0) == 0,
            "und",
            np.asarray(self.langs, dtype=object)[best],
        )
        return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))

    def _predict_loop(self, texts) -> list[str]:
        """Reference per-doc Python loop (the pre-vectorization semantics);
        kept for the parity test and as executable documentation."""
        out = []
        get = self.word_langs.get
        L = len(self.langs)
        for t in texts:
            hits = np.zeros(L, dtype=np.int64)
            for w in self.word_re.findall((t or "").lower()):
                for li in get(w, ()):
                    hits[li] += 1
            out.append("und" if hits.max(initial=0) == 0 else self.langs[int(hits.argmax())])
        return out


def add_lang_id(ds, concurrency: int | tuple[int, int] = (1, 2), batch_size: int = 4096):
    return ds.map_batches(
        LangIdActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1000003


def _poly_hash_codepoints(text: str, mod: int = _FP_MOD, base: int = _FP_BASE) -> int:
    """Scalar reference implementation (Horner form); the batch path below
    is asserted bit-identical to it in tests."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h


_fp_pows = np.array([1], dtype=np.uint64)


def _fp_powers(n: int) -> np.ndarray:
    """base^j mod p for j < n, cached and grown on demand."""
    global _fp_pows
    if _fp_pows.size < n:
        ext = np.empty(n, dtype=np.uint64)
        ext[: _fp_pows.size] = _fp_pows
        for j in range(_fp_pows.size, n):
            ext[j] = (int(ext[j - 1]) * _FP_BASE) % _FP_MOD
        _fp_pows = ext
    return _fp_pows[:n]


def _poly_hash_batch(norm_texts) -> np.ndarray:
    """Vectorized polynomial hash: h = Σ cp_i · base^(n-1-i) mod (2^61-1).

    Per text: one UTF-32 decode to a codepoint array, one elementwise
    mulmod against the cached power table (codepoints < 2^21 keep every
    product in u64 via the 2^61 ≡ 1 rotation), and a hi/lo split sum whose
    exact residue is finished in Python ints — no per-character loop.
    """
    p = np.uint64(_FP_MOD)
    lo29 = np.uint64((1 << 29) - 1)
    out = np.empty(len(norm_texts), dtype=np.int64)
    for i, t in enumerate(norm_texts):
        if not t:
            out[i] = 0
            continue
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        pw = _fp_powers(cps.size)[::-1]
        hi = pw >> np.uint64(32)
        lo = pw & np.uint64(0xFFFFFFFF)
        x = cps * hi  # < 2^50
        rot = (x >> np.uint64(29)) + ((x & lo29) << np.uint64(32))  # ·2^32 mod p
        term = rot + cps * lo  # < 2^62
        s_lo = int((term & np.uint64(0xFFFFFFFF)).sum())
        s_hi = int((term >> np.uint64(32)).sum())
        out[i] = ((s_lo + (s_hi << 32)) % _FP_MOD) & 0x7FFFFFFFFFFFFFFF
    return out


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """Rolling polynomial hash fingerprint of the normalized text (int64)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        norm = [" ".join((t or "").split()) for t in texts]
        return batch.append_column(out_col, pa.array(_poly_hash_batch(norm), pa.int64()))

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


def stratified_sample(
    ds,
    rates: dict,
    key_col: str = "lang",
    default_pct: int = 100,
    id_col: str = "doc_id",
    salt: int = 7,
):
    """Per-stratum deterministic sampling for mixture balancing: keep
    ~``rates[key]``% of each stratum (``default_pct`` for unlisted keys) by
    the SAME id-hash as :func:`sample_fraction` — so strata samples NEST
    (every row of a 10% stratum is in its 20% version) and membership never
    depends on partitioning. ``rates`` is a small per-stratum table riding
    in the task closure (languages/sources — dozens of keys; a huge rate
    table would go through ``ray.put`` + the broadcast cache instead).
    SQL mirror: the sample_fraction formula under a CASE over the key."""
    cuts = {k: int(v) * (_SPLIT_MOD // 100) for k, v in rates.items()}
    default_cut = int(default_pct) * (_SPLIT_MOD // 100)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (((ids + salt) % _SPLIT_MOD) * _SAMPLE_MUL) % _SPLIT_MOD
        import pandas as pd

        keys = pd.Series(batch.column(key_col).to_numpy(zero_copy_only=False))
        cut = keys.map(cuts).fillna(default_cut).to_numpy(dtype=np.int64)
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_by_rate(ds, rate_ppm_col: str, id_col: str = "doc_id", salt: int = 7):
    """Deterministic weighted sampling: keep each row with probability
    ``rate_ppm/1e6`` where the rate is a PER-ROW int64 column in
    parts-per-million — the continuous generalization of
    :func:`stratified_sample` (quality-weighted downsampling: derive the
    rate from any signal with Arrow arithmetic upstream). Same id-hash as
    :func:`sample_fraction`, so membership is partition-independent,
    rerunnable, and samples at growing rates NEST. Integer ppm (not a
    float probability) keeps the SQL mirror bit-exact: the comparison is
    int64 < int64 on both engines."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (((ids + salt) % _SPLIT_MOD) * _SAMPLE_MUL) % _SPLIT_MOD
        cut = batch.column(rate_ppm_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_CAP_MUL = 1812433253  # third distinct multiplier: cap rank must not
# correlate with split assignment or sample membership (a shared
# multiplier would make "the docs a cap keeps" a fixed slice of a split)


def cap_per_key(ds, key_col: str, id_col: str = "doc_id", k: int = 10, n_parts: int = 64):
    """Deterministic per-key downsampling cap → at most ``k`` rows per key
    (all columns pass through). The "cap over-represented domains" op of a
    web-corpus pipeline: sources/hosts follow a power law, and training
    mixes cap each one rather than letting the head dominate.

    Selection is by integer-hash rank (``((id % 1e6) * _CAP_MUL) % 1e6``,
    ties broken by id), NOT by arrival order — membership is a pure
    function of the id, so it is partition-independent, rerunnable, and
    bit-reproducible in SQL (``ROW_NUMBER() OVER (PARTITION BY key ORDER
    BY b, id) <= k``). One bounded shuffle via
    :func:`~.grouping.partitioned_map_groups`; inside a partition every
    key's rank is one lexsort + span sweep, never a per-key group.
    """
    from .grouping import key_spans, partitioned_map_groups

    def cap_part(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.int64)
        b = ((ids % _SPLIT_MOD) * _CAP_MUL) % _SPLIT_MOD
        keys = g[key_col].to_numpy()
        order = np.lexsort((ids, b, keys))
        sk = keys[order]
        rank = np.arange(sk.size, dtype=np.int64)
        starts, _ends = key_spans(sk)
        rank -= np.repeat(starts, np.diff(np.append(starts, sk.size)))
        return g.iloc[order[rank < k]]

    return partitioned_map_groups(ds, key_col, cap_part, n_parts=n_parts)


def splitmix64(ids: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over int64 ids → uint64 (vectorized, public
    constants). The engine's deterministic uniform-order hash for
    EXACT-size sampling: unlike the ppm-threshold samplers above (which
    keep a deterministic FRACTION), ordering by this hash and taking k
    gives exactly-k rows, reproducible across partitionings and runs.
    Mirrored bit-for-bit in SQL by :func:`splitmix64_sql`."""
    x = ids.astype(np.int64).view(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _mul_u64_sql(col: str, c: int) -> str:
    """SQL for ``(col * c) mod 2^64`` on UBIGINT — HUGEINT (int128)
    overflows on a full u64×u64 product, so split the constant into 32-bit
    halves: a·c ≡ a·c_lo + ((a_lo·c_hi + a_hi·c_lo) mod 2^32)·2^32."""
    ch, cl = c >> 32, c & 0xFFFFFFFF
    lo = f"CAST(({col}) % 4294967296 AS HUGEINT)"
    hi = f"CAST(({col}) // 4294967296 AS HUGEINT)"
    return (
        f"CAST(({lo} * {cl} + (({lo} * {ch} + {hi} * {cl}) % 4294967296) * 4294967296) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def splitmix64_sql(id_col: str) -> tuple[list[str], str]:
    """(CTE steps, final hash expression) mirroring :func:`splitmix64`
    bit-for-bit in DuckDB. Compose as
    ``WITH s1 AS (SELECT *, <steps[0]> AS z1 FROM t), ...`` — each step
    reads the previous alias ``z{i}``; the final expression reads the last.
    Verified identical to the numpy path in tests."""
    add = (
        f"CAST((CAST({id_col} AS HUGEINT) + 11400714819323198485) "
        f"% 18446744073709551616 AS UBIGINT)"
    )
    steps = [
        add,
        "xor(z1, z1 >> 30)",
        _mul_u64_sql("z2", 0xBF58476D1CE4E5B9),
        "xor(z3, z3 >> 27)",
        _mul_u64_sql("z4", 0x94D049BB133111EB),
    ]
    return steps, "xor(z5, z5 >> 31)"


def sample_exact_k(ds, k: int, id_col: str = "doc_id", keep_hash: bool = False):
    """EXACTLY-k uniform sample: the k rows with the smallest
    ``splitmix64(id)``, ties (impossible for distinct ids) broken by id.

    Scale shape: rides :func:`~.relational.global_topk` — per-batch local
    top-k combiner + bounded driver merge; no shuffle, no full sort, and
    the SAMPLE is a pure function of the id set (partition-independent,
    re-runnable). Use this for fixed-size eval/debug subsets; use
    ``sample_fraction`` when a fixed RATE is wanted instead. Returns a
    pandas DataFrame (k rows are driver-bounded by construction).
    """
    from .relational import global_topk

    if k < 1:
        raise ValueError("k must be >= 1")

    def tag(batch: pa.Table) -> pa.Table:
        if "__h" in batch.column_names:
            raise ValueError("sample_exact_k: '__h' column name is reserved")
        h = splitmix64(batch.column(id_col).to_numpy(zero_copy_only=False))
        return batch.append_column("__h", pa.array(h, pa.uint64()))

    out = global_topk(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        ["__h", id_col],
        k,
    )
    if keep_hash:
        return out.rename(columns={"__h": "sample_hash"})
    return out.drop(columns="__h")


def cap_rank_sql(id_col: str = "doc_id") -> str:
    """SQL ORDER-BY expression mirroring :func:`cap_per_key`'s rank hash
    bit-for-bit (non-negative inner mod: SQL ``%`` follows the dividend's
    sign, numpy's the divisor's)."""
    nn = f"CAST(((({id_col}) % {_SPLIT_MOD} + {_SPLIT_MOD}) % {_SPLIT_MOD}) AS BIGINT)"
    return f"(({nn} * {_CAP_MUL}) % {_SPLIT_MOD})"


def extract_text(ds, html_col: str = "html", out_col: str = "extracted_text"):
    """``html`` binary payload → extracted text (tag-strip via one Arrow RE2
    kernel — no Python per row, html bytes never leave the task).

    This is the extraction step of the north-rule pages pipeline
    (BASELINE.json ``input_hint``): the per-url invariant is that the
    extracted text is BYTE-IDENTICAL to the table's ``text`` column through
    every stage — enforce it with :func:`count_column_mismatches` after any
    stage that touches the payload. The markup grammar here is the pages
    fixture's (tags only, no entities); a production extractor swaps in
    behind the same column contract.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(html_col), pa.string())
        return batch.append_column(out_col, pc.replace_substring_regex(s, "<[^>]*>", ""))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Canonical URL form for web-corpus dedup keys: lowercase the
    scheme+host, strip the fragment, strip a trailing ``?`` or lone ``/``
    path, and drop explicit default ports (``:80`` for http, ``:443`` for
    https). Chained Arrow RE2 kernels — no Python per row — mirrored
    exactly in SQL by :func:`canonicalize_urls_sql` (same kernel order;
    regex-authority grammar, not a full RFC 3986 parser: userinfo and
    percent-encoding normalization are out of scope and documented so).
    """

    def fn(batch: pa.Table) -> pa.Table:
        u = pc.fill_null(batch.column(url_col), "")
        # 1. drop the fragment
        u = pc.replace_substring_regex(u, r"#.*$", "")
        # 2. lowercase scheme://host[:port] (group-referencing replace is
        #    unavailable, so lowercase the whole string, then restore the
        #    original path+query tail by length — RE2 gives us the split)
        m = pc.extract_regex(u, r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<tail>.*)$")
        head = pc.struct_field(m, "head")
        tail = pc.struct_field(m, "tail")
        parsed = pc.is_valid(head)
        head = pc.utf8_lower(pc.fill_null(head, ""))
        # 3. default ports off the lowered head
        head = pc.replace_substring_regex(head, r"^(http://[^/?#:]*):80$", r"\1")
        head = pc.replace_substring_regex(head, r"^(https://[^/?#:]*):443$", r"\1")
        rebuilt = pc.binary_join_element_wise(head, pc.fill_null(tail, ""), "")
        # 4. trailing '?' (empty query) and a lone '/' path
        rebuilt = pc.replace_substring_regex(rebuilt, r"\?$", "")
        rebuilt = pc.replace_substring_regex(rebuilt, r"^([a-z][a-z0-9+.-]*://[^/?#]*)/$", r"\1")
        out = pc.if_else(parsed, rebuilt, u)  # unparseable rows pass through
        return batch.append_column(out_col, out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def canonicalize_urls_sql(url_col: str = "url") -> str:
    """The exact DuckDB mirror of :func:`canonicalize_urls` (same kernel
    order, same regexes; RE2 on both sides)."""
    u = f"regexp_replace({url_col}, '#.*$', '')"
    head = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))"
    head = f"regexp_replace({head}, '^(http://[^/?#:]*):80$', '\\1')"
    head = f"regexp_replace({head}, '^(https://[^/?#:]*):443$', '\\1')"
    tail = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)"
    rebuilt = f"({head} || {tail})"
    rebuilt = f"regexp_replace({rebuilt}, '\\?$', '')"
    rebuilt = f"regexp_replace({rebuilt}, '^([a-z][a-z0-9+.-]*://[^/?#]*)/$', '\\1')"
    # the parsed test uses the engine's FULL anchored pattern: RE2's '.'
    # and '$' do not cross a newline, so a url containing one must fall to
    # the passthrough branch on BOTH sides (an unanchored scheme test would
    # rebuild a truncated head only in the mirror)
    parsed = f"regexp_matches({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$')"
    return f"CASE WHEN {parsed} THEN {rebuilt} ELSE {u} END"


# multi-label public suffixes the registrable-domain rule recognizes — a
# fixed demo subset of the public-suffix list (the full list is data, not
# logic; swap it in behind the same rule at deploy time)
MULTI_SUFFIXES = (
    "ac.uk", "co.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "com.br",
)


def add_registrable_domain(ds, url_col: str = "url", out_col: str = "domain"):
    """Registrable domain (eTLD+1) of each url's host — the per-domain
    rollup / cap / dedup key for web corpora.

    Rule: lowercase the authority host; if the host's last TWO labels form
    a known multi-label public suffix (:data:`MULTI_SUFFIXES`), the
    registrable domain is the last THREE labels, else the last two; a
    dotless host passes through as-is. Pure Arrow RE2 kernels, mirrored
    exactly by :func:`registrable_domain_sql`.

    Mirror caveat: rows whose url has no ``scheme://host`` authority get a
    NULL domain here but an empty string in DuckDB (``regexp_extract``'s
    no-match value) — callers comparing against the mirror keep urls
    well-formed or filter those rows.
    """

    def fn(batch: pa.Table) -> pa.Table:
        u = pc.fill_null(batch.column(url_col), "")
        host = pc.struct_field(
            pc.extract_regex(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?#:]*)"), "h"
        )
        host = pc.utf8_lower(host)
        last2 = pc.struct_field(pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$"), "d")
        last3 = pc.struct_field(
            pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"), "d"
        )
        # last two labels PRECEDED by a dot — i.e. a candidate multi-label
        # suffix of a host that still has a label to its left
        suf2 = pc.struct_field(pc.extract_regex(host, r"\.(?P<s>[^.]+\.[^.]+)$"), "s")
        is_multi = pc.fill_null(
            pc.is_in(suf2, value_set=pa.array(list(MULTI_SUFFIXES))), False
        )
        dom = pc.if_else(is_multi, last3, last2)
        dom = pc.if_else(pc.is_valid(dom), dom, host)  # dotless host → itself
        return batch.append_column(out_col, dom)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def registrable_domain_sql(url_col: str = "url") -> str:
    """The exact DuckDB mirror of :func:`add_registrable_domain` (same
    regexes, same label rule) for well-formed ``scheme://host`` urls."""
    host = f"lower(regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1))"
    suf2 = f"regexp_extract({host}, '\\.([^.]+\\.[^.]+)$', 1)"
    last3 = f"regexp_extract({host}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    last2 = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return (
        f"CASE WHEN {suf2} IN ({suffixes}) THEN {last3} "
        f"WHEN {host} LIKE '%.%' THEN {last2} ELSE {host} END"
    )


def extract_links(ds, html_col: str = "html", url_col: str = "url", href_col: str = "href"):
    """Explode each page into its outgoing links → one row per
    ``(url, href)`` edge — the web-graph front-end (feeds per-target
    in-degree, connected components, PageRank-style iterations).

    Arrow RE2 has no findall, so multi-match extraction is built from list
    kernels: split the html on ``href="`` (list per page), drop each list's
    first fragment (pre-first-link prose), and slice every remaining
    fragment at its closing quote — no Python per row, html bytes stay in
    the task.
    """

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        s = pc.cast(pc.fill_null(batch.column(html_col), b""), pa.string())
        parts = pc.split_pattern(s, 'href="')
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = parts.values if isinstance(parts, pa.Array) else parts.combine_chunks().values
        # fragment j of page i is a link iff j >= 1 within the page's list
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts = np.cumsum(lens) - lens
        within = np.arange(doc_idx.size, dtype=np.int64) - np.repeat(starts, lens)
        keep = within >= 1
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        href = pc.struct_field(pc.extract_regex(flat, '^(?P<href>[^"]*)'), "href")
        urls = batch.column(url_col).take(pa.array(doc_idx, pa.int64()))
        return pa.table({url_col: urls, href_col: href})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def count_column_mismatches(ds, a_col: str, b_col: str) -> int:
    """Number of rows where two string columns differ (NULL-safe: a NULL on
    one side only counts as a mismatch) — the streaming byte-identity
    check; one pass, one int on the driver."""

    def fn(batch: pa.Table) -> pa.Table:
        a, b = batch.column(a_col), batch.column(b_col)
        eq = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        bad = pc.sum(pc.invert(pc.or_(eq, both_null))).as_py() or 0
        return pa.table({"n_bad": pa.array([bad], pa.int64())})

    total = 0
    for b in ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        total += int(pc.sum(b.column("n_bad")).as_py() or 0)
    return total


_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/:?#]+)"


def add_host(ds, url_col: str = "url", out_col: str = "host"):
    """url column → lowercased host column (one Arrow RE2 ``extract_regex``
    kernel, no Python-object detour; the SURVEY §2.4 url→host scalar
    function). Schemes are case-insensitive per RFC 3986 — the sibling url
    ops (:func:`canonicalize_urls`, :func:`add_registrable_domain`) accept
    ``HTTP://`` too, and the host lowercases so per-host rollup keys agree
    across all three. Unparseable and null urls get empty-string hosts."""

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column(url_col), _HOST_RE)
        host = pc.utf8_lower(pc.fill_null(pc.struct_field(m, "host"), ""))
        return batch.append_column(out_col, host)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ── corpus token statistics (TF-IDF) ─────────────────────────────────────


def _doc_token_pairs(batch: pa.Table, id_col: str, text_col: str):
    """Whitespace-lowercase tokenize one batch → per-(doc, token) counts.

    All-Arrow front-end (same idiom as the dedup shingle path): two RE2-free
    kernels tokenize, ``dictionary_encode`` maps occurrences to a batch
    vocabulary, and one ``np.unique`` over composite (row, token-id) keys
    yields the within-doc term counts — no Python per token. Returns
    (doc_ids, token_strings, tf) aligned arrays.
    """
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    toks = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
    )
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)[nonempty]
    flat_clean = flat.filter(pa.array(nonempty))
    if isinstance(flat_clean, pa.ChunkedArray):  # Table columns arrive chunked
        flat_clean = flat_clean.combine_chunks()
    de = pc.dictionary_encode(flat_clean)
    tid = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    u = len(de.dictionary)
    if u == 0:
        empty = np.array([], dtype=np.int64)
        return empty, de.dictionary, empty
    key = row_idx * u + tid
    uk, tf = np.unique(key, return_counts=True)
    return ids[uk // u], de.dictionary.take(pa.array(uk % u)), tf.astype(np.int64)


def token_doc_frequency(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Document frequency per token → Dataset (token, df).

    Scale shape: each batch emits one row per DISTINCT (token, doc-in-batch)
    pre-aggregated to (token, batch-df) — the combiner — so the shuffle
    moves vocabulary-sized partials, never token occurrences; the final sum
    groups on a hash partition of the token (unbounded domain rule,
    stages/grouping.py).
    """
    from .grouping import partitioned_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        _, tokens, _tf = _doc_token_pairs(batch, id_col, text_col)
        # each (doc, token) appears once in the pair list → df partial is
        # just the token's multiplicity there
        if len(tokens) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        de = pc.dictionary_encode(tokens)
        tid = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid, cnt = np.unique(tid, return_counts=True)
        return pa.table(
            {"token": de.dictionary.take(pa.array(uid)), "df": cnt.astype(np.int64)}
        )

    partials = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(g):
        return g.groupby("token", as_index=False)["df"].sum()

    return partitioned_map_groups(partials, "token", merge)


def doc_token_tf(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Within-document term frequencies → Dataset (doc_id, token, tf)."""

    def fn(batch: pa.Table) -> pa.Table:
        doc, tokens, tf = _doc_token_pairs(batch, id_col, text_col)
        return pa.table({id_col: doc, "token": tokens, "tf": tf})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def tfidf_topk(
    ds,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
):
    """Top-k TF-IDF terms per document → (doc_id, token, score, rank).

    score = ROUND(tf · ln(n_docs / df), 6); rank is 1-based by
    (score desc, token asc) — the rounded score IS the ordering key on both
    the engine and the SQL-mirror side, so fp ulp differences in ``ln``
    cannot flip a tie. One bucketed shuffle joins (doc, token, tf) rows to
    the (token, df) table on the token — the IDF side is corpus-vocabulary
    sized, which is unbounded at web scale, so it is NOT broadcast — and
    the per-doc top-k groups on a hash partition of doc_id.
    """
    from .grouping import partitioned_map_groups, topk_per_group_part
    from .joins import shuffle_equi_join

    n_docs = ds.count()
    tf = doc_token_tf(ds, id_col, text_col)
    df = token_doc_frequency(ds, id_col, text_col)
    joined = shuffle_equi_join(tf, df, left_key="token", n_buckets=16)

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.round(tfv * np.log(float(n_docs) / dfv), round_to)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "token": batch.column("token"),
                "score": pa.array(s, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def topk_part(g):
        return topk_per_group_part(g, id_col, ["score", "token"], [False, True], k)

    return partitioned_map_groups(scored, id_col, topk_part)


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition features per document → Dataset
    (id, n_tokens, n_distinct, top_tok, top_bigram).

    The standard web-corpus repetition filters (fraction of the document
    covered by its most frequent token / most frequent adjacent token pair,
    distinct-token ratio) need only these four INTEGER counts — emitted as
    exact int64 so the DuckDB mirror is bit-identical with no rounding
    convention at all (count ratios can land exactly on a half-ulp of a
    decimal rounding, where round-half-even vs half-away diverges; integers
    sidestep the whole class).

    Scale shape: each document's text lives in one row, so every stat is
    per-batch local — NO shuffle, one vectorized pass: Arrow tokenize +
    ``dictionary_encode``, then ``np.unique`` over composite (row, token)
    keys for distinct/top-token and a two-step pair encoding for bigrams
    (pair codes are dictionary-encoded before composing with the row index
    so the composite key never exceeds rows × pairs — no u² overflow).

    Documents with zero (non-empty) tokens produce no row, matching the SQL
    mirror where an empty split yields no token rows. ``top_bigram`` is 0
    for single-token documents.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        id_type = batch.schema.field(id_col).type
        n = len(ids)
        empty = pa.table(
            {
                id_col: pa.array([], id_type),
                "n_tokens": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "top_tok": pa.array([], pa.int64()),
                "top_bigram": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        )
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)[nonempty]
        flat_clean = flat.filter(pa.array(nonempty))
        if isinstance(flat_clean, pa.ChunkedArray):
            flat_clean = flat_clean.combine_chunks()
        if len(flat_clean) == 0:
            return empty
        de = pc.dictionary_encode(flat_clean)
        tid = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u = len(de.dictionary)

        from .grouping import key_spans

        n_tokens = np.bincount(row_idx, minlength=n)
        # distinct + top-token: unique composite (row, token) keys with
        # counts; uk is sorted so per-row maxima are span reductions
        uk, cnt = np.unique(row_idx * u + tid, return_counts=True)
        urow = uk // u
        n_distinct = np.bincount(urow, minlength=n)
        top_tok = np.zeros(n, dtype=np.int64)
        s, _e = key_spans(urow)
        top_tok[urow[s]] = np.maximum.reduceat(cnt, s)

        # bigrams: adjacent positions that stay inside one document
        # (row_idx is nondecreasing by construction of np.repeat)
        top_bigram = np.zeros(n, dtype=np.int64)
        if row_idx.size > 1:
            same = row_idx[1:] == row_idx[:-1]
            if same.any():
                b_row = row_idx[:-1][same]
                pair = tid[:-1][same] * u + tid[1:][same]
                # re-encode pair codes densely before composing with the row
                # so the composite stays ≤ rows × distinct-pairs (< 2^63)
                upair, pinv = np.unique(pair, return_inverse=True)
                bk, bcnt = np.unique(b_row * len(upair) + pinv, return_counts=True)
                brow = bk // len(upair)
                bs, _be = key_spans(brow)
                top_bigram[brow[bs]] = np.maximum.reduceat(bcnt, bs)

        keep = n_tokens > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep], id_type),
                "n_tokens": pa.array(n_tokens[keep], pa.int64()),
                "n_distinct": pa.array(n_distinct[keep], pa.int64()),
                "top_tok": pa.array(top_tok[keep], pa.int64()),
                "top_bigram": pa.array(top_bigram[keep], pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def token_entropy(ds, id_col: str = "doc_id", text_col: str = "text", round_to: int = 6):
    """Per-doc Shannon entropy of the (lowercased, whitespace) token
    distribution, in nats — the repetition-vs-diversity quality signal
    (a uniform vocabulary maximizes it; a one-token loop zeroes it).

    Batch-local (each doc lives in one row): the shared
    :func:`_doc_token_pairs` front-end yields per-(doc, token) counts, one
    ``reduceat`` per doc folds −Σ (c/n)·ln(c/n). Docs with no tokens emit
    entropy 0. fp note: the per-doc term sum is ordered by token id on both
    sides only up to SQL's unordered SUM — the magnitude (≤ ln V ≈ 4) keeps
    reorder noise ~1e-13, far under the 1e-6 rounding.
    """
    from .grouping import key_spans

    def fn(batch: pa.Table) -> pa.Table:
        ids_all = batch.column(id_col).combine_chunks()
        n_rows = batch.num_rows
        ent = np.zeros(n_rows, dtype=np.float64)
        doc_ids, _toks, tf = _doc_token_pairs(batch, id_col, text_col)
        if doc_ids.size:
            # doc_ids come out grouped by doc (np.unique key order)
            starts, ends = key_spans(doc_ids)
            ids_np = ids_all.to_numpy(zero_copy_only=False)
            tot = np.add.reduceat(tf.astype(np.float64), starts)
            p_all = tf.astype(np.float64) / np.repeat(tot, ends - starts)
            terms = -(p_all * np.log(p_all))
            e = np.add.reduceat(terms, starts)
            # vectorized id→row-position lookup (no Python per doc)
            order = np.argsort(ids_np, kind="stable")
            pos = order[np.searchsorted(ids_np[order], doc_ids[starts])]
            ent[pos] = e
        return pa.table(
            {
                id_col: ids_all,
                "entropy": pa.array(np.round(ent, round_to), pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sample_exact_k_per_key(ds, k: int, key_col: str, id_col: str = "doc_id"):
    """EXACTLY-k uniform sample PER KEY (stratum): within each key, the k
    rows with the smallest ``splitmix64(id)`` — fixed-size per-language /
    per-domain eval subsets, the stratified twin of :func:`sample_exact_k`.
    Rides ``top_k_per_group`` (per-batch ≤k×keys combiner + bounded per-key
    finalizer), so it's partition-independent and a pure function of each
    stratum's id set. Emits the within-stratum ``rank`` (1-based hash
    order, the stable sub-sampling order: rank ≤ j is the j-subset)."""
    from .relational import top_k_per_group

    if k < 1:
        raise ValueError("k must be >= 1")

    def tag(batch: pa.Table) -> pa.Table:
        if "__h" in batch.column_names:
            raise ValueError("sample_exact_k_per_key: '__h' column name is reserved")
        h = splitmix64(batch.column(id_col).to_numpy(zero_copy_only=False))
        return batch.append_column("__h", pa.array(h, pa.uint64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    out = top_k_per_group(
        tagged, key_col, "__h", k=k, ascending=True, tiebreak_col=id_col
    )
    return out.drop_columns(["__h"])
