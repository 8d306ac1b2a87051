"""Common-Crawl-style pages table: deterministic synthesis + schema-checked read.

Implements fixture F1 (FIXTURES.md): ``url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string``. Hosts are zipf-skewed so the derived
geocode cells are realistically hot (skew handling is load-bearing,
SURVEY.md §7.5). Generation is pure ``np.random.default_rng(seed)`` — no
external data — and written as multiple fragments so resume/parallelism have
units to work with.

The per-row invariant from BASELINE.json ``input_hint``: the ``text`` column
must survive every engine stage byte-identically per url; tests hash it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_LANGS = np.array(["en", "de", "fr", "hi", "zh", "es"])
_LANG_P = np.array([0.5, 0.12, 0.12, 0.1, 0.08, 0.08])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data engine ray arrow batch "
    "stream shuffle cell geodesic page crawl web text index query join".split()
)


def generate_pages(n_rows: int, seed: int = 42, n_hosts: int = 1000, index_offset: int = 0) -> pa.Table:
    """Deterministic pages table of ``n_rows`` rows. ``index_offset`` makes
    the url-uniqueness suffix GLOBAL across fragments (a per-fragment
    restart would leave cross-fragment uniqueness merely probabilistic,
    undermining the per-url byte-identity invariant)."""
    rng = np.random.default_rng(seed)
    # zipf-skewed host popularity
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    host_p = (1.0 / ranks) / (1.0 / ranks).sum()
    hosts = rng.choice(n_hosts, size=n_rows, p=host_p)
    path_id = rng.integers(0, 1 << 40, size=n_rows)
    # dtype=object keeps n_rows=0 a STRING array (an empty float64 default
    # would fail the pa.string() cast when a writer shards rows thinner
    # than its fragment count)
    urls = np.array(
        [f"https://host{h}.example.com/p/{p:x}" for h, p in zip(hosts, path_id)],
        dtype=object,
    )
    # ensure uniqueness by suffixing the row index
    urls = np.array(
        [f"{u}-{i}" for i, u in enumerate(urls, start=index_offset)], dtype=object
    )

    base = np.datetime64("2026-01-01T00:00:00", "us")
    warc_ts = base + rng.integers(0, 30 * 24 * 3600 * 1_000_000, size=n_rows).astype(
        "timedelta64[us]"
    )

    n_words = rng.integers(8, 120, size=n_rows)
    texts = []
    for i in range(n_rows):
        idx = rng.integers(0, _WORDS.size, size=n_words[i])
        texts.append(" ".join(_WORDS[idx]))
    texts = np.array(texts, dtype=object)
    htmls = [f"<html><body><p>{t}</p></body></html>".encode() for t in texts]
    langs = rng.choice(_LANGS, size=n_rows, p=_LANG_P)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(out_dir: str, n_rows: int, seed: int = 42, n_fragments: int = 8):
    """Write a fragmented pages table (one parquet file per fragment)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    per = n_rows // n_fragments
    for frag in range(n_fragments):
        rows = per if frag < n_fragments - 1 else n_rows - per * (n_fragments - 1)
        # seed*n_fragments+frag, NOT seed+frag: adjacent base seeds must not
        # share fragment RNG streams (seed 42's fragment 1 == seed 43's
        # fragment 0 would duplicate 7/8 of a "different" corpus)
        t = generate_pages(
            rows, seed=seed * n_fragments + frag, index_offset=frag * per
        )
        pq.write_table(t, os.path.join(out_dir, f"fragment-{frag:04d}.parquet"))
    return out_dir


def read_pages(path, columns=None):
    """Pages reader: column-pruned ``read_parquet`` with the PAGES_SCHEMA
    types ENFORCED per batch (sources/io.py:read_table) — a drifted file
    (e.g. ``warc_ts`` written as timestamp[ns]) would otherwise flow through
    untouched and hit the ns→int64 cast hazard downstream.

    Pass ``columns`` to prune at the read (never load ``html`` for
    text-only stages — BASELINE scale rule).
    """
    from .io import read_table

    if columns is None:
        schema = PAGES_SCHEMA
    else:
        unknown = [c for c in columns if PAGES_SCHEMA.get_field_index(c) < 0]
        if unknown:
            raise ValueError(f"read_pages: unknown column(s) {unknown}")
        schema = pa.schema([PAGES_SCHEMA.field(c) for c in columns])
    return read_table(path, schema)
