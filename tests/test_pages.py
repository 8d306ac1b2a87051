"""Pages table fixture + the byte-identity invariant end to end.

BASELINE.json input_hint: the ``text`` column must pass through every engine
stage byte-identical per url — verified by hashing text per url before and
after a full geocode → cell → spatial-join-carrying pipeline.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodistpy_ray.sources.pages import PAGES_SCHEMA, generate_pages, write_pages


class TestGeneration:
    def test_schema(self):
        t = generate_pages(200)
        assert t.schema.equals(PAGES_SCHEMA)
        assert t.num_rows == 200

    def test_deterministic(self):
        a = generate_pages(100, seed=7)
        b = generate_pages(100, seed=7)
        assert a.equals(b)
        c = generate_pages(100, seed=8)
        assert not a.equals(c)

    def test_urls_unique(self):
        t = generate_pages(500)
        urls = t.column("url").to_pylist()
        assert len(set(urls)) == 500

    def test_text_embedded_in_html(self):
        t = generate_pages(50)
        for url, html, text in zip(
            t.column("url").to_pylist()[:10],
            t.column("html").to_pylist()[:10],
            t.column("text").to_pylist()[:10],
        ):
            assert text.encode() in html

    def test_fragmented_write(self, tmp_path):
        import glob

        out = write_pages(str(tmp_path / "pages"), 400, n_fragments=8)
        files = glob.glob(f"{out}/*.parquet")
        assert len(files) == 8


class TestByteIdentity:
    def test_text_survives_pipeline(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages import add_cell
        from geodistpy_ray.stages.geo import col_np

        out = write_pages(str(tmp_path / "pages"), 300, n_fragments=4)
        src = pa.concat_tables(
            [pa.parquet.read_table(f) for f in sorted(__import__("glob").glob(f"{out}/*.parquet"))]
        )
        before = {
            u: hashlib.sha256(t.encode()).hexdigest()
            for u, t in zip(src.column("url").to_pylist(), src.column("text").to_pylist())
        }

        ds = rd.read_parquet(out)

        # geocode pages by url hash (no integer key → derive one from the url)
        def geocode_url(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            key = np.array(
                [
                    int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(), "little")
                    >> 24
                    for u in urls
                ],
                dtype=np.int64,
            )
            from geodistpy_ray.functions.geocode import geocode_ids

            lat, lon = geocode_ids(key)
            batch = batch.append_column("lat", pa.array(lat, pa.float64()))
            return batch.append_column("lon", pa.array(lon, pa.float64()))

        ds = ds.map_batches(geocode_url, batch_format="pyarrow", zero_copy_batch=True)
        ds = add_cell(ds, 2.0)
        sink = str(tmp_path / "sink")
        ds.write_parquet(sink)

        import glob

        got = pa.concat_tables([pa.parquet.read_table(f) for f in glob.glob(f"{sink}/*.parquet")])
        after = {
            u: hashlib.sha256(t.encode()).hexdigest()
            for u, t in zip(got.column("url").to_pylist(), got.column("text").to_pylist())
        }
        assert before == after
        assert "cell" in got.schema.names


def test_add_host_parses_pages_urls(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from geodistpy_ray.sources.pages import generate_pages
    from geodistpy_ray.stages.text import add_host

    tbl = generate_pages(500, seed=3)
    pq.write_table(tbl, tmp_path / "pages.parquet")
    ds = rd.read_parquet(str(tmp_path / "pages.parquet"), columns=["url"])
    got = add_host(ds).to_pandas()
    assert (got["host"].str.match(r"^host\d+\.example\.com$")).all()
    # zipf skew: the most popular host dominates
    counts = got["host"].value_counts()
    assert counts.iloc[0] > counts.iloc[-1]
    # unparseable url → empty host, no crash
    bad = rd.from_arrow(pa.table({"url": ["not a url", "ftp://x.y/z", ""]}))
    got_bad = add_host(bad).to_pandas()
    assert got_bad["host"].tolist() == ["", "x.y", ""]


def test_extract_text_byte_identity(ray_session):
    """The html→text extraction must reproduce the text column
    byte-identically on the full fixture (the north-rule per-url
    invariant), and the mismatch counter must actually catch violations."""
    import ray.data as rd

    from geodistpy_ray.sources.pages import generate_pages
    from geodistpy_ray.stages.text import count_column_mismatches, extract_text

    pages = rd.from_arrow(generate_pages(2000, seed=9)).repartition(5)
    ext = extract_text(pages).materialize()
    assert count_column_mismatches(ext, "extracted_text", "text") == 0

    def corrupt(batch):
        import pyarrow.compute as pc

        t = pc.replace_substring_regex(batch.column("text"), "^the", "THE")
        return batch.set_column(batch.column_names.index("text"), "text", t)

    bad = ext.map_batches(corrupt, batch_format="pyarrow", zero_copy_batch=True)
    n_start = sum(
        1 for t in pages.to_pandas()["text"] if t.startswith("the")
    )
    assert count_column_mismatches(bad, "extracted_text", "text") == n_start > 0


def test_extract_links_multi_and_edge_cases(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.text import extract_links

    tbl = pa.table(
        {
            "url": ["u0", "u1", "u2", "u3"],
            "html": [
                b'<a href="x">1</a> mid <a href="y">2</a>',
                b"<p>no links at all</p>",
                b'<a href="">empty target</a><a href="z',  # unterminated quote
                None,
            ],
        }
    )
    got = (
        extract_links(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .sort_values(["url", "href"], ignore_index=True)
    )
    pairs = list(zip(got["url"], got["href"]))
    assert ("u0", "x") in pairs and ("u0", "y") in pairs
    assert not any(u == "u1" for u, _ in pairs)
    assert ("u2", "") in pairs  # empty href preserved
    assert ("u2", "z") in pairs  # unterminated quote takes the tail
    assert not any(u == "u3" for u, _ in pairs)  # null html → no edges
    assert len(pairs) == 4


def test_canonicalize_urls_matches_sql_mirror(ray_session):
    """Adversarial forms through BOTH implementations — any divergence in
    kernel order or regex grammar shows up as a row mismatch."""
    import duckdb
    import ray.data as rd

    from geodistpy_ray.stages.text import canonicalize_urls, canonicalize_urls_sql

    urls = [
        "HTTP://Host.Example.COM:80/Path/To?q=1#frag",
        "https://host.example.com:443/",
        "https://HOST.example.com:443",      # port, no path
        "http://h.example.com:8080/x",       # non-default port kept
        "https://h.example.com/?",           # lone slash + empty query
        "HtTpS://MiXeD.CaSe/UPPER/path",     # path case preserved
        "ftp://Files.Example.com:80/a",      # :80 only strips for http
        "no scheme at all #tail",            # unparseable → fragment strip only
        "https://h.example.com/a?x=1&y=2",
        "",
    ]
    got = (
        canonicalize_urls(rd.from_arrow(pa.table({"url": urls})).repartition(3))
        .to_pandas()
        .sort_values("url", ignore_index=True, kind="mergesort")
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": urls}))
    exp = con.execute(
        f"SELECT url, {canonicalize_urls_sql('url')} AS canonical_url FROM t ORDER BY url"
    ).df()
    got = got.sort_values("url", ignore_index=True)
    exp = exp.sort_values("url", ignore_index=True)
    assert got["canonical_url"].tolist() == exp["canonical_url"].tolist()
    # spot semantics
    by = dict(zip(got["url"], got["canonical_url"]))
    assert by["HTTP://Host.Example.COM:80/Path/To?q=1#frag"] == "http://host.example.com/Path/To?q=1"
    assert by["https://host.example.com:443/"] == "https://host.example.com"
    assert by["http://h.example.com:8080/x"] == "http://h.example.com:8080/x"
    assert by["ftp://Files.Example.com:80/a"] == "ftp://files.example.com:80/a"
    assert by["https://h.example.com/?"] == "https://h.example.com"


def test_registrable_domain_matches_sql_mirror(ray_session):
    """eTLD+1 rule through BOTH implementations, including multi-label
    suffixes, deep subdomains, ports, case, and dotless hosts."""
    import duckdb
    import ray.data as rd

    from geodistpy_ray.stages.text import (
        add_registrable_domain,
        registrable_domain_sql,
    )

    urls = [
        "https://www.example.com/a",
        "https://blog.shop.example.co.uk/x?q=1",   # multi-label suffix, depth 2
        "https://example.co.uk",                    # exactly eTLD+1 already
        "http://a.b.c.d.example.org/deep",
        "https://EXAMPLE.COM/UPPER",                # case-folded host
        "https://host.example.com:8080/p",          # port excluded from host
        "https://localhost/x",                      # dotless host → itself
        "https://co.uk/suffix-only",                # bare suffix: last two labels
        "https://x.com.au/",                        # multi-label suffix, depth 0
    ]
    got = (
        add_registrable_domain(rd.from_arrow(pa.table({"url": urls})).repartition(3))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": urls}))
    exp = con.execute(
        f"SELECT url, {registrable_domain_sql('url')} AS domain FROM t ORDER BY url"
    ).df()
    assert got["domain"].tolist() == exp["domain"].tolist()
    by = dict(zip(got["url"], got["domain"]))
    assert by["https://www.example.com/a"] == "example.com"
    assert by["https://blog.shop.example.co.uk/x?q=1"] == "example.co.uk"
    assert by["https://example.co.uk"] == "example.co.uk"
    assert by["http://a.b.c.d.example.org/deep"] == "example.org"
    assert by["https://EXAMPLE.COM/UPPER"] == "example.com"
    assert by["https://host.example.com:8080/p"] == "example.com"
    assert by["https://localhost/x"] == "localhost"
    assert by["https://co.uk/suffix-only"] == "co.uk"
    assert by["https://x.com.au/"] == "x.com.au"


def test_write_pages_adjacent_seeds_distinct(ray_session, tmp_path):
    """seed 42 and seed 43 corpora must not share fragment RNG streams
    (seed+frag made dir1/fragment-0001 byte-identical to dir2/fragment-0000
    up to the url index)."""
    import pyarrow.parquet as pq

    from geodistpy_ray.sources.pages import write_pages

    d1 = write_pages(str(tmp_path / "a"), 400, seed=42, n_fragments=8)
    d2 = write_pages(str(tmp_path / "b"), 400, seed=43, n_fragments=8)
    t1 = pq.read_table(f"{d1}/fragment-0001.parquet")
    t2 = pq.read_table(f"{d2}/fragment-0000.parquet")
    assert t1.column("text").to_pylist() != t2.column("text").to_pylist()


def test_read_pages_enforces_schema_and_rejects_unknown(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from geodistpy_ray.sources.pages import PAGES_SCHEMA, generate_pages, read_pages

    # write with a DRIFTED warc_ts type (ns): the reader must cast to µs
    t = generate_pages(50, seed=5)
    drift = t.set_column(
        t.schema.get_field_index("warc_ts"),
        "warc_ts",
        t.column("warc_ts").cast(pa.timestamp("ns")),
    )
    path = str(tmp_path / "drifted.parquet")
    pq.write_table(drift, path)
    ds = read_pages(path)
    assert ds.schema().base_schema.field("warc_ts").type == pa.timestamp("us")
    ds2 = read_pages(path, columns=["url", "warc_ts"])
    sch = ds2.schema().base_schema
    assert sch.names == ["url", "warc_ts"]
    assert sch.field("warc_ts").type == pa.timestamp("us")
    with pytest.raises(ValueError, match="unknown column"):
        read_pages(path, columns=["url", "nope"])
