"""Range-partitioned global sort sink: ordering across file boundaries."""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_in_name_order(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/part-*.parquet"))
    assert files, "no output files written"
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


class TestSortedExport:
    def test_global_order_across_boundaries(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import sorted_export

        rng = np.random.default_rng(23)
        n = 20_000
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 500, n),  # heavy duplicates
                "sub": rng.integers(0, 1000, n),
                "payload": [f"p{i}" for i in range(n)],
            }
        )
        out = str(tmp_path / "sorted")
        stats = sorted_export(
            rd.from_pandas(df).repartition(8), out, "k", extra_order=["sub"], n_parts=16
        ).to_pandas()
        assert len(stats) == 16 and stats["rows"].sum() == n

        got = _read_in_name_order(out)
        # exact multiset round-trip, then global (k, sub) order
        assert sorted(got["payload"]) == sorted(df["payload"])
        keys = got[["k", "sub"]].to_numpy()
        assert (np.lexsort((keys[:, 1], keys[:, 0])) == np.arange(n)).all()

        # equal keys never straddle a file boundary
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        ends = [pq.read_table(f).to_pandas()["k"].to_numpy() for f in files]
        for a, b in zip(ends, ends[1:]):
            if a.size and b.size:
                assert a[-1] < b[0]

    def test_descending_and_strings(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import sorted_export

        rng = np.random.default_rng(31)
        words = np.array([f"key-{i:04d}" for i in range(300)], dtype=object)
        df = pd.DataFrame({"k": rng.choice(words, 5000)})
        out = str(tmp_path / "desc")
        sorted_export(rd.from_pandas(df).repartition(5), out, "k", descending=True, n_parts=8)
        got = _read_in_name_order(out)["k"].tolist()
        assert got == sorted(df["k"], reverse=True)

    def test_single_part_and_reserved_guard(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import sorted_export

        df = pd.DataFrame({"k": [3, 1, 2]})
        out = str(tmp_path / "one")
        stats = sorted_export(rd.from_pandas(df), out, "k", n_parts=1).to_pandas()
        assert stats["rows"].tolist() == [3]
        assert _read_in_name_order(out)["k"].tolist() == [1, 2, 3]

        bad = rd.from_arrow(pa.table({"k": [1], "__sortpart": [0]}))
        with pytest.raises(Exception, match="__sortpart"):
            sorted_export(bad, str(tmp_path / "bad"), "k", n_parts=2).to_pandas()


def test_read_sorted_round_trip(ray_session, tmp_path):
    import ray.data as rd
    from ray.data import DataContext

    from geodistpy_ray.stages.sort import read_sorted, sorted_export

    rng = np.random.default_rng(41)
    df = pd.DataFrame({"k": rng.permutation(4000)})
    out = str(tmp_path / "rt")
    sorted_export(rd.from_pandas(df).repartition(6), out, "k", n_parts=8)

    ctx = DataContext.get_current()
    saved = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = False
    try:
        with pytest.raises(RuntimeError, match="preserve_order"):
            read_sorted(out)
        ctx.execution_options.preserve_order = True
        got = read_sorted(out).to_pandas()["k"].tolist()
        assert got == sorted(df["k"])
    finally:
        ctx.execution_options.preserve_order = saved
    with pytest.raises(FileNotFoundError):
        ctx.execution_options.preserve_order = True
        try:
            read_sorted(str(tmp_path / "nope"))
        finally:
            ctx.execution_options.preserve_order = saved


def test_sorted_export_empty_and_nan_guard(ray_session, tmp_path):
    import ray.data as rd

    from geodistpy_ray.stages.sort import sorted_export

    # empty input: stats table still has one row per range, zero rows each
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    stats = sorted_export(empty, str(tmp_path / "empty"), "k", n_parts=4).to_pandas()
    assert stats["rows"].tolist() == [0, 0, 0, 0]

    # NaN keys refuse loudly instead of silently mis-partitioning
    bad = rd.from_arrow(pa.table({"k": [1.0, float("nan"), 2.0]}))
    with pytest.raises(Exception, match="NaN"):
        sorted_export(bad, str(tmp_path / "nan"), "k", n_parts=2).to_pandas()


def test_sorted_export_reexport_removes_stale_parts(ray_session, tmp_path):
    """Re-exporting different data into the SAME directory must leave only
    the files this run wrote — an empty range writes no file, so the old
    `num >= n_parts` cleanup left stale part-k.parquet files behind and
    broke the name-order global-sort contract."""
    import os

    import ray.data as rd

    from geodistpy_ray.stages.sort import sorted_export

    out = str(tmp_path / "re")
    # run 1: wide key range fills many parts
    df1 = pd.DataFrame({"k": np.arange(1000)})
    sorted_export(rd.from_pandas(df1).repartition(4), out, "k", n_parts=8)
    first = set(os.listdir(out))
    assert len(first) >= 4

    # run 2: all-equal keys → ONE part file; every other file must vanish
    df2 = pd.DataFrame({"k": np.full(100, 7)})
    stats = sorted_export(rd.from_pandas(df2).repartition(4), out, "k", n_parts=8).to_pandas()
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    written = {f"part-{int(p):05d}.parquet" for p in stats.loc[stats["rows"] > 0, "part"]}
    assert {f.split("/")[-1] for f in files} == written
    got = _read_in_name_order(out)
    assert got["k"].tolist() == [7] * 100


def test_zorder_bbox_scan_prunes_and_matches(ray_session, tmp_path):
    import ray.data as rd

    from geodistpy_ray.functions.geocode import geocode_ids
    from geodistpy_ray.stages.sort import bbox_scan, zorder_export

    ids = np.arange(20_000, dtype=np.int64)
    lat, lon = geocode_ids(ids)
    tbl = pa.table({"doc_id": pa.array(ids), "lat": pa.array(lat), "lon": pa.array(lon)})
    box = (10.0, 50.0, -30.0, 30.0)
    want = set(ids[(lat >= box[0]) & (lat <= box[1]) & (lon >= box[2]) & (lon <= box[3])])

    zdir = str(tmp_path / "z")
    zorder_export(rd.from_arrow(tbl).repartition(8), zdir, n_parts=32)
    ds, n_read, n_total = bbox_scan(zdir, *box)
    got = set(ds.to_pandas()["doc_id"])
    assert got == want
    # the clustered layout must actually skip files (the point of the op)
    assert n_read < n_total, (n_read, n_total)

    # an UNCLUSTERED layout (id-ordered) gives every file a near-global
    # envelope: nothing prunes, results identical — pruning is pure I/O
    udir = str(tmp_path / "u")
    from geodistpy_ray.stages.sort import sorted_export

    sorted_export(rd.from_arrow(tbl).repartition(8), udir, key="doc_id", n_parts=32)
    ds_u, n_read_u, n_total_u = bbox_scan(udir, *box)
    assert set(ds_u.to_pandas()["doc_id"]) == want
    assert n_read_u == n_total_u
    assert n_read < n_read_u

    # empty box: zero files read, typed-empty result
    ds_e, n_read_e, _ = bbox_scan(zdir, 89.5, 89.9, 179.0, 179.5)
    assert ds_e.count() == 0
    # (a fully-disjoint box may prune every file)
    assert n_read_e <= n_total


def test_bbox_scan_keeps_file_with_min_max_free_stats(ray_session, tmp_path):
    """A part file whose lat/lon statistics carry has_min_max=False (pyarrow
    writes exactly that for an all-NaN float column) must be conservatively
    KEPT, not crash the scan with a None comparison."""
    import pyarrow.parquet as pq

    from geodistpy_ray.stages.sort import bbox_scan

    d = tmp_path / "parts"
    d.mkdir()
    good = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "lat": pa.array([20.0, 30.0]),
            "lon": pa.array([0.0, 10.0]),
        }
    )
    nan_only = pa.table(
        {
            "doc_id": pa.array([3, 4], pa.int64()),
            "lat": pa.array([np.nan, np.nan]),
            "lon": pa.array([np.nan, np.nan]),
        }
    )
    pq.write_table(good, d / "part-00000.parquet")
    pq.write_table(nan_only, d / "part-00001.parquet")
    st = pq.ParquetFile(d / "part-00001.parquet").metadata.row_group(0).column(1).statistics
    assert st is not None and not st.has_min_max  # the shape under test

    ds, n_read, n_total = bbox_scan(str(d), 10.0, 50.0, -30.0, 30.0)
    assert (n_read, n_total) == (2, 2)  # NaN file kept (cannot prune)
    # exact filter still drops the NaN rows
    assert set(ds.to_pandas()["doc_id"]) == {1, 2}


class TestFooterSeededBoundaries:
    """stats_paths: boundaries from parquet row-group footers — the sink
    becomes a single full read; ordering contract must be identical."""

    def _write_input(self, tmp_path, n=20_000, row_group_size=None, skew=False):
        rng = np.random.default_rng(31)
        v = rng.exponential(100.0, n) if skew else rng.uniform(-50, 50, n)
        df = pd.DataFrame(
            {
                "k": np.round(v, 3),
                "sub": rng.integers(0, 1000, n),
                "payload": [f"p{i}" for i in range(n)],
            }
        )
        src = str(tmp_path / "input.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            src,
            row_group_size=row_group_size or n,
        )
        return src, df

    def _check_contract(self, out, df):
        got = _read_in_name_order(out)
        assert sorted(got["payload"]) == sorted(df["payload"])
        keys = got[["k", "sub"]].to_numpy()
        assert (np.lexsort((keys[:, 1], keys[:, 0])) == np.arange(len(df))).all()
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        ends = [pq.read_table(f).to_pandas()["k"].to_numpy() for f in files]
        for a, b in zip(ends, ends[1:]):
            if a.size and b.size:
                assert a[-1] <= b[0]  # ranges ordered; equal keys co-located
                if a[-1] == b[0]:
                    raise AssertionError("equal keys straddle a file boundary")

    def test_multi_row_group_footers(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import sorted_export

        src, df = self._write_input(tmp_path, row_group_size=1024)
        out = str(tmp_path / "sorted_multi")
        stats = sorted_export(
            rd.read_parquet(src),
            out,
            "k",
            extra_order=["sub"],
            n_parts=16,
            stats_paths=src,
        ).to_pandas()
        assert len(stats) == 16 and stats["rows"].sum() == len(df)
        self._check_contract(out, df)
        # footers resolve: with ~20 row groups the interpolated quantiles
        # should spread rows over most ranges, not pile into one
        assert (stats["rows"] > 0).sum() >= 8

    def test_single_row_group_interpolates(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import sorted_export

        src, df = self._write_input(tmp_path, row_group_size=None, skew=True)
        out = str(tmp_path / "sorted_single")
        stats = sorted_export(
            rd.read_parquet(src),
            out,
            "k",
            extra_order=["sub"],
            n_parts=8,
            stats_paths=src,
        ).to_pandas()
        assert stats["rows"].sum() == len(df)
        self._check_contract(out, df)

    def test_string_key_falls_back_to_sampling(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import _boundaries_from_parquet_stats, sorted_export

        df = pd.DataFrame({"k": [f"s{i:05d}" for i in range(500)], "sub": range(500)})
        src = str(tmp_path / "strs.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
        assert _boundaries_from_parquet_stats([src], "k", 4) is None
        out = str(tmp_path / "sorted_str")
        stats = sorted_export(
            rd.read_parquet(src), out, "k", n_parts=4, stats_paths=src
        ).to_pandas()
        assert stats["rows"].sum() == 500
        got = _read_in_name_order(out)
        assert got["k"].is_monotonic_increasing

    def test_nan_guard_on_footer_path(self, ray_session, tmp_path):
        import ray.data as rd

        from geodistpy_ray.stages.sort import sorted_export

        df = pd.DataFrame({"k": [1.0, np.nan, 3.0], "sub": [1, 2, 3]})
        src = str(tmp_path / "nan.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
        with pytest.raises((ValueError, Exception), match="NaN"):
            sorted_export(
                rd.read_parquet(src),
                str(tmp_path / "sorted_nan"),
                "k",
                n_parts=2,
                stats_paths=src,
            ).to_pandas()


def test_empty_stats_glob_falls_back_to_sampling(ray_session, tmp_path):
    """A stats_paths directory whose glob matches no parquet files must fall
    back to the sampling pass — NOT silently disable range partitioning
    (an empty bounds array would tag every row part 0 and one task would
    sort the whole dataset)."""
    import os

    import ray.data as rd

    from geodistpy_ray.stages.sort import _boundaries_from_parquet_stats, sorted_export

    # files nested one level down / differently named: glob('*.parquet') = []
    nested = tmp_path / "hive" / "sub"
    os.makedirs(nested)
    df = pd.DataFrame({"k": np.random.default_rng(7).permutation(600), "sub": range(600)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(nested / "d.parquet"))
    assert _boundaries_from_parquet_stats([], "k", 4) is None

    out = str(tmp_path / "sorted_fallback")
    stats = sorted_export(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4),
        out,
        "k",
        n_parts=4,
        stats_paths=str(tmp_path / "hive"),  # empty glob at this level
    ).to_pandas()
    assert stats["rows"].sum() == 600
    assert len(stats) > 1  # sampling produced real range boundaries
    got = _read_in_name_order(out)
    assert got["k"].is_monotonic_increasing
