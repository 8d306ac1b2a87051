"""HLL distinct sketch + hash-sample quantile: accuracy and merge laws."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodistpy_ray.stages.sketches import (
    _hll_registers,
    approx_distinct_count,
    approx_distinct_per_key,
    approx_quantile,
    hll_estimate,
)


class TestHllKernel:
    def test_accuracy_bands(self):
        rng = np.random.default_rng(5)
        for true_n in [500, 20_000, 300_000]:
            vals = rng.integers(0, 1 << 62, size=true_n, dtype=np.int64)
            vals = np.unique(vals)  # exact distinct = vals.size
            est = hll_estimate(_hll_registers(vals, 14))
            assert abs(est - vals.size) / vals.size < 0.03, (true_n, est)

    def test_merge_is_max_and_order_free(self):
        rng = np.random.default_rng(6)
        vals = rng.integers(0, 1 << 62, size=50_000, dtype=np.int64)
        full = _hll_registers(vals, 12)
        a = _hll_registers(vals[:17_000], 12)
        b = _hll_registers(vals[17_000:], 12)
        np.testing.assert_array_equal(np.maximum(a, b), full)
        np.testing.assert_array_equal(np.maximum(b, a), full)

    def test_duplicates_do_not_move_estimate(self):
        vals = np.arange(1000, dtype=np.int64)
        e1 = hll_estimate(_hll_registers(vals, 14))
        e2 = hll_estimate(_hll_registers(np.tile(vals, 50), 14))
        assert e1 == e2

    def test_p_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"x": [1]}))
        with pytest.raises(ValueError, match=r"p must be"):
            approx_distinct_count(ds, "x", p=5)


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    n = 40_000
    # 25% duplication: exact distinct = 30k
    vals = np.concatenate([np.arange(30_000), np.arange(10_000)]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    est = approx_distinct_count(ds, "v", p=14)
    assert abs(est - 30_000) / 30_000 < 0.03


def test_approx_distinct_per_key(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    keys = np.repeat(np.arange(6, dtype=np.int64), 5000)
    vals = np.concatenate([rng.integers(0, (k + 1) * 1000, 5000) for k in range(6)])
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals.astype(np.int64)})).repartition(6)
    got = approx_distinct_per_key(ds, "k", "v", p=12).to_pandas().set_index("k")
    exact = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].nunique()
    for k in range(6):
        rel = abs(got.loc[k, "approx_distinct"] - exact[k]) / exact[k]
        assert rel < 0.06, (k, got.loc[k, "approx_distinct"], exact[k])


def test_approx_quantile_close_to_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 50_000
    vals = rng.standard_normal(n) * 100
    ds = rd.from_arrow(
        pa.table({"event_id": np.arange(n, dtype=np.int64), "value": vals})
    ).repartition(8)
    got = approx_quantile(ds, "value", 0.9, pct=20)
    want = float(np.quantile(vals, 0.9))
    # |F(got) - 0.9| is the right error metric for a quantile estimate
    assert abs((vals <= got).mean() - 0.9) < 0.01
    assert abs(got - want) < 10  # sanity on the value scale


class TestGroupedQuantileSketch:
    """Per-key mergeable quantile summary: fixed-size shuffle rows with an
    asserted rank-error bound |r - q*N| <= N/(2b) + 1 per key."""

    def _rank_interval(self, sorted_vals, x):
        lo = int(np.searchsorted(sorted_vals, x, side="left"))
        hi = int(np.searchsorted(sorted_vals, x, side="right"))
        return lo, hi

    def test_rank_error_bound_under_compression(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import grouped_quantile_sketch

        rng = np.random.default_rng(5)
        n = 10_000
        b = 64
        keys = np.repeat(np.arange(3, dtype=np.int64), n)
        vals = np.concatenate(
            [rng.normal(0, 1, n), rng.exponential(2, n), rng.uniform(-5, 5, n)]
        )
        perm = rng.permutation(keys.size)  # interleave keys across blocks
        t = pa.table({"k": keys[perm], "v": vals[perm]})
        ds = rd.from_arrow(t).repartition(8)
        by_key = {k: np.sort(vals[keys == k]) for k in range(3)}
        for q in (0.1, 0.5, 0.9):
            got = (
                grouped_quantile_sketch(ds, "k", "v", q, b=b)
                .to_pandas()
                .set_index("k")["quantile_value"]
            )
            for k in range(3):
                lo, hi = self._rank_interval(by_key[k], got.loc[k])
                bound = n / (2 * b) + 1
                assert lo <= q * n + bound and hi >= q * n - bound, (q, k)

    def test_exact_when_batches_fit(self, ray_session):
        """Every (key x batch) group under b values => no compression: the
        sketch IS the weighted lower quantile = inverted-CDF quantile."""
        import ray.data as rd

        from geodistpy_ray.stages.sketches import grouped_quantile_sketch

        rng = np.random.default_rng(7)
        keys = np.repeat(np.arange(5, dtype=np.int64), 40)
        vals = rng.normal(0, 10, keys.size)
        ds = rd.from_arrow(pa.table({"k": keys, "v": vals}))
        got = (
            grouped_quantile_sketch(ds, "k", "v", 0.5, b=256)
            .to_pandas()
            .set_index("k")["quantile_value"]
        )
        for k in range(5):
            want = np.quantile(vals[keys == k], 0.5, method="inverted_cdf")
            assert got.loc[k] == pytest.approx(want), k

    def test_deterministic_and_validates(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import grouped_quantile_sketch

        with pytest.raises(ValueError):
            grouped_quantile_sketch(None, "k", "v", 0.5, b=1)
        keys = np.repeat(np.arange(4, dtype=np.int64), 600)
        vals = np.arange(keys.size, dtype=np.float64)
        ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(4)
        a = (
            grouped_quantile_sketch(ds, "k", "v", 0.9, b=32)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        bdf = (
            grouped_quantile_sketch(ds, "k", "v", 0.9, b=32)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, bdf)


class TestBloomFilter:
    def test_no_false_negatives_and_low_fpr(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import bloom_semi_filter, build_bloom_filter

        members = np.arange(0, 20_000, 2, dtype=np.int64)  # evens
        ds = rd.from_arrow(pa.table({"k": members})).repartition(4)
        bm = build_bloom_filter(ds, "k", bits_log2=18)

        probe_vals = np.arange(20_000, dtype=np.int64)  # evens + odds
        probe = rd.from_arrow(pa.table({"k": probe_vals})).repartition(4)
        kept = bloom_semi_filter(probe, "k", bm).to_pandas()["k"].to_numpy()
        kept = np.sort(kept)
        # every true member survives
        assert np.isin(members, kept).all()
        # leaked non-members stay near the configured fpr
        leaked = kept.size - members.size
        assert leaked / 10_000 < 0.05

    def test_merge_is_or_and_partition_free(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import build_bloom_filter

        v = np.arange(5000, dtype=np.int64)
        one = build_bloom_filter(rd.from_arrow(pa.table({"k": v})), "k", bits_log2=17)
        many = build_bloom_filter(
            rd.from_arrow(pa.table({"k": v})).repartition(8), "k", bits_log2=17
        )
        assert np.array_equal(one.bits, many.bits)
        assert one.n_hashes == many.n_hashes

    def test_probe_hash_count_mismatch_raises(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import bloom_semi_filter, build_bloom_filter

        bm = build_bloom_filter(
            rd.from_arrow(pa.table({"k": np.arange(10, dtype=np.int64)})),
            "k",
            bits_log2=16,
            n_hashes=3,
        )
        with pytest.raises(ValueError, match="n_hashes"):
            bloom_semi_filter(None, "k", bm, n_hashes=5)

    def test_string_keys(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import bloom_semi_filter, build_bloom_filter

        build = rd.from_arrow(pa.table({"k": [f"key-{i}" for i in range(100)]}))
        bm = build_bloom_filter(build, "k", bits_log2=16)
        probe = rd.from_arrow(
            pa.table({"k": [f"key-{i}" for i in range(90, 110)]})
        )
        kept = set(bloom_semi_filter(probe, "k", bm).to_pandas()["k"])
        assert {f"key-{i}" for i in range(90, 100)} <= kept

    def test_validation(self, ray_session):
        from geodistpy_ray.stages.sketches import bloom_semi_filter, build_bloom_filter

        with pytest.raises(ValueError):
            build_bloom_filter(None, "k", bits_log2=8)
        with pytest.raises(ValueError):
            bloom_semi_filter(None, "k", np.zeros(100, dtype=np.uint8))


class TestBloomPrefilteredJoin:
    def test_identical_to_plain_join(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.joins import shuffle_equi_join

        rng = np.random.default_rng(11)
        left = pa.table(
            {
                "lk": rng.integers(0, 3000, 20_000).astype(np.int64),
                "lv": np.arange(20_000, dtype=np.int64),
            }
        )
        right = pa.table(
            {
                "rk": np.arange(0, 300, dtype=np.int64),  # 10% key overlap
                "rv": np.arange(300, dtype=np.int64) * 7,
            }
        )
        lds, rds = rd.from_arrow(left).repartition(4), rd.from_arrow(right).repartition(2)
        plain = (
            shuffle_equi_join(lds, rds, "lk", "rk", n_buckets=8)
            .to_pandas()
            .sort_values(["lk", "lv", "rv"], ignore_index=True)
        )
        bloomed = (
            shuffle_equi_join(
                lds, rds, "lk", "rk", n_buckets=8, bloom_prefilter="left", bloom_bits_log2=16
            )
            .to_pandas()
            .sort_values(["lk", "lv", "rv"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(plain, bloomed)

    def test_rejects_outer_types(self, ray_session):
        from geodistpy_ray.stages.joins import shuffle_equi_join

        with pytest.raises(ValueError):
            shuffle_equi_join(
                None, None, "a", "b", join_type="full outer", bloom_prefilter="left"
            )
        with pytest.raises(ValueError):
            shuffle_equi_join(None, None, "a", "b", bloom_prefilter="sideways")


class TestHeavyHitters:
    def test_exact_vs_pandas_oracle(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import heavy_hitters

        rng = np.random.default_rng(3)
        # zipf-ish: a few hot keys over a wide cold domain
        hot = np.repeat(np.arange(5, dtype=np.int64), 400)
        cold = rng.integers(100, 5000, 10_000).astype(np.int64)
        v = np.concatenate([hot, cold])
        rng.shuffle(v)
        ds = rd.from_arrow(pa.table({"k": v})).repartition(6)
        frac = 0.02
        got = heavy_hitters(ds, "k", frac).to_pandas()
        vc = pd.Series(v).value_counts()
        want = vc[vc >= frac * v.size].sort_index()
        assert got["k"].tolist() == want.index.tolist()
        assert got["cnt"].tolist() == want.to_numpy().tolist()

    def test_small_k_guard_raises_not_wrong(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import heavy_hitters

        # uniform stream with k far too small: the tracked error reaches the
        # threshold and the guard must refuse rather than return a subset
        v = np.tile(np.arange(500, dtype=np.int64), 20)
        ds = rd.from_arrow(pa.table({"k": v})).repartition(4)
        with pytest.raises(ValueError, match="raise k"):
            heavy_hitters(ds, "k", 0.002, k=3)

    def test_string_keys_and_empty_result(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.sketches import heavy_hitters

        ds = rd.from_arrow(pa.table({"k": [f"u{i}" for i in range(100)]}))
        out = heavy_hitters(ds, "k", 0.5)
        assert out.num_rows == 0
        assert out.column_names == ["k", "cnt"]

    def test_validation(self):
        from geodistpy_ray.stages.sketches import heavy_hitters

        with pytest.raises(ValueError):
            heavy_hitters(None, "k", 0.0)


class TestExactOrderStats:
    def test_matches_numpy_sort(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import exact_order_stats, global_median

        rng = np.random.default_rng(97)
        # heavy duplicate mass (stall-branch coverage) + a smooth tail
        v = np.concatenate(
            [np.full(5000, 7.25), rng.normal(100, 30, 7001), rng.uniform(-5, 5, 3000)]
        )
        tbl = pa.table({"value": pa.array(v, pa.float64())})
        ds = rd.from_arrow(tbl).repartition(6)
        s = np.sort(v)
        ks = [0, 1, 2500, 7500, v.size // 2, v.size - 1]
        got, n = exact_order_stats(ds, "value", ks, bins=64, cap=500)
        assert n == v.size
        for k, g in zip(ks, got):
            assert g == s[k], (k, g, s[k])
        # median parity with numpy (odd count here)
        assert global_median(ds, "value") == float(np.median(v))
        # even count: average of the two middle values
        ds2 = rd.from_arrow(tbl.slice(0, v.size - 1)).repartition(4)
        v2 = np.sort(v[: v.size - 1])
        assert global_median(ds2, "value") == (v2[v2.size // 2 - 1] + v2[v2.size // 2]) / 2.0
        with pytest.raises(ValueError, match="out of range"):
            exact_order_stats(ds, "value", [v.size])

    def test_heavy_duplicates_never_materialize(self, ray_session):
        """An equal-value bucket far above `cap` must answer WITHOUT pulling
        raw rows to the driver: the collapsed interval short-circuits, and
        the collection path ships per-batch (value, count) uniques."""
        import ray.data as rd

        from geodistpy_ray.stages.relational import exact_order_stats, global_median

        # 50k rows, ONE value: total_in stalls above cap=10 immediately
        v = np.full(50_000, 3.5)
        ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(4)
        got, n = exact_order_stats(ds, "value", [0, 25_000, 49_999], bins=16, cap=10)
        assert n == 50_000 and got == [3.5, 3.5, 3.5]
        assert global_median(ds, "value") == 3.5

        # two-value stall: refinement can't split below fp resolution but
        # the unique-count collection keeps the driver at 2 values
        w = np.concatenate([np.full(20_000, 1.0), np.full(20_000, np.nextafter(1.0, 2.0))])
        ds2 = rd.from_arrow(pa.table({"value": pa.array(w)})).repartition(4)
        s = np.sort(w)
        got2, _ = exact_order_stats(ds2, "value", [0, 19_999, 20_000, 39_999], bins=16, cap=10)
        assert got2 == [s[0], s[19_999], s[20_000], s[39_999]]


def test_bloom_filter_selectivity(ray_session):
    """No false negatives AND a real false-positive rate: the probe must
    test exactly the hashed bit (a leaked '& 1' passes whenever any HIGHER
    bit in the byte is set, silently destroying selectivity)."""
    import ray.data as rd

    from geodistpy_ray.stages.sketches import bloom_semi_filter, build_bloom_filter

    members = pa.table({"k": pa.array(np.arange(0, 2000, dtype=np.int64))})
    bm = build_bloom_filter(rd.from_arrow(members), "k", bits_log2=16, n_hashes=4)
    probe = pa.table(
        {"k": pa.array(np.arange(0, 40000, dtype=np.int64))}
    )  # 2k members + 38k non-members
    kept = bloom_semi_filter(rd.from_arrow(probe), "k", bm).to_pandas()["k"].to_numpy()
    assert np.isin(np.arange(2000), kept).all()  # zero false negatives
    fp = np.setdiff1d(kept, np.arange(2000)).size / 38000
    # p=16 bits, k=4, n=2000 -> theoretical fpr ~ 0.036%; allow 10x slack
    assert fp < 0.01, fp


def test_per_key_sketches_survive_null_keys_and_values(ray_session):
    """Null keys form ONE group (SQL PARTITION BY); null values are ignored
    (SQL aggregate semantics). Pre-fix: np.argsort/np.lexsort raised on
    object arrays with None, and NaN keys failed the typed pa.array."""
    import ray.data as rd

    from geodistpy_ray.stages.sketches import (
        approx_distinct_per_key,
        grouped_quantile_sketch,
    )

    t = pa.table(
        {
            "k": pa.array(["a", "a", None, None, "b"], pa.large_string()),
            "v": pa.array([1, 2, 5, 5, None], pa.int64()),
        }
    )
    got = approx_distinct_per_key(rd.from_arrow(t), "k", "v", p=12).to_pandas()
    # 'b' has only a null value -> no row (COUNT(DISTINCT v) over nothing)
    assert len(got) == 2
    byk = {("NULL" if pd.isna(k) else k): round(d) for k, d in got.itertuples(index=False)}
    assert byk == {"a": 2, "NULL": 1}

    ki = pa.table(
        {
            "k": pa.array([1, 1, None, None], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 40.0]),
        }
    )
    q = grouped_quantile_sketch(rd.from_arrow(ki), "k", "v", q=0.5, b=8).to_pandas()
    assert len(q) == 2
    assert q[q["k"].isna()]["quantile_value"].iloc[0] in (30.0, 40.0)


def test_heavy_hitters_counts_null_group(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.sketches import heavy_hitters

    vals = ["x"] * 40 + [None] * 40 + [f"r{i}" for i in range(20)]
    ds = rd.from_arrow(pa.table({"c": pa.array(vals, pa.string())})).repartition(4)
    hh = heavy_hitters(ds, "c", threshold_frac=0.3).to_pandas()
    assert len(hh) == 2
    assert int(hh[hh["c"] == "x"]["cnt"].iloc[0]) == 40
    assert int(hh[hh["c"].isna()]["cnt"].iloc[0]) == 40
    # below-threshold null group must NOT appear
    hh2 = heavy_hitters(ds, "c", threshold_frac=0.41).to_pandas()
    assert len(hh2) == 0


def test_approx_distinct_count_stable_under_null_laundering(ray_session):
    """One null in a block laundered the WHOLE block's int64 values to
    float64, whose bit patterns hash differently — the same value then
    counted twice across blocks. Nulls are dropped (SQL COUNT(DISTINCT))
    and the estimate must match the null-free run."""
    import ray.data as rd

    from geodistpy_ray.stages.sketches import approx_distinct_count

    clean = pa.table({"v": pa.array(list(range(500)) * 2, pa.int64())})
    dirty = pa.table(
        {"v": pa.array(list(range(500)) + [None] + list(range(500)), pa.int64())}
    )
    a = approx_distinct_count(rd.from_arrow(clean).repartition(2), "v")
    b = approx_distinct_count(rd.from_arrow(dirty).repartition(2), "v")
    assert a == b
    assert abs(a - 500) / 500 < 0.05
