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
