"""Null-key group convention across relational/join/sort operators.

SQL GROUP BY / PARTITION BY keep one NULL group; a null int64 key launders
to float64 NaN in pandas, where the default ``dropna=True`` silently drops
the group — or worse, NaN rank/count arithmetic lands in int64 casts as
INT64_MIN garbage. These tests pin the repaired operators.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


def _keyed_values():
    # key 1 -> [10, 20, 30], NULL key -> [5, 15], key 2 -> [40]
    return pa.table(
        {
            "k": pa.array([1, 1, 1, None, None, 2], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 5.0, 15.0, 40.0]),
            "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        }
    )


def test_grouped_ntile_null_partition(ray_session):
    from geodistpy_ray.stages.relational import grouped_ntile

    out = grouped_ntile(_ds(_keyed_values()), "k", "v", 2, tiebreak_col="id").to_pandas()
    assert len(out) == 6
    nr = out[out["k"].isna()].sort_values("v")
    assert nr["ntile"].tolist() == [1, 2]
    assert out["ntile"].between(1, 2).all()  # no INT64_MIN garbage


def test_running_total_null_partition(ray_session):
    from geodistpy_ray.stages.relational import running_total

    out = running_total(_ds(_keyed_values()), "k", "v", "v", tiebreak_col="id").to_pandas()
    nr = out[out["k"].isna()].sort_values("v")["running_cents"].tolist()
    assert nr == [500, 2000]  # 5.00, then 5.00 + 15.00 in cents


def test_top_k_per_group_null_partition(ray_session):
    from geodistpy_ray.stages.relational import top_k_per_group

    out = top_k_per_group(
        _ds(_keyed_values()), "k", "v", k=1, ascending=False, tiebreak_col="id"
    ).to_pandas()
    assert len(out) == 3  # one per key INCLUDING the NULL partition
    assert out[out["k"].isna()]["v"].iloc[0] == 15.0


def test_grouped_scalar_aggs_keep_null_group(ray_session):
    from geodistpy_ray.stages.relational import (
        grouped_median,
        grouped_minmax,
        grouped_mode,
        grouped_quantile,
        grouped_string_agg,
    )

    t = _keyed_values()
    med = grouped_median(_ds(t), "k", "v").to_pandas()
    assert med[med["k"].isna()]["median_value"].iloc[0] == 10.0
    qt = grouped_quantile(_ds(t), "k", "v", q=0.0).to_pandas()
    assert qt[qt["k"].isna()]["quantile_value"].iloc[0] == 5.0
    mm = grouped_minmax(_ds(t), ["k"], "v", final="driver")
    nr = mm[mm["k"].isna()]
    assert len(nr) == 1 and nr["min_value"].iloc[0] == 5.0 and nr["max_value"].iloc[0] == 15.0
    sa = grouped_string_agg(_ds(t), "k", "v").to_pandas()
    assert sa[sa["k"].isna()]["agg_values"].iloc[0] == "5.0,15.0"
    mo = grouped_mode(_ds(t), "k", "v").to_pandas()
    assert len(mo) == 3  # NULL key group present


def test_grouped_corr_keeps_null_group(ray_session):
    from geodistpy_ray.stages.relational import grouped_corr

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, None, None, None], pa.int64()),
            "x": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0]),
            "y": pa.array([2.0, 4.0, 6.0, 6.0, 4.0, 2.0]),
        }
    )
    out = grouped_corr(_ds(t), ["k"], "x", "y")
    nr = out[out["k"].isna()]
    assert len(nr) == 1 and nr["corr"].iloc[0] == -1.0


def test_broadcast_join_rejects_right_emitting_types(ray_session):
    from geodistpy_ray.stages.joins import broadcast_join

    left = _ds(pa.table({"k": pa.array([1], pa.int64())}))
    right = pa.table({"k": pa.array([1, 2], pa.int64()), "w": pa.array([1.0, 2.0])})
    for jt in ("full outer", "right outer", "right semi", "right anti"):
        with pytest.raises(ValueError, match="per-batch"):
            broadcast_join(left, right, "k", join_type=jt)
    ok = broadcast_join(left, right, "k", join_type="left outer").to_pandas()
    assert len(ok) == 1


def test_detect_hot_keys_null_string_column(ray_session):
    from geodistpy_ray.stages.joins import detect_hot_keys

    vals = ["hot"] * 50 + [None] * 30 + [f"c{i}" for i in range(20)]
    t = pa.table({"name": pa.array(vals, pa.string())})
    hot = detect_hot_keys(_ds(t).repartition(2), "name", frac_threshold=0.2)
    assert hot == ["hot"]  # no TypeError, NULLs never reported


def test_sorted_export_refuses_nat_keys(ray_session, tmp_path):
    from geodistpy_ray.stages.sort import sorted_export

    base = np.datetime64("2026-01-01", "us")
    ts = [base, None, base + np.timedelta64(1, "h")]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "x": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(Exception, match="NaT|null"):
        sorted_export(_ds(t), str(tmp_path / "out"), "ts", n_parts=2)


def _split_null_blocks():
    """Nulls confined to ONE block: the pandas round-trip used to emit that
    block's partial with a double-typed key while the null-free block stayed
    int64 — the same key then hashed to different partitions (duplicate,
    wrong per-key results) and driver folds crashed in concat_tables."""
    import ray.data as rd

    b1 = pa.table(
        {
            "k": pa.array([1, None], pa.int64()),
            "v": pa.array([1.0, 9.0]),
            "id": pa.array([0, 1], pa.int64()),
        }
    )
    b2 = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([3.0, 7.0]),
            "id": pa.array([2, 3], pa.int64()),
        }
    )
    return rd.from_arrow([b1, b2])


def test_top_k_per_group_null_in_one_block(ray_session):
    from geodistpy_ray.stages.relational import top_k_per_group

    out = (
        top_k_per_group(_split_null_blocks(), "k", "v", k=1, tiebreak_col="id")
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    # exactly ONE row per key — key 1 must not rank in two partitions
    assert len(out) == 3
    assert out["v"].tolist() == [3.0, 7.0, 9.0]
    assert (out["rank"] == 1).all()


def test_grouped_minmax_null_in_one_block(ray_session):
    from geodistpy_ray.stages.relational import grouped_minmax

    want = {1: (1.0, 3.0), 2: (7.0, 7.0)}
    drv = grouped_minmax(_split_null_blocks(), ["k"], "v", final="driver")
    part = grouped_minmax(
        _split_null_blocks(), ["k"], "v", final="partitioned"
    ).to_pandas()
    for out in (drv, part):
        assert len(out) == 3  # one row per key incl. the NULL group
        for k, (lo, hi) in want.items():
            row = out[out["k"] == k]
            assert len(row) == 1 and (row["min_value"].iloc[0], row["max_value"].iloc[0]) == (lo, hi)
        nr = out[out["k"].isna()]
        assert len(nr) == 1 and nr["min_value"].iloc[0] == nr["max_value"].iloc[0] == 9.0


def test_grouped_sum_null_in_one_block(ray_session):
    from geodistpy_ray.stages.relational import grouped_sum

    drv = grouped_sum(_split_null_blocks(), ["k"], cent_sum_cols={"v": "sum_cents"})
    part = (
        grouped_sum(
            _split_null_blocks(), ["k"], cent_sum_cols={"v": "sum_cents"},
            final="partitioned",
        ).to_pandas()
    )
    for out in (drv, part):
        assert len(out) == 3
        assert out[out["k"] == 1]["sum_cents"].iloc[0] == 400
        assert out[out["k"] == 1]["n"].iloc[0] == 2
        assert out[out["k"] == 2]["sum_cents"].iloc[0] == 700
        assert out[out["k"].isna()]["sum_cents"].iloc[0] == 900


def test_distinct_null_in_one_block(ray_session):
    from geodistpy_ray.stages.relational import distinct

    out = distinct(_split_null_blocks(), ["k"], final="driver")
    ks = sorted(out["k"].dropna().tolist())
    assert ks == [1, 2] and out["k"].isna().sum() == 1 and len(out) == 3


def test_grouped_corr_null_in_one_block(ray_session):
    from geodistpy_ray.stages.relational import grouped_corr

    out = grouped_corr(_split_null_blocks(), ["k"], "v", "id")
    assert len(out) == 3  # key 1's moments merged across blocks, not split
    # key 1: (v, id) = (1,0),(3,2) → perfect correlation; singletons NULL
    assert out[out["k"] == 1]["corr"].iloc[0] == 1.0
    assert out[out["k"] == 2]["corr"].isna().all()
