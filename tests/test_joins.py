"""Join stages vs pandas brute-force oracles (synthetic inputs, small + fast).

Covers the relational joins the reference lacks (its joins are dense
all-pairs kernels, `/root/reference/geodistpy/geodesic.py:243-276`):
broadcast hash join, bucketed shuffle equi-join, as-of join, range join,
and exact distinct.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodistpy_ray.stages.joins import (
    asof_join,
    broadcast_join,
    range_join_broadcast,
    shuffle_equi_join,
)
from geodistpy_ray.stages.relational import distinct


def _sorted(df, cols=None):
    cols = cols or sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


@pytest.fixture(scope="module")
def left_right(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 300),
            "lv": rng.integers(0, 1000, 300),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 50, 200),  # some keys unmatched on each side
            "rv": rng.integers(0, 1000, 200).astype(np.int32),
        }
    )
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(5)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(4)
    return left, right, lds, rds


def test_shuffle_equi_join_matches_pandas(left_right):
    left, right, lds, rds = left_right
    got = shuffle_equi_join(lds, rds, "k", "rk", n_buckets=8).to_pandas()
    want = left.merge(right.rename(columns={"rk": "k"}), on="k")
    assert _sorted(got).equals(_sorted(want))
    # exact Arrow types preserved through null-padding (no float laundering)
    assert got["rv"].dtype == np.int32


def test_shuffle_join_duplicate_keys_cross_product(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": [1, 1, 2], "lv": [10, 11, 20]})
    right = pd.DataFrame({"k": [1, 1, 3], "rv": [100, 101, 300]})
    got = shuffle_equi_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        "k",
        n_buckets=4,
    ).to_pandas()
    assert len(got) == 4  # 2x2 for key 1
    assert sorted(got[got.k == 1]["rv"].tolist()) == [100, 100, 101, 101]


def test_shuffle_join_name_collision_raises(left_right):
    _, _, lds, _ = left_right
    with pytest.raises(ValueError, match="collision"):
        shuffle_equi_join(lds, lds, "k")


def test_broadcast_join_matches_pandas(left_right):
    left, right, lds, _ = left_right
    got = broadcast_join(
        lds, pa.Table.from_pandas(right), "k", right_keys="rk"
    ).to_pandas()
    want = left.merge(right.rename(columns={"rk": "k"}), on="k")
    assert _sorted(got).equals(_sorted(want))


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "u": rng.integers(0, 20, n_l),
            "t": pd.to_datetime(rng.integers(0, 10**9, n_l), unit="s"),
            "lid": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "u": rng.integers(0, 20, n_r),
            "t": pd.to_datetime(rng.integers(0, 10**9, n_r), unit="s"),
            "rid": np.arange(n_r) + 10_000,
        }
    )
    got = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left)).repartition(4),
        rd.from_arrow(pa.Table.from_pandas(right)).repartition(3),
        key="u",
        ts="t",
        n_buckets=6,
    ).to_pandas()
    want = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t",
        by="u",
        direction="backward",
    ).dropna(subset=["rid"])
    want["rid"] = want["rid"].astype(np.int64)
    assert _sorted(got, ["lid", "rid"]).equals(_sorted(want, ["lid", "rid"]))


def test_range_join_overlapping_ranges(ray_session):
    import ray.data as rd

    v = np.arange(100, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": v, "x": v * 10})).repartition(3)
    ranges = pa.table(
        {
            "range_id": np.array([0, 1, 2], dtype=np.int64),
            "lo": np.array([0, 150, 250], dtype=np.int64),
            "hi": np.array([200, 400, 260], dtype=np.int64),
        }
    )
    got = range_join_broadcast(ds, ranges, value_col="x").to_pandas()
    rows = []
    for rid, lo, hi in [(0, 0, 200), (1, 150, 400), (2, 250, 260)]:
        for i in v:
            if lo <= i * 10 < hi:
                rows.append({"id": i, "x": i * 10, "range_id": rid})
    want = pd.DataFrame(rows)
    assert _sorted(got).equals(_sorted(want))
    # value 150..190 and 250 land in two ranges → true overlap emission
    assert (got.groupby("x").size() > 1).any()


def test_distinct_both_finals(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"a": rng.integers(0, 15, 500), "b": rng.integers(0, 3, 500)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    want = _sorted(df.drop_duplicates())
    got_driver = distinct(ds, ["a", "b"], final="driver")
    got_shuffle = distinct(ds, ["a", "b"], final="shuffle").to_pandas()
    assert _sorted(got_driver).equals(want)
    assert _sorted(got_shuffle).equals(want)
