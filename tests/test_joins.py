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


def test_semi_anti_join(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 2, 4], "rv": [1, 2, 3]})
    lds = rd.from_arrow(pa.Table.from_pandas(left))
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    semi = shuffle_equi_join(lds, rds, "k", join_type="left semi").to_pandas()
    anti = shuffle_equi_join(lds, rds, "k", join_type="left anti").to_pandas()
    assert sorted(semi["k"].tolist()) == [2, 4]  # no duplication from dup right keys
    assert sorted(anti["k"].tolist()) == [1, 3]
    assert list(semi.columns) == ["k", "lv"]


def test_top_k_per_group(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.relational import top_k_per_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 10, 400),
            "id": np.arange(400),
            "v": rng.integers(0, 50, 400).astype(np.float64),  # many ties
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = top_k_per_group(ds, "g", "v", k=3, ascending=False, tiebreak_col="id").to_pandas()
    want = df.copy()
    want["rank"] = (
        want.sort_values(["v", "id"], ascending=[False, True])
        .groupby("g", sort=False)
        .cumcount()
        + 1
    )
    want = want[want["rank"] <= 3]
    assert _sorted(got, ["g", "id", "rank"]).equals(_sorted(want, ["g", "id", "rank"]))


def test_top_k_per_group_composite_key(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.relational import top_k_per_group

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 5, 400),
            "b": rng.integers(0, 4, 400),
            "v": rng.integers(0, 50, 400),
            "id": np.arange(400),
        }
    )
    got = (
        top_k_per_group(
            rd.from_pandas(df).repartition(5), ["a", "b"], "v", k=2,
            ascending=True, tiebreak_col="id",
        )
        .to_pandas()
        .sort_values(["a", "b", "rank"], ignore_index=True)
    )
    exp = (
        df.sort_values(["a", "b", "v", "id"], kind="mergesort")
        .groupby(["a", "b"], sort=True)
        .head(2)
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got[["a", "b", "v", "id"]].astype(int).values.tolist() == exp[
        ["a", "b", "v", "id"]
    ].astype(int).values.tolist()


def test_hopping_window_counts(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import hopping_window_agg

    rng = np.random.default_rng(9)
    ts = pd.to_datetime(rng.integers(0, 100_000, 300), unit="s")
    df = pd.DataFrame({"u": rng.integers(0, 5, 300), "ts": ts, "val": rng.uniform(0, 10, 300)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    hop, win = 10_000_000_000, 30_000_000_000  # 10k s hop, 30k s window (µs)
    got = hopping_window_agg(ds, "u", "ts", win, hop, value_col="val")
    got = got.sort_values(["u", "window_key"], ignore_index=True)
    us = df["ts"].astype("int64").to_numpy() // 1000  # ns → µs
    rows = {}
    for i in range(len(df)):
        base = us[i] // hop
        for j in range(3):
            key = (df["u"][i], base - j)
            n, c = rows.get(key, (0, 0))
            rows[key] = (n + 1, c + int(np.floor(df["val"][i] * 100.0 + 0.5)))
    want = pd.DataFrame(
        [
            {"u": k[0], "window_key": k[1], "sum_value_cents": v[1], "n": v[0]}
            for k, v in rows.items()
        ]
    ).sort_values(["u", "window_key"], ignore_index=True)
    assert got[["u", "window_key", "n", "sum_value_cents"]].equals(
        want[["u", "window_key", "n", "sum_value_cents"]]
    )


def test_grouped_median_and_running_total(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.relational import cents, grouped_median, running_total

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 6, 200),
            "o": rng.permutation(200),
            "id": np.arange(200),
            "v": np.round(rng.uniform(0, 50, 200), 2),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    med = grouped_median(ds, "u", "v").to_pandas().sort_values("u", ignore_index=True)
    want_med = df.groupby("u")["v"].median()
    for _, row in med.iterrows():
        assert abs(row["median_value"] - want_med[row["u"]]) < 1e-12
    run = running_total(ds, "u", "o", "v", tiebreak_col="id").to_pandas()
    want = df.sort_values(["o", "id"], kind="mergesort").copy()
    want["running_cents"] = want.groupby("u")["v"].transform(
        lambda s: np.cumsum(cents(s.to_numpy()))
    )
    got = run.set_index("id")["running_cents"]
    for i, w in zip(want["id"], want["running_cents"]):
        assert got[i] == w


def test_salted_join_matches_unsalted(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(21)
    # key 7 is hot: 60% of both sides
    lk = np.where(rng.uniform(size=500) < 0.6, 7, rng.integers(0, 30, 500))
    rk = np.where(rng.uniform(size=300) < 0.6, 7, rng.integers(0, 30, 300))
    left = pd.DataFrame({"k": lk, "lv": np.arange(500)})
    right = pd.DataFrame({"rk": rk, "rv": np.arange(300) + 10_000})
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(5)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(4)
    plain = shuffle_equi_join(lds, rds, "k", "rk", n_buckets=8).to_pandas()
    salted = shuffle_equi_join(
        lds, rds, "k", "rk", n_buckets=8, hot_keys=[7], n_salt=4
    ).to_pandas()
    assert _sorted(salted, ["k", "lv", "rv"]).equals(_sorted(plain, ["k", "lv", "rv"]))
    assert len(salted) == len(left.merge(right.rename(columns={"rk": "k"}), on="k"))


def test_salted_join_rejects_non_inner(ray_session):
    import ray.data as rd

    lds = rd.from_arrow(pa.table({"k": [1], "lv": [1]}))
    rds = rd.from_arrow(pa.table({"k": [1], "rv": [1]}))
    with pytest.raises(ValueError, match="inner"):
        shuffle_equi_join(lds, rds, "k", join_type="left semi", hot_keys=[1])


def test_detect_hot_keys_and_auto_salted_join(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.joins import detect_hot_keys

    rng = np.random.default_rng(29)
    lk = np.where(rng.uniform(size=1000) < 0.4, 99, rng.integers(0, 200, 1000))
    left = pd.DataFrame({"k": lk, "lv": np.arange(1000)})
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(4)
    hot = detect_hot_keys(lds, "k", frac_threshold=0.05)
    assert hot == [99]
    # end-to-end: detected keys feed the salted join and match the plain join
    right = pd.DataFrame({"rk": np.where(rng.uniform(size=300) < 0.4, 99, rng.integers(0, 200, 300)), "rv": np.arange(300)})
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(3)
    plain = shuffle_equi_join(lds, rds, "k", "rk").to_pandas()
    salted = shuffle_equi_join(lds, rds, "k", "rk", hot_keys=hot, n_salt=4).to_pandas()
    assert _sorted(salted, ["k", "lv", "rv"]).equals(_sorted(plain, ["k", "lv", "rv"]))


def test_outer_joins_match_pandas(left_right):
    left, right, lds, rds = left_right
    lo = shuffle_equi_join(lds, rds, "k", "rk", join_type="left outer", n_buckets=8).to_pandas()
    fo = shuffle_equi_join(lds, rds, "k", "rk", join_type="full outer", n_buckets=8).to_pandas()
    want_lo = left.merge(right.rename(columns={"rk": "k"}), on="k", how="left")
    want_fo = left.merge(right.rename(columns={"rk": "k"}), on="k", how="outer")
    assert len(lo) == len(want_lo)
    assert lo["rv"].isna().sum() == want_lo["rv"].isna().sum()
    assert len(fo) == len(want_fo)
    # right-only keys must appear with null left values
    assert fo["lv"].isna().sum() == want_fo["lv"].isna().sum()


def test_hopping_window_offset(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import hopping_window_agg

    ts = pd.to_datetime([5, 15, 25], unit="s")
    df = pd.DataFrame({"u": [1, 1, 1], "ts": ts})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    hop = 10_000_000
    aligned = hopping_window_agg(ds, "u", "ts", hop, hop)
    shifted = hopping_window_agg(ds, "u", "ts", hop, hop, offset_us=5_000_000)
    # aligned: events at 5/15/25s land in windows 0,1,2
    assert sorted(aligned["window_key"]) == [0, 1, 2]
    # shifted grid [5,15), [15,25), [25,35) → windows 0,1,2 again but
    # boundary events now INSIDE windows starting at their own ts
    assert sorted(shifted["window_key"]) == [0, 1, 2]
    # an offset bigger than ts pushes keys negative — grid is truly shifted
    neg = hopping_window_agg(ds, "u", "ts", hop, hop, offset_us=50_000_000)
    assert (neg["window_key"] < 0).all()


# ── regression tests for the round-1 self-review findings ────────────────


def test_sessionize_ns_timestamps(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import sessionize

    # ns-typed timestamps (pandas default); 2 sessions separated by 1 hour
    ts = pd.to_datetime([0, 60, 120, 3720], unit="s")
    df = pd.DataFrame({"u": [1] * 4, "ts": ts, "eid": range(4)})
    got = sessionize(
        rd.from_arrow(pa.Table.from_pandas(df)), "u", "ts", 1_800_000_000, order_tiebreak_col="eid"
    ).to_pandas()
    assert got["n_sessions"].tolist() == [2]


def test_join_key_name_collision_raises(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({"id": [1], "lv": [1]}))
    right = rd.from_arrow(pa.table({"rid": [1], "id": [9]}))  # carries left's key name
    with pytest.raises(ValueError, match="key name"):
        shuffle_equi_join(left, right, "id", "rid")


def test_asof_keeps_matches_with_null_values(ray_session):
    import ray.data as rd

    left = pd.DataFrame(
        {"u": [1, 1], "t": pd.to_datetime([10, 20], unit="s"), "lid": [0, 1]}
    )
    right = pd.DataFrame(
        {
            "u": [1, 1],
            "t": pd.to_datetime([5, 15], unit="s"),
            "rv": pd.array([pd.NA, 7], dtype="Int64"),  # first match value is NULL
        }
    )
    got = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="u",
        ts="t",
    ).to_pandas()
    # both left rows HAVE an as-of match; the null rv must not drop row lid=0
    assert sorted(got["lid"]) == [0, 1]
    assert got.set_index("lid")["rv"].isna()[0]
    assert got.set_index("lid")["rv"][1] == 7


def test_knn_indexed_empty_candidates(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.knn import knn_join_indexed

    queries = rd.from_arrow(pa.table({"query_id": [0], "lat": [1.0], "lon": [2.0]}))
    got = knn_join_indexed(
        queries, np.array([], dtype=np.int64), np.array([]), np.array([]), k=3,
        kernel="haversine", concurrency=1,
    ).to_pandas()
    assert len(got) == 0


def test_grouped_sum_empty_input(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.relational import distinct, grouped_minmax, grouped_sum

    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}))
    g = grouped_sum(empty, ["k"], cent_sum_cols={"v": "s"})
    assert len(g) == 0 and list(g.columns) == ["k", "s", "n"]
    m = grouped_minmax(empty, ["k"], "v")
    assert len(m) == 0
    d = distinct(empty, ["k"], final="driver")
    assert len(d) == 0


def test_detect_hot_keys_total_survives_block_merge(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.joins import detect_hot_keys

    # many tiny batches merged into few blocks: totals must still sum to n
    rng = np.random.default_rng(51)
    k = np.where(rng.uniform(size=20_000) < 0.10, 5, rng.integers(100, 5000, 20_000))
    ds = rd.from_arrow(pa.table({"k": k})).repartition(2)
    hot = detect_hot_keys(ds, "k", frac_threshold=0.05)
    assert hot == [5]
    # with an undercounted total, ~every key would clear the threshold
    assert detect_hot_keys(ds, "k", frac_threshold=0.2) == []


def test_late_event_stats_vs_pandas(ray_session):
    """Watermark late-data accounting matches a direct pandas computation
    (late = older than the key's max ts minus the allowance)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geodistpy_ray.stages.windows import late_event_stats

    rng = np.random.default_rng(31)
    n = 2000
    keys = rng.integers(0, 12, n)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 90 * 24 * 3600, n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    ds = rd.from_arrow(pa.table({"k": keys.astype(np.int64), "ts": ts})).repartition(6)
    wm = 30 * 24 * 3_600_000_000
    got = (
        late_event_stats(ds, "k", "ts", wm).to_pandas().sort_values("k", ignore_index=True)
    )
    df = pd.DataFrame({"k": keys, "us": ts.astype(np.int64)})
    df["late"] = df["us"] < df.groupby("k")["us"].transform("max") - wm
    want = df.groupby("k", as_index=False).agg(n_events=("late", "size"), n_late=("late", "sum"))
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["n_late"].tolist() == want["n_late"].tolist()
    assert got["n_late"].sum() > 0  # the fixture must actually exercise lateness


class TestPivotRollup:
    def test_pivot_counts(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import pivot_counts

        tab = pa.table(
            {
                "source": ["a", "a", "a", "b", "b"],
                "lang": ["en", "en", "zz", "de", None],
            }
        )
        out = pivot_counts(
            rd.from_arrow(tab), key_col="source", pivot_col="lang", values=["en", "de"]
        )
        rows = {r["source"]: r for _, r in out.iterrows()}
        assert rows["a"]["en_n"] == 2 and rows["a"]["de_n"] == 0
        assert rows["a"]["other_n"] == 1 and rows["a"]["n"] == 3
        # NULL pivot values land in other_n (fill_null(eq, False))
        assert rows["b"]["de_n"] == 1 and rows["b"]["other_n"] == 1 and rows["b"]["n"] == 2

    def test_rollup_sum(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import rollup_sum

        tab = pa.table(
            {
                "a": ["x", "x", "y"],
                "b": ["p", "q", "p"],
                "v": pa.array([1, 2, 4], pa.int64()),
            }
        )
        out = rollup_sum(rd.from_arrow(tab), ["a", "b"], int_sum_cols={"v": "sv"})
        finest = out[out.grouping_id == 0]
        mid = out[out.grouping_id == 1]
        total = out[out.grouping_id == 3]
        assert len(finest) == 3 and len(mid) == 2 and len(total) == 1
        assert int(mid[mid.a == "x"]["sv"].iloc[0]) == 3
        assert mid["b"].isna().all()
        assert int(total["sv"].iloc[0]) == 7 and int(total["n"].iloc[0]) == 3

    def test_rollup_integer_levels_keep_dtype(self, ray_session):
        """Integer level columns must roll up to nullable Int64, not a mixed
        object column that would mistype a later pandas→Arrow conversion
        (ADVICE r3): the rolled-up frame round-trips Arrow as int64+null."""
        import duckdb
        import ray.data as rd

        from geodistpy_ray.stages.relational import cube_sum, rollup_sum

        tab = pa.table(
            {
                "a": pa.array([10, 10, 20], pa.int64()),
                "b": pa.array([1, 2, 1], pa.int64()),
                "v": pa.array([1, 2, 4], pa.int64()),
            }
        )
        out = rollup_sum(rd.from_arrow(tab), ["a", "b"], int_sum_cols={"v": "sv"})
        assert pd.api.types.is_integer_dtype(out["a"].dtype)
        assert pd.api.types.is_integer_dtype(out["b"].dtype)
        rt = pa.Table.from_pandas(out, preserve_index=False)
        assert rt.schema.field("a").type == pa.int64()
        assert rt.schema.field("b").type == pa.int64()
        con = duckdb.connect()
        con.register("t", tab)
        exp = con.execute(
            "SELECT a, b, SUM(v) AS sv, COUNT(*) AS n, "
            "GROUPING(a, b) AS grouping_id FROM t GROUP BY ROLLUP(a, b) "
            "ORDER BY grouping_id, a NULLS LAST, b NULLS LAST"
        ).df()
        got = out.sort_values(
            ["grouping_id", "a", "b"], ignore_index=True, na_position="last"
        )[["a", "b", "sv", "n", "grouping_id"]]
        assert got["sv"].astype(np.int64).tolist() == exp["sv"].astype(np.int64).tolist()
        assert (
            got["a"].isna().tolist() == exp["a"].isna().tolist()
            and got["b"].isna().tolist() == exp["b"].isna().tolist()
        )
        cube = cube_sum(rd.from_arrow(tab), ["a", "b"], int_sum_cols={"v": "sv"})
        assert pd.api.types.is_integer_dtype(cube["a"].dtype)
        assert pa.Table.from_pandas(cube, preserve_index=False).schema.field(
            "b"
        ).type == pa.int64()


class TestGlobalTopk:
    def test_topk_and_ties(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import global_topk

        tab = pa.table(
            {
                "id": pa.array(range(100), pa.int64()),
                "v": pa.array([i % 10 for i in range(100)], pa.int64()),
            }
        )
        out = global_topk(
            rd.from_arrow(tab).repartition(7), ["v", "id"], k=15, descending=[True, False]
        )
        # total order: v desc, id asc — the 10 v==9 rows then 5 of v==8
        assert list(out["v"]) == [9] * 10 + [8] * 5
        assert list(out["id"][:10]) == [9, 19, 29, 39, 49, 59, 69, 79, 89, 99]
        assert list(out["id"][10:]) == [8, 18, 28, 38, 48]

    def test_k_exceeds_rows(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import global_topk

        tab = pa.table({"id": pa.array([3, 1, 2], pa.int64())})
        out = global_topk(rd.from_arrow(tab), ["id"], k=10)
        assert list(out["id"]) == [1, 2, 3]


class TestGroupedMode:
    def test_mode_with_tie_break(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.relational import grouped_mode

        tab = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2, 2, 2, 3], pa.int64()),
                "v": ["b", "b", "a", "z", "y", "z", "y", "q"],
            }
        )
        out = {
            r["k"]: (r["mode_value"], r["mode_count"])
            for r in grouped_mode(rd.from_arrow(tab).repartition(3), "k", "v").take_all()
        }
        # key 1: b wins on count; key 2: y/z tie at 2 → smallest value wins
        assert out == {1: ("b", 2), 2: ("y", 2), 3: ("q", 1)}


class TestPandasBlockInputs:
    def test_join_after_partitioned_map_groups(self, ray_session):
        """A join side produced by a partitioned_map_groups finalizer carries
        pandas blocks, so Dataset.schema() reports numpy/Python types instead
        of Arrow ones — the schema harmonization must coerce them (regression:
        pa.nulls(n, <class 'type'>) raised TypeError)."""
        import ray.data as rd

        from geodistpy_ray.stages.grouping import partitioned_map_groups

        left_tab = pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "txt": ["a", "b", "c", "d"],
            }
        )
        # identity finalizer → same rows, but now in pandas blocks
        left = partitioned_map_groups(
            rd.from_arrow(left_tab), "k", lambda g: g, n_parts=4
        )
        right = rd.from_arrow(
            pa.table({"k": pa.array([2, 3, 5], pa.int64()), "rv": [20, 30, 50]})
        )
        out = shuffle_equi_join(left, right, "k", n_buckets=4).to_pandas()
        got = _sorted(out)
        exp = _sorted(pd.DataFrame({"k": [2, 3], "txt": ["b", "c"], "rv": [20, 30]}))
        pd.testing.assert_frame_equal(
            got.astype({"k": "int64", "rv": "int64"}), exp.astype({"k": "int64", "rv": "int64"})
        )

    def test_outer_join_pads_pandas_block_side(self, ray_session):
        """Full outer over a pandas-block left: unmatched RIGHT rows need
        null padding typed from the pandas-reported left schema (object →
        string, numpy int64 → int64)."""
        import ray.data as rd

        from geodistpy_ray.stages.grouping import partitioned_map_groups

        left = partitioned_map_groups(
            rd.from_arrow(
                pa.table({"k": pa.array([1, 2], pa.int64()), "txt": ["a", "b"]})
            ),
            "k",
            lambda g: g,
            n_parts=2,
        )
        right = rd.from_arrow(
            pa.table({"k": pa.array([2, 9], pa.int64()), "rv": [20, 90]})
        )
        out = shuffle_equi_join(left, right, "k", join_type="full outer", n_buckets=4).to_pandas()
        assert set(out["k"]) == {1, 2, 9}
        row9 = out[out["k"] == 9].iloc[0]
        assert pd.isna(row9["txt"]) and row9["rv"] == 90


class TestAsofVectorized:
    def test_forward_direction_matches_merge_asof(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(21)
        l = pd.DataFrame(
            {
                "k": rng.integers(0, 6, 200),
                "ts": rng.integers(0, 500, 200).astype(np.int64),
                "lv": np.arange(200),
            }
        )
        r = pd.DataFrame(
            {
                "k": rng.integers(0, 8, 150),  # some right-only keys
                "ts": rng.integers(0, 500, 150).astype(np.int64),
                "rv": np.arange(150) + 1000,
            }
        )
        # unique (k, ts) on the right: tie order is unspecified by contract
        r = r.drop_duplicates(["k", "ts"])
        got = (
            asof_join(
                rd.from_pandas(l).repartition(4),
                rd.from_pandas(r).repartition(3),
                key="k",
                ts="ts",
                direction="forward",
                n_buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "ts", "lv"], ignore_index=True)
        )
        exp = pd.merge_asof(
            l.sort_values("ts", kind="mergesort"),
            r.sort_values("ts", kind="mergesort"),
            on="ts",
            by="k",
            direction="forward",
        )
        exp = exp[exp["rv"].notna()].sort_values(["k", "ts", "lv"], ignore_index=True)
        assert got["lv"].tolist() == exp["lv"].tolist()
        assert got["rv"].tolist() == [int(v) for v in exp["rv"]]

    def test_left_only_key_never_leaks_previous_key(self, ray_session):
        import ray.data as rd

        # key 5 has no right rows; the running max from key 3's right rows
        # must not leak into it
        l = pd.DataFrame({"k": [3, 5], "ts": [10, 10], "lv": [1, 2]})
        r = pd.DataFrame({"k": [3], "ts": [5], "rv": [99]})
        got = (
            asof_join(rd.from_pandas(l), rd.from_pandas(r), key="k", ts="ts", n_buckets=1)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert got["k"].tolist() == [3]
        assert got["rv"].tolist() == [99]

    def test_bad_direction_raises(self, ray_session):
        import ray.data as rd

        l = rd.from_pandas(pd.DataFrame({"k": [1], "ts": [1], "lv": [1]}))
        with pytest.raises(ValueError, match="direction"):
            asof_join(l, l, key="k", ts="ts", direction="nearest")


def test_lag_lead_delta_vs_pandas(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import add_lag_delta

    rng = np.random.default_rng(41)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "t": rng.integers(0, 10_000, 300).astype(np.int64),
            "id": np.arange(300),
        }
    )
    for direction in ("lag", "lead"):
        got = (
            add_lag_delta(
                rd.from_pandas(df).repartition(4), "k", "t",
                tiebreak_col="id", out_col="d", direction=direction,
            )
            .to_pandas()
            .sort_values(["k", "t", "id"], ignore_index=True)
        )
        s = df.sort_values(["k", "t", "id"], ignore_index=True)
        grp = s.groupby("k")["t"]
        exp = (s["t"] - grp.shift(1)) if direction == "lag" else (grp.shift(-1) - s["t"])
        pd.testing.assert_series_equal(
            got["d"], exp.astype(float), check_names=False
        )
    with pytest.raises(ValueError, match="direction"):
        add_lag_delta(rd.from_pandas(df), "k", "t", direction="sideways")


def test_track_length_vs_pandas(ray_session):
    import ray.data as rd

    from geodistpy_ray.kernels import haversine
    from geodistpy_ray.stages.windows import geodesic_track_length

    rng = np.random.default_rng(43)
    n = 400
    df = pd.DataFrame(
        {
            "k": np.concatenate([rng.integers(0, 7, n - 1), [99]]),  # key 99: 1 point
            "t": rng.integers(0, 10_000, n).astype(np.int64),
            "id": np.arange(n),
            "lat": rng.uniform(-80, 80, n),
            "lon": rng.uniform(-180, 180, n),
        }
    )
    got = (
        geodesic_track_length(
            rd.from_pandas(df).repartition(4), "k", "t", tiebreak_col="id"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    s = df.sort_values(["k", "t", "id"], ignore_index=True)
    d = haversine(
        s["lat"].to_numpy()[:-1], s["lon"].to_numpy()[:-1],
        s["lat"].to_numpy()[1:], s["lon"].to_numpy()[1:],
    )
    same = s["k"].to_numpy()[1:] == s["k"].to_numpy()[:-1]
    leg_mm = np.where(same, np.floor(d * 1000.0 + 0.5).astype(np.int64), 0)
    exp = (
        pd.DataFrame({"k": s["k"].to_numpy()[1:][same], "leg": leg_mm[same]})
        .groupby("k", as_index=False)
        .agg(n_legs=("leg", "size"), track_mm=("leg", "sum"))
    )
    # single-point key 99 must be absent (no legs), like WHERE prev IS NOT NULL
    assert 99 not in set(got["k"])
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n_legs"].tolist() == exp["n_legs"].tolist()
    assert got["track_mm"].tolist() == exp["track_mm"].tolist()


def test_add_rank_vs_pandas(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import add_rank

    rng = np.random.default_rng(47)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 250),
            "t": rng.integers(0, 40, 250).astype(np.int64),  # plenty of ties
            "id": np.arange(250),
        }
    )
    got = (
        add_rank(rd.from_pandas(df).repartition(4), "k", "t", tiebreak_col="id")
        .to_pandas()
        .sort_values(["k", "t", "id"], ignore_index=True)
    )
    s = df.sort_values(["k", "t", "id"], ignore_index=True)
    exp = s.groupby("k").cumcount().to_numpy() + 1
    assert got["rnk"].tolist() == exp.tolist()


def test_densify_tracks_properties(ray_session):
    import ray.data as rd

    from geodistpy_ray.kernels import haversine
    from geodistpy_ray.kernels.simplify import cross_track_distance
    from geodistpy_ray.stages.windows import densify_tracks

    # one user, three points: a 12000 km leg, a short leg (no inserts)
    df = pd.DataFrame(
        {
            "trk": [1, 1, 1],
            "t": [0, 1, 2],
            "lat": [10.0, 20.0, 20.1],
            "lon": [-60.0, 70.0, 70.1],
        }
    )
    out = (
        densify_tracks(
            rd.from_pandas(df), "trk", "t", max_leg_m=5_000_000.0, round_to=None
        )
        .to_pandas()
        .sort_values(["leg_idx", "k"], ignore_index=True)
    )
    assert (out["trk"] == 1).all()  # the key column survives alongside 'k'
    d = float(haversine(10.0, -60.0, 20.0, 70.0))
    n = int(np.ceil(d / 5_000_000.0))
    assert (out["leg_idx"] == 1).all()  # only the long leg densifies
    assert out["k"].tolist() == list(range(1, n))
    # inserted points sit ON the great circle of the leg...
    dev = cross_track_distance(
        out["lat"].to_numpy(), out["lon"].to_numpy(), 10.0, -60.0, 20.0, 70.0
    )
    assert float(np.abs(dev).max()) < 1.0  # meters
    # ...and split it into n sub-legs each <= max_leg (plus fp headroom)
    path_lat = np.concatenate([[10.0], out["lat"].to_numpy(), [20.0]])
    path_lon = np.concatenate([[-60.0], out["lon"].to_numpy(), [70.0]])
    sub = haversine(path_lat[:-1], path_lon[:-1], path_lat[1:], path_lon[1:])
    assert float(sub.max()) <= 5_000_000.0 * 1.001
    assert abs(float(sub.sum()) - d) < 1.0


def test_session_spans_consistency(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import session_spans, sessionize

    rng = np.random.default_rng(103)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n),
            "ts": pd.to_datetime(
                rng.integers(0, 3 * 86_400_000_000, n), unit="us"
            ),
            "id": np.arange(n),
        }
    )
    gap = 1_800_000_000
    spans = (
        session_spans(rd.from_pandas(df).repartition(4), "k", "ts", gap, tiebreak_col="id")
        .to_pandas()
        .sort_values(["k", "session_idx"], ignore_index=True)
    )
    counts = (
        sessionize(rd.from_pandas(df).repartition(4), "k", "ts", gap, order_tiebreak_col="id")
        .to_pandas()
        .set_index("k")["n_sessions"]
    )
    # span count per key == the count op's n_sessions
    got_counts = spans.groupby("k")["session_idx"].max()
    assert got_counts.to_dict() == counts.to_dict()
    # session indices are 1..n contiguous per key
    for k, g in spans.groupby("k"):
        assert g["session_idx"].tolist() == list(range(1, len(g) + 1))
        # spans ordered, non-overlapping, separated by > gap
        assert (g["end_us"] >= g["start_us"]).all()
        nxt = g["start_us"].to_numpy()[1:]
        prv = g["end_us"].to_numpy()[:-1]
        assert (nxt - prv > gap).all()
    # event counts add up
    assert spans["n_events"].sum() == n


def test_shuffle_join_nullable_keys(ray_session):
    """A null in a batch FLOATS the whole key array via to_numpy, which used
    to hash keys into different buckets than the null-free side — silently
    losing matches. Placement must be dtype-stable; Acero gives the SQL
    semantics (null never equals null)."""
    import ray.data as rd

    from geodistpy_ray.stages.joins import shuffle_equi_join

    left = pa.table(
        {
            "k": pa.array([1, None, 3, 5, 7], pa.int64()),
            "a": pa.array([10, 20, 30, 50, 70]),
        }
    )
    right = pa.table(
        {
            "k2": pa.array([1, 3, None, 7, 9], pa.int64()),
            "b": pa.array([100, 300, 999, 700, 900]),
        }
    )
    inner = (
        shuffle_equi_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(2),
            "k",
            "k2",
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert inner["k"].tolist() == [1, 3, 7]
    assert inner["b"].tolist() == [100, 300, 700]
    louter = shuffle_equi_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "k2",
        join_type="left outer", n_buckets=8,
    ).to_pandas()
    assert len(louter) == 5  # every left row once, incl. the null key
    assert louter.loc[louter["k"].isna(), "b"].isna().all()


def test_asof_join_null_keys_never_match(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.joins import asof_join

    left = pa.table(
        {
            "k": pa.array([1, None, 1], pa.int64()),
            "ts": pa.array([10, 10, 20], pa.int64()),
            "a": pa.array([1, 2, 3]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([None, 1], pa.int64()),
            "rts": pa.array([5, 5], pa.int64()),
            "b": pa.array([99, 7]),
        }
    )
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "ts",
        right_ts_key="rts", n_buckets=4,
    ).to_pandas()
    # the null-key left row must NOT match the null-key right row
    assert len(out) == 2
    assert out["b"].tolist() == [7, 7]


class TestStayPoints:
    def _ref(self, df, eps_m, min_dur, max_gap=None, min_pts=2):
        from geodistpy_ray.kernels import haversine

        s = df.dropna(subset=["k", "t"]).sort_values(
            ["k", "t", "id"], ignore_index=True
        )
        k = s["k"].to_numpy()
        t = s["t"].to_numpy().astype(np.int64)
        lat, lon = s["lat"].to_numpy(), s["lon"].to_numpy()
        n = len(s)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            d = haversine(lat[:-1], lon[:-1], lat[1:], lon[1:])
            leg_mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            far = leg_mm > np.int64(np.floor(eps_m * 1000.0 + 0.5))
            if max_gap is not None:
                far |= (t[1:] - t[:-1]) > max_gap
            brk[1:] = far | (k[1:] != k[:-1])
        run = np.cumsum(brk)
        out = []
        for r in np.unique(run):
            m = run == r
            tt = t[m]
            dur = int(tt[-1] - tt[0])
            if dur >= min_dur and m.sum() >= min_pts:
                su = np.floor(lat[m] * 1e6 + 0.5).astype(np.int64).sum()
                so = np.floor(lon[m] * 1e6 + 0.5).astype(np.int64).sum()
                out.append(
                    (
                        k[m][0],
                        int(tt[0]),
                        int(tt[-1]),
                        int(m.sum()),
                        dur,
                        np.floor(su / m.sum() + 0.5) / 1e6,
                        np.floor(so / m.sum() + 0.5) / 1e6,
                    )
                )
        return pd.DataFrame(
            out,
            columns=["k", "start_us", "end_us", "n_pts", "dur_us", "clat", "clon"],
        ).sort_values(["k", "start_us"], ignore_index=True)

    def _mixed_df(self, seed=7, n=300):
        # dwell-segment walks: each key stays near a center for a few
        # consecutive points (small jitter, advancing clock) then jumps to
        # a new center — real stay runs broken by genuine moves
        rng = np.random.default_rng(seed)
        centers = rng.uniform(-60, 60, (8, 2))
        rows = []
        i = 0
        for k in range(6):
            t = int(rng.integers(0, 1000))
            while i < n * (k + 1) // 6:
                c = centers[rng.integers(0, 8)]
                for _ in range(int(rng.integers(1, 6))):  # dwell 1-5 points
                    rows.append(
                        (
                            k,
                            t,
                            i,
                            c[0] + rng.normal(0, 0.3),
                            c[1] + rng.normal(0, 0.3),
                        )
                    )
                    t += int(rng.integers(1_000, 60_000))
                    i += 1
                    if i >= n * (k + 1) // 6:
                        break
        return pd.DataFrame(rows, columns=["k", "t", "id", "lat", "lon"]).astype(
            {"t": np.int64}
        )

    def _run(self, df, eps_m, min_dur, **kw):
        import ray.data as rd

        from geodistpy_ray.stages.windows import stay_points

        got = (
            stay_points(
                rd.from_pandas(df).repartition(4),
                eps_m,
                min_dur,
                key_col="k",
                ts_col="t",
                tiebreak_col="id",
                **kw,
            )
            .to_pandas()
            .sort_values(["k", "start_us"], ignore_index=True)
        )
        return got

    def test_vs_reference(self, ray_session):
        df = self._mixed_df()
        eps, dur = 200_000.0, 50_000
        got = self._run(df, eps, dur)
        exp = self._ref(df, eps, dur)
        assert len(got) > 3  # fixture actually exercises the operator
        pd.testing.assert_frame_equal(
            got, exp, check_dtype=False, check_exact=True
        )

    def test_max_gap_breaks_runs(self, ray_session):
        # three same-place points, middle gap exceeds max_gap -> two runs
        df = pd.DataFrame(
            {
                "k": [1, 1, 1, 1],
                "t": np.array([0, 10, 500, 510], dtype=np.int64),
                "id": np.arange(4),
                "lat": [10.0, 10.001, 10.002, 10.003],
                "lon": [20.0, 20.0, 20.0, 20.0],
            }
        )
        whole = self._run(df, 10_000.0, 0, min_pts=2)
        assert len(whole) == 1 and whole["n_pts"].iloc[0] == 4
        split = self._run(df, 10_000.0, 0, min_pts=2, max_gap_us=100)
        assert split["n_pts"].tolist() == [2, 2]
        exp = self._ref(df, 10_000.0, 0, max_gap=100)
        pd.testing.assert_frame_equal(split, exp, check_dtype=False)

    def test_null_key_and_ts_dropped(self, ray_session):
        df = pd.DataFrame(
            {
                "k": pd.array([1, 1, None, 1], dtype="Int64"),
                "t": pd.array([0, 10, 20, None], dtype="Int64"),
                "id": np.arange(4),
                "lat": [10.0] * 4,
                "lon": [20.0] * 4,
            }
        )
        got = self._run(df, 10_000.0, 0)
        # only rows 0,1 survive -> one 2-point run
        assert len(got) == 1
        assert got["n_pts"].iloc[0] == 2 and got["end_us"].iloc[0] == 10

    def test_partition_independence(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.windows import stay_points

        df = self._mixed_df(seed=11)
        outs = []
        for parts in (1, 7):
            outs.append(
                stay_points(
                    rd.from_pandas(df).repartition(parts),
                    200_000.0,
                    50_000,
                    key_col="k",
                    ts_col="t",
                    tiebreak_col="id",
                )
                .to_pandas()
                .sort_values(["k", "start_us"], ignore_index=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_min_pts_validation(self, ray_session):
        import ray.data as rd

        from geodistpy_ray.stages.windows import stay_points

        with pytest.raises(ValueError, match="min_pts"):
            stay_points(
                rd.from_pandas(self._mixed_df(seed=1, n=10)),
                1.0,
                0,
                key_col="k",
                ts_col="t",
                min_pts=0,
            )
