"""Null-TIMESTAMP parity for the ordering-based window operators.

A null ts laundered through ``astype(int64)`` becomes INT64_MIN — breaking
searchsorted's sortedness precondition, wrapping watermark subtractions,
and emitting garbage deltas — while SQL gives every case a well-defined
answer (NULL comparisons are never true; LAG(NULL) IS NULL breaks a
session; RANGE frames make null keys one peer group; MIN/MAX skip NULLs).
These tests pin the engine to DuckDB's answers on a null-bearing fixture.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

GAP_US = 5_000_000  # 5 s


def _fixture() -> pa.Table:
    # keys 1 and 2 mix valid and null ts; key 3 is all-null
    ts = [
        1_000_000, 3_000_000, None, 9_000_000,   # key 1: null mid-stream
        2_000_000, None, None,                    # key 2: two trailing nulls
        None, None,                               # key 3: all null
    ]
    keys = [1, 1, 1, 1, 2, 2, 2, 3, 3]
    return pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "event_id": pa.array(list(range(len(keys))), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("ev", _fixture())
    out = con.execute(sql).df()
    con.close()
    return out


def _cmp(got: pd.DataFrame, want: pd.DataFrame, keys: list[str]):
    got = got.sort_values(keys, ignore_index=True)[want.columns.tolist()]
    want = want.sort_values(keys, ignore_index=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_sessionize_null_ts_matches_sql(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import sessionize

    got = sessionize(
        rd.from_arrow(_fixture()), "user_id", "ts", GAP_US, order_tiebreak_col="event_id"
    ).to_pandas()
    want = _oracle(
        "SELECT user_id, CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > "
        f"{GAP_US} THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions FROM ("
        "SELECT user_id, epoch_us(ts) AS us, LAG(epoch_us(ts)) OVER ("
        "PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us "
        "FROM ev) GROUP BY 1"
    )
    _cmp(got, want, ["user_id"])


def test_session_spans_null_ts_matches_sql(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import session_spans

    got = session_spans(
        rd.from_arrow(_fixture()), "user_id", "ts", GAP_US, tiebreak_col="event_id"
    ).to_pandas()
    want = _oracle(
        "WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM ev), "
        "f AS (SELECT user_id, event_id, us, CASE WHEN LAG(us) OVER w IS NULL "
        f"OR us - LAG(us) OVER w > {GAP_US} THEN 1 ELSE 0 END AS brk "
        "FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
        "s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f) "
        "SELECT user_id, CAST(sid AS BIGINT) AS session_idx, "
        "CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, sid"
    )
    _cmp(got, want, ["user_id", "session_idx"])


def test_rolling_count_null_ts_matches_sql(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import rolling_count

    got = rolling_count(
        rd.from_arrow(_fixture()), "user_id", "ts", GAP_US, tiebreak_col="event_id"
    ).to_pandas()[["user_id", "event_id", "n_in_window"]]
    want = _oracle(
        "SELECT user_id, event_id, CAST(COUNT(*) OVER (PARTITION BY user_id "
        f"ORDER BY epoch_us(ts) RANGE BETWEEN {GAP_US - 1} PRECEDING "
        "AND CURRENT ROW) AS BIGINT) AS n_in_window FROM ev"
    )
    _cmp(got, want, ["user_id", "event_id"])
    assert (got["n_in_window"] > 0).all()  # no negative/garbage counts


def test_late_event_stats_null_ts_matches_sql(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import late_event_stats

    got = late_event_stats(rd.from_arrow(_fixture()), "user_id", "ts", GAP_US).to_pandas()
    want = _oracle(
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late "
        "FROM (SELECT user_id, epoch_us(ts) < "
        f"MAX(epoch_us(ts)) OVER (PARTITION BY user_id) - {GAP_US} AS late "
        "FROM ev) GROUP BY user_id"
    )
    _cmp(got, want, ["user_id"])


def test_lag_delta_null_ts_is_null_delta(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import add_lag_delta

    got = (
        add_lag_delta(rd.from_arrow(_fixture()), "user_id", "ts", tiebreak_col="event_id")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    # key 1 sorted by ts: [1s, 3s, 9s, NaT] → deltas [NULL, 2s, 6s, NULL]
    k1 = got[got["user_id"] == 1].set_index("event_id")["gap"]
    assert np.isnan(k1[0]) and k1[1] == 2e6 and k1[3] == 6e6 and np.isnan(k1[2])
    # all-null key: every delta NULL, never INT64_MIN wrap garbage
    assert got[got["user_id"] == 3]["gap"].isna().all()


def test_colocation_null_operands_drop_like_sql(ray_session):
    """A NULL ts/user/id row never joins (SQL inner self-join), and its
    presence must not perturb the valid rows' pair set: one null ts used
    to launder the batch's ts to float64, and the packed
    ``(cell << 40) + bucket`` key computed in float64 loses low bits above
    2^53 — silently corrupting group routing for every OTHER row."""
    import ray.data as rd

    from geodistpy_ray.kernels import haversine
    from geodistpy_ray.stages.pairs import colocation_pairs

    rng = np.random.default_rng(17)
    n = 200
    # high-cell-id region (lat 50 / lon 100 at cell_deg 0.5 → cell ids
    # ~2e5, packed keys ~2e17 > 2^53) so float64 laundering is fatal
    lat = 50.0 + rng.normal(0, 0.3, n)
    lon = 100.0 + rng.normal(0, 0.3, n)
    W = 3600 * 1_000_000
    ts = rng.integers(0, 48 * W, n)  # 48 one-hour buckets
    users = rng.integers(0, 12, n)
    ids = np.arange(n, dtype=np.int64)

    ts_n = ts.astype(object)
    users_n = users.astype(object)
    nulls = rng.choice(n, 14, replace=False)
    for i, j in enumerate(nulls):
        if i % 2:
            ts_n[j] = None
        else:
            users_n[j] = None
    tbl = pa.table(
        {
            "event_id": pa.array(ids),
            "user_id": pa.array(users_n, pa.int64()),
            "ts": pa.array(
                [None if v is None else int(v) for v in ts_n], pa.timestamp("us")
            ),
            "lat": pa.array(lat),
            "lon": pa.array(lon),
        }
    )
    D = 25_000.0
    got = (
        colocation_pairs(rd.from_arrow(tbl).repartition(3), D, W, cell_deg=0.5)
        .to_pandas()
        .sort_values(["id_left", "id_right"], ignore_index=True)
    )
    # brute force over the null-free rows only
    ok = np.array([ts_n[i] is not None and users_n[i] is not None for i in range(n)])
    d = haversine(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
    dt = np.abs(ts[:, None].astype(np.int64) - ts[None, :].astype(np.int64))
    mask = (
        (d <= D)
        & (dt <= W)
        & (ids[:, None] < ids[None, :])
        & (users[:, None] != users[None, :])
        & ok[:, None]
        & ok[None, :]
    )
    li, ri = np.nonzero(mask)
    want = pd.DataFrame({"id_left": ids[li], "id_right": ids[ri]}).sort_values(
        ["id_left", "id_right"], ignore_index=True
    )
    assert len(want) > 30  # fixture has real pairs to miss
    assert got["id_left"].tolist() == want["id_left"].tolist()
    assert got["id_right"].tolist() == want["id_right"].tolist()


# ---------------------------------------------------------------------------
# Far-future timestamps (> 2^53 µs): every window operator must stay EXACT.
# float64 ulp at year-9999 epochs is 32 µs — any path that rounds timestamp
# OPERANDS through float collapses µs-level gaps; SQL computes on exact
# epoch_us integers throughout.
# ---------------------------------------------------------------------------

T0 = 253_370_764_800_000_000  # 9999-01-01 in µs; ulp(float64(T0)) = 32 µs


def _far_fixture() -> pa.Table:
    ts = [
        T0, T0 + 10, T0 + GAP_US + 11, None,   # key 1: 10 µs, then a break
        T0 + 7, T0 + 8,                         # key 2: 1 µs apart
    ]
    keys = [1, 1, 1, 1, 2, 2]
    return pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "event_id": pa.array(list(range(len(keys))), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def _far_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("ev", _far_fixture())
    out = con.execute(sql).df()
    con.close()
    return out


def test_session_spans_far_future_exact(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import session_spans

    got = session_spans(
        rd.from_arrow(_far_fixture()), "user_id", "ts", GAP_US, tiebreak_col="event_id"
    ).to_pandas()
    want = _far_oracle(
        "WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM ev), "
        "f AS (SELECT user_id, event_id, us, CASE WHEN LAG(us) OVER w IS NULL "
        f"OR us - LAG(us) OVER w > {GAP_US} THEN 1 ELSE 0 END AS brk "
        "FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
        "s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f) "
        "SELECT user_id, CAST(sid AS BIGINT) AS session_idx, "
        "CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, sid"
    )
    _cmp(got, want, ["user_id", "session_idx"])
    # the µs-exact spot check a float detour cannot pass (ulp here is 32 µs)
    k2 = got[got["user_id"] == 2]
    assert int(k2["start_us"].iloc[0]) == T0 + 7
    assert int(k2["end_us"].iloc[0]) == T0 + 8


def test_lag_delta_far_future_exact(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import add_lag_delta

    got = (
        add_lag_delta(rd.from_arrow(_far_fixture()), "user_id", "ts", tiebreak_col="event_id")
        .to_pandas()
        .set_index("event_id")["gap"]
    )
    assert got[1] == 10.0 and got[2] == float(GAP_US + 1) and got[5] == 1.0
    assert np.isnan(got[0]) and np.isnan(got[3]) and np.isnan(got[4])


def test_rolling_count_far_future_exact(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import rolling_count

    got = rolling_count(
        rd.from_arrow(_far_fixture()), "user_id", "ts", GAP_US, tiebreak_col="event_id"
    ).to_pandas()[["user_id", "event_id", "n_in_window"]]
    want = _far_oracle(
        "SELECT user_id, event_id, CAST(COUNT(*) OVER (PARTITION BY user_id "
        f"ORDER BY epoch_us(ts) RANGE BETWEEN {GAP_US - 1} PRECEDING "
        "AND CURRENT ROW) AS BIGINT) AS n_in_window FROM ev"
    )
    _cmp(got, want, ["user_id", "event_id"])


def test_late_event_stats_far_future_exact(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import late_event_stats

    # key 1 max = T0+GAP+11, watermark GAP+1 → late iff us < T0+10: row T0
    # is late, row T0+10 is NOT (equality) — a 32 µs float ulp flips this
    wm = GAP_US + 1
    got = late_event_stats(rd.from_arrow(_far_fixture()), "user_id", "ts", wm).to_pandas()
    want = _far_oracle(
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late "
        "FROM (SELECT user_id, epoch_us(ts) < "
        f"MAX(epoch_us(ts)) OVER (PARTITION BY user_id) - {wm} AS late "
        "FROM ev) GROUP BY user_id"
    )
    _cmp(got, want, ["user_id"])
    assert int(got[got["user_id"] == 1]["n_late"].iloc[0]) == 1


def test_tumbling_window_far_future_exact(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import tumbling_window_agg

    # 16 µs windows: T0 % 16 == 0, so (T0, T0+10) share a key and T0+7/T0+8
    # share one; float64 rounding (ulp 32) would merge or split arbitrarily
    got = tumbling_window_agg(rd.from_arrow(_far_fixture()), "user_id", "ts", 16)
    want = _far_oracle(
        "SELECT user_id, epoch_us(ts) // 16 AS window_key, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2"
    )
    _cmp(got, want, ["user_id", "window_key"])
    k1 = got[(got["user_id"] == 1) & got["window_key"].notna()]
    assert sorted(k1["window_key"].astype(np.int64) * 16 - T0) == [0, GAP_US + 11 - (GAP_US + 11) % 16]
