"""Round-5 review-batch regressions: null-key windows, antipodal densify."""

import numpy as np
import pyarrow as pa
import pytest


def test_sessionize_and_late_stats_keep_null_keys(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import late_event_stats, sessionize

    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + np.array([0, 10_000_000, 100_000_000, 0, 50_000_000]).astype(
        "timedelta64[us]"
    )
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, None, None], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    sess = sessionize(rd.from_arrow(t), "k", "ts", gap_us=20_000_000).to_pandas()
    assert len(sess) == 2  # the NULL key forms ONE group like SQL
    byk = sess.set_index("k")["n_sessions"]
    assert byk.loc[1.0] == 2
    assert sess[sess["k"].isna()]["n_sessions"].iloc[0] == 2

    late = late_event_stats(
        rd.from_arrow(t), "k", "ts", watermark_us=60_000_000
    ).to_pandas()
    assert late["n_events"].sum() == 5  # no silent null-key row loss


def test_densify_tracks_refuses_antipodal_leg(ray_session):
    import ray.data as rd

    from geodistpy_ray.stages.windows import densify_tracks

    t = pa.table(
        {
            "trk": pa.array([1, 1], pa.int64()),
            "ts": pa.array([1, 2], pa.int64()),
            "lat": pa.array([0.0, 0.0]),
            "lon": pa.array([0.0, 180.0]),
        }
    )
    with pytest.raises(Exception, match="antipodal"):
        densify_tracks(
            rd.from_arrow(t), "trk", "ts", max_leg_m=1_000_000.0
        ).to_pandas()


def test_track_ops_keep_null_key_group(ray_session):
    """geodesic_track_length / densify_tracks / add_lag_delta /
    session_spans must treat null keys as ONE SQL-style partition — the
    raw == adjacent compare was NaN-blind after int64->float64 laundering
    and either zeroed the group's legs (then crashed the int64 key cast)
    or split it into singleton sessions."""
    import ray.data as rd

    from geodistpy_ray.stages.windows import (
        add_lag_delta,
        densify_tracks,
        geodesic_track_length,
        session_spans,
    )

    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + np.arange(4).astype("timedelta64[us]") * 1_000_000
    # two keys: 7 (control) and NULL, identical 2-point tracks
    t = pa.table(
        {
            "k": pa.array([7, 7, None, None], pa.int64()),
            "ts": pa.array(np.tile(ts[:2], 2), pa.timestamp("us")),
            "lat": pa.array([0.0, 1.0, 0.0, 1.0]),
            "lon": pa.array([0.0, 1.0, 0.0, 1.0]),
        }
    )
    tl = geodesic_track_length(rd.from_arrow(t), "k", "ts").to_pandas()
    assert len(tl) == 2
    null_row = tl[tl["k"].isna()].iloc[0]
    ctrl_row = tl[tl["k"] == 7].iloc[0]
    assert null_row["n_legs"] == 1 and null_row["track_mm"] == ctrl_row["track_mm"] > 0

    # densify outputs its own 'k' (insert index) column — key must differ
    td = t.rename_columns(["trk", "ts", "lat", "lon"])
    with pytest.raises(ValueError, match="collides"):
        densify_tracks(rd.from_arrow(t), "k", "ts", max_leg_m=100_000.0)
    dz = densify_tracks(rd.from_arrow(td), "trk", "ts", max_leg_m=100_000.0).to_pandas()
    n_null = int(dz["trk"].isna().sum())
    n_ctrl = int((dz["trk"] == 7).sum())
    assert n_null == n_ctrl > 0  # identical legs densify identically

    ld = add_lag_delta(rd.from_arrow(t), "k", "ts").to_pandas()
    null_deltas = ld[ld["k"].isna()]["gap"].dropna()
    assert len(null_deltas) == 1 and null_deltas.iloc[0] == 1e6

    ss = session_spans(rd.from_arrow(t), "k", "ts", gap_us=10_000_000).to_pandas()
    assert len(ss) == 2  # one session per key, not one per null row
    nr = ss[ss["k"].isna()]
    assert len(nr) == 1 and nr.iloc[0]["n_events"] == 2 and nr.iloc[0]["session_idx"] == 1


def test_window_aggs_keep_null_timestamps(ray_session):
    """A null ts must become a NULL window key (SQL's epoch_us(NULL)//w),
    grouped like any other — not an ArrowInvalid NaN->int64 crash."""
    import ray.data as rd

    from geodistpy_ray.stages.windows import hopping_window_agg, tumbling_window_agg

    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = [base, base + np.timedelta64(30, "s"), None, None]
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    tw = tumbling_window_agg(rd.from_arrow(t), "k", "ts", window_us=60_000_000)
    assert int(tw["n"].sum()) == 4
    assert int(tw[tw["window_key"].isna()]["n"].sum()) == 2

    hw = hopping_window_agg(
        rd.from_arrow(t), "k", "ts", window_us=120_000_000, hop_us=60_000_000
    )
    # every event lands in window_us/hop_us = 2 windows, null ts -> 2 NULL-key rows
    assert int(hw["n"].sum()) == 8
    assert int(hw[hw["window_key"].isna()]["n"].sum()) == 4
