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
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([1, 2], pa.int64()),
            "lat": pa.array([0.0, 0.0]),
            "lon": pa.array([0.0, 180.0]),
        }
    )
    with pytest.raises(Exception, match="antipodal"):
        densify_tracks(
            rd.from_arrow(t), "k", "ts", max_leg_m=1_000_000.0
        ).to_pandas()
