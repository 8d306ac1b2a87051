"""Resumable execution: interrupted run + resume ≡ uninterrupted run."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geodistpy_ray.state import FragmentRunner, read_manifest


@pytest.fixture()
def fragmented_input(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for frag in range(4):
        ids = list(range(frag * 100, frag * 100 + 100))
        pq.write_table(
            pa.table({"doc_id": ids, "text": [f"text-{i}" for i in ids]}),
            src / f"frag-{frag:02d}.parquet",
        )
    return str(src)


def _pipeline(ds):
    from geodistpy_ray.stages import add_cell, add_geocode

    return add_cell(add_geocode(ds), 2.0)


def _collect(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "fragment=*", "*.parquet")))
    return (
        pd.concat([pq.read_table(f).to_pandas() for f in files])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestResume:
    def test_partial_then_resume_equals_full(self, ray_session, fragmented_input, tmp_path):
        out_a = str(tmp_path / "out_a")
        out_b = str(tmp_path / "out_b")

        # uninterrupted run
        full = FragmentRunner(_pipeline, out_a).run(f"{fragmented_input}/*.parquet")
        assert full["completed"] == 4

        # interrupted: stop after 2 fragments, then resume
        r = FragmentRunner(_pipeline, out_b)
        first = r.run(f"{fragmented_input}/*.parquet", max_fragments=2)
        assert first["completed"] == 2
        resumed = r.run(f"{fragmented_input}/*.parquet")
        assert resumed["completed"] == 4
        assert resumed["ran_now"] == 2  # only the remaining fragments ran

        pd.testing.assert_frame_equal(_collect(out_a), _collect(out_b))

    def test_manifest_records_lineage(self, ray_session, fragmented_input, tmp_path):
        out = str(tmp_path / "out_m")
        FragmentRunner(_pipeline, out, epoch=3).run(f"{fragmented_input}/*.parquet")
        man = read_manifest(out)
        assert len(man) == 4
        rec = next(iter(man.values()))
        assert rec["epoch"] == 3
        assert rec["rows"] == 100
        assert "wall_sec" in rec

    def test_epoch_bump_recomputes(self, ray_session, fragmented_input, tmp_path):
        out = str(tmp_path / "out_e")
        FragmentRunner(_pipeline, out, epoch=0).run(f"{fragmented_input}/*.parquet")
        again = FragmentRunner(_pipeline, out, epoch=1).run(f"{fragmented_input}/*.parquet")
        assert again["ran_now"] == 4

    def test_stale_tmp_dir_ignored(self, ray_session, fragmented_input, tmp_path):
        out = str(tmp_path / "out_t")
        os.makedirs(os.path.join(out, "fragment=frag-00.tmp"))
        res = FragmentRunner(_pipeline, out).run(f"{fragmented_input}/*.parquet")
        assert res["completed"] == 4
