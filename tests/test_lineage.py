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

    def test_read_columns_prunes_fragment_reads(self, ray_session, fragmented_input, tmp_path):
        """read_columns must reach the fragment read: the pipeline sees ONLY
        the requested columns (dead payload bytes never enter the stream)."""
        out = str(tmp_path / "out_c")
        seen = []

        def probe(ds):
            seen.append(set(ds.schema().names))
            return ds

        FragmentRunner(probe, out, read_columns=["doc_id"]).run(
            f"{fragmented_input}/*.parquet", max_fragments=1
        )
        assert seen == [{"doc_id"}]


def test_flagship_through_sink_matches_direct(ray_session, tmp_path):
    """entry()'s sink path: per-fragment checkpointed counts rolled up by a
    final SUM must equal the direct in-memory flagship aggregate, and the
    second runner pass must be a byte-identical no-op."""
    import hashlib

    import ray.data as rd
    from ray.data.aggregate import Sum

    from geodistpy_ray.pipelines import flagship_pipeline, flagship_transform

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "flagship")
    runner = FragmentRunner(
        lambda ds: flagship_transform(ds, cell_deg=2.0), out, read_columns=["doc_id"]
    )
    runner.run(f"{sf}/documents.parquet")

    def sig():
        return {
            p: hashlib.blake2b(open(p, "rb").read(), digest_size=16).hexdigest()
            for p in sorted(glob.glob(f"{out}/fragment=*/*.parquet"))
        }

    s1 = sig()
    second = runner.run(f"{sf}/documents.parquet")
    assert second["ran_now"] == 0 and sig() == s1

    rolled = (
        rd.read_parquet(sorted(glob.glob(f"{out}/fragment=*")))
        .groupby("cell")
        .aggregate(Sum("n_matches", alias_name="n_matches"))
        .to_pandas()
        .sort_values("cell", ignore_index=True)
    )
    direct = (
        flagship_pipeline(sf, cell_deg=2.0).to_pandas().sort_values("cell", ignore_index=True)
    )
    pd.testing.assert_frame_equal(rolled, direct)
