"""Ordered prefix-sum + sequence packing vs numpy/pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodistpy_ray.stages.pack import ordered_prefix_sum, pack_assignments


def _prefix_oracle(ids, vals):
    order = np.argsort(ids, kind="mergesort")
    cum = np.zeros(len(ids), dtype=np.int64)
    cum[order] = np.concatenate(([0], np.cumsum(np.asarray(vals)[order])[:-1]))
    return dict(zip(ids, cum))


class TestOrderedPrefixSum:
    def test_matches_numpy_cumsum(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        ids = rng.permutation(500).astype(np.int64)  # shuffled arrival order
        vals = rng.integers(0, 100, 500).astype(np.int64)
        tab = pa.table({"k": ids, "v": vals})
        out = ordered_prefix_sum(
            rd.from_arrow(tab).repartition(7), "k", "v", n_parts=8
        ).to_pandas()
        exp = _prefix_oracle(ids, vals)
        assert len(out) == 500
        for k, c in zip(out["k"], out["cum_before"]):
            assert c == exp[k]

    def test_partition_independence(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        ids = rng.permutation(300).astype(np.int64) * 7 - 50  # sparse, negative lo
        vals = rng.integers(1, 10, 300).astype(np.int64)
        tab = pa.table({"k": ids, "v": vals})
        a = ordered_prefix_sum(rd.from_arrow(tab), "k", "v", n_parts=4).to_pandas()
        b = ordered_prefix_sum(
            rd.from_arrow(tab).repartition(13), "k", "v", n_parts=16
        ).to_pandas()
        a = a.sort_values("k", ignore_index=True)
        b = b.sort_values("k", ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_like=True)

    def test_duplicate_ids_raise(self, ray_session):
        import ray.data as rd

        tab = pa.table(
            {"k": pa.array([1, 2, 2, 3], pa.int64()), "v": pa.array([1, 1, 1, 1], pa.int64())}
        )
        with pytest.raises(Exception, match="duplicate"):
            ordered_prefix_sum(rd.from_arrow(tab), "k", "v", n_parts=2).materialize()

    def test_single_row_and_constant_ids_range(self, ray_session):
        import ray.data as rd

        tab = pa.table({"k": pa.array([42], pa.int64()), "v": pa.array([9], pa.int64())})
        out = ordered_prefix_sum(rd.from_arrow(tab), "k", "v").to_pandas()
        assert out["cum_before"].tolist() == [0]


class TestPackAssignments:
    def test_spans_and_boundaries(self, ray_session):
        import ray.data as rd

        # doc 1: 3 tokens [0,3) → pack 0; doc 2: 4 tokens [3,7) → spans
        # packs 0-1 with seq_len=4; doc 3: empty (dropped); doc 4: 5 tokens
        # [7,12) → packs 1-2
        tab = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["a b c", "d e f g", "", "h i j k l"],
            }
        )
        out = (
            pack_assignments(rd.from_arrow(tab), seq_len=4, n_parts=2)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 4]
        assert out["tok_start"].tolist() == [0, 3, 7]
        assert out["pack_first"].tolist() == [0, 0, 1]
        assert out["pack_last"].tolist() == [0, 1, 2]

    def test_total_tokens_conserved(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        texts = [" ".join("t" * 1 for _ in range(int(k))) for k in rng.integers(0, 9, 80)]
        tab = pa.table(
            {"doc_id": pa.array(np.arange(80), pa.int64()), "text": texts}
        )
        out = (
            pack_assignments(rd.from_arrow(tab).repartition(5), seq_len=7)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # offsets tile the token stream exactly: each doc starts where the
        # previous one ended
        ends = (out["tok_start"] + out["n_tokens"]).to_numpy()
        assert out["tok_start"].iloc[0] == 0
        assert (out["tok_start"].to_numpy()[1:] == ends[:-1]).all()


def test_empty_input_keeps_schema(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geodistpy_ray.stages.pack import pack_assignments

    tab = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    out = pack_assignments(rd.from_arrow(tab), seq_len=8).to_pandas()
    assert len(out) == 0
