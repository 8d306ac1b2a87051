"""Per-partition lineage + resumable checkpointed execution.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The unit of work is an *input fragment* (one parquet
file of the fragmented input table). For each fragment the runner:

1. skips it if the manifest already records it (resume = anti-join of
   fragments vs manifest),
2. runs the pipeline ``Dataset -> Dataset`` on just that fragment,
3. writes the output to a fragment-scoped directory **atomically**
   (tmp dir + rename), and
4. appends a manifest line with lineage (fragment path, epoch, output
   path, row count, wall time) — the per-partition metrics record.

A killed run leaves at most one un-renamed tmp dir (ignored on resume);
re-running completes the remaining fragments and yields byte-identical
output to an uninterrupted run (tested in ``tests/test_lineage.py``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST.jsonl")


def read_manifest(out_dir: str) -> dict[str, dict]:
    """fragment path → lineage record for all completed fragments."""
    done = {}
    mp = _manifest_path(out_dir)
    if os.path.exists(mp):
        with open(mp) as fh:
            for line in fh:
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    # torn trailing line from a kill mid-append: that
                    # fragment simply reruns (its output dir rename is
                    # atomic, so rerunning is safe)
                    continue
                done[rec["fragment"]] = rec
    return done


class FragmentRunner:
    """Run a Dataset pipeline per input fragment with resumable output.

    Parameters
    ----------
    pipeline : Callable[[ray.data.Dataset], ray.data.Dataset]
        The transform applied to each fragment's Dataset.
    out_dir : str
        Output root; one ``fragment=<stem>/`` parquet dir per fragment.
    epoch : int
        Checkpoint epoch recorded in lineage (bump to force recompute).
    """

    def __init__(self, pipeline, out_dir: str, epoch: int = 0, read_columns=None):
        self.pipeline = pipeline
        self.out_dir = out_dir
        self.epoch = epoch
        # prune at the read: a fragment read that loads every column for a
        # narrow transform ships dead bytes through the whole pipeline
        self.read_columns = list(read_columns) if read_columns is not None else None
        os.makedirs(out_dir, exist_ok=True)

    def run(self, input_glob: str, max_fragments: int | None = None) -> dict:
        """Process all (or the first ``max_fragments``) pending fragments."""
        import ray.data as rd

        fragments = sorted(glob.glob(input_glob))
        done = read_manifest(self.out_dir)
        # stale epoch → recompute everything
        done = {k: v for k, v in done.items() if v.get("epoch") == self.epoch}
        pending = [f for f in fragments if f not in done]
        if max_fragments is not None:
            pending = pending[:max_fragments]

        for frag in pending:
            t0 = time.perf_counter()
            ds = rd.read_parquet(frag, columns=self.read_columns)
            out = self.pipeline(ds)
            stem = os.path.splitext(os.path.basename(frag))[0]
            final_dir = os.path.join(self.out_dir, f"fragment={stem}")
            tmp_dir = final_dir + ".tmp"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)  # leftover from a killed run
            out.write_parquet(tmp_dir)
            if os.path.exists(final_dir):
                shutil.rmtree(final_dir)
            os.rename(tmp_dir, final_dir)

            # row count from written files' metadata (no data re-read)
            import pyarrow.parquet as pq

            n_rows = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(final_dir, "*.parquet"))
            )
            rec = {
                "fragment": frag,
                "epoch": self.epoch,
                "out": final_dir,
                "rows": n_rows,
                "wall_sec": round(time.perf_counter() - t0, 4),
            }
            mp = _manifest_path(self.out_dir)
            # self-heal a torn trailing line (kill mid-append leaves no
            # newline; appending directly would concatenate records)
            needs_nl = os.path.exists(mp) and os.path.getsize(mp) > 0
            if needs_nl:
                with open(mp, "rb") as fh:
                    fh.seek(-1, os.SEEK_END)
                    needs_nl = fh.read(1) != b"\n"
            with open(mp, "a") as fh:
                if needs_nl:
                    fh.write("\n")
                fh.write(json.dumps(rec) + "\n")

        done_now = {
            k: v
            for k, v in read_manifest(self.out_dir).items()
            if v.get("epoch") == self.epoch
        }
        return {
            "total_fragments": len(fragments),
            "completed": len(done_now),
            "ran_now": len(pending),
        }
