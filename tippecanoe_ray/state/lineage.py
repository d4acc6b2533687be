"""Checkpoint / lineage / metrics for persisted pyramid runs
(north_rule: every partition records lineage and metrics so a killed
run resumes from checkpoint without recomputing completed tiles).

On-disk layout written by build_pyramid(..., out_dir=...):

  out_dir/raw/bucket=N/part-0.parquet   completed zoom-B partitions
                                        (written atomically: .inprogress
                                        then os.replace — presence marks
                                        the partition done)
  out_dir/channels.parquet              per-partition channel rows:
                                        kind=1 low-zoom survivor blobs,
                                        kind=2 boundary side copies,
                                        kind=3 per-zoom (n_tiles,
                                        n_features) summaries = the
                                        partition metrics, kind=4
                                        threshold-consensus reports
  out_dir/lowzoom.parquet, patch.parquet, patch_old.parquet
                                        derived small passes

Resume = anti-join of the bucket work-list against the completed
partition set (build_pyramid_from_narrow(resume=True)).
"""

from __future__ import annotations

import os

import pandas as pd


def completed_buckets(out_dir: str) -> set[int]:
    raw = os.path.join(out_dir, "raw")
    done = set()
    if os.path.isdir(raw):
        for name in os.listdir(raw):
            if name.startswith("bucket=") and os.path.exists(
                os.path.join(raw, name, "part-0.parquet")
            ):
                done.add(int(name.split("=", 1)[1]))
    return done


def lineage_report(out_dir: str) -> pd.DataFrame:
    """Per-partition metrics: bucket, zooms covered, tiles, features —
    straight from the persisted channel rows."""
    import pyarrow.parquet as pq

    chan = pq.read_table(os.path.join(out_dir, "channels.parquet")).to_pandas()
    summ = chan[chan["kind"] == 3]
    g = summ.groupby("bucket").agg(
        zooms=("z", "nunique"),
        n_tiles=("x", "sum"),
        n_features=("n_features", "sum"),
    )
    g["completed"] = True
    return g.reset_index()


def run_metrics(out_dir: str) -> dict:
    rep = lineage_report(out_dir)
    return {
        "n_partitions": int(len(rep)),
        "n_tiles": int(rep["n_tiles"].sum()),
        "n_features": int(rep["n_features"].sum()),
        "completed": int(rep["completed"].sum()),
    }
