#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)
and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec + throughputs...}, "sf": ..., "num_cpus": N}

--scaling: run the headline pyramid twice in fresh processes
(num_cpus=8 then 32) on the same input, print both throughputs and the
scaling efficiency, and append the measurement to BASELINE.md
(BASELINE.md §scaling protocol; mirrors the reference's parallel-test
invariance, Makefile:220-245 — outputs are checked identical).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def headline_pyramid(sf_dir: str):
    """Full z0–z14 drop-ladder pyramid with MVT encoding over points
    derived from lineitem (one point per line item, LCG geotag)."""
    import pyarrow as pa
    import numpy as np
    import ray.data

    from tippecanoe_ray.pipelines.pyramid import (
        PyramidConfig,
        build_pyramid_from_narrow,
        geotag_narrow,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        key = (
            t["l_orderkey"].to_numpy(zero_copy_only=False) * 8
            + t["l_linenumber"].to_numpy(zero_copy_only=False)
        )
        return pa.table({"key": key})

    keys = ds.map_batches(keyed, batch_format="pyarrow")
    cfg = PyramidConfig(maxzoom=14, droprate=2.5, rule="lcg", id_col="key", seq_col=None)
    narrow = geotag_narrow(keys, cfg)
    tiles = build_pyramid_from_narrow(narrow, cfg)
    stats = tiles.select_columns(["z", "n_features"]).to_pandas()
    n_tiles = len(stats)
    n_feats = int(stats[stats["z"] == 14]["n_features"].sum())
    return n_tiles, n_feats, int(stats["n_features"].sum())


def run_bench(headline_only: bool = False) -> dict:
    _init_ray()
    sf_dir = SF_DIR
    queries: dict[str, float] = {}

    t0 = time.time()
    n_tiles, n_feats, total_feats = headline_pyramid(sf_dir)
    t_pyr = time.time() - t0
    queries["pyramid_z14"] = round(t_pyr, 3)
    queries["pyramid_tiles_per_sec"] = round(n_tiles / t_pyr, 1)
    queries["pyramid_feats_per_sec"] = round(n_feats / t_pyr, 1)

    if not headline_only:
        from tippecanoe_ray.pipelines import queries as Q

        for name, fn in [
            ("q1_pricing", Q.q1_pricing),
            ("q3_top_orders", Q.q3_top_orders),
            ("q5_region_revenue", Q.q5_region_revenue),
            ("dedup_exact", Q.dedup_exact_union),
            ("minhash_lsh", Q.minhash_pairs_q),
            ("ann_top10", Q.ann_top10),
            ("token_stats", Q.token_stats_q),
            ("sessions_30m", Q.sessions_30m),
        ]:
            t0 = time.time()
            fn(sf_dir)
            queries[name] = round(time.time() - t0, 3)

    total = sum(v for k, v in queries.items() if not k.endswith("_per_sec"))
    return {
        "metric": "tiles/sec + features/sec, full z0-z14 drop-ladder pyramid "
        "+ query battery wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "n_tiles": n_tiles,
        "n_features_z14": n_feats,
        "sf": _sf_of(sf_dir),
        "num_cpus": NUM_CPUS,
    }


def run_scaling():
    """N vs 4N parallelism in fresh processes; efficiency = T(N)/T(4N)/4
    in throughput terms."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        out = subprocess.run(
            [sys.executable, __file__, "--headline-only"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["n_tiles"] / results[8]["queries"]["pyramid_z14"]
    thr32 = results[32]["n_tiles"] / results[32]["queries"]["pyramid_z14"]
    eff = thr32 / (4 * thr8)
    same_tiles = results[8]["n_tiles"] == results[32]["n_tiles"] and (
        results[8]["n_features_z14"] == results[32]["n_features_z14"]
    )
    summary = {
        "metric": "scaling efficiency, pyramid z0-z14, 8 -> 32 cpus",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "tiles_per_sec_8cpu": round(thr8, 1),
            "tiles_per_sec_32cpu": round(thr32, 1),
            "sec_8cpu": results[8]["queries"]["pyramid_z14"],
            "sec_32cpu": results[32]["queries"]["pyramid_z14"],
        },
        "output_identical": same_tiles,
        "sf": results[32]["sf"],
        "num_cpus": 32,
    }
    print(json.dumps(summary))
    _append_baseline(summary)


def _append_baseline(summary: dict):
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.md"), "a") as f:
            f.write(
                f"\n\n## Measured scaling run ({time.strftime('%Y-%m-%d %H:%M')})\n\n"
                f"- 8 cpus: {summary['queries']['sec_8cpu']} s "
                f"({summary['queries']['tiles_per_sec_8cpu']} tiles/s)\n"
                f"- 32 cpus: {summary['queries']['sec_32cpu']} s "
                f"({summary['queries']['tiles_per_sec_32cpu']} tiles/s)\n"
                f"- efficiency(8→32) = {summary['value']}"
                f" (target ≥ 0.8); outputs identical: {summary['output_identical']}\n"
            )
    except OSError:
        pass


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        res = run_bench(headline_only="--headline-only" in sys.argv)
        print(json.dumps(res))
        import ray

        ray.shutdown()
