"""Engine-vs-DuckDB parity for the SQL oracles the driver gates on.

This mirrors the driver's CORRECTNESS comparison (row count, sorted
column names, sorted values) at sf0.001 for the oracles that encode
nontrivial ALGORITHM models rather than plain relational SQL — the
ones most likely to drift if the engine's kernels change:

- simhash_pairs: the 64-bit signature model (tokens, FNV votes, sign)
- lsh_ann_top10: the pruned sign-LSH read (planes, buckets, probes)
- embedding_near_dup: fp32-jitter parity + brute-force cosine
- image_pyramid: geotag + snapping + inclusive bounds + rate ladder
  as a recursive CTE + first-feature-per-tile keep
- cluster_tiles: the -K greedy previous-survivor walk
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data  # noqa: F401

SF = "/root/testdata/sf0.001"

ALGO_ORACLES = [
    "simhash_pairs",
    "phash_near_dup",
    "ngram_jaccard_pairs",
    "lsh_ann_top10",
    "ivf_ann_top10",
    "embedding_near_dup",
    "image_pyramid",
    "cluster_tiles",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ALGO_ORACLES)
def test_algorithm_oracle_parity(ray_session, name):
    from tippecanoe_ray.pipelines.queries import all_oracle_sql, all_queries

    q = all_queries()[name]
    sql = all_oracle_sql()[name]
    res = q(SF)
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    con = duckdb.connect()
    con.execute("PRAGMA threads=2")
    for t in ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    ora = con.execute(sql).fetchdf()
    assert len(res) == len(ora), f"{name}: {len(res)} vs {len(ora)} rows"
    assert sorted(res.columns) == sorted(ora.columns)
    a, b = _norm(res), _norm(ora)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
