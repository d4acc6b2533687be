"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k — broadcast query matrix
  (ray.put once), per-batch numpy matmul, per-batch local top-k,
  driver merge of k rows per batch. The baseline and the oracle-
  checkable path (DuckDB list_cosine_similarity).
- lsh_topk: sign-LSH bucketed approximate variant — the scale path:
  only vectors sharing (or neighboring) the query's bucket are scored.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: list | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k per query. Returns (query_id, vec_id, cosine)
    sorted by (query_id, -cosine, vec_id)."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = q / np.maximum(np.linalg.norm(q, axis=1), 1e-12)[:, None]
    qref = ray.put(qn)
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        mat = _as_matrix(df[vec_col].to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None]
        sims = mat @ qm.T  # (n, nq)
        ids = df[id_col].to_numpy()
        outs = []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            part = np.argpartition(-s, kk - 1)[:kk]
            outs.append(
                pd.DataFrame(
                    {"query_id": qids[qi], id_col: ids[part], "cosine": s[part]}
                )
            )
        return pd.concat(outs, ignore_index=True)

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    outs = []
    for qi in qids:
        sub = parts[parts["query_id"] == qi]
        sub = sub.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        outs.append(sub)
    out = pd.concat(outs, ignore_index=True)
    out["cosine"] = out["cosine"].round(6)
    return out.reset_index(drop=True)


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
    query_ids: list | None = None,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """Approximate top-k via the sign-LSH partitioned index: delegates
    to build_lsh_index + lsh_topk_indexed so every caller gets the
    pruned-read path (only Hamming<=1 bucket partitions are scanned).
    Pass index_dir to reuse a persisted index across queries; otherwise
    a throwaway index is built under /tmp for this call (same total IO
    as one scan, and the pruned layout is what survives at scale)."""
    import os
    import tempfile

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if index_dir is not None and os.path.isdir(index_dir) and any(
        name.startswith("bucket=") for name in os.listdir(index_dir)
    ):
        return lsh_topk_indexed(
            index_dir, q, k, vec_col=vec_col, id_col=id_col,
            n_planes=n_planes, seed=seed, query_ids=query_ids, dim=q.shape[1],
        )
    own = index_dir or tempfile.mkdtemp(prefix="lsh_index_")
    build_lsh_index(ds, own, vec_col=vec_col, id_col=id_col,
                    n_planes=n_planes, seed=seed)
    return lsh_topk_indexed(
        own, q, k, vec_col=vec_col, id_col=id_col,
        n_planes=n_planes, seed=seed, query_ids=query_ids, dim=q.shape[1],
    )


# ------------------------------------------------------ persisted LSH index


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (mat @ planes > 0).astype(np.int64)
    key = np.zeros(len(mat), dtype=np.int64)
    for j in range(planes.shape[1]):
        key = (key << 1) | signs[:, j]
    return key


def build_lsh_index(
    ds: ray.data.Dataset,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
) -> str:
    """Persist the embedding table as parquet PARTITIONED BY its
    sign-LSH bucket — one directory per bucket, so a query reads only
    its Hamming-neighborhood partitions (real pruned read, not a full
    scan). At 10^12 rows this is the difference between touching
    ~n/2^planes rows and touching n."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        mat = _as_matrix(df[vec_col].to_numpy())
        planes = np.random.RandomState(seed).randn(mat.shape[1], n_planes)
        out = df[[id_col, vec_col]].copy()
        out["bucket"] = _bucket_of(mat, planes)
        return out

    ds.map_batches(add_bucket, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def lsh_topk_indexed(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
    query_ids: list | None = None,
    dim: int | None = None,
) -> pd.DataFrame:
    """Approximate top-k over a build_lsh_index output: compute the
    query buckets, enumerate their Hamming≤1 neighbors, and
    read_parquet ONLY those bucket partitions."""
    import os

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = q / np.maximum(np.linalg.norm(q, axis=1), 1e-12)[:, None]
    planes = np.random.RandomState(seed).randn(dim or q.shape[1], n_planes)
    qb = _bucket_of(qn, planes)
    want: set[int] = set()
    for b in qb:
        want.add(int(b))
        for j in range(n_planes):
            want.add(int(b) ^ (1 << j))
    import glob as _glob

    paths = []
    for b in sorted(want):
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return pd.DataFrame({"query_id": [], id_col: [], "cosine": []})
    pruned = ray.data.read_parquet(paths)
    return brute_force_topk(pruned, q, k, vec_col=vec_col, id_col=id_col, query_ids=query_ids)
