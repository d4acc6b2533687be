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
) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose sign-LSH bucket is
    within Hamming ≤ 1 of the query's bucket. At 10^12 scale the bucket
    map is a partition pruning predicate pushed to the read."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = q / np.maximum(np.linalg.norm(q, axis=1), 1e-12)[:, None]
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    def bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
        signs = (mat @ planes > 0).astype(np.int64)
        key = np.zeros(len(mat), dtype=np.int64)
        for j in range(planes.shape[1]):
            key = (key << 1) | signs[:, j]
        return key

    state = {}
    qref = ray.put(qn)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        mat = _as_matrix(df[vec_col].to_numpy())
        if "planes" not in state:
            state["planes"] = np.random.RandomState(seed).randn(mat.shape[1], n_planes)
        planes = state["planes"]
        vb = bucket_of(mat, planes)
        qb = bucket_of(qm, planes)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None]
        ids = df[id_col].to_numpy()
        outs = []
        for qi in range(qm.shape[0]):
            ham = np.array([bin(int(b) ^ int(qb[qi])).count("1") for b in vb])
            cand = np.flatnonzero(ham <= 1)
            if len(cand) == 0:
                continue
            s = matn[cand] @ qm[qi]
            kk = min(k, len(cand))
            part = np.argpartition(-s, kk - 1)[:kk]
            outs.append(
                pd.DataFrame(
                    {"query_id": qids[qi], id_col: ids[cand[part]], "cosine": s[part]}
                )
            )
        if not outs:
            return pd.DataFrame({"query_id": [], id_col: [], "cosine": []})
        return pd.concat(outs, ignore_index=True)

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    outs = []
    for qi in qids:
        sub = parts[parts["query_id"] == qi]
        sub = sub.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        outs.append(sub)
    out = pd.concat(outs, ignore_index=True) if outs else parts
    out["cosine"] = out["cosine"].round(6)
    return out.reset_index(drop=True)
