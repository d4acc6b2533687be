"""Deduplication pipelines for large-scale training data.

Patterns (all Ray-Data-first, deterministic, seed-fixed):

- exact: hash-partitioned group-by-content, first (min id) wins —
  the reference's dedup-by-id / content-hash tile dedup shape
  (clip.cpp:1470-1509, mbtiles.cpp:104-149) applied to documents.
- MinHash + LSH: shingle → k minhashes (splitmix-parameterized) →
  band buckets → groupby(bucket) candidates → exact-Jaccard verify.
- SimHash: 64-bit hyperplane signature, banded for candidate pairs,
  Hamming-verified.
- embedding cosine near-dup: LSH sign-buckets over a seeded gaussian
  projection, in-bucket exact cosine verify.

Shuffle discipline: the only all-to-all moves are groupbys over
(bucket/hash) keys whose values are small integers; candidate
verification happens inside the grouped task. Pair outputs are
(a, b) with a < b, globally sorted and distinct.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64_strings, splitmix64

U64 = np.uint64


# ----------------------------------------------------------------- exact


def exact_dedup(ds: ray.data.Dataset, text_col: str, id_col: str) -> pd.DataFrame:
    """min(id) + count per distinct content. Hash-partition + per-group
    first; result: (keep_id, n_dups) per distinct text."""
    from ..relational.ops import partial_groupby

    out = partial_groupby(
        ds,
        by=[text_col],
        aggs={"keep_id": (id_col, "min"), "n_dups": (id_col, "count")},
    )
    return out[["keep_id", "n_dups"]].sort_values("keep_id").reset_index(drop=True)


# --------------------------------------------------------------- minhash


def _shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per-doc array of distinct k-gram (character shingle) hashes."""
    out = []
    for t in texts:
        t = t or ""
        if len(t) < k:
            out.append(fnv1a64_strings([t]) if t else np.empty(0, dtype=np.uint64))
            continue
        sh = [t[i : i + k] for i in range(len(t) - k + 1)]
        out.append(np.unique(fnv1a64_strings(sh)))
    return out


def minhash_signatures(texts: list[str], num_perm: int = 64, k: int = 5,
                       seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash matrix via splitmix-mixed
    xor-permutations of shingle hashes."""
    salts = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    shingles = _shingle_hashes(texts, k)
    sig = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, sh in enumerate(shingles):
        if len(sh) == 0:
            continue
        # xor-permute then min — vectorized over (shingles × perms)
        m = sh[:, None] ^ salts[None, :]
        m = splitmix64(m)
        sig[i] = m.min(axis=0)
    return sig


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingle_hashes([a, b], k)
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    inter = np.intersect1d(sa, sb).size
    return inter / (len(sa) + len(sb) - inter)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.6,
    seed: int = 42,
) -> pd.DataFrame:
    """Near-duplicate pairs (a < b, exact-Jaccard ≥ threshold).

    Stage 1 (map_batches): signatures + band-bucket keys — one output
    row per (doc, band). Stage 2 (groupby bucket): within-bucket
    candidate pairs, verified by exact Jaccard on the shingle sets.
    """
    rows_per_band = num_perm // bands

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        sig = minhash_signatures(list(df[text_col]), num_perm, k, seed)
        n = len(df)
        recs = {"bucket": [], id_col: [], text_col: []}
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            key = splitmix64(seg[:, 0] + np.uint64(b))
            for j in range(1, rows_per_band):
                key = splitmix64(key ^ seg[:, j])
            recs["bucket"].extend((key >> np.uint64(1)).astype(np.int64).tolist())
            recs[id_col].extend(df[id_col].tolist())
            recs[text_col].extend(df[text_col].tolist())
        return pd.DataFrame(recs)

    bucketed = ds.map_batches(to_buckets, batch_format="pandas")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        shs = _shingle_hashes(g[text_col].tolist(), k)  # once per doc
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            si = shs[i]
            if len(si) == 0:
                continue
            for j in range(i + 1, len(ids)):
                sj = shs[j]
                if len(sj) == 0:
                    continue
                inter = np.intersect1d(si, sj, assume_unique=True).size
                jac = inter / (len(si) + len(sj) - inter)
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(round(jac, 6))
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    pairs = bucketed.groupby("bucket").map_groups(candidates, batch_format="pandas")
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    return pdf.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# --------------------------------------------------------------- simhash


def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit simhash over whitespace tokens (token-hash bit voting)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bitcols = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        h = fnv1a64_strings(toks)
        bits = ((h[:, None] >> bitcols[None, :]) & U64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((votes > 0).astype(np.uint64) << bitcols).sum())
    return out


def simhash_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> pd.DataFrame:
    """Near-dup pairs by simhash: band the 64 bits into `bands` chunks
    (a pair within Hamming ≤ bands-1 shares at least one exact band),
    groupby band value, verify Hamming distance."""
    width = 64 // bands

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(list(df[text_col]))
        recs = {"bucket": [], id_col: [], "sim": []}
        for b in range(bands):
            part = (sh >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            key = (part.astype(np.int64) << 3) | b
            recs["bucket"].extend(key.tolist())
            recs[id_col].extend(df[id_col].tolist())
            recs["sim"].extend(sh.astype(np.int64).tolist())
        return pd.DataFrame(recs)

    bucketed = ds.map_batches(to_buckets, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sims = g["sim"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = sims[i] ^ sims[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for jrel in np.flatnonzero(ham <= max_hamming):
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + jrel]))
                out_h.append(int(ham[jrel]))
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    pairs = ds_groupby_pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return pdf.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# --------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    """Cosine near-duplicates via sign-LSH buckets + in-bucket verify.
    Multi-probe: each vector is assigned to its bucket and to the
    buckets at Hamming distance 1 (sign near zero margins excluded for
    determinism), bounding recall loss."""
    rs = np.random.RandomState(seed)
    planes_holder = {}

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[vec_col].to_numpy())
        dim = vecs.shape[1]
        if "p" not in planes_holder:
            planes_holder["p"] = np.random.RandomState(seed).randn(dim, n_planes)
        planes = planes_holder["p"]
        proj = vecs @ planes
        signs = (proj > 0).astype(np.int64)
        key = np.zeros(len(df), dtype=np.int64)
        for j in range(n_planes):
            key = (key << 1) | signs[:, j]
        norms = np.linalg.norm(vecs, axis=1)
        unit = vecs / np.maximum(norms, 1e-12)[:, None]
        recs = {
            "bucket": key.tolist(),
            id_col: df[id_col].tolist(),
            "unit": [u.astype(np.float32) for u in unit],
        }
        # probe neighboring buckets (flip each bit once)
        all_b = list(recs["bucket"])
        all_i = list(recs[id_col])
        all_u = list(recs["unit"])
        for j in range(n_planes):
            recs["bucket"].extend([b ^ (1 << j) for b in all_b])
            recs[id_col].extend(all_i)
            recs["unit"].extend(all_u)
        return pd.DataFrame(recs)

    bucketed = ds.map_batches(to_buckets, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = np.stack(g["unit"].to_numpy())
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        mask = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "a": ids[ii[mask]],
                "b": ids[jj[mask]],
                "cosine": np.round(sims[ii[mask], jj[mask]], 6),
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"a": [], "b": [], "cosine": []})
    return pdf.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
