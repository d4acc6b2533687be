"""Image-table curation operators (input_hint schema: image_id, bytes,
w, h, fmt, caption, phash).

``assign_aspect_buckets``: resolution-bucket assignment — the packing
step image-training pipelines use so a batch holds same-shape tensors
(each image goes to the bucket whose aspect ratio is nearest in log
space). The distance argmin is computed on exact integer
cross-products: for bucket p:q the misfit factor is
max(w*q, h*p) / min(w*q, h*p), so ties happen only at mathematically
equal ratios and break to the smaller bucket index — reproducible in
SQL with the same arithmetic (the rationals involved differ by far
more than a float64 ulp, so the DOUBLE division used for ordering is
exact in effect). Shuffle-free map_batches over (w, h) only — pixels
never move."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

# (p, q): target aspect w:h — the SDXL-style ladder from 1:4 to 4:1
ASPECT_BUCKETS = [(1, 4), (1, 2), (3, 4), (1, 1), (4, 3), (2, 1), (4, 1)]


def bucket_labels() -> list[str]:
    return [f"{p}:{q}" for p, q in ASPECT_BUCKETS]


def assign_aspect_buckets(ds: ray.data.Dataset,
                          w_col: str = "w", h_col: str = "h",
                          out_col: str = "bucket") -> ray.data.Dataset:
    labels = bucket_labels()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        w = df[w_col].to_numpy().astype(np.int64)
        h = df[h_col].to_numpy().astype(np.int64)
        best = np.zeros(len(df), dtype=np.int64)
        best_f = np.full(len(df), np.inf)
        for i, (p, q) in enumerate(ASPECT_BUCKETS):
            a = w * q
            b = h * p
            f = np.maximum(a, b) / np.minimum(a, b)
            take = f < best_f  # strict: ties keep the earlier bucket
            best[take] = i
            best_f = np.minimum(best_f, f)
        df = df.copy()
        df[out_col] = pd.Series(
            [labels[i] for i in best], index=df.index, dtype="object")
        return df

    return ds.map_batches(fn, batch_format="pandas")


def aspect_bucket_counts(ds: ray.data.Dataset,
                         w_col: str = "w",
                         h_col: str = "h") -> pd.DataFrame:
    out = (assign_aspect_buckets(ds, w_col, h_col)
           .groupby("bucket").count().to_pandas())
    out = out.rename(columns={"count()": "n_images"})
    return out.sort_values("bucket").reset_index(drop=True)
