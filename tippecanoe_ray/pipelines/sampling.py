"""Deterministic sampling operators for training-data curation.

- ``rate_sample``: keep rows whose splitmix64(id) falls under
  rate * 2^64 — a reproducible Bernoulli sample with no RNG state,
  shuffle-free (pure map_batches filter), the distributed analogue of
  the reference's deterministic point-drop rule (the rate ladder keeps
  features by index-derived pseudo-random rank rather than a seeded
  RNG; main.cpp basezoom/droprate machinery).
- ``stratified_sample``: exactly k rows per key, chosen as the k
  smallest splitmix64(id) ranks within the key — reproducible
  stratified subsampling. Scale shape: a map_batches PARTIAL top-k per
  (batch, key) first (bounds what the exchange carries to
  k * n_batches rows per key), then one groupby(key).map_groups final
  top-k — the partial/combine pre-aggregation pattern, never a full
  sort of the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import splitmix64


def _ranks(ids: np.ndarray) -> np.ndarray:
    return splitmix64(ids.astype(np.int64).view(np.uint64))


def rate_sample(ds: ray.data.Dataset, id_col: str,
                rate: float) -> ray.data.Dataset:
    threshold = np.uint64(int(rate * float(1 << 64)))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        r = _ranks(df[id_col].to_numpy())
        return df[r < threshold]

    return ds.map_batches(fn, batch_format="pandas")


def stratified_sample(ds: ray.data.Dataset, key_col: str, id_col: str,
                      k: int) -> ray.data.Dataset:
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rank"] = _ranks(df[id_col].to_numpy())  # uint64 order
        # per-key partial top-k inside the batch (ties impossible:
        # splitmix64 is a bijection over distinct ids)
        return (df.sort_values("_rank")
                .groupby(key_col, group_keys=False).head(k))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("_rank").head(k).drop(columns=["_rank"])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(key_col)
            .map_groups(final, batch_format="pandas"))
