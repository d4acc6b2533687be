"""Thin relational operators over Ray Data, built scale-first.

The reference engine's joins are broadcast hash joins of a small side
into a streamed big side (tile-join.cpp:101-300: CSV loaded into an
in-memory map, matched per feature; `-i` = semi-join). We reproduce
that shape natively: the small side lives in the object store once
(ray.put) and every map_batches task joins against it with Arrow's
vectorized (Acero) hash join — no all-to-all shuffle for small-side
joins, ever.

Aggregations follow the partial/combine pattern (the reference's
accumulate-attribute ops carry explicit partial state,
attribute.cpp:9-188): per-batch partial aggregates inside map_batches,
then a tiny groupby over the partials — the shuffle moves one row per
(batch, group), not one per input row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    keys: str | list[str],
    join_type: str = "inner",
    right_keys: str | list[str] | None = None,
) -> ray.data.Dataset:
    """Join a small table into a streamed Dataset without a shuffle.

    join_type: 'inner' | 'left outer' | 'left semi' | 'left anti'
    (Arrow Acero join types; 'left semi' reproduces tile-join -i).
    """
    if isinstance(keys, str):
        keys = [keys]
    rk = right_keys if right_keys is not None else keys
    if isinstance(rk, str):
        rk = [rk]
    ref = ray.put(small)

    def fn(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        return batch.join(s, keys=keys, right_keys=rk, join_type=join_type)

    return big.map_batches(fn, batch_format="pyarrow")


def partial_groupby(
    ds: ray.data.Dataset,
    by: list[str],
    aggs: dict[str, tuple[str, str]],
    batch_size: int | None = None,
) -> pd.DataFrame:
    """Two-phase grouped aggregate: per-batch pandas partials →
    driver-side combine. aggs: {out_col: (in_col, op)} with op in
    sum|count|min|max|mean.

    The partial for mean is (sum, count) — the same "value\\0count"
    trick the reference piggybacks on its accumulator strings
    (serial.hpp:74-86) — merged exactly at combine time.
    """
    plan: dict[str, tuple[str, str]] = {}
    for out, (col, op) in aggs.items():
        if op == "mean":
            plan[f"__{out}__sum"] = (col, "sum")
            plan[f"__{out}__cnt"] = (col, "count")
        else:
            plan[out] = (col, op)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(by, sort=False, dropna=False)
        cols = {}
        for out, (col, op) in plan.items():
            cols[out] = getattr(g[col], op)()
        return pd.DataFrame(cols).reset_index()

    parts = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    g = parts.groupby(by, sort=False, dropna=False)
    out_cols = {}
    for out, (col, op) in plan.items():
        if op == "count":
            out_cols[out] = g[out].sum()
        elif op == "mean":
            raise AssertionError("mean expanded above")
        else:
            out_cols[out] = getattr(g[out], op)()
    combined = pd.DataFrame(out_cols).reset_index()
    for out, (col, op) in aggs.items():
        if op == "mean":
            combined[out] = combined[f"__{out}__sum"] / combined[f"__{out}__cnt"]
            combined = combined.drop(columns=[f"__{out}__sum", f"__{out}__cnt"])
    return combined


def top_k(ds: ray.data.Dataset, by: str, k: int, keep: list[str] | None = None,
          descending: bool = True) -> pd.DataFrame:
    """Distributed top-k: per-batch local top-k, then driver merge —
    the shuffle moves k rows per batch, not the dataset."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        cols = keep or list(df.columns)
        return df.nlargest(k, by)[cols] if descending else df.nsmallest(k, by)[cols]

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = parts.nlargest(k, by) if descending else parts.nsmallest(k, by)
    return out.reset_index(drop=True)


def round_half_away(x, decimals: int):
    """Round half away from zero (SQL ROUND semantics; numpy rounds
    half-to-even, which diverges on exact-half binary fractions like
    k/2^m — e.g. 0.8203125 at 6 decimals)."""
    import pandas as pd

    scale = 10 ** decimals
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if isinstance(x, pd.Series):
        return pd.Series(out, index=x.index, name=x.name)
    return out
