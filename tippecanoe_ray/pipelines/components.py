"""Connected components over a near-duplicate pair list — the step
that turns pairwise matches into dedup groups with one canonical
survivor per group.

Dataset-native large-star / small-star iteration (the MapReduce CC
algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public): each round is a flat_map over edges plus a
``groupby(node).map_groups`` min-label rewrite — no driver-held graph
and no broadcast table; the edge list collapses geometrically toward
one (node, component-min) star edge per node. Convergence is detected
with a tiny distributed signature aggregate (edge count + xor hash),
not by collecting the edges; only the FINAL star edges — O(distinct
nodes in the pair list) rows — come back to the driver, and they are
the answer itself.

Scale shape: edges are 16-byte rows; every round's shuffle is
edge-list-sized. At 100 TB the pair list produced by banded LSH is
orders of magnitude smaller than the corpus, so the CC rounds are
cheap relative to the banding pass that produced the pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _star_round(edges: ray.data.Dataset, large: bool) -> ray.data.Dataset:
    """One large-star round (attach every neighbor GREATER than u to
    the neighborhood minimum) or small-star round (attach the
    neighbors on the small side)."""

    def duplex(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        if large:
            # both directions: every node sees its full neighborhood
            u = np.concatenate([a, b])
            v = np.concatenate([b, a])
        else:
            # direct each edge toward its smaller endpoint
            u = np.where(a >= b, a, b)
            v = np.where(a >= b, b, a)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]})

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        u = int(df["u"].iloc[0])
        nbrs = np.unique(df["v"].to_numpy())
        m = min(u, int(nbrs.min()))
        if large:
            keep = nbrs[nbrs > u]
        else:
            keep = np.unique(np.concatenate([nbrs, [u]]))
            keep = keep[keep != m]
        return pd.DataFrame({"a": keep.astype(np.int64),
                             "b": np.full(len(keep), m, np.int64)})

    return (edges.map_batches(duplex, batch_format="pandas")
            .groupby("u").map_groups(contract, batch_format="pandas"))


def _signature(edges: ray.data.Dataset):
    """(count, xor-hash) of the edge multiset via a per-batch partial
    — a few rows to the driver, never the edges."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["a"].to_numpy().astype(np.int64) * np.int64(1000003)
             + df["b"].to_numpy().astype(np.int64))
        x = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pd.DataFrame({"n": [len(df)], "x": [x]})

    parts = edges.map_batches(part, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return (0, 0)
    return (int(parts["n"].sum()),
            int(np.bitwise_xor.reduce(parts["x"].to_numpy())))


def connected_components(pairs, max_rounds: int = 32) -> pd.DataFrame:
    """pairs: pandas DataFrame or Dataset with int columns a, b.
    Returns (node, component) for every node in the pair list, where
    component is the smallest member id."""
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return pd.DataFrame({"node": pd.array([], dtype="int64"),
                                 "component": pd.array([], dtype="int64")})
        edges = ray.data.from_pandas(
            pairs[["a", "b"]].astype(np.int64))
    else:
        edges = pairs.select_columns(["a", "b"])

    prev_sig = None
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True)
        edges = _star_round(edges, large=False)
        edges = edges.materialize()
        sig = _signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig

    out = edges.to_pandas().drop_duplicates().rename(
        columns={"a": "node", "b": "component"})
    roots = pd.DataFrame({
        "node": out["component"].unique(),
        "component": out["component"].unique(),
    })
    out = (pd.concat([out, roots], ignore_index=True)
           .drop_duplicates("node"))
    return (out.astype({"node": "int64", "component": "int64"})
            .sort_values("node").reset_index(drop=True))


def dedup_groups(pairs, max_rounds: int = 32) -> pd.DataFrame:
    """(component, n_members) per dedup group, smallest-id canonical."""
    cc = connected_components(pairs, max_rounds)
    g = (cc.groupby("component", as_index=False)
         .agg(n_members=("node", "count")))
    return g.sort_values("component").reset_index(drop=True)
