"""The oracle-checked query battery: every entry returns a result whose
columns and values are reproducible 1:1 by the ANSI-SQL string in
ORACLE_SQL (run by the driver against the same parquet tables in
DuckDB). Entries without SQL (non-relational pipelines) are checked
rows-only.

Conventions for hash parity with the oracle:
- every aggregate/computed column is explicitly named, identically in
  both the Ray pipeline and the SQL (AS ...);
- float aggregates are rounded (2 decimals for money sums, 6 for
  ratios) on BOTH sides;
- tie-breaks are fully specified so top-k sets are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..relational.ops import broadcast_join, partial_groupby, round_half_away, top_k
from ..stages.geotag import LCG_A_X, LCG_A_Y, LCG_C_Y, lcg_world_sql

WORLD_MOD = 1 << 32


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    from ..sources.parquet_clean import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_small(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ===================================================== spatial / tiling


def _doc_points_narrow(sf_dir: str) -> ray.data.Dataset:
    """documents geotagged with the SQL-expressible LCG rule."""
    from ..pipelines.pyramid import geotag_narrow, PyramidConfig

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    cfg = PyramidConfig(rule="lcg", id_col="doc_id", seq_col=None)
    return geotag_narrow(ds, cfg)


def pyramid_counts_keepall(sf_dir: str, maxzoom: int = 8) -> pd.DataFrame:
    """Full keep-all pyramid over LCG-geotagged documents through the
    REAL tiling pipeline (droprate=1, no snapping ⇒ pure floor
    assignment, SQL-reproducible)."""
    from ..pipelines.pyramid import PyramidConfig, build_pyramid_from_narrow

    cfg = PyramidConfig(
        maxzoom=maxzoom, droprate=1.0, geometry_scale=0, encode_tiles=False,
        rule="lcg", id_col="doc_id", seq_col=None,
    )
    narrow = _doc_points_narrow(sf_dir)
    tiles = build_pyramid_from_narrow(narrow, cfg)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


def _pyramid_sql(maxzoom: int = 8, z_filter: str = "") -> str:
    wx, wy = lcg_world_sql("doc_id")
    return f"""
WITH pts AS (SELECT {wx} AS wx, {wy} AS wy FROM documents),
zs AS (SELECT unnest(range(0, {maxzoom + 1})) AS z)
SELECT CAST(z AS INT) AS z,
       CAST(wx >> (32 - z) AS INT) AS x,
       CAST(wy >> (32 - z) AS INT) AS y,
       COUNT(*) AS n_features
FROM pts CROSS JOIN zs {z_filter}
GROUP BY 1, 2, 3
"""


def tile_counts_z8(sf_dir: str) -> pd.DataFrame:
    df = pyramid_counts_keepall(sf_dir, maxzoom=8)
    return df[df["z"] == 8].reset_index(drop=True)


def hot_tiles_z6(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Densest zoom-6 tiles — the skew-detection primitive that feeds
    salting / split-of-heavy-keys decisions."""
    df = pyramid_counts_keepall(sf_dir, maxzoom=6)
    df = df[df["z"] == 6]
    df = df.sort_values(["n_features", "x", "y"], ascending=[False, True, True]).head(k)
    return df.reset_index(drop=True)


def cell_counts_l6(sf_dir: str) -> pd.DataFrame:
    """Docs per level-6 quadkey cell (the engine's native DGG cell id —
    SURVEY.md §2.4; the morton interleave is reproduced bit-for-bit in
    SQL as a sum of shifted bit terms)."""
    from ..functions.spatial import encode_quadkey
    from ..stages.geotag import lcg_world

    def fn(t: pa.Table) -> pa.Table:
        key = t["doc_id"].to_numpy(zero_copy_only=False)
        wx, wy = lcg_world(key)
        cell = (encode_quadkey(wx, wy) >> np.uint64(64 - 12)).astype(np.int64)
        return pa.table({"cell": cell})

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(fn, batch_format="pyarrow")
    out = partial_groupby(ds, by=["cell"], aggs={"n_docs": ("cell", "count")})
    return out.sort_values("cell").reset_index(drop=True)


def _cell_sql_l6() -> str:
    wx, wy = lcg_world_sql("doc_id")
    # morton interleave of the top 6 bits of each axis:
    # bit i (0..5, MSB-first) of x goes to out bit 11-2i, of y to 10-2i
    terms = []
    for i in range(6):
        xbit = f"((wx >> {31 - i}) & 1)"
        ybit = f"((wy >> {31 - i}) & 1)"
        terms.append(f"({xbit} << {11 - 2 * i})")
        terms.append(f"({ybit} << {10 - 2 * i})")
    cell = " + ".join(terms)
    return f"""
WITH pts AS (SELECT {wx} AS wx, {wy} AS wy FROM documents)
SELECT CAST({cell} AS BIGINT) AS cell, COUNT(*) AS n_docs
FROM pts GROUP BY 1
"""


BBOX_REGIONS = [
    ("r0", 0, 0, 1 << 31, 1 << 31),
    ("r1", 1 << 31, 0, 1 << 32, 1 << 31),
    ("r2", 0, 1 << 31, 1 << 31, 1 << 32),
    ("r3", 1 << 31, 1 << 31, 1 << 32, 1 << 32),
    ("hot", 3 << 29, 3 << 29, 5 << 29, 5 << 29),
]


def bbox_join_counts(sf_dir: str) -> pd.DataFrame:
    """Point-in-bbox spatial join: regions broadcast once, vectorized
    containment per batch (clip.cpp:84-104 point-in-rect semantics:
    inclusive min, exclusive max). A point can match several regions."""
    from ..stages.geotag import lcg_world

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        wx, wy = lcg_world(df["doc_id"].to_numpy())
        rows = {"region": [], "n_docs": []}
        for name, x0, y0, x1, y1 in BBOX_REGIONS:
            m = (wx >= x0) & (wx < x1) & (wy >= y0) & (wy < y1)
            rows["region"].append(name)
            rows["n_docs"].append(int(m.sum()))
        return pd.DataFrame(rows)

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(fn, batch_format="pandas")
    out = ds.to_pandas().groupby("region", as_index=False)["n_docs"].sum()
    return out.sort_values("region").reset_index(drop=True)


def _bbox_sql() -> str:
    wx, wy = lcg_world_sql("doc_id")
    selects = []
    for name, x0, y0, x1, y1 in BBOX_REGIONS:
        selects.append(
            f"SELECT '{name}' AS region, COUNT(*) AS n_docs FROM pts "
            f"WHERE wx >= {x0} AND wx < {x1} AND wy >= {y0} AND wy < {y1}"
        )
    return (
        f"WITH pts AS (SELECT {wx} AS wx, {wy} AS wy FROM documents)\n"
        + "\nUNION ALL\n".join(selects)
    )


# ========================================================== relational


def q1_pricing(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(derive, batch_format="pyarrow")
    out = partial_groupby(
        ds,
        by=["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "n_rows": ("l_quantity", "count"),
        },
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_base_price"] = out["sum_base_price"].round(2)
    out["sum_disc_price"] = out["sum_disc_price"].round(2)
    out["avg_qty"] = round_half_away(out["avg_qty"], 6)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY 1, 2
"""


def q3_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> pd.DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue per order, top k.
    Small sides broadcast; no all-to-all shuffle."""
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(pa.compute.equal(cust["c_mktsegment"], segment)).select(["c_custkey"])
    orders = _read_small(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders = orders.join(cust, keys=["o_custkey"], right_keys=["c_custkey"], join_type="left semi")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(li, orders.select(["o_orderkey"]), keys=["l_orderkey"],
                            right_keys=["o_orderkey"], join_type="left semi")

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df[["l_orderkey", "revenue"]]

    per_order = partial_groupby(
        joined.map_batches(rev, batch_format="pandas"),
        by=["l_orderkey"],
        aggs={"revenue": ("revenue", "sum")},
    )
    per_order["revenue"] = per_order["revenue"].round(2)
    out = per_order.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(k)
    return out[["l_orderkey", "revenue"]].reset_index(drop=True)


Q3_SQL = """
SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
GROUP BY 1
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(sf_dir: str, region: str = "ASIA") -> pd.DataFrame:
    """Revenue per nation for suppliers in one region — the multi-way
    broadcast-join chain (dimensions resolved driver-side, fact table
    streamed once)."""
    nation = _read_small(sf_dir, "nation")
    reg = _read_small(sf_dir, "region")
    nr = nation.join(reg, keys=["n_regionkey"], right_keys=["r_regionkey"], join_type="inner")
    nr = nr.filter(pa.compute.equal(nr["r_name"], region))
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.join(nr.select(["n_nationkey", "n_name"]), keys=["s_nationkey"],
                     right_keys=["n_nationkey"], join_type="inner")
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(li, supp.select(["s_suppkey", "n_name"]),
                            keys=["l_suppkey"], right_keys=["s_suppkey"])

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df[["n_name", "revenue"]]

    out = partial_groupby(
        joined.map_batches(rev, batch_format="pandas"),
        by=["n_name"], aggs={"revenue": ("revenue", "sum")},
    )
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


def semi_join_parts(sf_dir: str) -> pd.DataFrame:
    """Parts referenced by at least one lineitem (tile-join `-i`
    semi-join semantics, tile-join.cpp:223-273)."""
    li_keys = partial_groupby(
        _read(sf_dir, "lineitem", columns=["l_partkey"]),
        by=["l_partkey"], aggs={"n": ("l_partkey", "count")},
    )
    parts = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    small = pa.Table.from_pandas(li_keys[["l_partkey"]]).replace_schema_metadata(None)
    out = broadcast_join(parts, small, keys=["p_partkey"], right_keys=["l_partkey"],
                         join_type="left semi").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


SEMI_SQL = """
SELECT p_partkey, p_name FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
"""


def anti_join_parts(sf_dir: str) -> pd.DataFrame:
    li_keys = partial_groupby(
        _read(sf_dir, "lineitem", columns=["l_partkey"]),
        by=["l_partkey"], aggs={"n": ("l_partkey", "count")},
    )
    parts = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    small = pa.Table.from_pandas(li_keys[["l_partkey"]]).replace_schema_metadata(None)
    out = broadcast_join(parts, small, keys=["p_partkey"], right_keys=["l_partkey"],
                         join_type="left anti").to_pandas()
    if len(out) == 0:
        out = pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                            "p_name": pd.Series([], dtype=str)})
    return out.sort_values("p_partkey").reset_index(drop=True)


ANTI_SQL = """
SELECT p_partkey, p_name FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
"""


def orders_by_month(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["month"] = df["o_orderdate"].dt.strftime("%Y-%m")
        return df[["month", "o_totalprice"]]

    out = partial_groupby(
        ds.map_batches(derive, batch_format="pandas"),
        by=["month"],
        aggs={"n_orders": ("o_totalprice", "count"), "total": ("o_totalprice", "sum")},
    )
    out["total"] = out["total"].round(2)
    return out.sort_values("month").reset_index(drop=True)


MONTH_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


def top_orders_by_price(sf_dir: str, k: int = 100) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = top_k(ds, by="o_totalprice", k=k, keep=["o_orderkey", "o_totalprice"])
    return out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).reset_index(drop=True)


TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ============================================================== events


def events_tumbling_1h(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.strftime("%Y-%m-%d %H:00:00")
        return df[["hour", "event_type", "value"]]

    out = partial_groupby(
        ds.map_batches(derive, batch_format="pandas"),
        by=["hour", "event_type"],
        aggs={"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["hour", "event_type"]).reset_index(drop=True)


TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def sessions_30m(sf_dir: str) -> pd.DataFrame:
    """Sessionization: a >30-minute gap starts a new session. Grouped
    stateful scan per user (map_groups ordered by ts) — the engine's
    ordered-scan primitive (SURVEY.md §2.11)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts")
        gaps = df["ts"].diff().dt.total_seconds() > 1800
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_sessions": [int(gaps.sum()) + 1],
                "n_events": [len(df)],
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


SESSIONS_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id, CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY 1
"""


# ======================================================== dedup / text


def dedup_exact_union(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over documents ∪ documents(+100000 ids) — every text
    appears twice; keep the min id (hash-partition + first)."""
    from .dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        ids = pa.compute.add(t["doc_id"], 100000)
        return pa.table({"doc_id": ids, "text": t["text"]})

    both = ds.union(_read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(shifted, batch_format="pyarrow"))
    return exact_dedup(both, "text", "doc_id")


DEDUP_SQL = """
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents)
SELECT MIN(doc_id) AS keep_id, COUNT(doc_id) AS n_dups
FROM u GROUP BY text
"""


def token_stats_q(sf_dir: str) -> pd.DataFrame:
    from .textpipe import token_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


TOKEN_SQL = """
SELECT doc_id,
       LENGTH(text) AS n_chars,
       CASE WHEN TRIM(text) = '' THEN 0
            ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens,
       ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
             / GREATEST(LENGTH(text), 1), 6) AS alpha_ratio,
       ROUND(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
             / GREATEST(LENGTH(text), 1), 6) AS digit_ratio,
       ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '\\s', '', 'g'))) * 1.0
             / GREATEST(LENGTH(text), 1), 6) AS space_ratio
FROM documents
"""


def ann_top10(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-10 to the vec_id=0 embedding (brute-force
    baseline; the scale path is lsh_topk)."""
    from .ann import brute_force_topk

    q = _read_small(sf_dir, "embeddings")
    qvec = np.asarray(q.filter(pa.compute.equal(q["vec_id"], 0))["embedding"][0].as_py())
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, qvec[None, :], k=10)
    out = out[["vec_id", "cosine"]].copy()
    out["cosine"] = round_half_away(out["cosine"], 4)
    return out.sort_values(["vec_id"]).reset_index(drop=True)


ANN_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST((SELECT qv FROM q) AS DOUBLE[])), 4) AS cosine
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST((SELECT qv FROM q) AS DOUBLE[])) DESC, vec_id
LIMIT 10
"""


def embedding_norms(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        return pd.DataFrame(
            {"vec_id": df["vec_id"], "norm": round_half_away(np.linalg.norm(mat, axis=1), 4)}
        )

    return ds.map_batches(norms, batch_format="pandas").to_pandas().sort_values("vec_id").reset_index(drop=True)


NORMS_SQL = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS norm
FROM embeddings
"""


# ================================================== rows-only pipelines


def minhash_pairs_q(sf_dir: str) -> pd.DataFrame:
    from .dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.compute.add(t["doc_id"], 100000), "text": t["text"]}
        )

    both = ds.union(_read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(shifted, batch_format="pyarrow"))
    return minhash_lsh_pairs(both, "text", "doc_id", threshold=0.8)


def ngram_jaccard_q(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram-blocked near-dup over the doubled documents corpus
    (every doc has one guaranteed exact duplicate)."""
    from .dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.compute.add(t["doc_id"], 100000), "text": t["text"]}
        )

    both = ds.union(_read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(shifted, batch_format="pyarrow"))
    return ngram_jaccard_pairs(both, "text", "doc_id", k=12, threshold=0.8,
                               sample_mod=8, max_bucket=64)


def simhash_pairs_q(sf_dir: str) -> pd.DataFrame:
    from .dedup import simhash_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.compute.add(t["doc_id"], 100000), "text": t["text"]}
        )

    both = ds.union(_read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(shifted, batch_format="pyarrow"))
    return simhash_pairs(both, "text", "doc_id", max_hamming=3)


def phash_near_dup_q(sf_dir: str) -> pd.DataFrame:
    """Perceptual-hash near-dup over the image table: the phash int64
    column (BASELINE.json input_hint) banded 4×16 bits, bucket
    groupby, popcount Hamming ≤ 3 verify — full recall by pigeonhole,
    and pixel bytes never ride the shuffle. The synthetic phash plants
    replica groups of 4 (splitmix64 of doc_id // 4, low bits
    doc_id % 4 → intra-group Hamming ≤ 2) so an independent all-pairs
    SQL oracle is exact."""
    from ..functions.hashing import splitmix64
    from .dedup import hamming_near_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_images(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = splitmix64((k // 4).astype(np.uint64)) ^ (k % 4).astype(np.uint64)
        return pa.table({
            "image_id": pa.array([f"img-{i:012d}" for i in k], pa.string()),
            "phash": pa.array(ph.view(np.int64), pa.int64()),
        })

    imgs = ds.map_batches(to_images, batch_format="pyarrow")
    return hamming_near_dup_pairs(imgs, "phash", "image_id", max_hamming=3)


def dedup_components_q(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs → dedup groups: connected components over the
    simhash pair list (large-star/small-star Dataset rounds), one
    canonical smallest-id survivor per group, reported as
    (component, n_members)."""
    from .components import dedup_groups
    from .dedup import simhash_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.compute.add(t["doc_id"], 100000),
                         "text": t["text"]})

    both = ds.union(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(shifted, batch_format="pyarrow"))
    pairs = simhash_pairs(both, "text", "doc_id", max_hamming=3)
    return dedup_groups(pairs[["a", "b"]])


def dedup_filtered_counts_q(sf_dir: str) -> pd.DataFrame:
    """End-to-end near-dup removal: simhash pairs → connected
    components → drop every non-canonical member → per-language
    surviving-document counts. The non-survivor id set (pairs-sized,
    tiny relative to the corpus) broadcasts via ray.put into a
    map_batches filter — the corpus itself streams."""
    from .components import connected_components
    from .dedup import simhash_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.compute.add(t["doc_id"], 100000),
                         "text": t["text"]})

    both = ds.union(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(shifted, batch_format="pyarrow"))
    pairs = simhash_pairs(both, "text", "doc_id", max_hamming=3)
    cc = connected_components(pairs[["a", "b"]])
    drop = set(cc.loc[cc["node"] != cc["component"], "node"].tolist())
    drop_ref = ray.put(drop)

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = pa.array([int(i) not in d for i in ids])
        return t.filter(mask)

    full = _read(sf_dir, "documents", columns=["doc_id", "lang"]).union(
        _read(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(lambda t: pa.table(
            {"doc_id": pa.compute.add(t["doc_id"], 100000),
             "lang": t["lang"]}), batch_format="pyarrow"))
    out = (full.map_batches(keep, batch_format="pyarrow")
           .groupby("lang").count().to_pandas())
    out = out.rename(columns={"count()": "n_docs"})
    return out.sort_values("lang").reset_index(drop=True)


def aspect_buckets_q(sf_dir: str) -> pd.DataFrame:
    """Resolution-bucket counts over the image table (the input_hint
    w/h rule: w = 64 + (id%5)*16, h = 64 + ((id//5)%5)*16) — pixels
    never move, only (w, h) and a 7-value bucket key."""
    from .imagepipe import aspect_bucket_counts

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_wh(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "image_id": pa.array([f"img-{i:012d}" for i in k], pa.string()),
            "w": pa.array((64 + (k % 5) * 16).astype(np.int32), pa.int32()),
            "h": pa.array((64 + ((k // 5) % 5) * 16).astype(np.int32),
                          pa.int32()),
        })

    return aspect_bucket_counts(ds.map_batches(to_wh, batch_format="pyarrow"))


def stratified_sample_q(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample: the 20 documents with the
    smallest splitmix64(doc_id) rank per language — partial top-k in
    map_batches, final top-k per group (never a full sort)."""
    from .sampling import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    out = stratified_sample(ds, "lang", "doc_id", 20).to_pandas()
    return (out[["lang", "doc_id"]]
            .sort_values(["lang", "doc_id"]).reset_index(drop=True))


def doc_chunks_q(sf_dir: str) -> pd.DataFrame:
    """Context-window chunking: every document split into 24-token
    windows at stride 16 (8-token overlap), one row per chunk with the
    FNV-1a of the canonical rejoin — the packing step of an LLM
    training pipeline, shuffle-free map_batches."""
    from .textpipe import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = chunk_documents(ds, size=24, overlap=8).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def crossmodal_pairs_q(sf_dir: str) -> pd.DataFrame:
    """Cross-modal near-dup over (image, caption) rows: a pair is a
    duplicate only when BOTH the caption simhashes (Hamming <= 3) AND
    the image phashes (Hamming <= 3) agree — textual near-dup alone
    (same caption on different pictures) or visual near-dup alone
    (same picture re-captioned) is not enough. Each modality runs its
    own banded ids-only shuffle (simhash_pairs / hamming_near_dup on
    the planted-replica phash of the input_hint's phash:int64 column);
    the small pair sets intersect at the driver. Scale: both pair
    generators cap buckets and ship 64-bit ints only; the intersection
    is |pairs|-sized, never |rows|-sized."""
    from ..functions.hashing import splitmix64
    from .dedup import hamming_near_dup_pairs, simhash_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.compute.add(t["doc_id"], 100000),
                         "text": t["text"]})

    both = ds.union(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(shifted, batch_format="pyarrow"))
    txt = simhash_pairs(both, "text", "doc_id", max_hamming=3)

    def to_images(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = k % 100000
        ph = splitmix64((base // 4).astype(np.uint64)) \
            ^ (base % 4).astype(np.uint64)
        return pa.table({"doc_id": pa.array(k, pa.int64()),
                         "phash": pa.array(ph.view(np.int64), pa.int64())})

    imgs = both.map_batches(to_images, batch_format="pyarrow")
    img = hamming_near_dup_pairs(imgs, "phash", "doc_id", max_hamming=3)

    m = txt.merge(img, on=["a", "b"], suffixes=("_t", "_p"))
    m = m.rename(columns={"hamming_t": "text_hamming",
                          "hamming_p": "phash_hamming"})
    return (m[["a", "b", "text_hamming", "phash_hamming"]]
            .sort_values(["a", "b"]).reset_index(drop=True))


def embedding_near_dup_q(sf_dir: str) -> pd.DataFrame:
    from .dedup import embedding_near_dup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def jittered(t: pa.Table) -> pa.Table:
        vecs = [np.asarray(v, dtype=np.float32) * np.float32(1.0001) for v in t["embedding"].to_pylist()]
        ids = pa.compute.add(t["vec_id"], 100000)
        return pa.table({"vec_id": ids, "embedding": pa.array([v.tolist() for v in vecs])})

    both = ds.union(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(jittered, batch_format="pyarrow"))
    return embedding_near_dup_pairs(both, "embedding", "vec_id", threshold=0.999)


def lang_id_q(sf_dir: str) -> pd.DataFrame:
    from .textpipe import lang_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    preds = lang_id(ds.select_columns(["doc_id", "text"])).to_pandas()
    truth = _read_small(sf_dir, "documents", ["doc_id", "lang"]).to_pandas()
    m = preds.merge(truth, on="doc_id")
    out = (
        m.assign(correct=(m["pred_lang"] == m["lang"]).astype(int))
        .groupby("lang", as_index=False)
        .agg(n_docs=("doc_id", "count"), n_correct=("correct", "sum"))
    )
    return out.sort_values("lang").reset_index(drop=True)


def fingerprints_q(sf_dir: str) -> pd.DataFrame:
    from .textpipe import Fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(Fingerprint(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_q(sf_dir: str) -> pd.DataFrame:
    from .textpipe import QualityScore

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(QualityScore(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lsh_ann_q(sf_dir: str) -> pd.DataFrame:
    """Pruned-read ANN: build (or reuse) a bucket-partitioned parquet
    index, then read only the query's Hamming-neighborhood partitions
    (pipelines/ann.py build_lsh_index / lsh_topk_indexed)."""
    import hashlib
    import os

    from .ann import build_lsh_index, lsh_topk_indexed

    q = _read_small(sf_dir, "embeddings")
    qvec = np.asarray(q.filter(pa.compute.equal(q["vec_id"], 0))["embedding"][0].as_py())
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", f"tippecanoe_ray_lsh_{tag}")
    if not os.path.isdir(index_dir) or not os.listdir(index_dir):
        ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        build_lsh_index(ds, index_dir)
    return lsh_topk_indexed(index_dir, qvec[None, :], k=10, dim=len(qvec))


def video_frames_q(sf_dir: str) -> pd.DataFrame:
    """Video frame-sampling plumbing: deterministic TPRV containers
    derived from doc ids (2 + id%7 frames), actor-pool FrameSampleStage
    at stride 2, per-video sampled-frame counts. The oracle recomputes
    the counts from the generative rule; the pixel-level round trip is
    pytest-checked (tests/test_media.py)."""
    from ..stages.media import frame_sample, synthesize_video_table

    t = _read_small(sf_dir, "documents", ["doc_id"])
    vids = ray.data.from_arrow(synthesize_video_table(t["doc_id"].to_numpy()))
    frames = frame_sample(vids, stride=2)
    out = (
        frames.groupby("video_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_sampled"})
    )
    out["n_sampled"] = out["n_sampled"].astype(np.int64)
    out["n_frames"] = (2 + out["video_id"] % 7).astype(np.int64)
    return out[["video_id", "n_frames", "n_sampled"]].sort_values(
        "video_id"
    ).reset_index(drop=True)


VIDEO_FRAMES_SQL = """
SELECT doc_id AS video_id,
       CAST(2 + doc_id % 7 AS BIGINT) AS n_frames,
       CAST((2 + doc_id % 7 + 1) // 2 AS BIGINT) AS n_sampled
FROM documents
ORDER BY video_id
"""


def audio_features_q(sf_dir: str) -> pd.DataFrame:
    """Audio feature extraction over deterministic TPRA PCM containers
    (affine int16 generator, 4096 samples): actor-pool AudioFeatureStage
    → (audio_id, n_samples, rms, zero_crossings). The PCM values are
    integers exactly representable in float64, so RMS matches SQL's
    integer-sum model bit-for-bit after ROUND 6."""
    from ..stages.media import audio_features, synthesize_audio_table

    t = _read_small(sf_dir, "documents", ["doc_id"])
    aud = ray.data.from_arrow(synthesize_audio_table(t["doc_id"].to_numpy()))
    out = audio_features(aud).to_pandas()
    out = out[["audio_id", "n_samples", "rms", "zero_crossings"]].copy()
    out["n_samples"] = out["n_samples"].astype(np.int64)
    out["zero_crossings"] = out["zero_crossings"].astype(np.int64)
    return out.sort_values("audio_id").reset_index(drop=True)


AUDIO_FEATURES_SQL = """
WITH pcm AS (
  SELECT doc_id AS audio_id, i,
         CAST((doc_id * 2654435761 + 12345 * i) % 65536 - 32768 AS BIGINT) AS s
  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS i)),
lagged AS (
  SELECT audio_id, i, s,
         LAG(s) OVER (PARTITION BY audio_id ORDER BY i) AS prev
  FROM pcm)
SELECT audio_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       ROUND(sqrt(SUM(CAST(s AS DOUBLE) * s) / COUNT(*)), 6) AS rms,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND s * prev < 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_crossings
FROM lagged
GROUP BY audio_id
ORDER BY audio_id
"""


def ivf_ann_q(sf_dir: str) -> pd.DataFrame:
    """IVF pruned-read ANN: deterministic spherical k-means lists
    (pipelines/ann.py build_ivf_index), parquet partitioned by list,
    query scans only its n_probe=2 nearest lists. The coarse-quantized
    counterpart of lsh_ann_top10."""
    import hashlib
    import os

    from .ann import build_ivf_index, ivf_topk_indexed

    q = _read_small(sf_dir, "embeddings")
    qvec = np.asarray(q.filter(pa.compute.equal(q["vec_id"], 0))["embedding"][0].as_py())
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", f"tippecanoe_ray_ivf_{tag}")
    if not os.path.isdir(index_dir) or not os.listdir(index_dir):
        ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        build_ivf_index(ds, index_dir)
    out = ivf_topk_indexed(index_dir, qvec[None, :], k=10, n_probe=2)
    out = out[["vec_id", "cosine"]].copy()
    out["cosine"] = round_half_away(out["cosine"], 4)
    return out.sort_values(["vec_id"]).reset_index(drop=True)


def image_pyramid_q(sf_dir: str) -> pd.DataFrame:
    """Flagship: full drop-ladder pyramid over a synthetic image table
    (fnv geotag, hotspots on, MVT encoding on). Sized so the SQL
    oracle's faithful sequential ladder scan (a 4000-step recursive
    CTE) stays cheap while still exercising hotspot skew + the rate
    ladder at every zoom."""
    from ..sources.image_table import synthesize_image_table
    from .pyramid import PyramidConfig, build_pyramid, pyramid_counts

    n = 4000
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=8, droprate=2.5, hotspot_frac=0.2)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    df = pyramid_counts(tiles).to_pandas()
    return df.sort_values("z").reset_index(drop=True)




# ============================================== operator demo queries


def tilestats_documents(sf_dir: str) -> pd.DataFrame:
    """tilestats aggregate (capped type/min/max/count) over the
    documents attributes — SQL-reproducible summary columns."""
    from ..stages.stats import tilestats

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    st = tilestats(ds, ["lang", "source", "n_chars"])
    rows = []
    for a in st["attributes"]:
        rows.append(
            {
                "attribute": a["attribute"],
                "att_type": a["type"],
                "att_count": a["count"],
                "att_min": a.get("min", None),
                "att_max": a.get("max", None),
            }
        )
    out = pd.DataFrame(rows).sort_values("attribute").reset_index(drop=True)
    return out


TILESTATS_SQL = """
SELECT 'lang' AS attribute, 'string' AS att_type, COUNT(lang) AS att_count,
       CAST(NULL AS DOUBLE) AS att_min, CAST(NULL AS DOUBLE) AS att_max FROM documents
UNION ALL
SELECT 'n_chars', 'number', COUNT(n_chars), CAST(MIN(n_chars) AS DOUBLE),
       CAST(MAX(n_chars) AS DOUBLE) FROM documents
UNION ALL
SELECT 'source', 'string', COUNT(source), NULL, NULL FROM documents
"""


def filter_events_q(sf_dir: str) -> pd.DataFrame:
    """-j filter expression applied to the events table, then a grouped
    count — the filter language is the engine's declarative predicate
    surface (evaluator.cpp); SQL oracle reproduces the same predicate."""
    from ..functions.filters import filter_dataset

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    expr = ["all", ["in", "event_type", "click", "view"], [">=", "value", 10.0]]
    out = partial_groupby(
        filter_dataset(ds, expr),
        by=["event_type"],
        aggs={"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


FILTER_SQL = """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE event_type IN ('click', 'view') AND value >= 10.0
GROUP BY 1
"""


def vector_tiles_q(sf_dir: str) -> pd.DataFrame:
    """Single-zoom (-Z3 -z3) cascade tiles over the committed oracle
    corpus; the oracle is the reference binary's own decoded per-tile
    feature counts (tippecanoe_ray/fixtures/vector_tiles_z3.parquet,
    built by tools/build_vector_oracle_fixtures.py)."""
    from . import vector_fixture as vf
    from .vector_pyramid import VectorConfig, build_vector_pyramid, ingest_features

    cfg = VectorConfig(minzoom=vf.TILES_ZOOM, maxzoom=vf.TILES_ZOOM,
                       no_size_limit=True)
    tiles = build_vector_pyramid(
        ingest_features(vf.to_table(vf.corpus()), cfg), cfg)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    df = df[df["n_features"] > 0].astype("int64")
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


def overzoom_q(sf_dir: str) -> pd.DataFrame:
    """Overzoom z2 -> z3 over LCG-geotagged documents; SQL oracle models
    the quantized tile-local coordinates and the inclusive child-edge
    duplication (clip.cpp:84-104 via overzoom clip.cpp:1453+)."""
    from .pyramid import PyramidConfig, build_pyramid_from_narrow
    from .tilejoin import overzoom_tiles

    cfg = PyramidConfig(
        maxzoom=2, droprate=1.0, geometry_scale=0, encode_tiles=True,
        rule="lcg", id_col="doc_id", seq_col=None,
    )
    narrow = _doc_points_narrow(sf_dir)
    tiles = build_pyramid_from_narrow(narrow, cfg)
    over = overzoom_tiles(tiles.filter(expr="z == 2")).to_pandas()
    return over[["z", "x", "y", "n_features"]].sort_values(["x", "y"]).reset_index(drop=True)


def _overzoom_sql() -> str:
    wx, wy = lcg_world_sql("doc_id")
    # z2 tile-local coords quantized to the extent grid (detail 12:
    # world >> 18); child edges are INCLUSIVE on both sides, so a point
    # exactly on extent/2 lands in both children.
    return f"""
WITH pts AS (SELECT {wx} AS wx, {wy} AS wy FROM documents),
q AS (SELECT (wx >> 30) AS px, (wy >> 30) AS py,
             (wx >> 18) & 4095 AS lx, (wy >> 18) & 4095 AS ly FROM pts),
d AS (SELECT * FROM (VALUES (0), (1)) AS t(dx)),
e AS (SELECT * FROM (VALUES (0), (1)) AS t(dy))
SELECT 3 AS z,
       CAST(px * 2 + dx AS INT) AS x,
       CAST(py * 2 + dy AS INT) AS y,
       COUNT(*) AS n_features
FROM q CROSS JOIN d CROSS JOIN e
WHERE ((dx = 0 AND lx <= 2048) OR (dx = 1 AND lx >= 2048))
  AND ((dy = 0 AND ly <= 2048) OR (dy = 1 AND ly >= 2048))
GROUP BY 1, 2, 3
ORDER BY x, y
"""


def _quadkey_sql(xe: str, ye: str) -> str:
    """64-bit morton interleave of ({xe} & ~1, {ye} & ~1) as HUGEINT —
    the engine's point spatial index (serial.cpp:689-692)."""
    terms = []
    for i in range(32):  # bit i MSB-first of each 32-bit axis
        terms.append(f"(CAST((({xe} >> {31 - i}) & 1) AS HUGEINT) * (CAST(1 AS HUGEINT) << {63 - 2 * i}))")
        terms.append(f"(CAST((({ye} >> {31 - i}) & 1) AS HUGEINT) * (CAST(1 AS HUGEINT) << {62 - 2 * i}))")
    return "(" + " + ".join(terms) + ")"


def cluster_tiles_q(sf_dir: str) -> pd.DataFrame:
    from ..stages.strategies import StrategyConfig
    from .pyramid import PyramidConfig, build_pyramid_from_narrow

    cfg = PyramidConfig(
        maxzoom=5, droprate=1.0, geometry_scale=0, encode_tiles=False,
        rule="lcg", id_col="doc_id", seq_col=None,
        strategies=StrategyConfig(cluster_distance=40), bucket_zoom=0,
    )
    narrow = _doc_points_narrow(sf_dir)
    tiles = build_pyramid_from_narrow(narrow, cfg)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


def _cluster_sql(maxzoom: int = 5, distance: int = 40) -> str:
    """-K cluster scan as a recursive CTE: the reference merges against
    the last KEPT feature's index (merge_previndex is assigned only at
    the end of the feature loop, tile.cpp:2311, which the cluster
    branch's `continue` at tile.cpp:2017 skips) — a greedy 1-D scan
    that LAG cannot express, so the walk steps one row per tile per
    recursion level."""
    wx, wy = lcg_world_sql("doc_id")
    qk = _quadkey_sql("wx", "wy").replace("wx", "(wx - (wx % 2))").replace("wy", "(wy - (wy % 2))")
    return f"""
WITH RECURSIVE
pts AS (SELECT doc_id, {wx} AS wx, {wy} AS wy FROM documents),
zs AS (SELECT unnest(range(0, {maxzoom + 1})) AS z),
feat AS (
  SELECT z, tx, ty, ix,
         ROW_NUMBER() OVER (PARTITION BY z, tx, ty ORDER BY ix, doc_id) AS rn,
         CAST(((CAST(1 AS HUGEINT) << (32 - z)) / 256) * {distance} AS HUGEINT)
           * CAST(((CAST(1 AS HUGEINT) << (32 - z)) / 256) * {distance} AS HUGEINT) AS mingap
  FROM (SELECT z, (wx >> (32 - z)) AS tx, (wy >> (32 - z)) AS ty,
               {qk} AS ix, doc_id
        FROM pts CROSS JOIN zs)),
walk AS (
  SELECT z, tx, ty, rn, ix AS last_ix, 1 AS kept
  FROM feat WHERE rn = 1
  UNION ALL
  SELECT f.z, f.tx, f.ty, f.rn,
         CASE WHEN f.ix - w.last_ix < f.mingap THEN w.last_ix ELSE f.ix END,
         CASE WHEN f.ix - w.last_ix < f.mingap THEN 0 ELSE 1 END
  FROM walk w
  JOIN feat f ON f.z = w.z AND f.tx = w.tx AND f.ty = w.ty AND f.rn = w.rn + 1)
SELECT CAST(z AS INT) AS z, CAST(tx AS INT) AS x, CAST(ty AS INT) AS y,
       CAST(SUM(kept) AS BIGINT) AS n_features
FROM walk GROUP BY 1, 2, 3
"""


def guessing_q(sf_dir: str) -> pd.DataFrame:
    """-zg / -Bg guessing over a DENSIFIED key (doc_id %% 128): the
    128 hot positions force nonzero dupes, a nonzero basezoom and a
    fitted droprate, so every branch of the guess is oracle-checked."""
    from ..stages.stats import (
        guess_basezoom_droprate,
        guess_maxzoom,
        index_statistics,
    )
    from .pyramid import PyramidConfig, add_bucket, geotag_narrow

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def hotspot(t: pa.Table) -> pa.Table:
        # clustered layout: a 2^20-wide box so spacing stats, dupes,
        # basezoom and droprate all take nontrivial values
        from ..functions.spatial import encode_quadkey

        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wx = (1 << 31) + (k * 12345) % (1 << 20)
        wy = (1 << 31) + (k * 54321) % (1 << 20)
        return pa.table({
            "wx": wx, "wy": wy,
            "index": pa.array(encode_quadkey(wx & ~1, wy & ~1), pa.uint64()),
            "seq": k,
        })

    narrow = add_bucket(ds.map_batches(hotspot, batch_format="pyarrow"), 3)
    stats = index_statistics(narrow, max_zoom_hist=10)
    mz = guess_maxzoom(stats)
    bz, dr = guess_basezoom_droprate(stats, maxzoom=mz, max_features=100)
    return pd.DataFrame(
        {"maxzoom": [mz], "basezoom": [bz], "droprate": [round(dr, 4)],
         "n_deltas": [stats["count"]], "dupes": [stats["dupes"]]}
    )


def _guess_sql(max_zoom_hist: int = 10, max_features: int = 100,
               full_detail: int = 12) -> str:
    """SQL oracle for guess_zoom_params: Welford over ln(diffs) of the
    sorted 64-bit morton index (LAG window over HUGEINT), per-zoom
    densest-tile counts, the -zg maxzoom formula (main.cpp:2340-2364),
    basezoom scan and the droprate recursion — which reduces to
    GREATEST over (max_cnt[z]/F)^(1/(bz-z)) because the running value
    only ever increases (main.cpp:2618-2634)."""
    wx = f"({1 << 31} + (doc_id * 12345) % {1 << 20})"
    wy = f"({1 << 31} + (doc_id * 54321) % {1 << 20})"
    qk = _quadkey_sql("(wx - (wx % 2))", "(wy - (wy % 2))")
    zhist = ",".join(str(z) for z in range(0, max_zoom_hist + 1))
    return f"""
WITH pts AS (SELECT doc_id, {wx} AS wx, {wy} AS wy FROM documents),
ix AS (SELECT {qk} AS morton FROM pts),
d AS (SELECT morton - LAG(morton) OVER (ORDER BY morton) AS diff FROM ix),
stats AS (
  SELECT COUNT(*) FILTER (WHERE diff > 0) AS n,
         COUNT(*) FILTER (WHERE diff = 0) AS dupes,
         AVG(LN(CAST(CASE WHEN diff > 0 THEN diff ELSE 1 END AS DOUBLE)))
             FILTER (WHERE diff > 0) AS mean,
         COALESCE(VAR_POP(LN(CAST(CASE WHEN diff > 0 THEN diff ELSE 1 END AS DOUBLE)))
             FILTER (WHERE diff > 0), 0) AS varp
  FROM d WHERE diff IS NOT NULL),
mz AS (
  SELECT n, dupes, mean, SQRT(varp) AS sd,
         GREATEST(0, LEAST(CAST(32 - {full_detail} AS BIGINT),
           CAST(CEIL(LN(360.0 / (0.00000274 * (SQRT(EXP(mean - 1.5 * SQRT(varp))) / 33.0 / 2.0))) / LN(2.0) - {full_detail}) AS BIGINT)
         )) AS maxzoom
  FROM stats),
hist AS (
  SELECT z, MAX(cnt) AS max_cnt FROM (
    SELECT z, CASE WHEN z = 0 THEN CAST(0 AS HUGEINT)
                   ELSE morton >> (64 - 2 * z) END AS tile, COUNT(*) AS cnt
    FROM ix CROSS JOIN (SELECT unnest([{zhist}]) AS z)
    GROUP BY 1, 2) GROUP BY 1),
bz AS (
  SELECT LEAST((SELECT maxzoom FROM mz),
               COALESCE((SELECT 1 + MAX(z) FROM hist
                         WHERE max_cnt > {max_features}
                           AND z <= (SELECT maxzoom FROM mz)), 0)) AS basezoom),
dr AS (
  SELECT COALESCE(MAX(POW(CAST(max_cnt AS DOUBLE) / {max_features},
                          1.0 / ((SELECT basezoom FROM bz) - z))), 1.0) AS cand
  FROM hist WHERE z < (SELECT basezoom FROM bz)
    AND POW(CAST(max_cnt AS DOUBLE) / {max_features},
            1.0 / ((SELECT basezoom FROM bz) - z)) > 1.0)
SELECT CAST((SELECT maxzoom FROM mz) AS BIGINT) AS maxzoom,
       CAST((SELECT basezoom FROM bz) AS BIGINT) AS basezoom,
       ROUND(CASE WHEN (SELECT cand FROM dr) > 1.0 THEN (SELECT cand FROM dr)
                  WHEN (SELECT basezoom FROM bz) > 0 THEN 2.5 ELSE 1.0 END, 4) AS droprate,
       CAST((SELECT n FROM stats) AS BIGINT) AS n_deltas,
       CAST((SELECT dupes FROM stats) AS BIGINT) AS dupes
"""


def raster_tiles_q(sf_dir: str) -> pd.DataFrame:
    from ..sources.image_table import synthesize_image_table
    from ..stages.thumbnails import compose_raster_tiles

    ds = synthesize_image_table(400, with_payload=True)
    tiles = compose_raster_tiles(ds, z=2, thumb_px=8, tile_px=64, concurrency=2)
    df = tiles.to_pandas()[["z", "x", "y", "n_images"]]
    return df.sort_values(["x", "y"]).reset_index(drop=True)


def payload_psnr_q(sf_dir: str) -> pd.DataFrame:
    from ..sources.image_table import synthesize_image_table
    from ..stages.thumbnails import verify_payloads_summary

    ds = synthesize_image_table(300, with_payload=True)
    # distributed per-format aggregation: no per-image driver collect
    summ, _viol = verify_payloads_summary(ds, concurrency=2)
    return summ[["fmt", "n", "min_psnr", "caption_ok"]].reset_index(drop=True)


# ============================================================ registry


def vector_pyramid_q(sf_dir: str) -> pd.DataFrame:
    """Per-zoom tile/feature counts of the full line/polygon cascade
    over the committed oracle corpus; the oracle is the reference
    binary's own decoded counts
    (tippecanoe_ray/fixtures/vector_pyramid_counts.parquet, built by
    tools/build_vector_oracle_fixtures.py)."""
    from . import vector_fixture as vf
    from .vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )

    cfg = VectorConfig(maxzoom=vf.PYRAMID_MAXZOOM, no_size_limit=True)
    tiles = build_vector_pyramid(
        ingest_features(vf.to_table(vf.corpus()), cfg), cfg)
    df = tiles.select_columns(["z", "n_features"]).to_pandas()
    df = df[df["n_features"] > 0]  # strategy-counter phantom rows
    g = (df.groupby("z")
         .agg(n_tiles=("z", "size"), n_features=("n_features", "sum"))
         .reset_index().astype("int64"))
    return g.sort_values("z").reset_index(drop=True)


def accumulate_tiles_q(sf_dir: str) -> pd.DataFrame:
    """Rate-ladder accumulate-attribute sums per tile over LCG documents
    (exact-match vs reference is in tests/test_accumulate.py; rows-only
    here — the fold boundaries depend on the scan, not SQL)."""
    from .pyramid import PyramidConfig, build_pyramid_from_narrow
    from ..stages.mvt import decode_tile

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def add_val(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("val", pc.cast(t["doc_id"], pa.float64()))

    from ..pipelines.pyramid import geotag_narrow

    cfg = PyramidConfig(
        maxzoom=5, droprate=2.5, rule="lcg", id_col="doc_id", seq_col=None,
        attr_accum=("val", "sum"),
    )
    narrow = geotag_narrow(ds.map_batches(add_val, batch_format="pyarrow"), cfg)
    tiles = build_pyramid_from_narrow(narrow, cfg)
    rows = []
    for r in tiles.take_all():
        vals = []
        for lay in decode_tile(bytes(r["tile"])):
            for f in lay["features"]:
                v = f.get("tags", {}).get("val")
                if v is not None:
                    vals.append(float(v))
        rows.append({"z": int(r["z"]), "x": int(r["x"]), "y": int(r["y"]),
                     "sum_val": round(sum(vals), 2)})
    return pd.DataFrame(rows).sort_values(["z", "x", "y"]).reset_index(drop=True)


def _accumulate_sql(maxzoom: int = 5) -> str:
    # with op=sum every dropped feature folds into some survivor of the
    # SAME tile, so the per-tile sum over emitted features equals the
    # plain per-tile SUM(doc_id) — SQL-checkable even though the fold
    # boundaries themselves are scan state.
    wx, wy = lcg_world_sql("doc_id")
    return f"""
WITH pts AS (SELECT doc_id, {wx} AS wx, {wy} AS wy FROM documents),
zs AS (SELECT unnest(range(0, {maxzoom + 1})) AS z)
SELECT CAST(z AS INT) AS z,
       CAST(wx >> (32 - z) AS INT) AS x,
       CAST(wy >> (32 - z) AS INT) AS y,
       ROUND(SUM(CAST(doc_id AS DOUBLE)), 2) AS sum_val
FROM pts CROSS JOIN zs
GROUP BY 1, 2, 3
"""


def coalesce_tiles_q(sf_dir: str, maxzoom: int = 4) -> pd.DataFrame:
    """-ac with no attributes: every occupied tile coalesces to ONE
    multipoint feature."""
    from .pyramid import PyramidConfig, build_pyramid_from_narrow

    cfg = PyramidConfig(
        maxzoom=maxzoom, droprate=1.0, geometry_scale=0,
        rule="lcg", id_col="doc_id", seq_col=None, coalesce=True,
    )
    narrow = _doc_points_narrow(sf_dir)
    tiles = build_pyramid_from_narrow(narrow, cfg)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


def _coalesce_sql(maxzoom: int = 4) -> str:
    wx, wy = lcg_world_sql("doc_id")
    return f"""
WITH pts AS (SELECT {wx} AS wx, {wy} AS wy FROM documents),
zs AS (SELECT unnest(range(0, {maxzoom + 1})) AS z)
SELECT CAST(z AS INT) AS z,
       CAST(wx >> (32 - z) AS INT) AS x,
       CAST(wy >> (32 - z) AS INT) AS y,
       CAST(1 AS BIGINT) AS n_features
FROM pts CROSS JOIN zs
GROUP BY 1, 2, 3
"""


def all_queries() -> dict:
    return {
        "pyramid_counts_keepall": pyramid_counts_keepall,
        "tile_counts_z8": tile_counts_z8,
        "hot_tiles_z6": hot_tiles_z6,
        "cell_counts_l6": cell_counts_l6,
        "bbox_join_counts": bbox_join_counts,
        "q1_pricing": q1_pricing,
        "q3_top_orders": q3_top_orders,
        "q5_region_revenue": q5_region_revenue,
        "semi_join_parts": semi_join_parts,
        "anti_join_parts": anti_join_parts,
        "orders_by_month": orders_by_month,
        "top_orders_by_price": top_orders_by_price,
        "events_tumbling_1h": events_tumbling_1h,
        "sessions_30m": sessions_30m,
        "dedup_exact_union": dedup_exact_union,
        "token_stats": token_stats_q,
        "ann_top10": ann_top10,
        "embedding_norms": embedding_norms,
        "minhash_lsh_pairs": minhash_pairs_q,
        "ngram_jaccard_pairs": ngram_jaccard_q,
        "simhash_pairs": simhash_pairs_q,
        "phash_near_dup": phash_near_dup_q,
        "crossmodal_pairs": crossmodal_pairs_q,
        "doc_chunks": doc_chunks_q,
        "stratified_sample": stratified_sample_q,
        "aspect_buckets": aspect_buckets_q,
        "dedup_components": dedup_components_q,
        "dedup_filtered_counts": dedup_filtered_counts_q,
        "embedding_near_dup": embedding_near_dup_q,
        "lang_id_accuracy": lang_id_q,
        "doc_fingerprints": fingerprints_q,
        "quality_scores": quality_q,
        "lsh_ann_top10": lsh_ann_q,
        "ivf_ann_top10": ivf_ann_q,
        "video_frame_sample": video_frames_q,
        "audio_features": audio_features_q,
        "image_pyramid": image_pyramid_q,
        "tilestats_documents": tilestats_documents,
        "filter_events": filter_events_q,
        "vector_tiles_z3": vector_tiles_q,
        "overzoom_z3": overzoom_q,
        "cluster_tiles": cluster_tiles_q,
        "guess_zoom_params": guessing_q,
        "raster_tiles_z2": raster_tiles_q,
        "payload_psnr": payload_psnr_q,
        "vector_pyramid_counts": vector_pyramid_q,
        "vector_squares_z4": vector_squares_q,
        "vector_points_z5": vector_points_q,
        "accumulate_sum_tiles": accumulate_tiles_q,
        "coalesce_tiles": coalesce_tiles_q,
    }




# ================================= promoted text/raster oracles (r3)

QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'), x -> x <> '') AS toks,
         COALESCE(text, '') AS txt
  FROM documents),
s AS (
  SELECT doc_id, LEN(toks) AS n_tok, LEN(list_distinct(toks)) AS uniq,
         LENGTH(txt) AS n_chars,
         LENGTH(regexp_replace(txt, '[^A-Za-z' || chr(19968) || '-' || chr(40959) || ']', '', 'g')) AS n_alpha
  FROM t)
SELECT doc_id,
       ROUND(0.4 * (CASE WHEN n_tok BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END)
           + 0.3 * LEAST(GREATEST(CAST(n_alpha AS DOUBLE) / GREATEST(n_chars, 1), 0), 1)
           + 0.3 * (CAST(uniq AS DOUBLE) / GREATEST(n_tok, 1)), 6) AS quality,
       ROUND(1.0 - CAST(uniq AS DOUBLE) / GREATEST(n_tok, 1), 6) AS rep_ratio
FROM s ORDER BY doc_id
"""

LANG_SQL = r"""
WITH t AS (
  SELECT doc_id, lang, COALESCE(text, '') AS txt,
         regexp_extract_all(lower(COALESCE(text, '')), '[\p{L}\p{N}_]+') AS toks
  FROM documents),
c AS (
  SELECT doc_id, lang,
    LEN(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) AS n_en,
    LEN(list_filter(toks, w -> w IN ('el','la','de','y','que','en','un','una','es','por'))) AS n_es,
    LEN(list_filter(toks, w -> w IN ('le','la','de','et','que','en','un','une','est','pour'))) AS n_fr,
    LEN(list_filter(toks, w -> w IN ('der','die','das','und','zu','in','ein','eine','ist','nicht'))) AS n_de,
    LEN(list_filter(toks, w -> w IN ('的','是','在','了','和','有','我','不','人','这')))
      + LENGTH(regexp_replace(txt, '[^' || chr(19968) || '-' || chr(40959) || ']', '', 'g')) AS n_zh
  FROM t),
p AS (
  -- the engine scans langs in sorted order taking strictly-greater
  -- counts, so ties resolve to the alphabetically first language
  SELECT lang, CASE
    WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr AND n_de >= n_zh THEN 'de'
    WHEN n_en >= n_es AND n_en >= n_fr AND n_en >= n_zh THEN 'en'
    WHEN n_es >= n_fr AND n_es >= n_zh THEN 'es'
    WHEN n_fr >= n_zh THEN 'fr'
    ELSE 'zh' END AS pred
  FROM c)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM p GROUP BY lang ORDER BY lang
"""

# FNV-1a 64 as a list_reduce over utf-8 bytes (hex(encode(..)) pair
# walk); accumulator is HUGEINT mod 2^64, seeded by prepending the
# offset basis. Matches functions/hashing.py fnv1a64_strings.
_FNV_STEP = "(a, b) -> (xor(a, CAST(b AS HUGEINT)) * 1099511628211) % 18446744073709551616"


def _fnv_of_hex(hx: str) -> str:
    return f"""list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        list_transform(generate_series(1, LENGTH({hx}) // 2),
          i -> strpos('0123456789ABCDEF', substr({hx}, 2*i-1, 1)) * 16
             + strpos('0123456789ABCDEF', substr({hx}, 2*i, 1)) - 17)),
      {_FNV_STEP})"""


FINGERPRINT_SQL = f"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS txt,
         hex(encode(COALESCE(text, ''))) AS hx,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> x <> '') AS toks
  FROM documents),
f AS (
  SELECT doc_id, txt, toks, {_fnv_of_hex('hx')} AS full_h
  FROM t),
w AS (
  SELECT doc_id, full_h,
    CASE
      WHEN LEN(toks) < 8 THEN (CASE WHEN txt = '' THEN 0 ELSE full_h END)
      ELSE list_min(list_transform(
        list_transform(generate_series(1, LEN(toks) - 7),
          i -> hex(encode(array_to_string(toks[i:i+7], ' ')))),
        ghx -> {_fnv_of_hex('ghx')}))
    END AS win_h
  FROM f)
SELECT doc_id,
  CAST(full_h - (CASE WHEN full_h >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END) AS BIGINT) AS fingerprint,
  CAST(win_h - (CASE WHEN win_h >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END) AS BIGINT) AS window_min
FROM w ORDER BY doc_id
"""


def _mulmod64(a: str, b: int) -> str:
    """{a} * b mod 2^64 in HUGEINT without overflowing INT128: split b
    into 32-bit halves so every product stays < 2^97."""
    bh, bl = b >> 32, b & 0xFFFFFFFF
    return (f"(({a}) * {bl} + ((({a}) * {bh}) % 4294967296) * 4294967296)"
            f" % 18446744073709551616")


# splitmix64 finalizer (functions/hashing.py splitmix64) over HUGEINT
_SPLITMIX_SQL = """
(SELECT xor(z4, z4 >> 31) FROM (
  SELECT """ + _mulmod64("xor(z2, z2 >> 27)", 0x94D049BB133111EB) + """ AS z4 FROM (
    SELECT """ + _mulmod64("xor(z0, z0 >> 30)", 0xBF58476D1CE4E5B9) + """ AS z2 FROM (
      SELECT (HVAL + 11400714819323198485) % 18446744073709551616 AS z0)))
)"""

# fnv geotag rule (stages/geotag.py fnv_world): wx = low 32 bits of
# splitmix64(fnv1a64("img-%012d" % i)), wy = high 32 bits.
RASTER_SQL = ("""
WITH ids AS (SELECT i FROM generate_series(0, 399) t(i)),
s AS (SELECT i, printf('img-%012d', i) AS sid FROM ids),
f AS (SELECT i, list_reduce(
        list_prepend(CAST(14695981039346656037 AS HUGEINT),
          list_transform(generate_series(1, LENGTH(sid)), j -> ascii(substr(sid, j, 1)))),
        """ + _FNV_STEP + """) AS HVAL
      FROM s),
m AS (SELECT i, """ + _SPLITMIX_SQL + """ AS h FROM f),
p AS (SELECT CAST((h % 4294967296) >> 30 AS INT) AS x,
             CAST(((h // 4294967296) % 4294967296) >> 30 AS INT) AS y FROM m)
SELECT 2 AS z, x, y, COUNT(*) AS n_images
FROM p GROUP BY x, y ORDER BY x, y
""")




def _image_pyramid_sql(n: int = 4000, maxzoom: int = 8,
                       droprate: float = 2.5,
                       hotspot_frac: float = 0.2,
                       n_hotspots: int = 4) -> str:
    """Full image-pyramid oracle: fnv+splitmix geotag (with the hotspot
    remap, boxes embedded as literals from the seeded generator), the
    point quadkey index, and the reference's rate drop ladder
    (calc_feature_minzoom, main.cpp:299-350) as a FAITHFUL float scan —
    a recursive CTE stepping one feature per (index, seq) rank,
    carrying the per-level float counters, so accumulation rounding
    matches the engine bit-for-bit."""
    import math

    from ..stages.geotag import _hotspot_boxes
    from ..stages.minzoom import intervals

    boxes = _hotspot_boxes(n_hotspots)
    box_rows = ", ".join(
        f"({i}, {int(b[0])}, {int(b[1])}, {int(b[2])})"
        for i, b in enumerate(boxes)
    )
    iv = intervals(maxzoom, maxzoom, droprate)
    nl = maxzoom  # levels 0..maxzoom-1 carry counters; level maxzoom has interval 0
    bcols = ", ".join(f"b{i}" for i in range(nl))
    base_state = ", ".join(f"CAST({-iv[i]!r} AS DOUBLE) AS b{i}" for i in range(nl))
    # first failing level descending = the CASE chain top-down
    mz_expr = "CASE " + " ".join(
        f"WHEN b{i} + m < 0 THEN {i + 1}" for i in range(nl - 1, -1, -1)
    ) + " ELSE 0 END"
    upd = ", ".join(
        f"b{i} - (CASE WHEN mz <= {i} THEN CAST({iv[i]!r} AS DOUBLE) ELSE 0 END) AS b{i}"
        for i in range(nl)
    )
    hot_cut = int(hotspot_frac * 10_000)
    gs = max(0, 32 - 12 - maxzoom)  # geometry_scale (detail 12 default)
    w = 32 - gs  # snapped-plane bit width
    qk = _quadkey_sql("(wx - (wx % 2))", "(wy - (wy % 2))")
    sm_h = _SPLITMIX_SQL
    sm_h2 = _SPLITMIX_SQL.replace("HVAL", "SMH")
    return f"""
WITH RECURSIVE
ids AS (SELECT unnest(range(0, {n})) AS i),
s AS (SELECT i, printf('img-%012d', i) AS sid FROM ids),
f AS (SELECT i, list_reduce(
        list_prepend(CAST(14695981039346656037 AS HUGEINT),
          list_transform(generate_series(1, LENGTH(sid)), j -> ascii(substr(sid, j, 1)))),
        {_FNV_STEP}) AS HVAL
      FROM s),
m1 AS (SELECT i, {sm_h} AS SMH FROM f),
m2 AS (SELECT i, SMH, {sm_h2} AS h2 FROM m1),
boxes(bid, x0, y0, span) AS (VALUES {box_rows}),
geo AS (
  SELECT m2.i AS seq,
         CASE WHEN (h2 % 10000) < {hot_cut}
              THEN b.x0 + CAST(trunc((CAST(SMH % 4294967296 AS DOUBLE) / 4294967296.0) * b.span) AS BIGINT)
              ELSE CAST(SMH % 4294967296 AS BIGINT) END AS wx,
         CASE WHEN (h2 % 10000) < {hot_cut}
              THEN b.y0 + CAST(trunc((CAST((SMH // 4294967296) % 4294967296 AS DOUBLE) / 4294967296.0) * b.span) AS BIGINT)
              ELSE CAST((SMH // 4294967296) % 4294967296 AS BIGINT) END AS wy
  FROM m2 JOIN boxes b ON b.bid = CAST((h2 // 65536) % {n_hotspots} AS BIGINT)),
ranked AS (
  SELECT ((wx + {1 << (gs - 1)}) >> {gs}) AS sx,
         ((wy + {1 << (gs - 1)}) >> {gs}) AS sy,
         ROW_NUMBER() OVER (ORDER BY {qk}, seq) AS rk
  FROM geo),
lad AS (
  SELECT 1 AS m, 0 AS mz, {base_state}
  UNION ALL
  SELECT m, mz, {upd}
  FROM (SELECT m + 1 AS m, {mz_expr.replace('+ m ', '+ (m + 1) ')} AS mz, {bcols}
        FROM lad WHERE m < {n})),
feat AS (
  SELECT r.sx, r.sy, r.rk, l.mz FROM ranked r JOIN lad l ON l.m = r.rk),
zs AS (SELECT unnest(range(0, {maxzoom + 1})) AS z),
-- tile membership via SNAPPED coords with INCLUSIVE tile bounds
-- (clip_point clip.cpp:84-104): a snapped coordinate exactly on a
-- tile boundary belongs to BOTH adjacent tiles
memx AS (
  SELECT z, (sx >> ({w} - z)) AS x, sx, sy, rk, mz
  FROM feat CROSS JOIN zs WHERE (sx >> ({w} - z)) <= (1 << z) - 1
  UNION ALL
  SELECT z, (sx >> ({w} - z)) - 1, sx, sy, rk, mz
  FROM feat CROSS JOIN zs
  WHERE sx % (1 << ({w} - z)) = 0 AND sx >= (1 << ({w} - z))),
mem AS (
  SELECT z, x, (sy >> ({w} - z)) AS y, rk, mz
  FROM memx WHERE (sy >> ({w} - z)) <= (1 << z) - 1
  UNION ALL
  SELECT z, x, (sy >> ({w} - z)) - 1, rk, mz
  FROM memx
  WHERE sy % (1 << ({w} - z)) = 0 AND sy >= (1 << ({w} - z))),
-- per tile: ladder survivors plus the always-kept FIRST feature of the
-- tile (next_feature keep slot, tile.cpp:1290-1319)
tiles AS (
  SELECT z, x, y,
         SUM(CASE WHEN mz <= z THEN 1 ELSE 0 END)
         + (CASE WHEN MIN(CASE WHEN mz <= z THEN rk END) IS NULL
                   OR MIN(rk) < MIN(CASE WHEN mz <= z THEN rk END)
                 THEN 1 ELSE 0 END) AS nf
  FROM mem GROUP BY 1, 2, 3)
SELECT CAST(z AS INT) AS z, CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(SUM(nf) AS BIGINT) AS n_features
FROM tiles GROUP BY z ORDER BY z
"""


# embedding near-dup oracle: brute-force cosine over the union corpus
# (base ∪ fp32-jittered copies). Faithful because (a) the jitter is a
# pure fp32 scale, so DuckDB FLOAT arithmetic reproduces the engine's
# np.float32 values bit-for-bit (validated), and (b) sign-LSH has full
# recall for scale-identical vectors: both copies project to identical
# signs, so they always share the primary bucket.
EMB_NEAR_DUP_SQL = """
WITH u AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         CAST(list_transform(CAST(embedding AS FLOAT[]),
                             x -> x * CAST(1.0001 AS FLOAT)) AS DOUBLE[])
  FROM embeddings),
p AS (
  SELECT x.id AS a, y.id AS b, list_cosine_similarity(x.v, y.v) AS cos
  FROM u x JOIN u y ON x.id < y.id)
SELECT a, b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.999
ORDER BY a, b
"""


def _lsh_ann_sql(dim: int = 64, n_planes: int = 6, seed: int = 42) -> str:
    """Pruned-read LSH ANN oracle: models the ALGORITHM, not just the
    answer — the sign-LSH bucket of every vector (projection planes
    embedded as literals from the seeded generator, bit j of the bucket
    at position n_planes-1-j per _bucket_of), the query's Hamming<=1
    multi-probe neighborhood, and top-10 by cosine within the pruned
    set. Matches lsh_topk_indexed including its recall misses."""
    rs = np.random.RandomState(seed)
    planes = rs.randn(dim, n_planes)
    rows = ", ".join(
        f"({j}, [{', '.join(repr(v) for v in planes[:, j])}])"
        for j in range(n_planes)
    )
    probes = ", ".join(str(1 << j) for j in range(n_planes))
    return f"""
WITH planes(j, p) AS (VALUES {rows}),
b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sig AS (
  SELECT b.vec_id,
         CAST(SUM(CASE WHEN list_inner_product(b.v, pl.p) > 0
                       THEN (1 << ({n_planes - 1} - pl.j)) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM b CROSS JOIN planes pl GROUP BY b.vec_id),
q AS (SELECT s.bucket AS qb, b.v AS qv FROM sig s JOIN b ON b.vec_id = s.vec_id
      WHERE s.vec_id = 0),
allowed AS (
  SELECT qb AS bkt FROM q
  UNION ALL
  SELECT xor(qb, f) FROM q CROSS JOIN (SELECT unnest([{probes}]) AS f)),
pruned AS (
  SELECT s.vec_id, b.v FROM sig s JOIN b ON b.vec_id = s.vec_id
  WHERE s.bucket IN (SELECT bkt FROM allowed))
SELECT CAST(0 AS BIGINT) AS query_id, vec_id,
       ROUND(list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS cosine
FROM pruned
ORDER BY list_cosine_similarity(v, (SELECT qv FROM q)) DESC, vec_id
LIMIT 10
"""


def _ivf_ann_sql(dim: int = 64, n_lists: int = 8, n_iters: int = 2,
                 n_probe: int = 2) -> str:
    """IVF ANN oracle: models the ALGORITHM — the deterministic
    spherical k-means of build_ivf_index (init = the n_lists smallest
    vec_ids normalized + rounded to 6dp, each Lloyd iteration unrolled
    as assignment → elementwise AVG → L2-normalize → ROUND 6dp, empty
    lists carrying the previous centroid), the query's top-n_probe
    lists, and top-10 by cosine within the pruned set — including any
    recall misses. The 6dp centroid quantization at every step is what
    makes the float math engine-independent."""
    avg_terms = ", ".join(f"AVG(v[{i}])" for i in range(1, dim + 1))
    iters = []
    for it in range(1, n_iters + 1):
        prev = f"c{it - 1}"
        iters.append(f"""
a{it} AS (
  SELECT vec_id, v, list_id FROM (
    SELECT b.vec_id, b.v, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_inner_product(b.v, c.c) DESC, c.list_id) AS rn
    FROM b CROSS JOIN {prev} c) WHERE rn = 1),
m{it} AS (SELECT list_id, [{avg_terms}] AS m FROM a{it} GROUP BY list_id),
c{it} AS (
  SELECT list_id,
         list_transform(m, x -> ROUND(x / sqrt(list_inner_product(m, m)), 6)) AS c
  FROM m{it}
  UNION ALL
  SELECT p.list_id, p.c FROM {prev} p
  WHERE p.list_id NOT IN (SELECT list_id FROM m{it}))""")
    last = f"c{n_iters}"
    return f"""
WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
b AS (SELECT vec_id,
             list_transform(x, e -> e / sqrt(list_inner_product(x, x))) AS v
      FROM raw),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id,
         list_transform(v, x -> ROUND(x, 6)) AS c
  FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT {n_lists})),{",".join(iters)},
fa AS (
  SELECT vec_id, list_id FROM (
    SELECT b.vec_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_inner_product(b.v, c.c) DESC, c.list_id) AS rn
    FROM b CROSS JOIN {last} c) WHERE rn = 1),
q AS (SELECT v AS qv FROM b WHERE vec_id = 0),
ql AS (
  SELECT list_id FROM (
    SELECT c.list_id,
           ROW_NUMBER() OVER (
             ORDER BY list_inner_product((SELECT qv FROM q), c.c) DESC,
                      c.list_id) AS rn
    FROM {last} c) WHERE rn <= {n_probe}),
qraw AS (SELECT x AS qx FROM raw WHERE vec_id = 0),
top AS (
  SELECT r.vec_id,
         ROUND(list_cosine_similarity(r.x, (SELECT qx FROM qraw)), 4) AS cosine
  FROM raw r JOIN fa ON fa.vec_id = r.vec_id
  WHERE fa.list_id IN (SELECT list_id FROM ql)
  ORDER BY list_cosine_similarity(r.x, (SELECT qx FROM qraw)) DESC, r.vec_id
  LIMIT 10)
SELECT vec_id, cosine FROM top ORDER BY vec_id
"""


def _ngram_jaccard_sql(k: int = 12, threshold: float = 0.8,
                       sample_mod: int = 8, max_bucket: int = 64) -> str:
    """Exact n-gram-blocking oracle: models ngram_jaccard_pairs end to
    end — per-doc distinct k-shingle FNV-1a hashes, the deterministic
    hash%%sample_mod==0 shingle sample as the blocking key, the
    per-bucket first-max_bucket-ids cap, and the exact-Jaccard verify
    over the FULL shingle sets. Matches the engine including any
    sampling recall misses."""
    return f"""
WITH docs AS (
  SELECT doc_id AS id, COALESCE(text, '') AS txt FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, '') FROM documents),
sh AS (
  SELECT id,
    CASE WHEN LENGTH(txt) = 0 THEN CAST([] AS HUGEINT[])
         WHEN LENGTH(txt) < {k} THEN [{_fnv_of_hex("hex(encode(txt))")}]
         ELSE list_distinct(list_transform(
           list_transform(generate_series(1, LENGTH(txt) - {k - 1}),
                          i -> hex(encode(substr(txt, i, {k})))),
           ghx -> {_fnv_of_hex("ghx")}))
    END AS hs
  FROM docs),
shu AS (SELECT id, unnest(hs) AS h FROM sh),
buck AS (
  SELECT DISTINCT CAST(h // 2 AS BIGINT) AS bucket, id
  FROM shu WHERE h % {sample_mod} = 0),
bcap AS (
  SELECT bucket, id FROM buck
  QUALIFY row_number() OVER (PARTITION BY bucket ORDER BY id) <= {max_bucket}),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bcap x JOIN bcap y ON x.bucket = y.bucket AND x.id < y.id),
sizes AS (SELECT id, LEN(hs) AS nsh FROM sh),
-- shared-shingle count per candidate pair via one hash join over the
-- unnested shingles (a zero-intersection pair can never reach the
-- threshold, so inner-join semantics are exact here)
vi AS (
  SELECT c.a, c.b, COUNT(*) AS inter
  FROM cand c
  JOIN shu sa ON sa.id = c.a
  JOIN shu sb ON sb.id = c.b AND sb.h = sa.h
  GROUP BY c.a, c.b),
jc AS (
  SELECT v.a, v.b,
         CAST(v.inter AS DOUBLE) / (za.nsh + zb.nsh - v.inter) AS jac
  FROM vi v JOIN sizes za ON za.id = v.a JOIN sizes zb ON zb.id = v.b
  WHERE za.nsh > 0 AND zb.nsh > 0)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       ROUND(jac, 6) AS jaccard
FROM jc WHERE jac >= {threshold}
ORDER BY a, b
"""


def _simhash_sql(max_hamming: int = 3) -> str:
    """All-pairs simhash oracle: reproduces simhash64 (whitespace
    tokens, FNV-1a per occurrence, per-bit vote, sign) in SQL, then
    brute-forces every pair's Hamming distance. Faithful vs the banded
    engine because a pair within Hamming <= bands-1 (=3) ALWAYS shares
    at least one exact band (pigeonhole) — the LSH path has 100% recall
    at max_hamming=3/4 bands."""
    lo_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    hi_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
    )
    return f"""
WITH docs AS (
  SELECT doc_id AS id, COALESCE(text, '') AS txt FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, '') FROM documents),
tok AS (
  SELECT id, unnest(list_filter(regexp_split_to_array(txt, '\\s+'),
                                x -> x <> '')) AS tk
  FROM docs),
th AS (
  SELECT id, {_fnv_of_hex("hex(encode(tk))")} AS h FROM tok),
sg0 AS (
  SELECT id, CAST({lo_bits} AS BIGINT) AS lo, CAST({hi_bits} AS BIGINT) AS hi
  FROM th GROUP BY id),
sg AS (
  SELECT d.id, COALESCE(s.lo, 0) AS lo, COALESCE(s.hi, 0) AS hi
  FROM docs d LEFT JOIN sg0 s ON d.id = s.id)
SELECT x.id AS a, y.id AS b,
       CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS BIGINT)
         AS hamming
FROM sg x JOIN sg y ON x.id < y.id
WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= {max_hamming}
ORDER BY a, b
"""


def _sm64_sql(x: str) -> str:
    """splitmix64 of a HUGEINT-held uint64 SQL expression (mirrors
    functions/hashing.py:splitmix64): the two 64-bit-constant
    multiplies go through _mulmod64 (INT128-safe), xors/shifts stay in
    HUGEINT. The input expression is referenced multiple times — pass
    a column reference, not a computed expression."""
    z1 = f"((({x}) + 11400714819323198485) % 18446744073709551616)"
    x1 = f"xor({z1}, ({z1}) // {1 << 30})"
    z2 = f"({_mulmod64(x1, 0xBF58476D1CE4E5B9)})"
    x2 = f"xor({z2}, ({z2}) // {1 << 27})"
    z3 = f"({_mulmod64(x2, 0x94D049BB133111EB)})"
    return f"xor({z3}, ({z3}) // {1 << 31})"


def _components_sql(max_hamming: int = 3) -> str:
    """Dedup-group oracle: the all-pairs simhash model produces the
    edge list, a recursive label-propagation CTE computes each node's
    reachable-minimum label (the component id), and groups count
    members."""
    lo_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    hi_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
    )
    return f"""
WITH RECURSIVE
docs AS (
  SELECT doc_id AS id, COALESCE(text, '') AS txt FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, '') FROM documents),
tok AS (
  SELECT id, unnest(list_filter(regexp_split_to_array(txt, '\\s+'),
                                x -> x <> '')) AS tk
  FROM docs),
th AS (
  SELECT id, {_fnv_of_hex("hex(encode(tk))")} AS h FROM tok),
sg0 AS (
  SELECT id, CAST({lo_bits} AS BIGINT) AS lo, CAST({hi_bits} AS BIGINT) AS hi
  FROM th GROUP BY id),
sg AS (
  SELECT d.id, COALESCE(s.lo, 0) AS lo, COALESCE(s.hi, 0) AS hi
  FROM docs d LEFT JOIN sg0 s ON d.id = s.id),
pr AS (
  SELECT x.id AS a, y.id AS b
  FROM sg x JOIN sg y ON x.id < y.id
  WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
        <= {max_hamming}),
edges AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
nodes AS (SELECT DISTINCT a AS node FROM edges),
cc(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, c.label FROM cc c JOIN edges e ON c.node = e.a),
lab AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)
SELECT component, COUNT(*) AS n_members
FROM lab GROUP BY component ORDER BY component
"""


def _dedup_filtered_sql(max_hamming: int = 3) -> str:
    """Filtered-corpus oracle: the components model names every
    non-canonical member (node != component); dropping them from the
    doubled corpus and counting per language mirrors the engine's
    broadcast-filter exactly."""
    lo_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    hi_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
    )
    return f"""
WITH RECURSIVE
docs AS (
  SELECT doc_id AS id, COALESCE(text, '') AS txt, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, ''), lang FROM documents),
tok AS (
  SELECT id, unnest(list_filter(regexp_split_to_array(txt, '\\s+'),
                                x -> x <> '')) AS tk
  FROM docs),
th AS (
  SELECT id, {_fnv_of_hex("hex(encode(tk))")} AS h FROM tok),
sg0 AS (
  SELECT id, CAST({lo_bits} AS BIGINT) AS lo, CAST({hi_bits} AS BIGINT) AS hi
  FROM th GROUP BY id),
sg AS (
  SELECT d.id, COALESCE(s.lo, 0) AS lo, COALESCE(s.hi, 0) AS hi
  FROM docs d LEFT JOIN sg0 s ON d.id = s.id),
pr AS (
  SELECT x.id AS a, y.id AS b
  FROM sg x JOIN sg y ON x.id < y.id
  WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
        <= {max_hamming}),
edges AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
nodes AS (SELECT DISTINCT a AS node FROM edges),
cc(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, c.label FROM cc c JOIN edges e ON c.node = e.a),
lab AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)
SELECT lang, COUNT(*) AS n_docs
FROM docs
WHERE id NOT IN (SELECT node FROM lab WHERE node <> component)
GROUP BY lang ORDER BY lang
"""


def _aspect_sql() -> str:
    """Aspect-bucket oracle: the same exact integer cross-product
    misfit (GREATEST(w*q, h*p) / LEAST(...)) argmin'd per image with
    the bucket-index tie-break, then counted per label."""
    vals = ", ".join(
        f"({i}, {p}, {q}, '{p}:{q}')"
        for i, (p, q) in enumerate(
            [(1, 4), (1, 2), (3, 4), (1, 1), (4, 3), (2, 1), (4, 1)]))
    return f"""
WITH base AS (
  SELECT doc_id, 64 + (doc_id % 5) * 16 AS w,
         64 + ((doc_id // 5) % 5) * 16 AS h
  FROM documents),
b(idx, p, q, label) AS (VALUES {vals}),
d AS (
  SELECT doc_id, label, idx,
         CAST(GREATEST(w * q, h * p) AS DOUBLE) / LEAST(w * q, h * p) AS f
  FROM base CROSS JOIN b),
r AS (
  SELECT doc_id, label,
         row_number() OVER (PARTITION BY doc_id ORDER BY f, idx) AS rn
  FROM d)
SELECT label AS bucket, COUNT(*) AS n_images
FROM r WHERE rn = 1 GROUP BY label ORDER BY bucket
"""


def _stratified_sql(k: int = 20) -> str:
    """Per-language smallest-k splitmix64(doc_id) ranks — a window
    rank over the exact hash model (ties impossible: splitmix64 is a
    bijection over distinct ids)."""
    sm = _sm64_sql("hv")
    return f"""
WITH base AS (
  SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS hv FROM documents),
r AS (SELECT doc_id, lang, {sm} AS rank FROM base),
w AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY rank) AS rn
      FROM r)
SELECT lang, doc_id FROM w WHERE rn <= {k} ORDER BY lang, doc_id
"""


def _chunks_sql(size: int = 24, stride: int = 16) -> str:
    """Chunking oracle: 1-based inclusive DuckDB list slices reproduce
    the 0-based Python windows (toks[k*stride+1 : k*stride+size] is
    `size` elements, clamped at the list end), FNV-1a over the
    single-space rejoin, signed-BIGINT view of the hash."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents),
n AS (SELECT doc_id, toks, LEN(toks) AS n FROM t WHERE LEN(toks) > 0),
c AS (
  SELECT doc_id, unnest(generate_series(0, (n - 1) // {stride})) AS k,
         toks FROM n),
s AS (
  SELECT doc_id, k AS chunk_idx,
         toks[k * {stride} + 1 : k * {stride} + {size}] AS chunk
  FROM c),
h AS (
  SELECT doc_id, chunk_idx, LEN(chunk) AS n_tokens,
         hex(encode(array_to_string(chunk, ' '))) AS hx
  FROM s),
f AS (
  SELECT doc_id, chunk_idx, n_tokens, {_fnv_of_hex('hx')} AS fnv FROM h)
SELECT doc_id, chunk_idx, n_tokens,
  CAST(fnv - (CASE WHEN fnv >= 9223372036854775808
              THEN 18446744073709551616 ELSE 0 END) AS BIGINT)
    AS chunk_hash
FROM f ORDER BY doc_id, chunk_idx
"""


def _crossmodal_sql(max_hamming: int = 3) -> str:
    """Cross-modal oracle: the all-pairs simhash model (text) joined
    with the all-pairs phash model (image) over the SAME doubled id
    space — a pair survives only if both Hamming distances are within
    bound, exactly the engine's intersection (both banded paths have
    full recall at Hamming <= 3 by pigeonhole, so all-pairs ==
    banded-then-verified)."""
    lo_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    hi_bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
    )
    sm = _sm64_sql("hv")
    return f"""
WITH docs AS (
  SELECT doc_id AS id, COALESCE(text, '') AS txt FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, '') FROM documents),
tok AS (
  SELECT id, unnest(list_filter(regexp_split_to_array(txt, '\\s+'),
                                x -> x <> '')) AS tk
  FROM docs),
th AS (
  SELECT id, {_fnv_of_hex("hex(encode(tk))")} AS h FROM tok),
sg0 AS (
  SELECT id, CAST({lo_bits} AS BIGINT) AS lo, CAST({hi_bits} AS BIGINT) AS hi
  FROM th GROUP BY id),
sg AS (
  SELECT d.id, COALESCE(s.lo, 0) AS lo, COALESCE(s.hi, 0) AS hi
  FROM docs d LEFT JOIN sg0 s ON d.id = s.id),
tp AS (
  SELECT x.id AS a, y.id AS b,
         CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
              AS BIGINT) AS text_hamming
  FROM sg x JOIN sg y ON x.id < y.id
  WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
        <= {max_hamming}),
pbase AS (
  SELECT id, CAST((id % 100000) // 4 AS HUGEINT) AS hv,
         CAST((id % 100000) % 4 AS HUGEINT) AS lowbits
  FROM docs),
pg AS (SELECT id, xor({sm}, lowbits) AS ph FROM pbase),
psg AS (SELECT id, CAST(ph % 4294967296 AS BIGINT) AS lo,
               CAST(ph // 4294967296 AS BIGINT) AS hi FROM pg),
ip AS (
  SELECT x.id AS a, y.id AS b,
         CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
              AS BIGINT) AS phash_hamming
  FROM psg x JOIN psg y ON x.id < y.id
  WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
        <= {max_hamming})
SELECT tp.a, tp.b, tp.text_hamming, ip.phash_hamming
FROM tp JOIN ip ON tp.a = ip.a AND tp.b = ip.b
ORDER BY tp.a, tp.b
"""


def _phash_sql(max_hamming: int = 3) -> str:
    """All-pairs phash near-dup oracle: reproduces the planted-replica
    phash (splitmix64(doc_id // 4) xor (doc_id % 4)) in HUGEINT, splits
    it into 32-bit halves for BIGINT bit_count, and keeps pairs with
    true Hamming <= max_hamming. The engine's 4x16 banding has full
    recall at Hamming <= 3 (pigeonhole), so all-pairs == banded."""
    sm = _sm64_sql("hv")
    return f"""
WITH base AS (
  SELECT doc_id, CAST(doc_id // 4 AS HUGEINT) AS hv,
         CAST(doc_id % 4 AS HUGEINT) AS lowbits
  FROM documents),
g AS (SELECT doc_id, xor({sm}, lowbits) AS ph FROM base),
sg AS (SELECT doc_id, CAST(ph % 4294967296 AS BIGINT) AS lo,
              CAST(ph // 4294967296 AS BIGINT) AS hi FROM g)
SELECT printf('img-%012d', x.doc_id) AS a,
       printf('img-%012d', y.doc_id) AS b,
       CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS BIGINT)
         AS hamming
FROM sg x JOIN sg y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= {max_hamming}
ORDER BY a, b
"""


def _minhash_sql(num_perm: int = 64, bands: int = 16, k: int = 5,
                 seed: int = 42, threshold: float = 0.8,
                 max_bucket: int = 512) -> str:
    """Capped-bucket MinHash-LSH oracle: models the ALGORITHM end to
    end, the way _lsh_ann_sql models the pruned read — per-doc distinct
    k-shingle FNV-1a hashes, the 64 splitmix-salted xor-permutation
    minhashes (salts inlined from the seeded generator), the 16
    chained-splitmix band keys, the per-bucket first-512-ids cap
    (_pairs_within_groups), and the exact-Jaccard >= threshold verify.
    Matches minhash_lsh_pairs including any banding recall misses."""
    from ..functions.hashing import splitmix64 as _sm

    salts = _sm(np.arange(seed, seed + num_perm, dtype=np.uint64))
    salt_rows = ", ".join(
        f"({p}, CAST({int(s)} AS HUGEINT))" for p, s in enumerate(salts)
    )
    rpb = num_perm // bands
    u64max = (1 << 64) - 1
    # chained band key: k1 = sm(s0 + band); k_{j+1} = sm(k_j ^ s_j)
    key_steps = [f"k1 AS (SELECT id, band, {_sm64_sql('x0')} AS k, "
                 + ", ".join(f"s{j}" for j in range(1, rpb))
                 + " FROM bx)"]
    for j in range(1, rpb):
        carry = ", ".join(f"s{i}" for i in range(j + 1, rpb))
        key_steps.append(
            f"kx{j} AS (SELECT id, band, xor(k, s{j}) AS x"
            + (", " + carry if carry else "") + f" FROM k{j})")
        key_steps.append(
            f"k{j + 1} AS (SELECT id, band, {_sm64_sql('x')} AS k"
            + (", " + carry if carry else "") + f" FROM kx{j})")
    sig_cols = ", ".join(
        f"MAX(CASE WHEN p % {rpb} = {j} THEN mh END) AS s{j}"
        for j in range(rpb)
    )
    return f"""
WITH salts(p, salt) AS (VALUES {salt_rows}),
docs AS (
  SELECT doc_id AS id, COALESCE(text, '') AS txt FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, '') FROM documents),
sh AS (
  SELECT id,
    CASE WHEN LENGTH(txt) = 0 THEN CAST([] AS HUGEINT[])
         WHEN LENGTH(txt) < {k} THEN [{_fnv_of_hex("hex(encode(txt))")}]
         ELSE list_distinct(list_transform(
           list_transform(generate_series(1, LENGTH(txt) - {k - 1}),
                          i -> hex(encode(substr(txt, i, {k})))),
           ghx -> {_fnv_of_hex("ghx")}))
    END AS hs
  FROM docs),
shu AS (SELECT id, unnest(hs) AS h FROM sh),
dh AS (SELECT DISTINCT h FROM shu),
-- splitmix64 staged column-by-column (a nested expression re-evaluates
-- the whole chain ~32x per row; the staged form is one op per stage)
p0 AS (SELECT h, p, salt, xor(h, salt) AS z FROM dh CROSS JOIN salts),
p1 AS (SELECT h, p, (z + 11400714819323198485) % 18446744073709551616 AS z FROM p0),
p2 AS (SELECT h, p, xor(z, z // {1 << 30}) AS z FROM p1),
p3 AS (SELECT h, p, {_mulmod64("z", 0xBF58476D1CE4E5B9)} AS z FROM p2),
p4 AS (SELECT h, p, xor(z, z // {1 << 27}) AS z FROM p3),
p5 AS (SELECT h, p, {_mulmod64("z", 0x94D049BB133111EB)} AS z FROM p4),
p6 AS (SELECT h, p, xor(z, z // {1 << 31}) AS z FROM p5),
mh0 AS (
  SELECT shu.id, p6.p, MIN(p6.z) AS mh
  FROM shu JOIN p6 ON p6.h = shu.h GROUP BY shu.id, p6.p),
mh AS (
  SELECT d.id, s.p, COALESCE(m.mh, CAST({u64max} AS HUGEINT)) AS mh
  FROM docs d CROSS JOIN salts s
  LEFT JOIN mh0 m ON m.id = d.id AND m.p = s.p),
bnd AS (
  SELECT id, p // {rpb} AS band, {sig_cols}
  FROM mh GROUP BY id, p // {rpb}),
bx AS (SELECT id, band, (s0 + band) % 18446744073709551616 AS x0,
       {", ".join(f"s{j}" for j in range(1, rpb))} FROM bnd),
{", ".join(key_steps)},
buck AS (
  SELECT DISTINCT CAST(k // 2 AS BIGINT) AS bucket, id FROM k{rpb}),
bcap AS (
  SELECT bucket, id FROM buck
  QUALIFY row_number() OVER (PARTITION BY bucket ORDER BY id) <= {max_bucket}),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bcap x JOIN bcap y ON x.bucket = y.bucket AND x.id < y.id),
vi AS (
  SELECT c.a, c.b, LEN(list_intersect(sa.hs, sb.hs)) AS inter,
         LEN(sa.hs) AS na, LEN(sb.hs) AS nb
  FROM cand c JOIN sh sa ON sa.id = c.a JOIN sh sb ON sb.id = c.b
  WHERE LEN(sa.hs) > 0 AND LEN(sb.hs) > 0),
jc AS (
  SELECT a, b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jac FROM vi)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       ROUND(jac, 6) AS jaccard
FROM jc WHERE jac >= {threshold}
ORDER BY a, b
"""


def vector_squares_q(sf_dir: str) -> pd.DataFrame:
    """Vector pyramid over lcg-derived axis-aligned squares: for
    rectangles the cascade's per-tile survival test (parent-clipped
    geometry nonempty in tile+buffer, tile.cpp:974-1057) reduces to a
    closed bbox intersection — making the per-tile feature counts of
    the FULL cascade SQL-expressible exactly."""
    from .vector_pyramid import (
        VectorConfig, build_vector_pyramid, features_table, ingest_features,
    )
    from ..stages.geotag import lcg_world

    t = _read_small(sf_dir, "documents", ["doc_id"])
    ids = t["doc_id"].to_numpy()
    wx, wy = lcg_world(ids)
    margin = 1 << 27
    lo, hi = margin, (1 << 32) - margin
    cx = np.clip(wx, lo, hi).astype(np.int64)
    cy = np.clip(wy, lo, hi).astype(np.int64)
    half = ((1 << 23) + (ids * 2654435761) % (1 << 25)).astype(np.int64)
    rows = []
    for i in range(len(ids)):
        x0, y0, x1, y1 = int(cx[i] - half[i]), int(cy[i] - half[i]), int(cx[i] + half[i]), int(cy[i] + half[i])
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], np.int64)
        rows.append((int(ids[i]), 3, np.array([1, 2, 2, 2, 2], np.uint8), ring))
    cfg = VectorConfig(maxzoom=4, geometry_scale=0)
    tiles = build_vector_pyramid(ingest_features(features_table(rows), cfg), cfg)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    df = df[df["n_features"] > 0]  # strategy-counter phantom rows
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


def _vector_squares_sql(maxzoom: int = 4, buf: int = 5) -> str:
    wx, wy = lcg_world_sql("doc_id")
    margin = 1 << 27
    return f"""
WITH sq AS (
  SELECT doc_id,
         GREATEST(LEAST(CAST({wx} AS BIGINT), {(1 << 32) - margin}), {margin}) AS cx,
         GREATEST(LEAST(CAST({wy} AS BIGINT), {(1 << 32) - margin}), {margin}) AS cy,
         CAST({1 << 23} + (doc_id * 2654435761) % {1 << 25} AS BIGINT) AS half
  FROM documents),
b AS (SELECT doc_id, cx - half AS x0, cy - half AS y0,
             cx + half AS x1, cy + half AS y1 FROM sq),
zlist AS (SELECT z FROM generate_series(0, {maxzoom}) t(z)),
spans AS (SELECT z, CAST(1 AS BIGINT) << (32 - z) AS span,
                 (CAST(1 AS BIGINT) << (32 - z)) * {buf} / 256 AS buf FROM zlist),
hx AS (
  SELECT b.doc_id, s.z, s.span, s.buf, b.y0, b.y1,
         unnest(generate_series(
           GREATEST(CAST(FLOOR(CAST(b.x0 - s.buf AS DOUBLE) / s.span) AS BIGINT), 0),
           LEAST(CAST(FLOOR(CAST(b.x1 + s.buf AS DOUBLE) / s.span) AS BIGINT),
                 (CAST(1 AS BIGINT) << s.z) - 1))) AS x
  FROM b CROSS JOIN spans s),
hy AS (
  SELECT z, x,
         unnest(generate_series(
           GREATEST(CAST(FLOOR(CAST(y0 - buf AS DOUBLE) / span) AS BIGINT), 0),
           LEAST(CAST(FLOOR(CAST(y1 + buf AS DOUBLE) / span) AS BIGINT),
                 (CAST(1 AS BIGINT) << z) - 1))) AS y
  FROM hx)
SELECT CAST(z AS INT) AS z, CAST(x AS INT) AS x, CAST(y AS INT) AS y,
       COUNT(*) AS n_features
FROM hy GROUP BY 1, 2, 3 ORDER BY z, x, y
"""


def vector_points_q(sf_dir: str) -> pd.DataFrame:
    """Vector cascade over LCG-placed POINT features at droprate 1:
    point clip survival is the closed buffered-interval test
    (clip_to_tile point branch, tile.cpp:1030-1037) plus the z0
    dateline ±360° duplication (tile.cpp:977-1001, which merges the
    copies into ONE multipoint feature), so the full cascade's
    per-tile feature counts are SQL-expressible exactly."""
    from .vector_pyramid import (
        VectorConfig, build_vector_pyramid, features_table, ingest_features,
    )
    from ..stages.geotag import lcg_world

    t = _read_small(sf_dir, "documents", ["doc_id"])
    ids = t["doc_id"].to_numpy()
    wx, wy = lcg_world(ids)
    rows = [
        (int(i), 1, np.array([1], np.uint8),
         np.array([[int(x), int(y)]], np.int64))
        for i, x, y in zip(ids, wx, wy)
    ]
    cfg = VectorConfig(maxzoom=5, droprate=1.0, geometry_scale=0)
    tiles = build_vector_pyramid(ingest_features(features_table(rows), cfg), cfg)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    df = df[df["n_features"] > 0]  # strategy-counter phantom rows
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


def _vector_points_sql(maxzoom: int = 5, buf: int = 5) -> str:
    """Oracle for vector_points_q: a feature lands in tile (z, x, y)
    iff ANY of its dateline copies (the original, plus wx±2^32 when
    within the z0 edge) satisfies the closed containment
    x*span - buf <= wx <= (x+1)*span + buf on both axes; copies of one
    doc in one tile count once (the engine merges them into one
    multipoint feature)."""
    wx, wy = lcg_world_sql("doc_id")
    world = 1 << 32
    edge = world * buf // 256  # z0 duplication edge == z0 buffer
    return f"""
WITH pts AS (
  SELECT doc_id, CAST({wx} AS BIGINT) AS wx, CAST({wy} AS BIGINT) AS wy
  FROM documents),
copies AS (
  SELECT doc_id, wx AS cwx, wy FROM pts
  UNION ALL
  SELECT doc_id, wx + {world}, wy FROM pts WHERE wx <= {edge}
  UNION ALL
  SELECT doc_id, wx - {world}, wy FROM pts WHERE wx >= {world - edge}),
spans AS (
  SELECT z, CAST(1 AS BIGINT) << (32 - z) AS span,
         ((CAST(1 AS BIGINT) << (32 - z)) * {buf}) // 256 AS bf
  FROM generate_series(0, {maxzoom}) t(z)),
hx AS (
  SELECT c.doc_id, s.z, s.span, s.bf, c.cwx, c.wy,
         unnest(generate_series(
           GREATEST((c.cwx - s.bf) // s.span - 1, 0),
           LEAST((c.cwx + s.bf) // s.span + 1,
                 (CAST(1 AS BIGINT) << s.z) - 1))) AS x
  FROM copies c CROSS JOIN spans s),
hxy AS (
  SELECT doc_id, z, span, bf, cwx, wy, x,
         unnest(generate_series(
           GREATEST((wy - bf) // span - 1, 0),
           LEAST((wy + bf) // span + 1,
                 (CAST(1 AS BIGINT) << z) - 1))) AS y
  FROM hx),
hit AS (
  SELECT DISTINCT doc_id, z, x, y FROM hxy
  WHERE x * span - bf <= cwx AND cwx <= (x + 1) * span + bf
    AND y * span - bf <= wy AND wy <= (y + 1) * span + bf)
SELECT CAST(z AS INT) AS z, CAST(x AS INT) AS x, CAST(y AS INT) AS y,
       COUNT(*) AS n_features
FROM hit GROUP BY 1, 2, 3 ORDER BY z, x, y
"""


def all_oracle_sql() -> dict:
    from . import vector_fixture as _vf

    return {
        # reference-binary fixture oracles: the committed parquet was
        # produced by decoding the reference tippecanoe's own tiles
        # over the identical corpus (tools/build_vector_oracle_fixtures.py)
        "vector_pyramid_counts": (
            "SELECT z, n_tiles, n_features "
            f"FROM read_parquet('{_vf.PYRAMID_FIXTURE}') ORDER BY z"
        ),
        "vector_tiles_z3": (
            "SELECT z, x, y, n_features "
            f"FROM read_parquet('{_vf.TILES_Z3_FIXTURE}') ORDER BY z, x, y"
        ),
        "guess_zoom_params": _guess_sql(),
        "overzoom_z3": _overzoom_sql(),
        "cluster_tiles": _cluster_sql(),
        "accumulate_sum_tiles": _accumulate_sql(),
        "coalesce_tiles": _coalesce_sql(),
        "pyramid_counts_keepall": _pyramid_sql(8),
        "tile_counts_z8": _pyramid_sql(8, z_filter="WHERE z = 8"),
        "hot_tiles_z6": (
            _pyramid_sql(6, z_filter="WHERE z = 6")
            + " ORDER BY n_features DESC, x, y LIMIT 20"
        ),
        "cell_counts_l6": _cell_sql_l6(),
        "bbox_join_counts": _bbox_sql(),
        "q1_pricing": Q1_SQL,
        "q3_top_orders": Q3_SQL,
        "q5_region_revenue": Q5_SQL,
        "semi_join_parts": SEMI_SQL,
        "anti_join_parts": ANTI_SQL,
        "orders_by_month": MONTH_SQL,
        "top_orders_by_price": TOPK_SQL,
        "events_tumbling_1h": TUMBLING_SQL,
        "sessions_30m": SESSIONS_SQL,
        "dedup_exact_union": DEDUP_SQL,
        "token_stats": TOKEN_SQL,
        "ann_top10": ANN_SQL,
        "embedding_norms": NORMS_SQL,
        "tilestats_documents": TILESTATS_SQL,
        "filter_events": FILTER_SQL,
        "quality_scores": QUALITY_SQL,
        "lang_id_accuracy": LANG_SQL,
        "doc_fingerprints": FINGERPRINT_SQL,
        "raster_tiles_z2": RASTER_SQL,
        "vector_squares_z4": _vector_squares_sql(),
        "vector_points_z5": _vector_points_sql(),
        "embedding_near_dup": EMB_NEAR_DUP_SQL,
        "lsh_ann_top10": _lsh_ann_sql(),
        "ivf_ann_top10": _ivf_ann_sql(),
        "ngram_jaccard_pairs": _ngram_jaccard_sql(),
        "video_frame_sample": VIDEO_FRAMES_SQL,
        "audio_features": AUDIO_FEATURES_SQL,
        "simhash_pairs": _simhash_sql(),
        "phash_near_dup": _phash_sql(),
        "crossmodal_pairs": _crossmodal_sql(),
        "doc_chunks": _chunks_sql(),
        "stratified_sample": _stratified_sql(),
        "aspect_buckets": _aspect_sql(),
        "dedup_components": _components_sql(),
        "dedup_filtered_counts": _dedup_filtered_sql(),
        "minhash_lsh_pairs": _minhash_sql(),
        "image_pyramid": _image_pyramid_sql(),
    }
