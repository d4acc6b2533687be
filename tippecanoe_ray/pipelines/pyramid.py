"""The tile pyramid: tippecanoe's group-by-tile pipeline, Ray-Data-first.

Dataflow (SURVEY.md §7; reference lifecycle main.cpp:1240 → tile.cpp
traverse_zooms — re-expressed, not ported):

  read/synth image table (payload columns pruned at the read)
   → map_batches: geotag + quadkey index  (vectorized, zero-copy)
   → [pass 1] per-bucket feature counts → driver prefix-sum = global
     rank offsets (tiny; broadcast via ray.put)
   → [pass 2] groupby(bucket = zoom-B tile key, ONE shuffle)
       .map_groups(BucketWorker):
         sort (index, seq) → global ranks → drop-ladder minzoom
         (rank-local kernel, no cross-partition chain) → for every
         z in B..maxzoom: tile runs are CONTIGUOUS index ranges
         (tile key = quadkey prefix ⇒ no extra sorts/shuffles per
         zoom) → keep rule → vectorized MVT encode → tile rows
         + two tiny side channels:
           · low-zoom survivors (the ladder keeps ~droprate^-(bz-z)
             of features at zoom z, so the z<B set is geometrically
             small — the same property that caps tippecanoe's
             dense-tile skew caps our shuffle skew)
           · cross-bucket boundary copies (see below)
   → low-zoom pass over the survivor set → tiles for z in minzoom..B-1
   → side-copy merge pass (splice boundary duplicates into tiles)
   → parquet sink partitioned by bucket (resumable: finished buckets
     are skipped on rerun; per-bucket lineage/metrics columns).

Exact-match semantics reproduced from the reference:

- keep rule per (tile, layer) (tile.cpp:1290-1319): the first feature
  in index order is always kept; every other feature needs
  z >= feature_minzoom. droprate=1 ⇒ keep-all.
- spatial index of a point = quadkey of (wx & ~1, wy & ~1)
  (serial.cpp:689-692 "loses one bit of precision at the bottom").
- geometry_scale snapping (main.cpp:3765-3770, serial.cpp:30):
  coordinates are stored as round(w / 2^G) with
  G = max(0, 32 - (full_detail + maxzoom)), i.e. snapped to multiples
  of 2^G on the world plane.
- inclusive tile clip (clip.cpp:84-104): a point exactly on a tile
  boundary (x or y ≡ 0 mod tile span — which snapping manufactures)
  is included in BOTH adjacent tiles. We model the duplicates as
  "ghost" copies: a feature with 2-adic valuation v of its snapped
  coordinate is a boundary feature for every zoom z >= 32 - v.
  Ghost copies whose tile lives in another zoom-B bucket are routed
  through a (rare: O(2^{G-18}) of rows) side-row channel and merged
  in a post-pass, including the first-feature-kept adjustment.
"""

from __future__ import annotations

import dataclasses
import io
import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc
import ray
import ray.data

from ..functions.spatial import _compact_bits64
from ..stages.geotag import Geotag
from ..stages.minzoom import minzoom_for_rank_range
from ..stages.mvt import _len_delim, _read_varint, _tag_varint
from ..stages.tile_encode import encode_point_features, encode_point_tiles

WORLD_BITS = 32

TILE_COLS = (
    "z", "x", "y", "n_features", "tile", "bucket", "kind",
    "min_index", "min_seq", "first_minzoom",
)


@dataclasses.dataclass
class PyramidConfig:
    minzoom: int = 0
    maxzoom: int = 14
    basezoom: int | None = None  # None → maxzoom (reference -B default)
    droprate: float = 2.5  # reference -r default (main.cpp:3198)
    bucket_zoom: int | None = None  # None → auto from row count
    layer_name: str = "points"
    detail: int = 12  # full_detail; extent = 2^detail = 4096
    geometry_scale: int | None = None  # None → max(0, 32-detail-maxzoom)
    encode_tiles: bool = True
    compress: bool = True
    emit_ids: bool = False  # carry kept feature seqs per tile (fixtures)
    hotspot_frac: float = 0.0
    n_hotspots: int = 4
    id_col: str = "image_id"
    rule: str = "fnv"
    seq_col: str | None = "seq"
    strategies: "object | None" = None  # stages.strategies.StrategyConfig
    retain_points_multiplier: int = 1  # --retain-points-multiplier
    fmin_col: str | None = None  # per-feature tippecanoe minzoom column
    fmax_col: str | None = None  # per-feature tippecanoe maxzoom column
    # --drop-denser=N: N% of features (ix %% 100 < N) get their minzoom
    # from a GLOBAL gap ranking instead of the rate ladder
    # (main.cpp:2692-2727); the rest ride the ladder over the
    # non-selected subsequence
    drop_denser: int = 0
    # --accumulate-attribute: (numeric column, op) — dropped/clustered
    # features fold their value onto the survivor (preserve_attributes,
    # tile.cpp:1544-1574 + attribute.cpp:92-180)
    attr_accum: tuple[str, str] | None = None
    # numeric attribute column for --drop-by-attribute-as-needed
    # (threaded like attr_accum but without output folding)
    attr_col: str | None = None
    # -K cluster stats: clustered/point_count/sqrt_point_count/
    # point_count_abbreviated (tile.cpp:2420-2451)
    cluster_stats: bool = False
    # -ag: emit tippecanoe_feature_density 0-255 (tile.cpp:2147-2157)
    calculate_density: bool = False
    # emit tippecanoe:retain_points_multiplier_first/_sequence tags so
    # overzoom -m can re-thin clusters (tile.cpp:2237-2240, 2390-2414)
    multiplier_tags: bool = False
    # per-tile output ordering (tile.cpp:2583-2593): order by the
    # threaded attribute column (--order-by / --order-descending-by)
    # or restore input sequence (-pi)
    order_by_attr: bool = False
    order_descending: bool = False
    preserve_input_order: bool = False
    # -ac: merge consecutive identical-attribute features into one
    # multipoint feature (tile.cpp:2524-2546)
    coalesce: bool = False
    # emit the raw/folded attribute value on every feature
    emit_attr: bool = False

    def val_col(self) -> str | None:
        if self.attr_accum:
            return self.attr_accum[0]
        return self.attr_col

    def resolved_basezoom(self) -> int:
        return self.maxzoom if self.basezoom is None else self.basezoom

    def resolved_gscale(self) -> int:
        if self.geometry_scale is not None:
            return self.geometry_scale
        return max(0, WORLD_BITS - (self.detail + self.maxzoom))


def auto_bucket_zoom(n_rows: int, maxzoom: int, target_rows: int = 65536) -> int:
    """Bucket granularity: ~target_rows per zoom-B subtree. Small enough
    for load balance (4^B ≫ cores), big enough that per-bucket fixed
    costs (15 zoom passes of numpy setup) amortize."""
    b = 0
    while (4 ** (b + 1)) * target_rows <= n_rows and b + 1 <= maxzoom:
        b += 1
    return min(b + 2, maxzoom)  # a few levels finer than strictly needed


def snap_coords(w: np.ndarray, gscale: int) -> np.ndarray:
    """round(w / 2^G) * 2^G — SHIFT_RIGHT then SHIFT_LEFT
    (serial.cpp:30-31; std::round = half away from zero; w >= 0)."""
    if gscale == 0:
        return np.asarray(w, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    return ((w + (1 << (gscale - 1))) >> gscale) << gscale


def boundary_zoom(sw: np.ndarray) -> np.ndarray:
    """Lowest zoom at which the snapped coordinate sits exactly on a
    tile boundary: 32 - v2(sw); 64 where sw == 0 (world edge, no left/
    up neighbor)."""
    sw = np.asarray(sw, dtype=np.int64)
    low = np.maximum(sw & -sw, 1)
    with np.errstate(divide="ignore"):
        v = np.where(sw > 0, np.log2(low.astype(np.float64)).astype(np.int64), 64)
    return np.where(sw > 0, WORLD_BITS - v, 64).astype(np.int16)


def geotag_narrow(ds: ray.data.Dataset, cfg: PyramidConfig) -> ray.data.Dataset:
    """Geotag then project to the narrow tiling columns — shuffles move
    ids and coordinates, never image payloads."""
    tag = Geotag(id_col=cfg.id_col, rule=cfg.rule, curve="quadkey",
                 hotspot_frac=cfg.hotspot_frac, n_hotspots=cfg.n_hotspots,
                 seq_col=cfg.seq_col)
    cols = ["wx", "wy", "index", "seq"]
    if cfg.fmin_col:
        cols.append(cfg.fmin_col)
    if cfg.fmax_col:
        cols.append(cfg.fmax_col)
    if cfg.val_col():
        cols.append(cfg.val_col())
    return ds.map_batches(tag, batch_format="pyarrow").select_columns(cols)


def point_index(wx: np.ndarray, wy: np.ndarray) -> np.ndarray:
    """The reference's point spatial index (serial.cpp:689-692)."""
    from ..functions.spatial import encode_quadkey

    return encode_quadkey(np.asarray(wx, np.int64) & ~1, np.asarray(wy, np.int64) & ~1)


def add_bucket(ds: ray.data.Dataset, bucket_zoom: int) -> ray.data.Dataset:
    shift = 64 - 2 * bucket_zoom if bucket_zoom > 0 else 64

    def fn(t: pa.Table) -> pa.Table:
        idx = t["index"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (idx >> np.uint64(shift)).astype(np.int64) if bucket_zoom > 0 else np.zeros(len(t), np.int64)
        # strip schema metadata: Ray's shuffle schema-dedup cannot hash
        # tables whose schema carries a metadata dict (log spam in r1)
        return t.append_column("bucket", pa.array(b, pa.int64())).replace_schema_metadata(None)

    return ds.map_batches(fn, batch_format="pyarrow")


def bucket_offsets(ds: ray.data.Dataset) -> dict[int, int]:
    """Per-bucket exclusive prefix sums of row counts in bucket (= index)
    order — the global rank offset of each bucket. Small aggregate."""

    def partial_counts(t: pa.Table) -> pa.Table:
        b, n = np.unique(t["bucket"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"bucket": b, "n": n})

    parts = ds.map_batches(partial_counts, batch_format="pyarrow").take_all()
    counts: dict[int, int] = {}
    for row in parts:
        counts[int(row["bucket"])] = counts.get(int(row["bucket"]), 0) + int(row["n"])
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    return offsets


def _feature_blob(arrs: dict[str, np.ndarray]) -> bytes:
    t = pa.table({k: pa.array(v) for k, v in arrs.items()})
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue()


def _blob_to_table(blob: bytes) -> pa.Table:
    return pa.ipc.open_stream(io.BytesIO(blob)).read_all()


def _tile_rows(
    z: int, tx, ty, counts, tiles, bucket: int, min_index, min_seq, first_mz,
    feature_ids=None,
) -> pa.Table:
    n = len(tx)
    cols = {
        "z": pa.array(np.full(n, z, dtype=np.int32)),
        "x": pa.array(np.asarray(tx, dtype=np.int32)),
        "y": pa.array(np.asarray(ty, dtype=np.int32)),
        "n_features": pa.array(np.asarray(counts, dtype=np.int64)),
        "tile": pa.array(tiles, pa.large_binary()),
        "bucket": pa.array(np.full(n, bucket, dtype=np.int64)),
        "kind": pa.array(np.zeros(n, dtype=np.int8)),
        "min_index": pa.array(np.asarray(min_index, dtype=np.uint64)),
        "min_seq": pa.array(np.asarray(min_seq, dtype=np.int64)),
        "first_minzoom": pa.array(np.asarray(first_mz, dtype=np.int16)),
    }
    t = pa.table(cols)
    if feature_ids is not None:
        t = t.append_column("feature_ids", feature_ids)
    return t


def _force_first_plain(kept: np.ndarray, eff_mz: np.ndarray,
                       starts: np.ndarray, ends: np.ndarray):
    """Always-keep the first PLAIN (non-explicit-minzoom) feature of
    each tile (tile.cpp:1293-1302); reduces to kept[starts]=True when
    no explicit features exist (eff_mz >= 0 everywhere)."""
    n = len(eff_mz)
    plain_pos = np.where(eff_mz >= 0, np.arange(n), n)
    firstp = np.minimum.reduceat(plain_pos, starts) if len(starts) else starts
    valid = firstp < ends
    kept[firstp[valid]] = True


def _ordering_on(cfg) -> bool:
    return bool(cfg.order_by_attr or cfg.preserve_input_order)


def _reorder_runs(cfg, cswx, cswy, cseq, kept, kstarts, kends, vals, ccounts):
    """Per-tile output ordering (tile.cpp:2583-2593): stable sort of a
    run's KEPT features by the attribute value (asc/desc) or by input
    seq (-pi). Returns kept-compacted arrays (callers re-index with an
    all-True kept)."""
    if not _ordering_on(cfg):
        return cswx, cswy, cseq, vals, ccounts
    kwx = cswx[kept].copy()
    kwy = cswy[kept].copy()
    kseq = np.asarray(cseq)[kept].copy()
    kvals = vals[kept].copy() if vals is not None else None
    kcnt = ccounts[kept].copy() if ccounts is not None else None
    for a, b in zip(kstarts, kends):
        if b - a < 2:
            continue
        if cfg.preserve_input_order:
            perm = np.argsort(kseq[a:b], kind="stable")
        elif cfg.order_descending:
            perm = np.argsort(-kvals[a:b], kind="stable")
        else:
            perm = np.argsort(kvals[a:b], kind="stable")
        sl = slice(a, b)
        kwx[sl] = kwx[sl][perm]
        kwy[sl] = kwy[sl][perm]
        kseq[sl] = kseq[sl][perm]
        if kvals is not None:
            kvals[sl] = kvals[sl][perm]
        if kcnt is not None:
            kcnt[sl] = kcnt[sl][perm]
    return kwx, kwy, kseq, kvals, kcnt


class ZoomEmitter:
    """Per-zoom tile emission over (index, seq)-sorted feature arrays
    with snapped coordinates + boundary-ghost duplication."""

    def __init__(self, cfg: PyramidConfig, overrides: dict | None = None):
        self.cfg = cfg
        self.overrides = overrides or {}  # z -> {threshold: value}
        self.counters: dict = {}  # z -> {strategy counter: sum}
        self.reports: dict = {}  # z -> {threshold: max value}

    def _count(self, z: int, key: str, v: int):
        if v:
            zc = self.counters.setdefault(z, {})
            zc[key] = zc.get(key, 0) + int(v)

    def _note(self, z: int, report: dict):
        if report:
            scfg = getattr(self.cfg, "strategies", None)
            attr_desc = bool(scfg is not None and getattr(scfg, "drop_by_attribute_descending", False))
            cur = self.reports.setdefault(z, {})
            for k, v in report.items():
                if k.startswith("_c_"):
                    self._count(z, k[3:], int(v))
                    continue
                if k.startswith("_"):
                    continue
                if k == "minattribute":
                    prev = cur.get(k)
                    if prev is None:
                        cur[k] = v
                    else:
                        cur[k] = min(prev, v) if attr_desc else max(prev, v)
                else:
                    cur[k] = max(cur.get(k, 0), v)

    def emit(
        self,
        z: int,
        index: np.ndarray,
        seq: np.ndarray,
        swx: np.ndarray,
        swy: np.ndarray,
        bzx: np.ndarray,
        bzy: np.ndarray,
        minzoom: np.ndarray,
        bucket: int,
        route: tuple[int, int, int] | None = None,
        gaps: np.ndarray | None = None,
        vals: np.ndarray | None = None,
    ) -> tuple[pa.Table | None, pa.Table | None]:
        """Returns (tile_rows, side_rows). route=(B, bx, by) activates
        cross-bucket routing of copies whose tile is outside this
        bucket's subtree."""
        cfg = self.cfg
        n = len(index)
        if n == 0:
            return None, None
        has_boundary = (
            bool(((bzx <= z) | (bzy <= z)).any())
            if z > 0
            else bool((swx == 1 << 32).any())
        )
        scfg0 = getattr(cfg, "strategies", None)
        special_mode = (
            scfg0 is not None and getattr(scfg0, "as_needed_mode", "drop") != "drop"
        )
        if not has_boundary and z > 0 and not special_mode:
            return self._emit_fast(z, index, seq, swx, swy, minzoom, bucket, gaps, vals), None
        return self._emit_slow(z, index, seq, swx, swy, bzx, bzy, minzoom, bucket, route, gaps, vals)

    # ---------------------------------------------------------- fast path
    def _emit_fast(self, z, index, seq, swx, swy, minzoom, bucket, gaps=None, vals=None):
        cfg = self.cfg
        tkey = index >> np.uint64(64 - 2 * z)
        change = np.flatnonzero(tkey[1:] != tkey[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(index)]))
        kept = minzoom <= z
        _force_first_plain(kept, minzoom, starts, ends)
        leads = None
        if cfg.retain_points_multiplier > 1:
            from ..stages.strategies import multiplier_keep

            leads = np.zeros(len(index), dtype=bool)
            for s_, e_ in zip(starts, ends):
                k_, lead_ = multiplier_keep(
                    index[s_:e_], minzoom[s_:e_], z,
                    cfg.retain_points_multiplier, cfg.droprate,
                )
                kept[s_:e_] = k_
                leads[s_:e_] = lead_
        self._count(z, "dropped_by_rate", len(index) - int(kept.sum()))
        scfg = getattr(cfg, "strategies", None)
        out_x, out_y = swx, swy
        ccounts = None
        if scfg is not None and scfg.any_active() and gaps is not None:
            from ..stages.strategies import apply_strategies

            out_x = swx.astype(np.float64)
            out_y = swy.astype(np.float64)
            ccounts = np.ones(len(index), dtype=np.int64)
            for s, e in zip(starts, ends):
                sel = np.flatnonzero(kept[s:e]) + s
                if len(sel) == 0:
                    continue
                k2, cx2, cy2, cnt2, rep = apply_strategies(
                    index[sel], swx[sel], swy[sel], minzoom[sel], gaps[sel], z, scfg,
                    overrides=self.overrides.get(z),
                    attrs=None if vals is None else vals[sel],
                )
                self._note(z, rep)
                kept[sel[~k2]] = False
                out_x[sel] = cx2
                out_y[sel] = cy2
                ccounts[sel] = cnt2
            out_x = out_x.astype(np.int64)
            out_y = out_y.astype(np.int64)
        dens = None
        if cfg.calculate_density:
            from ..stages.strategies import density_glow

            dens = np.full(len(index), 255, dtype=np.int64)
            for s, e in zip(starts, ends):
                dens[s:e] = density_glow(index[s:e], kept[s:e], z)
        folded = None
        if vals is not None and cfg.attr_accum:
            from ..stages.strategies import fold_numeric

            folded = vals.astype(np.float64).copy()
            for s, e in zip(starts, ends):
                folded[s:e] = fold_numeric(vals[s:e], kept[s:e], cfg.attr_accum[1])
        elif vals is not None:
            folded = vals  # raw values (ordering / emit_attr / drop-by-attr)
        counts = np.add.reduceat(kept, starts)
        rk = tkey[starts]
        tx = _compact_bits64(rk >> np.uint64(1)).astype(np.int64)
        ty = _compact_bits64(rk).astype(np.int64)
        return self._encode_rows(
            z, out_x, out_y, seq, kept, counts, tx, ty, bucket,
            index[starts], seq[starts], minzoom[starts],
            vals=folded, cluster_counts=ccounts, density=dens,
            leads=leads if cfg.multiplier_tags else None,
        )

    # ---------------------------------------------------------- slow path
    def _emit_slow(self, z, index, seq, swx, swy, bzx, bzy, minzoom, bucket, route, gaps=None, vals=None):
        """Hybrid: the (large) non-boundary core keeps the contiguous-run
        fast path; the handful of boundary features contribute self +
        ghost copies merged per affected tile — O(core) + O(copies²/tile)
        instead of an all-rows lexsort per zoom. With per-tile strategies
        active, every tile takes the merged path (scan semantics)."""
        from ..functions.spatial import _spread_bits32

        cfg = self.cfg
        scfg = getattr(cfg, "strategies", None)
        strat = scfg is not None and scfg.any_active()
        shift = WORLD_BITS - z
        nmax = 1 << z
        bmask = (bzx <= z) | (bzy <= z)
        core_m = ~bmask
        ci, cs = index[core_m], seq[core_m]
        cwx, cwy, cmz = swx[core_m], swy[core_m], minzoom[core_m]
        cgap = gaps[core_m] if gaps is not None else None
        cval = vals[core_m] if vals is not None else None
        n_core = len(ci)
        if n_core:
            tkey = ci >> np.uint64(64 - 2 * z) if z > 0 else np.zeros(n_core, np.uint64)
            change = np.flatnonzero(tkey[1:] != tkey[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n_core]))
            kept = cmz <= z
            _force_first_plain(kept, cmz, starts, ends)
            if cfg.retain_points_multiplier > 1:
                from ..stages.strategies import multiplier_keep

                for s_, e_ in zip(starts, ends):
                    k_, _lead = multiplier_keep(
                        ci[s_:e_], cmz[s_:e_], z,
                        cfg.retain_points_multiplier, cfg.droprate,
                    )
                    kept[s_:e_] = k_
            run_keys = tkey[starts]
        else:
            starts = ends = np.empty(0, np.int64)
            kept = np.empty(0, bool)
            run_keys = np.empty(0, np.uint64)

        # boundary copies: self + up to 3 ghosts per boundary feature
        bsel = np.flatnonzero(bmask)
        parts = [(bsel, 0, 0)]
        mx = bzx[bsel] <= z
        my = bzy[bsel] <= z
        mxy = mx & my
        if mx.any():
            parts.append((bsel[mx], 1, 0))
        if my.any():
            parts.append((bsel[my], 0, 1))
        if mxy.any():
            parts.append((bsel[mxy], 1, 1))
        sel = np.concatenate([p[0] for p in parts])
        dx = np.concatenate([np.full(len(p[0]), p[1], np.int64) for p in parts])
        dy = np.concatenate([np.full(len(p[0]), p[2], np.int64) for p in parts])
        gtx = (swx[sel] >> shift) - dx
        gty = (swy[sel] >> shift) - dy
        valid = (gtx >= 0) & (gtx < nmax) & (gty >= 0) & (gty < nmax)
        sel, gtx, gty = sel[valid], gtx[valid], gty[valid]
        gidx, gseq, gmz = index[sel], seq[sel], minzoom[sel]
        gwx, gwy = swx[sel], swy[sel]
        side_tbl = None
        if route is not None and len(sel):
            b_zoom, bx, by = route
            sh = z - b_zoom
            local = ((gtx >> sh) == bx) & ((gty >> sh) == by) if sh >= 0 else np.ones(len(gtx), bool)
            if not local.all():
                sm = ~local
                side_tbl = pa.table(
                    {
                        "z": pa.array(np.full(sm.sum(), z, dtype=np.int32)),
                        "x": pa.array(gtx[sm].astype(np.int32)),
                        "y": pa.array(gty[sm].astype(np.int32)),
                        "n_features": pa.array(np.zeros(sm.sum(), dtype=np.int64)),
                        "tile": pa.array([b""] * int(sm.sum()), pa.large_binary()),
                        "bucket": pa.array(np.full(sm.sum(), -1, dtype=np.int64)),
                        "kind": pa.array(np.full(sm.sum(), 2, dtype=np.int8)),
                        "min_index": pa.array(gidx[sm].astype(np.uint64)),
                        "min_seq": pa.array(gseq[sm].astype(np.int64)),
                        "first_minzoom": pa.array(gmz[sm].astype(np.int16)),
                    }
                )
                side_tbl = side_tbl.append_column("cx", pa.array(gwx[sm].astype(np.int64)))
                side_tbl = side_tbl.append_column("cy", pa.array(gwy[sm].astype(np.int64)))
                if vals is not None:
                    side_tbl = side_tbl.append_column(
                        "val", pa.array(vals[sel][sm].astype(np.float64))
                    )
            sel, gtx, gty = sel[local], gtx[local], gty[local]
            gidx, gseq, gmz = gidx[local], gseq[local], gmz[local]
            gwx, gwy = gwx[local], gwy[local]
        if n_core == 0 and len(gtx) == 0:
            return None, side_tbl
        # morton key comparable with tkey/run_keys
        gkey = (_spread_bits32(gtx) << np.uint64(1)) | _spread_bits32(gty)
        gorder = np.lexsort((gseq, gidx, gkey))
        gkey, gtx, gty = gkey[gorder], gtx[gorder], gty[gorder]
        gidx, gseq, gmz = gidx[gorder], gseq[gorder], gmz[gorder]
        gwx, gwy = gwx[gorder], gwy[gorder]
        ggap = gaps[sel][gorder] if gaps is not None else None
        gval = vals[sel][gorder] if vals is not None else None
        gpos = np.searchsorted(run_keys, gkey)
        gmatched = (gpos < len(run_keys)) & (
            run_keys[np.minimum(gpos, max(len(run_keys) - 1, 0))] == gkey
        ) if len(run_keys) else np.zeros(len(gkey), bool)
        affected_runs = np.unique(gpos[gmatched]) if gmatched.any() else np.empty(0, np.int64)
        if (strat or vals is not None or cfg.coalesce or _ordering_on(cfg)
                or cfg.calculate_density
                or (cfg.multiplier_tags and cfg.retain_points_multiplier > 1)
                or (scfg is not None and getattr(scfg, "as_needed_mode", "drop") != "drop")) and n_core:
            # strategies and attribute folds are ordered scans: every
            # tile takes the merged per-tile path so the scan semantics
            # apply uniformly
            affected_runs = np.arange(len(starts), dtype=np.int64)
        aff_set = set(int(r) for r in affected_runs)

        # adjust kept[first] of affected runs where a copy precedes the
        # core first (the copy takes the always-keep slot)
        for rid in affected_runs:
            s = starts[rid]
            cps = np.flatnonzero(gmatched & (gpos == rid))
            if len(cps) == 0:
                continue
            g0 = cps[0]
            if (int(gidx[g0]), int(gseq[g0])) < (int(ci[s]), int(cs[s])):
                kept[s] = cmz[s] <= z

        counts = np.add.reduceat(kept, starts) if n_core else np.empty(0, np.int64)
        kends = np.cumsum(counts)
        kstarts = kends - counts
        kwx, kwy, kseq = cwx[kept], cwy[kept], cs[kept]
        run_tx = _compact_bits64(run_keys >> np.uint64(1)).astype(np.int64)
        run_ty = _compact_bits64(run_keys).astype(np.int64)

        out_tx: list = []
        out_ty: list = []
        out_counts: list = []
        out_tiles: list = []
        out_minidx: list = []
        out_minseq: list = []
        out_firstmz: list = []
        out_fids: list = []

        # 1) unaffected runs: vectorized encode
        if n_core:
            un_mask = np.ones(len(starts), bool)
            if len(affected_runs):
                un_mask[affected_runs] = False
            if un_mask.any():
                self._count(
                    z, "dropped_by_rate",
                    int((ends - starts)[un_mask].sum() - counts[un_mask].sum()),
                )
            if un_mask.any():
                if cfg.encode_tiles:
                    tiles = encode_point_tiles(
                        kwx, kwy, kstarts[un_mask], kends[un_mask],
                        run_tx[un_mask], run_ty[un_mask], z,
                        layer_name=cfg.layer_name, detail=cfg.detail,
                        compress=cfg.compress,
                        ids=kseq if cfg.emit_ids else None,
                    )
                else:
                    tiles = [b""] * int(un_mask.sum())
                out_tx.append(run_tx[un_mask])
                out_ty.append(run_ty[un_mask])
                out_counts.append(counts[un_mask])
                out_tiles.extend(tiles)
                out_minidx.append(ci[starts[un_mask]])
                out_minseq.append(cs[starts[un_mask]])
                out_firstmz.append(cmz[starts[un_mask]])
                if cfg.emit_ids:
                    for a, b_ in zip(kstarts[un_mask], kends[un_mask]):
                        out_fids.append(kseq[a:b_])

        # 2) affected + ghost-only tiles: per-tile merge (few)
        def _one_merged(rid: int | None, cps: np.ndarray):
            mgap = None
            mval = None
            if rid is not None:
                s, e = starts[rid], ends[rid]
                sl = slice(s, e)
                mwx = np.concatenate((cwx[sl], gwx[cps]))
                mwy = np.concatenate((cwy[sl], gwy[cps]))
                midx = np.concatenate((ci[sl], gidx[cps]))
                mseq = np.concatenate((cs[sl], gseq[cps]))
                mmz = np.concatenate((cmz[sl], gmz[cps]))
                if cgap is not None:
                    mgap = np.concatenate((cgap[sl], ggap[cps]))
                if cval is not None:
                    mval = np.concatenate((cval[sl], gval[cps]))
                ttx, tty = int(run_tx[rid]), int(run_ty[rid])
            else:
                mwx, mwy = gwx[cps], gwy[cps]
                midx, mseq, mmz = gidx[cps], gseq[cps], gmz[cps]
                if ggap is not None:
                    mgap = ggap[cps]
                if gval is not None:
                    mval = gval[cps]
                ttx = int(gtx[cps[0]])
                tty = int(gty[cps[0]])
            o = np.lexsort((mseq, midx))
            mwx, mwy = mwx[o], mwy[o]
            midx, mseq, mmz = midx[o], mseq[o], mmz[o]
            if mgap is not None:
                mgap = mgap[o]
            if mval is not None:
                mval = mval[o]
            k = mmz <= z
            _force_first_plain(k, mmz, np.array([0]), np.array([len(mmz)]))
            mlead = None
            if cfg.retain_points_multiplier > 1:
                from ..stages.strategies import multiplier_keep

                k, mlead = multiplier_keep(
                    midx, mmz, z, cfg.retain_points_multiplier, cfg.droprate
                )
            self._count(z, "dropped_by_rate", len(k) - int(k.sum()))
            mcnt = None
            mmembers = None  # coalesce mode: per-kept member positions
            if strat:
                from ..stages.strategies import (
                    apply_strategies, cluster_fold_positions, fold_targets,
                )

                ksel = np.flatnonzero(k)
                if len(ksel):
                    gk = mgap[ksel] if mgap is not None else np.zeros(len(ksel), np.uint64)
                    k2, cx2, cy2, cnt2, rep = apply_strategies(
                        midx[ksel], mwx[ksel], mwy[ksel], mmz[ksel], gk, z, scfg,
                        overrides=self.overrides.get(z),
                        attrs=None if mval is None else mval[ksel],
                    )
                    self._note(z, rep)
                    mode = getattr(scfg, "as_needed_mode", "drop")
                    if mode == "cluster":
                        ccx, ccy, cnts = cluster_fold_positions(
                            mwx[ksel], mwy[ksel], k2
                        )
                        k[ksel[~k2]] = False
                        mwx = mwx.copy(); mwy = mwy.copy()
                        mwx[ksel] = ccx
                        mwy[ksel] = ccy
                        mcnt = np.ones(len(k), dtype=np.int64)
                        mcnt[ksel] = cnts
                    elif mode == "coalesce":
                        if "_members" in rep:
                            # ladder-specific member map (coalesce-smallest)
                            members = {
                                int(ksel[t]): [int(ksel[d]) for d in ds_]
                                for t, ds_ in rep.pop("_members").items()
                            }
                        else:
                            dropped, tgt = fold_targets(k2)
                            members = {}
                            for d, t in zip(dropped, tgt):
                                members.setdefault(int(ksel[t]), []).append(int(ksel[d]))
                        mmembers = members
                        k[ksel[~k2]] = False
                    else:
                        k[ksel[~k2]] = False
                        mwx = mwx.astype(np.float64)
                        mwy = mwy.astype(np.float64)
                        mwx[ksel] = cx2
                        mwy[ksel] = cy2
                        mwx = mwx.astype(np.int64)
                        mwy = mwy.astype(np.int64)
                        mcnt = np.ones(len(k), dtype=np.int64)
                        mcnt[ksel] = cnt2
            mfold = None
            if mval is not None and cfg.attr_accum:
                from ..stages.strategies import fold_numeric

                mfold = fold_numeric(mval, k, cfg.attr_accum[1])
            mdens = None
            if cfg.calculate_density:
                from ..stages.strategies import density_glow

                mdens = density_glow(midx, k, z)
            n_kept = int(k.sum())
            kidx = np.flatnonzero(k)
            if _ordering_on(cfg) and n_kept > 1:
                if cfg.preserve_input_order:
                    perm = np.argsort(mseq[kidx], kind="stable")
                elif cfg.order_descending:
                    perm = np.argsort(-(mval[kidx] if mval is not None else mseq[kidx]), kind="stable")
                else:
                    perm = np.argsort(mval[kidx] if mval is not None else mseq[kidx], kind="stable")
                kidx = kidx[perm]
            attr_mode = (mfold is not None and (cfg.attr_accum or cfg.emit_attr)) or (
                cfg.cluster_stats and mcnt is not None
            ) or (cfg.calculate_density and mdens is not None) or (
                cfg.multiplier_tags and mlead is not None
            )
            mseq_rank = None
            if cfg.multiplier_tags and mlead is not None:
                sl = mseq[kidx]
                order_ = np.argsort(sl, kind="stable")
                mseq_rank = np.empty(len(kidx), dtype=np.int64)
                mseq_rank[order_] = np.arange(len(kidx))
            if mval is not None and mfold is None and cfg.emit_attr:
                mfold = mval
                attr_mode = True
            if cfg.encode_tiles and mmembers is not None:
                # as-needed coalesce: each kept feature becomes a
                # multipoint of itself + the features folded onto it
                # (coalesce_geometry appends, tile.cpp:1613-1631)
                from ..stages.mvt import encode_layer as _el, encode_tile as _et
                from ..stages.tile_encode import encode_multipoint as _emp

                shift_ = WORLD_BITS - z - cfg.detail
                ox_ = ttx << (WORLD_BITS - z)
                oy_ = tty << (WORLD_BITS - z)
                feats_ = []
                for i_ in kidx:
                    mem = [int(i_)] + mmembers.get(int(i_), [])
                    lx_ = (mwx[mem] - ox_)
                    ly_ = (mwy[mem] - oy_)
                    if shift_ >= 0:
                        lx_ >>= shift_
                        ly_ >>= shift_
                    else:
                        lx_ <<= -shift_
                        ly_ <<= -shift_
                    feats_.append({
                        "geom": _emp(np.stack([lx_, ly_], axis=1)),
                        "type": 1,
                    })
                tb = _et([_el(cfg.layer_name, feats_, 1 << cfg.detail)],
                         compress=cfg.compress)
            elif cfg.encode_tiles and cfg.coalesce:
                from ..stages.tile_encode import encode_point_tiles_coalesced

                tbs, ccounts2 = encode_point_tiles_coalesced(
                    mwx[kidx], mwy[kidx], np.array([0]), np.array([n_kept]),
                    np.array([ttx]), np.array([tty]), z,
                    layer_name=cfg.layer_name, detail=cfg.detail,
                    compress=cfg.compress,
                    attr_name=cfg.val_col() if attr_mode else None,
                    attr_vals=mfold[kidx] if (attr_mode and mfold is not None) else None,
                )
                tb = tbs[0]
                n_kept = int(ccounts2[0])
            elif cfg.encode_tiles and attr_mode:
                from ..stages.tile_encode import encode_point_tiles_attrs

                tb = encode_point_tiles_attrs(
                    mwx[kidx], mwy[kidx], np.array([0]), np.array([n_kept]),
                    np.array([ttx]), np.array([tty]), z,
                    layer_name=cfg.layer_name, detail=cfg.detail,
                    compress=cfg.compress,
                    attr_name=cfg.val_col() if (cfg.attr_accum or cfg.emit_attr) else None,
                    attr_vals=mfold[kidx] if mfold is not None else None,
                    cluster_counts=mcnt[kidx] if mcnt is not None else None,
                    cluster_stats=cfg.cluster_stats,
                    density=mdens[kidx] if mdens is not None else None,
                    mult_first=mlead[kidx] if (cfg.multiplier_tags and mlead is not None) else None,
                    mult_seq=mseq_rank,
                    ids=mseq[kidx] if cfg.emit_ids else None,
                )[0]
            elif cfg.encode_tiles:
                tb = encode_point_tiles(
                    mwx[kidx], mwy[kidx], np.array([0]), np.array([n_kept]),
                    np.array([ttx]), np.array([tty]), z,
                    layer_name=cfg.layer_name, detail=cfg.detail,
                    compress=cfg.compress,
                    ids=mseq[kidx] if cfg.emit_ids else None,
                )[0]
            else:
                tb = b""
            out_tx.append(np.array([ttx]))
            out_ty.append(np.array([tty]))
            out_counts.append(np.array([n_kept]))
            out_tiles.append(tb)
            out_minidx.append(midx[:1])
            out_minseq.append(mseq[:1])
            out_firstmz.append(mmz[:1])
            if cfg.emit_ids:
                out_fids.append(mseq[k])

        for rid in affected_runs:
            _one_merged(int(rid), np.flatnonzero(gmatched & (gpos == rid)))
        unmatched = np.flatnonzero(~gmatched)
        if len(unmatched):
            uk = gkey[unmatched]
            cuts = np.flatnonzero(uk[1:] != uk[:-1]) + 1
            for grp in np.split(unmatched, cuts):
                _one_merged(None, grp)

        if not out_tx:
            return None, side_tbl
        tx_all = np.concatenate(out_tx).astype(np.int64)
        ty_all = np.concatenate(out_ty).astype(np.int64)
        counts_all = np.concatenate(out_counts).astype(np.int64)
        minidx_all = np.concatenate(out_minidx).astype(np.uint64)
        minseq_all = np.concatenate(out_minseq).astype(np.int64)
        firstmz_all = np.concatenate(out_firstmz).astype(np.int16)
        fids = None
        if cfg.emit_ids:
            offs = np.zeros(len(out_fids) + 1, dtype=np.int32)
            offs[1:] = np.cumsum([len(f) for f in out_fids])
            vals = np.concatenate(out_fids) if out_fids else np.empty(0, np.int64)
            fids = pa.ListArray.from_arrays(pa.array(offs), pa.array(vals.astype(np.int64)))
        tile_tbl = _tile_rows(
            z, tx_all, ty_all, counts_all, out_tiles, bucket,
            minidx_all, minseq_all, firstmz_all, fids,
        )
        return tile_tbl, side_tbl

    def _encode_rows(self, z, cswx, cswy, cseq, kept, counts, tx, ty, bucket,
                     min_index, min_seq, first_mz, vals=None, cluster_counts=None,
                     density=None, leads=None):
        cfg = self.cfg
        kends = np.cumsum(counts)
        kstarts = kends - counts
        cswx, cswy, cseq, vals, cluster_counts = _reorder_runs(
            cfg, cswx, cswy, cseq, kept, kstarts, kends, vals, cluster_counts
        )
        kept = np.ones(int(counts.sum()), dtype=bool) if _ordering_on(cfg) else kept
        attr_mode = (vals is not None and (cfg.attr_accum or cfg.emit_attr)) or (
            cfg.cluster_stats and cluster_counts is not None
        ) or (cfg.calculate_density and density is not None) or (leads is not None)
        mult_seq = None
        if leads is not None:
            # within-tile input-order rank per kept feature
            # (tile.cpp:2393-2414)
            mult_seq = np.zeros(int(counts.sum()), dtype=np.int64)
            kseq_all = np.asarray(cseq)[kept]
            pos = 0
            for c in counts:
                c = int(c)
                sl = kseq_all[pos : pos + c]
                order = np.argsort(sl, kind="stable")
                rank = np.empty(c, dtype=np.int64)
                rank[order] = np.arange(c)
                mult_seq[pos : pos + c] = rank
                pos += c
        if cfg.encode_tiles and cfg.coalesce:
            from ..stages.tile_encode import encode_point_tiles_coalesced

            tiles, counts = encode_point_tiles_coalesced(
                cswx[kept], cswy[kept], kstarts, kends, tx, ty, z,
                layer_name=cfg.layer_name, detail=cfg.detail, compress=cfg.compress,
                attr_name=cfg.val_col() if attr_mode else None,
                attr_vals=vals[kept] if (attr_mode and vals is not None) else None,
            )
        elif cfg.encode_tiles and attr_mode:
            from ..stages.tile_encode import encode_point_tiles_attrs

            tiles = encode_point_tiles_attrs(
                cswx[kept], cswy[kept], kstarts, kends, tx, ty, z,
                layer_name=cfg.layer_name, detail=cfg.detail, compress=cfg.compress,
                attr_name=cfg.val_col() if (cfg.attr_accum or cfg.emit_attr) else None,
                attr_vals=vals[kept] if vals is not None else None,
                cluster_counts=cluster_counts[kept] if cluster_counts is not None else None,
                cluster_stats=cfg.cluster_stats,
                density=density[kept] if density is not None else None,
                mult_first=leads[kept] if leads is not None else None,
                mult_seq=mult_seq,
                ids=cseq[kept] if cfg.emit_ids else None,
            )
        elif cfg.encode_tiles:
            tiles = encode_point_tiles(
                cswx[kept], cswy[kept], kstarts, kends, tx, ty, z,
                layer_name=cfg.layer_name, detail=cfg.detail, compress=cfg.compress,
                ids=cseq[kept] if cfg.emit_ids else None,
            )
        else:
            tiles = [b""] * len(tx)
        fids = None
        if cfg.emit_ids:
            offs = np.concatenate(([0], kends)).astype(np.int32)
            fids = pa.ListArray.from_arrays(pa.array(offs), pa.array(cseq[kept]))
        return _tile_rows(z, tx, ty, counts, tiles, bucket, min_index, min_seq,
                          first_mz, fids)


class BucketWorker:
    """map_groups callable for one zoom-B bucket: sort → ranks → ladder
    minzoom → per-zoom tile emission + side channels."""

    def __init__(self, cfg: PyramidConfig, bucket_zoom: int, offsets_ref,
                 raw_dir: str | None = None, contiguous_ranks: bool = False,
                 strategy_overrides: dict | None = None, minzoom_ref=None):
        self.cfg = cfg
        self.bucket_zoom = bucket_zoom
        self.offsets_ref = offsets_ref
        self.minzoom_ref = minzoom_ref  # rank-indexed minzoom override
        # (drop-denser global pass)
        self.raw_dir = raw_dir  # write-through sink: tile rows go straight
        # to per-bucket parquet inside the task; only tiny side channels
        # (+ a per-zoom summary) travel back through the object store
        # contiguous_ranks: the block holds a CONTIGUOUS bucket range →
        # one drop-ladder evaluation per task (the rank apron, ~4·r^bz
        # ranks, amortizes over the whole task instead of per bucket)
        self.contiguous_ranks = contiguous_ranks
        self.strategy_overrides = strategy_overrides or {}
        self._offsets = None

    def offsets(self) -> dict[int, int]:
        if self._offsets is None:
            self._offsets = (
                ray.get(self.offsets_ref)
                if isinstance(self.offsets_ref, ray.ObjectRef)
                else self.offsets_ref
            )
        return self._offsets

    def __call__(self, group: pa.Table) -> pa.Table:
        """Process a block holding one or more COMPLETE buckets (hash
        repartition by bucket guarantees completeness)."""
        if len(group) == 0:
            return _empty_tiles()
        buckets = group["bucket"].to_numpy(zero_copy_only=False)
        index_a = group["index"].to_numpy(zero_copy_only=False).astype(np.uint64)
        seq_a = group["seq"].to_numpy(zero_copy_only=False)
        wx_a = group["wx"].to_numpy(zero_copy_only=False)
        wy_a = group["wy"].to_numpy(zero_copy_only=False)
        cfg0 = self.cfg
        fmin_a = (
            group[cfg0.fmin_col].to_numpy(zero_copy_only=False).astype(np.int16)
            if cfg0.fmin_col
            else None
        )
        fmax_a = (
            group[cfg0.fmax_col].to_numpy(zero_copy_only=False).astype(np.int16)
            if cfg0.fmax_col
            else None
        )
        vals_a = (
            group[cfg0.val_col()].to_numpy(zero_copy_only=False).astype(np.float64)
            if cfg0.val_col()
            else None
        )
        dd_a = (
            group["ddmz"].to_numpy(zero_copy_only=False).astype(np.int16)
            if "ddmz" in group.column_names
            else None
        )
        order = np.lexsort((seq_a, index_a, buckets))
        buckets = buckets[order]
        index_a, seq_a = index_a[order], seq_a[order]
        wx_a, wy_a = wx_a[order], wy_a[order]
        if fmin_a is not None:
            fmin_a = fmin_a[order]
        if fmax_a is not None:
            fmax_a = fmax_a[order]
        if vals_a is not None:
            vals_a = vals_a[order]
        if dd_a is not None:
            dd_a = dd_a[order]
        cuts = np.flatnonzero(buckets[1:] != buckets[:-1]) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(buckets)]))
        task_mz = None
        task_gaps = None
        scfg = getattr(self.cfg, "strategies", None)
        if scfg is not None and scfg.any_active():
            from ..stages.strategies import compute_gaps

            g0 = self.cfg.resolved_gscale()
            task_gaps = compute_gaps(
                index_a, snap_coords(wx_a, g0), snap_coords(wy_a, g0)
            )
        if self.contiguous_ranks:
            cfgl = self.cfg
            r0 = self.offsets()[int(buckets[0])]
            if dd_a is not None:
                # --drop-denser minzooms ride the rows as a column
                # (attach_drop_denser_minzoom)
                task_mz = dd_a
            elif self.minzoom_ref is not None:
                arr = (
                    ray.get(self.minzoom_ref)
                    if isinstance(self.minzoom_ref, ray.ObjectRef)
                    else self.minzoom_ref
                )
                task_mz = arr[r0 : r0 + len(buckets)].astype(np.int16)
            else:
                task_mz = minzoom_for_rank_range(
                    r0, r0 + len(buckets), cfgl.maxzoom,
                    cfgl.resolved_basezoom(), cfgl.droprate,
                ).astype(np.int16)
        outs = []
        for s, e in zip(starts, ends):
            outs.append(
                self._one_bucket(
                    int(buckets[s]), index_a[s:e], seq_a[s:e], wx_a[s:e], wy_a[s:e],
                    minzoom=None if task_mz is None else task_mz[s:e],
                    gaps=None if task_gaps is None else task_gaps[s:e],
                    fmin=None if fmin_a is None else fmin_a[s:e],
                    fmax=None if fmax_a is None else fmax_a[s:e],
                    vals=None if vals_a is None else vals_a[s:e],
                )
            )
        return pa.concat_tables(_align_tables(outs))

    def _one_bucket(self, bucket, index, seq, wx, wy, minzoom=None, gaps=None,
                    fmin=None, fmax=None, vals=None) -> pa.Table:
        cfg = self.cfg
        if gaps is None and getattr(cfg, "strategies", None) is not None and cfg.strategies.any_active():
            from ..stages.strategies import compute_gaps

            g1 = cfg.resolved_gscale()
            gaps = compute_gaps(index, snap_coords(wx, g1), snap_coords(wy, g1))
        if minzoom is None:
            r0 = self.offsets()[bucket]
            minzoom = minzoom_for_rank_range(
                r0, r0 + len(index), cfg.maxzoom, cfg.resolved_basezoom(), cfg.droprate
            ).astype(np.int16)
        g = cfg.resolved_gscale()
        swx = snap_coords(wx, g)
        swy = snap_coords(wy, g)
        bzx = boundary_zoom(swx)
        bzy = boundary_zoom(swy)
        b_zoom = self.bucket_zoom
        bx = int(_compact_bits64(np.array([bucket], np.uint64) >> np.uint64(1))[0])
        by = int(_compact_bits64(np.array([bucket], np.uint64))[0])
        em = ZoomEmitter(cfg, self.strategy_overrides)
        outs = []
        eff_minzoom = minzoom
        if fmin is not None:
            # an explicit per-feature MINZOOM bypasses the rate ladder
            # (tile.cpp:1314-1316: tippecanoe_minzoom set ⇒ FEATURE_KEPT;
            # maxzoom-only features still ride the ladder). Sentinel -1:
            # always kept, and NOT part of the multiplier count map — the
            # always-keep-first slot goes to the first PLAIN feature
            # (the count entry is only created in the == -1 branch,
            # tile.cpp:1293-1299).
            eff_minzoom = np.where(fmin >= 0, np.int16(-1), minzoom).astype(np.int16)
        for z in range(max(b_zoom, cfg.minzoom), cfg.maxzoom + 1):
            if fmin is not None or fmax is not None:
                act = np.ones(len(index), dtype=bool)
                if fmin is not None:
                    act &= (fmin < 0) | (z >= fmin)
                if fmax is not None:
                    act &= (fmax < 0) | (z <= fmax)
                tile_tbl, side_tbl = em.emit(
                    z, index[act], seq[act], swx[act], swy[act], bzx[act],
                    bzy[act], eff_minzoom[act], bucket,
                    route=(b_zoom, bx, by),
                    gaps=None if gaps is None else gaps[act],
                    vals=None if vals is None else vals[act],
                )
            else:
                tile_tbl, side_tbl = em.emit(
                    z, index, seq, swx, swy, bzx, bzy, eff_minzoom, bucket,
                    route=(b_zoom, bx, by), gaps=gaps, vals=vals,
                )
            if tile_tbl is not None:
                outs.append(tile_tbl)
            if side_tbl is not None:
                if cfg.emit_ids:
                    side_tbl = side_tbl.append_column(
                        "feature_ids",
                        pa.ListArray.from_arrays(
                            pa.array(np.zeros(len(side_tbl) + 1, dtype=np.int32)),
                            pa.array([], pa.int64()),
                        ),
                    )
                outs.append(side_tbl)
        # low-zoom side channel: ladder low-zoom features + this bucket's
        # first feature + any feature that is boundary at z < B
        if b_zoom > cfg.minzoom:
            surv_zoom = b_zoom
            if cfg.retain_points_multiplier > 1 and cfg.droprate > 1:
                # multiplier secondaries at z < B have integer minzoom up
                # to B + log(N)/log(droprate) (fractional-minzoom rule,
                # tile.cpp:1290-1319) — widen so they reach lowzoom_tiles
                import math as _math

                surv_zoom = b_zoom + int(
                    _math.ceil(_math.log(cfg.retain_points_multiplier) / _math.log(cfg.droprate))
                )
            surv = (eff_minzoom < surv_zoom) | (bzx < b_zoom) | (bzy < b_zoom)
            surv[0] = True
            if vals is not None:
                # accumulate mode: every feature's value folds into some
                # low-zoom survivor (the reference scans the full stream
                # at z0), so the side channel must carry the full stream
                surv = np.ones(len(index), dtype=bool)
            blob_cols = {
                "index": index[surv],
                "seq": seq[surv],
                "swx": swx[surv],
                "swy": swy[surv],
                "bzx": bzx[surv],
                "bzy": bzy[surv],
                "minzoom": eff_minzoom[surv],
            }
            if gaps is not None:
                # carry the z0-scan gap (tile.cpp:1180-1199 fills it once
                # over the FULL stream) so low-zoom strategies see the
                # same values the bucket zooms did
                blob_cols["gap"] = gaps[surv]
            if vals is not None:
                blob_cols["val"] = vals[surv]
            if fmin is not None or fmax is not None:
                blob_cols["fmin"] = (
                    fmin[surv] if fmin is not None else np.full(int(surv.sum()), -1, np.int16)
                )
                blob_cols["fmax"] = (
                    fmax[surv] if fmax is not None else np.full(int(surv.sum()), -1, np.int16)
                )
            blob = _feature_blob(blob_cols)
            row = pa.table(
                {
                    "z": pa.array([-1], pa.int32()),
                    "x": pa.array([0], pa.int32()),
                    "y": pa.array([0], pa.int32()),
                    "n_features": pa.array([int(surv.sum())], pa.int64()),
                    "tile": pa.array([blob], pa.large_binary()),
                    "bucket": pa.array([bucket], pa.int64()),
                    "kind": pa.array([1], pa.int8()),
                    "min_index": pa.array([0], pa.uint64()),
                    "min_seq": pa.array([0], pa.int64()),
                    "first_minzoom": pa.array([0], pa.int16()),
                }
            )
            if cfg.emit_ids:
                row = row.append_column(
                    "feature_ids",
                    pa.ListArray.from_arrays(pa.array([0, 0], pa.int32()), pa.array([], pa.int64())),
                )
            outs.append(row)
        if em.reports or em.counters:
            codes = {"mingap": 0, "minextent": 1, "mindrop_sequence": 2,
                     "minattribute": 3, "gamma": 4}
            # strategy counters ride the same channel with codes >= 10
            # (SUM-aggregated per zoom, mbtiles `strategies` metadata)
            ccodes = {"dropped_by_rate": 10, "dropped_by_gamma": 11,
                      "dropped_as_needed": 12, "coalesced_as_needed": 13}
            rz, rcode, rval = [], [], []
            for z_, rep in em.reports.items():
                for kname, v in rep.items():
                    rz.append(z_)
                    rcode.append(codes[kname])
                    if kname in ("minattribute", "gamma"):
                        rval.append(np.float64(v).view(np.uint64))
                    else:
                        rval.append(np.uint64(v))
            for z_, cnts in em.counters.items():
                for kname, v in cnts.items():
                    rz.append(z_)
                    rcode.append(ccodes[kname])
                    rval.append(np.uint64(v))
            outs.append(
                pa.table(
                    {
                        "z": pa.array(np.array(rz, np.int32)),
                        "x": pa.array(np.zeros(len(rz), np.int32)),
                        "y": pa.array(np.zeros(len(rz), np.int32)),
                        "n_features": pa.array(np.zeros(len(rz), np.int64)),
                        "tile": pa.array([b""] * len(rz), pa.large_binary()),
                        "bucket": pa.array(np.full(len(rz), bucket, np.int64)),
                        "kind": pa.array(np.full(len(rz), 4, np.int8)),
                        "min_index": pa.array(np.array(rval, np.uint64)),
                        "min_seq": pa.array(np.array(rcode, np.int64)),
                        "first_minzoom": pa.array(np.zeros(len(rz), np.int16)),
                    }
                )
            )
        if self.raw_dir is not None:
            # split: persist tile rows here; return summary + channels
            tile_tbls = [t for t in outs if t.num_rows and int(t["kind"][0].as_py()) == 0]
            channel_tbls = [t for t in outs if not t.num_rows or int(t["kind"][0].as_py()) != 0]
            outs = channel_tbls
            if tile_tbls:
                import pyarrow.parquet as pq

                full = pa.concat_tables(_align_tables(tile_tbls))
                path = os.path.join(self.raw_dir, f"bucket={bucket}")
                os.makedirs(path, exist_ok=True)
                tmp = os.path.join(path, "part-0.parquet.inprogress")
                pq.write_table(full.drop_columns(["bucket"]), tmp)
                os.replace(tmp, os.path.join(path, "part-0.parquet"))
                # per-zoom summary rows (kind=3): x carries n_tiles
                zs = full["z"].to_numpy(zero_copy_only=False)
                nf = full["n_features"].to_numpy(zero_copy_only=False)
                uz, inv = np.unique(zs, return_inverse=True)
                n_tiles = np.bincount(inv)
                n_feats = np.bincount(inv, weights=nf).astype(np.int64)
                outs.append(
                    pa.table(
                        {
                            "z": pa.array(uz.astype(np.int32)),
                            "x": pa.array(n_tiles.astype(np.int32)),
                            "y": pa.array(np.zeros(len(uz), np.int32)),
                            "n_features": pa.array(n_feats),
                            "tile": pa.array([b""] * len(uz), pa.large_binary()),
                            "bucket": pa.array(np.full(len(uz), bucket, np.int64)),
                            "kind": pa.array(np.full(len(uz), 3, np.int8)),
                            "min_index": pa.array(np.zeros(len(uz), np.uint64)),
                            "min_seq": pa.array(np.zeros(len(uz), np.int64)),
                            "first_minzoom": pa.array(np.zeros(len(uz), np.int16)),
                        }
                    )
                )
        if not outs:
            return _empty_tiles()
        # side rows lack cx/cy in tile rows and vice versa: align schemas
        outs = _align_tables(outs)
        return pa.concat_tables(outs)


_TILE_TYPES = {
    "z": pa.int32(), "x": pa.int32(), "y": pa.int32(),
    "n_features": pa.int64(), "tile": pa.large_binary(), "bucket": pa.int64(),
    "kind": pa.int8(), "min_index": pa.uint64(), "min_seq": pa.int64(),
    "first_minzoom": pa.int16(), "cx": pa.int64(), "cy": pa.int64(),
}


def _cast_tile_schema(t: pa.Table) -> pa.Table:
    for i, name in enumerate(t.column_names):
        want = _TILE_TYPES.get(name)
        if want is not None and t.schema.field(i).type != want:
            t = t.set_column(i, name, t[name].cast(want))
    return t


_CHAN_SCHEMA = None


def _chan_norm(t: "pa.Table") -> "pa.Table":
    """Channel-row canonical schema (tables all the way; no pylist)."""
    cols = list(_NORM_COLS) + ["cx", "cy", "val"]
    n = len(t)
    for c in cols:
        if c not in t.column_names:
            if c in ("cx", "cy"):
                t = t.append_column(c, pa.array(np.zeros(n, np.int64)))
            elif c == "val":
                t = t.append_column(c, pa.array(np.zeros(n, np.float64)))
            else:
                raise KeyError(c)
    return _cast_tile_schema(t.select(cols))


_NORM_COLS = (
    "z", "x", "y", "n_features", "tile", "bucket", "kind",
    "min_index", "min_seq", "first_minzoom",
)


def _empty_tiles() -> pa.Table:
    return pa.table(
        {c: pa.array([], type=_TILE_TYPES[c]) for c in _NORM_COLS}
    )


def _norm_tiles(t: pa.Table, emit_ids: bool = False) -> pa.Table:
    """Fixed column set/order + types so unions across raw-parquet,
    low-zoom and patch tables always line up."""
    cols = list(_NORM_COLS) + (["feature_ids"] if emit_ids else [])
    n = len(t)
    for c in cols:
        if c not in t.column_names:
            if c == "bucket":
                t = t.append_column(c, pa.array(np.full(n, -1, np.int64)))
            elif c == "kind":
                t = t.append_column(c, pa.array(np.zeros(n, np.int8)))
            elif c == "feature_ids":
                t = t.append_column(
                    c,
                    pa.ListArray.from_arrays(
                        pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.int64())
                    ),
                )
            else:
                raise KeyError(f"tile table missing column {c}")
    return _cast_tile_schema(t.select(cols))


def _norm_tiles_fn(emit_ids: bool):
    def fn(t: pa.Table) -> pa.Table:
        return _norm_tiles(t, emit_ids)

    return fn


def _align_tables(tables: list[pa.Table]) -> list[pa.Table]:
    all_cols: list[str] = []
    for t in tables:
        for c in t.column_names:
            if c not in all_cols:
                all_cols.append(c)
    out = []
    for t in tables:
        for c in all_cols:
            if c not in t.column_names:
                if c in ("cx", "cy"):
                    t = t.append_column(c, pa.array(np.zeros(len(t), dtype=np.int64)))
                elif c == "val":
                    t = t.append_column(c, pa.array(np.zeros(len(t), dtype=np.float64)))
                elif c == "feature_ids":
                    t = t.append_column(
                        c,
                        pa.ListArray.from_arrays(
                            pa.array(np.zeros(len(t) + 1, dtype=np.int32)),
                            pa.array([], pa.int64()),
                        ),
                    )
        out.append(t.select(all_cols))
    return out


def drop_denser_minzooms(narrow: ray.data.Dataset, cfg: PyramidConfig) -> np.ndarray:
    """--drop-denser global pass (main.cpp:2692-2727): features with
    ix %% 100 < N get minzoom from the global ranking of gaps to the
    previous SELECTED feature (largest gap = sparsest = lowest
    minzoom, stable); the rest ride the rate ladder over the
    non-selected SUBSEQUENCE (the reference's drop-state counters only
    step for non-selected features there).

    Scale note: this pass materializes (index, seq) on the driver —
    16 B/feature, mirroring the reference's own mmap of the full index
    file; at cluster scale replace the driver sort with ds.sort."""
    import math as _math

    tbl = narrow.select_columns(["index", "seq"]).to_pandas()
    order = np.lexsort((tbl["seq"].to_numpy(), tbl["index"].to_numpy()))
    ix = tbl["index"].to_numpy()[order].astype(np.uint64)
    n = len(ix)
    mz = np.zeros(n, dtype=np.int16)
    sel = (ix % np.uint64(100)) < np.uint64(cfg.drop_denser)
    ns = np.flatnonzero(~sel)
    if len(ns):
        mz[ns] = minzoom_for_rank_range(
            0, len(ns), cfg.maxzoom, cfg.resolved_basezoom(), cfg.droprate
        ).astype(np.int16)
    s_pos = np.flatnonzero(sel)
    if len(s_pos):
        six = ix[s_pos]
        prev = np.concatenate(([np.uint64(0)], six[:-1]))
        gap = six - prev
        order2 = np.argsort(~gap, kind="stable")  # largest gap first, stable
        basezoom = cfg.resolved_basezoom()
        zs = np.full(len(s_pos), basezoom, dtype=np.int16)
        i = 0
        for z in range(0, basezoom + 1):
            kf = 1.0 / _math.exp(_math.log(cfg.droprate) * (basezoom - z)) if cfg.droprate > 1 else 1.0
            keep_count = int(len(s_pos) * kf)
            while i < keep_count and i < len(s_pos):
                zs[order2[i]] = z
                i += 1
        mz[s_pos] = zs
    return mz


@ray.remote(num_returns=2)
def _dd_block_meta(tbl: pa.Table, pct: int):
    """Phase A of the distributed --drop-denser pass, over one
    (index, seq)-sorted block: tiny driver meta (row / selected
    counts, the block's last selected index for gap chaining)."""
    ix = tbl["index"].to_numpy(zero_copy_only=False).astype(np.uint64)
    sel = (ix % np.uint64(100)) < np.uint64(pct)
    s_pos = np.flatnonzero(sel)
    meta = {
        "n": len(ix),
        "n_sel": int(len(s_pos)),
        "last_sel_ix": int(ix[s_pos[-1]]) if len(s_pos) else None,
    }
    return meta, sel


@ray.remote(num_returns=2)
def _dd_block_rank(tbl: pa.Table, sel: np.ndarray, prev_sel_ix: int,
                   ns_base: int, sel_base: int, maxzoom: int,
                   basezoom: int, droprate: float):
    """Phase B: the block table with ddmz filled for the NON-selected
    subsequence (rate ladder over global non-selected ranks), plus the
    selected rows' (selpos, gap) pairs for the global gap ranking.
    Gap = uint64 wraparound distance to the previous selected
    feature's index, chained across blocks via prev_sel_ix."""
    ix = tbl["index"].to_numpy(zero_copy_only=False).astype(np.uint64)
    mz = np.zeros(len(ix), dtype=np.int16)
    ns = np.flatnonzero(~sel)
    if len(ns):
        mz[ns] = minzoom_for_rank_range(
            ns_base, ns_base + len(ns), maxzoom, basezoom, droprate
        ).astype(np.int16)
    s_pos = np.flatnonzero(sel)
    pairs = pa.table({
        "gap": pa.array(np.zeros(0, np.uint64)),
        "selpos": pa.array(np.zeros(0, np.int64)),
    })
    if len(s_pos):
        six = ix[s_pos]
        prev = np.concatenate(([np.uint64(prev_sel_ix)], six[:-1]))
        pairs = pa.table({
            "gap": pa.array(six - prev),
            "selpos": pa.array(sel_base + np.arange(len(s_pos), dtype=np.int64)),
        })
    out = tbl.append_column("ddmz", pa.array(mz, pa.int16()))
    return out.replace_schema_metadata(None), pairs


def _dd_keep_counts(n_sel: int, basezoom: int, droprate: float) -> np.ndarray:
    """Cumulative keep counts per zoom for the selected gap ranking
    (main.cpp:2706-2719): rank r's minzoom is the first z whose keep
    count exceeds r."""
    import math as _math

    kc = np.empty(basezoom + 1, np.int64)
    for z in range(basezoom + 1):
        kf = (1.0 / _math.exp(_math.log(droprate) * (basezoom - z))
              if droprate > 1 else 1.0)
        kc[z] = int(n_sel * kf)
    return kc


@ray.remote
def _dd_rank_route(tbl: pa.Table, rank_base: int, kc: np.ndarray,
                   basezoom: int, sel_bounds: np.ndarray) -> dict:
    """One block of the (gap desc, selpos asc)-sorted pair stream:
    assign each row's minzoom from its global rank, then hash-route
    {selpos, zs} back to the originating feature block (selpos ranges
    are contiguous per block, so searchsorted over the block bases
    routes exactly)."""
    n = tbl.num_rows
    if n == 0:
        return {}
    ranks = rank_base + np.arange(n, dtype=np.int64)
    zs = np.searchsorted(kc, ranks, side="right").astype(np.int16)
    zs[zs > basezoom] = basezoom
    selpos = tbl["selpos"].to_numpy(zero_copy_only=False)
    bid = np.searchsorted(sel_bounds, selpos, side="right") - 1
    out = {}
    for b in np.unique(bid):
        m = bid == b
        out[int(b)] = ray.put(pa.table({
            "selpos": pa.array(selpos[m]),
            "zs": pa.array(zs[m], pa.int16()),
        }))
    return out


@ray.remote
def _dd_fill(tbl: pa.Table, sel: np.ndarray, sel_base: int,
             zs_refs: list) -> pa.Table:
    """Scatter the selected minzooms into the block's ddmz column: the
    block's selected rows own the contiguous selpos range starting at
    sel_base, in position order."""
    mz = tbl["ddmz"].to_numpy(zero_copy_only=False).astype(np.int16).copy()
    s_pos = np.flatnonzero(sel)
    for r in zs_refs:
        part = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        sp = part["selpos"].to_numpy(zero_copy_only=False)
        zs = part["zs"].to_numpy(zero_copy_only=False)
        mz[s_pos[sp - sel_base]] = zs
    i = tbl.column_names.index("ddmz")
    return tbl.set_column(i, "ddmz", pa.array(mz, pa.int16()))


def attach_drop_denser_minzoom(
    narrow: ray.data.Dataset, cfg: PyramidConfig
) -> ray.data.Dataset:
    """Distributed --drop-denser pass (main.cpp:2692-2727): the narrow
    Dataset comes back with a per-row `ddmz` column carrying each
    feature's global minzoom — semantics identical to
    drop_denser_minzooms (the driver-side oracle) but with no O(n)
    driver pull: a range sort orders the stream, per-block tasks build
    the non-selected ladder and the selected gap pairs, a second
    distributed sort ranks the gaps (descending, ties by original
    selected order), and the resulting minzooms hash-route back to
    their feature blocks as {block: ref} maps."""
    ds = narrow.sort(["index", "seq"]).materialize()
    blocks = list(ds.to_arrow_refs())
    metas_sel = [_dd_block_meta.remote(b, cfg.drop_denser) for b in blocks]
    metas = ray.get([p[0] for p in metas_sel])
    keep = [i for i, m in enumerate(metas) if m["n"]]
    if not keep:
        return ds
    blocks = [blocks[i] for i in keep]
    sels = [metas_sel[i][1] for i in keep]
    metas = [metas[i] for i in keep]
    basezoom = cfg.resolved_basezoom()
    ns_base = sel_base = 0
    prev_sel = 0
    phase_b = []
    sel_bases = []
    for b, s, m in zip(blocks, sels, metas):
        sel_bases.append(sel_base)
        phase_b.append(_dd_block_rank.remote(
            b, s, prev_sel, ns_base, sel_base,
            cfg.maxzoom, basezoom, cfg.droprate))
        ns_base += m["n"] - m["n_sel"]
        sel_base += m["n_sel"]
        if m["last_sel_ix"] is not None:
            prev_sel = m["last_sel_ix"]
    n_sel = sel_base
    out_blocks = [p[0] for p in phase_b]
    if n_sel == 0:
        return ray.data.from_arrow_refs(out_blocks)
    pair_ds = ray.data.from_arrow_refs([p[1] for p in phase_b]).sort(
        ["gap", "selpos"], descending=[True, False]
    ).materialize()
    kc = _dd_keep_counts(n_sel, basezoom, cfg.droprate)
    sel_bounds = np.array(sel_bases, np.int64)
    rank_blocks = list(pair_ds.to_arrow_refs())
    # tiny count pass for rank bases (one int per sorted block)
    counts = ray.get([_dd_count.remote(r) for r in rank_blocks])
    rank_bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    route_maps = ray.get([
        _dd_rank_route.remote(r, int(rb), kc, basezoom, sel_bounds)
        for r, rb in zip(rank_blocks, rank_bases)
    ])
    filled = []
    for i, (ob, s) in enumerate(zip(out_blocks, sels)):
        zs_refs = [rm[i] for rm in route_maps if i in rm]
        if zs_refs:
            filled.append(_dd_fill.remote(ob, s, sel_bases[i], zs_refs))
        else:
            filled.append(ob)
    return ray.data.from_arrow_refs(filled)


@ray.remote
def _dd_count(tbl: pa.Table) -> int:
    return tbl.num_rows


def lowzoom_tiles(survivor_rows: list[dict], cfg: PyramidConfig, bucket_zoom: int,
                  counters_out: dict | None = None,
                  n_total: int | None = None) -> pa.Table | None:
    """Second (tiny) pass: tiles for z in [minzoom, B). Input is the
    per-bucket survivor blobs; |input| ≈ n_buckets + n/droprate^(bz-B).

    Per-tile strategies run here too (gamma/cluster/as-needed ladders at
    z < B act on the biggest tiles): gaps are the z0-scan values carried
    in the blob, and the as-needed thresholds get their own zoom-global
    consensus loop (zooms here are disjoint from the bucket zooms, so
    the two consensus domains never interact)."""
    import warnings

    if bucket_zoom <= cfg.minzoom or not survivor_rows:
        return None
    t = pa.concat_tables([_blob_to_table(r["tile"]) for r in survivor_rows])
    index = t["index"].to_numpy(zero_copy_only=False).astype(np.uint64)
    seq = t["seq"].to_numpy(zero_copy_only=False)
    swx = t["swx"].to_numpy(zero_copy_only=False)
    swy = t["swy"].to_numpy(zero_copy_only=False)
    bzx = t["bzx"].to_numpy(zero_copy_only=False)
    bzy = t["bzy"].to_numpy(zero_copy_only=False)
    minzoom = t["minzoom"].to_numpy(zero_copy_only=False)
    fmin = t["fmin"].to_numpy(zero_copy_only=False) if "fmin" in t.column_names else None
    fmax = t["fmax"].to_numpy(zero_copy_only=False) if "fmax" in t.column_names else None
    gaps = t["gap"].to_numpy(zero_copy_only=False).astype(np.uint64) if "gap" in t.column_names else None
    vals = t["val"].to_numpy(zero_copy_only=False).astype(np.float64) if "val" in t.column_names else None
    order = np.lexsort((seq, index))
    index, seq, swx, swy = index[order], seq[order], swx[order], swy[order]
    bzx, bzy, minzoom = bzx[order], bzy[order], minzoom[order]
    if fmin is not None:
        fmin = fmin[order]
    if fmax is not None:
        fmax = fmax[order]
    if vals is not None:
        vals = vals[order]
    scfg = getattr(cfg, "strategies", None)
    strat = scfg is not None and scfg.any_active()
    if gaps is not None:
        gaps = gaps[order]
    elif strat:
        # fallback for blobs persisted before gaps were carried:
        # recompute over the survivor set (approximate)
        from ..stages.strategies import compute_gaps

        gaps = compute_gaps(index, swx, swy)

    overrides: dict = {}
    outs: list = []
    for attempt in range(5):
        em = ZoomEmitter(cfg, overrides)
        outs = []
        for z in range(cfg.minzoom, bucket_zoom):
            if fmin is not None or fmax is not None:
                act = np.ones(len(index), dtype=bool)
                if fmin is not None:
                    act &= (fmin < 0) | (z >= fmin)
                if fmax is not None:
                    act &= (fmax < 0) | (z <= fmax)
                tt, _ = em.emit(z, index[act], seq[act], swx[act], swy[act],
                                bzx[act], bzy[act], minzoom[act], bucket=-1, route=None,
                                gaps=None if gaps is None else gaps[act],
                                vals=None if vals is None else vals[act])
            else:
                tt, _ = em.emit(z, index, seq, swx, swy, bzx, bzy, minzoom,
                                bucket=-1, route=None, gaps=gaps, vals=vals)
            if tt is not None:
                outs.append(tt)
        attr_desc = bool(
            scfg is not None and getattr(scfg, "drop_by_attribute_descending", False)
        )
        changed = False
        for z_, rep in em.reports.items():
            cur = overrides.setdefault(z_, {})
            for k_, v_ in rep.items():
                if k_ == "minattribute":
                    prev = cur.get(k_)
                    if prev is None or (v_ < prev if attr_desc else v_ > prev):
                        cur[k_] = v_
                        changed = True
                elif v_ > cur.get(k_, 0):
                    cur[k_] = v_
                    changed = True
        if not changed:
            break
    else:
        warnings.warn(
            "lowzoom threshold consensus did not converge in 5 iterations; "
            "tiles may exceed max_tile_features (reference retries until fit, "
            "tile.cpp:3392-3572)"
        )
    if counters_out is not None:
        # final iteration's counters (fresh emitter per retry)
        for z_, cnts in em.counters.items():
            cur = counters_out.setdefault(int(z_), {})
            for k_, v_ in cnts.items():
                cur[k_] = cur.get(k_, 0) + int(v_)
        if n_total is not None and n_total > len(index):
            # features the ladder channel never carried to this pass
            # were implicitly rate-dropped at every z < B (the reference
            # write_tile scans the FULL stream per zoom and counts each,
            # tile.cpp:1970-1973). fmin/fmax gating of non-survivors is
            # not recoverable here; plain ladder corpora have none.
            implicit = n_total - len(index)
            for z_ in range(cfg.minzoom, bucket_zoom):
                cur = counters_out.setdefault(int(z_), {})
                cur["dropped_by_rate"] = cur.get("dropped_by_rate", 0) + implicit
    if not outs:
        return None
    return pa.concat_tables(_align_tables(outs))


# ------------------------------------------------------- side-copy merge


def _remove_first_feature(layer_msg: bytes) -> bytes:
    """Drop the first feature record from a tile's single-layer message
    (the demoted former first-of-tile). Layout written by our encoder:
    [0x1a len [version/name header][features…][extent trailer]]."""
    # outer: field 3 len-delim
    pos = 0
    key, pos = _read_varint(layer_msg, pos)
    ln, pos = _read_varint(layer_msg, pos)
    body = layer_msg[pos : pos + ln]
    # body: version tag (0x78 v) + name (0x0a len name) + features + trailer
    p = 0
    k, p = _read_varint(body, p)  # 0x78
    _, p = _read_varint(body, p)
    k, p = _read_varint(body, p)  # 0x0a
    nlen, p = _read_varint(body, p)
    p += nlen
    header = body[:p]
    # first feature record at p: 0x12 len payload
    k, q = _read_varint(body, p)
    flen, q = _read_varint(body, q)
    rest = body[q + flen :]
    new_body = header + rest
    return _len_delim(3, new_body)


def _rebuild_tile_attrs(raw: bytes, ghosts: list[dict], z: int,
                        cfg: PyramidConfig, remove_first: bool) -> bytes:
    """Attr-mode tile rebuild: decode the layer, drop/append features,
    re-encode with encode_layer (byte splicing can't extend the
    key/value pools)."""
    from ..stages.mvt import decode_tile, encode_layer, encode_tile, varint_array, zigzag

    layers = decode_tile(raw) if raw else []
    feats = []
    attr_name = cfg.attr_accum[0] if cfg.attr_accum else None
    for lay in layers:
        for i, f in enumerate(lay["features"]):
            if remove_first and i == 0:
                continue
            cmd, pts = f["geometry"][0]
            lx, ly = int(pts[0][0]), int(pts[0][1])
            geom = varint_array(np.array(
                [(1 << 3) | 1, int(zigzag(np.array([lx]))[0]), int(zigzag(np.array([ly]))[0])],
                dtype=np.uint64))
            feats.append({"geom": geom, "type": 1, "attrs": dict(f.get("tags", {}))})
    shift = WORLD_BITS - z - cfg.detail
    for g in ghosts:
        gx, gy = _ghost_local(g, z, cfg)
        if shift >= 0:
            gx >>= shift
            gy >>= shift
        else:
            gx <<= -shift
            gy <<= -shift
        geom = varint_array(np.array(
            [(1 << 3) | 1, int(zigzag(np.array([gx]))[0]), int(zigzag(np.array([gy]))[0])],
            dtype=np.uint64))
        attrs = {}
        if attr_name is not None and "val" in g:
            attrs[attr_name] = float(g["val"])
        feats.append({"geom": geom, "type": 1, "attrs": attrs})
    return encode_tile(
        [encode_layer(cfg.layer_name, feats, 1 << cfg.detail)], compress=False
    )


def rescan_side_tiles(
    tile_tbl: pa.Table,
    side_rows: list[dict],
    cfg: PyramidConfig,
    narrow: ray.data.Dataset,
    offsets: dict[int, int],
    bucket_zoom: int,
) -> pa.Table:
    """Attr-mode replacement for merge_side_copies: cross-bucket ghost
    copies participate in the receiving tile's SCAN (they can receive
    attribute folds from later-dropped features), so byte splicing is
    insufficient — re-run the affected tiles' keep+fold from the raw
    narrow rows of their owner buckets plus the side-row ghosts."""
    import warnings

    from ..functions.spatial import _spread_bits32
    from ..stages.strategies import fold_numeric
    from ..stages.tile_encode import encode_point_tiles_attrs

    if not side_rows:
        return tile_tbl
    if cfg.retain_points_multiplier > 1 or (
        cfg.strategies is not None and cfg.strategies.any_active()
    ):
        warnings.warn(
            "accumulate-attribute with cross-bucket boundary ghosts and "
            "multiplier/strategies active: ghost-tile rescan uses the "
            "plain keep rule"
        )
    by_tile: dict[tuple[int, int, int], list[dict]] = {}
    for r in side_rows:
        by_tile.setdefault((int(r["z"]), int(r["x"]), int(r["y"])), []).append(r)

    # owner buckets of the affected tiles
    aff_buckets: set[int] = set()
    for (z, x, y) in by_tile:
        sh = z - bucket_zoom
        bx_ = x >> sh if sh >= 0 else 0
        by_ = y >> sh if sh >= 0 else 0
        mk = int(
            (_spread_bits32(np.array([bx_], np.int64))[0] << np.uint64(1))
            | _spread_bits32(np.array([by_], np.int64))[0]
        )
        aff_buckets.add(mk)
    want = np.array(sorted(aff_buckets), dtype=np.int64)
    want_ref = ray.put(want)

    def flt(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        return t.filter(pa.array(np.isin(t["bucket"].to_numpy(zero_copy_only=False), w)))

    sub = narrow.map_batches(flt, batch_format="pyarrow").to_pandas()
    g = cfg.resolved_gscale()
    buckets_data: dict[int, dict] = {}
    for bk, grp in sub.groupby("bucket"):
        grp = grp.sort_values(["index", "seq"])
        index = grp["index"].to_numpy().astype(np.uint64)
        mz = minzoom_for_rank_range(
            offsets[int(bk)], offsets[int(bk)] + len(grp), cfg.maxzoom,
            cfg.resolved_basezoom(), cfg.droprate,
        ).astype(np.int16)
        buckets_data[int(bk)] = {
            "index": index,
            "seq": grp["seq"].to_numpy(),
            "swx": snap_coords(grp["wx"].to_numpy(), g),
            "swy": snap_coords(grp["wy"].to_numpy(), g),
            "mz": mz,
            "val": grp[cfg.attr_accum[0]].to_numpy().astype(np.float64)
            if cfg.attr_accum
            else np.zeros(len(grp)),
        }

    df = tile_tbl.to_pandas()
    keyset = set(zip(df["z"].astype(int), df["x"].astype(int), df["y"].astype(int)))
    new_rows = []
    for (z, x, y), ghosts in by_tile.items():
        sh = z - bucket_zoom
        bx_ = x >> sh if sh >= 0 else 0
        by_ = y >> sh if sh >= 0 else 0
        mk = int(
            (_spread_bits32(np.array([bx_], np.int64))[0] << np.uint64(1))
            | _spread_bits32(np.array([by_], np.int64))[0]
        )
        bd = buckets_data.get(mk)
        shift = WORLD_BITS - z
        cand: list[tuple] = []  # (index, seq, mz, cx, cy, val)
        if bd is not None:
            tx_all = (bd["swx"] >> shift).astype(np.int64)
            ty_all = (bd["swy"] >> shift).astype(np.int64)
            bzx = boundary_zoom(bd["swx"])
            bzy = boundary_zoom(bd["swy"])
            for dx, dy, m in (
                (0, 0, np.ones(len(tx_all), bool)),
                (1, 0, bzx <= z),
                (0, 1, bzy <= z),
                (1, 1, (bzx <= z) & (bzy <= z)),
            ):
                hitm = m & (tx_all - dx == x) & (ty_all - dy == y)
                for i in np.flatnonzero(hitm):
                    cand.append(
                        (int(bd["index"][i]), int(bd["seq"][i]), int(bd["mz"][i]),
                         int(bd["swx"][i]), int(bd["swy"][i]), float(bd["val"][i]))
                    )
        for gr in ghosts:
            cand.append(
                (int(gr["min_index"]), int(gr["min_seq"]), int(gr["first_minzoom"]),
                 int(gr["cx"]), int(gr["cy"]), float(gr.get("val", 0.0)))
            )
        cand.sort(key=lambda c: (c[0], c[1]))
        mzs = np.array([c[2] for c in cand], dtype=np.int16)
        keep = mzs <= z
        if len(keep):
            keep[0] = True  # first feature of the tile is always kept
        vals_arr = np.array([c[5] for c in cand], dtype=np.float64)
        folded = (
            fold_numeric(vals_arr, keep, cfg.attr_accum[1])
            if cfg.attr_accum
            else vals_arr
        )
        kept_idx = np.flatnonzero(keep)
        n_kept = len(kept_idx)
        cx = np.array([c[3] for c in cand], dtype=np.int64)[kept_idx]
        cy = np.array([c[4] for c in cand], dtype=np.int64)[kept_idx]
        tile_bytes = b""
        if cfg.encode_tiles and n_kept:
            tile_bytes = encode_point_tiles_attrs(
                cx, cy, np.array([0]), np.array([n_kept]),
                np.array([x]), np.array([y]), z,
                layer_name=cfg.layer_name, detail=cfg.detail, compress=cfg.compress,
                attr_name=cfg.attr_accum[0] if cfg.attr_accum else None,
                attr_vals=folded[kept_idx] if cfg.attr_accum else None,
            )[0]
        row = {
            "z": z, "x": x, "y": y, "n_features": n_kept, "tile": tile_bytes,
            "bucket": -1, "kind": 0,
            "min_index": cand[0][0] if cand else 0,
            "min_seq": cand[0][1] if cand else 0,
            "first_minzoom": cand[0][2] if cand else 0,
        }
        if (z, x, y) in keyset:
            i = df.index[(df["z"] == z) & (df["x"] == x) & (df["y"] == y)][0]
            for k_, v_ in row.items():
                df.at[i, k_] = v_
        else:
            new_rows.append(row)
    if new_rows:
        import pandas as pd

        df = pd.concat([df, pd.DataFrame(new_rows)], ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def merge_side_copies(
    tile_tbl: pa.Table, side_rows: list[dict], cfg: PyramidConfig
) -> pa.Table:
    """Splice cross-bucket boundary copies into the tile set (driver-side;
    side rows are O(2^{G-18}) of features — rare)."""
    import gzip as _gzip
    import zlib as _zlib

    if not side_rows:
        return tile_tbl
    by_tile: dict[tuple[int, int, int], list[dict]] = {}
    for r in side_rows:
        by_tile.setdefault((int(r["z"]), int(r["x"]), int(r["y"])), []).append(r)
    for v in by_tile.values():
        v.sort(key=lambda r: (int(r["min_index"]), int(r["min_seq"])))

    df = tile_tbl.to_pandas()
    if df.empty and "z" not in df.columns:
        # an all-empty affected set can arrive column-less
        df = _empty_tiles().to_pandas()
    tile_keys = set(zip(df["z"].astype(int), df["x"].astype(int), df["y"].astype(int)))
    new_rows = []
    for key, ghosts in by_tile.items():
        z = key[0]
        if key in tile_keys:
            idx = df.index[(df["z"] == z) & (df["x"] == key[1]) & (df["y"] == key[2])][0]
            row = df.loc[idx]
            g_kept = [g for g in ghosts if int(g["first_minzoom"]) <= z]
            add = len(g_kept)
            remove_first = False
            g0 = ghosts[0]
            if (int(g0["min_index"]), int(g0["min_seq"])) < (int(row["min_index"]), int(row["min_seq"])):
                # a ghost is the new first-of-tile
                if int(g0["first_minzoom"]) > z:
                    add += 1
                    g_kept = [g0] + g_kept
                if int(row["first_minzoom"]) > z:
                    add -= 1  # demoted interior first loses its free pass
                    remove_first = True
            df.at[idx, "n_features"] = int(row["n_features"]) + add
            if cfg.encode_tiles and (g_kept or remove_first):
                data = row["tile"]
                raw = _gzip.decompress(data) if bytes(data[:2]) == b"\x1f\x8b" else bytes(data)
                if cfg.attr_accum or cfg.cluster_stats:
                    raw = _rebuild_tile_attrs(raw, g_kept, z, cfg, remove_first)
                else:
                    if remove_first:
                        raw = _remove_first_feature(raw)
                    if g_kept:
                        raw = _splice_ghost_features(raw, g_kept, z, cfg)
                if cfg.compress:
                    from ..stages.mvt import gzip_tile as _gz
                    raw = _gz(raw)
                df.at[idx, "tile"] = raw
        else:
            # tile exists only through ghost copies: first is kept
            kept = [ghosts[0]] + [g for g in ghosts[1:] if int(g["first_minzoom"]) <= z]
            tile_bytes = b""
            if cfg.encode_tiles:
                if cfg.attr_accum or cfg.cluster_stats:
                    tile_bytes = _rebuild_tile_attrs(b"", kept, z, cfg, False)
                    if cfg.compress:
                        from ..stages.mvt import gzip_tile as _gz
                        tile_bytes = _gz(tile_bytes)
                else:
                    tile_bytes = _encode_ghost_tile(kept, z, cfg)
            new_rows.append(
                {
                    "z": z, "x": key[1], "y": key[2], "n_features": len(kept),
                    "tile": tile_bytes, "bucket": -1, "kind": 0,
                    "min_index": int(ghosts[0]["min_index"]),
                    "min_seq": int(ghosts[0]["min_seq"]),
                    "first_minzoom": int(ghosts[0]["first_minzoom"]),
                }
            )
    if new_rows:
        import pandas as pd

        df = pd.concat([df, pd.DataFrame(new_rows)], ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _ghost_local(g: dict, z: int, cfg: PyramidConfig):
    span_shift = WORLD_BITS - z
    return int(g["cx"]) - (int(g["x"]) << span_shift), int(g["cy"]) - (int(g["y"]) << span_shift)


def _splice_ghost_features(raw: bytes, ghosts: list[dict], z: int, cfg: PyramidConfig) -> bytes:
    # raw = 0x1a len body; append ghost features before the extent trailer
    pos = 0
    _, pos = _read_varint(raw, pos)
    ln, pos = _read_varint(raw, pos)
    body = raw[pos : pos + ln]
    trailer = _tag_varint(5, 1 << cfg.detail)
    assert body.endswith(trailer)
    core = body[: -len(trailer)]
    shift = WORLD_BITS - z - cfg.detail
    lx = np.array([_ghost_local(g, z, cfg)[0] for g in ghosts], dtype=np.int64)
    ly = np.array([_ghost_local(g, z, cfg)[1] for g in ghosts], dtype=np.int64)
    if shift >= 0:
        lx >>= shift
        ly >>= shift
    else:
        lx <<= -shift
        ly <<= -shift
    buf, _ = encode_point_features(lx, ly)
    return _len_delim(3, core + buf.tobytes() + trailer)


def _encode_ghost_tile(ghosts: list[dict], z: int, cfg: PyramidConfig) -> bytes:
    import zlib as _zlib

    shift = WORLD_BITS - z - cfg.detail
    lx = np.array([_ghost_local(g, z, cfg)[0] for g in ghosts], dtype=np.int64)
    ly = np.array([_ghost_local(g, z, cfg)[1] for g in ghosts], dtype=np.int64)
    if shift >= 0:
        lx >>= shift
        ly >>= shift
    else:
        lx <<= -shift
        ly <<= -shift
    buf, _ = encode_point_features(lx, ly)
    header = _tag_varint(15, 2) + _len_delim(1, cfg.layer_name.encode("utf-8"))
    body = header + buf.tobytes() + _tag_varint(5, 1 << cfg.detail)
    tile = _len_delim(3, body)
    if cfg.compress:
        from ..stages.mvt import gzip_tile as _gz
        tile = _gz(tile)
    return tile


# ------------------------------------------------------------ entry point


def build_pyramid_from_narrow(
    narrow: ray.data.Dataset,
    cfg: PyramidConfig,
    n_rows: int | None = None,
    out_dir: str | None = None,
    resume: bool = False,
) -> ray.data.Dataset:
    """Pyramid over a pre-geotagged narrow dataset (wx, wy, index, seq).

    With out_dir set, the heavy per-bucket output (all kinds) is
    persisted under out_dir/raw partitioned by bucket — the resumable
    unit of work with per-partition lineage (north_rule). The low-zoom
    pass and boundary-copy merge are small derived passes recomputed
    from the persisted rows, so a partial resume stays correct."""
    import time as _time

    _dbg = os.environ.get("TIPPECANOE_RAY_DEBUG")
    _t0 = _time.time()

    def _mark(label):
        nonlocal _t0
        if _dbg:
            print(f"[pyramid] {label}: {_time.time() - _t0:.2f}s", flush=True)
        _t0 = _time.time()

    def world_clip(t: pa.Table) -> pa.Table:
        # off-plane points (NaN/∞ projections, projection.cpp:22-55)
        # are clipped away at the root tile (clip_point inclusive
        # bounds, clip.cpp:84-104)
        wxc = t["wx"].to_numpy(zero_copy_only=False)
        wyc = t["wy"].to_numpy(zero_copy_only=False)
        m = (wxc >= 0) & (wxc <= 1 << 32) & (wyc >= 0) & (wyc <= 1 << 32)
        if bool(m.all()):
            return t
        return t.filter(pa.array(m))

    narrow = narrow.map_batches(world_clip, batch_format="pyarrow")
    n_cpus_early = int(ray.cluster_resources().get("CPU", 8))
    if n_rows is None:
        # count requires one execution; materialize so the pass is reused
        narrow = narrow.materialize()
        n_rows = narrow.count()
    _mark("count")
    # block count ≈ 2/CPU: enough for balance, few enough that the
    # exchange's blocks × partitions object count stays small
    n_blocks = int(max(2, min(2 * n_cpus_early, max(1, n_rows // 50_000))))
    b = cfg.bucket_zoom if cfg.bucket_zoom is not None else auto_bucket_zoom(n_rows, cfg.maxzoom)
    b = max(cfg.minzoom, min(b, cfg.maxzoom))
    narrow = add_bucket(narrow, b).materialize()
    # block-count control for the exchange (blocks × partitions object
    # refs): repartition only when the materialized layout is far off —
    # a second pass over already-pinned blocks, skipped when the read
    # produced a sane block count
    nb = narrow.num_blocks()
    if nb > 4 * n_blocks or nb < max(1, n_blocks // 4):
        narrow = narrow.repartition(n_blocks).materialize()
    _mark("materialize narrow")
    offsets = bucket_offsets(narrow)
    _mark("offsets")
    raw_dir = os.path.join(out_dir, "raw") if out_dir else None
    done: set[int] = set()
    if resume and raw_dir and os.path.isdir(raw_dir):
        done = {
            int(name.split("=", 1)[1])
            for name in os.listdir(raw_dir)
            if name.startswith("bucket=")
        }
    if done:
        done_ref = ray.put(done)

        def not_done(t: pa.Table) -> pa.Table:
            d = ray.get(done_ref)
            bs = t["bucket"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(bs, list(d))))

        narrow = narrow.map_batches(not_done, batch_format="pyarrow")
    if raw_dir:
        os.makedirs(raw_dir, exist_ok=True)

    # ---- the ONE wide exchange: range-partition complete buckets to
    # P reduce tasks. Ranges are cut on cumulative ROW counts (the
    # offsets know every bucket's weight), so hot subtrees are balanced
    # explicitly — the north_rule's skew handling. Contiguity lets each
    # reduce task run the drop ladder once over one global-rank range.
    # Expressed with raw Ray tasks: the Dataset API's shuffles (sort- or
    # hash-based) cannot express "range partition by known boundaries
    # with per-partition state", and measured 10-20× slower here.
    import math

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    p_parts = int(max(4, min(256, math.ceil(n_rows / 50_000), 4 * n_cpus)))
    sorted_buckets = sorted(offsets)
    total_rows = n_rows
    boundaries: list[int] = []
    next_cut = total_rows / p_parts
    for bk in sorted_buckets:
        if offsets[bk] >= next_cut and len(boundaries) < p_parts - 1:
            boundaries.append(bk)
            next_cut = (len(boundaries) + 1) * total_rows / p_parts
    bound_arr = np.array(boundaries, dtype=np.int64)
    offsets_ref = ray.put(offsets)
    minzoom_ref = None
    if cfg.drop_denser > 0:
        # distributed global pass: ddmz rides the rows as a column
        # (drop_denser_minzooms is the driver-side oracle it must match)
        narrow = attach_drop_denser_minzoom(narrow, cfg)

    @ray.remote
    def _partition(tbl: pa.Table, bounds: np.ndarray, np_: int):
        if len(tbl) == 0 or "bucket" not in tbl.column_names:
            # empty repartition blocks can carry an empty schema
            empty = _empty_tiles().select([])
            e = pa.table({})
            return tuple(e for _ in range(np_)) if np_ > 1 else e
        bs = tbl["bucket"].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(bounds, bs, side="right")
        order = np.argsort(pid, kind="stable")
        ps = pid[order]
        cuts = np.searchsorted(ps, np.arange(np_ + 1))
        t2 = tbl.take(pa.array(order)).combine_chunks()
        return tuple(t2.slice(cuts[j], cuts[j + 1] - cuts[j]) for j in range(np_))

    @ray.remote
    def _reduce(worker_ser, *pieces):
        tbls = [p for p in pieces if p.num_rows and "bucket" in p.column_names]
        if not tbls:
            return _empty_tiles()
        return worker_ser(pa.concat_tables(tbls))

    def _run_exchange_once(worker) -> list[pa.Table]:
        mat_narrow = narrow if not done else narrow.materialize()
        if mat_narrow.count() == 0:
            return []
        refs = mat_narrow.to_arrow_refs()
        part = _partition.options(num_returns=p_parts) if p_parts > 1 else _partition
        cols = [part.remote(r, bound_arr, p_parts) for r in refs]
        if p_parts == 1:
            cols = [(c,) for c in cols]
        outs = [
            _reduce.remote(worker, *[cols[i][j] for i in range(len(cols))])
            for j in range(p_parts)
        ]
        return ray.get(outs)

    def _threshold_reports(tbls: list[pa.Table]) -> dict:
        codes = {0: "mingap", 1: "minextent", 2: "mindrop_sequence",
                 3: "minattribute", 4: "gamma"}
        attr_desc = bool(
            cfg.strategies is not None
            and getattr(cfg.strategies, "drop_by_attribute_descending", False)
        )
        out: dict = {}
        for t in tbls:
            if len(t) == 0:
                continue
            kindc = t["kind"].to_numpy(zero_copy_only=False)
            m = kindc == 4
            if not m.any():
                continue
            zs = t["z"].to_numpy(zero_copy_only=False)[m]
            code = t["min_seq"].to_numpy(zero_copy_only=False)[m]
            raw = t["min_index"].to_numpy(zero_copy_only=False).astype(np.uint64)[m]
            for z_, c_, v_ in zip(zs, code, raw):
                if int(c_) >= 10:
                    continue  # strategy counters (see _strategy_counters)
                name = codes[int(c_)]
                cur = out.setdefault(int(z_), {})
                if name in ("minattribute", "gamma"):
                    fv = float(np.uint64(v_).view(np.float64))
                    prev = cur.get(name)
                    if prev is None:
                        cur[name] = fv
                    elif name == "minattribute" and attr_desc:
                        cur[name] = min(prev, fv)
                    else:
                        cur[name] = max(prev, fv)
                else:
                    cur[name] = max(cur.get(name, 0), int(v_))
        return out

    def _strategy_counters(tbls: list[pa.Table]) -> dict:
        """SUM per-zoom strategy counters from the code>=10 channel rows
        (the final iteration's tables — the whole-zoom retry re-emits
        them, so earlier passes never double count)."""
        ccodes = {10: "dropped_by_rate", 11: "dropped_by_gamma",
                  12: "dropped_as_needed", 13: "coalesced_as_needed"}
        out: dict = {}
        for t in tbls:
            if len(t) == 0:
                continue
            kindc = t["kind"].to_numpy(zero_copy_only=False)
            m = kindc == 4
            if not m.any():
                continue
            zs = t["z"].to_numpy(zero_copy_only=False)[m]
            code = t["min_seq"].to_numpy(zero_copy_only=False)[m]
            raw = t["min_index"].to_numpy(zero_copy_only=False).astype(np.uint64)[m]
            for z_, c_, v_ in zip(zs, code, raw):
                name = ccodes.get(int(c_))
                if name is None:
                    continue
                cur = out.setdefault(int(z_), {})
                cur[name] = cur.get(name, 0) + int(v_)
        return out

    def _run_exchange() -> list[pa.Table]:
        """The zoom-global threshold consensus: run the exchange; if any
        tile raised an as-needed threshold (kind=4 report rows), re-run
        with the per-zoom maxima broadcast — the reference's whole-zoom
        retry with monotone thresholds (tile.cpp:3392-3572)."""
        attr_desc = bool(
            cfg.strategies is not None
            and getattr(cfg.strategies, "drop_by_attribute_descending", False)
        )

        def _improves(k_, v_, cur):
            if k_ == "minattribute":
                prev = cur.get(k_)
                return prev is None or (v_ < prev if attr_desc else v_ > prev)
            return v_ > cur.get(k_, 0)

        overrides: dict = {}
        for _ in range(5):
            worker = BucketWorker(
                cfg, b, offsets_ref, raw_dir=raw_dir, contiguous_ranks=True,
                strategy_overrides=overrides, minzoom_ref=minzoom_ref,
            )
            tbls = _run_exchange_once(worker)
            reports = _threshold_reports(tbls)
            changed = False
            for z_, rep in reports.items():
                cur = overrides.setdefault(z_, {})
                for k_, v_ in rep.items():
                    if _improves(k_, v_, cur):
                        cur[k_] = v_
                        changed = True
            if not changed:
                return tbls
        import warnings

        warnings.warn(
            "zoom-global threshold consensus still changing after 5 "
            "iterations; tiles may exceed max_tile_features (reference "
            "retries until fit or exits, tile.cpp:3392-3572)"
        )
        return tbls

    if raw_dir:
        # write-through sink: per-bucket parquet written inside tasks;
        # the returned rows are the tiny channels (surv/side/summary) —
        # kept as Arrow tables end to end (no python row conversion)
        tbls = [t for t in _run_exchange() if len(t)]
        counters = _strategy_counters(tbls)
        chan_tbl = (
            pa.concat_tables(
                [_chan_norm(t) for t in tbls]
            )
            if tbls
            else _chan_norm(_empty_tiles())
        )
        _mark("exchange")
        # resume: previously-done buckets contributed no channel rows
        # this run — recover their surv/side channels from disk
        chan_path = os.path.join(out_dir, "channels.parquet")
        if resume and os.path.exists(chan_path):
            import pyarrow.parquet as pq

            prev_tbl = _chan_norm(pq.read_table(chan_path))
            new_buckets = np.unique(chan_tbl["bucket"].to_numpy(zero_copy_only=False))
            pb = prev_tbl["bucket"].to_numpy(zero_copy_only=False)
            prev_tbl = prev_tbl.filter(pa.array(~np.isin(pb, new_buckets)))
            chan_tbl = pa.concat_tables([prev_tbl, chan_tbl])
        if len(chan_tbl):
            import pyarrow.parquet as pq

            pq.write_table(chan_tbl, chan_path)
        kindc = chan_tbl["kind"].to_numpy(zero_copy_only=False)
        surv_rows = chan_tbl.filter(pa.array(kindc == 1)).to_pylist()
        side_rows = chan_tbl.filter(pa.array(kindc == 2)).to_pylist()

        tile_tbl_ds = ray.data.read_parquet(raw_dir).map_batches(
            _norm_tiles_fn(cfg.emit_ids), batch_format="pyarrow"
        )
    else:
        tbls = _run_exchange()
        tbls = _align_tables([t for t in tbls if len(t)])
        full = pa.concat_tables(tbls) if tbls else _empty_tiles()
        kind = full["kind"].to_numpy(zero_copy_only=False) if len(full) else np.empty(0, np.int8)
        surv_rows = full.filter(pa.array(kind == 1)).to_pylist()
        side_rows = full.filter(pa.array(kind == 2)).to_pylist()
        tile_tbl = _norm_tiles(full.filter(pa.array(kind == 0)), cfg.emit_ids)
        tile_tbl_ds = ray.data.from_arrow(tile_tbl)
    _mark("channel bookkeeping")
    low = lowzoom_tiles(surv_rows, cfg, b,
                        counters_out=counters if raw_dir else None,
                        n_total=n_rows)
    if raw_dir and counters:
        import json as _json

        with open(os.path.join(out_dir, "strategies.json"), "w") as f:
            _json.dump({str(k): v for k, v in sorted(counters.items())}, f)
    if low is not None:
        low = _norm_tiles(low, cfg.emit_ids)
        if raw_dir:
            import pyarrow.parquet as pq

            pq.write_table(low, os.path.join(out_dir, "lowzoom.parquet"))
        tile_tbl_ds = tile_tbl_ds.union(ray.data.from_arrow(low))
    if side_rows:
        # rare path: only the tiles named by a side row move to the
        # driver for splicing; the rest stream through untouched.
        keys = np.unique(
            np.array(
                [
                    (int(r["z"]) << 56) | (int(r["x"]) << 28) | int(r["y"])
                    for r in side_rows
                ],
                dtype=np.int64,
            )
        )
        keys_ref = ray.put(keys)

        def _affected_mask(t: pa.Table) -> np.ndarray:
            ks = ray.get(keys_ref)
            z = t["z"].to_numpy(zero_copy_only=False).astype(np.int64)
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            return np.isin((z << 56) | (x << 28) | y, ks)

        def unaffected(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(~_affected_mask(t)))

        def affected(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(_affected_mask(t)))

        if raw_dir:
            # targeted read: affected tiles live in known bucket files
            # (tile's zoom-B Morton ancestor) — no full tileset scan
            from ..functions.spatial import _spread_bits32
            import pyarrow.parquet as pq

            aff_buckets = set()
            for r in side_rows:
                zz, xx, yy = int(r["z"]), int(r["x"]), int(r["y"])
                sh = zz - b
                bx_ = xx >> sh if sh >= 0 else 0
                by_ = yy >> sh if sh >= 0 else 0
                mk = int(
                    (_spread_bits32(np.array([bx_], np.int64))[0] << np.uint64(1))
                    | _spread_bits32(np.array([by_], np.int64))[0]
                )
                aff_buckets.add(mk)
            hit_parts = []
            for bk in sorted(aff_buckets):
                f = os.path.join(raw_dir, f"bucket={bk}", "part-0.parquet")
                if os.path.exists(f):
                    t = _norm_tiles(
                        pq.read_table(f).append_column(
                            "bucket", pa.array(np.full(pq.read_metadata(f).num_rows, bk, np.int64))
                        ),
                        cfg.emit_ids,
                    )
                    hit_parts.append(t.filter(pa.array(_affected_mask(t))))
            hit = pa.concat_tables(hit_parts) if hit_parts else _empty_tiles()
            hit = pa.Table.from_pandas(hit.to_pandas()).replace_schema_metadata(None)
        else:
            hit = pa.Table.from_pandas(
                tile_tbl_ds.map_batches(affected, batch_format="pyarrow").to_pandas()
            ).replace_schema_metadata(None)
        if cfg.attr_accum or cfg.cluster_stats:
            merged = _norm_tiles(
                rescan_side_tiles(hit, side_rows, cfg, narrow, offsets, b),
                cfg.emit_ids,
            )
        else:
            merged = _norm_tiles(merge_side_copies(hit, side_rows, cfg), cfg.emit_ids)
        if raw_dir:
            import pyarrow.parquet as pq

            pq.write_table(merged, os.path.join(out_dir, "patch.parquet"))
            pq.write_table(  # pre-patch counts, for summary adjustment
                hit.select(["z", "x", "y", "n_features"]),
                os.path.join(out_dir, "patch_old.parquet"),
            )
        tile_tbl_ds = tile_tbl_ds.map_batches(unaffected, batch_format="pyarrow").union(
            ray.data.from_arrow(merged)
        )
    return tile_tbl_ds


def read_tileset(out_dir: str, emit_ids: bool = False) -> ray.data.Dataset:
    """Reassemble a persisted tileset: raw per-bucket tiles, minus
    boundary-patched keys, plus low-zoom and patch tables."""
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(os.path.join(out_dir, "raw")).map_batches(
        _norm_tiles_fn(emit_ids), batch_format="pyarrow"
    )
    patch_path = os.path.join(out_dir, "patch.parquet")
    if os.path.exists(patch_path):
        patch = _norm_tiles(pq.read_table(patch_path), emit_ids)
        z = patch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = patch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = patch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.unique((z << 56) | (x << 28) | y)
        keys_ref = ray.put(keys)

        def drop_patched(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            tz = t["z"].to_numpy(zero_copy_only=False).astype(np.int64)
            tx = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            ty = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(~np.isin((tz << 56) | (tx << 28) | ty, ks)))

        ds = ds.map_batches(drop_patched, batch_format="pyarrow").union(
            ray.data.from_arrow(patch)
        )
    low_path = os.path.join(out_dir, "lowzoom.parquet")
    if os.path.exists(low_path):
        ds = ds.union(ray.data.from_arrow(_norm_tiles(pq.read_table(low_path), emit_ids)))
    return ds


def build_pyramid(
    ds: ray.data.Dataset,
    cfg: PyramidConfig | None = None,
    n_rows: int | None = None,
    out_dir: str | None = None,
    resume: bool = False,
) -> ray.data.Dataset:
    """Geotag the image table and run the full pyramid; returns the tile
    dataset (kind==0 rows plus low-zoom and boundary-merged tiles)."""
    cfg = cfg or PyramidConfig()
    narrow = geotag_narrow(ds, cfg)  # materialized inside from_narrow
    return build_pyramid_from_narrow(narrow, cfg, n_rows=n_rows, out_dir=out_dir, resume=resume)


def pyramid_summary(out_dir: str) -> "pd.DataFrame":
    """Per-zoom (n_tiles, n_features) of a persisted tileset, computed
    from the tiny channel/patch tables — no scan of the raw tiles."""
    import pandas as pd
    import pyarrow.parquet as pq

    chan = pq.read_table(os.path.join(out_dir, "channels.parquet")).to_pandas()
    summ = chan[chan["kind"] == 3]
    df = (
        summ.groupby("z")
        .agg(n_tiles=("x", "sum"), n_features=("n_features", "sum"))
        .reset_index()
    )
    adjust = []
    low_path = os.path.join(out_dir, "lowzoom.parquet")
    if os.path.exists(low_path):
        low = pq.read_table(low_path, columns=["z", "n_features"]).to_pandas()
        adjust.append(low.groupby("z").agg(n_tiles=("z", "size"), n_features=("n_features", "sum")).reset_index())
    patch_path = os.path.join(out_dir, "patch.parquet")
    if os.path.exists(patch_path):
        newp = pq.read_table(patch_path, columns=["z", "n_features"]).to_pandas()
        oldp = pq.read_table(os.path.join(out_dir, "patch_old.parquet"), columns=["z", "n_features"]).to_pandas()
        d_new = newp.groupby("z").agg(n_tiles=("z", "size"), n_features=("n_features", "sum")).reset_index()
        d_old = oldp.groupby("z").agg(n_tiles=("z", "size"), n_features=("n_features", "sum")).reset_index()
        d_old[["n_tiles", "n_features"]] *= -1
        adjust += [d_new, d_old]
    if adjust:
        df = (
            pd.concat([df] + adjust, ignore_index=True)
            .groupby("z")
            .agg(n_tiles=("n_tiles", "sum"), n_features=("n_features", "sum"))
            .reset_index()
        )
    return df.sort_values("z").reset_index(drop=True)


def pyramid_counts(tile_ds: ray.data.Dataset) -> pa.Table:
    """Small summary: per-zoom tile and feature counts. Partial per-batch
    aggregate — the driver combines one row per (batch, zoom), never the
    tile rows themselves (the r1 full to_pandas was a scale hazard)."""
    import pandas as pd

    def part(t: pa.Table) -> pa.Table:
        zs = t["z"].to_numpy(zero_copy_only=False)
        nf = t["n_features"].to_numpy(zero_copy_only=False)
        uz, inv = np.unique(zs, return_inverse=True)
        return pa.table(
            {
                "z": uz.astype(np.int32),
                "n_tiles": np.bincount(inv).astype(np.int64),
                "n_features": np.bincount(inv, weights=nf).astype(np.int64),
            }
        )

    parts = tile_ds.select_columns(["z", "n_features"]).map_batches(
        part, batch_format="pyarrow"
    ).to_pandas()
    g = (
        parts.groupby("z")
        .agg(n_tiles=("n_tiles", "sum"), n_features=("n_features", "sum"))
        .reset_index()
    )
    return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)


def center_tile(tile_ds: ray.data.Dataset, maxzoom: int) -> tuple[int, int]:
    """The metadata "center" tile: the busiest maxzoom tile, ties broken
    by smallest (x<<32)|y (tile.cpp:3214-3229; the reference ranks by
    geometry element count, which equals the feature count for
    points). Distributed argmax via per-batch partials."""

    def part(t: pa.Table) -> pa.Table:
        zs = t["z"].to_numpy(zero_copy_only=False)
        m = zs == maxzoom
        if not m.any():
            return pa.table({"x": pa.array([], pa.int32()),
                             "y": pa.array([], pa.int32()),
                             "n_features": pa.array([], pa.int64())})
        sub = t.filter(pa.array(m))
        nf = sub["n_features"].to_numpy(zero_copy_only=False)
        xs = sub["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = sub["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (xs << 32) | ys
        order = np.lexsort((key, -nf))
        i = order[0]
        return pa.table({"x": pa.array([int(xs[i])], pa.int32()),
                         "y": pa.array([int(ys[i])], pa.int32()),
                         "n_features": pa.array([int(nf[i])], pa.int64())})

    parts = tile_ds.select_columns(["z", "x", "y", "n_features"]).map_batches(
        part, batch_format="pyarrow"
    ).to_pandas()
    if len(parts) == 0:
        return 0, 0
    key = (parts["x"].to_numpy().astype(np.int64) << 32) | parts["y"].to_numpy().astype(np.int64)
    parts = parts.assign(key=key).sort_values(["n_features", "key"], ascending=[False, True])
    row = parts.iloc[0]
    return int(row["x"]), int(row["y"])
