"""Line/polygon pyramid — the reference's per-zoom rewrite → clip →
simplify → encode loop (tile.cpp:443-533, 974-1057, 595-665,
traverse_zooms 3272-3623), re-expressed as a zoom cascade:

  ingest: world coords → geometry_scale snap → winding fix (polygons)
   → phase L (z in [0, B)): per-tile Ray tasks; each task clips its
     features, encodes the tile, and fans the clipped geometry out to
     the 4 children its PRE-CLIP bbox touches (rewrite semantics,
     including the buffer+1 top/left widening) — a tile at z+1 has
     exactly one parent, so no merge step exists
   → phase H (z >= B): one Ray task per zoom-B subtree runs the whole
     remaining cascade depth-first with no further shuffles.

Why a cascade instead of direct per-zoom bbox fan-out: the reference
assigns a feature to a child only from the geometry ALREADY CLIPPED to
the parent (+buffer), so child coverage at z is a function of the whole
ancestor chain — a diagonal line reaches O(length/span) tiles, not
O(bbox area). Replicating the cascade is both the exact-match semantics
and the scale win.

Scale notes: phase-L tasks ray.put their child tables so the driver
holds only ObjectRefs; phase-H subtree tasks are the wide, embarrassing
parallelism (4^B ≫ cores) and write tile rows straight back as Arrow.
Per-tile feature order is input order (seq) — the reference's sort key
(index, seq) has index == 0 for lines/polygons unless a drop strategy
is active (serial.cpp:753-762).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions import drawvec as dv
from ..stages.mvt import encode_layer, encode_linestring, encode_polygon, encode_tile

WORLD_BITS = 32


@dataclasses.dataclass
class VectorConfig:
    minzoom: int = 0
    maxzoom: int = 14
    detail: int = 12
    buffer: int = 5  # tile buffer in 256ths (main.cpp:3200)
    simplification: float = 1.0
    tiny_polygon_size: float = 2.0  # main.cpp:88
    layer_name: str = "geoms"
    bucket_zoom: int | None = None
    geometry_scale: int | None = None
    encode_tiles: bool = True
    compress: bool = True
    # 500 KB compressed byte cap + detail-reduction ladder
    # (main.cpp:85, tile.cpp:2717-3036). None = --no-tile-size-limit.
    max_tile_size: int | None = None
    min_detail: int = 7
    max_tile_features: int | None = None  # reference default 200000 (-O)
    # -aP: replace polygons with checkerboard label anchor points
    # (tile.cpp:1919-1937, geometry.cpp:766/947)
    generate_label_points: bool = False
    # --drop-lines / --drop-polygons: ride the rate ladder like points
    # (calc_feature_minzoom main.cpp:299-350 gates on these flags)
    droprate: float = 1.0
    basezoom: int | None = None
    drop_lines: bool = False
    drop_polygons: bool = False
    # -aw: repair >180-degree longitude jumps between consecutive
    # vertices by +-2^32 offsets (scale_geometry, serial.cpp:313-337)
    detect_wraparound: bool = False

    def resolved_basezoom(self) -> int:
        return self.maxzoom if self.basezoom is None else self.basezoom

    def dropping(self) -> bool:
        return (self.drop_lines or self.drop_polygons) and self.droprate > 1

    def resolved_gscale(self) -> int:
        if self.geometry_scale is not None:
            return self.geometry_scale
        return max(0, WORLD_BITS - (self.detail + self.maxzoom))


FEATURE_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("t", pa.int8()),
        ("ops", pa.large_binary()),
        ("xy", pa.large_binary()),
        ("label_x", pa.int64()),
        ("label_y", pa.int64()),
        ("minzoom", pa.int16()),
    ]
)


def features_table(rows: list[tuple]) -> pa.Table:
    """rows: (seq, t, ops uint8 array, xy (n,2) int64 array[, label_x,
    label_y]) — label = ingest anchor for -aP (-1 when absent)."""
    return pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "t": pa.array([r[1] for r in rows], pa.int8()),
            "ops": pa.array([r[2].astype(np.uint8).tobytes() for r in rows], pa.large_binary()),
            "xy": pa.array(
                [np.ascontiguousarray(r[3], dtype=np.int64).tobytes() for r in rows],
                pa.large_binary(),
            ),
            "label_x": pa.array([r[4] if len(r) > 4 else -1 for r in rows], pa.int64()),
            "label_y": pa.array([r[5] if len(r) > 5 else -1 for r in rows], pa.int64()),
            "minzoom": pa.array([r[6] if len(r) > 6 else 0 for r in rows], pa.int16()),
        }
    )


def table_to_rows(tbl: pa.Table) -> list[tuple]:
    """Unpack a feature table into plain tuples ONCE per task — the
    cascade recursion passes tuples (no per-tile Arrow churn)."""
    seqs = tbl["seq"].to_pylist()
    ts = tbl["t"].to_pylist()
    ops_l = tbl["ops"].to_pylist()
    xy_l = tbl["xy"].to_pylist()
    lx = tbl["label_x"].to_pylist() if "label_x" in tbl.column_names else [-1] * len(tbl)
    ly = tbl["label_y"].to_pylist() if "label_y" in tbl.column_names else [-1] * len(tbl)
    mz = tbl["minzoom"].to_pylist() if "minzoom" in tbl.column_names else [0] * len(tbl)
    return [
        (
            seqs[i], ts[i],
            np.frombuffer(ops_l[i], dtype=np.uint8),
            np.frombuffer(xy_l[i], dtype=np.int64).reshape(-1, 2),
            lx[i], ly[i], mz[i],
        )
        for i in range(len(tbl))
    ]


def _unpack(tbl: pa.Table, i: int):
    ops = np.frombuffer(tbl["ops"][i].as_py(), dtype=np.uint8)
    xy = np.frombuffer(tbl["xy"][i].as_py(), dtype=np.int64).reshape(-1, 2)
    return ops, xy


def ingest_features(tbl: pa.Table, cfg: VectorConfig) -> pa.Table:
    """serialize_feature ingest semantics (serial.cpp:455-510): snap to
    the geometry_scale grid (round half away), then fix polygon winding
    ON THE SCALED coordinates (fix_polygon runs after scale_geometry,
    serial.cpp:459-465); features whose geometry vanishes are dropped."""
    g = cfg.resolved_gscale()
    out = []
    for i in range(len(tbl)):
        seq = int(tbl["seq"][i].as_py())
        t = int(tbl["t"][i].as_py())
        ops, xy = _unpack(tbl, i)
        if cfg.detect_wraparound:
            xy = _fix_wraparound(ops, xy)
        scaled = dv.shift_right(xy, g)
        if t == 3:
            ops, scaled = dv.fix_polygon(ops, scaled)
        if len(ops) == 0:
            continue
        lx = ly = -1
        if t == 3 and cfg.generate_label_points:
            # ingest label anchor on the scaled geometry
            # (serial.cpp:734-741), stored at world scale
            anchor = dv.polygon_to_anchor(ops, scaled)
            if anchor is not None:
                lx = (anchor[0] << g) & ((1 << 32) - 1)
                ly = (anchor[1] << g) & ((1 << 32) - 1)
        world = scaled << g if g else scaled
        out.append([seq, t, ops, world, lx, ly, 0])
    if cfg.dropping() and out:
        # the global sort key is (bbox_index, seq) with the vertex-hash
        # index point (serial.cpp:700-722, incl. CLOSEPATH entries in
        # the modulus); ladder counters step only for participating
        # features (calc_feature_minzoom main.cpp:299-305)
        from ..functions.spatial import encode_quadkey
        from ..stages.minzoom import minzoom_from_ranks

        idxs = []
        for r in out:
            ops_r = r[2]
            scaled_r = (r[3] >> g) if g else r[3]
            sx = scaled_r[:, 0].astype(object)
            sy = scaled_r[:, 1].astype(object)
            ix = int((sum(sx) + sum(sy)) % len(ops_r))
            mx = (int(scaled_r[ix, 0]) << g) & ((1 << 32) - 1)
            my = (int(scaled_r[ix, 1]) << g) & ((1 << 32) - 1)
            idxs.append(int(encode_quadkey(np.array([mx]), np.array([my]))[0]))
        order = sorted(range(len(out)), key=lambda i: (idxs[i], out[i][0]))
        out = [out[i] for i in order]
        part = [
            (r[1] == 2 and cfg.drop_lines) or (r[1] == 3 and cfg.drop_polygons)
            for r in out
        ]
        n_part = sum(part)
        mzs = minzoom_from_ranks(
            n_part, cfg.maxzoom, cfg.resolved_basezoom(), cfg.droprate
        )
        k = 0
        for i, r in enumerate(out):
            if part[i]:
                r[6] = int(mzs[k])
                k += 1
    return features_table([tuple(r) for r in out])


def _fix_wraparound(ops: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """-aw (scale_geometry, serial.cpp:313-337): inside each part, an x
    jump of more than 180 degrees (but not exactly 360) accumulates a
    +-2^32 offset; offsets reset at each MOVETO."""
    out = xy.copy()
    offset = 0
    prev = 0
    has_prev = False  # NOT reset at MOVETO: the feature's very first
    # segment is never repaired (serial.cpp:317-337 sets has_prev only
    # in the LINETO branch)
    W = 1 << 32
    H = 1 << 31
    for i in range(len(ops)):
        if ops[i] == 2:  # LINETO
            x = int(out[i, 0]) + offset
            if has_prev:
                if x - prev > H and x - prev != W:
                    offset -= W
                    x -= W
                elif prev - x > H and prev - x != W:
                    offset += W
                    x += W
            out[i, 0] = x
            prev = x
            has_prev = True
        elif ops[i] == 1:  # MOVETO
            offset = 0
            prev = int(out[i, 0])
    return out


def process_tile(cfg: VectorConfig, z: int, tx: int, ty: int, tbl):
    """One write_tile (keep-all path): returns (tile_row | None,
    children: dict[(cx, cy) -> row list]). `tbl` is a feature table or
    a list of row tuples (see table_to_rows)."""
    if isinstance(tbl, pa.Table):
        tbl = table_to_rows(tbl)
    span_shift = WORLD_BITS - z
    span = 1 << span_shift
    buf = cfg.buffer * span // 256
    origin = np.array([tx << span_shift, ty << span_shift], dtype=np.int64) if z else np.zeros(2, np.int64)
    g_scale = cfg.resolved_gscale()
    children: dict[tuple[int, int], list] = {}
    survivors: list = []  # (seq, t, ops, local_xy, reduced)
    accum_area = 0.0
    child_div = 1 << (WORLD_BITS - (z + 1) - 8)
    cspan = 2  # nextzoom - z == 1

    for seq, t, ops, xy, lab_x, lab_y, fmz in tbl:
        lab = (lab_x, lab_y)
        local = xy - origin
        bbox = dv.geom_bbox(local, ops)
        if bbox is None:
            continue
        quick = dv.quick_check(bbox, z, cfg.buffer)
        if z == 0:
            # dateline: duplicate geometry ±360° and clip both copies
            # (clip_to_tile z0 branch, tile.cpp:977-1001)
            edge = (1 << 32) * cfg.buffer // 256
            west = bbox[0] <= edge
            east = bbox[2] >= (1 << 32) - edge
            if west or east:
                parts_ops = [ops]
                parts_xy = [local]
                if west:
                    parts_ops.append(ops)
                    parts_xy.append(local + np.array([1 << 32, 0], dtype=np.int64))
                if east:
                    parts_ops.append(ops)
                    parts_xy.append(local - np.array([1 << 32, 0], dtype=np.int64))
                ops = np.concatenate(parts_ops)
                local = np.concatenate(parts_xy)
                bbox = (0, bbox[1], 1 << 32, bbox[3])
                quick = -1
        if quick == 0:
            continue
        if quick != 1:
            if t == 2:
                cops, cxy = dv.clip_lines(ops, local, -buf, -buf, span + buf, span + buf)
            elif t == 3:
                cops, cxy = dv.simple_clip_poly(ops, local, -buf, -buf, span + buf, span + buf)
            else:
                keep = (
                    (local[:, 0] >= -buf) & (local[:, 1] >= -buf)
                    & (local[:, 0] <= span + buf) & (local[:, 1] <= span + buf)
                )
                cops, cxy = ops[keep], local[keep]
            cops, cxy = dv.remove_noop(cops, cxy, t, 0)
        else:
            cops, cxy = ops, local

        # rewrite to children (tile.cpp:443-533): coverage from the
        # PRE-CLIP bbox, geometry from the POST-CLIP result, snapped
        if len(cops) > 0 and z + 1 <= cfg.maxzoom:
            b2 = [dv._tdiv(bbox[k], child_div) for k in range(4)]
            b2[0] -= cfg.buffer + 1
            b2[1] -= cfg.buffer + 1
            b2[2] += cfg.buffer
            b2[3] += cfg.buffer
            for k in range(4):
                if b2[k] < 0:
                    b2[k] = 0
                if b2[k] >= 256 * cspan:
                    b2[k] = 256 * (cspan - 1)
                b2[k] //= 256
            world = cxy + origin
            snapped = dv.snap_world(world, g_scale)
            blob = None
            for xo in range(b2[0], b2[2] + 1):
                for yo in range(b2[1], b2[3] + 1):
                    if blob is None:
                        blob = (seq, t, cops, snapped, lab[0], lab[1], fmz)
                    # (tuple shared across children)
                    children.setdefault((tx * 2 + xo, ty * 2 + yo), []).append(blob)

        if z < cfg.minzoom:
            continue
        survivors.append((seq, t, cops, cxy, lab, fmz))

    tile_row = _encode_with_detail_ladder(cfg, z, tx, ty, survivors)
    return tile_row, children


def _encode_with_detail_ladder(cfg: VectorConfig, z, tx, ty, survivors):
    """The write_tile detail loop (tile.cpp:1719-3079, no-strategy path):
    run reduce/simplify/scale/encode at line_detail = detail, and on
    byte overflow retry at line_detail-1 … min_detail (detail_reduced
    ladder). Feature overflow has no detail recourse in the reference
    (it exits suggesting a drop strategy) — we emit the over-limit tile
    with a warning instead of dying."""
    import warnings

    if z < cfg.minzoom or not survivors:
        return None
    details = [cfg.detail]
    if cfg.max_tile_size is not None:
        details += list(range(cfg.detail - 1, cfg.min_detail - 1, -1))
    feats: list = []
    from ..stages.tile_encode import encode_multipoint

    for line_detail in details:
        feats = []
        accum_area = 0.0
        appended_any = False
        for seq, t, ops, xy, lab, fmz in survivors:
            if fmz > z and appended_any:
                # rate-dropped (keep rule tile.cpp:1970-1977: the drop
                # needs a previous feature to accumulate onto)
                continue
            if t == 3 and cfg.generate_label_points:
                # polygon -> checkerboard anchor points
                # (tile.cpp:1919-1937); excluded when invisibly small
                if dv.line_is_too_small(ops, xy, z, line_detail):
                    continue
                if dv.get_mp_area(ops, xy) <= 0:
                    continue
                nops, nxy = dv.simplify_lines(
                    ops, xy, z, line_detail, True, cfg.simplification, 4
                )
                if len(nops) == 0:
                    continue
                anchors = dv.checkerboard_anchors(
                    nops, nxy, tx, ty, z, lab[0], lab[1]
                )
                if not anchors:
                    continue
                pts = np.array(anchors, dtype=np.int64).reshape(-1, 2)
                pts = dv.to_tile_scale(pts, z, line_detail)
                # remove_noop for points: dedupe identical consecutive
                keep = np.ones(len(pts), bool)
                keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
                pts = pts[keep]
                feats.append({"geom": encode_multipoint(pts), "type": 1, "id": seq})
                appended_any = True
                continue
            reduced = False
            if t == 3:
                ops, xy, still, _red, accum_area = dv.reduce_tiny_poly(
                    ops, xy, z, line_detail, accum_area, cfg.tiny_polygon_size
                )
                if len(ops) == 0:
                    continue
                reduced = not still
            if t in (2, 3) and dv.line_is_too_small(ops, xy, z, line_detail):
                continue
            # simplify_feature (tile.cpp:595-665) + simplification_worker
            area = dv.get_mp_area(ops, xy) if t == 3 else 0.0
            if not reduced:
                if t == 2:
                    ops, xy = dv.remove_noop(ops, xy, t, WORLD_BITS - z - line_detail)
                nops, nxy = dv.simplify_lines(
                    ops, xy, z, line_detail, True, cfg.simplification, 4 if t == 3 else 0
                )
                if t != 3 or len(nops) >= 3:
                    ops, xy = nops, nxy
            xy = dv.to_tile_scale(xy, z, line_detail)
            if t == 3:
                b_ops, b_xy = ops, xy
                ops, xy = dv.clean_poly_tile_scale(ops, xy)
                if len(ops) < 3:
                    if area > 0:
                        ops, xy = dv.revive_polygon(b_ops, b_xy, area, z, line_detail)
                    else:
                        ops, xy = dv.empty_geom()
            ops, xy = dv.remove_noop(ops, xy, t, 0)
            if len(ops) == 0:
                continue
            parts = [xy[i:j] for i, j in dv.rings(ops)]
            if not parts:
                continue
            if t == 3:
                feats.append({"geom": encode_polygon(parts), "type": 3, "id": seq})
            else:
                feats.append({"geom": encode_linestring(parts), "type": 2, "id": seq})
            appended_any = True
        if not feats:
            return None
        tile_bytes = b""
        if cfg.encode_tiles:
            layer = encode_layer(cfg.layer_name, feats, 1 << line_detail)
            tile_bytes = encode_tile([layer], compress=cfg.compress)
        if cfg.max_tile_features is not None and len(feats) > cfg.max_tile_features:
            warnings.warn(
                f"tile {z}/{tx}/{ty} has {len(feats)} features, >"
                f"{cfg.max_tile_features}; use a drop strategy (reference "
                "exits here, tile.cpp:2723-2730)"
            )
        if cfg.max_tile_size is None or len(tile_bytes) <= cfg.max_tile_size:
            return {"z": z, "x": tx, "y": ty, "n_features": len(feats), "tile": tile_bytes}
    warnings.warn(
        f"could not make tile {z}/{tx}/{ty} smaller than "
        f"{cfg.max_tile_size} B even at detail {cfg.min_detail} "
        "(reference fails the tile here, tile.cpp:3075-3078)"
    )
    return {"z": z, "x": tx, "y": ty, "n_features": len(feats), "tile": tile_bytes}


def _rows_table(rows: list) -> pa.Table:
    return features_table(rows)


def _tile_rows_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "z": pa.array([r["z"] for r in rows], pa.int32()),
            "x": pa.array([r["x"] for r in rows], pa.int32()),
            "y": pa.array([r["y"] for r in rows], pa.int32()),
            "n_features": pa.array([r["n_features"] for r in rows], pa.int64()),
            "tile": pa.array([r["tile"] for r in rows], pa.large_binary()),
        }
    )


@ray.remote
def _tile_task(cfg: VectorConfig, z: int, tx: int, ty: int, tbl: pa.Table):
    tile_row, children = process_tile(cfg, z, tx, ty, tbl)
    child_refs = [
        (key, ray.put(_rows_table(rows))) for key, rows in children.items()
    ]
    return tile_row, child_refs


@ray.remote
def _subtree_task(cfg: VectorConfig, z0: int, tx0: int, ty0: int, tbl: pa.Table) -> pa.Table:
    """Depth-first cascade over one zoom-B subtree; no shuffles, no
    per-tile Arrow round trips (tuples all the way down)."""
    out_rows: list[dict] = []
    stack = [(z0, tx0, ty0, table_to_rows(tbl) if isinstance(tbl, pa.Table) else tbl)]
    while stack:
        z, tx, ty, t = stack.pop()
        tile_row, children = process_tile(cfg, z, tx, ty, t)
        if tile_row is not None:
            out_rows.append(tile_row)
        if z + 1 <= cfg.maxzoom:
            for (cx, cy), rows in children.items():
                stack.append((z + 1, cx, cy, rows))
    return _tile_rows_table(out_rows)


def auto_vector_bucket_zoom(n_rows: int, maxzoom: int) -> int:
    b = 0
    while (4 ** (b + 1)) * 1024 <= n_rows and b + 1 <= maxzoom:
        b += 1
    return max(1, min(b + 2, maxzoom, 6))


def build_vector_pyramid(
    feat_tbl: pa.Table, cfg: VectorConfig | None = None
) -> ray.data.Dataset:
    """Full pyramid over an ingested feature table (see ingest_features).
    Returns a Dataset of (z, x, y, n_features, tile)."""
    cfg = cfg or VectorConfig()
    b = cfg.bucket_zoom
    if b is None:
        b = auto_vector_bucket_zoom(len(feat_tbl), cfg.maxzoom)
    b = max(0, min(b, cfg.maxzoom))

    tile_tables: list[pa.Table] = []
    current: dict[tuple[int, int], object] = {(0, 0): feat_tbl}
    for z in range(0, b):
        futs = {
            key: _tile_task.remote(cfg, z, key[0], key[1], t)
            for key, t in current.items()
        }
        nxt: dict[tuple[int, int], object] = {}
        rows = []
        for key, f in futs.items():
            tile_row, child_refs = ray.get(f)
            if tile_row is not None:
                rows.append(tile_row)
            for ckey, ref in child_refs:
                # one parent per child tile — no merge needed
                nxt[ckey] = ref
        if rows:
            tile_tables.append(_tile_rows_table(rows))
        current = nxt
        if not current:
            break

    if current and b <= cfg.maxzoom:
        futs = [
            _subtree_task.remote(cfg, b, key[0], key[1], t)
            for key, t in current.items()
        ]
        tile_tables.extend(t for t in ray.get(futs) if t.num_rows)

    if not tile_tables:
        return ray.data.from_arrow(_tile_rows_table([]))
    return ray.data.from_arrow(pa.concat_tables(tile_tables))
