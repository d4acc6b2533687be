"""Line/polygon pyramid — the reference's per-zoom rewrite → clip →
simplify → encode loop (tile.cpp:443-533, 974-1057, 595-665,
traverse_zooms 3272-3623), re-expressed Ray-Data-first:

  ingest (map_batches): world coords → geometry_scale snap → winding
     fix (polygons) → vertex-hash index; --drop-lines/--drop-polygons
     minzoom via the same bucket-offset rank ladder the point pipeline
     uses (one tiny aggregate + one grouped pass)
   → phase A (map_batches, flat): each feature runs its OWN ancestor
     cascade z0 → B — clip to tile, fan to the children the PRE-CLIP
     bbox touches (rewrite semantics incl. the buffer+1 top/left
     widening), recurse — emitting (group key, clipped feature) rows
     for every low-zoom tile it survives in (z < B, tile-local coords)
     and for every zoom-B subtree it reaches (snapped world coords).
     Per-feature clipping has NO cross-feature state, so this is an
     embarrassingly parallel flat map producing exactly the rows the
     old per-tile task tree produced.
   → ONE shuffle: groupby(group key).map_groups:
       · z <  B group → order features, encode one tile (detail ladder)
       · z == B group → depth-first cascade over the whole subtree
         (process_tile per node; no further shuffles)
     groups write straight to a per-group parquet partition when a sink
     dir is given (resumable: finished groups are skipped pre-shuffle)
     and return tiny summary rows; without a sink they return tile rows
     through the streaming dataset — the driver never concatenates the
     tileset either way.

Why a cascade instead of direct per-zoom bbox fan-out: the reference
assigns a feature to a child only from the geometry ALREADY CLIPPED to
the parent (+buffer), so child coverage at z is a function of the whole
ancestor chain — a diagonal line reaches O(length/span) tiles, not
O(bbox area). Replicating the cascade is both the exact-match semantics
and the scale win.

Per-tile feature order is input order (seq) — the reference's sort key
(index, seq) has index == 0 for lines/polygons unless a drop strategy
is active (serial.cpp:753-762); with dropping active, groups order by
(vindex, seq), reproducing the ingest-sorted scan at any parallelism.
"""

from __future__ import annotations

import dataclasses
import math
import struct
import sys as _sys
import time as _time
from os import environ as _os_env

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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
    # -D: detail for tiles BELOW maxzoom (write_tile gets
    # `z == maxzoom ? full_detail : low_detail`, tile.cpp:3206);
    # None = same as detail. Clamped by the CLI to 33 - maxzoom.
    low_detail: int | None = None
    buffer: int = 5  # tile buffer in 256ths (main.cpp:3200)
    simplification: float = 1.0
    # --simplification-at-maximum-zoom (main.cpp:3319-3323)
    simplification_at_maxzoom: float = -1.0
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
    # rate ladder (calc_feature_minzoom main.cpp:299-350): points ride
    # it unconditionally; lines/polygons only with --drop-lines /
    # --drop-polygons. Default droprate 2.5 (main.cpp:3198).
    droprate: float = 2.5
    basezoom: int | None = None
    drop_lines: bool = False
    drop_polygons: bool = False
    # -aw: repair >180-degree longitude jumps between consecutive
    # vertices by +-2^32 offsets (scale_geometry, serial.cpp:313-337)
    detect_wraparound: bool = False
    # -pn / --no-simplification-of-shared-nodes: preserve vertices
    # shared between features (or repeated within one) through
    # simplification (serial.cpp:507-599, main.cpp:2015-2169,
    # geometry.cpp:234-268); forces geometry_scale=0 (main.cpp:3764)
    prevent_shared_nodes: bool = False
    # -at / --generate-variable-depth-tile-pyramid (tile.cpp:1701-1713,
    # 3059-3066, 3179-3199): where a tile's estimated input complexity
    # suggests a full-precision (detail 30-z) tile would fit under
    # 0.9 x max_tile_size, encode it at that detail and, if it fits,
    # LEAF the pyramid there (children pruned); viewers overzoom the
    # leaf. Only meaningful without drop strategies (the reference
    # disables the gate when dropping_features()).
    variable_depth: bool = False
    # -ag: attach tippecanoe_feature_density (0-255 sint) per feature
    # (tile.cpp:2146-2157 spacing scan, 2656-2676 tag); needs the
    # attrs side table to carry the per-seq spatial index (__vindex__)
    calculate_density: bool = False
    # --hilbert: spatial indexes use hilbert order instead of quadkey
    # (main.cpp:3680-3687)
    index_scheme: str = "quadkey"
    # -j/-J feature filter: {layer: expr} hash evaluated per feature
    # per tile with $zoom = the tile's z (tile.cpp:1231-1288,
    # evaluator.cpp:345-412)
    filter: dict | None = None
    # --grid-low-zooms (-aL's sibling): below maxzoom, rasterize
    # geometry onto the zoom's pixel grid with Bresenham stairsteps
    # instead of simplifying; tiny-polygon reduction is off entirely
    # (simplify_feature tile.cpp:602-611, scan tile.cpp:2163-2166)
    grid_low_zooms: bool = False
    # --extra-detail: re-encode maxzoom tiles at this detail (clamped
    # to 30-z) while simplifying to the normal detail (tile.cpp:2265+)
    extra_detail: int = -1
    # -ao / --reorder: stable-sort each tile's features by attributes
    # (coalindexcmp, tile.cpp:113-200); -ac / --coalesce: merge
    # adjacent identical-attribute features into one multigeometry
    # (tile.cpp:2520-2580)
    reorder: bool = False
    coalesce: bool = False
    # -pc / --no-clipping: keep the whole geometry in every tile whose
    # clip would be non-empty; -pD / --no-duplication: keep it only in
    # the tile holding the bbox midpoint (clip_to_tile,
    # tile.cpp:1039-1053; both still clip at z0 for the dateline)
    prevent_clipping: bool = False
    prevent_duplication: bool = False
    # --clip-bounding-box lon1,lat1,lon2,lat2 (may repeat): clip every
    # feature at ingest (serial.cpp:466-500; projected main.cpp:3693)
    clip_bboxes: tuple = ()
    # --accumulate-attribute key:op pairs (set_attribute_accum,
    # attribute.cpp:16-56): when a feature is rate-dropped, these
    # attributes fold onto the accumulate target (preserve_attributes
    # tile.cpp:1544-1569, ops attribute.cpp:92-181)
    attribute_accum: tuple = ()
    # -C 'command': per-tile shell prefilter (plugin.cpp:376-470,
    # run_prefilter tile.cpp:1381-1443): the tile's (parent-clipped,
    # this-tile-clipped) features are piped to `sh -c command sh z x y`
    # as newline-delimited GeoJSON in full-precision world coordinates
    # with the tippecanoe envelope; stdout GeoJSON replaces the tile's
    # features before the encode scan. Runs inside the encode task.
    prefilter: str | None = None
    # -c 'command': per-tile shell postfilter over the ASSEMBLED tile
    # (filter_layers plugin.cpp:378-418)
    postfilter: str | None = None
    # ---- as-needed drop strategies (the write_tile gate chain
    # tile.cpp:1993-2144 + the threshold retry ladder 2723-3036 + the
    # per-zoom whole-zoom consensus passes tile.cpp:3392-3572). Each
    # zoom starts with fresh thresholds (zoom_mingap=0 etc.,
    # tile.cpp:3382-3390); a tile that overflows its byte/feature cap
    # raises its LOCAL threshold and keeps retrying at the same detail;
    # the zoom re-runs with the merged maxima until no tile raises.
    drop_densest: bool = False        # --drop-densest-as-needed
    coalesce_densest: bool = False    # --coalesce-densest-as-needed
    cluster_densest: bool = False     # --cluster-densest-as-needed
    drop_smallest: bool = False       # --drop-smallest-as-needed
    coalesce_smallest: bool = False   # --coalesce-smallest-as-needed
    drop_fraction: bool = False       # --drop-fraction-as-needed
    coalesce_fraction: bool = False   # --coalesce-fraction-as-needed
    dynamic_drop: bool = False        # -pd (per-tile thresholds only)
    drop_by_attribute: str | None = None  # --drop-by-attribute-as-needed
    drop_by_attribute_descending: bool = False
    increase_gamma: bool = False      # --increase-gamma-as-needed
    # -g gamma dot-thinning and -K clustering run in the same scan
    # (tile.cpp:1981-2019); cluster_maxzoom default MAX_ZOOM
    # (main.cpp:89)
    gamma: float = 0.0
    cluster_distance: int = 0
    cluster_maxzoom: int = 24
    keep_point_cluster_position: bool = False  # -aa
    # hard per-layer truncation after ordering (tile.cpp:2595-2611)
    limit_tile_feature_count: int = 0
    limit_tile_feature_count_at_maxzoom: int = 0
    # --retain-points-multiplier N: rate-dropped features ride along as
    # secondary multiplier-cluster members (next_feature
    # tile.cpp:1290-1319, append tagging 2237-2250)
    retain_points_multiplier: int = 1
    # --preserve-multiplier-density-threshold D (tile.cpp:1307-1309)
    preserve_multiplier_density: int = 0
    # per-tile orderings (tile.cpp:2583-2593): -pi restores input seq,
    # --order-by sorts by attribute values; both operate on whole
    # multiplier clusters. ((name, descending), ...); the pseudo-name
    # ":size" is ORDER_BY_SIZE (extent)
    order_by: tuple = ()
    preserve_input_order: bool = False
    # -ar: reverse simple linestrings whose endpoint index precedes
    # their start index, for better coalescing (tile.cpp:657-660,
    # reorder_lines geometry.cpp:315-360)
    reverse_lines: bool = False
    # -pw / -pW source polygon winding (fix_polygon args at ingest)
    use_source_winding: bool = False
    reverse_source_winding: bool = False
    # --drop-denser N: N% of features drop by gap rank (main.cpp:2692)
    drop_denser: int = 0
    # --preserve-point-density-threshold (main.cpp:331-345)
    preserve_point_density: int = 0
    # --visvalingam (-av): simplify by effective triangle area
    # (visvalingam.cpp:147-230) instead of Douglas-Peucker, with the
    # empirical threshold mapping of geometry.cpp:287-296
    visvalingam: bool = False
    # -ab (--detect-shared-borders, shared_borders.cpp:86): per-tile
    # TopoJSON-style arc pass between the read loop and the
    # simplification workers (tile.cpp:2463-2465); polygons then skip
    # individual simplification (tile.cpp:626-629)
    detect_shared_borders: bool = False
    # -R z/x/y (--one-tile, main.cpp:3402-3414 + 2207-2211): minzoom
    # and maxzoom are both z and the traversal root is tile (z, x, y)
    # fed the FULL unclipped ingest stream (the reference skips
    # choose_first_zoom and clips once, directly to this tile).
    # Stored as (x, y); the z lives in minzoom/maxzoom.
    one_tile: tuple | None = None
    # -ps / -pS / -pt / -pT / -pf / -pk prevents (options.hpp:34-52)
    no_simplify: bool = False
    simplify_only_low: bool = False
    no_tiny_poly: bool = False
    no_tiny_poly_maxzoom: bool = False
    no_feature_limit: bool = False
    no_size_limit: bool = False
    # -ae / --extend-zooms-if-still-dropping-maximum N: add zooms while
    # the deepest zoom is still raising thresholds (main.cpp:90-91,
    # traverse_zooms tile.cpp:3541-3556)
    extend_zooms: bool = False
    extend_zooms_max: int = 0

    def densest_active(self) -> bool:
        return self.drop_densest or self.coalesce_densest or self.cluster_densest

    def smallest_active(self) -> bool:
        return self.drop_smallest or self.coalesce_smallest

    def fraction_active(self) -> bool:
        return self.drop_fraction or self.coalesce_fraction or self.dynamic_drop

    def order_by_size(self) -> bool:
        return any(n == ":size" for n, _ in self.order_by)

    def resolved_simplification(self, z: int) -> float:
        """-S, overridden at maxzoom by --simplification-at-maximum-
        zoom (traverse_zooms tile.cpp:3439-3441)."""
        if z == self.maxzoom and self.simplification_at_maxzoom > 0:
            return self.simplification_at_maxzoom
        return self.simplification

    def strategies_active(self) -> bool:
        """Any gate that needs the zoom-consensus orchestration (the
        multiplier and ORDER_BY_SIZE need the __vindex__/__extent__
        stream machinery it carries)."""
        return bool(
            self.densest_active() or self.smallest_active()
            or self.fraction_active() or self.drop_by_attribute
            or self.increase_gamma or self.gamma > 0 or self.cluster_distance
            or self.retain_points_multiplier > 1 or self.order_by_size()
        )

    def resolved_max_tile_size(self) -> int | None:
        if self.max_tile_size is None and (
            self.variable_depth or self.strategies_active()
        ):
            return 500000  # reference default (main.cpp:85)
        return self.max_tile_size

    def resolved_basezoom(self) -> int:
        return self.maxzoom if self.basezoom is None else self.basezoom

    def dropping(self) -> bool:
        return (self.drop_lines or self.drop_polygons) and self.droprate > 1

    def resolved_gscale(self) -> int:
        # gscale 0 under -pn / --extra-detail / -ae (the extended zooms
        # need full precision), main.cpp:3764-3770
        if (self.prevent_shared_nodes or self.extra_detail >= 0
                or self.extend_zooms or self.extend_zooms_max > 0):
            return 0
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
        # explicit per-feature tippecanoe minzoom/maxzoom (-1 = unset)
        ("fmin", pa.int16()),
        ("fmax", pa.int16()),
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
            "fmin": pa.array([r[7] if len(r) > 7 else -1 for r in rows], pa.int16()),
            "fmax": pa.array([r[8] if len(r) > 8 else -1 for r in rows], pa.int16()),
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
    fmn = tbl["fmin"].to_pylist() if "fmin" in tbl.column_names else [-1] * len(tbl)
    fmx = tbl["fmax"].to_pylist() if "fmax" in tbl.column_names else [-1] * len(tbl)
    return [
        (
            seqs[i], ts[i],
            np.frombuffer(ops_l[i], dtype=np.uint8),
            np.frombuffer(xy_l[i], dtype=np.int64).reshape(-1, 2),
            lx[i], ly[i], mz[i], fmn[i], fmx[i],
        )
        for i in range(len(tbl))
    ]


def _unpack(tbl: pa.Table, i: int):
    ops = np.frombuffer(tbl["ops"][i].as_py(), dtype=np.uint8)
    xy = np.frombuffer(tbl["xy"][i].as_py(), dtype=np.int64).reshape(-1, 2)
    return ops, xy


def _point_bbox_index(ops: np.ndarray, world: np.ndarray, enc=None) -> int:
    """Point index rule (serial.cpp:689-692): quadkey of the bbox
    center computed as min/2 + max/2 (C truncating halves — loses the
    low bit), masked into the addressable plane. `world` must be the
    bbox-source coordinates: FULL-precision pre-snap world coords
    (scale_geometry fills sf.bbox before the gscale shift,
    serial.cpp:339-349) unless --clip-bounding-box ran, which refills
    the bbox from the snapped clipped geometry (serial.cpp:478-500)."""
    from ..functions.spatial import encode_quadkey

    def _half(v: int) -> int:  # C99 trunc division by 2
        return -((-v) // 2) if v < 0 else v // 2

    m = ops != 7
    xs = world[m, 0]
    ys = world[m, 1]
    midx = (_half(int(xs.min())) + _half(int(xs.max()))) & ((1 << 32) - 1)
    midy = (_half(int(ys.min())) + _half(int(ys.max()))) & ((1 << 32) - 1)
    enc = enc or encode_quadkey
    return int(enc(np.array([midx]), np.array([midy]))[0])


def _vertex_hash_index(ops: np.ndarray, scaled: np.ndarray, g: int,
                       enc=None) -> int:
    """Vertex-hash index point (serial.cpp:700-722): size_t sum of all
    scaled coordinates (uint64 wraparound — numpy-wrap-identical to the
    C++ for any real geometry size) mod the draw count (CLOSEPATH rows
    included), quadkey of the SHIFT_LEFT-masked vertex."""
    from ..functions.spatial import encode_quadkey

    total = int(scaled.astype(np.int64).view(np.uint64).sum(dtype=np.uint64))
    ix = total % len(ops)
    mx = (int(scaled[ix, 0]) << g) & ((1 << 32) - 1)
    my = (int(scaled[ix, 1]) << g) & ((1 << 32) - 1)
    enc = enc or encode_quadkey
    return int(enc(np.array([mx]), np.array([my]))[0])


def _llround(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _trunc(v: float) -> int:
    return int(v)  # C double→long long truncates toward zero


def _center_of_mass_mp(ops: np.ndarray, xy: np.ndarray) -> tuple[int, int]:
    """center_of_mass_mp (geometry.cpp:601-634): per-ring turf center
    of mass, weighted by the signed ring area. `ringcount` is a size_t
    in the reference, so each `ringcount += area` TRUNCATES the double
    area (a faithful quirk); the final division truncates toward zero
    through the draw() long long conversion."""
    ringx = ringy = 0.0
    ringcount = 0
    i, n = 0, len(ops)
    while i < n:
        if ops[i] == 1:  # MOVETO
            xsum = float(xy[i, 0])
            ysum = float(xy[i, 1])
            count = 1
            j = i + 1
            while j < n and ops[j] == 2:
                xsum += float(xy[j, 0])
                ysum += float(xy[j, 1])
                count += 1
                j += 1
            area = dv.get_area(xy, i, j)
            cx = _llround(xsum / count)
            cy = _llround(ysum / count)
            mx, my = dv.center_of_mass(xy, i, j, cx, cy)
            ringx += mx * area
            ringy += my * area
            ringcount = _trunc(float(ringcount) + area)  # size_t += double
            i = j - 1
        i += 1
    if ringcount == 0:
        # the reference divides by zero here (UB); keep deterministic
        return 0, 0
    return _trunc(ringx / ringcount), _trunc(ringy / ringcount)


def _ingest_rows(tbl: pa.Table, cfg: VectorConfig) -> tuple[list, list[int]]:
    """Per-batch ingest kernel (serialize_feature, serial.cpp:455-510):
    snap to the geometry_scale grid (round half away), then fix polygon
    winding ON THE SCALED coordinates (fix_polygon runs after
    scale_geometry, serial.cpp:459-465); features whose geometry
    vanishes are dropped. Returns (rows, vertex-hash indexes)."""
    g = cfg.resolved_gscale()
    idx_enc = None
    if cfg.index_scheme == "hilbert":
        from ..functions.spatial import encode_hilbert
        idx_enc = encode_hilbert
    out = []
    idxs: list[int] = []
    # the reference ALWAYS reorders geometry by the spatial index
    # (radix sort, main.cpp:1089+) and write_tile's per-tile state
    # (accum_area for tiny polygons, -pn node accumulation, keep slots)
    # runs in that stream order — so the index is always needed
    want_idx = True
    for i in range(len(tbl)):
        seq = int(tbl["seq"][i].as_py())
        t = int(tbl["t"][i].as_py())
        ops, xy = _unpack(tbl, i)
        if cfg.detect_wraparound:
            xy = _fix_wraparound(ops, xy)
        raw_xy = xy  # full-precision bbox source for the point index
        scaled = dv.shift_right(xy, g)
        if t == 3:
            ops, scaled = dv.fix_polygon(
                ops, scaled, use_winding=cfg.use_source_winding,
                reverse_winding=cfg.reverse_source_winding)
        for cb in cfg.clip_bboxes:
            # projected world bounds -> gscale grid (serial.cpp:466-475)
            from ..functions.spatial import lonlat_to_world

            wx1, wy1 = lonlat_to_world(np.array([cb[0]]), np.array([cb[1]]))
            wx2, wy2 = lonlat_to_world(np.array([cb[2]]), np.array([cb[3]]))

            def _sr(v):  # SHIFT_RIGHT rounds half away (tile.cpp:62)
                if not g:
                    return int(v)
                q = float(v) / (1 << g)
                import math as _m

                return int(_m.floor(q + 0.5)) if q >= 0 else int(_m.ceil(q - 0.5))

            cminx, cmaxy = _sr(wx1[0]), _sr(wy1[0])
            cmaxx, cminy = _sr(wx2[0]), _sr(wy2[0])
            if t == 3:
                ops, scaled = dv.simple_clip_poly(ops, scaled, cminx, cminy,
                                                  cmaxx, cmaxy)
            elif t == 2:
                ops, scaled = dv.clip_lines(ops, scaled, cminx, cminy,
                                            cmaxx, cmaxy)
            else:
                m = ((scaled[:, 0] >= cminx) & (scaled[:, 0] <= cmaxx)
                     & (scaled[:, 1] >= cminy) & (scaled[:, 1] <= cmaxy))
                ops, scaled = ops[m], scaled[m]
            ops, scaled = dv.remove_noop(ops, scaled, t, 0)
        if cfg.prevent_shared_nodes and t in (2, 3) and len(ops):
            # -pn dedupes exact coordinates up front (serial.cpp:507-508)
            ops, scaled = dv.remove_noop(ops, scaled, t, 0)
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
        fmn = int(tbl["fmin"][i].as_py()) if "fmin" in tbl.column_names else -1
        fmx = int(tbl["fmax"][i].as_py()) if "fmax" in tbl.column_names else -1
        out.append([seq, t, ops, world, lx, ly, 0, fmn, fmx])
        if want_idx:
            if t == 1:
                # full-precision bbox unless a clip refilled it from
                # the snapped geometry (serial.cpp:478-500); a clipped
                # multipoint may have fewer rows than raw_xy, so the
                # snapped source is also the row-aligned one
                src = world if cfg.clip_bboxes else raw_xy
                idxs.append(_point_bbox_index(ops, src, enc=idx_enc))
            elif t == 3 and (cfg.drop_densest or cfg.coalesce_densest):
                # under the densest drop modes the polygon index point
                # is the center of mass, not the hashed vertex
                # (serial.cpp:693-699)
                from ..functions.spatial import encode_quadkey

                cmx, cmy = _center_of_mass_mp(ops, scaled)
                mx = (cmx << g) & ((1 << 32) - 1)
                my = (cmy << g) & ((1 << 32) - 1)
                enc2 = idx_enc or encode_quadkey
                idxs.append(int(enc2(np.array([mx]), np.array([my]))[0]))
            else:
                idxs.append(_vertex_hash_index(ops, scaled, g, enc=idx_enc))
    return out, idxs


def _with_vindex(tbl: pa.Table, idxs: list[int]) -> pa.Table:
    return tbl.append_column("vindex", pa.array(np.array(idxs, np.uint64), pa.uint64()))


def ingest_features(tbl: pa.Table, cfg: VectorConfig) -> pa.Table:
    """Driver-side ingest of one feature table (tests / small inputs;
    the parallel path is ingest_features_ds). With dropping active the
    output is sorted by (vindex, seq) and carries the vindex column."""
    out, idxs = _ingest_rows(tbl, cfg)
    has_points = any(r[1] == 1 for r in out)
    if (cfg.dropping() or (has_points and cfg.droprate > 1)) and out:
        # the global sort key is (bbox_index, seq); ladder counters step
        # only for participating features (calc_feature_minzoom,
        # main.cpp:299-305: points always, lines/polygons by flag)
        from ..stages.minzoom import minzoom_from_ranks

        order = sorted(range(len(out)), key=lambda i: (idxs[i], out[i][0]))
        out = [out[i] for i in order]
        idxs = [idxs[i] for i in order]
        part = [
            r[1] == 1
            or (r[1] == 2 and cfg.drop_lines) or (r[1] == 3 and cfg.drop_polygons)
            for r in out
        ]
        bz = cfg.resolved_basezoom()
        if cfg.drop_denser > 0:
            # --drop-denser N (main.cpp:2692-2726): features whose index
            # hashes into the densest N% get gap-ranked minzooms; the
            # rest ride the normal ladder (and the dense subset consumes
            # no ladder slots)
            dd: list[tuple[int, int]] = []
            ladder: list[int] = []
            prev = 0
            for i in range(len(out)):
                if not part[i]:
                    continue
                if idxs[i] % 100 < cfg.drop_denser:
                    dd.append((idxs[i] - prev, i))
                    prev = idxs[i]
                else:
                    ladder.append(i)
            mzs = minzoom_from_ranks(len(ladder), cfg.maxzoom, bz,
                                     cfg.droprate)
            for k2, i in enumerate(ladder):
                out[i][6] = int(mzs[k2])
            dd.sort(key=lambda t: -t[0])  # stable; largest gap first
            pos = 0
            for z in range(0, bz + 1):
                keep = int(len(dd)
                           * (1.0 / math.exp(math.log(cfg.droprate)
                                             * (bz - z))))
                while pos < keep and pos < len(dd):
                    out[dd[pos][1]][6] = z
                    pos += 1
            while pos < len(dd):
                out[dd[pos][1]][6] = bz
                pos += 1
        elif cfg.preserve_point_density > 0:
            from ..stages.minzoom import minzoom_scan_with_density

            pix = [idxs[i] for i in range(len(out)) if part[i]]
            mzs = minzoom_scan_with_density(
                pix, cfg.maxzoom, bz, cfg.droprate,
                cfg.preserve_point_density)
            k = 0
            for i, r in enumerate(out):
                if part[i]:
                    r[6] = int(mzs[k])
                    k += 1
        else:
            n_part = sum(part)
            mzs = minzoom_from_ranks(n_part, cfg.maxzoom, bz, cfg.droprate)
            k = 0
            for i, r in enumerate(out):
                if part[i]:
                    r[6] = int(mzs[k])
                    k += 1
        return _with_vindex(features_table([tuple(r) for r in out]), idxs)
    # the initial (index, seq) sort always runs in the reference
    # (main.cpp radix) — vindex rides along so every per-tile scan can
    # replay stream order
    return _with_vindex(features_table([tuple(r) for r in out]), idxs)


def ingest_features_ds(ds: ray.data.Dataset, cfg: VectorConfig) -> ray.data.Dataset:
    """Parallel ingest: map_batches over a Dataset of raw feature rows
    (FEATURE_SCHEMA columns). With --drop-lines/--drop-polygons, the
    global drop-ladder minzoom is assigned the way the point pipeline
    does it: per-bucket participating counts → driver prefix sums
    (tiny) → per-bucket rank ranges (stages/minzoom.py), with buckets =
    vindex prefixes so bucket order IS global (vindex, seq) order."""

    ladder_possible = cfg.dropping() or cfg.droprate > 1

    def _ingest_batch(t: pa.Table) -> pa.Table:
        rows, idxs = _ingest_rows(t, cfg)
        tb = _with_vindex(features_table([tuple(r) for r in rows]), idxs)
        return tb.replace_schema_metadata(None)

    out = ds.map_batches(_ingest_batch, batch_format="pyarrow")
    if not ladder_possible:
        return out
    from ..stages.minzoom import minzoom_for_rank_range

    VB = 6  # 4096 rank buckets

    def _vb(t: pa.Table) -> np.ndarray:
        return (
            t["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64)
            >> np.uint64(64 - 2 * VB)
        ).astype(np.int64)

    def _part_mask(t: pa.Table) -> np.ndarray:
        # calc_feature_minzoom main.cpp:302-304: points always ride the
        # ladder; lines/polygons only with the drop flags
        tt = t["t"].to_numpy(zero_copy_only=False)
        m = tt == 1
        if cfg.drop_lines:
            m |= tt == 2
        if cfg.drop_polygons:
            m |= tt == 3
        return m

    out = out.map_batches(
        lambda t: t.append_column("vbucket", pa.array(_vb(t), pa.int64())),
        batch_format="pyarrow",
    ).materialize()

    def _counts(t: pa.Table) -> pa.Table:
        vb = t["vbucket"].to_numpy(zero_copy_only=False)[_part_mask(t)]
        b, n = np.unique(vb, return_counts=True)
        return pa.table({"vbucket": b, "n": n})

    import pandas as pd

    cnt = (
        pa.concat_tables(
            [_counts(p) for p in ray.get(out.to_arrow_refs())]
        ).to_pandas().groupby("vbucket")["n"].sum().sort_index()
    )
    if cnt.empty or int(cnt.sum()) == 0:
        # nothing participates in the rate ladder (no points, no drop
        # flags): skip the assignment pass
        return out.drop_columns(["vbucket"])
    offs = cnt.cumsum().shift(fill_value=0).to_dict()
    offs_ref = ray.put(dict(offs))

    def _assign(grp: pa.Table) -> pa.Table:
        o = ray.get(offs_ref) if isinstance(offs_ref, ray.ObjectRef) else offs_ref
        vb = int(grp["vbucket"][0].as_py())
        vi = grp["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sq = grp["seq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sq, vi))
        grp = grp.take(pa.array(order))
        part = _part_mask(grp)
        k = int(part.sum())
        mz = np.zeros(len(grp), dtype=np.int16)
        if k:
            r0 = int(o.get(vb, 0))
            mz[part] = minzoom_for_rank_range(
                r0, r0 + k, cfg.maxzoom, cfg.resolved_basezoom(), cfg.droprate
            ).astype(np.int16)
        i = grp.column_names.index("minzoom")
        return grp.set_column(i, "minzoom", pa.array(mz, pa.int16()))

    return out.groupby("vbucket").map_groups(
        _assign, batch_format="pyarrow"
    ).drop_columns(["vbucket"])


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


# ------------------------------------------------- as-needed strategies
#
# The write_tile gate chain (tile.cpp:1993-2144), its threshold-retry
# ladder (tile.cpp:2723-3036) and the per-zoom consensus passes
# (traverse_zooms tile.cpp:3382-3572). Thresholds reset at every zoom
# (zoom_mingap = 0 etc., tile.cpp:3383-3390); within a zoom they only
# rise, and any rise re-runs the whole zoom with the merged maxima.

_U64 = (1 << 64) - 1

# serial_feature.dropped states (serial.hpp:146-148); multiplier-cluster
# members carry their ordinal 1..multiplier-1
_ADDED_FOR_DENSITY = 1 << 30  # FEATURE_ADDED_FOR_MULTIPLIER_DENSITY (INT_MAX)


class _Samples:
    """add_sample_to (tile.cpp:1596-1611): keep ~100K samples by
    doubling the sampling increment and halving the list."""

    __slots__ = ("vals", "inc")

    def __init__(self):
        self.vals: list = []
        self.inc = 1

    def add(self, v, seq: int):
        if seq % self.inc == 0:
            self.vals.append(v)
            if len(self.vals) > 100000:
                self.vals = self.vals[::2]
                self.inc *= 2


def _choose_threshold(vals: list, f: float, existing) -> int:
    """choose_mingap / choose_minextent / choose_mindrop_sequence
    (tile.cpp:754-765, 795-803, 806-819): (1-f) quantile of the sorted
    samples, stepped strictly past the existing threshold."""
    g = sorted(vals)
    ix = int((len(g) - 1) * (1 - f))
    while ix + 1 < len(g) and g[ix] <= existing:
        ix += 1
    return g[ix]


def _choose_minattr(vals: list, f: float, existing: float, desc: bool) -> float:
    """choose_minattribute (tile.cpp:821-857); existing is ±HUGE_VAL
    when no threshold has been chosen yet."""
    if not vals:
        return existing
    v = sorted(vals)
    n = len(v)
    if desc:
        ix = int((n - 1) * f)
        while ix > 0 and v[ix] >= existing:
            ix -= 1
        if v[ix] >= existing:
            return existing
        return v[ix]
    ix = int(math.ceil((n - 1) * (1 - f)))
    if ix >= n:
        ix = n - 1
    while ix + 1 < n and v[ix] <= existing:
        ix += 1
    if v[ix] <= existing:
        return existing
    return v[ix]


def _drop_sequence1(fmz: int, index: int) -> int:
    """calculate_drop_sequence (tile.cpp:859-864) for one feature."""
    from ..stages.strategies import bit_reverse

    zoom = min(max(int(fmz), 0), 31)
    out = zoom << 59
    out |= int(bit_reverse(np.array([index], np.uint64))[0]) & ~(31 << 59) & _U64
    return (~out) & _U64


def _dropping_features(s: dict) -> bool:
    """dropping_features (tile.cpp:963-969)."""
    da = (s["minattribute"] != math.inf if s.get("desc")
          else s["minattribute"] != -math.inf)
    return bool(s["mingap"] or s["minextent"] or s["mindrop_sequence"] or da)


def _fresh_thresholds(cfg: VectorConfig) -> dict:
    """Per-zoom starting thresholds (traverse_zooms tile.cpp:3382-3390)."""
    return {
        "gamma": cfg.gamma,
        "mingap": 0,
        "minextent": 0,
        "mindrop_sequence": 0,
        "minattribute": math.inf if cfg.drop_by_attribute_descending else -math.inf,
        "desc": cfg.drop_by_attribute_descending,
    }


def _merge_proposals(base: dict, outs: list[dict]) -> tuple[dict, bool]:
    """The zoom driver's *_out merge (tile.cpp:3506-3527): take maxima,
    report whether any threshold rose (-> whole-zoom retry)."""
    cur = dict(base)
    again = False
    for o in outs:
        if o.get("gamma", 0) > cur["gamma"]:
            cur["gamma"] = o["gamma"]
            again = True
        for k in ("mingap", "minextent", "mindrop_sequence"):
            if o.get(k, 0) > cur[k]:
                cur[k] = o[k]
                again = True
        ma = o.get("minattribute")
        if ma is not None:
            better = ma < cur["minattribute"] if cur["desc"] else ma > cur["minattribute"]
            if better:
                cur["minattribute"] = ma
                again = True
    return cur, again


def _z0_gaps(rows: list, vidx: np.ndarray, scheme: str = "quadkey",
             origin: tuple[int, int] = (0, 0),
             prev0: int = 0) -> np.ndarray:
    """sf.gap as filled by the z0 next_feature scan (tile.cpp:1180-1199)
    over the globally (index, seq)-sorted stream: the max squared
    distance (uint64 wraparound) from the PREVIOUS feature's decoded
    index point to every draw of this feature's snapped geometry —
    including CLOSEPATH rows, whose stored (0, 0) contributes the
    distance to the tile origin (the z0 origin is the world origin).
    previndex starts at 0, so the first feature measures against the
    decoded (0, 0) index unless its own index is 0."""
    if scheme == "hilbert":
        from ..functions.spatial import decode_hilbert as _dec
    else:
        from ..functions.spatial import decode_quadkey as _dec

    n = len(rows)
    gaps = np.zeros(n, np.uint64)
    prev = np.uint64(prev0)
    for i in range(n):
        ix = np.uint64(vidx[i])
        if ix != prev:
            px, py = _dec(np.array([prev], np.uint64))
            px, py = int(px[0]), int(py[0])
            ops, xy = rows[i][2], rows[i][3]
            best = 0
            for k in range(len(ops)):
                if ops[k] == 3:  # CLOSEPATH: stored coordinate is (0,0)
                    gx, gy = origin
                else:
                    gx, gy = int(xy[k, 0]), int(xy[k, 1])
                d = (((px - gx) * (px - gx)) + ((py - gy) * (py - gy))) & _U64
                if d > best:
                    best = d
            gaps[i] = np.uint64(best)
        prev = ix
    return gaps


def _ingest_extent(t: int, ops: np.ndarray, world: np.ndarray, g: int) -> int:
    """serial_feature.extent at serialization (serial.cpp:636-680):
    polygons sum 2^2g × the signed shoelace ring areas of the SCALED
    geometry; lines get π(dist/2)² over SHIFT_LEFT'd deltas; points 0
    (their extent comes from spacing inside write_tile). Clamped to
    int64 with the reference's asymmetric bounds."""
    if t == 1:
        return 0
    scaled = world >> g if g else world
    extent = 0.0
    if t == 3:
        mul = float((1 << g) * (1 << g))
        i = 0
        n = len(ops)
        while i < n:
            if ops[i] == 1:  # MOVETO
                j = i + 1
                while j < n and ops[j] == 2:
                    j += 1
                extent += mul * dv.get_area(scaled, i, j)
                i = j - 1
            i += 1
    else:
        dist = 0.0
        for i in range(1, len(ops)):
            if ops[i] == 2:
                xd = float((int(world[i, 0]) - int(world[i - 1, 0])))
                yd = float((int(world[i, 1]) - int(world[i - 1, 1])))
                dist += math.sqrt(xd * xd + yd * yd)
        extent = math.pi * (dist / 2) * (dist / 2)
    if extent >= -9.223372036854776e18 and extent < 9.223372036854776e18:
        return int(extent)
    if extent < 0:
        return -(1 << 63)
    return (1 << 63) - 1  # also NaN


def _find_small_target(pending, pend_lname, pend_extent, lname, tt, maxextent):
    """find_feature_to_accumulate_onto with a finite maxextent
    (tile.cpp:1576-1590, coalesce-smallest): the most recently appended
    same-layer same-type feature whose extent is <= maxextent."""
    for i in range(len(pending) - 1, -1, -1):
        if (pending[i][1] == tt and pend_lname[i] == lname
                and pend_extent[i] <= maxextent):
            return i
    return None


def _numeric_attr_by_seq(attrs: dict, name: str) -> dict[int, float]:
    """find_attribute_value → numeric (tile.cpp:2110-2130): the
    attribute's serial value is typed exactly like the MVT encoder
    (stringified_to_mvt_value) and only int/uint/sint and FINITE
    float/double values participate; mvt_float compares as the
    float32-rounded value."""
    import struct as _struct

    from ..stages.mvt import is_integer_str, is_unsigned_integer_str

    out: dict[int, float] = {}
    for seq, ent in attrs.items():
        if not isinstance(seq, int):
            continue
        for k, vt, s in ent[1]:
            if k != name:
                continue
            if vt == "sint":
                out[seq] = float(int(s))
            elif vt == "double":
                uv = is_unsigned_integer_str(s)
                if uv is not None:
                    out[seq] = float(uv)
                else:
                    v = is_integer_str(s)
                    if v is not None:
                        out[seq] = float(v)
                    else:
                        try:
                            d = float(s)
                        except ValueError:
                            d = 0.0
                        try:
                            f32 = _struct.unpack("<f", _struct.pack("<f", d))[0]
                            if f32 == d:
                                d = f32
                        except OverflowError:
                            pass
                        if math.isfinite(d):
                            out[seq] = d
            break  # first matching key; string/bool/null are not numeric
    return out


def _manage_gap(index: int, state: list, scale: float, gamma: float) -> bool:
    """manage_gap (tile.cpp:720-753); state = [previndex, gap]."""
    if gamma > 0:
        if state[1] > 0:
            if index == state[0]:
                return True
            if index < state[0] or math.exp(
                math.log((index - state[0]) / scale) * gamma
            ) >= state[1]:
                state[1] = 0.0
            else:
                return True
        elif index >= state[0]:
            g = (index - state[0]) / scale
            if g == 0:
                return True
            elif g < 1:
                state[1] = g
                return True
            else:
                state[1] = 0.0
        state[0] = index
    return False


def _feature_step(cfg: VectorConfig, z: int, tx: int, ty: int,
                  t: int, ops: np.ndarray, xy: np.ndarray,
                  nextzoom: int | None = None):
    """One cascade step for ONE feature at tile (z, tx, ty): clip to
    tile+buffer (clip_to_tile, tile.cpp:974-1057, incl. the z0 dateline
    ±360° duplication :977-1001) and compute the child tiles the
    PRE-CLIP bbox touches (rewrite, tile.cpp:443-533, with the buffer+1
    top/left widening). Stateless across features — the basis for both
    the per-tile scan and the per-feature fan-out. Returns
    (cops, cxy_local, child_keys, snapped_world | None, edge_nodes) or
    None when the feature is culled here; edge_nodes is the -pn list
    of tile-boundary crossing points (clip.cpp:810-845), always []
    without prevent_shared_nodes."""
    span_shift = WORLD_BITS - z
    span = 1 << span_shift
    buf = cfg.buffer * span // 256
    origin = np.array([tx << span_shift, ty << span_shift], dtype=np.int64) if z else np.zeros(2, np.int64)
    # nextzoom > z + 1 happens only below minzoom (write_tile
    # tile.cpp:1686-1697 zoom jumps); ≤ MAX_ZOOM 24, so the shift is
    # ≥ 0 there; the max() keeps maxzoom-tile steps from raising
    if nextzoom is None:
        nextzoom = z + 1
    child_div = 1 << max(0, WORLD_BITS - nextzoom - 8)
    cspan = 1 << (nextzoom - z)

    local = xy - origin
    bbox = dv.geom_bbox(local, ops)
    if bbox is None:
        return None
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
        return None
    enodes: list[tuple[int, int]] = []
    if quick != 1 or cfg.prevent_duplication:
        if t == 2:
            cops, cxy = dv.clip_lines(ops, local, -buf, -buf, span + buf, span + buf)
        elif t == 3:
            if cfg.prevent_shared_nodes:
                cops, cxy, enodes = dv.simple_clip_poly_pn(
                    ops, local, -buf, -buf, span + buf, span + buf,
                    0, 0, span, span,
                )
            else:
                cops, cxy = dv.simple_clip_poly(ops, local, -buf, -buf, span + buf, span + buf)
        else:
            keep = (
                (local[:, 0] >= -buf) & (local[:, 1] >= -buf)
                & (local[:, 0] <= span + buf) & (local[:, 1] <= span + buf)
            )
            cops, cxy = ops[keep], local[keep]
        cops, cxy = dv.remove_noop(cops, cxy, t, 0)
        if cfg.prevent_duplication and z != 0:
            # keep the WHOLE geometry only in the tile that holds the
            # bbox midpoint (clip_to_tile tile.cpp:1039-1044; C trunc
            # division for the midpoint halves)
            def _half2(v: int) -> int:
                return -((-v) // 2) if v < 0 else v // 2

            mx = _half2(int(bbox[0]) + int(bbox[2]))
            my = _half2(int(bbox[1]) + int(bbox[3]))
            if 0 <= mx < span and 0 <= my < span:
                cops, cxy = ops, local
            else:
                cops, cxy = dv.empty_geom()
        elif cfg.prevent_clipping and z != 0:
            # unclipped geometry everywhere the clip is non-empty
            # (tile.cpp:1045-1050)
            if len(cops):
                cops, cxy = ops, local
    else:
        cops, cxy = ops, local

    child_keys: list[tuple[int, int]] = []
    snapped = None
    if len(cops) > 0 and (nextzoom <= cfg.maxzoom or cfg.extend_zooms
                          or cfg.extend_zooms_max > 0):
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
        snapped = dv.snap_world(cxy + origin, cfg.resolved_gscale())
        for xo in range(b2[0], b2[2] + 1):
            for yo in range(b2[1], b2[3] + 1):
                child_keys.append((tx * cspan + xo, ty * cspan + yo))
    return cops, cxy, child_keys, snapped, enodes


def process_tile(cfg: VectorConfig, z: int, tx: int, ty: int, tbl,
                 global_nodes=None, est=None, attrs=None,
                 strat: dict | None = None, nextzoom: int | None = None,
                 fanout_only: bool = False, par_workers: int = 0):
    """One write_tile (keep-all path): returns (tile_row | None,
    children: dict[(cx, cy) -> row list]). `tbl` is a feature table or
    a list of row tuples (see table_to_rows). `fanout_only` is the
    z < minzoom pass: rewrite children, no gates, no encode
    (next_feature tile.cpp:1216-1218)."""
    if isinstance(tbl, pa.Table):
        tbl = table_to_rows(tbl)
    children: dict[tuple[int, int], list] = {}
    survivors: list = []
    poison_children = False

    if strat is not None:
        # next_feature's lazy gap fill (tile.cpp:1180-1199): a feature
        # whose serialized gap is still 0 (duplicate index in the z0
        # stream) measures against THIS tile's previous stream feature,
        # over its pre-clip geometry; CLOSEPATH rows contribute the
        # tile origin. previndex advances for every stream feature,
        # including ones the clip rejects entirely.
        gap_of = (attrs or {}).get("__gap__", _EMPTY_DICT)
        vix_of = (attrs or {}).get("__vindex__", _EMPTY_DICT)
        ovr: dict[int, int] = {}
        if z > 0:
            if cfg.index_scheme == "hilbert":
                from ..functions.spatial import decode_hilbert as _dec
            else:
                from ..functions.spatial import decode_quadkey as _dec
            prev = 0
            span_shift = WORLD_BITS - z
            ox, oy = tx << span_shift, ty << span_shift
            for row in tbl:
                sq_, vx_ = row[0], int(vix_of.get(row[0], 0))
                if int(gap_of.get(sq_, 0)) == 0 and vx_ != prev:
                    px, py = _dec(np.array([prev], np.uint64))
                    px, py = int(px[0]), int(py[0])
                    best = 0
                    ops_, xy_ = row[2], row[3]
                    for k in range(len(ops_)):
                        if ops_[k] == 3:
                            gx, gy = ox, oy
                        else:
                            gx, gy = int(xy_[k, 0]), int(xy_[k, 1])
                        d = (((px - gx) * (px - gx))
                             + ((py - gy) * (py - gy))) & ((1 << 64) - 1)
                        if d > best:
                            best = d
                    ovr[sq_] = best
                prev = vx_
        strat["_gap_override"] = ovr

    nz = (z + 1) if nextzoom is None else nextzoom
    for row in tbl:
        seq, t, ops, xy, lab_x, lab_y, fmz, fmn, fmx = row[:9]
        step = _feature_step(cfg, z, tx, ty, t, ops, xy, nextzoom=nz)
        if step is None:
            continue
        cops, cxy, child_keys, snapped, enodes = step
        if child_keys and (fmx == -1 or fmx >= nz):
            # rewrite is gated on the per-feature maxzoom reaching the
            # next zoom (next_feature tile.cpp:1211-1214)
            blob = (seq, t, cops, snapped, lab_x, lab_y, fmz, fmn, fmx)
            for key in child_keys:
                children.setdefault(key, []).append(blob)
        if fanout_only or z < cfg.minzoom:
            continue
        if cfg.variable_depth and z < cfg.maxzoom and (
            (fmn != -1 and z < fmn)
            or ((fmx == -1 or z <= fmx) and fmz > z + 1)
        ):
            # minzoom_feature_pending / dropping_by_rate in this scan:
            # children must not try to stop early (tile.cpp:2346-2349)
            poison_children = True
        survivors.append((seq, t, cops, cxy, (lab_x, lab_y), fmz, fmn, fmx, enodes))

    if fanout_only:
        return None, children, False
    tile_row = _encode_with_detail_ladder(cfg, z, tx, ty, survivors,
                                          global_nodes=global_nodes, est=est,
                                          attrs=attrs, strat=strat,
                                          par_workers=par_workers)
    return tile_row, children, poison_children


def _jq(s: str) -> str:
    """json_writer::json_write_string quoting (write_json.cpp): escape
    only backslash, double quote, and control bytes (\\u%04x)."""
    out = ['"']
    for ch in s:
        if ch in '\\"':
            out.append("\\" + ch)
        elif ord(ch) < 0x20:
            out.append("\\u%04x" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _pipe_value(vt: str, s: str) -> str | None:
    """One attribute value as the prefilter pipe prints it: the mvt
    typing of stringified_to_mvt_value followed by write_json's
    per-type printer (%lld / %llu for ints, dtoa_milo for
    float/double, write_json.cpp:344-377)."""
    from ..functions.text import dtoa_milo
    from ..stages.mvt import is_integer_str, is_unsigned_integer_str

    if vt == "string":
        return _jq(s)
    if vt == "bool":
        return "true" if s.startswith("t") else "false"
    if vt == "null":
        return None  # nulls never reach the mvt layer the pipe prints
    if vt == "sint":
        return str(int(s))
    s = s.split("\0", 1)[0]  # strip any accumulator count rider
    uv = is_unsigned_integer_str(s)
    if uv is not None:
        return str(uv)
    v = is_integer_str(s)
    if v is not None:
        return str(v)
    try:
        d = float(s)
    except ValueError:
        d = 0.0
    f32 = struct.unpack("<f", struct.pack("<f", d))[0] if abs(d) != float(
        "inf") else d
    if f32 == d:
        return dtoa_milo(f32)  # piped as mvt_float
    return dtoa_milo(d)


def _survivor_to_geojson(cfg: VectorConfig, z, tx, ty, seq, t, ops, xy,
                         dropped: bool, layername: str, fid, rows) -> str:
    """One clipped feature as the prefilter pipe line the reference
    writes (run_prefilter tile.cpp:1395-1426 → layer_to_geojson
    write_json.cpp:271-430 with extent 2^32 at 0/0/0): world-plane
    lon/lat printed with %f, the feature's real attributes, and the
    tippecanoe {layer, dropped, sequence} block."""
    from ..functions.spatial import world_to_lonlat

    sx = (tx << (WORLD_BITS - z)) if z else 0
    sy = (ty << (WORLD_BITS - z)) if z else 0
    wxy = np.asarray(xy, np.int64) + np.array([sx, sy], np.int64)
    lon, lat = world_to_lonlat(wxy[:, 0], wxy[:, 1])

    def _pt(i):
        return "[ %f, %f ]" % (float(lon[i]), float(lat[i]))

    rings_ = [(i, j) for i, j in dv.rings(np.asarray(ops, np.uint8))]
    if t == 1:
        if len(wxy) == 1:
            geom = '"type": "Point", "coordinates": ' + _pt(0)
        else:
            geom = ('"type": "MultiPoint", "coordinates": [ '
                    + ", ".join(_pt(i) for i in range(len(wxy))) + " ]")
    elif t == 2:
        lines = ["[ " + ", ".join(_pt(k) for k in range(i, j)) + " ]"
                 for i, j in rings_]
        if len(lines) == 1:
            geom = '"type": "LineString", "coordinates": ' + lines[0]
        else:
            geom = ('"type": "MultiLineString", "coordinates": [ '
                    + ", ".join(lines) + " ]")
    else:
        polys: list[list[str]] = []
        for i, j in rings_:
            pts = [_pt(k) for k in range(i, j)]
            if pts and pts[0] != pts[-1]:
                pts.append(pts[0])  # close_poly (tile.cpp:1399)
            ring = "[ " + ", ".join(pts) + " ]"
            if dv.get_area(np.asarray(xy, np.int64), i, j) > 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        ps = ["[ " + ", ".join(rs) + " ]" for rs in polys]
        if len(ps) == 1:
            geom = '"type": "Polygon", "coordinates": ' + ps[0]
        else:
            geom = ('"type": "MultiPolygon", "coordinates": [ '
                    + ", ".join(ps) + " ]")
    props = []
    for name, vt, sval in rows or ():
        pv = _pipe_value(vt, sval)
        if pv is not None:
            props.append(_jq(name) + ": " + pv)
    head = ['"type": "Feature"']
    if fid is not None:
        head.append('"id": %d' % int(fid))
    tp = [
        '"layer": ' + _jq(layername),
        '"dropped": ' + ("true" if dropped else "false"),
    ]
    if seq:
        tp.append('"sequence": %d' % int(seq))
    head.append('"tippecanoe": { ' + ", ".join(tp) + " }")
    head.append('"properties": { ' + ", ".join(props) + (" }" if props
                                                         else "}"))
    head.append('"geometry": { ' + geom + " }")
    return "{ " + ", ".join(head) + " }"


def _run_prefilter(cfg: VectorConfig, z, tx, ty, survivors, attrs):
    """Pipe the tile's features through cfg.prefilter (sh -c cmd sh z x
    y, plugin.cpp:436) and parse stdout back into survivor tuples plus
    a REPLACEMENT tile-local attrs dict (parse_feature
    plugin.cpp:148-380): properties re-read with stringify_value (nulls
    dropped), per-feature layer from tippecanoe.layer (else "unknown"),
    id from the JSON id, dropped → rate-minzoom z+1, sequence/index/
    extent restored. Output geometry is re-snapped to the
    geometry_scale grid, polygons re-wound, and re-clipped to this
    tile+buffer for encode sanity. -pn edge nodes, -aP ingest anchors
    and the -at pending-minzoom flag do not survive the pipe; features
    the explicit per-feature zoom gates exclude are not piped
    (next_feature consumes them before run_prefilter serializes)."""
    import json as _json
    import subprocess

    from ..sources.geojson import (
        _geom_parts, _RawNum, _stringify_value,
    )
    from ..functions.spatial import lonlat_to_world

    lmap = (attrs or _EMPTY_DICT).get("__layers__", _EMPTY_DICT)
    lines = []
    for row in survivors:
        seq, t, ops, xy, fmz = row[0], row[1], row[2], row[3], row[5]
        fmn = row[6] if len(row) > 6 else -1
        fmx = row[7] if len(row) > 7 else -1
        if len(ops) == 0:
            continue
        if (fmn >= 0 and z < fmn) or (fmx >= 0 and z > fmx):
            continue  # explicit zoom gates skip inside next_feature
        fid, rows = (attrs or _EMPTY_DICT).get(seq) or (None, ())
        lines.append(_survivor_to_geojson(
            cfg, z, tx, ty, seq, t, ops, xy,
            dropped=fmz > z, layername=lmap.get(seq) or cfg.layer_name,
            fid=fid, rows=rows))
    proc = subprocess.run(
        ["sh", "-c", cfg.prefilter, "sh", str(z), str(tx), str(ty)],
        input="\n".join(lines) + ("\n" if lines else ""),
        capture_output=True, text=True,
    )
    g = cfg.resolved_gscale()
    span_shift = WORLD_BITS - z
    sx = (tx << span_shift) if z else 0
    sy = (ty << span_shift) if z else 0
    span = 1 << span_shift
    buf = cfg.buffer * span // 256
    out: list[tuple] = []
    new_attrs: dict = {"__layers__": {}, "__vindex__": {}, "__extent__": {}}
    k = 0  # fresh tile-local attr key per parsed feature
    dec = _json.JSONDecoder(parse_float=_RawNum, parse_int=_RawNum)
    for line in proc.stdout.splitlines():
        line = line.strip().strip("\x1e,")
        if not line or line in ("[", "]"):
            continue
        try:
            obj, _ = dec.raw_decode(line)
        except _json.JSONDecodeError:
            continue
        if not isinstance(obj, dict) or obj.get("type") != "Feature":
            continue
        tc = obj.get("tippecanoe") or {}
        seq = int(float(tc.get("sequence", 0)))
        layername = tc.get("layer")
        if not isinstance(layername, str):
            layername = "unknown"
        f_dropped = tc.get("dropped") is True
        vindex = int(float(tc.get("index", 0)))
        extent = int(float(tc.get("extent", 0)))
        rid = obj.get("id")
        fid = None
        if isinstance(rid, _RawNum):
            try:
                fid = int(str(rid))
                if fid < 0:
                    fid = None
            except ValueError:
                fid = int(_atof(str(rid)))
        rows: list[tuple] = []
        props = obj.get("properties")
        if isinstance(props, dict):
            for pk, pv in props.items():
                vt, s = _stringify_value(pv)
                if vt != "null":
                    rows.append((pk, vt, s))
        for vt, parts in _geom_parts(obj.get("geometry") or {}):
            ops_l: list[np.ndarray] = []
            xy_l: list[np.ndarray] = []
            if vt == 3:
                for poly in parts:
                    for ring in poly:
                        arr = np.asarray(ring, np.float64).reshape(-1, 2)
                        wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                        ops_l.append(np.array([1] + [2] * (len(arr) - 1), np.uint8))
                        xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
                    ops_l.append(np.array([7], np.uint8))
                    xy_l.append(np.zeros((1, 2), np.int64))
            else:
                for part in parts:
                    arr = np.asarray(part, np.float64).reshape(-1, 2)
                    wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                    ops_l.append(np.array([1] + [2] * (len(arr) - 1), np.uint8))
                    xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
            if not ops_l:
                continue
            ops = np.concatenate(ops_l)
            world = np.concatenate(xy_l)
            if vt == 3:
                # fix_polygon runs at FULL precision before the
                # geometry_scale snap (parse_feature plugin.cpp:228-243):
                # its centroid-furthest ring rotation picks a different
                # start vertex on snapped coordinates
                ops, world = dv.fix_polygon(ops, world)
            scaled = dv.shift_right(world, g)
            if len(ops) == 0:
                continue
            # the reference does NOT re-clip parsed filter output
            # (parse_feature goes straight into the write_tile scan);
            # round-trip noise may leave vertices slightly past the
            # buffer and the per-tile pipeline handles that
            world = (scaled << g) if g else scaled
            local = world - np.array([sx, sy], np.int64)
            if len(ops) == 0:
                continue
            # fresh tile-local key k: parsed features REPLACE the
            # stream, and pipe-provided sequences need not be unique
            out.append((k, vt, ops, local, (-1, -1),
                        (z + 1) if f_dropped else 0, -1, -1, (), seq))
            new_attrs[k] = (fid, rows)
            new_attrs["__layers__"][k] = layername
            if vindex:
                new_attrs["__vindex__"][k] = vindex
            if extent:
                new_attrs["__extent__"][k] = extent
            k += 1
    return out, new_attrs


def _run_postfilter(cfg: VectorConfig, z, tx, ty, by_layer, out_detail):
    """-c postfilter (filter_layers plugin.cpp:378-418): pipe the
    ASSEMBLED tile's layers as GeoJSON (run_writer → layer_to_geojson
    with the real z/x/y and the tile extent, plugin.cpp:47-75) through
    `sh -c cmd sh z x y`, then parse stdout back into tile layers
    (parse_layers read_json.cpp:304-420): per-feature layer from
    tippecanoe.layer (else "unknown"), lonlat→tile scaling with
    std::round, polygon fix_polygon at world precision then the wagyu
    clean at tile scale, remove_noop. Output layer order is the
    caller's sorted() (the reference's std::map is also name-ordered).
    Deviations: the multiplier 'dropped' flag pipes as false, empty
    parsed layers are dropped, and the wagyu clip region (±1 tile,
    clean_or_clip_poly buffer=256) is skipped — filters emitting
    geometry a full tile beyond the edge would differ."""
    import json as _json
    import subprocess

    from ..functions.spatial import lonlat_to_world
    from ..sources.geojson import _geom_parts, _RawNum, _stringify_value
    from ..stages.mvt import (
        _read_varint, encode_linestring, encode_polygon,
    )
    from ..stages.tile_encode import encode_multipoint

    wscale = 1 << (WORLD_BITS - z)
    ext = 1 << out_detail
    gs = wscale // ext
    origin = np.array([tx * wscale, ty * wscale], np.int64)
    lines = []
    for nm in sorted(by_layer):
        for f in by_layer[nm]:
            # unpack the packed-varint wire geometry back to ops/xy
            buf = f["geom"]
            vals = []
            pos = 0
            while pos < len(buf):
                v, pos = _read_varint(buf, pos)
                vals.append(v)
            ops_l: list[int] = []
            pts: list[tuple[int, int]] = []
            xx = yy = 0
            i = 0
            while i < len(vals):
                cmd = vals[i] & 7
                cnt = vals[i] >> 3
                i += 1
                if cmd == 7:
                    ops_l.append(7)
                    pts.append((0, 0))
                    continue
                for _ in range(cnt):
                    dx = (vals[i] >> 1) ^ -(vals[i] & 1)
                    dy = (vals[i + 1] >> 1) ^ -(vals[i + 1] & 1)
                    i += 2
                    xx += dx
                    yy += dy
                    ops_l.append(cmd)
                    pts.append((xx, yy))
            if not pts:
                continue
            ops = np.array(ops_l, np.uint8)
            world = np.array(pts, np.int64).reshape(-1, 2) * gs + origin
            lines.append(_survivor_to_geojson(
                cfg, 0, 0, 0, 0, int(f["type"]), ops, world,
                dropped=False, layername=nm, fid=f.get("id"),
                rows=f.get("attrs_sv") or ()))
    proc = subprocess.run(
        ["sh", "-c", cfg.postfilter, "sh", str(z), str(tx), str(ty)],
        input="\n".join(lines) + ("\n" if lines else ""),
        capture_output=True, text=True,
    )
    out: dict[str, list] = {}
    dec = _json.JSONDecoder(parse_float=_RawNum, parse_int=_RawNum)
    for line in proc.stdout.splitlines():
        line = line.strip().strip("\x1e,")
        if not line or line in ("[", "]"):
            continue
        try:
            obj, _ = dec.raw_decode(line)
        except _json.JSONDecodeError:
            continue
        if not isinstance(obj, dict) or obj.get("type") != "Feature":
            continue
        tc = obj.get("tippecanoe") or {}
        layername = tc.get("layer")
        if not isinstance(layername, str):
            layername = "unknown"
        rid = obj.get("id")
        fid = None
        if isinstance(rid, _RawNum):
            try:
                fid = int(str(rid))
                if fid < 0:
                    fid = None
            except ValueError:
                fid = int(_atof(str(rid)))
        rows: list[tuple] = []
        props = obj.get("properties")
        if isinstance(props, dict):
            for pk, pv in props.items():
                vt, s = _stringify_value(pv)
                if vt != "null":
                    rows.append((pk, vt, s))
        for vt, parts in _geom_parts(obj.get("geometry") or {}):
            ops_l2: list[np.ndarray] = []
            xy_l2: list[np.ndarray] = []
            groups = parts if vt == 3 else [parts]
            for grp in groups:
                for part in (grp if vt == 3 else [p for p in grp]):
                    arr = np.asarray(part, np.float64).reshape(-1, 2)
                    wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                    ops_l2.append(np.array([1] + [2] * (len(arr) - 1), np.uint8))
                    xy_l2.append(np.stack([wx, wy], axis=1).astype(np.int64))
                if vt == 3:
                    ops_l2.append(np.array([7], np.uint8))
                    xy_l2.append(np.zeros((1, 2), np.int64))
            if not ops_l2:
                continue
            ops = np.concatenate(ops_l2)
            world = np.concatenate(xy_l2)
            if vt == 3:
                ops, world = dv.fix_polygon(ops, world)
            # offset + scale to the tile extent (read_json.cpp:273-283)
            rel = (world - origin).astype(np.float64) * (ext / wscale)
            txy = dv.round_half_away_arr(rel).astype(np.int64)
            if vt == 3:
                ops, txy = dv.clean_poly_tile_scale(ops, txy,
                                                    try_scaling=False)
                if len(ops) < 3:
                    continue
            ops, txy = dv.remove_noop(ops, txy, vt, 0)
            if len(ops) == 0:
                continue
            gparts = [txy[i:j] for i, j in dv.rings(ops)]
            if not gparts:
                continue
            if vt == 3:
                gb = encode_polygon(gparts)
            elif vt == 2:
                gb = encode_linestring(gparts)
            else:
                gb = encode_multipoint(txy)
            nf: dict = {"geom": gb, "type": vt}
            if fid is not None:
                nf["id"] = fid
            if rows:
                nf["attrs_sv"] = rows
            out.setdefault(layername, []).append(nf)
    return out


def _atof(s: str) -> float:
    """C atof: parse the leading numeric prefix, 0 on none; stops at
    an embedded NUL (the mean/count rider separator, serial.hpp:83)."""
    import re

    s = s.split("\0", 1)[0]
    m = re.match(r"[ \t]*[-+]?(\d+\.?\d*([eE][-+]?\d+)?|\.\d+([eE][-+]?\d+)?"
                 r"|inf(inity)?|nan)", s, re.IGNORECASE)
    if not m:
        return 0.0
    try:
        return float(m.group(0))
    except ValueError:
        return 0.0


def _acc_count(s: str) -> int:
    """serial_val.get_count (serial.hpp:74): count rider after a NUL."""
    if "\0" not in s:
        return 0
    try:
        return int(s.split("\0", 1)[1] or "0")
    except ValueError:
        return 0


def _accumulate_attr(acc: dict, op: str, key: str, vt: str, s: str):
    """One preserve_attribute1 application (attribute.cpp:92-181) into
    the target's accumulation store acc = {key: [vt, s]} (+ acc
    preserves insertion order = promote order)."""
    from ..functions.text import dtoa_milo

    ex = acc.get(key)
    if ex is None:
        # not-found branch (attribute.cpp:156-180)
        if op in ("sum", "max", "min"):
            acc[key] = [vt, s]
        elif op == "count":
            acc[key] = ["double", dtoa_milo(1.0) + "\0" + "1"]
        elif op == "mean":
            acc[key] = ["double", dtoa_milo(_atof(s)) + "\0" + "1"]
        else:
            # product/concat/comma have no not-found branch in the
            # reference (the key always pre-exists there); start from
            # the incoming value rather than dying
            acc[key] = [vt, s]
        return
    if op == "sum":
        ex[:] = ["double", dtoa_milo(_atof(ex[1]) + _atof(s))]
    elif op == "product":
        ex[:] = ["double", dtoa_milo(_atof(ex[1]) * _atof(s))]
    elif op == "max":
        if _atof(s) > _atof(ex[1]):
            ex[:] = [vt, s]
    elif op == "min":
        if _atof(s) < _atof(ex[1]):
            ex[:] = [vt, s]
    elif op == "mean":
        count = _acc_count(ex[1])
        if count <= 1:
            ex[:] = ["double",
                     dtoa_milo((_atof(ex[1]) + _atof(s)) / 2) + "\0" + "2"]
        else:
            total = _atof(ex[1]) * count + _atof(s)
            count += 1
            ex[:] = ["double",
                     dtoa_milo(total / count) + "\0" + str(count)]
    elif op == "concat":
        ex[:] = ["string", ex[1] + s]
    elif op == "comma":
        ex[:] = ["string", ex[1] + "," + s]
    elif op == "count":
        c = _acc_count(ex[1])
        c = 2 if c <= 1 else c + 1
        ex[:] = ["double", dtoa_milo(float(c)) + "\0" + str(c)]


_MVT_TYPE_RANK = {"string": 0, "float": 1, "double": 2, "int": 3,
                  "uint": 4, "sint": 5, "bool": 6, "null": 7}


def _coal_key(t, fid, rows, acc, extra=()):
    """coalcmp sort/equality key (tile.cpp:113-171): type, id
    presence+value, POOLED attributes via metacmp (count, then per
    entry key/type/value), then the APPENDED full_keys entries —
    accumulate values plus `extra` (the synthesized multiplier-seq and
    -K cluster attrs, appended before the reorder at tile.cpp:
    2394-2451 and therefore part of the comparison; they only decide
    when every pooled attribute ties — flag-fuzzer find: lines
    -z4 -K50 -ao vs countries -z3 -K100 -ao -ac)."""
    meta = tuple(
        (k, _MVT_TYPE_RANK.get(vt, 0), s) for k, vt, s in rows
        if vt != "null" and (not acc or k not in acc)
    )
    full = tuple(
        (k, _MVT_TYPE_RANK.get(v[0], 0), v[1]) for k, v in acc.items()
    ) if acc else ()
    full += tuple(
        (k, _MVT_TYPE_RANK.get(vt, 0), s) for k, vt, s in extra
    )
    return (t, fid is not None, fid if fid is not None else 0,
            len(meta), meta, len(full), full)


def _geom_key(xy: np.ndarray):
    """drawvec lexicographic order: per-draw (y, x) (geometry.hpp:46)."""
    return tuple(map(tuple, xy[:, ::-1].tolist()))


def _glow(spacing: float) -> int:
    """-ag glow from the scan-time spacing (tile.cpp:2656-2663)."""
    if spacing > 0:
        return min(int(1 / spacing), 255)
    return 255


def _cluster_attr_rows(cluster_n: int) -> list:
    """-K / cluster-densest stats attributes (tile.cpp:2420-2451):
    appended to the feature's full_keys at the start of phase 2."""
    pc_ = cluster_n + 1
    if pc_ >= 10000:
        abbrev = f"{pc_ / 1000.0:.0f}k"
    elif pc_ >= 1000:
        abbrev = f"{pc_ / 1000.0:.1f}k"
    else:
        abbrev = str(pc_)
    # std::to_string(double) is "%f" — 6 fixed decimals
    sq = f"{round(100 * math.sqrt(pc_)) / 100.0:.6f}"
    return [
        ("clustered", "bool", "true"),
        ("point_count", "double", str(pc_)),
        ("sqrt_point_count", "double", sq),
        ("point_count_abbreviated", "string", abbrev),
    ]


def _order_value(rows, name: str, extent: int):
    """find_attribute_value + coerce_double (tile.cpp:285-337): the
    feature's typed value for one --order-by field as a comparable
    (enum rank, value) pair — numeric types coerce to double (rank 2);
    strings compare as UTF-8 bytes (rank 0); bool rank 6; absent/null
    rank 7."""
    if name == ":size":  # ORDER_BY_SIZE
        return (2, float(extent))
    from ..stages.mvt import is_integer_str, is_unsigned_integer_str

    for k, vt, s in rows or ():
        if k != name:
            continue
        if vt == "string":
            return (0, s.encode("utf-8"))
        if vt == "bool":
            return (6, s == "true")
        if vt == "null":
            return (7, 0)
        if vt == "sint":
            return (2, float(int(s)))
        # vt 'double': stringified_to_mvt_value numeric ladder
        # (mvt.cpp:713-772), every branch coerces to double
        uv = is_unsigned_integer_str(s)
        if uv is not None:
            return (2, float(uv))
        v = is_integer_str(s)
        if v is not None:
            return (2, float(v))
        try:
            return (2, float(s))
        except ValueError:
            return (2, 0.0)
    return (7, 0)


def _assemble_clusters(lst: list, m_mult: int) -> list[list]:
    """assemble_multiplier_clusters (tile.cpp:373-404): consecutive
    runs starting at each tippecanoe:retain_points_multiplier_first
    tag."""
    if m_mult == 1:
        return [[f] for f in lst]
    clusters: list[list] = []
    for f in lst:
        is_start = any(
            r[0] == "tippecanoe:retain_points_multiplier_first"
            for r in f.get("attrs_sv", ())
        )
        if is_start or not clusters:
            clusters.append([])
        clusters[-1].append(f)
    return clusters


def _disassemble_clusters(clusters: list[list], dseq_of_seq: dict) -> list:
    """disassemble_multiplier_clusters (tile.cpp:406-440): move the
    _first tag onto the cluster head (appended at the END of its
    attribute rows, matching the push_back), then stable-sort the tail
    by drop_sequence DESCENDING."""
    out: list = []
    for cluster in clusters:
        for i, f in enumerate(cluster):
            rows = f.get("attrs_sv")
            if not rows:
                continue
            hit = next((j for j, r in enumerate(rows)
                        if r[0] == "tippecanoe:retain_points_multiplier_first"),
                       None)
            if hit is not None:
                tag = rows[hit]
                f["attrs_sv"] = rows[:hit] + rows[hit + 1:]
                if not f["attrs_sv"]:
                    del f["attrs_sv"]
                head = cluster[0]
                head["attrs_sv"] = list(head.get("attrs_sv", ())) + [tag]
                break
        if len(cluster) > 1:
            tail = sorted(
                cluster[1:],
                key=lambda f: dseq_of_seq.get(f.get("_seq"), 0),
                reverse=True,
            )
            cluster = [cluster[0]] + tail
        out.extend(cluster)
    return out


def _mk_feat(geom: bytes, t: int, seq: int, attrs, acc: dict | None = None,
             glow: int | None = None, cluster_n: int = 0,
             mfirst: bool = False, mseq: int | None = None) -> dict:
    """Tile feature dict: id/attributes from the broadcast side table
    (write_tile carries full_keys/full_values per feature; plain
    corpora without ids get none, like the reference). A per-feature
    layer override (tippecanoe extension) rides as 'layer'."""
    f = {"geom": geom, "type": t, "_seq": seq}
    if attrs is not None or cluster_n or mfirst or mseq is not None:
        ent = attrs.get(seq) if attrs is not None else None
        rows = []
        if ent is not None:
            fid, rows = ent
            if fid is not None:
                f["id"] = fid
        if mfirst:
            # pushed at append time, before any later fold appends
            # (tile.cpp:2237-2240)
            rows = list(rows) + [
                ("tippecanoe:retain_points_multiplier_first", "bool", "true")
            ]
        if acc:
            # accumulated keys were PROMOTED out of the normal
            # attribute list and appended after it in promote order
            # (promote_attribute tile.cpp:1465-1484 + decode_meta then
            # full_keys, tile.cpp:2646-2651); the count rider after
            # the NUL is invisible to the wire
            rows = [r for r in rows if r[0] not in acc] + [
                (k, v[0], v[1].split("\0", 1)[0]) for k, v in acc.items()
            ]
        if mseq is not None:
            # per-layer input-order sequence tag, added at phase-2 start
            # after the scan-time folds (tile.cpp:2395-2415)
            rows = list(rows) + [
                ("tippecanoe:retain_points_multiplier_sequence", "double",
                 str(mseq))
            ]
        if cluster_n:
            rows = list(rows) + _cluster_attr_rows(cluster_n)
        if glow is not None:
            # -ag: appended last, after the accumulated attrs
            # (tile.cpp:2656-2676)
            rows = list(rows) + [("tippecanoe_feature_density", "sint",
                                  str(glow))]
        if rows:
            f["attrs_sv"] = rows
        ln = (attrs.get("__layers__", _EMPTY_DICT).get(seq)
              if attrs is not None else None)
        if ln is not None:
            f["layer"] = ln
    return f


_EMPTY_DICT: dict = {}


def _phase2_geom(cfg: VectorConfig, z, tx, ty, line_detail, out_detail,
                 t, ops, xy, reduced, area, was_coalesced, pn, mark_bounds,
                 local_nodes, global_nodes, simplification):
    """The per-feature simplification-worker chain (simplify_feature
    tile.cpp:595-665 + the worker's to_tile_scale / clean, tile.cpp
    2287-2480): stairstep or simplify, -ar reversal, scale to tile
    coordinates, and for polygons the wagyu clean with revive
    fallback. Pure in its arguments, so it can run serially in the
    ladder loop or fan out to Ray subtasks (the reference runs the
    same chain in its simplification worker threads)."""
    if cfg.grid_low_zooms and z < cfg.maxzoom and t in (2, 3):
        # rasterize onto the grid; no simplification, and the
        # revive-area comes from the STAIRSTEPPED geometry
        # (simplify_feature computes area after stairstep)
        ops, xy = dv.stairstep_ops(ops, xy, z, line_detail)
        if t == 3:
            area = dv.get_mp_area(ops, xy)
    elif not reduced and not (
        cfg.no_simplify
        or (z == cfg.maxzoom and cfg.simplify_only_low)
    ):
        if t == 2 and not pn:
            # skipped under -pn: might wipe out the
            # intersection (tile.cpp:617-624)
            ops, xy = dv.remove_noop(ops, xy, t, WORLD_BITS - z - line_detail)
        # already_marked (tile.cpp:626-629): under -ab the
        # polygon arcs were simplified globally by
        # find_common_edges, so the individual pass is skipped
        if not (cfg.detect_shared_borders and t == 3):
            if was_coalesced and t == 3:
                # clean coalesced polygons BEFORE simplification,
                # at world coordinates without scale-up, so shapes
                # that would union exactly don't leave shards
                # (simplify_feature tile.cpp:633-643 →
                # coalesce_polygon(geom, false))
                ops, xy = dv.clean_poly_tile_scale(
                    ops, xy, try_scaling=False)
            nops, nxy = dv.simplify_lines(
                ops, xy, z, line_detail, mark_bounds,
                # the stop-early attempt only removes
                # collinearities (sf.simplification = 0,
                # tile.cpp:2268-2272)
                simplification,
                4 if t == 3 else 0,
                pn=pn, tx=tx, ty=ty,
                local_nodes=local_nodes or None,
                global_nodes=global_nodes,
                use_visvalingam=cfg.visvalingam,
            )
            if was_coalesced and pn:
                # extra pass to remove collinearities left at the
                # former corners between coalesced geometries
                # (simplify_feature tile.cpp:648-652)
                nops, nxy = dv.simplify_lines(
                    nops, nxy, z, line_detail, mark_bounds, 0.1,
                    4 if t == 3 else 0,
                    pn=pn, tx=tx, ty=ty,
                    local_nodes=local_nodes or None,
                    use_visvalingam=cfg.visvalingam,
                )
            if t != 3 or len(nops) >= 3:
                ops, xy = nops, nxy
    if t == 2 and cfg.reverse_lines:
        # -ar (tile.cpp:657-660 → reorder_lines
        # geometry.cpp:315-360): reverse a simple linestring
        # whose last point's spatial index precedes its first's
        ops, xy = dv.remove_noop(ops, xy, 2, 0)
        if (len(ops) > 0 and ops[0] == 1
                and bool((ops[1:] == 2).all())):
            if cfg.index_scheme == "hilbert":
                from ..functions.spatial import (
                    encode_hilbert as _enc_i,
                )
            else:
                from ..functions.spatial import (
                    encode_quadkey as _enc_i,
                )
            ends = _enc_i(
                (xy[[0, -1], 0] & 0xFFFFFFFF).astype(np.uint64),
                (xy[[0, -1], 1] & 0xFFFFFFFF).astype(np.uint64),
            )
            if int(ends[0]) > int(ends[1]):
                xy = xy[::-1].copy()
    xy = dv.to_tile_scale(xy, z, out_detail)
    if t == 3:
        b_ops, b_xy = ops, xy
        ops, xy = dv.clean_poly_tile_scale(ops, xy)
        if len(ops) < 3:
            if area > 0:
                ops, xy = dv.revive_polygon(b_ops, b_xy, area, z, out_detail)
            else:
                ops, xy = dv.empty_geom()
    return ops, xy


def _pack_geoms(metas, opss, xys):
    """Pack many small per-feature (ops, xy) arrays into three
    contiguous arrays + offsets — pickling thousands of tiny ndarrays
    costs ~30µs each, one big array costs ~nothing."""
    lens = np.array([len(o) for o in opss], np.int64)
    ops_cat = (np.concatenate(opss) if opss
               else np.empty(0, np.uint8)).astype(np.uint8, copy=False)
    xy_cat = (np.vstack(xys) if xys
              else np.empty((0, 2), np.int64)).astype(np.int64, copy=False)
    return metas, lens, ops_cat, xy_cat


def _unpack_geoms(packed):
    metas, lens, ops_cat, xy_cat = packed
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    for i, m in enumerate(metas):
        yield m, ops_cat[off[i]:off[i + 1]], xy_cat[off[i]:off[i + 1]]


@ray.remote
def _phase2_geom_chunk(cfg: VectorConfig, z, tx, ty, line_detail, out_detail,
                       packed, local_nodes, global_nodes, simplification,
                       do_enc=False):
    """One simplification-worker chunk over packed features
    ((pi, t, reduced, area, was_coalesced) + contiguous geometry) →
    packed results. With do_enc (no reorder/coalesce downstream) the
    chunk also runs the pure per-feature encode tail — remove_noop →
    ring split → MVT draw-command bytes — so only the stateful
    attribute pooling stays serial in the parent. The intra-chunk
    kernel memo dedupes repeated geometries; it is deliberately NOT
    shipped back — the retry pass re-parallelizes, so chunk deltas
    would never be read, only paid for in serialization."""
    pn = cfg.prevent_shared_nodes
    mark_bounds = not (cfg.prevent_clipping or cfg.prevent_duplication)
    dv.memo_install({})
    if do_enc:
        enc_out = []
        for (pi, t, reduced, area, was_coalesced), ops, xy in _unpack_geoms(packed):
            o, p = _phase2_geom(
                cfg, z, tx, ty, line_detail, out_detail, t, ops, xy,
                reduced, area, was_coalesced, pn, mark_bounds,
                local_nodes, global_nodes, simplification)
            o, p = dv.remove_noop(o, p, t, 0)
            gb = None
            ng = 0
            if len(o):
                parts = [p[i:j] for i, j in dv.rings(o)]
                if parts:
                    if t == 3:
                        gb = encode_polygon(parts)
                        ng = sum(len(q) + 1 for q in parts)
                    else:
                        gb = encode_linestring(parts)
                        ng = sum(len(q) for q in parts)
            enc_out.append((pi, gb, ng))
        dv.memo_install(None)
        return enc_out
    out_meta, out_ops, out_xy = [], [], []
    for (pi, t, reduced, area, was_coalesced), ops, xy in _unpack_geoms(packed):
        o, p = _phase2_geom(
            cfg, z, tx, ty, line_detail, out_detail, t, ops, xy, reduced,
            area, was_coalesced, pn, mark_bounds, local_nodes,
            global_nodes, simplification)
        out_meta.append(pi)
        out_ops.append(np.asarray(o, np.uint8))
        out_xy.append(np.asarray(p, np.int64).reshape(-1, 2))
    dv.memo_install(None)
    return _pack_geoms(out_meta, out_ops, out_xy)


def _encode_with_detail_ladder(cfg: VectorConfig, z, tx, ty, survivors,
                               global_nodes=None, est=None, attrs=None,
                               strat: dict | None = None, par_workers=0):
    """The write_tile detail loop (tile.cpp:1719-3079, no-strategy path):
    run reduce/simplify/scale/encode at line_detail = detail, and on
    byte overflow retry at line_detail-1 … min_detail (detail_reduced
    ladder). Feature overflow has no detail recourse in the reference
    (it exits suggesting a drop strategy) — we emit the over-limit tile
    with a warning instead of dying.

    Two phases mirroring write_tile: the read-loop scan (drop gates,
    -aP conversion, tiny-poly reduction, too-small cull, -pn edge-node
    accumulation into the tile-local shared set, tile.cpp:1748-2253)
    then the simplification workers + encode (tile.cpp:2287-2480,
    simplify_feature tile.cpp:595-665). Survivor tuples are
    (seq, t, ops, xy, (label_x, label_y), fmz[, edge_nodes])."""
    import warnings

    if z < cfg.minzoom or not survivors:
        return None
    if cfg.prefilter:
        survivors, attrs = _run_prefilter(cfg, z, tx, ty, survivors, attrs)
        if not survivors:
            return None
    if cfg.filter is not None:
        # -j/-J gate (tile.cpp:1231-1288): evaluated with $zoom = z for
        # every feature the scan would see — BEFORE the first-slot /
        # rate gates, so a filtered feature consumes nothing. Features
        # the explicit per-feature zoom gates exclude are never
        # evaluated (next_feature continues first) but stay in the
        # stream for the pending-minzoom leaf flag.
        from ..functions.filters import evaluate_feature

        _lmap = (attrs.get("__layers__", _EMPTY_DICT)
                 if attrs is not None else _EMPTY_DICT)
        kept_rows = []
        excl_by_seq: dict[int, set] = {}
        for row in survivors:
            seq_, t_, fmn_ = row[0], row[1], (row[6] if len(row) > 6 else -1)
            fmx_ = row[7] if len(row) > 7 else -1
            if (fmn_ >= 0 and z < fmn_) or (fmx_ >= 0 and z > fmx_):
                kept_rows.append(row)
                continue
            ent = attrs.get(seq_) if attrs is not None else None
            rows_ = ent[1] if ent else ()
            fid_ = ent[0] if ent else None
            ok, excl = evaluate_feature(
                cfg.filter, _lmap.get(seq_) or cfg.layer_name,
                rows_, t_, fid_, z)
            if not ok:
                continue
            if excl:
                excl_by_seq[seq_] = excl
            kept_rows.append(row)
        survivors = kept_rows
        if not survivors:
            return None
        if excl_by_seq and attrs is not None:
            # remove_attributes (tile.cpp:1286-1288), tile-locally
            attrs = dict(attrs)
            for seq_, excl in excl_by_seq.items():
                fid_, rows_ = attrs.get(seq_) or (None, ())
                attrs[seq_] = (fid_, [r for r in rows_ if r[0] not in excl])
    mts = None if cfg.no_size_limit else cfg.resolved_max_tile_size()
    # ---- as-needed strategy state (write_tile locals + entry params):
    # thresholds enter at the zoom's consensus values and only rise
    # locally within this tile's retry loop; rises are reported through
    # strat["out"] for the zoom driver's merge (tile.cpp:3506-3527).
    # The *_fraction values live across retries (tile.cpp:1666-1670).
    if strat is not None:
        s_gamma = float(strat.get("gamma", cfg.gamma))
        s_mingap = int(strat.get("mingap", 0))
        s_minextent = int(strat.get("minextent", 0))
        s_mindropseq = int(strat.get("mindrop_sequence", 0))
        s_minattr = float(
            strat.get(
                "minattribute",
                math.inf if cfg.drop_by_attribute_descending else -math.inf,
            )
        )
        f_mingap = f_minextent = f_mindropseq = f_minattr = 1.0
        out = strat.setdefault("out", {})
        feat_cap = cfg.max_tile_features if cfg.max_tile_features is not None else 200000
        if cfg.no_feature_limit:
            feat_cap = None  # -pf (tile.cpp:2222,2723)
        # -K cluster gap for this zoom (tile.cpp:1697)
        cluster_mingap = (
            ((1 << (32 - z)) // 256 * cfg.cluster_distance)
            * ((1 << (32 - z)) // 256 * cfg.cluster_distance)
        )
        desc = cfg.drop_by_attribute_descending
        # per-feature numeric value for --drop-by-attribute-as-needed
        # (find_attribute_value + the mvt numeric types, tile.cpp:2110-2130)
        attr_num: dict[int, float] = {}
        if cfg.drop_by_attribute and attrs is not None:
            attr_num = _numeric_attr_by_seq(attrs, cfg.drop_by_attribute)
        gap_of = (attrs or {}).get("__gap__", _EMPTY_DICT)
        ext_of = (attrs or {}).get("__extent__", _EMPTY_DICT)
        vix_of = (attrs or {}).get("__vindex__", _EMPTY_DICT)
    else:
        s_gamma = cfg.gamma
        feat_cap = None if cfg.no_feature_limit else cfg.max_tile_features
    trying_to_stop_early = False
    if (
        cfg.variable_depth and est is not None and mts is not None
        and not cfg.dropping()
        and not (strat is not None and _dropping_features(strat))
    ):
        # empirical size estimate from the input-stream byte count
        # (tile.cpp:1706-1713); only attempt a leaf tile when it looks
        # like it might fit and extra detail is actually available
        if 0.6693 * est - 3.36e4 < 0.9 * mts and 30 - z > cfg.detail:
            trying_to_stop_early = True
    # z == maxzoom -> full detail; below -> low_detail (tile.cpp:3206)
    base_detail = cfg.detail
    if z < cfg.maxzoom and cfg.low_detail is not None:
        base_detail = cfg.low_detail
    details = ([30 - z] if trying_to_stop_early else []) + [base_detail]
    if mts is not None:
        details += list(range(base_detail - 1, cfg.min_detail - 1, -1))
    feats: list = []
    pn = cfg.prevent_shared_nodes
    # tile-boundary nodes are imposed only when clipping/duplication is
    # on (simplify_feature tile.cpp:642-648)
    mark_bounds = not (cfg.prevent_clipping or cfg.prevent_duplication)
    from ..stages.tile_encode import encode_multipoint

    n_rate = n_tiny = 0
    n_gamma = n_need_d = n_need_c = 0
    over_size = 0
    over_feats = 0
    # fraction-active: precompute each feature's drop_sequence (a pure
    # function of (feature_minzoom, index), tile.cpp:859-864)
    dseq_of: dict[int, int] = {}
    if strat is not None and cfg.fraction_active():
        for row in survivors:
            sq_ = row[0]
            dseq_of[sq_] = _drop_sequence1(row[5], int(vix_of.get(sq_, 0)))
    gap_override = strat.get("_gap_override", _EMPTY_DICT) if strat else _EMPTY_DICT
    li = 0
    retries = 0
    _p2_gref = None  # lazily ray.put global_nodes for phase-2 chunks
    while li < len(details):
        line_detail = details[li]
        # --extra-detail: maxzoom tiles encode at the deeper grid while
        # still simplifying to line_detail (tile.cpp:2265-2285, worker
        # to_tile_scale at extra_detail tile.cpp:678-681)
        out_detail = line_detail
        if (cfg.extra_detail >= 0 and z == cfg.maxzoom
                and line_detail == cfg.detail):
            out_detail = min(cfg.extra_detail, 30 - z)
        feats = []
        accum_area = 0.0
        # per-attempt strategy counters (the final attempt's counts are
        # reported, like the reference re-inits `strategy` per pass)
        n_rate = n_tiny = 0
        # -at leaf validity: a leaf must carry FULL content, so any
        # rate-dropped feature clears can_stop_early (tile.cpp:1955)
        # and a feature excluded by a deeper explicit minzoom blocks
        # leafing (minzoom_feature_pending, tile.cpp:1220-1225)
        can_stop_early = True
        mz_pending = False
        pending: list = []  # phase-1 survivors ("features" list)
        local_nodes: set[tuple[int, int]] = set()
        # the per-layer first-feature slot (multiplier_state count
        # keyed by layername, tile.cpp:1294-1299): consumed by the
        # FIRST implicit-minzoom feature of each layer in the stream —
        # even one whose clipped geometry is empty (the "XXX should
        # continue" husk, tile.cpp:1205-1209) — but NOT by
        # explicit-minzoom features (tile.cpp:1290,1314)
        kept_slots: set = set()
        # (layer, type) -> most recent pending index — the
        # accumulate-onto search domain and target
        # (find_feature_to_accumulate_onto matches BOTH and returns
        # the most recently added, tile.cpp:1576-1590)
        pend_lt: dict = {}
        # pending index -> accumulated-attribute store {key: [vt, s]}
        acc_by_idx: dict[int, dict] = {}
        accum = dict(cfg.attribute_accum) if cfg.attribute_accum else None
        lmap = attrs.get("__layers__", _EMPTY_DICT) if attrs else _EMPTY_DICT
        # -ag density scan state (tile.cpp:2146-2157; manage_gap with
        # gamma fixed at 1): spacing is STICKY across the scan
        vmap = attrs.get("__vindex__", _EMPTY_DICT) if attrs else _EMPTY_DICT
        dens_by_idx: dict[int, int] = {}
        dens_prev = 0
        dens_gap = 0.0
        dens_spacing = 0.0
        dens_scale = float(1 << (64 - 2 * (z + 8)))
        # ---- per-attempt strategy scan state (declared inside the
        # detail loop in the reference, tile.cpp:1722-1752)
        n_gamma = n_need_d = n_need_c = 0
        gamma_state = [0, 0.0]  # manage_gap previndex/gap
        merge_previndex = 0
        extent_previndex = 0
        coalesced_area = 0.0
        scan_seq = 0  # the write_tile read-loop counter (next_feature returns)
        gaps_s = _Samples()
        extents_s = _Samples()
        dseqs_s = _Samples()
        attrs_s = _Samples()
        too_many_bytes = False
        too_many_features = False
        skipped = 0
        kept = 0
        lead_count = 0
        other_count = 0
        pend_lname: list = []  # layer name per pending entry
        pend_extent: list = []  # serial extent per pending entry
        pend_cluster: list = []  # clustered count per pending entry
        pend_coalesced: list = []  # coalesced flag per pending entry
        pend_first: list = []  # multiplier-cluster lead flag per entry
        pend_seq: list = []  # input seq per pending entry (sequence tags)
        # --retain-points-multiplier scan state (multiplier_state +
        # next_feature_state, tile.cpp:1866-1870, per detail attempt):
        # per-layer rate-run counter, the last not-dropped index, the
        # per-layer current cluster size at the appended end, and
        # drop_rest (a dropped lead drags its cluster down,
        # tile.cpp:1867,1953)
        m_mult = cfg.retain_points_multiplier
        mult_count: dict = {}
        prev_not_dropped = 0
        layer_csize: dict = {}
        drop_rest = False
        ordering = bool(cfg.preserve_input_order or cfg.order_by)
        ord_dseq: dict = {}  # seq -> drop_sequence (cluster tail sort)
        ord_ext: dict = {}  # seq -> serial extent (ORDER_BY_SIZE)
        if m_mult > 1:
            try:
                extra_mz = math.log(m_mult) / math.log(cfg.droprate)
            except (ValueError, ZeroDivisionError):
                extra_mz = math.inf
        else:
            extra_mz = 0.0

        def _fold_onto(ti: int, d_seq: int):
            """preserve_attributes (tile.cpp:1544-1569): fold the
            dropped feature's accumulate-attributes onto pending[ti]."""
            if not accum or attrs is None:
                return
            ent = attrs.get(d_seq)
            d_rows = ent[1] if ent else ()
            acc = acc_by_idx.get(ti)
            if acc is None:
                acc = acc_by_idx[ti] = {}
            t_seq = pending[ti][0]
            t_ent = attrs.get(t_seq)
            t_rows = {r[0]: r for r in (t_ent[1] if t_ent else ())}
            for k, vt_d, s_d in d_rows:
                if k not in accum or vt_d == "null":
                    continue
                if (k not in acc and k in t_rows
                        and t_rows[k][1] != "null"):
                    # promote: seed from the target's own value
                    # (tile.cpp:1465-1484)
                    acc[k] = [t_rows[k][1], t_rows[k][2]]
                _accumulate_attr(acc, accum[k], k, vt_d, s_d)

        layer_npend: dict = {}

        def _account_append(lname, dropped):
            """The append block (tile.cpp:2186-2250): the over-limit
            early exit against the (multiplier-inflated) caps with the
            (skip-extrapolated) feature count, then the first-in-layer
            revival and the multiplier-cluster accounting. Returns the
            (possibly revived) dropped state, or None to skip."""
            nonlocal skipped, kept, lead_count, other_count
            nonlocal too_many_bytes, too_many_features
            adj_ms = mts
            adj_mf = feat_cap
            if lead_count > 0:
                if adj_ms is not None:
                    adj_ms = adj_ms * (lead_count + other_count) // lead_count
                if adj_mf is not None:
                    adj_mf = adj_mf * (lead_count + other_count) // lead_count
            afc = lead_count + other_count
            if kept > 0:
                afc = afc * (skipped + kept) // kept
            if too_many_bytes or (adj_ms is not None and afc > adj_ms):
                # every feature is at least one output byte
                skipped += 1
                too_many_bytes = True
                return None
            if too_many_features or (adj_mf is not None and afc > adj_mf):
                skipped += 1
                too_many_features = True
                return None
            kept += 1
            # the first feature appended to a layer is always kept —
            # the nominal first may have clipped away (tile.cpp:2228-2236)
            n_in_layer = layer_npend.get(lname, 0)
            layer_npend[lname] = n_in_layer + 1
            if n_in_layer == 0:
                dropped = 0
            if dropped == 0:
                layer_csize[lname] = 1
                lead_count += 1
            elif dropped == _ADDED_FOR_DENSITY:
                other_count += 1
            else:
                layer_csize[lname] = layer_csize.get(lname, 0) + 1
                other_count += 1
            return dropped

        for row in survivors:
            seq, t, ops, xy, lab, fmz = row[:6]
            fmn = row[6] if len(row) > 6 else -1
            fmx = row[7] if len(row) > 7 else -1
            enodes = row[8] if len(row) > 8 else ()
            if fmn >= 0 and z < fmn:
                # explicit per-feature minzoom (tile.cpp:1220-1225): the
                # excluded feature belongs to a deeper zoom, so this
                # tile cannot leaf the pyramid
                mz_pending = True
                continue
            if fmx >= 0 and z > fmx:
                # explicit per-feature maxzoom (tile.cpp:1307-1316)
                continue
            # the write_tile read-loop counter: every feature
            # next_feature RETURNS consumes one (the explicit-zoom
            # gates above skip inside next_feature and do not)
            my_seq = scan_seq
            scan_seq += 1
            if strat is not None:
                vix = int(vix_of.get(seq, 0))
                sf_gap = int(gap_override.get(seq, gap_of.get(seq, 0)))
                sf_extent = int(ext_of.get(seq, 0))
                if t == 1:
                    # VT_POINT extent from spacing to the previous
                    # point's index (tile.cpp:1896-1908); sf.extent is a
                    # long long, so the πr² double truncates on store
                    if extent_previndex >= vix:
                        sf_extent = 1
                    else:
                        radius = math.sqrt(vix - extent_previndex) / 4.0
                        sf_extent = int(math.pi * radius * radius)
                        if sf_extent < 1:
                            sf_extent = 1
                    extent_previndex = vix
                if ordering:
                    ord_dseq[seq] = _drop_sequence1(fmz, vix)
                    ord_ext[seq] = sf_extent
            lname = lmap.get(seq)
            # serial_feature.dropped derivation (next_feature
            # tile.cpp:1290-1319): the per-layer first-feature slot, the
            # rate ladder, the multiplier run counter, and the
            # --preserve-multiplier-density-threshold revival; explicit
            # per-feature minzoom features are always KEPT
            dropped = 0
            if fmn < 0:
                dropped = -1
                if lname not in kept_slots:
                    kept_slots.add(lname)  # first in layer: FEATURE_KEPT
                    mult_count[lname] = 0
                    dropped = 0
                if dropped == 0 or fmz <= z:
                    mult_count[lname] = 0
                    dropped = 0
                elif m_mult > 1:
                    # fractional feature_minzoom (tile.cpp:1163): the
                    # serialized integer minus a bit-reversed jitter
                    from ..stages.strategies import bit_reverse as _brev

                    frac = float(
                        _brev(np.array([vix >> 2], np.uint64))[0]
                    ) / 18446744073709551616.0
                    cn = mult_count.get(lname, 0)
                    if z + extra_mz >= fmz - frac and cn + 1 < m_mult:
                        mult_count[lname] = cn + 1
                        dropped = cn + 1
                    elif cfg.preserve_multiplier_density > 0 and (
                        (vix - prev_not_dropped) & _U64
                        > ((1 << (32 - z)) // cfg.preserve_multiplier_density)
                        ** 2
                    ):
                        dropped = _ADDED_FOR_DENSITY
            if m_mult > 1 and dropped != -1:
                prev_not_dropped = vix  # tile.cpp:1317-1319
            # the write_tile state block (tile.cpp:1950-1978): a kept
            # lead starts a new cluster; anything else invalidates the
            # leaf, and an ordinal member of an already-full cluster is
            # demoted to dropped
            if dropped == 0:
                drop_rest = False
            else:
                can_stop_early = False
                if dropped not in (-1, _ADDED_FOR_DENSITY):
                    if layer_csize.get(lname, 0) >= m_mult:
                        dropped = -1
            if dropped == -1 or drop_rest:
                # the drop happens only with a previous same-layer
                # SAME-TYPE feature in the appended list to accumulate
                # onto (-aP converts before the gate, so polygons gate
                # as points, tile.cpp:1916-1919); otherwise the feature
                # falls through and is appended-and-emitted — the first
                # APPENDED feature of the tile is always kept
                # (tile.cpp:2228-2236 revival after a husk consumed the
                # nominal first slot)
                gate_t = 1 if (t == 3 and cfg.generate_label_points) else t
                ti = pend_lt.get((lname, gate_t))
                if ti is not None:
                    # fold accumulate-attributes onto the target
                    # (preserve_attributes, tile.cpp:1972); nulls are
                    # already gone by this point in the reference scan
                    # (tile.cpp:1322-1330)
                    _fold_onto(ti, seq)
                    n_rate += 1  # strategy.dropped_by_rate tile.cpp:1973
                    can_stop_early = False
                    continue
            rate_dropped = dropped != 0
            if strat is not None and dropped == 0:
                # -- the gamma / -K / as-needed gate chain
                # (tile.cpp:1981-2144): only FEATURE_KEPT (lead)
                # features reach it; a rate-dropped feature that found
                # no accumulate target above stays FEATURE_DROPPED and
                # skips the gates. drop_rest is inert without
                # --retain-points-multiplier (every kept feature resets
                # it before any gate could consult it).
                gate_t = 1 if (t == 3 and cfg.generate_label_points) else t

                def _try_drop() -> bool:
                    # drop_feature_unless_it_can_be_added_to_a_
                    # multiplier_cluster (tile.cpp:1639-1662): without a
                    # same-layer same-type target the feature is KEPT;
                    # with capacity in the current cluster it is
                    # CONVERTED to a secondary member instead of dropped
                    nonlocal n_need_d, dropped, drop_rest
                    ti2 = pend_lt.get((lname, gate_t))
                    if ti2 is None:
                        return False
                    n_need_d += 1  # strategy.dropped_as_needed
                    if layer_csize.get(lname, 0) < m_mult:
                        dropped = layer_csize.get(lname, 0) + 1
                        return False
                    _fold_onto(ti2, seq)
                    drop_rest = True
                    return True

                def _coalesce_onto(ti2: int):
                    # coalesce_geometry (tile.cpp:1613-1632) + flags
                    nonlocal n_need_c
                    m = pending[ti2]
                    if m[2] is None:
                        # -aP anchor target: geometry rows are
                        # pre-scaled anchors; appending raw clipped
                        # geometry is not meaningful — skip the merge
                        # but still fold attributes (unsupported combo)
                        pass
                    else:
                        m[2] = np.concatenate([m[2], ops])
                        m[3] = np.concatenate([m[3], xy])
                    pend_coalesced[ti2] = True
                    _fold_onto(ti2, seq)
                    n_need_c += 1  # strategy.coalesced_as_needed

                dropped_here = False
                if s_gamma > 0:
                    if _manage_gap(vix, gamma_state, dens_scale, s_gamma):
                        ti2 = pend_lt.get((lname, gate_t))
                        if ti2 is not None:
                            _fold_onto(ti2, seq)
                            n_gamma += 1  # strategy.dropped_by_gamma
                            drop_rest = True
                            can_stop_early = False
                            dropped_here = True
                if not dropped_here:
                    if z <= cfg.cluster_maxzoom and cfg.cluster_distance != 0:
                        # -K cluster scan (tile.cpp:1993-2019): compares
                        # against the last KEPT feature's index
                        if vix < merge_previndex or vix - merge_previndex < cluster_mingap:
                            ti2 = pend_lt.get((lname, gate_t))
                            if ti2 is not None:
                                pend_cluster[ti2] += 1
                                m = pending[ti2]
                                if (not cfg.keep_point_cluster_position
                                        and m[1] == 1 and m[2] is not None
                                        and len(m[2]) == 1 and len(ops) == 1):
                                    c = pend_cluster[ti2]
                                    ax = float(m[3][0, 0]) * c + float(xy[0, 0])
                                    ay = float(m[3][0, 1]) * c + float(xy[0, 1])
                                    m[3] = np.array(
                                        [[int(ax / (c + 1)), int(ay / (c + 1))]],
                                        np.int64)
                                _fold_onto(ti2, seq)
                                n_need_c += 1
                                drop_rest = True
                                can_stop_early = False
                                dropped_here = True
                    elif cfg.drop_densest:
                        gaps_s.add(sf_gap, my_seq)
                        if sf_gap < s_mingap:
                            can_stop_early = False
                            dropped_here = _try_drop()
                    elif z <= cfg.cluster_maxzoom and cfg.cluster_densest:
                        # like coalesce-densest but averaging positions
                        # (tile.cpp:2028-2050)
                        gaps_s.add(sf_gap, my_seq)
                        if sf_gap < s_mingap:
                            ti2 = pend_lt.get((lname, gate_t))
                            if ti2 is not None:
                                pend_cluster[ti2] += 1
                                m = pending[ti2]
                                if (m[1] == 1 and m[2] is not None
                                        and len(m[2]) == 1 and len(ops) == 1):
                                    c = pend_cluster[ti2]
                                    ax = float(m[3][0, 0]) * c + float(xy[0, 0])
                                    ay = float(m[3][0, 1]) * c + float(xy[0, 1])
                                    m[3] = np.array(
                                        [[int(ax / (c + 1)), int(ay / (c + 1))]],
                                        np.int64)
                                _fold_onto(ti2, seq)
                                n_need_c += 1
                                drop_rest = True
                                dropped_here = True
                    elif cfg.coalesce_densest:
                        gaps_s.add(sf_gap, my_seq)
                        if sf_gap < s_mingap:
                            ti2 = pend_lt.get((lname, gate_t))
                            if ti2 is not None:
                                if t == 1 or not dv.line_is_too_small(
                                        ops, xy, z, line_detail):
                                    _coalesce_onto(ti2)
                                else:
                                    pend_coalesced[ti2] = True
                                    _fold_onto(ti2, seq)
                                    n_need_c += 1
                                coalesced_area += sf_extent
                                drop_rest = True
                                can_stop_early = False
                                dropped_here = True
                    elif cfg.drop_smallest:
                        extents_s.add(sf_extent, my_seq)
                        # the reference compares in C doubles (extent is
                        # long long, coalesced_area double, tile.cpp:2069)
                        # so LLONG_MAX promotes to 2^63 on BOTH sides and
                        # the clamped max extent still gates; Python's
                        # exact float-vs-int compare would say 2^63 >
                        # LLONG_MAX and KEEP it (flag-fuzzer find)
                        if s_minextent != 0 and (
                                sf_extent + coalesced_area <= float(s_minextent)):
                            can_stop_early = False
                            dropped_here = _try_drop()
                    elif cfg.coalesce_smallest:
                        extents_s.add(sf_extent, my_seq)
                        if s_minextent != 0 and (
                                sf_extent + coalesced_area <= float(s_minextent)):
                            ti2 = _find_small_target(
                                pending, pend_lname, pend_extent, lname,
                                gate_t, s_minextent)
                            if ti2 is not None:
                                if t == 1 or not dv.line_is_too_small(
                                        ops, xy, z, line_detail):
                                    _coalesce_onto(ti2)
                                else:
                                    pend_coalesced[ti2] = True
                                    _fold_onto(ti2, seq)
                                    n_need_c += 1
                                coalesced_area += sf_extent
                                drop_rest = True
                                can_stop_early = False
                                dropped_here = True
                    elif cfg.drop_fraction or cfg.dynamic_drop:
                        dsq = dseq_of.get(seq, 0)
                        dseqs_s.add(dsq, my_seq)
                        if s_mindropseq != 0 and dsq <= s_mindropseq:
                            can_stop_early = False
                            dropped_here = _try_drop()
                    elif cfg.coalesce_fraction:
                        dsq = dseq_of.get(seq, 0)
                        dseqs_s.add(dsq, my_seq)
                        if s_mindropseq != 0 and dsq <= s_mindropseq:
                            ti2 = pend_lt.get((lname, gate_t))
                            if ti2 is not None:
                                if t == 1 or not dv.line_is_too_small(
                                        ops, xy, z, line_detail):
                                    _coalesce_onto(ti2)
                                else:
                                    pend_coalesced[ti2] = True
                                    _fold_onto(ti2, seq)
                                    n_need_c += 1
                                drop_rest = True
                                can_stop_early = False
                                dropped_here = True
                    elif cfg.drop_by_attribute:
                        av = attr_num.get(seq)
                        if av is not None:
                            attrs_s.add(av, my_seq)
                            should = (av > s_minattr) if desc else (av < s_minattr)
                            if should and math.isfinite(s_minattr):
                                can_stop_early = False
                                dropped_here = _try_drop()
                if dropped_here:
                    continue
            if cfg.calculate_density:
                vix = int(vmap.get(seq, 0))
                o_prev = dens_prev
                # inline manage_gap(gamma=1) (tile.cpp:720-753)
                dropd = False
                if dens_gap > 0:
                    if vix == dens_prev:
                        dropd = True
                    elif vix < dens_prev or math.exp(math.log(
                            (vix - dens_prev) / dens_scale)) >= dens_gap:
                        # exp(log(x)*gamma) with gamma=1 — kept verbatim
                        # because the round trip is not exact and the
                        # boundary flips matter (manage_gap
                        # tile.cpp:727)
                        dens_gap = 0.0
                    else:
                        dropd = True
                elif vix >= dens_prev:
                    gg = (vix - dens_prev) / dens_scale
                    if gg == 0:
                        dropd = True
                    elif gg < 1:
                        dens_gap = gg
                        dropd = True
                    else:
                        dens_gap = 0.0
                if not dropd:
                    dens_prev = vix
                    dens_spacing = (vix - o_prev) / dens_scale
            if t == 3 and cfg.generate_label_points:
                # polygon -> checkerboard anchor points
                # (tile.cpp:1919-1937); excluded when invisibly small.
                # Runs in the read loop, so -pn sees only the edge
                # nodes accumulated SO FAR and no global map
                # (tile.cpp:1928 passes shared_nodes, NULL)
                _apdbg = _os_env.get("TPR_AP_DEBUG") and z == 0
                if _apdbg:
                    np.save(f"/tmp/ap_z0_seq{seq}_preops.npy", ops)
                    np.save(f"/tmp/ap_z0_seq{seq}_prexy.npy", xy)
                if dv.line_is_too_small(ops, xy, z, line_detail):
                    if _apdbg:
                        import sys as _s
                        print(f"[aP] seq={seq} too-small", file=_s.stderr)
                    continue
                if dv.get_mp_area(ops, xy) <= 0:
                    if _apdbg:
                        import sys as _s
                        print(f"[aP] seq={seq} area<=0", file=_s.stderr)
                    continue
                nops, nxy = dv.simplify_lines(
                    ops, xy, z, line_detail, mark_bounds,
                    cfg.resolved_simplification(z), 4,
                    pn=pn, tx=tx, ty=ty, local_nodes=local_nodes or None,
                    use_visvalingam=cfg.visvalingam,
                )
                if len(nops) == 0:
                    continue
                anchors = dv.checkerboard_anchors(
                    nops, nxy, tx, ty, z, lab[0], lab[1]
                )
                if _apdbg:
                    import sys as _s
                    print(f"[aP] seq={seq} anchors={len(anchors) if anchors else 0} lab={lab} "
                          f"nops={len(nops)} pre={len(ops)} anch={anchors}", file=_s.stderr)
                    np.save(f"/tmp/ap_z0_seq{seq}_ops.npy", nops)
                    np.save(f"/tmp/ap_z0_seq{seq}_xy.npy", nxy)
                if not anchors:
                    continue
                pts = np.array(anchors, dtype=np.int64).reshape(-1, 2)
                pts = dv.to_tile_scale(pts, z, out_detail)
                # remove_noop for points: dedupe identical consecutive
                keep = np.ones(len(pts), bool)
                keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
                pts = pts[keep]
                if strat is not None:
                    upd = _account_append(lname, dropped)
                    if upd is None:
                        merge_previndex = vix
                        coalesced_area = 0.0
                        continue
                    dropped = upd
                pend_lt[(lname, 1)] = len(pending)
                if cfg.calculate_density:
                    dens_by_idx[len(pending)] = _glow(dens_spacing)
                pending.append([seq, 1, None, pts, False, 0.0])
                pend_lname.append(lname)
                pend_extent.append(sf_extent if strat is not None else 0)
                pend_cluster.append(0)
                pend_coalesced.append(False)
                pend_first.append(dropped == 0 and m_mult > 1)
                pend_seq.append(seq)
                if strat is not None:
                    merge_previndex = vix
                    coalesced_area = 0.0
                continue
            reduced = False
            prevent_tiny = cfg.no_tiny_poly or (
                cfg.no_tiny_poly_maxzoom and z == cfg.maxzoom)
            if t == 3 and not cfg.grid_low_zooms and not prevent_tiny:
                ops, xy, still, _red, accum_area = dv.reduce_tiny_poly(
                    ops, xy, z, line_detail, accum_area, cfg.tiny_polygon_size
                )
                if _red:
                    n_tiny += 1  # strategy.tiny_polygons tile.cpp:2168
                if len(ops) == 0:
                    continue
                reduced = not still
            if t in (2, 3) and dv.line_is_too_small(ops, xy, z, line_detail):
                continue
            if len(xy) == 0:
                # empty husk (clip emptied inside the quick-check bbox):
                # stays in the stream — it consumed the first-slot above
                # — but never joins the appended list (tile.cpp:2188);
                # it still reaches the loop bottom (merge_previndex
                # update + coalesced_area reset, tile.cpp:2311-2312)
                if strat is not None:
                    merge_previndex = vix
                    coalesced_area = 0.0
                continue
            if strat is not None:
                upd = _account_append(lname, dropped)
                if upd is None:
                    merge_previndex = vix
                    coalesced_area = 0.0
                    continue
                dropped = upd
            if pn and enodes:
                local_nodes.update(enodes)  # tile.cpp:2252-2254
            area = dv.get_mp_area(ops, xy) if t == 3 else 0.0
            pend_lt[(lname, t)] = len(pending)
            if cfg.calculate_density:
                dens_by_idx[len(pending)] = _glow(dens_spacing)
            pending.append([seq, t, ops, xy, reduced, area])
            pend_lname.append(lname)
            pend_extent.append(sf_extent if strat is not None else 0)
            pend_cluster.append(0)
            pend_coalesced.append(False)
            pend_first.append(dropped == 0 and m_mult > 1)
            pend_seq.append(seq)
            if strat is not None:
                merge_previndex = vix
                coalesced_area = 0.0
        # phase 2: simplification workers + encode
        # (simplify_feature tile.cpp:595-665)
        if cfg.detect_shared_borders:
            # arc pass over every polygon of the tile, across layers
            # (find_common_edges, tile.cpp:2463-2465); the revive area
            # is then taken from the REWRITTEN geometry, because the
            # reference computes it inside simplify_feature
            # (tile.cpp:606-609), which runs after this pass
            from ..functions import shared_borders as _sb

            _polys = [pi for pi, e in enumerate(pending)
                      if e[1] == 3 and e[2] is not None]
            if _polys:
                _new = _sb.find_common_edges(
                    [(pending[pi][2], pending[pi][3]) for pi in _polys],
                    z, line_detail, cfg.resolved_simplification(z),
                    skip_simplify=(
                        cfg.no_simplify
                        or (z == cfg.maxzoom and cfg.simplify_only_low)
                        or (z < cfg.maxzoom and cfg.grid_low_zooms)),
                    mark_bounds=mark_bounds,
                    use_visvalingam=cfg.visvalingam,
                    # the global -pn flag reaches the arc DP's retain
                    # accounting even with empty node lists
                    # (geometry.cpp:298, clip.cpp:924-928)
                    pn=pn,
                )
                for pi, (nops, nxy) in zip(_polys, _new):
                    pending[pi][2] = nops
                    pending[pi][3] = nxy
                    pending[pi][5] = dv.get_mp_area(nops, nxy)
        do_rc = cfg.reorder or cfg.coalesce
        # per-layer input-order sequence tags for the multiplier
        # (tile.cpp:2395-2415): rank of each feature's seq within its
        # layer, stable
        mseq_by_idx: dict[int, int] = {}
        if m_mult > 1:
            _by_l: dict = {}
            for pi in range(len(pending)):
                _by_l.setdefault(pend_lname[pi], []).append(pi)
            for _lst in _by_l.values():
                for rank, oi in enumerate(
                        sorted(range(len(_lst)), key=lambda i: pend_seq[_lst[i]])):
                    mseq_by_idx[_lst[oi]] = rank
        post: list = []  # worker-complete features for reorder/coalesce
        # in-tile simplification workers (tile.cpp:2287-2480 runs this
        # same chain across threads): on parallelism-starved zooms fan
        # the pure per-feature geometry chain out to Ray subtasks.
        # Deadlock-safety invariant: callers only set par_workers > 1
        # when the zoom has fewer tiles than cpus/2, so the parents
        # blocked in ray.get() can never hold every CPU — at least
        # half the cluster stays free for the chunks to schedule on.
        par_geom = None
        par_enc = None
        if par_workers > 1:
            _elig = [(pi, p[1], p[4], p[5], pend_coalesced[pi])
                     for pi, p in enumerate(pending) if p[1] != 1]
            if len(_elig) >= 256:
                _simp = (0.0 if (trying_to_stop_early
                                 and line_detail == details[0])
                         else cfg.resolved_simplification(z))
                if global_nodes is not None and _p2_gref is None:
                    _p2_gref = ray.put(global_nodes)
                nch = min(par_workers, max(1, len(_elig) // 32))
                refs = [
                    _phase2_geom_chunk.remote(
                        cfg, z, tx, ty, line_detail, out_detail,
                        _pack_geoms(
                            _elig[ci::nch],
                            [pending[m[0]][2] for m in _elig[ci::nch]],
                            [pending[m[0]][3] for m in _elig[ci::nch]]),
                        local_nodes or None, _p2_gref, _simp,
                        do_enc=not do_rc)
                    for ci in range(nch)
                ]
                if do_rc:
                    par_geom = {}
                    for packed in ray.get(refs):
                        for pi_, o_, p_ in _unpack_geoms(packed):
                            par_geom[pi_] = (o_, p_)
                else:
                    par_enc = {}
                    for chunk_out in ray.get(refs):
                        for pi_, gb_, ng_ in chunk_out:
                            par_enc[pi_] = (gb_, ng_)
        for pi, (seq, t, ops, xy, reduced, area) in enumerate(pending):
            acc = acc_by_idx.get(pi)
            glow = dens_by_idx.get(pi)
            clu = pend_cluster[pi]
            was_coalesced = pend_coalesced[pi]
            mfirst = pend_first[pi]
            mseq = mseq_by_idx.get(pi)
            if t == 1:
                if ops is not None:
                    # ingested point feature (world coords); -aP anchor
                    # rows (ops None) arrive pre-scaled
                    xy = dv.to_tile_scale(xy, z, out_detail)
                    ops, xy = dv.remove_noop(ops, xy, 1, 0)
                    if len(ops) == 0:
                        continue
                elif do_rc:
                    ops = np.ones(len(xy), np.uint8)
                if do_rc:
                    post.append([seq, 1, ops, xy, acc, glow, False, clu,
                                 mfirst, mseq])
                else:
                    f_ = _mk_feat(encode_multipoint(xy), 1, seq,
                                  attrs, acc, glow, clu, mfirst, mseq)
                    f_["_ngeom"] = len(xy)
                    feats.append(f_)
                continue
            if par_enc is not None and pi in par_enc:
                gb, ng = par_enc[pi]
                if gb is None:
                    continue
                f_ = _mk_feat(gb, t, seq, attrs, acc, glow, clu, mfirst,
                              mseq)
                f_["_ngeom"] = ng
                feats.append(f_)
                continue
            if par_geom is not None and pi in par_geom:
                ops, xy = par_geom[pi]
            else:
                ops, xy = _phase2_geom(
                    cfg, z, tx, ty, line_detail, out_detail, t, ops, xy,
                    reduced, area, was_coalesced, pn, mark_bounds,
                    local_nodes, global_nodes,
                    0.0 if (trying_to_stop_early
                            and line_detail == details[0])
                    else cfg.resolved_simplification(z),
                )
            if do_rc:
                # worker-end state: reorder/coalesce sit between the
                # simplification workers and the final cleanup
                # (tile.cpp:2518-2580)
                post.append([seq, t, ops, xy, acc, glow, False, clu,
                             mfirst, mseq])
                continue
            ops, xy = dv.remove_noop(ops, xy, t, 0)
            if len(ops) == 0:
                continue
            parts = [xy[i:j] for i, j in dv.rings(ops)]
            if not parts:
                continue
            if t == 3:
                f_ = _mk_feat(encode_polygon(parts), 3, seq, attrs,
                              acc, glow, clu, mfirst, mseq)
                f_["_ngeom"] = sum(len(p) + 1 for p in parts)
            else:
                f_ = _mk_feat(encode_linestring(parts), 2, seq, attrs,
                              acc, glow, clu, mfirst, mseq)
                f_["_ngeom"] = sum(len(p) for p in parts)
            feats.append(f_)
        if do_rc and post:
            _vix_map = (attrs or {}).get("__vindex__", _EMPTY_DICT)

            def _ckey(e):
                seq_, t_ = e[0], e[1]
                ent = attrs.get(seq_) if attrs else None
                fid = ent[0] if ent else None
                rows = ent[1] if ent else ()
                extra = []
                if e[9] is not None:
                    extra.append((
                        "tippecanoe:retain_points_multiplier_sequence",
                        "double", str(e[9])))
                if e[7]:
                    extra.extend(_cluster_attr_rows(e[7]))
                return _coal_key(t_, fid, rows, e[4], tuple(extra))

            def _ckey_ordered_of(pos: int, e):
                # coalindexcmp (tile.cpp:173-200): attribute key, then
                # the spatial index — the worker assigns index=stream
                # position when a feature has none (tile.cpp:707-709),
                # so without index-bearing modes the tiebreak is stream
                # order, but with -K the features carry REAL bbox
                # indexes and cluster leads are not in stream order
                # (flag-fuzzer find: lines -z4 -K50 -ao). The geometry
                # tiebreak only fires on duplicate real indexes.
                vix = int(_vix_map.get(e[0], 0))
                return (_ckey(e), vix if vix else pos)

            if cfg.reorder:
                # stable sort by coalcmp; the index tiebreak
                # (coalindexcmp tile.cpp:173-200) compares stream
                # POSITION for features without a spatial index (the
                # worker assigns index=i when 0, tile.cpp:707-709), so
                # equal-attribute features keep stream order — the
                # geometry tiebreak only fires for duplicate real
                # indexes, which cannot happen without drop flags
                keys_ = [_ckey_ordered_of(i, e) for i, e in enumerate(post)]
                post = [post[i] for i in
                        sorted(range(len(post)), key=lambda i: keys_[i])]
            if cfg.coalesce:
                merged: list = []
                for e in post:
                    if merged and _ckey(merged[-1]) == _ckey(e)                             and merged[-1][1] == e[1]:
                        m = merged[-1]
                        m[2] = np.concatenate([m[2], e[2]])
                        m[3] = np.concatenate([m[3], e[3]])
                        m[6] = True  # coalesced
                    else:
                        merged.append(e)
                post = merged
            for seq, t, ops, xy, acc, glow, coalesced, clu, mfirst, mseq in post:
                if coalesced and t == 2:
                    # cleanup: re-simplify coalesced linestrings at
                    # tile scale (z=32 detail=0, tile.cpp:2556-2562) —
                    # but not under -ps / -pS-at-maxzoom
                    ops, xy = dv.remove_noop(ops, xy, t, 0)
                    if not (cfg.no_simplify
                            or (z == cfg.maxzoom and cfg.simplify_only_low)):
                        ops, xy = dv.simplify_lines(
                            ops, xy, 32, 0, mark_bounds,
                            cfg.resolved_simplification(z), 0,
                            use_visvalingam=cfg.visvalingam,
                        )
                if t == 3:
                    if coalesced:
                        # re-clean the unioned polygon (tile.cpp:2566-2570)
                        ops, xy = dv.clean_poly_tile_scale(ops, xy)
                    if len(ops) == 0:
                        continue
                if t in (2, 3):
                    ops, xy = dv.remove_noop(ops, xy, t, 0)
                if len(ops) == 0:
                    continue
                if t == 1:
                    f_ = _mk_feat(encode_multipoint(xy), 1, seq,
                                  attrs, acc, glow, clu, mfirst, mseq)
                    f_["_ngeom"] = len(xy)
                    feats.append(f_)
                    continue
                parts = [xy[i:j] for i, j in dv.rings(ops)]
                if not parts:
                    continue
                if t == 3:
                    f_ = _mk_feat(encode_polygon(parts), 3, seq,
                                  attrs, acc, glow, clu, mfirst, mseq)
                    # drawvec entries: ring vertices (incl. the closing
                    # duplicate) + one closepath per ring
                    f_["_ngeom"] = sum(len(p) + 1 for p in parts)
                else:
                    f_ = _mk_feat(encode_linestring(parts), 2, seq,
                                  attrs, acc, glow, clu, mfirst, mseq)
                    f_["_ngeom"] = sum(len(p) for p in parts)
                feats.append(f_)
        def _row(nf, tb, leafed, detail_drop):
            return {"z": z, "x": tx, "y": ty, "n_features": nf,
                    # the reference's write_tile return value: total
                    # drawvec entries of the written features — the
                    # metadata midpoint ranks maxzoom tiles by it
                    # (tile.cpp:2640, 3214-3229)
                    "n_geom": sum(f.get("_ngeom", 1) for f in feats) if nf
                              else 0,
                    "tile": tb, "leafed": leafed,
                    "s_rate": n_rate, "s_tiny": n_tiny,
                    "s_detail": detail_drop,
                    "s_tsize": over_size, "s_fcount": over_feats,
                    "s_gamma": n_gamma, "s_need_d": n_need_d,
                    "s_need_c": n_need_c}

        if not feats:
            if (n_rate or n_tiny or over_size or over_feats or n_gamma
                    or n_need_d or n_need_c):
                # counter-only phantom row: the reference counts tiny/
                # rate drops even when the tile ends up unwritten
                # (write_tile accumulates `strategy` before deciding);
                # filtered from every tile consumer by n_features == 0
                return _row(0, b"", 0, 0)
            return None
        # layer partitioning is needed both for the encode and for the
        # fraction-gate condition feature_count > layers.size()
        by_layer: dict[str, list] = {}
        for f in feats:
            by_layer.setdefault(f.pop("layer", None) or cfg.layer_name,
                                []).append(f)
        if ordering:
            # per-tile orderings over whole multiplier clusters
            # (tile.cpp:2583-2593): -pi first, then --order-by; each is
            # its own assemble → stable sort → disassemble round
            import functools

            vm_ = vmap

            def _ordcmp(ca, cb):
                fa, fb = ca[0], cb[0]
                for name, desc_ in cfg.order_by:
                    va = _order_value(fa.get("attrs_sv"), name,
                                      ord_ext.get(fa["_seq"], 0))
                    vb = _order_value(fb.get("attrs_sv"), name,
                                      ord_ext.get(fb["_seq"], 0))
                    if desc_:
                        if vb < va:
                            return -1
                        if va < vb:
                            return 1
                    else:
                        if va < vb:
                            return -1
                        if vb < va:
                            return 1
                ia = vm_.get(fa["_seq"], 0)
                ib = vm_.get(fb["_seq"], 0)
                return -1 if ia < ib else 0

            for nm in by_layer:
                lst = by_layer[nm]
                if cfg.preserve_input_order:
                    clusters = _assemble_clusters(lst, m_mult)
                    clusters.sort(key=lambda c: c[0]["_seq"])
                    lst = _disassemble_clusters(clusters, ord_dseq)
                if cfg.order_by:
                    clusters = _assemble_clusters(lst, m_mult)
                    clusters.sort(key=functools.cmp_to_key(_ordcmp))
                    lst = _disassemble_clusters(clusters, ord_dseq)
                by_layer[nm] = lst
            feats = [f for nm in by_layer for f in by_layer[nm]]
        # hard per-layer truncation AFTER the orderings and BEFORE the
        # byte/feature-cap accounting (tile.cpp:2595-2611); truncation
        # cancels the overflow recourse for this attempt
        if (z == cfg.maxzoom and cfg.limit_tile_feature_count_at_maxzoom):
            lim = cfg.limit_tile_feature_count_at_maxzoom
            for nm in by_layer:
                if len(by_layer[nm]) > lim:
                    by_layer[nm] = by_layer[nm][:lim]
                    too_many_features = too_many_bytes = False
                    skipped = 0
            feats = [f for nm in by_layer for f in by_layer[nm]]
        elif cfg.limit_tile_feature_count:
            lim = cfg.limit_tile_feature_count
            for nm in by_layer:
                if len(by_layer[nm]) > lim:
                    can_stop_early = False
                    by_layer[nm] = by_layer[nm][:lim]
                    too_many_features = too_many_bytes = False
                    skipped = 0
            feats = [f for nm in by_layer for f in by_layer[nm]]
        if (trying_to_stop_early and line_detail == details[0]
                and (not can_stop_early or mz_pending)):
            # the stop-early attempt is invalid (content was dropped,
            # deferred to a deeper zoom, or truncated by the feature-
            # count limit just above — the truncation's
            # can_stop_early=false precedes this check in the
            # reference too, tile.cpp:2605 vs :2708): abandon and
            # re-encode at normal detail
            li += 1
            continue

        def _retry(kind: str, adj_cap, adj_val) -> str:
            """The overflow recourse chain (tile.cpp:2737-2875 for the
            feature count, 2910-3040 for the byte size): raise the
            LOCAL threshold from the sampled quantile and retry the
            same detail. Returns 'same' (retry), 'giveup' (the
            reference exits EXIT_INCOMPLETE — we emit the over-limit
            tile with a warning) or 'none' (no strategy applies: the
            detail ladder, or the reference's fatal feature-count
            message)."""
            nonlocal s_gamma, s_mingap, s_minextent, s_mindropseq, s_minattr
            nonlocal f_mingap, f_minextent, f_mindropseq, f_minattr
            if cfg.increase_gamma and s_gamma < 10:
                s_gamma = 1.0 if s_gamma < 1 else s_gamma * 1.25
                if s_gamma > out.get("gamma", 0):
                    out["gamma"] = s_gamma
                    out["still_dropping"] = True
                return "same"
            if s_mingap < _U64 and cfg.densest_active():
                f_mingap = min(f_mingap * adj_cap / adj_val * 0.80, 0.80)
                if not gaps_s.vals:
                    return "giveup"
                m = _choose_threshold(gaps_s.vals, f_mingap, s_mingap)
                if m > s_mingap:
                    s_mingap = m
                    if m > out.get("mingap", 0):
                        out["mingap"] = m
                        out["still_dropping"] = True
                    return "same"
                warnings.warn("Can't increase feature gap threshold further")
                return "giveup"
            if cfg.smallest_active():
                f_minextent = min(f_minextent * adj_cap / adj_val * 0.75, 0.80)
                if not extents_s.vals:
                    return "giveup"
                m = _choose_threshold(extents_s.vals, f_minextent, s_minextent)
                if _os_env.get("TPR_RETRY_DEBUG"):
                    import sys as _s
                    print(f"[retry z={z}] f={f_minextent:.5f} existing={s_minextent} "
                          f"m={m} n_samples={len(extents_s.vals)} "
                          f"max={max(extents_s.vals)}", file=_s.stderr)
                if m > s_minextent:
                    s_minextent = m
                    if m > out.get("minextent", 0):
                        out["minextent"] = m
                        out["still_dropping"] = True
                    return "same"
                warnings.warn("Can't increase feature area threshold further")
                return "giveup"
            if cfg.drop_by_attribute:
                f_minattr = min(f_minattr * adj_cap / adj_val * 0.75, 0.80)
                if not attrs_s.vals:
                    warnings.warn(
                        f"no features had a numeric value for attribute "
                        f"'{cfg.drop_by_attribute}'")
                m = _choose_minattr(attrs_s.vals, f_minattr, s_minattr, desc)
                better = m < s_minattr if desc else m > s_minattr
                if better:
                    s_minattr = m
                    prev = out.get("minattribute")
                    if prev is None or (m < prev if desc else m > prev):
                        out["minattribute"] = m
                        out["still_dropping"] = True
                    return "same"
                warnings.warn("Can't increase attribute threshold further")
                return "giveup"
            if len(feats) > len(by_layer) and cfg.fraction_active():
                mult = 0.95 if kind == "features" else 0.75
                f_mindropseq = min(f_mindropseq * adj_cap / adj_val * mult, 0.80)
                m = (_choose_threshold(dseqs_s.vals, f_mindropseq, s_mindropseq)
                     if dseqs_s.vals else _U64)
                if m > s_mindropseq:
                    s_mindropseq = m
                    if m > out.get("mindrop_sequence", 0):
                        # -pd keeps the threshold tile-local
                        # (tile.cpp:3020-3023)
                        if not cfg.dynamic_drop:
                            out["mindrop_sequence"] = m
                        out["still_dropping"] = True
                    return "same"
                warnings.warn("Can't increase feature count threshold further")
                return "giveup"
            return "none"

        if strat is not None:
            # feature-count recourse BEFORE encoding the bytes
            # (tile.cpp:2717-2875), with the skip-extrapolated count
            # against the multiplier-inflated cap
            adj_mf = feat_cap
            if lead_count > 0 and adj_mf is not None:
                adj_mf = adj_mf * (lead_count + other_count) // lead_count
            afc = len(feats)
            if kept > 0:
                afc = afc * (skipped + kept) // kept
            if too_many_features or (adj_mf is not None and afc > adj_mf):
                over_feats = max(over_feats, afc)  # feature_count_out
                if trying_to_stop_early and line_detail == details[0]:
                    li += 1
                    continue
                r = _retry("features", adj_mf, afc)
                retries += 1
                if r == "same" and retries < 500:
                    continue
                if r == "none":
                    warnings.warn(
                        f"tile {z}/{tx}/{ty} has {len(feats)} features, >"
                        f"{adj_mf}; try --drop-fraction-as-needed or "
                        "--drop-densest-as-needed (tile.cpp:2871-2874)")
                # giveup/none/retry-cap: emit the over-limit tile below
        elif (cfg.max_tile_features is not None
                and len(feats) > cfg.max_tile_features):
            over_feats = max(over_feats, len(feats))
            warnings.warn(
                f"tile {z}/{tx}/{ty} has {len(feats)} features, >"
                f"{cfg.max_tile_features}; use a drop strategy (reference "
                "exits here, tile.cpp:2723-2730)"
            )
        tile_bytes = b""
        if cfg.encode_tiles:
            enc_layers = by_layer
            if cfg.postfilter:
                # -c: replace the assembled layers through the shell
                # pipe BEFORE compression and the size checks
                # (tile.cpp:2686-2688)
                enc_layers = _run_postfilter(cfg, z, tx, ty, by_layer,
                                             out_detail)
            # tiles hold one MVT layer per layername present, in
            # ALPHABETICAL name order (the reference's per-tile layers
            # std::map, tile.cpp:2617-2684)
            mvt_layers = [
                encode_layer(nm, enc_layers[nm], 1 << out_detail)
                for nm in sorted(enc_layers)
            ]
            tile_bytes = encode_tile(mvt_layers, compress=cfg.compress,
                                     exact_gzip=True)
        adj_ts = len(tile_bytes)
        if strat is not None and kept > 0:
            adj_ts = adj_ts * (skipped + kept) // kept
        adj_ms = mts
        if strat is not None and lead_count > 0 and adj_ms is not None:
            adj_ms = adj_ms * (lead_count + other_count) // lead_count
        if mts is None or (not too_many_bytes and adj_ts <= adj_ms):
            leafed = int(trying_to_stop_early and line_detail == details[0])
            return _row(len(feats), tile_bytes, leafed,
                        max(base_detail - line_detail, 0))
        over_size = max(over_size, adj_ts)  # tile_size_out, tile.cpp:2889-2897
        if strat is not None:
            if trying_to_stop_early and line_detail == details[0]:
                li += 1
                continue
            r = _retry("bytes", adj_ms, adj_ts)
            retries += 1
            if r == "same" and retries < 500:
                continue
            if r == "giveup" or retries >= 500:
                warnings.warn(
                    f"emitting over-limit tile {z}/{tx}/{ty} "
                    "(reference exits EXIT_INCOMPLETE here)")
                return _row(len(feats), tile_bytes, 0,
                            max(base_detail - line_detail, 0))
            # r == "none": detail_reduced++ — fall to the next detail
        li += 1
    warnings.warn(
        f"could not make tile {z}/{tx}/{ty} smaller than "
        f"{mts} B even at detail {cfg.min_detail} "
        "(reference fails the tile here, tile.cpp:3075-3078)"
    )
    return _row(len(feats), tile_bytes, 0, max(base_detail - cfg.min_detail, 0))


def _tile_rows_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "z": pa.array([r["z"] for r in rows], pa.int32()),
            "x": pa.array([r["x"] for r in rows], pa.int32()),
            "y": pa.array([r["y"] for r in rows], pa.int32()),
            "n_features": pa.array([r["n_features"] for r in rows], pa.int64()),
            # total drawvec entries written (write_tile's return value;
            # ranks the metadata midpoint tile, tile.cpp:2640)
            "n_geom": pa.array([r.get("n_geom", r["n_features"])
                                for r in rows], pa.int64()),
            "tile": pa.array([r["tile"] for r in rows], pa.large_binary()),
            # -at: 1 where the pyramid leafs at this tile (children pruned)
            "leafed": pa.array([r.get("leafed", 0) for r in rows], pa.int8()),
            # per-tile strategy counters (mbtiles `strategies` metadata)
            "s_rate": pa.array([r.get("s_rate", 0) for r in rows], pa.int32()),
            "s_tiny": pa.array([r.get("s_tiny", 0) for r in rows], pa.int32()),
            "s_detail": pa.array([r.get("s_detail", 0) for r in rows], pa.int32()),
            "s_tsize": pa.array([r.get("s_tsize", 0) for r in rows], pa.int64()),
            "s_fcount": pa.array([r.get("s_fcount", 0) for r in rows], pa.int64()),
            "s_gamma": pa.array([r.get("s_gamma", 0) for r in rows], pa.int64()),
            "s_need_d": pa.array([r.get("s_need_d", 0) for r in rows], pa.int64()),
            "s_need_c": pa.array([r.get("s_need_c", 0) for r in rows], pa.int64()),
        }
    )


def _gkey(z: int, x: int, y: int) -> int:
    return (z << 56) | (x << 28) | y


def _stream_est(cfg: VectorConfig, z: int, x: int, y: int, feats,
                origin: tuple[int, int]) -> int:
    """estimated_complexity of a tile's input stream (tile.cpp:2344,
    validated byte-exact vs an instrumented reference build): the
    8-byte complexity slot + nextzoom/x/y varints + for z > 0 the
    bytes zlib deflate(Z_NO_FLUSH) emits while streaming the
    serialized features, for z == 0 the raw initial-stream bytes
    (+1 EOF byte; the z=iz stream is uncompressed, tile.cpp:3475).

    feats: (seq, t, ops, world_xy, fmz) tuples in (vindex, seq) order,
    geometry CLIPPED AT THE PARENT (what rewrite serialized,
    tile.cpp:1201-1215); empty geometries are skipped
    (rewrite's osf.geometry.size() > 0 gate)."""
    from ..stages.serial_bytes import StreamSizer, serialize_feature_bytes

    g = cfg.resolved_gscale()
    wx0, wy0 = origin
    sz = StreamSizer(z, x, y, compressed=(z != 0))
    for seq, t, ops, xy, fmz in feats:
        if len(ops) == 0:
            continue
        fb = serialize_feature_bytes(t, seq, ops, xy >> g if g else xy,
                                     wx0, wy0, fmz)
        sz.write_feature(fb)
    return sz.complexity() + (1 if z == 0 else 0)


def stream_origin(feat_tbl: pa.Table | None, g: int):
    """(initial_x >> gscale, initial_y >> gscale) — the delta origin of
    every serialized feature (serial.cpp:352-358 initial_x capture +
    rewrite's SHIFT_RIGHT(initial_x), tile.cpp:529): the first vertex
    of the min-seq feature. The ingested world geometry is already
    gscale-aligned, so the plain shift equals the reference's rounding
    shift; NOTE the reference captures the origin pre-fix_polygon, so
    a corpus whose FIRST feature is a polygon whose ring rotation moved
    vertex 0 can differ by one grid step (a 1-2 byte est perturbation,
    far inside the gate margin)."""
    if feat_tbl is None or len(feat_tbl) == 0:
        return (0, 0)
    seqs = feat_tbl["seq"].to_numpy(zero_copy_only=False)
    i = int(np.argmin(seqs))
    xy = np.frombuffer(feat_tbl["xy"][i].as_py(), dtype=np.int64).reshape(-1, 2)
    return (int(xy[0, 0]) >> g, int(xy[0, 1]) >> g)


_EMIT_SCHEMA = pa.schema(
    [
        ("gkey", pa.int64()),
        ("vindex", pa.uint64()),
        ("seq", pa.int64()),
        ("t", pa.int8()),
        ("ops", pa.large_binary()),
        ("xy", pa.large_binary()),
        ("label_x", pa.int64()),
        ("label_y", pa.int64()),
        ("minzoom", pa.int16()),
        ("fmin", pa.int16()),
        ("fmax", pa.int16()),
        # -pn tile-boundary nodes from THIS tile's clip, int64 (x, y)
        # pairs; empty otherwise (and for zoom-B subtree seed rows,
        # whose clips re-run inside the subtree cascade)
        ("enodes", pa.large_binary()),
        # -at only: the INCOMING (parent-clipped) geometry this tile's
        # stream would hold (rewrite serializes parent-clipped world
        # coords, tile.cpp:481-530) - the complexity-estimate input.
        # Empty without variable_depth.
        ("pops", pa.large_binary()),
        ("pxy", pa.large_binary()),
    ]
)


class CascadeFan:
    """Phase A: per-feature ancestor cascade z0 → bucket zoom B.

    Each input feature runs its own clip chain (no cross-feature state
    in clip/fan-out — see _feature_step) and emits one row per low-zoom
    tile it survives in (tile-LOCAL coordinates, for the group encode)
    plus one row per zoom-B subtree it reaches (SNAPPED WORLD
    coordinates — the rewrite blob the subtree cascade starts from)."""

    def __init__(self, cfg: VectorConfig, b: int):
        self.cfg = cfg
        self.b = b

    def __call__(self, tbl: pa.Table) -> pa.Table:
        cfg = self.cfg
        b = self.b
        vind = (
            tbl["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if "vindex" in tbl.column_names
            else np.zeros(len(tbl), np.uint64)
        )
        cols: dict[str, list] = {n: [] for n in _EMIT_SCHEMA.names}

        at = cfg.variable_depth

        def emit(gz, gx, gy, vi, seq, t, ops, xy, lx, ly, fmz, enodes=(),
                 pops=None, pxy=None, fmn=-1, fmx=-1):
            cols["gkey"].append(_gkey(gz, gx, gy))
            cols["vindex"].append(vi)
            cols["seq"].append(seq)
            cols["t"].append(t)
            cols["ops"].append(ops.astype(np.uint8).tobytes())
            cols["xy"].append(np.ascontiguousarray(xy, dtype=np.int64).tobytes())
            cols["label_x"].append(lx)
            cols["label_y"].append(ly)
            cols["minzoom"].append(fmz)
            cols["fmin"].append(fmn)
            cols["fmax"].append(fmx)
            cols["enodes"].append(
                np.array(enodes, np.int64).tobytes() if enodes else b""
            )
            if at and pops is not None:
                cols["pops"].append(pops.astype(np.uint8).tobytes())
                cols["pxy"].append(np.ascontiguousarray(pxy, dtype=np.int64).tobytes())
            else:
                cols["pops"].append(b"")
                cols["pxy"].append(b"")

        # -at: child tiles whose stop-early attempt the PARENT scan
        # forbids (estimated_complexity_out = 1<<32, tile.cpp:2346-2349:
        # a parent-stream feature first appearing beyond the next zoom,
        # or one deferred by an explicit deeper minzoom, means children
        # cannot measure their full content) — emitted as t=0 marker
        # rows so the flag reaches sibling tiles fed by OTHER features
        poison_keys: set[tuple[int, int, int]] = set()

        rows = table_to_rows(tbl)
        for i, (seq, t, ops, xy, lx, ly, fmz, fmn, fmx) in enumerate(rows):
            vi = int(vind[i])
            if cfg.one_tile is not None:
                # -R: every feature goes straight to the root-tile
                # subtree unclipped (the reference writes the whole
                # radix stream under the (iz, ix, iy) header,
                # main.cpp:2207-2221); the subtree cascade clips once
                otx, oty = cfg.one_tile
                emit(b, otx, oty, vi, seq, t, ops, xy, lx, ly, fmz,
                     pops=ops, pxy=xy, fmn=fmn, fmx=fmx)
                continue
            if b == 0:
                emit(0, 0, 0, vi, seq, t, ops, xy, lx, ly, fmz,
                     pops=ops, pxy=xy, fmn=fmn, fmx=fmx)
                continue
            stack = [(0, 0, 0, ops, xy)]
            while stack:
                z, tx, ty, o_, x_ = stack.pop()
                step = _feature_step(cfg, z, tx, ty, t, o_, x_)
                if step is None:
                    continue
                cops, cxy, child_keys, snapped, enodes = step
                if z >= cfg.minzoom:
                    # low-zoom survivor (kept even when the clip emptied
                    # the geometry — the per-tile encode scan sees the
                    # same stream the per-tile task saw)
                    emit(z, tx, ty, vi, seq, t, cops, cxy, lx, ly, fmz, enodes,
                         pops=o_, pxy=x_, fmn=fmn, fmx=fmx)
                    if at and z < cfg.maxzoom and (
                        (fmn != -1 and z < fmn)
                        or ((fmx == -1 or z <= fmx) and fmz > z + 1)
                    ):
                        # minzoom_feature_pending (tile.cpp:1222-1225) /
                        # dropping_by_rate (tile.cpp:1944-1948): poison
                        # ALL children of this parent (within shards)
                        for dx in (0, 1):
                            for dy in (0, 1):
                                poison_keys.add(
                                    (z + 1, 2 * tx + dx, 2 * ty + dy))
                for (cx, cy) in child_keys:
                    if z + 1 == b:
                        emit(b, cx, cy, vi, seq, t, cops, snapped, lx, ly, fmz,
                             pops=cops, pxy=snapped, fmn=fmn, fmx=fmx)
                    else:
                        stack.append((z + 1, cx, cy, cops, snapped))
        for (pz, px, py) in poison_keys:
            emit(pz, px, py, 0, -1, 0, np.zeros(0, np.uint8),
                 np.zeros((0, 2), np.int64), -1, -1, 0)
        arrs = {
            n: pa.array(cols[n], _EMIT_SCHEMA.field(n).type) for n in _EMIT_SCHEMA.names
        }
        return pa.table(arrs)


class GroupEncoder:
    """One shuffle group = one low-zoom tile (z < B) or one zoom-B
    subtree. Orders features by (vindex, seq) — the ingest-sorted scan
    order; vindex is 0 without dropping so this is input order — then
    encodes (detail ladder) or runs the depth-first subtree cascade.
    With a sink dir, tile rows are written to a per-group parquet
    partition inside the task (resumable unit) and only a summary row
    is returned."""

    def __init__(self, cfg: VectorConfig, b: int, raw_dir: str | None = None,
                 shared_nodes_ref=None, at_origin: tuple[int, int] = (0, 0),
                 attrs_ref=None):
        self.cfg = cfg
        self.b = b
        self.raw_dir = raw_dir
        # broadcast attribute side table: seq -> (fid, [(k, vt, s)...]);
        # attributes never ride the geometry exchange (ray.put once,
        # resolved per task)
        self.attrs_ref = attrs_ref
        self._attrs = None
        # -at: the serialized-stream delta origin (stream_origin)
        self.at_origin = at_origin
        # ObjectRef to (or the actual) sorted uint64 -pn node array;
        # resolved once per task and cached (the reference's mmap'd
        # node file analogue, main.cpp:2161-2167)
        self.shared_nodes_ref = shared_nodes_ref
        self._gn = None

    def _attr_table(self, seqs=None):
        if self.attrs_ref is None:
            return None
        if isinstance(self.attrs_ref, AttrShards):
            # seq-range shards: fetch only this group's slice (the
            # AttrShards cache keeps shards across groups in one task)
            return self.attrs_ref.resolve(seqs if seqs is not None else ())
        if self._attrs is None:
            self._attrs = (
                ray.get(self.attrs_ref)
                if isinstance(self.attrs_ref, ray.ObjectRef)
                else self.attrs_ref
            )
        return self._attrs

    def _global_nodes(self):
        if self.shared_nodes_ref is None:
            return None
        if self._gn is None:
            self._gn = (
                ray.get(self.shared_nodes_ref)
                if isinstance(self.shared_nodes_ref, ray.ObjectRef)
                else self.shared_nodes_ref
            )
        return self._gn

    def __call__(self, grp: pa.Table) -> pa.Table:
        import os

        cfg = self.cfg
        gn = self._global_nodes()
        gkey = int(grp["gkey"][0].as_py())
        z = gkey >> 56
        x = (gkey >> 28) & ((1 << 28) - 1)
        y = gkey & ((1 << 28) - 1)
        est_poisoned = False
        t_np = grp["t"].to_numpy(zero_copy_only=False)
        if (t_np == 0).any():
            # -at poison markers from the parent scan (see CascadeFan):
            # this tile must not try to stop early
            est_poisoned = True
            grp = grp.filter(pc.not_equal(grp["t"], 0))
            if len(grp) == 0:
                return self.empty()
        vi = grp["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sq = grp["seq"].to_numpy(zero_copy_only=False)
        grp = grp.take(pa.array(np.lexsort((sq, vi))))
        rows = table_to_rows(grp)
        at = cfg.variable_depth
        est = None
        if at and est_poisoned:
            est = 1 << 32  # tile.cpp:2346-2349
        elif at and "pxy" in grp.column_names:
            # this tile's input-stream complexity from the incoming
            # (parent-clipped) geometry the cascade carried alongside
            pops_l = grp["pops"].to_pylist()
            pxy_l = grp["pxy"].to_pylist()
            mz_l = grp["minzoom"].to_pylist()
            sq_l = grp["seq"].to_pylist()
            t_l = grp["t"].to_pylist()
            est = _stream_est(
                cfg, z, x, y,
                [
                    (sq_l[i], t_l[i],
                     np.frombuffer(pops_l[i], dtype=np.uint8),
                     np.frombuffer(pxy_l[i], dtype=np.int64).reshape(-1, 2),
                     mz_l[i])
                    for i in range(len(grp))
                ],
                self.at_origin,
            )
        out_rows: list[dict] = []
        leaf_keys: list[tuple[int, int, int]] = []
        grp_attrs = self._attr_table(np.unique(sq))
        if z < self.b:
            if cfg.prevent_shared_nodes and "enodes" in grp.column_names:
                eno = grp["enodes"].to_pylist()
                survivors = [
                    (seq, t, ops, xy, (lx, ly), fmz, fmn, fmx,
                     [tuple(p) for p in
                      np.frombuffer(eno[i], dtype=np.int64).reshape(-1, 2)]
                     if eno[i] else ())
                    for i, (seq, t, ops, xy, lx, ly, fmz, fmn, fmx)
                    in enumerate(rows)
                ]
            else:
                survivors = [
                    (seq, t, ops, xy, (lx, ly), fmz, fmn, fmx)
                    for seq, t, ops, xy, lx, ly, fmz, fmn, fmx in rows
                ]
            # low-zoom single-tile groups are the cascade's serial
            # critical path (one task sees ~the whole input at z0):
            # fan their simplification workers out as Ray subtasks,
            # scaled down as the zoom's own tile parallelism grows
            n_cpus_ = int(ray.cluster_resources().get("CPU", 8))
            pw = n_cpus_ >> (2 * z) if (1 << (2 * z)) < n_cpus_ // 2 else 0
            if _os_env.get("TPR_NO_TILE_FANOUT"):
                pw = 0
            row = _encode_with_detail_ladder(cfg, z, x, y, survivors,
                                             global_nodes=gn, est=est,
                                             attrs=grp_attrs,
                                             par_workers=pw)
            if row is not None:
                out_rows.append(row)
                if row.get("leafed"):
                    leaf_keys.append((z, x, y))
        else:
            stack = [(z, x, y, rows, est)]
            while stack:
                zz, tx, ty, rr, ezz = stack.pop()
                tile_row, children, poison = process_tile(
                    cfg, zz, tx, ty, rr,
                    global_nodes=gn, est=ezz,
                    attrs=grp_attrs)
                if tile_row is not None:
                    out_rows.append(tile_row)
                if tile_row is not None and tile_row.get("leafed"):
                    # -at: the pyramid leafs here - prune the subtree
                    # (skip_children, tile.cpp:3059-3066)
                    continue
                if zz + 1 <= cfg.maxzoom:
                    for (cx, cy), blob_rows in children.items():
                        e_child = None
                        if at and poison:
                            e_child = 1 << 32  # tile.cpp:2346-2349
                        elif at:
                            e_child = _stream_est(
                                cfg, zz + 1, cx, cy,
                                [(b_[0], b_[1], b_[2], b_[3], b_[6])
                                 for b_ in blob_rows if b_[3] is not None],
                                self.at_origin,
                            )
                        stack.append((zz + 1, cx, cy, blob_rows, e_child))
        tile_tbl = _tile_rows_table(out_rows)
        if self.raw_dir is None:
            return tile_tbl
        import pyarrow.parquet as pq

        part = os.path.join(self.raw_dir, f"g_{z}_{x}_{y}")
        os.makedirs(part, exist_ok=True)
        tmp = os.path.join(part, "part-0.parquet.inprogress")
        pq.write_table(tile_tbl, tmp)
        os.replace(tmp, os.path.join(part, "part-0.parquet"))
        nf = tile_tbl["n_features"].to_numpy(zero_copy_only=False)
        lf = tile_tbl["leafed"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gz": pa.array([z], pa.int32()),
                "gx": pa.array([x], pa.int32()),
                "gy": pa.array([y], pa.int32()),
                # counter-only phantom rows (n_features 0) are not tiles
                "n_tiles": pa.array([int((nf > 0).sum())], pa.int64()),
                "n_features": pa.array([int(nf.sum())], pa.int64()),
                "n_leafed": pa.array([int(lf.sum())], pa.int64()),
            }
        )

    def empty(self) -> pa.Table:
        if self.raw_dir is None:
            return _tile_rows_table([])
        return pa.table(
            {
                "gz": pa.array([], pa.int32()),
                "gx": pa.array([], pa.int32()),
                "gy": pa.array([], pa.int32()),
                "n_tiles": pa.array([], pa.int64()),
                "n_features": pa.array([], pa.int64()),
                "n_leafed": pa.array([], pa.int64()),
            }
        )


_HASH_MIX = np.uint64(0x9E3779B97F4A7C15)


@ray.remote
def _vp_partition(tbl: pa.Table, np_: int):
    """Split one block into np_ hash partitions by gkey (groups stay
    whole: same gkey → same partition)."""
    if len(tbl) == 0:
        e = tbl.slice(0, 0)
        return tuple(e for _ in range(np_)) if np_ > 1 else e
    g = tbl["gkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
    pid = ((g * _HASH_MIX) >> np.uint64(33)).astype(np.int64) % np_
    order = np.argsort(pid, kind="stable")
    ps = pid[order]
    cuts = np.searchsorted(ps, np.arange(np_ + 1))
    t2 = tbl.take(pa.array(order)).combine_chunks()
    parts = tuple(t2.slice(cuts[j], cuts[j + 1] - cuts[j]) for j in range(np_))
    return parts if np_ > 1 else parts[0]


@ray.remote
def _vp_reduce(encoder, *pieces):
    tbls = [p for p in pieces if p.num_rows]
    if not tbls:
        return encoder.empty()
    cat = pa.concat_tables(tbls)
    g = cat["gkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(g, kind="stable")
    cat = cat.take(pa.array(order)).combine_chunks()
    gs = g[order]
    cuts = np.concatenate(
        ([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1, [len(gs)])
    )
    outs = [
        encoder(cat.slice(cuts[i], cuts[i + 1] - cuts[i]))
        for i in range(len(cuts) - 1)
    ]
    outs = [t for t in outs if t.num_rows]
    if not outs:
        return encoder.empty()
    return pa.concat_tables(outs)


def _grouped_exchange(rows: ray.data.Dataset, encoder) -> ray.data.Dataset:
    """groupby(gkey).map_groups with controlled task granularity: hash
    partition the emitted rows into ~4×CPU reduce tasks, each encoding
    its groups back to back (ray.data's own map_groups caps parallelism
    at its post-sort block count — measured 3-5× slower here). The
    reduce outputs stay in the object store (from_arrow_refs) — tile
    bytes never touch the driver."""
    mat = rows.materialize()
    refs = mat.to_arrow_refs()
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    p_parts = int(max(4, min(256, 4 * n_cpus)))
    part = _vp_partition.options(num_returns=p_parts) if p_parts > 1 else _vp_partition
    cols = [part.remote(r, p_parts) for r in refs]
    if p_parts == 1:
        cols = [(c,) for c in cols]
    outs = [
        _vp_reduce.remote(encoder, *[cols[i][j] for i in range(len(cols))])
        for j in range(p_parts)
    ]
    return ray.data.from_arrow_refs(outs)


def auto_vector_bucket_zoom(n_rows: int, maxzoom: int, n_cpus: int | None = None) -> int:
    """Subtree granularity: enough zoom-B subtrees for load balance
    (4^B ≳ 8×cores), shallow enough that the phase-A ancestor cascade
    (per-feature work ∝ B) stays cheap."""
    if n_cpus is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
    b = 0
    while (4 ** (b + 1)) * 256 <= n_rows and b + 1 <= maxzoom:
        b += 1
    b_cpu = 0
    while 4 ** b_cpu < 8 * n_cpus:
        b_cpu += 1
    return max(1, min(max(b, b_cpu), maxzoom, 6))


def _tippecanoe_cpus_tempfiles() -> tuple[int, int]:
    """init_cpus (main.cpp:186-245): CPUS = online processors rounded
    down to a power of 2 (TIPPECANOE_MAX_THREADS overrides); MAX_FILES
    = min(open-file limit, 2000) × 3/4; TEMP_FILES = (MAX_FILES-10)/2
    capped at CPUS*4. These drive the zoom-jump schedule below minzoom,
    so exact-match runs must mirror the reference's values on the same
    machine."""
    import os as _os
    import resource

    env = _os.environ.get("TIPPECANOE_MAX_THREADS")
    cpus = int(env) if env else (_os.cpu_count() or 1)
    cpus = max(1, min(cpus, 32767))
    cpus = 1 << int(math.log(cpus) / math.log(2))
    try:
        max_files = resource.getrlimit(resource.RLIMIT_NOFILE)[0]
    except Exception:
        max_files = 1024
    max_files = min(max_files, 2000)
    max_files = max_files * 3 // 4
    temp_files = (max_files - 10) // 2
    if temp_files > cpus * 4:
        temp_files = cpus * 4
    return cpus, temp_files


def _rows_bbox(rows: list) -> tuple[int, int, int, int] | None:
    """Dataset bbox over real (non-CLOSEPATH) vertices."""
    minx = miny = (1 << 62)
    maxx = maxy = -(1 << 62)
    for r in rows:
        ops, xy = r[2], r[3]
        real = xy[ops != 3]
        if len(real) == 0:
            continue
        minx = min(minx, int(real[:, 0].min()))
        miny = min(miny, int(real[:, 1].min()))
        maxx = max(maxx, int(real[:, 0].max()))
        maxy = max(maxy, int(real[:, 1].max()))
    if maxx < minx:
        return None
    return minx, miny, maxx, maxy


def _choose_first_zoom(rows: list, minzoom: int, buffer: int) -> tuple[int, int, int]:
    return _choose_first_zoom_bbox(_rows_bbox(rows), minzoom, buffer)


def _choose_first_zoom_bbox(bbox, minzoom: int, buffer: int) -> tuple[int, int, int]:
    """choose_first_zoom (main.cpp:1147-1206): the pyramid's root is
    the deepest zoom ≤ minzoom whose single (buffered) tile covers the
    whole dataset bbox. Dateline-crossing data clamps to the full world
    width, forcing the z0 root."""
    if bbox is None:
        return 0, 0, 0
    minx, miny, maxx, maxy = (int(v) for v in bbox)
    if minx < 0 or maxx > (1 << 32) - 1:
        minx, maxx = 0, (1 << 32) - 1
    miny = max(miny, 0)
    maxy = min(maxy, (1 << 32) - 1)

    def tdiv(a: int, b: int) -> int:  # C trunc division
        q = abs(a) // b
        return -q if (a < 0) != (b < 0) else q

    for z in range(minzoom, -1, -1):
        shift = 1 << (32 - z)
        left = tdiv(minx - buffer * shift // 256, shift)
        top = tdiv(miny - buffer * shift // 256, shift)
        right = tdiv(maxx + buffer * shift // 256, shift)
        bottom = tdiv(maxy + buffer * shift // 256, shift)
        if left == right and top == bottom:
            return z, left, top
    return 0, 0, 0


def _zoom_plan_step(z: int, minzoom: int, n_useful: int,
                    cpus: int, temp_files: int) -> tuple[int, int, int]:
    """One traverse_zooms scheduling step: threads for this zoom
    (tile.cpp:3335-3360), child_shards = TEMP_FILES/threads, and the
    nextzoom the tiles' children are written at (write_tile
    tile.cpp:1686-1697: single steps at/above minzoom, jumps of up to
    max_zoom_increment = log4(child_shards) below it). Returns
    (nextzoom, max_zoom_increment, child_shards)."""
    threads = min(cpus, temp_files // 4, max(1, n_useful))
    threads = 1 << int(math.log(threads) / math.log(2)) if threads > 1 else 1
    child_shards = temp_files // threads
    mzi = int(math.log(child_shards) / math.log(4))
    nextzoom = z + 1
    if nextzoom < minzoom:
        if z + mzi > minzoom:
            nextzoom = minzoom
        else:
            nextzoom = z + mzi
    return nextzoom, mzi, child_shards


class _SeqMap:
    """Per-seq side index as sorted parallel numpy arrays — the Ray
    analogue of the reference's 16-byte-per-feature index mmap
    (main.cpp:2207+, struct index): .get() binary-searches, the arrays
    ship zero-copy through the object store, and no per-seq Python
    dict ever exists on the driver. Drop-in for the dict.get() calls
    in process_tile / the strategy scan."""

    __slots__ = ("keys", "vals")

    def __init__(self, keys: np.ndarray, vals: np.ndarray):
        o = np.argsort(keys, kind="stable")
        self.keys = np.ascontiguousarray(np.asarray(keys)[o])
        self.vals = np.ascontiguousarray(np.asarray(vals)[o])

    def get(self, k, default=0):
        i = int(np.searchsorted(self.keys, k))
        if i < len(self.keys) and self.keys[i] == k:
            return int(self.vals[i])
        return default

    def __len__(self):
        return len(self.keys)


class AttrShards:
    """Seq-range-sharded attribute side table. The former design
    `ray.put` one dict covering the WHOLE input — an O(dataset) object
    replicated to every node. Shards of width `width` are separate
    store objects; `resolve(seqs)` fetches only the shards the caller's
    seq set overlaps and presents them as the same plain attrs dict the
    tile pipeline reads (low zooms still touch every shard — a z0 tile
    sees every feature — but deep-zoom tasks fetch only their slice,
    and no single store object scales with the input)."""

    __slots__ = ("width", "refs", "meta", "_cache")

    def __init__(self, width: int, refs: list, meta: dict):
        self.width = width
        self.refs = refs
        self.meta = meta  # non-seq-keyed entries (__n__, ...)
        self._cache: dict = {}

    def shard_ids(self, seqs) -> list:
        w = self.width
        out = {int(s) // w for s in seqs}
        return sorted(i for i in out if 0 <= i < len(self.refs)
                      and self.refs[i] is not None)

    def resolve(self, seqs) -> dict:
        need = self.shard_ids(seqs)
        missing = [i for i in need if i not in self._cache]
        if missing:
            got = ray.get([self.refs[i] for i in missing])
            for i, sh in zip(missing, got):
                self._cache[i] = sh
        out: dict = dict(self.meta)
        sides: dict = {}
        layers: dict = {}
        for i in need:
            sh = self._cache[i]
            out.update(sh["attrs"])
            if sh.get("layers"):
                layers.update(sh["layers"])
            for name, (ks, vs) in sh.get("maps", {}).items():
                sides.setdefault(name, ([], []))
                sides[name][0].append(ks)
                sides[name][1].append(vs)
        if layers:
            out["__layers__"] = layers
        for name, (kl, vl) in sides.items():
            # per-shard slices are sorted and ranges are disjoint and
            # ordered, so the concatenation is already globally sorted
            out[name] = _SeqMap(np.concatenate(kl), np.concatenate(vl))
        return out


def _shard_attr_dict(attrs: dict, n_shards: int) -> AttrShards:
    """Split a combined attrs dict (plain seq->entry + _SeqMap side
    maps + __layers__/__n__ meta) into seq-range shards, each its own
    object-store entry."""
    int_keys = [k for k in attrs if isinstance(k, (int, np.integer))]
    maps = {k: v for k, v in attrs.items()
            if isinstance(v, _SeqMap)}
    # CLI-built side maps arrive as plain {seq: int} dicts
    for name in ("__vindex__", "__gap__", "__extent__"):
        v = attrs.get(name)
        if isinstance(v, dict) and name not in maps:
            ks = np.fromiter(v.keys(), np.int64, len(v))
            vs = np.fromiter((v[k] for k in ks), np.uint64, len(v))
            maps[name] = _SeqMap(ks, vs)
    layers = attrs.get("__layers__") or {}
    meta = {k: v for k, v in attrs.items()
            if not isinstance(k, (int, np.integer))
            and k not in maps and k != "__layers__"}
    max_seq = 0
    if int_keys:
        max_seq = max(int_keys)
    for m in maps.values():
        if len(m):
            max_seq = max(max_seq, int(m.keys[-1]))
    if layers:
        max_seq = max(max_seq, max(layers))
    n_shards = max(1, n_shards)
    width = max(1, (int(max_seq) + n_shards) // n_shards)
    nsh = int(max_seq) // width + 1
    shards: list = [None] * nsh
    for i in range(nsh):
        lo, hi = i * width, (i + 1) * width
        sh_attrs = {k: attrs[k] for k in int_keys if lo <= k < hi}
        sh_layers = {k: v for k, v in layers.items() if lo <= k < hi}
        sh_maps = {}
        for name, m in maps.items():
            a = int(np.searchsorted(m.keys, lo))
            b = int(np.searchsorted(m.keys, hi))
            if b > a:
                sh_maps[name] = (m.keys[a:b], m.vals[a:b])
        if sh_attrs or sh_layers or sh_maps:
            shards[i] = ray.put(
                {"attrs": sh_attrs, "layers": sh_layers, "maps": sh_maps})
    return AttrShards(width, shards, meta)


@ray.remote(num_returns=2)
def _strat_block_sides(tbl: pa.Table, g: int, need_extent: bool):
    """Phase A over one (vindex, seq)-sorted block: tiny driver meta
    (bbox, vindex boundaries, -at origin candidate) + the big side
    arrays (seq, vindex, extent), which stay in the object store."""
    rows = table_to_rows(tbl)
    seqs = tbl["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
    vind = (
        tbl["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if "vindex" in tbl.column_names
        else np.zeros(len(tbl), np.uint64)
    )
    ext = None
    if need_extent:
        ext = np.array(
            [_ingest_extent(r[1], r[2], r[3], g) for r in rows], np.int64
        )
    meta = {
        "n": len(rows),
        "bbox": _rows_bbox(rows),
        "first_v": int(vind[0]) if len(vind) else 0,
        "last_v": int(vind[-1]) if len(vind) else 0,
    }
    if len(seqs):
        i = int(np.argmin(seqs))
        meta["min_seq"] = int(seqs[i])
        xy0 = rows[i][3]
        if len(xy0):
            meta["origin_xy"] = (int(xy0[0, 0]), int(xy0[0, 1]))
    return meta, {"seq": seqs, "vindex": vind, "extent": ext}


@ray.remote
def _strat_block_gaps(tbl: pa.Table, prev_v: int, origin, scheme: str):
    """Phase B over one sorted block: z0 next_feature gaps, chained
    from the previous block's last vindex."""
    rows = table_to_rows(tbl)
    vind = (
        tbl["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if "vindex" in tbl.column_names
        else np.zeros(len(tbl), np.uint64)
    )
    seqs = tbl["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
    gaps = _z0_gaps(rows, vind, scheme, origin=origin, prev0=prev_v)
    return {"seq": seqs, "gap": gaps.astype(np.uint64)}


@ray.remote
def _strat_combine_attrs(attrs: dict | None, sides: list, gaps: list | None,
                         need_extent: bool, n_shards: int = 32):
    """Assemble the per-seq side table ONCE in a worker (never on the
    driver): CLI attrs dict + _SeqMap arrays for vindex/gap/extent —
    then split it into seq-range object-store shards so no single
    broadcast object scales with the input (zoom tasks resolve only
    the shards their rows touch)."""
    sides = [ray.get(s) if isinstance(s, ray.ObjectRef) else s for s in sides]
    if gaps is not None:
        gaps = [ray.get(gv) if isinstance(gv, ray.ObjectRef) else gv
                for gv in gaps]
    out = dict(attrs) if attrs else {}
    seq = np.concatenate([s["seq"] for s in sides]) if sides else np.zeros(0, np.int64)
    vind = np.concatenate([s["vindex"] for s in sides]) if sides else np.zeros(0, np.uint64)
    out["__vindex__"] = _SeqMap(seq, vind)
    if need_extent:
        ext = np.concatenate([s["extent"] for s in sides]) if sides else np.zeros(0, np.int64)
        out["__extent__"] = _SeqMap(seq, ext)
    if gaps is not None:
        gseq = np.concatenate([gv["seq"] for gv in gaps]) if gaps else np.zeros(0, np.int64)
        garr = np.concatenate([gv["gap"] for gv in gaps]) if gaps else np.zeros(0, np.uint64)
        out["__gap__"] = _SeqMap(gseq, garr)
    return _shard_attr_dict(out, n_shards)


@ray.remote
def _strat_block_rows(tbl: pa.Table, key):
    """Root-tile input part: one sorted block unpacked to row tuples,
    keyed by the root tile (the geomfile stream analogue)."""
    return {key: table_to_rows(tbl)}


@ray.remote
def _strat_write_tiles(tbl: pa.Table, raw_dir: str, z: int, idx: int) -> int:
    """In-task sink for one accepted zoom-pass tile table (only called
    after the zoom's threshold consensus, so no stale retry passes are
    ever written)."""
    import os as _os

    import pyarrow.parquet as pq

    if tbl.num_rows == 0:
        return 0
    path = _os.path.join(raw_dir, f"strat_z{z}_t{idx}.parquet")
    tmp = path + ".inprogress"
    pq.write_table(tbl, tmp)
    _os.replace(tmp, path)
    return tbl.num_rows


@ray.remote(num_returns=3)
def _strat_zoom_task(cfg: VectorConfig, z: int, my_keys, child_refs, entry,
                     leaf_set, is_dropping, attrs_ref, gn_ref, at_origin,
                     poisoned_keys, nextzoom=None, fanout_only=False,
                     parent_shift=1, n_parts=1, use_memo=False,
                     memo_ref=None, par_workers=0):
    """One zoom pass over a subset of the zoom's tiles (run_thread,
    tile.cpp:3081-3199): skip tiles under a leafed parent unless the
    zoom is dropping (revival), process the rest, and report (tile
    rows, children partition refs, threshold proposals). Below minzoom
    the pass is fan-out only: next_feature rewrites children then
    `continue`s before any gate or encode (tile.cpp:1216-1218).

    Exchange contract: `child_refs` holds ONLY the parent partitions
    this task's keys hash into (the driver routes {pid: ref} maps by
    hash(key) % n_parts — the _vp_partition pattern), and the children
    this task produces are returned hash-partitioned the same way as
    {pid: ObjectRef} so the next zoom's tasks fetch only their slice."""
    _prof = None
    if _os_env.get("TPR_STRAT_PROFILE") and z <= int(_os_env.get("TPR_STRAT_PROFILE_MAXZ", "1")):
        import cProfile

        _prof = cProfile.Profile()
        _prof.enable()
    attrs = ray.get(attrs_ref) if isinstance(attrs_ref, ray.ObjectRef) else attrs_ref
    gn = ray.get(gn_ref) if isinstance(gn_ref, ray.ObjectRef) else gn_ref
    # one batched get: per-ref ray.get round-trips cost ~3ms each and
    # a deep zoom's task holds one ref per upstream producer
    _ref_ix = [i for i, r in enumerate(child_refs)
               if isinstance(r, ray.ObjectRef)]
    parts = list(child_refs)
    if _ref_ix:
        for i, v in zip(_ref_ix, ray.get([child_refs[i] for i in _ref_ix])):
            parts[i] = v
    if use_memo:
        # pure-kernel memo across the zoom's consensus retry passes
        # (memo_ref is pass k-1's exported dict, auto-resolved by Ray)
        dv.memo_install(dict(memo_ref) if memo_ref else {})
    rows_by_key: dict = {}
    for part in parts:
        for k in my_keys:
            blobs = part.get(k)
            if blobs:
                rows_by_key.setdefault(k, []).extend(blobs)
    if isinstance(attrs, AttrShards):
        # fetch only the side-table shards this task's rows touch
        attrs = attrs.resolve(
            {r[0] for blobs in rows_by_key.values() for r in blobs})
    vix_of = (attrs or {}).get("__vindex__", _EMPTY_DICT)
    strat = None if fanout_only else {**entry, "out": {}}
    out_rows: list = []
    children: dict = {}
    children_of: dict = {}
    leafed: list = []
    child_poison: set = set()
    for (x, y) in sorted(rows_by_key):
        if (z > 0 and leaf_set and not is_dropping
                and (x >> parent_shift, y >> parent_shift) in leaf_set):
            # parent truncated its pyramid and the zoom is not dropping:
            # skip_tile — no tile, no children (tile.cpp:3186-3195)
            continue
        rows = rows_by_key[(x, y)]
        rows.sort(key=lambda r: (vix_of.get(r[0], 0), r[0]))
        est = None
        if cfg.variable_depth and not fanout_only:
            if (x, y) in poisoned_keys:
                est = 1 << 32  # tile.cpp:2346-2349
            else:
                est = _stream_est(
                    cfg, z, x, y,
                    [(r[0], r[1], r[2], r[3], r[6]) for r in rows], at_origin)
        tile_row, ch, poison = process_tile(
            cfg, z, x, y, rows, global_nodes=gn, est=est, attrs=attrs,
            strat=strat, nextzoom=nextzoom, fanout_only=fanout_only,
            par_workers=par_workers)
        if tile_row is not None:
            out_rows.append(tile_row)
            if tile_row.get("leafed"):
                leafed.append((x, y))
        if ch:
            children_of[(x, y)] = sorted(ch.keys())
        for ck, blobs in ch.items():
            children.setdefault(ck, []).extend(blobs)
            if poison:
                child_poison.add(ck)
    meta = {
        "out": strat["out"] if strat is not None else {},
        "leafed": leafed,
        "child_keys": sorted(children.keys()),
        "children_of": children_of,
        "child_poison": sorted(child_poison),
        # per-zoom maxima of the desired tile size / feature count:
        # the reference's tile_size_out / feature_count_out persist
        # across the zoom's retry passes (tile.cpp:3435-3436 reset per
        # ZOOM, not per pass), so the overflowing pass's values reach
        # the strategies metadata even though its tiles are discarded
        "zoom_tsize": max((r.get("s_tsize", 0) for r in out_rows),
                          default=0),
        "zoom_fcount": max((r.get("s_fcount", 0) for r in out_rows),
                           default=0),
    }
    # hash-partition the children blobs so the next zoom's tasks fetch
    # only their own slice (never every parent's full children dict)
    if use_memo:
        meta["memo"] = ray.put(dv.memo_take())
    by_pid: dict = {}
    for ck, blobs in children.items():
        by_pid.setdefault(hash(ck) % n_parts, {})[ck] = blobs
    part_map = {pid: ray.put(sub) for pid, sub in by_pid.items()}
    if _prof is not None:
        import os as _posx
        import time as _t

        _prof.disable()
        _prof.dump_stats(f"/tmp/strat_z{z}_{_posx.getpid()}_{int(_t.time()*1e6)%10**9}.prof")
    return _tile_rows_table(out_rows), part_map, meta


def _build_strategy_pyramid(
    feat_tbl: "pa.Table | ray.data.Dataset",
    cfg: VectorConfig,
    attrs: dict | None = None,
    raw_dir: str | None = None,
) -> ray.data.Dataset:
    """Zoom-sequential pyramid for the as-needed drop strategies — the
    reference's traverse_zooms shape (tile.cpp:3272-3623): tiles of one
    zoom run in parallel against the zoom's threshold set; if any tile
    overflows and raises a threshold, the WHOLE zoom re-runs with the
    merged maxima (thresholds reset at each new zoom); the surviving
    pass's children become the next zoom's input streams. The per-zoom
    barrier is inherent to the semantics — the reference has the same
    structure.

    Fully distributed: the feature stream is sorted by (vindex, seq)
    as a Dataset, per-block worker tasks build the row parts and the
    per-seq side arrays (never the driver), the per-zoom children
    exchange is hash-partitioned per next-zoom task ({pid: ref} maps),
    and with `raw_dir` each accepted zoom pass writes its tiles to
    parquet inside worker tasks. The driver holds only tile keys,
    threshold proposals, leaf sets and object refs."""
    if isinstance(feat_tbl, pa.Table):
        if len(feat_tbl) == 0:
            return ray.data.from_arrow(_tile_rows_table([]))
        ds = ray.data.from_arrow(feat_tbl)
        nb = max(1, min(int(ray.cluster_resources().get("CPU", 8)),
                        len(feat_tbl) // 8))
        if nb > 1:
            ds = ds.repartition(nb)
    else:
        ds = feat_tbl
    # the globally (index, seq)-sorted stream the reference radix-sorts
    # to (main.cpp:2228-2238) — a distributed range sort; the sorted
    # block refs ARE the root tile's input parts, in stream order
    cols = ds.schema().names
    ds = ds.sort(["vindex", "seq"] if "vindex" in cols else ["seq"])
    ds = ds.materialize()
    blocks = list(ds.to_arrow_refs())
    need_extent = cfg.smallest_active() or cfg.order_by_size()
    g = cfg.resolved_gscale()
    side_pairs = [
        _strat_block_sides.remote(b, g, need_extent) for b in blocks
    ]
    side_metas = ray.get([p[0] for p in side_pairs])
    keep = [i for i, m in enumerate(side_metas) if m["n"]]
    if not keep:
        return ray.data.from_arrow(_tile_rows_table([]))
    blocks = [blocks[i] for i in keep]
    side_metas = [side_metas[i] for i in keep]
    side_arr_refs = [side_pairs[i][1] for i in keep]
    bboxes = [m["bbox"] for m in side_metas if m["bbox"] is not None]
    bbox = None
    if bboxes:
        bbox = (
            min(b[0] for b in bboxes), min(b[1] for b in bboxes),
            max(b[2] for b in bboxes), max(b[3] for b in bboxes),
        )
    iz, ix, iy = _choose_first_zoom_bbox(bbox, cfg.minzoom, cfg.buffer)
    if cfg.one_tile is not None:
        iz, ix, iy = cfg.minzoom, cfg.one_tile[0], cfg.one_tile[1]
    gap_refs = None
    if cfg.densest_active():
        origin = ((ix << (WORLD_BITS - iz), iy << (WORLD_BITS - iz))
                  if iz else (0, 0))
        gap_refs = []
        prev_v = 0
        for i, b in enumerate(blocks):
            gap_refs.append(
                _strat_block_gaps.remote(b, prev_v, origin, cfg.index_scheme))
            prev_v = side_metas[i]["last_v"]
    attrs_ref = _strat_combine_attrs.remote(
        attrs, side_arr_refs, gap_refs, need_extent,
        n_shards=max(8, int(ray.cluster_resources().get("CPU", 8))))
    gn_ref = None
    if cfg.prevent_shared_nodes:
        from ..stages.nodes import shared_nodes_global

        gn_ref = ray.put(shared_nodes_global(ds))
    at_origin = (0, 0)
    if cfg.variable_depth:
        cand = [(m["min_seq"], m.get("origin_xy")) for m in side_metas
                if "min_seq" in m and m.get("origin_xy")]
        if cand:
            _, oxy = min(cand)
            at_origin = (oxy[0] >> g, oxy[1] >> g)
    n_cpus = int(ray.cluster_resources().get("CPU", 8))

    # ---- the reference's zoom schedule (choose_first_zoom
    # main.cpp:1147-1206; threads/shards traverse_zooms
    # tile.cpp:3327-3360,3437; nextzoom jumps write_tile
    # tile.cpp:1686-1697): the root is the deepest single covering tile
    # ≤ minzoom; zooms below minzoom are fan-out-only passes
    # (next_feature rewrites children, then `continue`s before any
    # gate, tile.cpp:1216-1218) and may jump by up to
    # log4(child_shards) levels. child_shards = TEMP_FILES/threads
    # where threads is data-dependent (the number of non-empty geom
    # shard files), so the shard placement of children is emulated on
    # the driver: child (jx, jy) of a tile processed by thread T lands
    # in file T*child_shards + ((jx << mzi) | (jy & (2^mzi - 1))) &
    # (child_shards - 1) (rewrite, tile.cpp:488-510); the dispatch
    # queue is fileno-sorted and popped from the back
    # (run_thread tile.cpp:3093-3099).
    cpus, temp_files = _tippecanoe_cpus_tempfiles()
    # fixed hash-partition count for the children exchange; the root
    # tile's input parts are the sorted blocks themselves, unpacked to
    # rows inside worker tasks (stream order = block order)
    n_parts = max(1, 4 * n_cpus)
    root_key = (ix, iy)
    root_pid = hash(root_key) % n_parts
    child_parts: list = [
        {root_pid: _strat_block_rows.remote(b, root_key)} for b in blocks
    ]
    keys: list = [root_key]
    key_file: dict = {root_key: 0}
    poisoned: set = set()
    leaf_set: frozenset = frozenset()
    tile_refs: list = []
    write_refs: list = []
    z = iz
    prev_z = max(iz - 1, 0)
    eff_maxzoom = cfg.maxzoom
    # -ae is unbounded; --extend-zooms-if-still-dropping-maximum N is a
    # decrementing budget (main.cpp:90-91)
    ez_budget = None if cfg.extend_zooms else cfg.extend_zooms_max
    while z <= eff_maxzoom and keys:
        useful = sorted({key_file.get(k, 0) for k in keys})
        threads = max(1, min(cpus, temp_files // 4, len(useful)))
        if threads > 1:
            threads = 1 << int(math.log(threads) / math.log(2))
        child_shards = temp_files // threads
        mzi = max(1, int(math.log(child_shards) / math.log(4)))
        nextzoom = z + 1
        if nextzoom < cfg.minzoom:
            nextzoom = cfg.minzoom if z + mzi > cfg.minzoom else z + mzi
        thread_of_file = {
            f: i % threads
            for i, f in enumerate(sorted(useful, reverse=True))
        }
        fanout_only = z < cfg.minzoom
        parent_shift = z - prev_z if z > iz else 1

        entry = _fresh_thresholds(cfg)
        _z_t0 = _time.time()
        task_out: list = []
        metas: list = []
        zoom_tsize = zoom_fcount = 0
        by_pid: dict[int, list] = {}
        for k in keys:
            by_pid.setdefault(hash(k) % n_parts, []).append(k)
        pids_sorted = sorted(by_pid)
        ntasks = max(1, min(n_cpus, len(pids_sorted)))
        task_pids = [pids_sorted[i::ntasks] for i in range(ntasks)]
        task_pids = [tp for tp in task_pids if tp]
        # pure-kernel memo across retry passes: worth shipping only on
        # parallelism-starved zooms, where per-pass serial constants
        # dominate (deep zooms amortize retries across many tasks)
        memo_gate = not fanout_only and len(keys) < 2 * n_cpus
        memo_refs: list = [None] * len(task_pids)
        # parallelism-starved zoom: fewer tiles than CPUs -> let each
        # tile fan its simplification workers out as Ray subtasks
        # (mirrors the reference's in-tile worker threads)
        z_par_workers = (max(0, n_cpus // max(1, len(keys)))
                         if not fanout_only and len(keys) < n_cpus // 2
                         else 0)
        for _pass in range(1 if fanout_only else 64):
            cfg_pass = (cfg if eff_maxzoom == cfg.maxzoom
                        else dataclasses.replace(cfg, maxzoom=eff_maxzoom))
            is_dropping = _dropping_features(entry)
            task_out = [
                _strat_zoom_task.remote(
                    cfg_pass, z,
                    sorted(k for pid in tp for k in by_pid[pid]),
                    # only the parent partitions this task's keys hash
                    # into — never any other task's children
                    [pm[pid] for pm in child_parts for pid in tp
                     if pid in pm],
                    entry, leaf_set, is_dropping,
                    attrs_ref, gn_ref, at_origin, poisoned,
                    nextzoom=nextzoom, fanout_only=fanout_only,
                    parent_shift=parent_shift, n_parts=n_parts,
                    use_memo=memo_gate, memo_ref=memo_refs[ti],
                    par_workers=z_par_workers)
                for ti, tp in enumerate(task_pids)
            ]
            metas = ray.get([t[2] for t in task_out])
            if memo_gate:
                memo_refs = [m.get("memo") for m in metas]
            # the extension check runs per pass, BEFORE the again/break
            # (traverse_zooms tile.cpp:3544-3556): a still-dropping
            # deepest zoom grows maxzoom by one — even when no shared
            # threshold rose (-pd keeps thresholds tile-local)
            if (any(m["out"].get("still_dropping") for m in metas)
                    and (cfg.extend_zooms or (ez_budget or 0) > 0)
                    and z == eff_maxzoom and eff_maxzoom < 24):
                eff_maxzoom += 1
                if ez_budget:
                    ez_budget -= 1
            zoom_tsize = max(zoom_tsize,
                             *(m.get("zoom_tsize", 0) for m in metas), 0)
            zoom_fcount = max(zoom_fcount,
                              *(m.get("zoom_fcount", 0) for m in metas), 0)
            entry, again = _merge_proposals(entry, [m["out"] for m in metas])
            if not again:
                break
        if _os_env.get("TPR_STRAT_DEBUG"):
            print(
                f"[strat] z={z} keys={len(keys)} tasks={len(task_pids)} "
                f"passes={_pass + 1} wall={_time.time() - _z_t0:.2f}s",
                file=_sys.stderr,
            )
        phantom = None
        if zoom_tsize or zoom_fcount:
            # counter-only phantom row carrying the zoom's desired
            # size/count maxima from the DISCARDED overflow passes
            phantom = _tile_rows_table([
                {"z": z, "x": 0, "y": 0, "n_features": 0, "tile": b"",
                 "s_tsize": zoom_tsize, "s_fcount": zoom_fcount}
            ])
        if raw_dir is not None:
            # in-task sink: only the accepted (consensus) pass lands
            write_refs.extend(
                _strat_write_tiles.remote(t[0], raw_dir, z, i)
                for i, t in enumerate(task_out)
            )
            if phantom is not None:
                write_refs.append(_strat_write_tiles.remote(
                    phantom, raw_dir, z, len(task_out)))
        else:
            tile_refs.extend(t[0] for t in task_out)
            if phantom is not None:
                tile_refs.append(ray.put(phantom))
        child_parts = ray.get([t[1] for t in task_out])
        new_key_file: dict = {}
        span = 1 << mzi
        for m in metas:
            for pk, cks in m["children_of"].items():
                t_of = thread_of_file.get(key_file.get(pk, 0), 0)
                for (cx, cy) in cks:
                    j = ((cx << mzi) | (cy & (span - 1))) & (child_shards - 1)
                    new_key_file[(cx, cy)] = t_of * child_shards + j
        key_file = new_key_file
        keys = sorted({k for m in metas for k in m["child_keys"]})
        poisoned = {k for m in metas for k in m["child_poison"]}
        leaf_set = frozenset(
            (x, y) for m in metas for (x, y) in m["leafed"]
        )
        prev_z = z
        z = nextzoom
    if raw_dir is not None:
        import os as _os

        import pyarrow.parquet as pq

        n_written = sum(ray.get(write_refs)) if write_refs else 0
        have = [f for f in _os.listdir(raw_dir) if f.endswith(".parquet")]
        if n_written == 0 and not have:
            pq.write_table(_tile_rows_table([]),
                           _os.path.join(raw_dir, "strat_empty.parquet"))
        return ray.data.read_parquet(raw_dir).map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow")
    return ray.data.from_arrow_refs(tile_refs)


def build_vector_pyramid(
    feat_tbl: "pa.Table | ray.data.Dataset",
    cfg: VectorConfig | None = None,
    out_dir: str | None = None,
    resume: bool = False,
    n_rows: int | None = None,
    attrs: dict | None = None,
) -> ray.data.Dataset:
    """Full pyramid over ingested features (see ingest_features /
    ingest_features_ds). Returns a Dataset of
    (z, x, y, n_features, tile).

    Without out_dir the tile rows stream out of the grouped encode —
    the driver never holds the tileset. With out_dir, every group
    writes its tiles to out_dir/raw/g_<z>_<x>_<y>/ inside the task
    (the resumable unit; resume=True skips finished groups BEFORE the
    shuffle), a summary lands in out_dir/summary.parquet, and the
    returned Dataset reads the sink lazily."""
    import os

    cfg = cfg or VectorConfig()
    if cfg.strategies_active() or (cfg.minzoom > 0 and cfg.one_tile is None):
        # gamma/-K/as-needed strategies need the zoom-sequential
        # consensus orchestration (whole-zoom retries with shared
        # thresholds); the subtree cascade cannot express it.
        # minzoom > 0 also routes here: the reference's below-minzoom
        # passes JUMP zooms (nextzoom = z+log4(child_shards) capped at
        # minzoom, write_tile tile.cpp:1686-1697), clipping features
        # DIRECTLY from the root to the jump target — the stepwise
        # z+1 cascade composes clips differently (an intermediate
        # boundary can add/move a snapped vertex, caught by the flag
        # fuzzer on the dateline corpus at -Z2 -d10), while this
        # driver emulates the reference's exact schedule (-R keeps the
        # cascade: the root tile IS the single subtree, no jumps)
        raw_dir = None
        if out_dir:
            raw_dir = os.path.join(out_dir, "raw")
            os.makedirs(raw_dir, exist_ok=True)
            for f in os.listdir(raw_dir):
                if f.startswith("strat_") and f.endswith(".parquet"):
                    os.remove(os.path.join(raw_dir, f))
        return _build_strategy_pyramid(feat_tbl, cfg, attrs=attrs,
                                       raw_dir=raw_dir)
    if isinstance(feat_tbl, pa.Table):
        if n_rows is None:
            n_rows = len(feat_tbl)
        if n_rows == 0:
            return ray.data.from_arrow(_tile_rows_table([]))
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        ds = ray.data.from_arrow(feat_tbl)
        nb = max(1, min(n_cpus, n_rows // 8))
        if nb > 1:
            ds = ds.repartition(nb)
    else:
        ds = feat_tbl
        if n_rows is None:
            n_rows = ds.count()
        if n_rows == 0:
            return ray.data.from_arrow(_tile_rows_table([]))
    b = cfg.bucket_zoom
    if b is None:
        b = auto_vector_bucket_zoom(n_rows, cfg.maxzoom)
    b = max(0, min(b, cfg.maxzoom))
    if cfg.one_tile is not None:
        # -R: the root tile IS the one zoom-B subtree
        b = cfg.minzoom

    shared_ref = None
    if cfg.prevent_shared_nodes:
        # -pn global pass (main.cpp:2015-2169): detect shared nodes
        # over the ingested features, broadcast the sorted index array
        from ..stages.nodes import shared_nodes_global

        ds = ds.materialize()  # consumed twice: node pass + cascade
        shared_ref = ray.put(shared_nodes_global(ds))

    raw_dir = os.path.join(out_dir, "raw") if out_dir else None
    rows = ds.map_batches(CascadeFan(cfg, b), batch_format="pyarrow")
    if resume and raw_dir and os.path.isdir(raw_dir):
        done = set()
        for name in os.listdir(raw_dir):
            if name.startswith("g_") and os.path.exists(
                os.path.join(raw_dir, name, "part-0.parquet")
            ):
                zz, xx, yy = (int(v) for v in name[2:].split("_"))
                done.add(_gkey(zz, xx, yy))
        if done:
            done_ref = ray.put(done)

            def _not_done(t: pa.Table) -> pa.Table:
                d = ray.get(done_ref) if isinstance(done_ref, ray.ObjectRef) else done_ref
                g = t["gkey"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(~np.isin(g, list(d))))

            rows = rows.map_batches(_not_done, batch_format="pyarrow")
    if raw_dir:
        os.makedirs(raw_dir, exist_ok=True)
    at_origin = (0, 0)
    if cfg.variable_depth:
        g = cfg.resolved_gscale()
        if isinstance(feat_tbl, pa.Table):
            at_origin = stream_origin(feat_tbl, g)
        else:
            # min-seq row of the ingested Dataset (tiny driver fetch)
            import pandas as _pd

            first = ds.sort("seq").limit(1).take_all()
            if first:
                fxy = np.frombuffer(first[0]["xy"], dtype=np.int64).reshape(-1, 2)
                at_origin = (int(fxy[0, 0]) >> g, int(fxy[0, 1]) >> g)
    # seq-range shards, not one O(dataset) broadcast object
    attrs_ref = (_shard_attr_dict(
        attrs, max(8, int(ray.cluster_resources().get("CPU", 8))))
        if attrs else None)
    encoder = GroupEncoder(cfg, b, raw_dir, shared_ref, at_origin=at_origin,
                           attrs_ref=attrs_ref)
    if cfg.variable_depth and b > 0:
        # -at is zoom-sequential above the bucket zoom (the reference's
        # per-zoom traverse with skip_children, tile.cpp:3179-3199,
        # 3389-3410): a leafed tile prunes every descendant, so each
        # zoom's leaf set must be known before the next zoom encodes.
        rows_mat = rows.materialize()
        leaf: set[tuple[int, int, int]] = set()
        part_list = []
        for zz in range(0, b + 1):
            leaf_now = frozenset(leaf)

            def _zoom_rows(t: pa.Table, _zz=zz, _leaf=leaf_now) -> pa.Table:
                gk = t["gkey"].to_numpy(zero_copy_only=False)
                m = (gk >> 56) == _zz
                if _leaf and m.any():
                    xs = (gk >> 28) & ((1 << 28) - 1)
                    ys = gk & ((1 << 28) - 1)
                    for i in np.flatnonzero(m):
                        x_, y_ = int(xs[i]), int(ys[i])
                        for za in range(_zz):
                            if (za, x_ >> (_zz - za), y_ >> (_zz - za)) in _leaf:
                                m[i] = False
                                break
                return t.filter(pa.array(m))

            zrows = rows_mat.map_batches(_zoom_rows, batch_format="pyarrow")
            grouped_z = _grouped_exchange(zrows, encoder)
            grouped_z = grouped_z.materialize()
            part_list.append(grouped_z)
            if zz < b:
                if raw_dir:
                    for r in grouped_z.take_all():
                        if int(r.get("n_leafed", 0)):
                            leaf.add((int(r["gz"]), int(r["gx"]), int(r["gy"])))
                else:
                    for r in grouped_z.select_columns(
                        ["z", "x", "y", "leafed"]
                    ).take_all():
                        if int(r["leafed"]):
                            leaf.add((int(r["z"]), int(r["x"]), int(r["y"])))
        grouped = part_list[0]
        for pds in part_list[1:]:
            grouped = grouped.union(pds)
    else:
        grouped = _grouped_exchange(rows, encoder)
    if not out_dir:
        return grouped
    # force execution; the summary is tiny (one row per group)
    import pyarrow.parquet as pq

    _tbls = ray.get(grouped.to_arrow_refs())
    _tbls = [t for t in _tbls if t.num_rows]
    new_sum = (
        pa.concat_tables(_tbls)
        if _tbls
        else pa.table(
            {
                "gz": pa.array([], pa.int32()),
                "gx": pa.array([], pa.int32()),
                "gy": pa.array([], pa.int32()),
                "n_tiles": pa.array([], pa.int64()),
                "n_features": pa.array([], pa.int64()),
                "n_leafed": pa.array([], pa.int64()),
            }
        )
    )
    sums = [new_sum] if len(new_sum) else []
    sum_path = os.path.join(out_dir, "summary.parquet")
    if resume and os.path.exists(sum_path) and len(new_sum):
        prev = pq.read_table(sum_path)
        seen = set(
            zip(
                new_sum["gz"].to_pylist(),
                new_sum["gx"].to_pylist(),
                new_sum["gy"].to_pylist(),
            )
        )
        keep = [
            i
            for i, k in enumerate(
                zip(prev["gz"].to_pylist(), prev["gx"].to_pylist(), prev["gy"].to_pylist())
            )
            if k not in seen
        ]
        sums.append(prev.take(keep))
    elif resume and os.path.exists(sum_path):
        sums.append(pq.read_table(sum_path))
    if sums:
        pq.write_table(pa.concat_tables(sums), sum_path)
    return ray.data.read_parquet(raw_dir).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
