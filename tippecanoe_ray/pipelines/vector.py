"""Line/polygon tiling — the geometry side of the per-tile pipeline
(SURVEY.md §2.5 / M3): fan-out by buffered bbox, per-tile clip,
zoom-scaled simplification, MVT encode.

Dataflow per zoom (the reference's rewrite → clip → simplify,
tile.cpp:443-533 / 974-1057 / 595-665, re-expressed):

  features (id, kind, parts: list of world-coord arrays)
   → map_batches: explode to (tile, feature) pairs — every tile the
     buffered bbox touches (flat fan-out; a line crossing k tiles
     yields k rows of ids + coords, not k payload copies of anything
     heavier)
   → groupby (tx, ty) → per-tile: clip (Sutherland–Hodgman polygons /
     Cohen–Sutherland lines, buffered bounds), Douglas–Peucker with
     tolerance (1 << (32 - detail - z)) · simplification
     (simplify_feature, tile.cpp:595-665), winding fix, MVT encode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.geometry import (
    clip_linestring,
    clip_polygon_sh,
    douglas_peucker,
    fix_polygon_winding,
    shoelace_area,
)
from ..stages.mvt import encode_layer, encode_linestring, encode_polygon, encode_tile

WORLD_BITS = 32


def explode_to_tiles(df: pd.DataFrame, z: int, buffer_256: int = 5) -> pd.DataFrame:
    """One row per (feature, touched tile) at zoom z."""
    shift = WORLD_BITS - z
    span = 1 << shift
    buf = span * buffer_256 // 256
    nmax = (1 << z) - 1
    rows = {"tx": [], "ty": [], "fid": [], "kind": [], "parts": []}
    for fid, kind, parts in zip(df["fid"], df["kind"], df["parts"]):
        arrs = [np.asarray(p, dtype=np.int64).reshape(-1, 2) for p in parts]
        allpts = np.concatenate(arrs)
        x0 = max((int(allpts[:, 0].min()) - buf) >> shift, 0)
        x1 = min((int(allpts[:, 0].max()) + buf) >> shift, nmax)
        y0 = max((int(allpts[:, 1].min()) - buf) >> shift, 0)
        y1 = min((int(allpts[:, 1].max()) + buf) >> shift, nmax)
        for tx in range(x0, x1 + 1):
            for ty in range(y0, y1 + 1):
                rows["tx"].append(tx)
                rows["ty"].append(ty)
                rows["fid"].append(fid)
                rows["kind"].append(kind)
                rows["parts"].append(parts)
    return pd.DataFrame(rows)


def _tile_geometry(parts, kind, z, tx, ty, detail, buffer_256, simplification):
    """Clip to the buffered tile, simplify, convert to tile-local extent
    coordinates. Returns list of local-coordinate arrays (or None)."""
    shift = WORLD_BITS - z
    span = 1 << shift
    buf = span * buffer_256 // 256
    minx, miny = tx * span - buf, ty * span - buf
    maxx, maxy = (tx + 1) * span + buf, (ty + 1) * span + buf
    tol = (1 << max(0, WORLD_BITS - detail - z)) * simplification
    ext_shift = WORLD_BITS - z - detail
    out = []
    for p in parts:
        arr = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        if kind == "polygon":
            clipped = clip_polygon_sh(arr, minx, miny, maxx, maxy)
            if len(clipped) < 4:
                continue
            keep = douglas_peucker(clipped, tol, retain=4)
            ring = clipped[keep]
            if len(ring) < 4 or abs(shoelace_area(ring)) == 0:
                continue
            out.append(ring)
        else:
            for seg in clip_linestring(arr, minx, miny, maxx, maxy):
                if len(seg) < 2:
                    continue
                keep = douglas_peucker(seg, tol)
                seg = seg[keep]
                if len(seg) >= 2:
                    out.append(seg)
    if not out:
        return None
    if kind == "polygon":
        out = fix_polygon_winding(out)
    local = []
    for g in out:
        lx = (g[:, 0] - tx * span) * (1 << detail) / span
        ly = (g[:, 1] - ty * span) * (1 << detail) / span
        local.append(np.stack([lx, ly], axis=1).round().astype(np.int64))
    return local


def build_vector_tiles(
    ds: ray.data.Dataset,
    z: int,
    detail: int = 12,
    buffer_256: int = 5,
    simplification: float = 1.0,
    layer_name: str = "geoms",
    compress: bool = True,
) -> ray.data.Dataset:
    """Tiles at one zoom for a dataset of line/polygon features with
    columns (fid, kind∈{line,polygon}, parts: list of flat [x0,y0,x1,
    y1,…] world-coordinate lists)."""

    exploded = ds.map_batches(
        lambda df: explode_to_tiles(df, z, buffer_256), batch_format="pandas"
    )

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        tx = int(g["tx"].iloc[0])
        ty = int(g["ty"].iloc[0])
        feats = []
        for fid, kind, parts in zip(g["fid"], g["kind"], g["parts"]):
            local = _tile_geometry(parts, kind, z, tx, ty, detail, buffer_256, simplification)
            if local is None:
                continue
            if kind == "polygon":
                geom = encode_polygon(local)
                ftype = 3
            else:
                geom = encode_linestring(local)
                ftype = 2
            feats.append({"geom": geom, "type": ftype, "id": int(fid)})
        if not feats:
            return pd.DataFrame({"z": [], "x": [], "y": [], "n_features": [], "tile": []})
        layer = encode_layer(layer_name, feats, 1 << detail)
        return pd.DataFrame(
            {
                "z": [z], "x": [tx], "y": [ty], "n_features": [len(feats)],
                "tile": [encode_tile([layer], compress=compress)],
            }
        )

    return exploded.groupby(["tx", "ty"]).map_groups(per_tile, batch_format="pandas")


def synth_lines_polys(n_lines: int = 20, n_polys: int = 10, seed: int = 42) -> ray.data.Dataset:
    """Deterministic synthetic line/polygon features on the world plane."""
    rs = np.random.RandomState(seed)
    rows = {"fid": [], "kind": [], "parts": []}
    base = 1 << 30
    for i in range(n_lines):
        n = rs.randint(5, 40)
        start = rs.randint(base, 3 * base, size=2)
        steps = rs.randint(-(1 << 24), 1 << 24, size=(n, 2))
        pts = np.cumsum(np.vstack([start, steps]), axis=0).clip(0, (1 << 32) - 1)
        rows["fid"].append(i)
        rows["kind"].append("line")
        rows["parts"].append([pts.astype(np.int64).ravel().tolist()])
    for i in range(n_polys):
        cx, cy = rs.randint(base, 3 * base, size=2)
        k = rs.randint(6, 24)
        ang = np.sort(rs.uniform(0, 2 * np.pi, k))
        rad = rs.randint(1 << 22, 1 << 26, size=k)
        xs = (cx + rad * np.cos(ang)).clip(0, (1 << 32) - 1)
        ys = (cy + rad * np.sin(ang)).clip(0, (1 << 32) - 1)
        ring = np.stack([xs, ys], axis=1).astype(np.int64)
        ring = np.vstack([ring, ring[:1]])
        rows["fid"].append(n_lines + i)
        rows["kind"].append("polygon")
        rows["parts"].append([ring.ravel().tolist()])
    return ray.data.from_pandas(pd.DataFrame(rows))
