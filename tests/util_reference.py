"""Golden-fixture harness: run the reference tippecanoe binary (built
from /root/reference into /tmp/refbuild — used as an oracle only, no
code copied) on GeoJSON derived from our deterministic geotag rule, and
extract per-tile feature counts for exact-match comparison
(FIXTURES.md §2; the reference's own test strategy, Makefile:161-165).
"""

from __future__ import annotations

import gzip
import json
import os
import sqlite3
import subprocess
import tempfile

import numpy as np

from tippecanoe_ray.functions.spatial import world_to_lonlat
from tippecanoe_ray.stages.mvt import decode_tile

TIPPECANOE = "/tmp/refbuild/tippecanoe"


def write_geojson(path: str, wx: np.ndarray, wy: np.ndarray,
                  fmin: np.ndarray | None = None, fmax: np.ndarray | None = None):
    """One point feature per row, full-precision coordinates, in seq
    order (tippecanoe's seq = input order); optional per-feature
    tippecanoe extension minzoom/maxzoom (geojson.cpp:81-100)."""
    lon, lat = world_to_lonlat(wx, wy)
    with open(path, "w") as f:
        for i in range(len(wx)):
            feat = {
                "type": "Feature",
                "properties": {},
                "geometry": {"type": "Point", "coordinates": [float(lon[i]), float(lat[i])]},
            }
            tc = {}
            if fmin is not None and fmin[i] >= 0:
                tc["minzoom"] = int(fmin[i])
            if fmax is not None and fmax[i] >= 0:
                tc["maxzoom"] = int(fmax[i])
            if tc:
                feat["tippecanoe"] = tc
            f.write(json.dumps(feat, separators=(",", ":")) + "\n")


def run_reference(
    wx: np.ndarray,
    wy: np.ndarray,
    maxzoom: int,
    minzoom: int = 0,
    droprate: float | None = None,
    extra_flags: list[str] | None = None,
    fmin: np.ndarray | None = None,
    fmax: np.ndarray | None = None,
) -> dict[tuple[int, int, int], int]:
    """Run the reference binary; return {(z, x, y): n_features}."""
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        write_geojson(gj, wx, wy, fmin=fmin, fmax=fmax)
        cmd = [
            TIPPECANOE,
            "-o", mb,
            f"-z{maxzoom}",
            f"-Z{minzoom}",
            "-b0",  # buffer 0: one tile per point per zoom
            "--no-tile-size-limit",
            "-q",
        ]
        if droprate is not None:
            if droprate == 1:
                cmd.append("-r1")
            else:
                cmd.append(f"-r{droprate}")
        if extra_flags:
            cmd += extra_flags
        cmd.append(gj)
        subprocess.run(cmd, check=True, capture_output=True)
        return read_mbtiles_counts(mb)


def read_mbtiles_counts(path: str) -> dict[tuple[int, int, int], int]:
    out: dict[tuple[int, int, int], int] = {}
    con = sqlite3.connect(path)
    for z, col, row, data in con.execute(
        "select zoom_level, tile_column, tile_row, tile_data from tiles"
    ):
        y = (1 << z) - 1 - row  # TMS → XYZ flip
        layers = decode_tile(bytes(data))
        n = sum(len(l["features"]) for l in layers)
        out[(z, col, y)] = n
    con.close()
    return out


def tile_counts_from_ds(tile_ds) -> dict[tuple[int, int, int], int]:
    out = {}
    for r in tile_ds.select_columns(["z", "x", "y", "n_features"]).take_all():
        out[(int(r["z"]), int(r["x"]), int(r["y"]))] = int(r["n_features"])
    return out


def diff_counts(a: dict, b: dict, limit: int = 10) -> list[str]:
    msgs = []
    for k in sorted(set(a) | set(b)):
        va, vb = a.get(k), b.get(k)
        if va != vb:
            msgs.append(f"{k}: ours={va} ref={vb}")
            if len(msgs) >= limit:
                break
    return msgs


# ---------------------------------------------------- line/polygon fixtures


def write_geojson_geoms(path: str, feats: list[tuple[str, list[np.ndarray]]]):
    """feats: (kind∈{line, polygon}, parts) with parts = list of (n,2)
    world-coordinate arrays (line parts / polygon rings, rings closed).
    Written in seq order with full-precision coordinates."""
    with open(path, "w") as f:
        for kind, parts in feats:
            coords = []
            for arr in parts:
                lon, lat = world_to_lonlat(arr[:, 0], arr[:, 1])
                coords.append([[float(a), float(b)] for a, b in zip(lon, lat)])
            if kind == "polygon":
                geometry = {"type": "Polygon", "coordinates": coords}
            elif len(coords) == 1:
                geometry = {"type": "LineString", "coordinates": coords[0]}
            else:
                geometry = {"type": "MultiLineString", "coordinates": coords}
            feat = {"type": "Feature", "properties": {}, "geometry": geometry}
            f.write(json.dumps(feat, separators=(",", ":")) + "\n")


def run_reference_geoms(
    feats, maxzoom: int, minzoom: int = 0, extra_flags: list[str] | None = None
) -> dict[tuple[int, int, int], int]:
    """Run the reference binary on line/polygon features (default
    buffer); returns {(z, x, y): n_features}."""
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        write_geojson_geoms(gj, feats)
        cmd = [
            TIPPECANOE, "-o", mb, f"-z{maxzoom}", f"-Z{minzoom}",
            "--no-tile-size-limit", "-q",
        ]
        if extra_flags:
            cmd += extra_flags
        cmd.append(gj)
        subprocess.run(cmd, check=True, capture_output=True)
        return read_mbtiles_counts(mb)


def geoms_to_table(feats):
    """The same features as our vector-pyramid input table, using the
    identical text→double→world round trip the reference sees."""
    from tippecanoe_ray.functions.spatial import lonlat_to_world
    from tippecanoe_ray.pipelines.vector_pyramid import features_table

    rows = []
    for seq, (kind, parts) in enumerate(feats):
        ops_l = []
        xy_l = []
        for arr in parts:
            lon, lat = world_to_lonlat(arr[:, 0], arr[:, 1])
            # round-trip through text like the reference reads GeoJSON
            lon = np.array([float(json.loads(json.dumps(float(v)))) for v in lon])
            lat = np.array([float(json.loads(json.dumps(float(v)))) for v in lat])
            wx, wy = lonlat_to_world(lon, lat)
            n = len(arr)
            ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
            xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
        t = 3 if kind == "polygon" else 2
        rows.append((seq, t, np.concatenate(ops_l), np.concatenate(xy_l)))
    return features_table(rows)


def synth_vector_corpus(n_lines: int = 30, n_polys: int = 20, seed: int = 7):
    """Deterministic lines + polygons, kept away from the world edges
    (no dateline handling yet)."""
    rs = np.random.RandomState(seed)
    lo, hi = 1 << 28, (1 << 32) - (1 << 28)
    feats = []
    for _ in range(n_lines):
        n = rs.randint(4, 60)
        start = rs.randint(lo + (1 << 27), hi - (1 << 27), size=2)
        steps = rs.randint(-(1 << 23), 1 << 23, size=(n, 2))
        pts = np.cumsum(np.vstack([start, steps]), axis=0).clip(lo, hi)
        feats.append(("line", [pts.astype(np.int64)]))
    for _ in range(n_polys):
        cx, cy = rs.randint(lo + (1 << 27), hi - (1 << 27), size=2)
        k = rs.randint(5, 30)
        ang = np.sort(rs.uniform(0, 2 * np.pi, k))
        rad = rs.randint(1 << 20, 1 << 25, size=k)
        xs = (cx + rad * np.cos(ang)).clip(lo, hi)
        ys = (cy + rad * np.sin(ang)).clip(lo, hi)
        ring = np.stack([xs, ys], axis=1).astype(np.int64)
        ring = np.vstack([ring, ring[:1]])
        if rs.rand() < 0.5:
            ring = ring[::-1]  # mixed winding exercises fix_polygon
        feats.append(("polygon", [ring]))
    return feats


def synth_vector_hard(seed: int = 11):
    """Adversarial vector corpus: polygons with holes, multilines,
    tiny polygons (tiny-poly reduction engages at low zooms), long
    diagonal lines crossing many tiles."""
    rs = np.random.RandomState(seed)
    lo, hi = 1 << 28, (1 << 32) - (1 << 28)
    feats = []
    # polygons with holes
    for _ in range(8):
        cx, cy = rs.randint(lo + (1 << 27), hi - (1 << 27), size=2)
        k = rs.randint(8, 20)
        ang = np.sort(rs.uniform(0, 2 * np.pi, k))
        rad = rs.randint(1 << 23, 1 << 25, size=k)
        xs = (cx + rad * np.cos(ang)).clip(lo, hi)
        ys = (cy + rad * np.sin(ang)).clip(lo, hi)
        outer = np.stack([xs, ys], axis=1).astype(np.int64)
        outer = np.vstack([outer, outer[:1]])
        hole_r = rad.min() // 3
        ang2 = np.sort(rs.uniform(0, 2 * np.pi, 6))
        hx = (cx + hole_r * np.cos(ang2)).astype(np.int64)
        hy = (cy + hole_r * np.sin(ang2)).astype(np.int64)
        hole = np.stack([hx, hy], axis=1)
        hole = np.vstack([hole, hole[:1]])[::-1]
        feats.append(("polygon", [outer, hole.astype(np.int64)]))
    # tiny polygons (reduce at low zooms)
    for _ in range(20):
        cx, cy = rs.randint(lo + (1 << 27), hi - (1 << 27), size=2)
        r = rs.randint(1 << 14, 1 << 18)
        ang = np.sort(rs.uniform(0, 2 * np.pi, 5))
        xs = (cx + r * np.cos(ang)).astype(np.int64)
        ys = (cy + r * np.sin(ang)).astype(np.int64)
        ring = np.stack([xs, ys], axis=1)
        ring = np.vstack([ring, ring[:1]])
        feats.append(("polygon", [ring]))
    # long diagonal lines
    for _ in range(6):
        x0, y0 = rs.randint(lo, lo + (1 << 29), size=2)
        x1, y1 = rs.randint(hi - (1 << 29), hi, size=2)
        n = 40
        t = np.linspace(0, 1, n)
        xs = (x0 + (x1 - x0) * t + rs.randint(-(1 << 20), 1 << 20, n)).clip(lo, hi)
        ys = (y0 + (y1 - y0) * t + rs.randint(-(1 << 20), 1 << 20, n)).clip(lo, hi)
        feats.append(("line", [np.stack([xs, ys], axis=1).astype(np.int64)]))
    # multilinestrings
    for _ in range(5):
        parts = []
        for _ in range(rs.randint(2, 5)):
            n = rs.randint(3, 12)
            start = rs.randint(lo + (1 << 27), hi - (1 << 27), size=2)
            steps = rs.randint(-(1 << 22), 1 << 22, size=(n, 2))
            pts = np.cumsum(np.vstack([start, steps]), axis=0).clip(lo, hi)
            parts.append(pts.astype(np.int64))
        feats.append(("line", parts))
    return feats


def run_reference_attrs(
    wx, wy, vals, maxzoom: int, droprate: float | None = None,
    extra_flags: list[str] | None = None, attrs: tuple[str, ...] = ("val",),
    keep_order: bool = False,
) -> dict[tuple[int, int, int], dict]:
    """Reference run with a numeric `val` property per feature; returns
    {(z,x,y): {"n": count, attr: sorted value list, ...}} from decoded
    tiles."""
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        lon, lat = world_to_lonlat(wx, wy)
        with open(gj, "w") as f:
            for i in range(len(wx)):
                feat = {
                    "type": "Feature",
                    "properties": {"val": int(vals[i])},
                    "geometry": {"type": "Point",
                                 "coordinates": [float(lon[i]), float(lat[i])]},
                }
                f.write(json.dumps(feat, separators=(",", ":")) + "\n")
        cmd = [TIPPECANOE, "-o", mb, f"-z{maxzoom}", "-Z0", "-b0",
               "--no-tile-size-limit", "-q"]
        if droprate is not None:
            cmd.append(f"-r{droprate}" if droprate != 1 else "-r1")
        if extra_flags:
            cmd += extra_flags
        cmd.append(gj)
        subprocess.run(cmd, check=True, capture_output=True)
        return read_mbtiles_attrs(mb, attrs, keep_order=keep_order)


def read_mbtiles_attrs(path: str, attrs: tuple[str, ...], keep_order: bool = False) -> dict:
    out = {}
    con = sqlite3.connect(path)
    for z, col, row, data in con.execute(
        "select zoom_level, tile_column, tile_row, tile_data from tiles"
    ):
        y = (1 << z) - 1 - row
        layers = decode_tile(bytes(data))
        rec = {"n": sum(len(l["features"]) for l in layers)}
        for a in attrs:
            vals = []
            for l in layers:
                for f in l["features"]:
                    v = f.get("tags", {}).get(a)
                    if v is not None:
                        vals.append(float(v) if not isinstance(v, str) else v)
            rec[a] = vals if keep_order else sorted(vals)
        out[(z, col, y)] = rec
    con.close()
    return out


def tile_attrs_from_ds(tile_ds, attrs: tuple[str, ...], keep_order: bool = False) -> dict:
    out = {}
    for r in tile_ds.select_columns(["z", "x", "y", "n_features", "tile"]).take_all():
        key = (int(r["z"]), int(r["x"]), int(r["y"]))
        rec = {"n": int(r["n_features"])}
        layers = decode_tile(bytes(r["tile"]))
        for a in attrs:
            vals = []
            for l in layers:
                for f in l["features"]:
                    v = f.get("tags", {}).get(a)
                    if v is not None:
                        vals.append(float(v) if not isinstance(v, str) else v)
            rec[a] = vals if keep_order else sorted(vals)
        out[key] = rec
    return out
