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
