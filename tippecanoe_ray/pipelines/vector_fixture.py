"""Deterministic vector oracle corpus + reference-binary fixtures.

The driver's SQL oracle cannot express the full clip/simplify cascade,
so the two vector queries (`vector_pyramid_counts`, `vector_tiles_z3`)
are anchored to the strongest oracle available: the reference binary
itself. `tools/build_vector_oracle_fixtures.py` runs the reference
tippecanoe over THIS corpus once at fixture-build time and commits its
decoded per-tile feature counts as parquet under
`tippecanoe_ray/fixtures/`; the driver's oracle SQL is then a plain
`read_parquet` of the committed fixture, and the Ray query must match
it row-for-row and value-for-value.

The corpus goes through the same text round trip the reference sees
(world → lon/lat → JSON text → double → world), so both engines ingest
bit-identical coordinates (geojson.cpp:143-166 parsing path).
"""

from __future__ import annotations

import json
import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "fixtures")
PYRAMID_FIXTURE = os.path.join(FIXTURE_DIR, "vector_pyramid_counts.parquet")
TILES_Z3_FIXTURE = os.path.join(FIXTURE_DIR, "vector_tiles_z3.parquet")

PYRAMID_MAXZOOM = 6
TILES_ZOOM = 3


def corpus(n_lines: int = 20, n_polys: int = 12, seed: int = 7):
    """feats: (kind, [parts...]) with world-coordinate arrays — the
    same generator shape as the byte-exact pytest corpora (random
    walks + star polygons with mixed winding), kept away from the
    world edges."""
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


def to_table(feats):
    """The corpus as our vector-pyramid input table, via the identical
    text→double→world round trip the reference's GeoJSON reader sees."""
    from ..functions.spatial import lonlat_to_world, world_to_lonlat
    from .vector_pyramid import features_table

    rows = []
    for seq, (kind, parts) in enumerate(feats):
        ops_l = []
        xy_l = []
        for arr in parts:
            lon, lat = world_to_lonlat(arr[:, 0], arr[:, 1])
            lon = np.array([float(json.loads(json.dumps(float(v)))) for v in lon])
            lat = np.array([float(json.loads(json.dumps(float(v)))) for v in lat])
            wx, wy = lonlat_to_world(lon, lat)
            n = len(arr)
            ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
            xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
        t = 3 if kind == "polygon" else 2
        rows.append((seq, t, np.concatenate(ops_l), np.concatenate(xy_l)))
    return features_table(rows)


def write_geojson(path: str, feats) -> None:
    """The corpus as newline GeoJSON for the reference binary."""
    from ..functions.spatial import world_to_lonlat

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
