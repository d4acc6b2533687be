"""GeoJSON source — parse features into the engine's tables
(the reference's primary input: geojson.cpp:43-100, parse loop
geojson-loop.cpp:39; our output feeds the point pipeline's image-table
shape or the vector pyramid's drawvec feature table).

Supports bare features, newline-delimited features, FeatureCollection
documents (including pretty-printed multi-line ones) and gzip input.
All six geometry types; `tippecanoe` extension minzoom/maxzoom carried
as fmin/fmax columns for points.
"""

from __future__ import annotations

import gzip
import json

import numpy as np
import pyarrow as pa

from ..functions.spatial import lonlat_to_world

VT_POINT, VT_LINE, VT_POLYGON = 1, 2, 3


def _iter_features(path: str):
    """Pull-parse a stream of JSON objects (the reference's json_pull
    accepts FeatureCollections, bare features, newline- or
    concatenation-delimited sequences, RFC 8142 separators, and any
    pretty-printing)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        text = f.read()
    dec = json.JSONDecoder()
    pos = 0
    n = len(text)
    while pos < n:
        while pos < n and text[pos] in " \t\r\n,\x1e[]":
            pos += 1
        if pos >= n:
            break
        obj, pos = dec.raw_decode(text, pos)
        if not isinstance(obj, dict):
            continue
        yield from _flatten(obj)


def _flatten(obj: dict):
    t = obj.get("type")
    if t == "FeatureCollection":
        # recurse: tippecanoe-decode emits nested FeatureCollections
        for f in obj.get("features", []):
            if isinstance(f, dict):
                yield from _flatten(f)
    elif t == "Feature":
        yield obj
    elif t is not None:  # bare geometry
        yield {"type": "Feature", "properties": {}, "geometry": obj}


def _geom_parts(geometry: dict):
    """Yield (vt_type, parts) where parts is a list of coordinate lists
    (rings for polygons, lines for linestrings, single points)."""
    t = geometry.get("type")
    c = geometry.get("coordinates")
    if t == "Point":
        yield VT_POINT, [[c]]
    elif t == "MultiPoint":
        yield VT_POINT, [[p] for p in c]
    elif t == "LineString":
        yield VT_LINE, [c]
    elif t == "MultiLineString":
        yield VT_LINE, list(c)
    elif t == "Polygon":
        yield VT_POLYGON, [list(c)]  # one polygon: its rings
    elif t == "MultiPolygon":
        yield VT_POLYGON, [list(poly) for poly in c]
    elif t == "GeometryCollection":
        for g in geometry.get("geometries", []):
            yield from _geom_parts(g)


def read_geojson_vector(path: str) -> pa.Table:
    """Line/polygon features as the vector pyramid's input table
    (seq, t, ops, xy world coords). Points are skipped (they ride the
    point pipeline — read_geojson_points)."""
    from ..pipelines.vector_pyramid import features_table

    rows = []
    seq = 0
    for feat in _iter_features(path):
        geom = feat.get("geometry") or {}
        for vt, parts in _geom_parts(geom):
            if vt == VT_POINT:
                continue
            ops_l = []
            xy_l = []
            if vt == VT_POLYGON:
                # parts = polygons, each a list of rings; a CLOSEPATH
                # after each POLYGON separates the polygons of a multi-
                # polygon so fix_polygon can reset its outer-ring
                # expectation (read_json.cpp:104-116)
                for poly in parts:
                    for ring in poly:
                        arr = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                        wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                        n = len(arr)
                        ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                        xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
                    ops_l.append(np.array([7], np.uint8))
                    xy_l.append(np.zeros((1, 2), np.int64))
            else:
                for part in parts:
                    arr = np.asarray(part, dtype=np.float64).reshape(-1, 2)
                    wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                    n = len(arr)
                    ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                    xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
            if ops_l:
                rows.append((seq, vt, np.concatenate(ops_l), np.concatenate(xy_l)))
        seq += 1
    return features_table(rows)


def read_geojson_points(path: str) -> pa.Table:
    """Point features as (seq, wx, wy, fmin, fmax) — the point
    pipeline's narrow shape; fmin/fmax from the tippecanoe extension
    object (geojson.cpp:81-100), -1 when absent."""
    seqs, wxs, wys, fmins, fmaxs = [], [], [], [], []
    seq = 0
    for feat in _iter_features(path):
        geom = feat.get("geometry") or {}
        tc = feat.get("tippecanoe", {}) or {}
        for vt, parts in _geom_parts(geom):
            if vt != VT_POINT:
                continue
            for part in parts:
                lon, lat = float(part[0][0]), float(part[0][1])
                wx, wy = lonlat_to_world(np.array([lon]), np.array([lat]))
                seqs.append(seq)
                wxs.append(int(wx[0]))
                wys.append(int(wy[0]))
                fmins.append(int(tc.get("minzoom", -1)))
                fmaxs.append(int(tc.get("maxzoom", -1)))
        seq += 1
    return pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "wx": pa.array(wxs, pa.int64()),
            "wy": pa.array(wys, pa.int64()),
            "fmin": pa.array(fmins, pa.int16()),
            "fmax": pa.array(fmaxs, pa.int16()),
        }
    )
