"""Geobuf source/sink — protobuf-encoded GeoJSON (public mapbox/geobuf
wire format; reader semantics mirrored from the reference parser
geobuf.cpp:99-560: delta-coded packed sint64 coords scaled by
10^precision, rings auto-closed, geometry enum type/2+1 → VT type).

The writer exists so the format can be tested hermetically: our
encoder's output is fed to the reference binary as its oracle input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.spatial import lonlat_to_world
from ..stages.mvt import _len_delim, _tag_varint, varint_array

POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON = range(6)


def _zig(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzig(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _packed(field: int, vals: np.ndarray) -> bytes:
    return _len_delim(field, varint_array(np.asarray(vals, dtype=np.uint64)))


def write_geobuf(feats: list[tuple[str, list[np.ndarray]]], path: str,
                 precision: int = 6):
    """feats: (kind∈{line, polygon}, parts) with (n,2) WORLD-coordinate
    arrays (rings closed); encoded as a Data{dimensions, precision,
    feature_collection} message."""
    from ..functions.spatial import world_to_lonlat

    e = 10 ** precision
    body = b""
    for kind, parts in feats:
        if kind == "polygon":
            gtype = POLYGON if len(parts) >= 1 else POLYGON
            rings = []
            for arr in parts:
                a = np.asarray(arr, dtype=np.int64)
                if len(a) > 1 and (a[0] == a[-1]).all():
                    a = a[:-1]  # geobuf omits the closing duplicate
                rings.append(a)
            lengths = np.array([len(r) for r in rings], dtype=np.uint64)
            allpts = np.concatenate(rings)
        else:
            gtype = LINESTRING if len(parts) == 1 else MULTILINESTRING
            lengths = np.array([len(p) for p in parts], dtype=np.uint64)
            allpts = np.concatenate([np.asarray(p, np.int64) for p in parts])
        lon, lat = world_to_lonlat(allpts[:, 0], allpts[:, 1])
        qx = np.round(lon * e).astype(np.int64)
        qy = np.round(lat * e).astype(np.int64)
        # delta coding restarts per part
        coords = np.empty(2 * len(qx), dtype=np.int64)
        pos = 0
        i0 = 0
        for ln in lengths:
            ln = int(ln)
            px = py = 0
            for i in range(i0, i0 + ln):
                coords[pos] = qx[i] - px
                coords[pos + 1] = qy[i] - py
                px, py = qx[i], qy[i]
                pos += 2
            i0 += ln
        geom = _tag_varint(1, gtype)
        if (gtype in (POLYGON, MULTILINESTRING)) and len(lengths) > 1:
            geom += _packed(2, lengths)
        geom += _len_delim(3, varint_array(_zig(coords)))
        feature = _len_delim(1, geom)
        body += _len_delim(1, feature)  # FeatureCollection.features
    data = _tag_varint(2, 2)  # dimensions
    data += _tag_varint(3, precision)
    data += _len_delim(4, body)
    with open(path, "wb") as f:
        f.write(data)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, v
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            yield field, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            yield field, buf[pos : pos + 8]
            pos += 8


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def _decode_geometry(buf: bytes, e: float):
    gtype = 0
    lengths: list[int] = []
    coords: list[int] = []
    for field, val in _fields(buf):
        if field == 1:
            gtype = val
        elif field == 2:
            lengths = _packed_varints(val)
        elif field == 3:
            coords = [_unzig(v) for v in _packed_varints(val)]
    return gtype, lengths, coords


def _line_part(coords, e, start, end, closed):
    lon = []
    lat = []
    px = py = 0
    for i in range(start, end - 1, 2):
        px += coords[i]
        py += coords[i + 1]
        lon.append(px / e)
        lat.append(py / e)
    if closed and lon:
        lon.append(lon[0])
        lat.append(lat[0])
    wx, wy = lonlat_to_world(np.array(lon), np.array(lat))
    return np.stack([wx, wy], axis=1).astype(np.int64)


def read_geobuf_vector(path: str) -> pa.Table:
    """Line/polygon features as the vector pyramid's input table —
    reader per geobuf.cpp:99-560 (rings auto-closed, CLOSEPATH between
    the polygons of a multipolygon)."""
    from ..pipelines.vector_pyramid import features_table

    buf = open(path, "rb").read()
    dim = 2
    e = 1e6
    features: list[bytes] = []

    def collect_fc(fc: bytes):
        for field, val in _fields(fc):
            if field == 1:
                features.append(val)

    for field, val in _fields(buf):
        if field == 2:
            dim = val
        elif field == 3:
            e = 10.0 ** val
        elif field == 4:
            collect_fc(val)
        elif field == 5:
            features.append(val)
    if dim != 2:
        raise ValueError("only 2-dimensional geobuf supported")

    rows = []
    seq = 0
    for fbuf in features:
        for field, val in _fields(fbuf):
            if field != 1:
                continue
            gtype, lengths, coords = _decode_geometry(val, e)
            ops_l = []
            xy_l = []

            def add_part(arr):
                n = len(arr)
                if n == 0:
                    return
                ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                xy_l.append(arr)

            if gtype in (LINESTRING, MULTIPOINT):
                add_part(_line_part(coords, e, 0, len(coords), False))
                t = 2 if gtype == LINESTRING else 1
            elif gtype == MULTILINESTRING:
                here = 0
                if not lengths:
                    add_part(_line_part(coords, e, 0, len(coords), False))
                for ln in lengths:
                    add_part(_line_part(coords, e, here, here + 2 * ln, False))
                    here += 2 * ln
                t = 2
            elif gtype == POLYGON:
                # single polygons carry NO closepath (readMultiLine,
                # geobuf.cpp:146-167) — only multipolygons mark polygon
                # boundaries (readMultiPolygon:169-198)
                here = 0
                if not lengths:
                    add_part(_line_part(coords, e, 0, len(coords), True))
                for ln in lengths:
                    add_part(_line_part(coords, e, here, here + 2 * ln, True))
                    here += 2 * ln
                t = 3
            elif gtype == MULTIPOLYGON:
                if not lengths:
                    add_part(_line_part(coords, e, 0, len(coords), True))
                    ops_l.append(np.array([7], np.uint8))
                    xy_l.append(np.zeros((1, 2), np.int64))
                else:
                    polys = lengths[0]
                    n_idx = 1
                    here = 0
                    for _p in range(polys):
                        nrings = lengths[n_idx]
                        n_idx += 1
                        for _r in range(nrings):
                            ln = lengths[n_idx]
                            n_idx += 1
                            add_part(_line_part(coords, e, here, here + 2 * ln, True))
                            here += 2 * ln
                        ops_l.append(np.array([7], np.uint8))
                        xy_l.append(np.zeros((1, 2), np.int64))
                t = 3
            elif gtype == POINT:
                add_part(_line_part(coords, e, 0, len(coords), False))
                t = 1
            else:
                continue
            if ops_l and t in (2, 3):
                rows.append((seq, t, np.concatenate(ops_l), np.concatenate(xy_l)))
        seq += 1
    return features_table(rows)
