"""FlatGeobuf source — minimal hand-rolled flatbuffers reader for the
public FGB format (magic, size-prefixed Header flatbuffer, optional
packed R-tree index, size-prefixed Feature flatbuffers). Semantics
mirrored from the reference parser flatgeobuf.cpp:23-120, 349-420;
vtable field ids from the generated schema headers
(feature_generated.h: Geometry VT_ENDS=4 VT_XY=6 VT_TYPE=16 VT_PARTS=18,
Feature VT_GEOMETRY=4; header_generated.h: VT_GEOMETRY_TYPE=8,
VT_FEATURES_COUNT=20, VT_INDEX_NODE_SIZE=22)."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.spatial import lonlat_to_world

MAGIC = b"fgb\x03fgb\x01"
NODE_ITEM_SIZE = 40  # 4 doubles + uint64 offset

GT_POINT, GT_LINESTRING, GT_POLYGON = 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON = 4, 5, 6


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _i32(b, o):
    return struct.unpack_from("<i", b, o)[0]


class _Table:
    """flatbuffers table accessor: pos → vtable via the leading
    soffset; field lookups return byte offsets within the table."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        soffset = _i32(buf, pos)
        self.vt = pos - soffset
        self.vt_len = _u16(buf, self.vt)

    def _field(self, vt_off: int) -> int:
        if vt_off < self.vt_len:
            off = _u16(self.buf, self.vt + vt_off)
            if off:
                return self.pos + off
        return 0

    def scalar(self, vt_off: int, fmt: str, default):
        loc = self._field(vt_off)
        if not loc:
            return default
        return struct.unpack_from(fmt, self.buf, loc)[0]

    def indirect(self, vt_off: int) -> int:
        loc = self._field(vt_off)
        if not loc:
            return 0
        return loc + _u32(self.buf, loc)

    def vector(self, vt_off: int):
        tgt = self.indirect(vt_off)
        if not tgt:
            return 0, 0
        return tgt + 4, _u32(self.buf, tgt)


def _rtree_size(num_items: int, node_size: int) -> int:
    node_size = min(max(node_size, 2), 65535)
    n = num_items
    num_nodes = n
    while n != 1:
        n = (n + node_size - 1) // node_size
        num_nodes += n
    return num_nodes * NODE_ITEM_SIZE


def _geometry_parts(buf: bytes, gpos: int, gtype: int):
    """Yield (vt_type, ops, lonlat (n,2)) per the reference's
    readGeometry/readLinePart (flatgeobuf.cpp:42-102)."""
    g = _Table(buf, gpos)
    if gtype == 0:
        gtype = g.scalar(16, "<B", 0)

    def xy_of(t: _Table):
        data, n = t.vector(6)
        if not data:
            return np.empty((0, 2))
        arr = np.frombuffer(t.buf, dtype="<f8", count=n, offset=data)
        return arr.reshape(-1, 2)

    def ends_of(t: _Table):
        data, n = t.vector(4)
        if not data:
            return []
        return list(np.frombuffer(t.buf, dtype="<u4", count=n, offset=data))

    def line_part_ops(t: _Table):
        pts = xy_of(t)
        ends = ends_of(t)
        ops = np.full(len(pts), 2, dtype=np.uint8)
        if len(pts):
            ops[0] = 1
            cursor = 0
            for e in ends:
                if 0 < e < len(pts):
                    ops[e] = 1
                cursor = e
        return ops, pts

    if gtype in (GT_POINT, GT_MULTIPOINT):
        pts = xy_of(g)
        yield 1, np.ones(len(pts), np.uint8), pts
    elif gtype in (GT_LINESTRING, GT_MULTILINESTRING):
        ops, pts = line_part_ops(g)
        yield 2, ops, pts
    elif gtype == GT_POLYGON:
        ops, pts = line_part_ops(g)
        yield 3, ops, pts
    elif gtype == GT_MULTIPOLYGON:
        parts_data, n_parts = g.vector(18)
        ops_l = []
        pts_l = []
        for i in range(n_parts):
            loc = parts_data + 4 * i
            ppos = loc + _u32(buf, loc)
            pt = _Table(buf, ppos)
            ops, pts = line_part_ops(pt)
            ops_l.append(ops)
            pts_l.append(pts)
            ops_l.append(np.array([7], np.uint8))  # CLOSEPATH per polygon
            pts_l.append(np.zeros((1, 2)))
        if ops_l:
            yield 3, np.concatenate(ops_l), np.concatenate(pts_l)


def read_flatgeobuf(path: str) -> tuple[pa.Table, pa.Table]:
    """Returns (points table (seq, wx, wy), vector feature table) —
    the two pipelines' input shapes."""
    from ..pipelines.vector_pyramid import features_table

    buf = open(path, "rb").read()
    if buf[: len(MAGIC)] != MAGIC:
        raise ValueError(f"{path}: not a FlatGeobuf file")
    pos = len(MAGIC)
    header_size = _u32(buf, pos)
    hroot = pos + 4 + _u32(buf, pos + 4)
    header = _Table(buf, hroot)
    gtype = header.scalar(8, "<B", 0)
    features_count = header.scalar(20, "<Q", 0)
    node_size = header.scalar(22, "<H", 16)
    pos = pos + 4 + header_size
    if node_size > 0 and features_count > 0:
        pos += _rtree_size(features_count, node_size)

    pt_seq: list[int] = []
    pt_lon: list[float] = []
    pt_lat: list[float] = []
    vrows = []
    seq = 0
    while pos < len(buf):
        fsize = _u32(buf, pos)
        froot = pos + 4 + _u32(buf, pos + 4)
        feat = _Table(buf, froot)
        gpos = feat.indirect(4)
        if gpos:
            for vt, ops, lonlat in _geometry_parts(buf, gpos, gtype):
                if len(ops) == 0:
                    continue
                if vt == 1:
                    for lo, la in lonlat:
                        pt_seq.append(seq)
                        pt_lon.append(float(lo))
                        pt_lat.append(float(la))
                else:
                    m = ops != 7
                    wx = np.zeros(len(ops), dtype=np.int64)
                    wy = np.zeros(len(ops), dtype=np.int64)
                    if m.any():
                        px, py = lonlat_to_world(lonlat[m, 0], lonlat[m, 1])
                        wx[m] = px
                        wy[m] = py
                    vrows.append((seq, vt, ops, np.stack([wx, wy], axis=1)))
        seq += 1
        pos += 4 + fsize

    if pt_lon:
        wx, wy = lonlat_to_world(np.array(pt_lon), np.array(pt_lat))
        pts = pa.table(
            {
                "seq": pa.array(pt_seq, pa.int64()),
                "wx": pa.array(wx.astype(np.int64)),
                "wy": pa.array(wy.astype(np.int64)),
            }
        )
    else:
        pts = pa.table({"seq": pa.array([], pa.int64()),
                        "wx": pa.array([], pa.int64()),
                        "wy": pa.array([], pa.int64())})
    return pts, features_table(vrows)
