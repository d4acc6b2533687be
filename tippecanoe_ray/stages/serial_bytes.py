"""Byte-parity model of the reference's temp geometry streams, for the
-at (--generate-variable-depth-tile-pyramid) leaf gate.

The reference's estimated_complexity for a tile is the byte length of
the child stream segment its parent wrote, SNAPSHOTTED BEFORE the EOF
and deflate-finish flush (tile.cpp:2344): an 8-byte complexity slot +
uncompressed varints (nextzoom, x, y) + however many bytes zlib's
deflate(Z_NO_FLUSH) happened to emit while the parent streamed the
serialized features (compression.cpp:222-242; streams for z > iz are
compressed, the initial z=iz stream is raw, tile.cpp:3475).

This module reproduces that byte count exactly for attribute-free
features: serialize_feature (serial.cpp:173-232) with empty keys, no
id, index/extent/label_point = 0, so the wire layout is
  t(1) | layer|flags varint | seq varint | segment varint |
  geometry (op byte + zigzag dx/dy varints, VT_END) | nkeys varint |
  feature_minzoom(1)
each prefixed by its zigzag length varint through the compressor.
"""

from __future__ import annotations

import zlib

import numpy as np

_M64 = (1 << 64) - 1


def zigzag64(v: int) -> int:
    """protozero encode_zigzag64."""
    return ((v << 1) ^ (v >> 63)) & _M64


def varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def svarint(v: int) -> bytes:
    return varint(zigzag64(int(v)))


def serialize_feature_bytes(
    t: int,
    seq: int,
    ops: np.ndarray,
    xy: np.ndarray,
    wx: int,
    wy: int,
    feature_minzoom: int = 0,
    segment: int = 0,
) -> bytes:
    """serial.cpp:173-232 for an attribute-free feature. `xy` must be
    in the stream's geometry_scale coordinates; (wx, wy) is the running
    delta origin (SHIFT_RIGHT(initial_x), SHIFT_RIGHT(initial_y)) and
    the caller threads the updated origin via the return of
    stream_origin()."""
    s = bytearray()
    s.append(t & 0xFF)
    s += svarint(0)  # layer 0 << 7 | no flags
    s += svarint(seq)
    s += svarint(segment)
    for i in range(len(ops)):
        op = int(ops[i])
        s.append(op)
        if op in (1, 2):
            x = int(xy[i, 0])
            y = int(xy[i, 1])
            s += svarint(x - wx)
            s += svarint(y - wy)
            wx, wy = x, y
    s.append(0)  # VT_END
    s += svarint(0)  # nkeys
    s.append(feature_minzoom & 0xFF)
    return bytes(s)


class StreamSizer:
    """Accounts one child stream the way the parent's compressor does:
    header bytes raw, then per-write deflate(Z_NO_FLUSH) output byte
    counts. complexity() returns the pre-EOF snapshot the child reads."""

    def __init__(self, nextzoom: int, x: int, y: int, compressed: bool = True):
        # 8-byte complexity slot + serialize_int(nextzoom) +
        # serialize_uint(x) + serialize_uint(y)  (tile.cpp:516-519)
        self.size = 8 + len(svarint(nextzoom)) + len(varint(x)) + len(varint(y))
        self.compressed = compressed
        self._z = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION) if compressed else None

    def write_feature(self, feature_bytes: bytes):
        buf = svarint(len(feature_bytes)) + feature_bytes
        if self.compressed:
            self.size += len(self._z.compress(buf))
        else:
            self.size += len(buf)

    def complexity(self) -> int:
        return self.size


def stream_complexities(
    features_by_child: dict,
    nextzoom: int,
    compressed: bool = True,
) -> dict:
    """features_by_child: {(cx, cy): [(seq, t, ops, xy_scaled, fmz), ...]}
    in parent read order. Returns {(cx, cy): estimated_complexity}."""
    out = {}
    for (cx, cy), feats in features_by_child.items():
        sz = StreamSizer(nextzoom, cx, cy, compressed)
        wx = wy = None
        for seq, t, ops, xy, fmz, wx0, wy0 in feats:
            if wx is None:
                wx, wy = wx0, wy0
            fb = serialize_feature_bytes(t, seq, ops, xy, wx, wy, fmz)
            # update running origin to the feature's last MOVETO/LINETO
            draw = np.flatnonzero((ops == 1) | (ops == 2))
            if len(draw):
                wx = int(xy[draw[-1], 0])
                wy = int(xy[draw[-1], 1])
            sz.write_feature(fb)
        out[(cx, cy)] = sz.complexity()
    return out
