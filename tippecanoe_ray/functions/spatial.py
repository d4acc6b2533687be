"""Vectorized spatial kernels on the 2^32 × 2^32 web-mercator world plane.

Semantics re-derived from the reference (felt/tippecanoe):
- lon/lat → world-plane projection: /root/reference/projection.cpp:22-65
  (slippy-map formula at zoom 32, lat clamped to ±89.9, NaN/∞ pushed
  off-plane).
- quadkey (Morton / z-order) spatial index: projection.cpp:159-199.
- Hilbert spatial index: projection.cpp:106-157 (wikipedia xy2d with
  32-bit unsigned wrap in the rotation step).
- tile of a world point at zoom z: tx = wx >> (32 - z) (tile.cpp:443-483
  re-bases per-tile coordinates by subtracting tx << (32-z)).

Everything is numpy-vectorized: no Python-level per-row loops; the
Hilbert/Morton kernels iterate over *bit positions* (≤32 passes),
vectorized over rows.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
M32 = np.uint64(0xFFFFFFFF)
WORLD_BITS = 32
WORLD = 1 << WORLD_BITS  # 2^32


# ---------------------------------------------------------------- projection


def lonlat_to_world(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """Project lon/lat (degrees) to integer zoom-32 world coordinates.

    Mirrors lonlat2tile(..., zoom=32) in projection.cpp:22-65: NaN/∞ lat
    → 89.9, NaN/∞ lon → 720 (off-plane), lat clamped to ±89.9, lon
    clamped to ±360, then the slippy-map formula with round-half-away
    (C std::round) semantics.
    """
    lon = np.asarray(lon, dtype=np.float64).copy()
    lat = np.asarray(lat, dtype=np.float64).copy()

    bad_lat = ~np.isfinite(lat)
    bad_lon = ~np.isfinite(lon)
    lat[bad_lat] = 89.9
    lon[bad_lon] = 720.0
    np.clip(lat, -89.9, 89.9, out=lat)
    # clamp lon to ±360 only where it was finite
    lon = np.where(bad_lon, lon, np.clip(lon, -360.0, 360.0))

    # C evaluation order lat * M_PI / 180 = (lat*π)/180
    # (projection.cpp:57); lat * (π/180) differs by 1 ulp on some
    # latitudes, which flips std::round and shifts a vertex by one
    # world unit
    lat_rad = lat * np.pi / 180.0
    n = float(1 << WORLD_BITS)
    fx = n * ((lon + 180.0) / 360.0)
    fy = n * (1.0 - (np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi)) / 2.0
    # std::round = round half away from zero (np.round is half-to-even)
    # floor(x - 0.5) over-rounds negatives (floor(-0.9) = -1 where
    # std::round(-0.4) = 0): half-away is floor/ceil by sign
    wx = np.where(fx >= 0, np.floor(fx + 0.5), np.ceil(fx - 0.5)).astype(np.int64)
    wy = np.where(fy >= 0, np.floor(fy + 0.5), np.ceil(fy - 0.5)).astype(np.int64)
    return wx, wy


def epsg3857_to_world(mx, my) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator meters → zoom-32 world coordinates
    (epsg3857totile, projection.cpp:74-94): NaN/∞ coordinates pushed
    off the plane (40000000 m), std::round (half away) semantics."""
    mx = np.asarray(mx, dtype=np.float64).copy()
    my = np.asarray(my, dtype=np.float64).copy()
    mx[~np.isfinite(mx)] = 40000000.0
    my[~np.isfinite(my)] = 40000000.0
    r = float(1 << 31) / 6378137.0 / np.pi
    fx = mx * r + float(1 << 31)
    fy = (float(1 << 32) - 1.0) - (my * r + float(1 << 31))

    def _rnd(v):
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    return _rnd(fx).astype(np.int64), _rnd(fy).astype(np.int64)


def world_to_lonlat(wx, wy) -> tuple[np.ndarray, np.ndarray]:
    """Inverse projection (projection.cpp:68-73, zoom 32)."""
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    n = float(1 << WORLD_BITS)
    lon = 360.0 * wx / n - 180.0
    lat = np.arctan(np.sinh(np.pi * (1.0 - 2.0 * wy / n))) * 180.0 / np.pi
    return lon, lat


# ------------------------------------------------------- quadkey / z-order


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the 32 bits of v so bit k lands at bit 2k (Morton spread)."""
    x = v.astype(np.uint64) & M32
    x = (x | (x << U64(16))) & U64(0x0000FFFF0000FFFF)
    x = (x | (x << U64(8))) & U64(0x00FF00FF00FF00FF)
    x = (x | (x << U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << U64(2))) & U64(0x3333333333333333)
    x = (x | (x << U64(1))) & U64(0x5555555555555555)
    return x


def _compact_bits64(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits32: gather even bits of v into 32 bits."""
    x = v.astype(np.uint64) & U64(0x5555555555555555)
    x = (x | (x >> U64(1))) & U64(0x3333333333333333)
    x = (x | (x >> U64(2))) & U64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> U64(4))) & U64(0x00FF00FF00FF00FF)
    x = (x | (x >> U64(8))) & U64(0x0000FFFF0000FFFF)
    x = (x | (x >> U64(16))) & M32
    return x


def encode_quadkey(wx, wy) -> np.ndarray:
    """64-bit quadkey: x bits in odd positions, y bits in even positions.

    Bit-for-bit the reference's encode_quadkey (projection.cpp:159-172):
    bit i (MSB-first) of wx lands at out bit 64-2(i+1)+1 = 2*(31-i)+1.
    """
    return (_spread_bits32(np.asarray(wx)) << U64(1)) | _spread_bits32(np.asarray(wy))


def decode_quadkey(index) -> tuple[np.ndarray, np.ndarray]:
    idx = np.asarray(index, dtype=np.uint64)
    return _compact_bits64(idx >> U64(1)), _compact_bits64(idx)


# ----------------------------------------------------------------- hilbert


def encode_hilbert(wx, wy) -> np.ndarray:
    """Hilbert curve position of (wx, wy) on the 2^32 plane.

    Bit-for-bit the reference's hilbert_xy2d(1<<32, x, y)
    (projection.cpp:106-139): iterate s = 2^31 … 1; unsigned-32 wrap in
    the rotation (the C code stores into `unsigned`).
    """
    x = (np.asarray(wx).astype(np.uint64) & M32).copy()
    y = (np.asarray(wy).astype(np.uint64) & M32).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bit in range(WORLD_BITS - 1, -1, -1):
            s = U64(1) << U64(bit)
            rx = ((x & s) != 0).astype(np.uint64)
            ry = ((y & s) != 0).astype(np.uint64)
            d += (s * s) * ((U64(3) * rx) ^ ry)
            # hilbert_rot(s, x, y, rx, ry)
            swap = ry == 0
            flip = swap & (rx == 1)
            xf = (s - U64(1) - x) & M32
            yf = (s - U64(1) - y) & M32
            x = np.where(flip, xf, x)
            y = np.where(flip, yf, y)
            xs = np.where(swap, y, x)
            ys = np.where(swap, x, y)
            x, y = xs, ys
    return d


def decode_hilbert(index) -> tuple[np.ndarray, np.ndarray]:
    """Inverse (projection.cpp:141-156 hilbert_d2xy, n = 2^32)."""
    t = np.asarray(index, dtype=np.uint64).copy()
    x = np.zeros(t.shape, dtype=np.uint64)
    y = np.zeros(t.shape, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bit in range(WORLD_BITS):
            s = U64(1) << U64(bit)
            rx = U64(1) & (t >> U64(1))
            ry = U64(1) & (t ^ rx)
            swap = ry == 0
            flip = swap & (rx == 1)
            xf = (s - U64(1) - x) & M32
            yf = (s - U64(1) - y) & M32
            x = np.where(flip, xf, x)
            y = np.where(flip, yf, y)
            xs = np.where(swap, y, x)
            ys = np.where(swap, x, y)
            x, y = xs, ys
            x = x + s * rx
            y = y + s * ry
            t = t >> U64(2)
    return x & M32, y & M32


# ------------------------------------------------------------------- tiles


def tile_of(wx, wy, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile (tx, ty) containing world point at zoom z (tile.cpp:443-483)."""
    wx = np.asarray(wx, dtype=np.int64)
    wy = np.asarray(wy, dtype=np.int64)
    shift = WORLD_BITS - z
    tx = wx >> shift
    ty = wy >> shift
    nmax = (1 << z) - 1
    return np.clip(tx, 0, nmax), np.clip(ty, 0, nmax)


def tile_extent_world(z: int) -> int:
    """Width of one zoom-z tile in world units."""
    return 1 << (WORLD_BITS - z)


def tiles_touched(wx, wy, z: int, buffer_256: int = 0):
    """All tiles whose buffered bounds contain each point, as parallel
    arrays (row_idx, tx, ty).

    tippecanoe includes a feature in a tile when it falls within the
    tile expanded by `buffer` 256ths of the tile span on each side
    (default 5; main.cpp:3200, clip_to_tile tile.cpp:974-1057). A point
    can therefore appear in up to 4 tiles per zoom. buffer_256=0 →
    exactly one tile per point.
    """
    wx = np.asarray(wx, dtype=np.int64)
    wy = np.asarray(wy, dtype=np.int64)
    n = len(wx)
    if buffer_256 == 0 or z == 0:
        tx, ty = tile_of(wx, wy, z)
        return np.arange(n, dtype=np.int64), tx, ty
    span = tile_extent_world(z)
    buf = (span * buffer_256) >> 8
    nmax = (1 << z) - 1
    lo_x = np.clip((wx - buf) >> (WORLD_BITS - z), 0, nmax)
    hi_x = np.clip((wx + buf) >> (WORLD_BITS - z), 0, nmax)
    lo_y = np.clip((wy - buf) >> (WORLD_BITS - z), 0, nmax)
    hi_y = np.clip((wy + buf) >> (WORLD_BITS - z), 0, nmax)
    rows, txs, tys = [], [], []
    # at most 2×2 combinations per point; emit the ≤4 corner candidates
    for dx in (lo_x, hi_x):
        for dy in (lo_y, hi_y):
            rows.append(np.arange(n, dtype=np.int64))
            txs.append(dx)
            tys.append(dy)
    row = np.concatenate(rows)
    tx = np.concatenate(txs)
    ty = np.concatenate(tys)
    # dedup (row, tx, ty) triples that collapsed to the same tile
    key = (row << 40) | (tx.astype(np.int64) << 20) | ty.astype(np.int64)
    _, keep = np.unique(key, return_index=True)
    keep.sort()
    return row[keep], tx[keep], ty[keep]


def point_in_buffered_tile(wx, wy, z: int, tx, ty, buffer_256: int) -> np.ndarray:
    """Vectorized point-in-rect against a tile's buffered bounds
    (clip.cpp:84-104 semantics: inclusive min, exclusive max on the
    unbuffered edge; we use half-open [min, max) buffered bounds)."""
    wx = np.asarray(wx, dtype=np.int64)
    wy = np.asarray(wy, dtype=np.int64)
    span = tile_extent_world(z)
    buf = (span * buffer_256) >> 8
    x0 = np.asarray(tx, dtype=np.int64) * span - buf
    y0 = np.asarray(ty, dtype=np.int64) * span - buf
    x1 = x0 + span + 2 * buf
    y1 = y0 + span + 2 * buf
    return (wx >= x0) & (wx < x1) & (wy >= y0) & (wy < y1)
