"""Discrete-global-grid cell ids (H3/S2-style) as vectorized kernels.

The reference engine indexes features by quadkey/Hilbert position on the
web-mercator plane (projection.cpp:106-199); the north-star additionally
calls for H3/S2-style cell indexing for spatial joins. Neither the `h3`
nor the `s2` library is available in this environment, so:

- ``s2_cell_id`` implements the full publicly documented S2 point→cell
  derivation: cube face selection (s2coords.h LargestAbsComponent /
  ValidFaceXYZtoUV), the quadratic UV↔ST transform, 30-bit ST→IJ, and
  the exact S2 space-filling curve — the orientation-table Hilbert walk
  of S2CellId::FromFaceIJ, with the 1024-entry position lookup table
  generated at import time from the published 4×4 ``kPosToIJ`` and
  ``kPosToOrientation`` constants (s2coords.cc) by the same recursion
  as s2cellid.cc InitLookupCell. The resulting ids follow the exact S2
  bit layout (3 face bits, 2·30 curve-position bits, trailing marker
  bit) and are bit-identical to s2geometry's per the spec; the contract
  is tested by an independent per-level orientation-walk oracle and by
  hierarchy/continuity invariants in tests/test_cells.py. Caveat (no
  s2geometry/h3 libraries and no network in this environment): parity
  is spec-derived and self-cross-checked, not diffed against the C++
  library binary; points within ~1 ulp of a leaf-cell boundary may
  round to the adjacent cell if libm and numpy trig/sqrt differ in the
  last bit.
- ``h3_cell`` uses the real `h3` package when importable and otherwise
  raises: H3's point→cell derivation is table-driven (122-entry base
  cell data, per-face IJK lookup tables) and a from-scratch rewrite
  could not be validated bit-exactly in this sandbox, so rather than
  ship plausible-but-unverifiable ids we gate on the library.
  ``cell_id(kind="quadkey")`` (the engine's native system) and
  ``kind="s2"`` are the supported hierarchical-cell fallbacks.
"""

from __future__ import annotations

import numpy as np

from .spatial import encode_quadkey, lonlat_to_world

U64 = np.uint64
S2_MAX_LEVEL = 30


def _lonlat_to_xyz(lon, lat):
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    cos_lat = np.cos(lat_r)
    return cos_lat * np.cos(lon_r), cos_lat * np.sin(lon_r), np.sin(lat_r)


def _xyz_to_face_uv(x, y, z):
    """S2 cube-face projection: face = axis of largest |component|,
    (u, v) = the other two components scaled by it (s2geometry public
    docs / s2coords.h semantics)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + 3 * (
        np.where(face == 0, x < 0, np.where(face == 1, y < 0, z < 0))
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            u[m], v[m] = y[m] / x[m], z[m] / x[m]
        elif f == 1:
            u[m], v[m] = -x[m] / y[m], z[m] / y[m]
        elif f == 2:
            u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
        elif f == 3:
            u[m], v[m] = z[m] / x[m], y[m] / x[m]
        elif f == 4:
            u[m], v[m] = z[m] / y[m], -x[m] / y[m]
        else:
            u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face, u, v


def _uv_to_st(u):
    """S2 quadratic projection (s2coords.h UVtoST)."""
    # np.where evaluates both branches; clamp the radicands so the
    # unused branch never sees a negative argument (u is in [-1, 1])
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


# --- the exact S2 space-filling curve ---------------------------------
# Published constants (s2coords.cc): the Hilbert-curve traversal order
# within a cell for each of the 4 orientations, and the orientation
# delta each child position applies. kPosToIJ[orientation][position] =
# (i << 1) | j of that child.
S2_SWAP_MASK = 0x01
S2_INVERT_MASK = 0x02
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (S2_SWAP_MASK, 0, 0, S2_INVERT_MASK | S2_SWAP_MASK)
_LOOKUP_BITS = 4


def _build_lookup_tables():
    """Generate lookup_pos / lookup_ij exactly as s2cellid.cc
    InitLookupCell: each entry maps 4 levels of (i, j) bits plus the
    incoming orientation to 8 curve-position bits plus the outgoing
    orientation."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint32)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint32)

    def init(level, i, j, orig_orientation, orientation, pos):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for subpos in range(4):
            init(level, i + (r[subpos] >> 1), j + (r[subpos] & 1),
                 orig_orientation, orientation ^ _POS_TO_ORIENTATION[subpos],
                 pos + subpos)

    for orientation in range(4):
        init(0, 0, 0, orientation, orientation, 0)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup_tables()


def s2_from_face_ij(face, i, j) -> np.ndarray:
    """Leaf cell id from (face, i, j) — vectorized port of
    S2CellId::FromFaceIJ (s2cellid.cc): 8 rounds of 4 i-bits + 4 j-bits
    through the orientation lookup table."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << U64(60)  # kPosBits - 1 = 60
    bits = (face & U64(S2_SWAP_MASK)).astype(np.uint64)
    mask = U64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = U64(k * _LOOKUP_BITS)
        b = bits
        b = b + (((i >> kk) & mask) << U64(_LOOKUP_BITS + 2))
        b = b + (((j >> kk) & mask) << U64(2))
        b = _LOOKUP_POS[b].astype(np.uint64)
        n |= (b >> U64(2)) << U64(k * 2 * _LOOKUP_BITS)
        bits = b & U64(S2_SWAP_MASK | S2_INVERT_MASK)
    return n * U64(2) + U64(1)


def s2_cell_id(lon, lat, level: int = S2_MAX_LEVEL) -> np.ndarray:
    """S2 cell id at `level` (0..30), bit-layout-exact per the public
    S2 spec (see module docstring for the parity contract).

    Layout follows S2: bits 61..63 = face, then 2*level curve-position
    bits, then a trailing 1 bit marking the level (so parent/child
    relationships are prefix relationships).
    """
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError("level must be in 0..30")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    smax = 1 << S2_MAX_LEVEL
    # STtoIJ: lround(kMaxSize * s - 0.5) clamped == floor(kMaxSize * s)
    # clamped for s in [0, 1].
    i = np.clip(np.floor(_uv_to_st(u) * smax).astype(np.int64), 0, smax - 1)
    j = np.clip(np.floor(_uv_to_st(v) * smax).astype(np.int64), 0, smax - 1)
    cell = s2_from_face_ij(face, i, j)
    if level == S2_MAX_LEVEL:
        return cell
    return s2_parent(cell, level)


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Parent cell at a coarser level (prefix truncation)."""
    cell = np.asarray(cell, dtype=np.uint64)
    shift = U64(2 * (S2_MAX_LEVEL - level))
    return ((cell >> shift) << shift) | (U64(1) << shift)


def quadkey_cell(lon, lat, level: int) -> np.ndarray:
    """Web-mercator quadkey cell id at `level` (0..32): the top
    2*level bits of the Morton index, plus a level marker — the engine's
    native cell system (projection.cpp:159-172 applied at a coarser
    level)."""
    wx, wy = lonlat_to_world(lon, lat)
    qk = encode_quadkey(wx, wy)
    shift = U64(64 - 2 * level) if level < 32 else U64(0)
    return qk >> shift


def cell_id(lon, lat, level: int, kind: str = "quadkey") -> np.ndarray:
    """Dispatch: 'quadkey' (native), 's2' (S2-style), 'h3' (needs h3 lib)."""
    if kind == "quadkey":
        return quadkey_cell(lon, lat, level)
    if kind == "s2":
        return s2_cell_id(lon, lat, level)
    if kind == "h3":
        try:
            import h3  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "h3 library not available in this environment; "
                "use kind='quadkey' or kind='s2'"
            ) from e
        import h3

        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        return np.array(
            [h3.str_to_int(h3.latlng_to_cell(la, lo, level)) for lo, la in zip(lon, lat)],
            dtype=np.uint64,
        )
    raise ValueError(f"unknown cell kind {kind!r}")
