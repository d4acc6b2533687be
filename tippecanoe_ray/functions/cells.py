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
- ``h3_cell`` uses the real `h3` package when importable; otherwise it
  falls back to the self-consistent H3-STYLE implementation below —
  H3's id bit layout and exact integer aperture-7 hierarchy (up/down
  walks, digit extraction, parent truncation, k-ring identities are
  all exact and property-tested), with the icosahedron FACE as the
  base cell instead of libh3's 122-entry base-cell stitching tables,
  whose published data cannot be validated bit-exactly in this
  sandbox (no h3 library, no network). Ids are therefore NOT
  bit-compatible with libh3 — documented deviation; ``kind="s2"`` and
  ``kind="quadkey"`` remain the spec-exact hierarchical systems.
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


# -------------------------------------------------- H3-style hex cells
#
# An aperture-7 hexagonal hierarchical index in H3's id bit layout
# (H3 Index spec: [1 reserved][4 mode][3 reserved][4 res][7 base cell]
# [15 × 3-bit digits]) built from the documented per-face machinery:
# gnomonic projection onto an icosahedron face, hex2d → IJK+ cube
# rounding (CoordIJK.c _hex2dToCoordIJK), and the exact integer
# aperture-7 up/down walks with Class II/III alternation (_upAp7 /
# _upAp7r / _downAp7 / _downAp7r matrices). DEVIATION, DOCUMENTED:
# the true H3 base-cell stitching (122-entry baseCellData + 540-entry
# faceIjkBaseCells lookup, with pentagon distortion at the 12
# icosahedron vertices) is published DATA that cannot be validated
# bit-exactly in this sandbox (no h3 library, no network), so instead
# of shipping plausible-but-unverifiable table transcriptions the base
# cell here is the icosahedron FACE (0..19 in the 7-bit field) and
# cells do not cross face edges. Ids are therefore NOT bit-compatible
# with libh3 — but the hierarchy is exactly self-consistent by
# construction: digit extraction inverts the integer down-walk, so
# parent-by-digit-truncation == the aperture-7 up-walk, round trips
# are exact, and k-rings have the exact 1+3k(k+1) hexagon counts
# (property-tested in tests/test_cells.py).

_PHI = (1.0 + np.sqrt(5.0)) / 2.0
_ICO_VERTS = None
_ICO_FACES = None
_ICO_CENTERS = None
_ICO_AXES = None

# res-0 hex radius in face gnomonic units (face circumradius ~ the
# gnomonic image of the face spans ~1; one res-0 cell per face)
_RES0_U = 0.8


def _ico_tables():
    """Mathematically exact icosahedron (golden-ratio vertices, fixed
    deterministic orientation): 20 faces, unit face centers, and a
    per-face orthonormal (ex, ey) basis for the gnomonic plane."""
    global _ICO_VERTS, _ICO_FACES, _ICO_CENTERS, _ICO_AXES
    if _ICO_AXES is not None:
        return _ICO_FACES, _ICO_CENTERS, _ICO_AXES
    v = []
    for a in (-1.0, 1.0):
        for b in (-_PHI, _PHI):
            v.append((0.0, a, b))
            v.append((a, b, 0.0))
            v.append((b, 0.0, a))
    verts = np.array(sorted(set(v)), dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces: all vertex triples at minimal mutual distance (edge length)
    from itertools import combinations

    d = np.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=2)
    edge = np.min(d[d > 1e-9])
    faces = []
    for i, j, k in combinations(range(12), 3):
        if (abs(d[i, j] - edge) < 1e-9 and abs(d[i, k] - edge) < 1e-9
                and abs(d[j, k] - edge) < 1e-9):
            faces.append((i, j, k))
    faces = sorted(faces)
    centers = np.array([
        (verts[i] + verts[j] + verts[k]) / 3.0 for i, j, k in faces
    ])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    axes = []
    for fi, (i, j, k) in enumerate(faces):
        c = centers[fi]
        ex = verts[i] - c * np.dot(verts[i], c)
        ex /= np.linalg.norm(ex)
        ey = np.cross(c, ex)
        axes.append((ex, ey))
    _ICO_VERTS, _ICO_FACES = verts, np.array(faces)
    _ICO_CENTERS, _ICO_AXES = centers, np.array(axes)
    return _ICO_FACES, _ICO_CENTERS, _ICO_AXES


_SQRT7 = np.sqrt(7.0)
# CoordIJK.c aperture-7 down matrices (integer, exact)
_DOWN7 = np.array([[3, 0, 1], [1, 3, 0], [0, 1, 3]], dtype=np.int64)      # Class II
_DOWN7R = np.array([[3, 1, 0], [0, 3, 1], [1, 0, 3]], dtype=np.int64)     # Class III
# unit IJK+ vector per digit 0..6 (CoordIJK.c UNIT_VECS)
_UNIT = np.array([
    [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
    [1, 0, 0], [1, 0, 1], [1, 1, 0],
], dtype=np.int64)
_UNIT_DIGIT = {tuple(u): di for di, u in enumerate(_UNIT)}


def _axial_round(q: float, r: float) -> tuple[int, int, int]:
    """Nearest-hex-center rounding (the semantics of CoordIJK.c
    _hex2dToCoordIJK): exact cube rounding of fractional axial
    coordinates, normalized to IJK+ (all components ≥ 0, min component
    0). Any consistent nearest-center rule yields a self-consistent
    hierarchy; libh3's branchy form is unavailable to diff against."""
    s = -q - r
    rq, rr, rs = round(q), round(r), round(s)
    dq, dr, ds = abs(rq - q), abs(rr - r), abs(rs - s)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    else:
        rs = -rq - rr
    return _norm_ijk(int(rq), int(rr), 0)


def _up7(ijk: tuple[int, int, int], class3: bool) -> tuple[int, int, int]:
    """Exact integer aperture-7 parent (CoordIJK.c _upAp7 / _upAp7r
    via float round-half-away, normalized to IJK+)."""
    i = ijk[0] - ijk[2]
    j = ijk[1] - ijk[2]
    if class3:
        ni = (2.0 * i + j) / 7.0
        nj = (3.0 * j - i) / 7.0
    else:
        ni = (3.0 * i - j) / 7.0
        nj = (i + 2.0 * j) / 7.0
    ri = int(np.floor(ni + 0.5)) if ni >= 0 else -int(np.floor(-ni + 0.5))
    rj = int(np.floor(nj + 0.5)) if nj >= 0 else -int(np.floor(-nj + 0.5))
    return _norm_ijk(ri, rj, 0)


def _down7(ijk: tuple[int, int, int], class3: bool) -> tuple[int, int, int]:
    m = _DOWN7R if class3 else _DOWN7
    v = m.T @ np.array(ijk, np.int64)
    return _norm_ijk(int(v[0]), int(v[1]), int(v[2]))


def _norm_ijk(i: int, j: int, k: int) -> tuple[int, int, int]:
    if i < 0:
        j -= i
        k -= i
        i = 0
    if j < 0:
        i -= j
        k -= j
        j = 0
    if k < 0:
        i -= k
        j -= k
        k = 0
    m = min(i, j, k)
    return i - m, j - m, k - m


def _ijk_sub(a, b) -> tuple[int, int, int]:
    return _norm_ijk(a[0] - b[0], a[1] - b[1], a[2] - b[2])


H3_MODE_CELL = 1


def h3_cell(lon, lat, res: int) -> np.ndarray:
    """H3-STYLE cell ids (see module banner: exact aperture-7 hierarchy
    in the H3 bit layout, base cell = icosahedron face, NOT
    bit-compatible with libh3 — which is unavailable to validate
    against in this sandbox). Uses the real `h3` package instead when
    importable."""
    try:
        import h3  # noqa: F401

        lon_a = np.asarray(lon, dtype=np.float64)
        lat_a = np.asarray(lat, dtype=np.float64)
        return np.array(
            [h3.str_to_int(h3.latlng_to_cell(la, lo, res))
             for lo, la in zip(lon_a, lat_a)],
            dtype=np.uint64,
        )
    except ImportError:
        pass
    if not 0 <= res <= 15:
        raise ValueError("res must be 0..15")
    faces, centers, axes = _ico_tables()
    x, y, z = _lonlat_to_xyz(lon, lat)
    pts = np.stack([np.asarray(x).ravel(), np.asarray(y).ravel(),
                    np.asarray(z).ravel()], axis=1)
    dots = pts @ centers.T
    face = np.argmax(dots, axis=1)
    out = np.empty(len(pts), dtype=np.uint64)
    for n in range(len(pts)):
        f = int(face[n])
        c = centers[f]
        ex, ey = axes[f]
        p = pts[n] / np.dot(pts[n], c)  # gnomonic onto the face plane
        gx = float(np.dot(p - c, ex)) / _RES0_U
        gy = float(np.dot(p - c, ey)) / _RES0_U
        # res-0 fractional axial coords, then descend by the EXACT
        # integer axial images of the down-aperture-7 matrices — the
        # res-r lattice is then down7^r of the res-0 lattice by
        # construction, so the integer up-walk (digit extraction,
        # parenting) agrees with direct coarse-res rounding up to the
        # unavoidable ±1 boundary rounding, exactly like libh3
        q = gx - gy / np.sqrt(3.0)
        rr_ = 2.0 * gy / np.sqrt(3.0)
        for lev in range(1, res + 1):
            if lev % 2 == 1:  # Class III (ap7r): i->(3,1,0), j->(0,3,1)
                q, rr_ = 3.0 * q - rr_, q + 2.0 * rr_
            else:             # Class II  (ap7):  i->(3,0,1), j->(1,3,0)
                q, rr_ = 2.0 * q + rr_, -q + 3.0 * rr_
        cur = _axial_round(q, rr_)
        digits = [7] * 15
        for r in range(res, 0, -1):
            parent = _up7(cur, class3=(r % 2 == 1))
            center = _down7(parent, class3=(r % 2 == 1))
            digits[r - 1] = _UNIT_DIGIT.get(_ijk_sub(cur, center), 0)
            cur = parent
        h = (np.uint64(H3_MODE_CELL) << np.uint64(59))
        h |= np.uint64(res) << np.uint64(52)
        h |= np.uint64(f) << np.uint64(45)
        for d in range(15):
            h |= np.uint64(digits[d]) << np.uint64(42 - 3 * d)
        out[n] = h
    return out


def h3_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent by digit truncation (H3 cellToParent semantics): set the
    res field and fill digits below parent_res with 7 (invalid)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = ((c >> np.uint64(52)) & np.uint64(0xF)).astype(np.int64)
    if np.any(res < parent_res):
        raise ValueError("parent_res above cell res")
    out = (c & ~(np.uint64(0xF) << np.uint64(52))) | (
        np.uint64(parent_res) << np.uint64(52))
    for d in range(parent_res, 15):
        out |= np.uint64(7) << np.uint64(42 - 3 * d)
    return out


def h3_k_ring_ijk(k: int) -> np.ndarray:
    """All IJK+ offsets within hex distance k of the origin — exactly
    1 + 3k(k+1) cells (the hexagon k-ring identity)."""
    out = []
    for di in range(-k, k + 1):
        for dj in range(max(-k, -di - k), min(k, -di + k) + 1):
            out.append(_norm_ijk(di, dj, 0))
    return np.array(sorted(set(map(tuple, out))), dtype=np.int64)


def cell_id(lon, lat, level: int, kind: str = "quadkey") -> np.ndarray:
    """Dispatch: 'quadkey' (native), 's2' (S2-style), 'h3' (H3-style —
    real h3 lib when importable, else the self-consistent per-face
    aperture-7 implementation above)."""
    if kind == "quadkey":
        return quadkey_cell(lon, lat, level)
    if kind == "s2":
        return s2_cell_id(lon, lat, level)
    if kind == "h3":
        return h3_cell(lon, lat, level)
    raise ValueError(f"unknown cell kind {kind!r}")
