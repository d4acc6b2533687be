"""Discrete-global-grid cell ids (H3/S2-style) as vectorized kernels.

The reference engine indexes features by quadkey/Hilbert position on the
web-mercator plane (projection.cpp:106-199); the north-star additionally
calls for H3/S2-style cell indexing for spatial joins. Neither the `h3`
nor the `s2` library is available in this environment, so:

- ``s2_cell_id`` implements the publicly documented S2 point→leaf-cell
  derivation (cube face selection, quadratic UV↔ST transform, 30-bit ij)
  with the curve position computed by a plain Hilbert curve per face.
  Ids are stable, hierarchical (``s2_parent`` truncates), and follow the
  S2 bit layout (3 face bits + 2·level position bits + trailing 1), but
  are NOT bit-identical to the official s2geometry ids (which use
  orientation lookup tables). All spatial-join semantics in this repo
  only require a stable hierarchical cell id.
- ``h3_cell`` uses the real `h3` package when importable and otherwise
  raises, with ``cell_id(kind="quadkey")`` as the supported fallback.
"""

from __future__ import annotations

import numpy as np

from .spatial import encode_hilbert, encode_quadkey, lonlat_to_world

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
    return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def s2_cell_id(lon, lat, level: int = S2_MAX_LEVEL) -> np.ndarray:
    """Stable hierarchical S2-style cell id at `level` (0..30).

    Layout follows S2: bits 61..63 = face, then 2*level curve-position
    bits, then a trailing 1 bit marking the level (so parent/child
    relationships are prefix relationships).
    """
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError("level must be in 0..30")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    smax = 1 << S2_MAX_LEVEL
    i = np.clip((_uv_to_st(u) * smax).astype(np.int64), 0, smax - 1)
    j = np.clip((_uv_to_st(v) * smax).astype(np.int64), 0, smax - 1)
    # Hilbert position on the face at 30-bit resolution; shift ij into a
    # 32-bit frame so we can reuse the world-plane kernel, then drop the
    # 4 surplus position bits (2 per axis).
    pos = encode_hilbert(i << 2, j << 2) >> U64(4)  # 60-bit position
    cell = (face.astype(np.uint64) << U64(61)) | (pos << U64(1))
    # truncate to `level` and set the trailing marker bit
    shift = U64(2 * (S2_MAX_LEVEL - level))
    cell = (cell >> shift) << shift
    return cell | (U64(1) << shift)


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
