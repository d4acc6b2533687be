"""S2 cell-id parity contract (functions/cells.py).

No s2geometry library exists in this environment, so parity is proven
structurally: the vectorized lookup-table encoder (the exact
S2CellId::FromFaceIJ port) is cross-checked against an INDEPENDENT
per-level orientation-walk oracle built here from the same published
4x4 constants but none of the same composition (no lookup tables, no
4-bit batching), plus the hierarchy/continuity invariants the S2 bit
layout guarantees.
"""

import numpy as np

from tippecanoe_ray.functions.cells import (
    _POS_TO_IJ,
    _POS_TO_ORIENTATION,
    S2_MAX_LEVEL,
    S2_SWAP_MASK,
    cell_id,
    s2_cell_id,
    s2_from_face_ij,
    s2_parent,
)

# kIJtoPos derived by inverting the published kPosToIJ (the oracle's
# only shared input with the implementation under test).
_IJ_TO_POS = [[None] * 4 for _ in range(4)]
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o][_POS_TO_IJ[_o][_p]] = _p


def s2_leaf_oracle(face: int, i: int, j: int) -> int:
    """Per-level orientation walk: at each of the 30 levels take one
    (i, j) bit pair, map it to a curve position via kIJtoPos under the
    current orientation, and update the orientation — the textbook
    definition of the S2 curve, one bit pair at a time."""
    orientation = face & S2_SWAP_MASK
    pos = 0
    for k in reversed(range(S2_MAX_LEVEL)):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orientation][ij]
        pos = (pos << 2) | p
        orientation ^= _POS_TO_ORIENTATION[p]
    n = (face << 60) | pos
    return n * 2 + 1


def test_from_face_ij_matches_independent_walk():
    rng = np.random.default_rng(42)
    n = 512
    faces = rng.integers(0, 6, n)
    ii = rng.integers(0, 1 << 30, n)
    jj = rng.integers(0, 1 << 30, n)
    # corner / boundary probes on every face
    for f in range(6):
        for i, j in [(0, 0), (0, (1 << 30) - 1), ((1 << 30) - 1, 0),
                     ((1 << 30) - 1, (1 << 30) - 1), (1 << 29, 1 << 29)]:
            faces = np.append(faces, f)
            ii = np.append(ii, i)
            jj = np.append(jj, j)
    got = s2_from_face_ij(faces, ii, jj)
    want = np.array(
        [s2_leaf_oracle(int(f), int(i), int(j))
         for f, i, j in zip(faces, ii, jj)],
        dtype=np.uint64,
    )
    assert (got == want).all()


def test_leaf_ids_are_valid_and_face_bits_correct():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-89.9, 89.9, 1000)
    ids = s2_cell_id(lon, lat)
    # leaf: lsb set (level marker at bit 0)
    assert (ids & np.uint64(1)).all()
    # face bits in 0..5
    assert (ids >> np.uint64(61) <= 5).all()


def test_parent_is_prefix_and_contains_child():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    leaf = s2_cell_id(lon, lat)
    for level in (0, 5, 12, 20, 29):
        par = s2_cell_id(lon, lat, level)
        assert (par == s2_parent(leaf, level)).all()
        # range containment: parent's [id - lsb + 1, id + lsb - 1]
        lsb = np.uint64(1) << np.uint64(2 * (S2_MAX_LEVEL - level))
        assert (leaf >= par - lsb + np.uint64(1)).all()
        assert (leaf <= par + lsb - np.uint64(1)).all()
        # marker bit at the right position, curve bits below it zero
        assert (par & (np.uint64(2) * lsb - np.uint64(1)) == lsb).all()


def test_curve_continuity_within_face():
    """Consecutive curve positions are geometrically adjacent: walking
    curve positions 0..n on a face yields |di| + |dj| == 1 steps (the
    defining Hilbert property; catches any table transposition)."""
    # brute-force the first 4 levels on face 0 and face 3 (swapped
    # start orientation) by inverting the oracle over the 16x16 grid
    for face in (0, 3):
        cells = {}
        for i in range(16):
            for j in range(16):
                # level-4 id: take the top 8 curve bits of a leaf at
                # the cell center
                leaf = s2_leaf_oracle(face, i << 26 | (1 << 25), j << 26 | (1 << 25))
                pos8 = (leaf >> 1) & ((1 << 60) - 1)
                cells[pos8 >> 52] = (i, j)
        assert len(cells) == 256
        order = [cells[p] for p in sorted(cells)]
        for (i0, j0), (i1, j1) in zip(order, order[1:]):
            assert abs(i0 - i1) + abs(j0 - j1) == 1, (face, i0, j0, i1, j1)


def test_known_geometry_anchors():
    """Spec anchors that need no library: the center of face 0
    (lon=0, lat=0) and the six face centers land on the expected
    faces; (0,0) sits exactly at face 0's center cell at level 1."""
    ids = s2_cell_id([0.0, 90.0, 180.0, -90.0, 0.0, 0.0],
                     [0.0, 0.0, 0.0, 0.0, 89.9999, -89.9999])
    faces = (ids >> np.uint64(61)).tolist()
    assert faces == [0, 1, 3, 4, 2, 5]
    # lon=0, lat=0 -> u=v=0 -> s=t=0.5 -> i=j=2^29: the first leaf of
    # the (1,1) quadrant; its level-0 cell is face 0's full cell
    lvl0 = s2_cell_id([0.0], [0.0], 0)
    assert lvl0[0] == np.uint64(1) << np.uint64(60)


def test_cell_id_dispatch():
    lon = np.array([12.5, -77.0])
    lat = np.array([41.9, 38.9])
    q = cell_id(lon, lat, 6, kind="quadkey")
    s = cell_id(lon, lat, 6, kind="s2")
    assert q.dtype == np.uint64 and s.dtype == np.uint64
    assert (s == s2_cell_id(lon, lat, 6)).all()
