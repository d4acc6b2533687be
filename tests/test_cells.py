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


# ----------------------------------------------------- H3-style cells


def test_h3_id_layout_and_determinism():
    from tippecanoe_ray.functions.cells import h3_cell

    rs = np.random.RandomState(3)
    lon = rs.uniform(-179, 179, 300)
    lat = rs.uniform(-85, 85, 300)
    c = h3_cell(lon, lat, 6)
    assert c.dtype == np.uint64
    assert (((c >> np.uint64(59)) & np.uint64(0xF)) == 1).all()  # mode
    assert (((c >> np.uint64(52)) & np.uint64(0xF)) == 6).all()  # res
    base = (c >> np.uint64(45)) & np.uint64(0x7F)
    assert int(base.max()) <= 121  # 7-bit base-cell field range
    assert (h3_cell(lon, lat, 6) == c).all()
    # digits beyond res are the 0b111 invalid marker
    for d in range(6, 15):
        assert (((c >> np.uint64(42 - 3 * d)) & np.uint64(7)) == 7).all()


def test_h3_up7_inverts_down7_for_every_child():
    """The exact-hierarchy contract: up-aperture-7 maps each of a
    parent's 7 children (down7(parent) + unit digit) back to the
    parent, for both resolution classes."""
    from tippecanoe_ray.functions import cells as C

    rs = np.random.RandomState(1)
    for class3 in (False, True):
        for _ in range(200):
            p = C._norm_ijk(int(rs.randint(0, 50)), int(rs.randint(0, 50)), 0)
            c0 = C._down7(p, class3)
            for u in C._UNIT:
                child = C._norm_ijk(c0[0] + u[0], c0[1] + u[1], c0[2] + u[2])
                assert C._up7(child, class3) == p


def test_h3_parent_truncation_consistency():
    """parent(cell, r) is a pure digit truncation: two points in the
    same fine cell always share every coarser parent, and the parent's
    res field/digit padding are well-formed."""
    from tippecanoe_ray.functions.cells import h3_cell, h3_parent

    rs = np.random.RandomState(5)
    lon = rs.uniform(-179, 179, 500)
    lat = rs.uniform(-85, 85, 500)
    c8 = h3_cell(lon, lat, 8)
    p5 = h3_parent(c8, 5)
    assert (((p5 >> np.uint64(52)) & np.uint64(0xF)) == 5).all()
    # same fine cell -> same parent (pure function of the id)
    seen = {}
    for f, p in zip(c8.tolist(), p5.tolist()):
        assert seen.setdefault(f, p) == p
    # truncation transitivity: parent(parent(c, 5), 2) == parent(c, 2)
    assert (h3_parent(p5, 2) == h3_parent(c8, 2)).all()


def test_h3_kring_identity():
    from tippecanoe_ray.functions.cells import h3_k_ring_ijk

    for k in (1, 2, 3, 7):
        assert len(h3_k_ring_ijk(k)) == 1 + 3 * k * (k + 1)


def test_h3_spatial_coherence():
    """Tight point clusters share one coarse cell (away from cell
    boundaries), and nearby≠far points separate at fine res."""
    from tippecanoe_ray.functions.cells import h3_cell

    rs = np.random.RandomState(7)
    shared = 0
    for _ in range(40):
        lon0, lat0 = rs.uniform(-170, 170), rs.uniform(-80, 80)
        c = h3_cell(lon0 + rs.uniform(-1e-4, 1e-4, 16),
                    lat0 + rs.uniform(-1e-4, 1e-4, 16), 5)
        shared += len(set(c.tolist())) == 1
    assert shared >= 36  # boundary-straddling clusters allowed
    far = h3_cell([0.0, 90.0, -120.0], [0.0, 45.0, -30.0], 5)
    assert len(set(far.tolist())) == 3
