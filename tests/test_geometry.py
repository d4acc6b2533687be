"""Geometry kernel unit tests."""

import numpy as np

from tippecanoe_ray.functions.geometry import (
    clip_line_cs,
    clip_linestring,
    clip_polygon_sh,
    douglas_peucker,
    fix_polygon_winding,
    pnpoly,
    shoelace_area,
    stairstep,
    visvalingam,
)

SQ = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)


def test_shoelace():
    assert shoelace_area(SQ) == 100.0
    assert shoelace_area(SQ[::-1]) == -100.0


def test_douglas_peucker_basic():
    pts = np.array([[0, 0], [1, 0.1], [2, -0.1], [3, 5], [4, 6], [5, 7], [6, 8.1], [7, 9], [8, 9], [9, 9]])
    keep = douglas_peucker(pts, epsilon=1.0)
    assert keep[0] and keep[-1]
    assert keep[3]  # the corner survives
    assert keep.sum() < len(pts)
    # collinear chain collapses to endpoints
    line = np.stack([np.arange(10), np.arange(10)], axis=1).astype(float)
    assert douglas_peucker(line, 0.5).sum() == 2


def test_douglas_peucker_winding_invariant():
    rng = np.random.RandomState(0)
    pts = np.cumsum(rng.randn(40, 2), axis=0)
    k1 = douglas_peucker(pts, 1.0)
    k2 = douglas_peucker(pts[::-1].copy(), 1.0)
    # reversing the line keeps the same point SET (clip.cpp:936-973)
    np.testing.assert_array_equal(k1, k2[::-1])


def test_douglas_peucker_retain():
    line = np.stack([np.arange(10), np.zeros(10)], axis=1).astype(float)
    keep = douglas_peucker(line, epsilon=100.0, retain=5)
    assert keep.sum() >= 4  # retain forces extra points on a straight line


def test_visvalingam():
    pts = np.array([[0, 0], [1, 0.01], [2, 0], [3, 4], [4, 0], [5, 0.01], [6, 0]])
    alive = visvalingam(pts, area_threshold=0.5)
    assert alive[0] and alive[-1] and alive[3]
    assert not alive[1] or not alive[5]


def test_clip_polygon():
    out = clip_polygon_sh(SQ, 5, 5, 20, 20)
    assert shoelace_area(out) == 25.0
    # fully inside → unchanged area
    out = clip_polygon_sh(SQ, -5, -5, 20, 20)
    assert shoelace_area(out) == 100.0
    # fully outside → empty
    out = clip_polygon_sh(SQ, 20, 20, 30, 30)
    assert len(out) == 0


def test_clip_lines():
    assert clip_line_cs((0, 0), (10, 10), 2, 2, 8, 8) == ((2.0, 2.0), (8.0, 8.0))
    assert clip_line_cs((0, 0), (1, 1), 5, 5, 8, 8) is None
    segs = clip_linestring(np.array([[0, 5], [20, 5], [20, 15], [0, 15]]), 2, 2, 8, 8)
    assert len(segs) == 1
    np.testing.assert_allclose(segs[0], [[2, 5], [8, 5]])


def test_pnpoly():
    qx = np.array([5.0, 15.0, 0.0, 9.99])
    qy = np.array([5.0, 5.0, 20.0, 9.99])
    got = pnpoly(SQ, qx, qy)
    assert got.tolist() == [True, False, False, True]


def test_winding_fix():
    outer_cw = SQ[::-1].copy()  # negative area
    hole_ccw = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=float)  # positive
    fixed = fix_polygon_winding([outer_cw, hole_ccw])
    assert shoelace_area(fixed[0]) > 0  # outer → positive
    assert shoelace_area(fixed[1]) < 0  # hole → negative


def test_stairstep():
    pts = np.array([[0, 0], [3, 1], [65, 66], [100, 100]]) * (1 << 18)
    out = stairstep(pts, z=2, detail=6)
    unit = 1 << (32 - 2 - 6)
    assert (out % unit == 0).all()
    assert len(out) <= len(pts)
