"""Geometry kernels for line/polygon features — from-scratch
implementations of the reference's per-feature algorithms:

- shoelace ring area (get_area, clip.cpp:606-690 — positive = the
  MVT exterior-ring winding)
- Douglas–Peucker with the reference's determinism rules
  (clip.cpp:909-1002): direction-normalized traversal (scan from the
  lexicographically smaller endpoint) and equal-distance ties broken
  toward the lexicographically smaller point, so simplification is
  winding-invariant and bit-reproducible
- Visvalingam effective-area simplification (visvalingam.cpp:147-230)
- Sutherland–Hodgman polygon clip (clip.cpp:19-82 clip_poly1)
- Cohen–Sutherland line clip (clip.cpp:151-229)
- pnpoly ray-crossing point-in-polygon (the `north_rule` spatial-join
  primitive), vectorized over query points
- ring winding repair (fix_polygon semantics: outer ring positive,
  holes negative), center of mass, grid stairstep (geometry.cpp:438)
"""

from __future__ import annotations

import heapq

import numpy as np


# ------------------------------------------------------------------ area


def shoelace_area(ring: np.ndarray) -> float:
    """Signed ring area; positive = exterior winding (get_area)."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def center_of_mass(points: np.ndarray) -> tuple[float, float]:
    p = np.asarray(points, dtype=np.float64)
    return float(p[:, 0].mean()), float(p[:, 1].mean())


# -------------------------------------------------------- simplification


def _dist_from_line(px, py, x1, y1, x2, y2) -> float:
    """Perpendicular distance from p to the segment's line
    (distance_from_line, geometry.hpp:103)."""
    dx, dy = x2 - x1, y2 - y1
    if dx == 0 and dy == 0:
        return float(np.hypot(px - x1, py - y1))
    return abs(dy * px - dx * py + x2 * y1 - y2 * x1) / float(np.hypot(dx, dy))


def _pt_less(a, b) -> bool:
    return (a[0], a[1]) < (b[0], b[1])


def douglas_peucker(
    points: np.ndarray, epsilon: float, retain: int = 0
) -> np.ndarray:
    """Boolean keep-mask over points; endpoints always kept.

    Reproduces the reference's stack traversal: each segment is scanned
    from its lexicographically smaller endpoint, and equal max
    distances break ties toward the lexicographically smaller point —
    winding-invariant determinism (clip.cpp:936-973)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    kept = 2
    stack = [(0, n - 1)]
    while stack:
        first, second = stack.pop()
        if second - first < 2:
            continue
        a, b = pts[first], pts[second]
        max_distance = -1.0
        far = -1
        if _pt_less(a, b):
            rng = range(first + 1, second)
            x1, y1, x2, y2 = a[0], a[1], b[0], b[1]
        else:
            rng = range(second - 1, first, -1)
            x1, y1, x2, y2 = b[0], b[1], a[0], a[1]
        for i in rng:
            d = _dist_from_line(pts[i][0], pts[i][1], x1, y1, x2, y2)
            if (d > epsilon or kept < retain) and (
                d > max_distance
                or (d == max_distance and far >= 0 and _pt_less(pts[i], pts[far]))
            ):
                far = i
                max_distance = d
        if far >= 0 and max_distance >= 0:
            keep[far] = True
            kept += 1
            stack.append((first, far))
            stack.append((far, second))
    return keep


def visvalingam(points: np.ndarray, area_threshold: float, min_points: int = 2) -> np.ndarray:
    """Keep-mask by effective triangle area (visvalingam.cpp:147-230):
    repeatedly remove the point whose triangle with its neighbors has
    the smallest area, until every remaining area ≥ threshold."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n <= min_points:
        return np.ones(n, dtype=bool)
    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)

    def tri_area(i):
        a, b, c = pts[prev[i]], pts[i], pts[nxt[i]]
        return abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        ) / 2.0

    heap = [(tri_area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    remaining = n
    while heap and remaining > min_points:
        area, i = heapq.heappop(heap)
        if not alive[i] or prev[i] < 0 or nxt[i] >= n:
            continue
        cur = tri_area(i)
        if cur != area:
            heapq.heappush(heap, (cur, i))
            continue
        if cur >= area_threshold:
            break
        alive[i] = False
        remaining -= 1
        p, q = prev[i], nxt[i]
        nxt[p] = q
        prev[q] = p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                heapq.heappush(heap, (tri_area(j), j))
    return alive


# ---------------------------------------------------------------- clipping


def clip_polygon_sh(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Sutherland–Hodgman against an axis-aligned box (clip_poly1).
    Returns the (possibly empty) closed output ring."""
    poly = [tuple(p) for p in np.asarray(ring, dtype=np.float64)]
    if len(poly) > 1 and poly[0] == poly[-1]:
        poly = poly[:-1]

    def inside(p, edge):
        kind, v = edge
        if kind == "l":
            return p[0] >= v
        if kind == "r":
            return p[0] <= v
        if kind == "b":
            return p[1] >= v
        return p[1] <= v

    def intersect(a, b, edge):
        kind, v = edge
        ax, ay = a
        bx, by = b
        if kind in ("l", "r"):
            t = (v - ax) / (bx - ax)
            return (v, ay + t * (by - ay))
        t = (v - ay) / (by - ay)
        return (ax + t * (bx - ax), v)

    for edge in (("l", minx), ("r", maxx), ("b", miny), ("t", maxy)):
        if not poly:
            return np.empty((0, 2))
        out = []
        for i in range(len(poly)):
            cur = poly[i]
            prv = poly[i - 1]
            cin = inside(cur, edge)
            pin = inside(prv, edge)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur, edge))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur, edge))
        poly = out
    if not poly:
        return np.empty((0, 2))
    poly.append(poly[0])
    return np.array(poly)


_INSIDE, _LEFT, _RIGHT, _BOTTOM, _TOP = 0, 1, 2, 4, 8


def _outcode(x, y, minx, miny, maxx, maxy) -> int:
    code = _INSIDE
    if x < minx:
        code |= _LEFT
    elif x > maxx:
        code |= _RIGHT
    if y < miny:
        code |= _BOTTOM
    elif y > maxy:
        code |= _TOP
    return code


def clip_line_cs(p1, p2, minx, miny, maxx, maxy):
    """Cohen–Sutherland segment clip (clip.cpp:151-229). Returns the
    clipped ((x1,y1),(x2,y2)) or None when fully outside."""
    x1, y1 = float(p1[0]), float(p1[1])
    x2, y2 = float(p2[0]), float(p2[1])
    c1 = _outcode(x1, y1, minx, miny, maxx, maxy)
    c2 = _outcode(x2, y2, minx, miny, maxx, maxy)
    while True:
        if not (c1 | c2):
            return (x1, y1), (x2, y2)
        if c1 & c2:
            return None
        c = c1 or c2
        if c & _TOP:
            x = x1 + (x2 - x1) * (maxy - y1) / (y2 - y1)
            y = maxy
        elif c & _BOTTOM:
            x = x1 + (x2 - x1) * (miny - y1) / (y2 - y1)
            y = miny
        elif c & _RIGHT:
            y = y1 + (y2 - y1) * (maxx - x1) / (x2 - x1)
            x = maxx
        else:
            y = y1 + (y2 - y1) * (minx - x1) / (x2 - x1)
            x = minx
        if c == c1:
            x1, y1 = x, y
            c1 = _outcode(x1, y1, minx, miny, maxx, maxy)
        else:
            x2, y2 = x, y
            c2 = _outcode(x2, y2, minx, miny, maxx, maxy)


def clip_linestring(points: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Clip a polyline to a box → list of sub-polylines."""
    pts = np.asarray(points, dtype=np.float64)
    out: list[list] = []
    cur: list = []
    for i in range(len(pts) - 1):
        seg = clip_line_cs(pts[i], pts[i + 1], minx, miny, maxx, maxy)
        if seg is None:
            if cur:
                out.append(cur)
                cur = []
            continue
        a, b = seg
        if cur and tuple(cur[-1]) == a:
            cur.append(b)
        else:
            if cur:
                out.append(cur)
            cur = [a, b]
    if cur:
        out.append(cur)
    return [np.array(c) for c in out]


# --------------------------------------------------------------- queries


def pnpoly(ring: np.ndarray, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Ray-crossing point-in-polygon, vectorized over query points
    (clip.cpp pnpoly)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    x = np.asarray(qx, dtype=np.float64)
    y = np.asarray(qy, dtype=np.float64)
    inside = np.zeros(len(x), dtype=bool)
    j = len(r) - 1
    for i in range(len(r)):
        xi, yi = r[i]
        xj, yj = r[j]
        cond = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / (yj - yi) + xi
        )
        inside ^= cond
        j = i
    return inside


# ---------------------------------------------------------------- winding


def fix_polygon_winding(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Outer rings positive area, holes negative (fix_polygon,
    clip.cpp:1755+): ring nesting depth decides the role; each ring is
    reversed if its winding disagrees."""
    out = []
    for i, ring in enumerate(rings):
        r = np.asarray(ring, dtype=np.float64)
        depth = 0
        probe = r[0]
        for j, other in enumerate(rings):
            if i == j:
                continue
            o = np.asarray(other, dtype=np.float64)
            if len(o) >= 4 and pnpoly(o, np.array([probe[0]]), np.array([probe[1]]))[0]:
                depth += 1
        want_positive = depth % 2 == 0
        area = shoelace_area(r)
        if (area > 0) != want_positive and area != 0:
            r = r[::-1].copy()
        out.append(r)
    return out


def stairstep(points: np.ndarray, z: int, detail: int) -> np.ndarray:
    """Snap to the zoom's pixel grid (geometry.cpp:438-544), removing
    consecutive duplicates."""
    unit = 1 << (32 - z - detail)
    p = (np.asarray(points, dtype=np.int64) // unit) * unit
    keep = np.ones(len(p), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]).any(axis=1)
    return p[keep]
