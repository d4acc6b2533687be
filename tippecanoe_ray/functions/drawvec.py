"""Exact drawvec geometry kernels for the line/polygon tile pipeline.

A geometry ("drawvec", reference geometry.hpp:26-67) is represented as
(ops: np.uint8[n], xy: np.int64[n,2]) — an opcode list of MOVETO=1 /
LINETO=2 / CLOSEPATH=7 entries. All functions below re-derive the
reference's semantics bit-for-bit where feasible (integer truncating
division, std::round half-away-from-zero, double evaluation order),
because the per-tile exact-match depends on them:

- clip_lines / clip (Cohen–Sutherland)        clip.cpp:106-229
- simple_clip_poly / clip_poly1 (S–H, doubles) clip.cpp:24-82, 742-905
- remove_noop                                  clip.cpp:532-605
- to_tile_scale                                clip.cpp:507-519
- line_is_too_small                            clip.cpp:1903-1925
- get_area / get_mp_area                       clip.cpp:642-711
- fix_polygon (winding + ring rotation)        clip.cpp:1755-1901
- distance_from_line / douglas_peucker         geometry.cpp ? clip.cpp:909-1002
- impose_tile_boundaries / simplify_lines      geometry.cpp:188-313
- reduce_tiny_poly (accum_area diffusion)      clip.cpp:1048+
- revive_polygon                               tile.cpp:551-590

NOT replicated: clean_or_clip_poly (Clipper2/wagyu polygon union,
clip.cpp:260-388) — `clean_poly_tile_scale` below is a documented
stand-in that drops zero-area rings at tile scale, which matches the
union result for valid input rings.
"""

from __future__ import annotations

import math

import numpy as np

MOVETO = 1
LINETO = 2
CLOSEPATH = 7

U64MASK = (1 << 64) - 1


def _round_half_away(v: float) -> float:
    """std::round: halfway cases away from zero."""
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def round_half_away_arr(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64)
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))


def _tdiv(a: int, b: int) -> int:
    """C truncating integer division (toward zero)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _wrap64(a: int) -> int:
    """Two's-complement 64-bit wrap (C++ long long overflow in practice)."""
    a &= U64MASK
    return a - (1 << 64) if a >= (1 << 63) else a


def geom(ops, xy) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(ops, dtype=np.uint8), np.asarray(xy, dtype=np.int64).reshape(-1, 2)


def empty_geom() -> tuple[np.ndarray, np.ndarray]:
    return np.empty(0, np.uint8), np.empty((0, 2), np.int64)


def rings(ops: np.ndarray):
    """Yield (i, j) for each MOVETO + LINETO* run."""
    n = len(ops)
    i = 0
    while i < n:
        if ops[i] == MOVETO:
            j = i + 1
            while j < n and ops[j] == LINETO:
                j += 1
            yield i, j
            i = j
        else:
            i += 1


def geom_bbox(xy: np.ndarray, ops: np.ndarray | None = None):
    """min/max over moveto/lineto coords (decode_geometry, geometry.cpp:22)."""
    if ops is not None:
        m = ops != CLOSEPATH
        xy = xy[m]
    if len(xy) == 0:
        return None
    return (
        int(xy[:, 0].min()), int(xy[:, 1].min()),
        int(xy[:, 0].max()), int(xy[:, 1].max()),
    )


# ------------------------------------------------------------------- area


def get_area(xy: np.ndarray, i: int, j: int) -> float:
    """Shoelace with the reference's base-point offset (clip.cpp:642-689).
    Vectorized double sum; the reference accumulates sequentially — only
    near-zero areas could differ in the last ulp."""
    if j - i < 3:
        return 0.0
    bx = float(xy[i, 0])
    by = float(xy[i, 1])
    x = xy[i:j, 0].astype(np.float64) - bx
    y = xy[i:j, 1].astype(np.float64) - by
    xn = np.concatenate((x[1:], x[:1]))
    yn = np.concatenate((y[1:], y[:1]))
    return float(np.sum(x * yn) - np.sum(y * xn)) / 2.0


def get_mp_area(ops: np.ndarray, xy: np.ndarray) -> float:
    return sum(get_area(xy, i, j) for i, j in rings(ops))


# ----------------------------------------------------------------- snapping


def snap_world(xy: np.ndarray, gscale: int) -> np.ndarray:
    """SHIFT_LEFT(SHIFT_RIGHT(w)): round(w / 2^G) * 2^G half-away
    (serial.cpp:29-31; COORD_OFFSET is a multiple of 2^G so SHIFT_LEFT
    is an exact shift)."""
    if gscale == 0:
        return np.asarray(xy, dtype=np.int64)
    s = round_half_away_arr(np.asarray(xy, dtype=np.float64) / (1 << gscale))
    return (s.astype(np.int64)) << gscale


def shift_right(xy: np.ndarray, gscale: int) -> np.ndarray:
    if gscale == 0:
        return np.asarray(xy, dtype=np.int64)
    return round_half_away_arr(np.asarray(xy, dtype=np.float64) / (1 << gscale)).astype(np.int64)


# ------------------------------------------------------------- line clipping


def _computeOutCode(x, y, xmin, ymin, xmax, ymax) -> int:
    code = 0
    if x < xmin:
        code |= 1  # LEFT
    elif x > xmax:
        code |= 2  # RIGHT
    if y < ymin:
        code |= 4  # BOTTOM
    elif y > ymax:
        code |= 8  # TOP
    return code


def cs_clip_segment(x0, y0, x1, y1, xmin, ymin, xmax, ymax):
    """The reference's `clip` (clip.cpp:166-229): Cohen–Sutherland with
    TRUNCATING long long division at intersections. Returns
    (code, x0, y0, x1, y1): code 0 = rejected, 1 = unchanged,
    2 = clipped."""
    outcode0 = _computeOutCode(x0, y0, xmin, ymin, xmax, ymax)
    outcode1 = _computeOutCode(x1, y1, xmin, ymin, xmax, ymax)
    changed = 0
    while True:
        if not (outcode0 | outcode1):
            return changed + 1, x0, y0, x1, y1
        if outcode0 & outcode1:
            return 0, x0, y0, x1, y1
        out = outcode0 if outcode0 else outcode1
        if out & 8:  # TOP
            x = _wrap64(x0 + _tdiv(_wrap64((x1 - x0) * (ymax - y0)), (y1 - y0)))
            y = ymax
        elif out & 4:  # BOTTOM
            x = _wrap64(x0 + _tdiv(_wrap64((x1 - x0) * (ymin - y0)), (y1 - y0)))
            y = ymin
        elif out & 2:  # RIGHT
            y = _wrap64(y0 + _tdiv(_wrap64((y1 - y0) * (xmax - x0)), (x1 - x0)))
            x = xmax
        else:  # LEFT
            y = _wrap64(y0 + _tdiv(_wrap64((y1 - y0) * (xmin - x0)), (x1 - x0)))
            x = xmin
        if out == outcode0:
            x0, y0 = x, y
            outcode0 = _computeOutCode(x0, y0, xmin, ymin, xmax, ymax)
            changed = 1
        else:
            x1, y1 = x, y
            outcode1 = _computeOutCode(x1, y1, xmin, ymin, xmax, ymax)
            changed = 1


def clip_lines(ops: np.ndarray, xy: np.ndarray, minx, miny, maxx, maxy):
    """clip.cpp:115-141 — per-segment clip preserving the reference's
    exact opcode-stream structure (stray MOVETOs cleaned by
    remove_noop)."""
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    n = len(ops)
    for i in range(n):
        if (
            i > 0
            and ops[i] == LINETO
            and (ops[i - 1] == MOVETO or ops[i - 1] == LINETO)
        ):
            c, x1, y1, x2, y2 = cs_clip_segment(
                int(xy[i - 1, 0]), int(xy[i - 1, 1]),
                int(xy[i, 0]), int(xy[i, 1]),
                minx, miny, maxx, maxy,
            )
            if c > 1:
                out_ops += [MOVETO, LINETO, MOVETO]
                out_xy += [(x1, y1), (x2, y2), (int(xy[i, 0]), int(xy[i, 1]))]
            elif c == 1:
                out_ops.append(int(ops[i]))
                out_xy.append((int(xy[i, 0]), int(xy[i, 1])))
            else:
                out_ops.append(MOVETO)
                out_xy.append((int(xy[i, 0]), int(xy[i, 1])))
        else:
            out_ops.append(int(ops[i]))
            out_xy.append((int(xy[i, 0]), int(xy[i, 1])))
    return (
        np.array(out_ops, np.uint8),
        np.array(out_xy, np.int64).reshape(-1, 2),
    )


# ---------------------------------------------------------- polygon clipping


def _inside(px: float, py: float, edge: int, minx, miny, maxx, maxy) -> bool:
    if edge == 0:
        return py > miny
    if edge == 1:
        return px < maxx
    if edge == 2:
        return py < maxy
    return px > minx


def _intersect(ax, ay, bx, by, edge, minx, miny, maxx, maxy):
    if edge == 0:
        return (ax + (bx - ax) * (miny - ay) / (by - ay), float(miny))
    if edge == 1:
        return (float(maxx), ay + (by - ay) * (maxx - ax) / (bx - ax))
    if edge == 2:
        return (ax + (bx - ax) * (maxy - ay) / (by - ay), float(maxy))
    return (float(minx), ay + (by - ay) * (minx - ax) / (bx - ax))


def clip_poly1(pts: list[tuple[float, float]], minx, miny, maxx, maxy):
    """Sutherland–Hodgman over doubles (clip.cpp:781-905), without the
    shared-node branches (prevent_simplify_shared_nodes=false ⇒ only
    the buffer-edge intersections are emitted)."""
    out = list(pts)
    for edge in range(4):
        if out:
            src = out
            out = []
            S = src[-1]
            for E in src:
                s_in = _inside(S[0], S[1], edge, minx, miny, maxx, maxy)
                e_in = _inside(E[0], E[1], edge, minx, miny, maxx, maxy)
                if not s_in:
                    if e_in:
                        out.append(_intersect(S[0], S[1], E[0], E[1], edge, minx, miny, maxx, maxy))
                        out.append(E)
                else:
                    if not e_in:
                        out.append(_intersect(S[0], S[1], E[0], E[1], edge, minx, miny, maxx, maxy))
                    else:
                        out.append(E)
                S = E
    if out:
        if out[0][0] != out[-1][0] or out[0][1] != out[-1][1]:
            out.append(out[0])
        if len(out) < 3:
            return []
    return out


def simple_clip_poly(ops: np.ndarray, xy: np.ndarray, minx, miny, maxx, maxy):
    """clip.cpp:24-69: per-ring S–H clip, output rounded half-away."""
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    for i, j in rings(ops):
        tmp = [(float(xy[k, 0]), float(xy[k, 1])) for k in range(i, j)]
        tmp = clip_poly1(tmp, minx, miny, maxx, maxy)
        for k, (px, py) in enumerate(tmp):
            out_ops.append(MOVETO if k == 0 else LINETO)
            out_xy.append((int(_round_half_away(px)), int(_round_half_away(py))))
    return (
        np.array(out_ops, np.uint8),
        np.array(out_xy, np.int64).reshape(-1, 2),
    )


def clip_poly1_pn(pts, minx, miny, maxx, maxy, ax, ay, bx, by,
                  edge_nodes: list[tuple[int, int]]):
    """S–H clip with the -pn double boundary (clip.cpp:781-877,
    prevent_simplify_shared_nodes=true): points are emitted not only
    where a segment crosses the buffer rectangle (minx..maxy) but also
    where it crosses the tile-proper rectangle (ax..by); the latter are
    recorded (rounded half-away) as tile-edge shared nodes."""
    out = list(pts)
    for edge in range(4):
        if out:
            src = out
            out = []
            S = src[-1]
            for E in src:
                s_buf = _inside(S[0], S[1], edge, minx, miny, maxx, maxy)
                e_buf = _inside(E[0], E[1], edge, minx, miny, maxx, maxy)
                if not s_buf:
                    # was outside the buffer
                    if not e_buf:
                        pass  # still outside
                    elif not _inside(E[0], E[1], edge, ax, ay, bx, by):
                        # outside the tile but inside the buffer
                        out.append(_intersect(S[0], S[1], E[0], E[1], edge, minx, miny, maxx, maxy))
                        out.append(E)
                    else:
                        out.append(_intersect(S[0], S[1], E[0], E[1], edge, minx, miny, maxx, maxy))
                        p = _intersect(S[0], S[1], E[0], E[1], edge, ax, ay, bx, by)
                        out.append(p)
                        edge_nodes.append((int(_round_half_away(p[0])), int(_round_half_away(p[1]))))
                        out.append(E)
                elif not _inside(S[0], S[1], edge, ax, ay, bx, by):
                    # was inside the buffer but outside the tile edge
                    if not e_buf:
                        out.append(_intersect(S[0], S[1], E[0], E[1], edge, minx, miny, maxx, maxy))
                    elif not _inside(E[0], E[1], edge, ax, ay, bx, by):
                        out.append(E)
                    else:
                        p = _intersect(S[0], S[1], E[0], E[1], edge, ax, ay, bx, by)
                        out.append(p)
                        edge_nodes.append((int(_round_half_away(p[0])), int(_round_half_away(p[1]))))
                        out.append(E)
                else:
                    # was inside the tile
                    if not e_buf:
                        p = _intersect(S[0], S[1], E[0], E[1], edge, ax, ay, bx, by)
                        out.append(p)
                        edge_nodes.append((int(_round_half_away(p[0])), int(_round_half_away(p[1]))))
                        out.append(_intersect(S[0], S[1], E[0], E[1], edge, minx, miny, maxx, maxy))
                    elif not _inside(E[0], E[1], edge, ax, ay, bx, by):
                        p = _intersect(S[0], S[1], E[0], E[1], edge, ax, ay, bx, by)
                        out.append(p)
                        edge_nodes.append((int(_round_half_away(p[0])), int(_round_half_away(p[1]))))
                        out.append(E)
                    else:
                        out.append(E)
                S = E
    if out:
        if out[0][0] != out[-1][0] or out[0][1] != out[-1][1]:
            out.append(out[0])
        if len(out) < 3:
            return []
    return out


def simple_clip_poly_pn(ops: np.ndarray, xy: np.ndarray, minx, miny,
                        maxx, maxy, ax, ay, bx, by):
    """-pn polygon clip (clip.cpp:24-69 with
    prevent_simplify_shared_nodes): remove_noop first (clip.cpp:79-81),
    then the double-boundary ring clip. Returns (ops, xy, edge_nodes)
    with edge_nodes the tile-boundary crossing points in the same
    (tile-local) coordinate frame."""
    ops, xy = remove_noop(ops, xy, 3, 0)
    edge_nodes: list[tuple[int, int]] = []
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    for i, j in rings(ops):
        tmp = [(float(xy[k, 0]), float(xy[k, 1])) for k in range(i, j)]
        tmp = clip_poly1_pn(tmp, minx, miny, maxx, maxy, ax, ay, bx, by, edge_nodes)
        for k, (px, py) in enumerate(tmp):
            out_ops.append(MOVETO if k == 0 else LINETO)
            out_xy.append((int(_round_half_away(px)), int(_round_half_away(py))))
    return (
        np.array(out_ops, np.uint8),
        np.array(out_xy, np.int64).reshape(-1, 2),
        edge_nodes,
    )


# -------------------------------------------------------------- remove_noop


def _remove_noop_fast(ops: np.ndarray, xy: np.ndarray, vt_type: int, shift: int):
    """Vectorized remove_noop for streams WITHOUT CLOSEPATH entries
    (the cascade's working form): identical output to the scalar
    version, asserted by the shared test corpus."""
    if shift == 0:
        r = xy
    else:
        r = round_half_away_arr(xy.astype(np.float64) / (1 << shift)).astype(np.int64)
    n = len(ops)
    # pass 1: a LINETO equal (rounded) to its predecessor collapses;
    # runs of equals collapse transitively to the first, so comparing
    # with the immediate predecessor is exact here (no CLOSEPATH can
    # interrupt the ox/oy chain)
    keep = np.ones(n, dtype=bool)
    if n > 1:
        same = (r[1:] == r[:-1]).all(axis=1) & (ops[1:] == LINETO)
        # collapse runs: an element equal to a DROPPED predecessor is
        # still equal to the last kept one (transitivity of equality)
        keep[1:] = ~same
    o1 = ops[keep]
    p1 = xy[keep]
    r1 = r[keep]
    if vt_type != 1:
        # pass 2: unused movetos (next op is not LINETO / end)
        m = len(o1)
        keep2 = np.ones(m, dtype=bool)
        if m:
            is_m = o1 == MOVETO
            nxt_not_line = np.empty(m, dtype=bool)
            nxt_not_line[:-1] = o1[1:] != LINETO
            nxt_not_line[-1] = True
            keep2 = ~(is_m & nxt_not_line)
        o1, p1, r1 = o1[keep2], p1[keep2], r1[keep2]
    if vt_type == 2:
        m = len(o1)
        if m > 2:
            # conditions read only the ORIGINAL neighbors (a dropped
            # MOVETO's predecessor is a LINETO, never another dropped
            # row), so the scan vectorizes directly
            keep3 = np.ones(m, dtype=bool)
            keep3[2:] = ~(
                (o1[2:] == MOVETO) & (o1[1:-1] == LINETO)
                & (r1[2:] == r1[1:-1]).all(axis=1)
            )
            o1, p1 = o1[keep3], p1[keep3]
    return o1.copy(), p1.copy()


def remove_noop(ops: np.ndarray, xy: np.ndarray, vt_type: int, shift: int):
    """clip.cpp:532-605 — three passes: empty linetos, unused movetos,
    (lines) empty movetos. `shift` compares coordinates rounded to the
    shifted grid."""
    if len(ops) and not (ops == CLOSEPATH).any():
        return _remove_noop_fast(ops, xy, vt_type, shift)

    def r(v: int) -> int:
        if shift == 0:
            return v
        return int(_round_half_away(v / (1 << shift)))

    n = len(ops)
    o1: list[int] = []
    p1: list[tuple[int, int]] = []
    ox = oy = 0
    for i in range(n):
        nx = r(int(xy[i, 0]))
        ny = r(int(xy[i, 1]))
        if ops[i] == LINETO and nx == ox and ny == oy:
            continue
        if ops[i] == CLOSEPATH:
            o1.append(CLOSEPATH)
            p1.append((int(xy[i, 0]), int(xy[i, 1])))
        else:
            o1.append(int(ops[i]))
            p1.append((int(xy[i, 0]), int(xy[i, 1])))
            ox, oy = nx, ny

    if vt_type != 1:  # not VT_POINT: remove unused movetos
        o2: list[int] = []
        p2: list[tuple[int, int]] = []
        m = len(o1)
        i = 0
        while i < m:
            if o1[i] == MOVETO:
                if i + 1 >= m:
                    i += 1
                    continue
                if o1[i + 1] == MOVETO:
                    i += 1
                    continue
                if o1[i + 1] == CLOSEPATH:
                    i += 2
                    continue
            o2.append(o1[i])
            p2.append(p1[i])
            i += 1
        o1, p1 = o2, p2

    if vt_type == 2:  # VT_LINE: remove empty movetos
        o3: list[int] = []
        p3: list[tuple[int, int]] = []
        for i in range(len(o1)):
            if i > 1 and o1[i] == MOVETO:
                if (
                    o1[i - 1] == LINETO
                    and r(p1[i - 1][0]) == r(p1[i][0])
                    and r(p1[i - 1][1]) == r(p1[i][1])
                ):
                    continue
            o3.append(o1[i])
            p3.append(p1[i])
        o1, p1 = o3, p3

    return np.array(o1, np.uint8), np.array(p1, np.int64).reshape(-1, 2)


# ------------------------------------------------------------- tile scaling


def to_tile_scale(xy: np.ndarray, z: int, detail: int) -> np.ndarray:
    """clip.cpp:507-519 — std::round(x / 2^(32-detail-z)) half-away."""
    s = 32 - detail - z
    f = np.asarray(xy, dtype=np.float64)
    if s < 0:
        return round_half_away_arr(f * (1 << (-s))).astype(np.int64)
    return round_half_away_arr(f / (1 << s)).astype(np.int64)


def line_is_too_small(ops: np.ndarray, xy: np.ndarray, z: int, detail: int) -> bool:
    """clip.cpp:1903-1925: every vertex rounds to the same pixel."""
    if len(ops) == 0:
        return True
    div = 1 << (32 - detail - z)
    r = round_half_away_arr(xy.astype(np.float64) / div).astype(np.int64)
    x = y = 0
    for i in range(len(ops)):
        if ops[i] == MOVETO:
            x, y = int(r[i, 0]), int(r[i, 1])
        else:
            if int(r[i, 0]) != x or int(r[i, 1]) != y:
                return False
    return True


# ------------------------------------------------------------ quick_check


def quick_check(bbox, z: int, buffer: int) -> int:
    """geometry.cpp:147-174."""
    mn = 0
    area = 1 << (32 - z)
    if bbox[0] > mn and bbox[1] > mn and bbox[2] < area and bbox[3] < area:
        return 1
    mn -= buffer * area // 256
    area += buffer * (1 << (32 - z)) // 256
    if bbox[0] > mn and bbox[1] > mn and bbox[2] < area and bbox[3] < area:
        return 3
    if bbox[0] > area or bbox[1] > area:
        return 0
    if bbox[2] < mn or bbox[3] < mn:
        return 0
    return 2


# ----------------------------------------------------------- winding repair


def fix_polygon(ops: np.ndarray, xy: np.ndarray,
                use_winding: bool = False, reverse_winding: bool = False):
    """clip.cpp:1755-1901: close rings, orient by sign of area vs
    inner/outer expectation, rotate each ring so the centroid-remote
    vertex is the seam. -pw use_winding reverses EVERY ring (GeoJSON
    winding is reversed from vector winding); -pW reverse_winding
    reverses none (clip.cpp:1802-1812)."""
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    outer = 1
    n = len(ops)
    i = 0
    while i < n:
        if ops[i] == CLOSEPATH:
            outer = 1
            i += 1
            continue
        if ops[i] != MOVETO:
            i += 1
            continue
        j = i + 1
        while j < n and ops[j] == LINETO:
            j += 1
        if j - i < 1:
            i = j
            outer = 0
            continue
        ring = [(int(xy[a, 0]), int(xy[a, 1])) for a in range(i, j)]
        if ring[0] != ring[-1]:
            ring.append(ring[0])
        while len(ring) < 4:
            ring.append(ring[0])
        if use_winding:
            reverse_ring = True
        elif reverse_winding:
            reverse_ring = False
        else:
            area = get_area(np.array(ring, np.int64), 0, len(ring))
            reverse_ring = (area > 0) != bool(outer)
        if reverse_ring:
            ring = ring[::-1]
        # rotate: centroid → furthest vertex → vertex furthest from that
        cnt = len(ring) - 1
        xt = _tdiv(sum(p[0] for p in ring[:cnt]), cnt) if cnt else 0
        yt = _tdiv(sum(p[1] for p in ring[:cnt]), cnt) if cnt else 0
        dist2 = 0
        furthest = 0
        for a in range(cnt):
            xd = _tdiv(ring[a][0] - xt, 16)
            yd = _tdiv(ring[a][1] - yt, 16)
            d2 = xd * xd + yd * yd
            if d2 > dist2 or (d2 == dist2 and _draw_less(ring[a], ring[furthest])):
                dist2 = d2
                furthest = a
        dist2b = 0
        furthestb = 0
        for a in range(cnt):
            xd = _tdiv(ring[a][0] - ring[furthest][0], 16)
            yd = _tdiv(ring[a][1] - ring[furthest][1], 16)
            d2 = xd * xd + yd * yd
            if d2 > dist2b or (d2 == dist2b and _draw_less(ring[a], ring[furthestb])):
                dist2b = d2
                furthestb = a
        for a in range(len(ring)):
            a2 = (a + furthestb) % (len(ring) - 1)
            out_ops.append(MOVETO if a == 0 else LINETO)
            out_xy.append(ring[a2])
        i = j
        outer = 0
    return np.array(out_ops, np.uint8), np.array(out_xy, np.int64).reshape(-1, 2)


def _draw_less(a, b) -> bool:
    """draw::operator< — y first, then x (geometry.hpp:46-52)."""
    return a[1] < b[1] or (a[1] == b[1] and a[0] < b[0])


# ------------------------------------------------------------ simplification


def distance_from_line(px, py, ax, ay, bx, by) -> float:
    """geometry.cpp distance_from_line: integer downshifts + 1/16
    quantization for cross-platform determinism."""
    p2x = bx - ax
    p2y = by - ay
    something = (_tdiv(p2x, 4) * _tdiv(p2x, 8) + _tdiv(p2y, 4) * _tdiv(p2y, 8)) * 32.0
    if something == 0:
        u = 0.0
    else:
        u = (_tdiv(px - ax, 4) * _tdiv(p2x, 8) + _tdiv(py - ay, 4) * _tdiv(p2y, 8)) * 32.0 / something
    if u >= 1:
        u = 1.0
    elif u <= 0:
        u = 0.0
    x = ax + u * p2x
    y = ay + u * p2y
    dx = x - px
    dy = y - py
    return _round_half_away(math.sqrt(dx * dx + dy * dy) * 16.0) / 16.0


def _dfl_vec(px: np.ndarray, py: np.ndarray, ax: int, ay: int, bx: int, by: int) -> np.ndarray:
    """Vectorized distance_from_line (identical integer-downshift and
    1/16-quantization semantics)."""

    def tdiv(a, b):
        a = np.asarray(a, dtype=np.int64)
        return np.sign(a) * (np.abs(a) // b)

    p2x = bx - ax
    p2y = by - ay
    something = (_tdiv(p2x, 4) * _tdiv(p2x, 8) + _tdiv(p2y, 4) * _tdiv(p2y, 8)) * 32.0
    if something == 0:
        u = np.zeros(len(px))
    else:
        u = (tdiv(px - ax, 4) * _tdiv(p2x, 8) + tdiv(py - ay, 4) * _tdiv(p2y, 8)) * 32.0 / something
    u = np.clip(u, 0.0, 1.0)
    x = ax + u * p2x
    y = ay + u * p2y
    dx = x - px
    dy = y - py
    return round_half_away_arr(np.sqrt(dx * dx + dy * dy) * 16.0) / 16.0


def douglas_peucker(xy: np.ndarray, necessary: np.ndarray, start: int, n: int,
                    e: float, kept: int, retain: int, pn: bool = False):
    """clip.cpp:909-1002 — stack traversal scanning each sub-segment
    from its draw-less endpoint; ties break toward the draw-less point.
    With pn (prevent_simplify_shared_nodes, clip.cpp:932-936), each
    already-necessary vertex consumes one unit of `retain`."""
    stack: list[int] = []
    prev = 0
    for here in range(1, n):
        if necessary[start + here]:
            stack.append(prev)
            stack.append(here)
            prev = here
            if pn and retain > 0:
                retain -= 1
    # one vectorized copy-out: per-point access below is then C-speed
    # list indexing instead of per-element ndarray getitem
    xs = xy[start:start + n, 0].tolist()
    ys = xy[start:start + n, 1].tolist()
    while stack:
        second = stack.pop()
        first = stack.pop()
        max_distance = -1.0
        a = (xs[first], ys[first])
        b = (xs[second], ys[second])
        a_less = _draw_less(a, b)
        if a_less:
            idxs = range(first + 1, second)
            sx, sy, ex, ey = a[0], a[1], b[0], b[1]
        else:
            idxs = range(second - 1, first, -1)
            sx, sy, ex, ey = b[0], b[1], a[0], a[1]
        farthest = first
        nseg = len(idxs) if not isinstance(idxs, range) else len(idxs)
        if nseg and nseg <= 16:
            # scalar fast path: short segments dominate DP pops and the
            # ~20-numpy-op vectorized kernel costs more than the math.
            # Bit-identical to _dfl_vec (same int trunc-divs, same IEEE
            # float ops, same (y, x, scan-pos) tie-break).
            p2x = ex - sx
            p2y = ey - sy
            # inlined _tdiv (C trunc division; b > 0 so sign follows a)
            s4x = abs(p2x) // 4 if p2x >= 0 else -(abs(p2x) // 4)
            s8x = abs(p2x) // 8 if p2x >= 0 else -(abs(p2x) // 8)
            s4y = abs(p2y) // 4 if p2y >= 0 else -(abs(p2y) // 4)
            s8y = abs(p2y) // 8 if p2y >= 0 else -(abs(p2y) // 8)
            something = (s4x * s8x + s4y * s8y) * 32.0
            gate_all = kept < retain
            dmax = -1.0
            bx_ = by_ = bpos = 0
            for pos in range(nseg):
                ii = idxs[pos]
                pxi = xs[ii]
                pyi = ys[ii]
                if something == 0:
                    u = 0.0
                else:
                    ux = pxi - sx
                    uy = pyi - sy
                    u = ((abs(ux) // 4) * (1 if ux >= 0 else -1) * s8x
                         + (abs(uy) // 4) * (1 if uy >= 0 else -1) * s8y) * 32.0 / something
                    if u > 1.0:
                        u = 1.0
                    elif u < 0.0:
                        u = 0.0
                dx = sx + u * p2x - pxi
                dy = sy + u * p2y - pyi
                v = math.sqrt(dx * dx + dy * dy) * 16.0
                d = math.floor(v + 0.5) / 16.0  # v >= 0 always
                if not gate_all and not (d > e):
                    continue
                if d > dmax:
                    dmax = d
                    bx_, by_, bpos = pxi, pyi, pos
                elif d == dmax and (pyi, pxi, pos) < (by_, bx_, bpos):
                    bx_, by_, bpos = pxi, pyi, pos
            if dmax >= 0:
                farthest = int(idxs[bpos])
                max_distance = dmax
        elif nseg:
            idxs = np.asarray(idxs, dtype=np.int64)
            px = xy[start + idxs, 0]
            py = xy[start + idxs, 1]
            d = np.abs(_dfl_vec(px, py, sx, sy, ex, ey))
            gate = (d > e) if kept >= retain else np.ones(len(d), dtype=bool)
            if gate.any():
                dmax = d[gate].max()
                cand = np.flatnonzero(gate & (d == dmax))
                # the sequential scan keeps the first candidate, replacing
                # only on strictly draw-less points: final = min by
                # (y, x, scan position)
                order = np.lexsort(
                    (cand, px[cand], py[cand])
                )
                farthest = int(idxs[cand[order[0]]])
                max_distance = float(dmax)
        if max_distance >= 0:
            necessary[start + farthest] = True
            kept += 1
            if a_less:
                if 1 < farthest - first:
                    stack.append(first)
                    stack.append(farthest)
                if 1 < second - farthest:
                    stack.append(farthest)
                    stack.append(second)
            else:
                if 1 < second - farthest:
                    stack.append(farthest)
                    stack.append(second)
                if 1 < farthest - first:
                    stack.append(first)
                    stack.append(farthest)
    return kept


class _VisItem:
    __slots__ = ("area", "pt", "next", "prev", "idx")

    def __init__(self, area: float, pt: int):
        self.area = area
        self.pt = pt
        self.next = None
        self.prev = None
        self.idx = 0


class _VisHeap:
    """Faithful port of visvalingam.cpp:45-136's hand-rolled binary
    min-heap (Push/Pop/Update with in-place index tracking). Pop and
    Update tie order must match the reference exactly — heapq's
    sift tie-breaking differs, so the loops are transliterated."""

    __slots__ = ("h",)

    def __init__(self):
        self.h: list[_VisItem] = []

    def push(self, item: _VisItem):
        item.idx = len(self.h)
        self.h.append(item)
        self._up(item.idx)

    def pop(self) -> _VisItem:
        h = self.h
        removed = h[0]
        last = h.pop()
        if h:
            last.idx = 0
            h[0] = last
            self._down(0)
        return removed

    def update(self, item: _VisItem, area: float):
        if item.area > area:
            item.area = area
            self._up(item.idx)
        else:
            item.area = area
            self._down(item.idx)

    def _up(self, i: int):
        h = self.h
        obj = h[i]
        while i > 0:
            up = ((i + 1) >> 1) - 1
            parent = h[up]
            if parent.area <= obj.area:
                break
            parent.idx = i
            h[i] = parent
            obj.idx = up
            h[up] = obj
            i = up

    def _down(self, i: int):
        h = self.h
        n = len(h)
        obj = h[i]
        while True:
            right = (i + 1) << 1
            left = right - 1
            down = i
            child = h[down]
            if left < n and h[left].area < child.area:
                down = left
                child = h[down]
            if right < n and h[right].area < child.area:
                down = right
                child = h[down]
            if down == i:
                break
            child.idx = i
            h[i] = child
            obj.idx = down
            h[down] = obj
            i = down


def _dbl_tri_area(xy: np.ndarray, start: int, i1: int, i2: int, i3: int) -> float:
    """doubleTriangleArea (visvalingam.cpp:138-145): |cross| in long
    long arithmetic, converted to double. Wrapped to int64 to match
    C++ overflow behavior on pathological spans."""
    ax = int(xy[start + i1, 0]); ay = int(xy[start + i1, 1])
    bx = int(xy[start + i2, 0]); by = int(xy[start + i2, 1])
    cx = int(xy[start + i3, 0]); cy = int(xy[start + i3, 1])
    return float(abs(_wrap64((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))))


def visvalingam_mark(xy: np.ndarray, necessary: np.ndarray, start: int,
                     end: int, threshold: float, retain: int):
    """visvalingam.cpp:147-230 (orb-derived effective-area reduction):
    repeatedly remove the min-double-area vertex of [start, end) while
    that double-area <= 2*threshold and more than `retain` points
    remain; survivors are ORed into `necessary` (pre-marked vertices
    keep their flag regardless — the reference never clears)."""
    n = end - start
    removed = 0
    threshold = threshold * 2.0
    inf = math.inf

    heap = _VisHeap()
    head = _VisItem(inf, 0)
    heap.push(head)

    prev = head
    for i in range(1, n - 1):
        it = _VisItem(_dbl_tri_area(xy, start, i - 1, i, i + 1), i)
        it.prev = prev
        heap.push(it)
        prev.next = it
        prev = it

    tail = _VisItem(inf, n - 1)
    tail.prev = prev
    prev.next = tail
    heap.push(tail)

    while heap.h:
        cur = heap.pop()
        if cur.area > threshold or n - removed <= retain:
            break
        nxt = cur.next
        prv = cur.prev
        prv.next = nxt
        nxt.prev = prv
        removed += 1
        if prv.prev is not None:
            area = _dbl_tri_area(xy, start, prv.prev.pt, prv.pt, nxt.pt)
            area = max(area, cur.area)
            heap.update(prv, area)
        if nxt.next is not None:
            area = _dbl_tri_area(xy, start, prv.pt, nxt.pt, nxt.next.pt)
            area = max(area, cur.area)
            heap.update(nxt, area)

    item = head
    while item is not None:
        necessary[item.pt + start] = True
        item = item.next


def impose_tile_boundaries(ops, xy, necessary, extent: int):
    """geometry.cpp:188-217: insert necessary vertices where segments
    cross the tile-proper boundary."""
    n = len(ops)
    # fast path: a segment with BOTH endpoints inside [0, extent]^2
    # clips to itself (Cohen–Sutherland identity), inserting nothing —
    # if no segment has an outside endpoint, the stream is unchanged
    if n:
        inside = (
            (xy[:, 0] >= 0) & (xy[:, 0] <= extent)
            & (xy[:, 1] >= 0) & (xy[:, 1] <= extent)
        )
        if inside.all():
            return ops, xy, necessary
    o: list[int] = []
    p: list[tuple[int, int]] = []
    nec: list[bool] = []
    for i in range(n):
        if (i > 0 and ops[i] == LINETO
                and (ops[i - 1] == MOVETO or ops[i - 1] == LINETO)
                and not (inside[i] and inside[i - 1])):
            c, x1, y1, x2, y2 = cs_clip_segment(
                int(xy[i - 1, 0]), int(xy[i - 1, 1]),
                int(xy[i, 0]), int(xy[i, 1]),
                0, 0, extent, extent,
            )
            if c > 1:
                if x1 != int(xy[i - 1, 0]) or y1 != int(xy[i - 1, 1]):
                    o.append(LINETO)
                    p.append((x1, y1))
                    nec.append(True)
                if x2 != int(xy[i, 0]) or y2 != int(xy[i, 1]):
                    o.append(LINETO)
                    p.append((x2, y2))
                    nec.append(True)
        o.append(int(ops[i]))
        p.append((int(xy[i, 0]), int(xy[i, 1])))
        nec.append(bool(necessary[i]))
    return (
        np.array(o, np.uint8),
        np.array(p, np.int64).reshape(-1, 2),
        np.array(nec, bool),
    )


# ---- pure-kernel memo (zoom-retry reuse) ---------------------------
#
# The as-needed strategy driver re-runs a WHOLE zoom when any tile
# raises a shared threshold (traverse_zooms tile.cpp:3506-3527), so at
# the low zooms — one or a handful of serial tiles — the retry pass
# repeats simplify/clean work on byte-identical inputs. These kernels
# are pure functions of their arguments, so a byte-keyed memo installed
# by the zoom task (and shipped to the retry pass) skips the repeat
# without any semantic change: identical input bytes + identical
# parameters => identical output by construction.
_MEMO: dict | None = None
_MEMO_CAP = 200_000  # entries; low-zoom retry sets are far smaller
_MEMO_MAX_NBYTES = 1 << 20  # skip giant features


def memo_install(d: dict | None) -> None:
    global _MEMO
    _MEMO = d


def memo_take() -> dict | None:
    global _MEMO
    d = _MEMO
    _MEMO = None
    return d


def simplify_lines(ops, xy, z: int, detail: int, mark_tile_bounds: bool,
                   simplification: float, retain: int,
                   pn: bool = False, tx: int = 0, ty: int = 0,
                   local_nodes=None, global_nodes=None,
                   use_visvalingam: bool = False):
    memo = _MEMO
    key = None
    if (memo is not None and not pn and global_nodes is None
            and not local_nodes and xy.nbytes <= _MEMO_MAX_NBYTES):
        key = (1, ops.tobytes(), xy.tobytes(), z, detail, mark_tile_bounds,
               simplification, retain, use_visvalingam)
        hit = memo.get(key)
        if hit is not None:
            return hit[0].copy(), hit[1].copy()
    o, p = _simplify_lines_impl(
        ops, xy, z, detail, mark_tile_bounds, simplification, retain,
        pn=pn, tx=tx, ty=ty, local_nodes=local_nodes,
        global_nodes=global_nodes, use_visvalingam=use_visvalingam)
    if key is not None and len(memo) < _MEMO_CAP:
        memo[key] = (o.copy(), p.copy())
    return o, p


def _simplify_lines_impl(ops, xy, z: int, detail: int, mark_tile_bounds: bool,
                         simplification: float, retain: int,
                         pn: bool = False, tx: int = 0, ty: int = 0,
                         local_nodes=None, global_nodes=None,
                         use_visvalingam: bool = False):
    """geometry.cpp:219-313. With pn (-pn), vertices matching either
    the tile-local clip edge nodes (`local_nodes`, a set of (x, y)
    tile-local tuples, geometry.cpp:243-246) or the global shared-node
    index (`global_nodes`, a SORTED uint64 array of
    encode_vertex(x, y) = (x << 32) | y world keys,
    geometry.cpp:248-267) are marked necessary before simplification."""
    res = 1 << (32 - detail - z)
    area = 1 << (32 - z)
    necessary = ops != LINETO  # MOVETO/CLOSEPATH necessary
    necessary = necessary.copy()
    if pn and len(ops):
        if local_nodes:
            enc = xy[:, 0].astype(np.float64) + 1j * xy[:, 1].astype(np.float64)
            keys = np.fromiter(
                (float(px) + 1j * float(py) for px, py in local_nodes),
                dtype=np.complex128, count=len(local_nodes),
            )
            necessary |= np.isin(enc, keys)
        if global_nodes is not None and len(global_nodes):
            # offset to global and truncate to unsigned 32-bit
            # ((unsigned) cast, geometry.cpp:251-257)
            gx = xy[:, 0].copy()
            gy = xy[:, 1].copy()
            if z != 0:
                gx += tx << (32 - z)
                gy += ty << (32 - z)
            key = (
                ((gx.view(np.uint64) if gx.dtype == np.int64 else gx.astype(np.uint64))
                 & np.uint64(0xFFFFFFFF)) << np.uint64(32)
            ) | ((gy.view(np.uint64) if gy.dtype == np.int64 else gy.astype(np.uint64))
                 & np.uint64(0xFFFFFFFF))
            pos = np.searchsorted(global_nodes, key)
            pos_c = np.minimum(pos, len(global_nodes) - 1)
            necessary |= global_nodes[pos_c] == key
    if mark_tile_bounds:
        ops, xy, necessary = impose_tile_boundaries(ops, xy, necessary, area)
    n = len(ops)
    i = 0
    while i < n:
        if ops[i] == MOVETO:
            j = i + 1
            while j < n and ops[j] == LINETO:
                j += 1
            necessary[i] = True
            necessary[j - 1] = True
            if j - i > 1:
                if use_visvalingam:
                    # empirical DP->visvalingam threshold mapping
                    # (geometry.cpp:287-296)
                    sim = simplification * (0.1596 * z + 0.878)
                    scale = (res * sim) * (res * sim)
                    scale = (
                        math.exp(1.002 * math.log(scale) + 0.3043)
                        if scale > 0 else 0.0
                    )
                    visvalingam_mark(xy, necessary, i, j, scale, retain)
                else:
                    douglas_peucker(xy, necessary, i, j - i, res * simplification, 2, retain, pn)
            i = j
        else:
            i += 1
    return ops[necessary], xy[necessary]


# ------------------------------------------------------- tiny-poly reduction


def reduce_tiny_poly(ops, xy, z: int, detail: int, accum_area: float,
                     tiny_polygon_size: float = 2.0):
    """clip.cpp:1048+ — returns (ops', xy', still_needs_simplification,
    reduced_away, accum_area')."""
    pixel = (1 << (32 - detail - z)) * float(tiny_polygon_size)
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    included_last_outer = False
    still = False
    reduced_away = False
    for i, j in rings(ops):
        area = get_area(xy, i, j)
        if area != 0:
            if (area > 0 and area <= pixel * pixel) or (area < 0 and not included_last_outer):
                accum_area += area
                reduced_away = True
                if area > 0 and accum_area > pixel * pixel:
                    gx = float(xy[i, 0])
                    gy = float(xy[i, 1])
                    half = pixel / 2
                    pts = [
                        (MOVETO, gx - half, gy - half),
                        (LINETO, gx - half + pixel, gy - half),
                        (LINETO, gx - half + pixel, gy - half + pixel),
                        (LINETO, gx - half, gy - half + pixel),
                        (LINETO, gx - half, gy - half),
                    ]
                    for op, px, py in pts:
                        out_ops.append(op)
                        out_xy.append((int(px), int(py)))
                    accum_area -= pixel * pixel
                if area > 0:
                    included_last_outer = False
            else:
                for k in range(i, j):
                    out_ops.append(int(ops[k]))
                    out_xy.append((int(xy[k, 0]), int(xy[k, 1])))
                still = True
                if area > 0:
                    included_last_outer = True
        # area == 0: neither reduced nor needing simplification
    return (
        np.array(out_ops, np.uint8),
        np.array(out_xy, np.int64).reshape(-1, 2),
        still,
        reduced_away,
        accum_area,
    )


# --------------------------------------------------------------- revive


def revive_polygon(ops, xy, area: float, z: int, detail: int):
    """tile.cpp:551-590 — area-preserving placeholder rectangle."""
    divisor = 1 << (32 - detail - z)
    area = area / (divisor * divisor)
    if area == 0:
        return empty_geom()
    height = math.ceil(math.sqrt(area))
    width = int(_round_half_away(area / height)) if height else 0
    if width == 0:
        width = 1
    m = (ops == MOVETO) | (ops == LINETO)
    n = int(m.sum())
    if n == 0:
        return empty_geom()
    sx = _tdiv(int(xy[m, 0].sum()), n)
    sy = _tdiv(int(xy[m, 1].sum()), n)
    hw = width // 2
    hh = height // 2
    o = [MOVETO, LINETO, LINETO, LINETO, LINETO]
    p = [
        (sx - hw, sy - hh),
        (sx - hw + width, sy - hh),
        (sx - hw + width, sy - hh + height),
        (sx - hw, sy - hh + height),
        (sx - hw, sy - hh),
    ]
    return np.array(o, np.uint8), np.array(p, np.int64).reshape(-1, 2)


# ------------------------------------------------- polygon cleaning stand-in


def _pnpoly(ring_xy: np.ndarray, px: int, py: int) -> bool:
    """Ray-crossing point-in-ring (clip.cpp pnpoly semantics)."""
    x = ring_xy[:, 0]
    y = ring_xy[:, 1]
    n = len(x)
    inside = False
    j = n - 1
    for i in range(n):
        if ((y[i] > py) != (y[j] > py)) and (
            px < (x[j] - x[i]) * (py - y[i]) / (y[j] - y[i]) + x[i]
        ):
            inside = not inside
        j = i
    return inside


def clean_poly_tile_scale(ops, xy, try_scaling: bool = True):
    memo = _MEMO
    key = None
    if memo is not None and xy.nbytes <= _MEMO_MAX_NBYTES:
        key = (2, ops.tobytes(), xy.tobytes(), try_scaling)
        hit = memo.get(key)
        if hit is not None:
            return hit[0].copy(), hit[1].copy()
    o, p = _clean_poly_tile_scale_impl(ops, xy, try_scaling)
    if key is not None and len(memo) < _MEMO_CAP:
        memo[key] = (o.copy(), p.copy())
    return o, p


def _clean_poly_tile_scale_impl(ops, xy, try_scaling: bool = True):
    """clean_or_clip_poly (clip.cpp:260-388) via the Vatti/wagyu port:
    positive-fill union of the feature's rings with snap rounding,
    self-intersection repair, ring-nesting rebuild, and the x16
    scale-up retry (tile.cpp:691 calls coalesce_polygon(geom, true)
    after to_tile_scale). Output ring start vertices and ring order are
    byte-exact vs the reference cleaner (fuzz-validated against an
    instrumented probe of the reference binary)."""
    from . import wagyu

    ops, xy = remove_noop(ops, xy, 3, 0)
    rings_in = []
    for i, j in rings(ops):
        if j - i >= 4:
            rings_in.append([(int(x), int(y)) for x, y in xy[i:j]])
    if not rings_in:
        return empty_geom()
    result = wagyu.union_multi(rings_in, try_scaling)
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    for poly in result:
        for j, ring in enumerate(poly):
            if ring and ring[-1] != ring[0]:
                ring = ring + [ring[0]]  # "Had to close ring" clip.cpp:241-244
            start = len(out_xy)
            for k, (x, y) in enumerate(ring):
                out_ops.append(MOVETO if k == 0 else LINETO)
                out_xy.append((x, y))
            area = get_area(np.array(out_xy[start:], np.int64), 0, len(ring))
            if (j == 0 and area < 0) or (j != 0 and area > 0):
                raise RuntimeError(
                    f"Ring area has wrong sign: {area} for {j}")  # clip.cpp:248-251
    return np.array(out_ops, np.uint8), np.array(out_xy, np.int64).reshape(-1, 2)


# -------------------------------------------------------- label anchors


def pnpoly_dv(xy: np.ndarray, start: int, nvert: int, tx: int, ty: int) -> bool:
    """clip.cpp:1153-1162 (float-division ray crossing)."""
    c = False
    j = nvert - 1
    for i in range(nvert):
        yi = int(xy[start + i, 1])
        yj = int(xy[start + j, 1])
        if (yi > ty) != (yj > ty):
            xi = int(xy[start + i, 0])
            xj = int(xy[start + j, 0])
            if tx < (xj - xi) * (ty - yi) / float(yj - yi) + xi:
                c = not c
        j = i
    return c


def center_of_mass(xy: np.ndarray, start: int, end: int,
                   cx: int, cy: int) -> tuple[int, int]:
    """Turf center of mass (geometry.cpp:546-599); falls back to the
    centroid when the shape has no area. Output truncates to int like
    the draw() long long conversion."""
    pts = xy[start:end].astype(np.float64)
    nx = pts[:, 0] - cx
    ny = pts[:, 1] - cy
    sx = sy = s_area = 0.0
    for i in range(len(pts) - 1):
        xi, yi = nx[i], ny[i]
        xj, yj = nx[i + 1], ny[i + 1]
        a = xi * yj - xj * yi
        s_area += a
        sx += (xi + xj) * a
        sy += (yi + yj) * a
    if s_area == 0:
        return cx, cy
    area_factor = 1 / (6 * (s_area * 0.5))
    return int(cx + area_factor * sx), int(cy + area_factor * sy)


def label_goodness(ops: np.ndarray, xy: np.ndarray, x: int, y: int) -> float:
    """geometry.cpp:636-693: 0 outside the polygon (by ring nesting),
    else the closest distance to any border."""
    nesting = 0
    for i, j in rings(ops):
        if pnpoly_dv(xy, i, j - i, x, y):
            if get_area(xy, i, j) >= 0:
                nesting += 1
            else:
                nesting -= 1
    if nesting < 1:
        return 0.0
    closest = math.inf
    n = len(ops)
    for i in range(n):
        dx = float(xy[i, 0] - x)
        dy = float(xy[i, 1] - y)
        dist = math.sqrt(dx * dx + dy * dy)
        if dist < closest:
            closest = dist
        if i > 0 and ops[i] == LINETO:
            dist = distance_from_line(x, y, int(xy[i - 1, 0]), int(xy[i - 1, 1]),
                                      int(xy[i, 0]), int(xy[i, 1]))
            if dist < closest:
                closest = dist
    return closest


def _sorty_key(pts: list[tuple[int, int]], kind: int):
    def key(p):
        if kind == 0:
            xa, ya = p[0], p[1]
        elif kind == 1:
            xa, ya = p[1], p[0]
        elif kind == 2:
            xa, ya = p[0] + p[1], p[0] - p[1]
        else:
            xa, ya = p[0] - p[1], p[0] + p[1]
        return (ya, xa)

    return sorted(pts, key=key)


def polygon_to_anchor(ops: np.ndarray, xy: np.ndarray) -> tuple[int, int] | None:
    """geometry.cpp:766-945: center of mass of the largest outer ring,
    falling back to sorted-stride midpoints, then grid points, then the
    centroid, maximizing label_goodness."""
    start = end = 0
    # the reference's best_area is a size_t: every assignment TRUNCATES
    # the double ring area (geometry.cpp:768,793), so sub-1.0 areas
    # (tiny rings snapped at a coarse geometry_scale) stay 0 — and the
    # whole anchor is skipped (`if (best_area > 0)`), leaving
    # label_point = 0. A later ring with a SMALLER fractional area can
    # also displace an earlier one (0.4 > trunc(0.6)=0). Flag-fuzzer
    # find: islands -z4 -d9 -aP.
    best_area = 0
    points: list[tuple[int, int]] = []
    for i, j in rings(ops):
        for k in range(i + 1, j):
            points.append((int(xy[k, 0]), int(xy[k, 1])))
        area = get_area(xy, i, j)
        if area > best_area:
            start, end, best_area = i, j, int(area)
    if best_area <= 0:
        return None
    xs = xy[start + 1 : end, 0]
    ys = xy[start + 1 : end, 1]
    count = len(xs)
    if count == 0:
        return None
    xsum = int(xs.sum())
    ysum = int(ys.sum())
    xmin, ymin = int(xs.min()), int(ys.min())
    xmax, ymax = int(xs.max()), int(ys.max())
    radius = math.sqrt(best_area / math.pi)
    goodness_threshold = radius / 5
    ccx, ccy = _tdiv(xsum, count), _tdiv(ysum, count)
    dx, dy = center_of_mass(xy, start, end, ccx, ccy)
    goodness = label_goodness(ops, xy, dx, dy)
    if goodness < goodness_threshold:
        candidates: list[tuple[float, int, int, int]] = []
        seqn = 0
        for p in range(4):
            sp = _sorty_key(points, p)
            for i in range(1, len(sp)):
                ddx = sp[i][0] - sp[i - 1][0]
                ddy = sp[i][1] - sp[i - 1][1]
                dist = math.sqrt(float(ddx) * ddx + float(ddy) * ddy)
                if dist > 2 * goodness_threshold:
                    candidates.append(
                        (dist, seqn, _tdiv(sp[i][0] + sp[i - 1][0], 2),
                         _tdiv(sp[i][1] + sp[i - 1][1], 2))
                    )
                    seqn += 1
        # stable sort, largest distance first (candidate::operator<)
        candidates.sort(key=lambda c: (-c[0], c[1]))
        for i in range(min(len(candidates), 50)):
            _, _, mx, my = candidates[i]
            maybe = label_goodness(ops, xy, mx, my)
            if maybe > goodness:
                dx, dy = mx, my
                goodness = maybe
                if goodness > goodness_threshold:
                    break
    if goodness < goodness_threshold:
        sub = 2
        while sub < 32 and (xmax - xmin) > 2 * sub and (ymax - ymin) > 2 * sub:
            for gx in range(1, sub):
                for gy in range(1, sub):
                    mx = xmin + _tdiv(gx * (xmax - xmin), sub)
                    my = ymin + _tdiv(gy * (ymax - ymin), sub)
                    maybe = label_goodness(ops, xy, mx, my)
                    if maybe > goodness:
                        dx, dy = mx, my
                        goodness = maybe
            if goodness > goodness_threshold:
                break
            sub *= 2
        maybe = label_goodness(ops, xy, ccx, ccy)
        if maybe > goodness:
            dx, dy = ccx, ccy
            goodness = maybe
    return dx, dy


def checkerboard_anchors(ops: np.ndarray, xy: np.ndarray, tx: int, ty: int,
                         z: int, label_wx: int, label_wy: int):
    """geometry.cpp:947-1046: repeat the ingest label anchor on a
    checkerboard lattice, keeping lattice points inside the feature
    bbox; off-center anchors need goodness > tilesize/100."""
    tx1 = ty1 = 0
    tx2 = 1 << 32
    if z != 0:
        tx1 = tx << (32 - z)
        ty1 = ty << (32 - z)
        tx2 = (tx + 1) << (32 - z)
    m = ops != CLOSEPATH
    if not m.any():
        return []
    bx1 = int(xy[m, 0].min()) + tx1
    by1 = int(xy[m, 1].min()) + ty1
    bx2 = int(xy[m, 0].max()) + tx1
    by2 = int(xy[m, 1].max()) + ty1
    spiral_dist = 0.3
    if z > 0:
        spiral_dist = spiral_dist * math.exp(math.log(z) * 1.2)
    label_spacing = int(spiral_dist * (tx2 - tx1))
    if label_spacing <= 0:
        return []
    # the reference divides long long / long long — C TRUNCATING
    # division — before floor()/ceil() ever see the (already integral)
    # value (geometry.cpp:992-995); Python's float floor-division is
    # off by one for negative offsets, shifting the anchor lattice
    # (flag-fuzzer find: islands -z4 -d9 -aP)
    def _cdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    x1 = _cdiv(min(bx1 - label_wx, bx2 - label_wx), label_spacing)
    x2 = _cdiv(max(bx1 - label_wx, bx2 - label_wx), label_spacing)
    y1 = _cdiv(min(by1 - label_wy, by2 - label_wy), label_spacing) - 1
    y2 = _cdiv(max(by1 - label_wy, by2 - label_wy), label_spacing)
    out = []
    for lx in range(x1, x2 + 1):
        for ly in range(y1, y2 + 1):
            x = lx * label_spacing + label_wx
            y = ly * label_spacing + label_wy
            if (lx & 1) == 1:
                y += label_spacing // 2
            if x < bx1 or x > bx2 or y < by1 or y > by2:
                continue
            if lx == 0 and ly == 0:
                out.append((x - tx1, y - ty1))
                break
            else:
                tilesize = float(1 << (32 - z))
                if label_goodness(ops, xy, x - tx1, y - ty1) > tilesize / 100:
                    out.append((x - tx1, y - ty1))
                    break
    return out


def stairstep_ops(ops: np.ndarray, xy: np.ndarray, z: int, detail: int):
    """--grid-low-zooms rasterization (stairstep, geometry.cpp:438-544):
    snap every vertex to the z-pixel grid (std::round), then walk each
    segment with Bresenham — collinear runs collapse to their endpoints
    via the `last`-direction merge; segments are walked in a canonical
    orientation (swapped so y descends) and un-swapped on output —
    then scale back up. CLOSEPATH rows pass through."""
    unit = 1 << (32 - detail - z)
    g = np.empty_like(xy)
    q = xy.astype(np.float64) / unit
    g = np.where(q >= 0, np.floor(q + 0.5), np.ceil(q - 0.5)).astype(np.int64)
    out_ops: list[int] = []
    out_xy: list[tuple[int, int]] = []
    for i in range(len(ops)):
        op = int(ops[i])
        if op == 7:
            out_ops.append(7)
            out_xy.append((0, 0))
            continue
        x1, y1 = int(g[i, 0]), int(g[i, 1])
        if op == 1 or not out_xy:
            out_ops.append(1 if op == 1 else op)
            out_xy.append((x1, y1))
            continue
        x0, y0 = out_xy[-1]
        swap = False
        if y0 < y1:
            swap = True
            x0, x1 = x1, x0
            y0, y1 = y1, y0
        xx, yy = x0, y0
        dx = abs(x1 - x0)
        sx = 1 if x0 < x1 else -1
        dy = abs(y1 - y0)
        sy = 1 if y0 < y1 else -1
        # C integer division truncates toward zero
        e0 = dx if dx > dy else -dy
        err = e0 // 2 if e0 >= 0 else -((-e0) // 2)
        last = -1
        tmp: list[tuple[int, int]] = [(xx, yy)]
        while xx != x1 or yy != y1:
            e2 = err
            if e2 > -dx:
                err -= dy
                xx += sx
                if last == 1:
                    tmp[-1] = (xx, yy)
                else:
                    tmp.append((xx, yy))
                last = 1
            if e2 < dy:
                err += dx
                yy += sy
                if last == 2:
                    tmp[-1] = (xx, yy)
                else:
                    tmp.append((xx, yy))
                last = 2
        if swap:
            tmp.reverse()
        for p in tmp:
            out_ops.append(2)
            out_xy.append(p)
    oo = np.array(out_ops, np.uint8)
    ox = np.array(out_xy, np.int64).reshape(-1, 2) * unit
    ox[oo == 7] = 0
    return oo, ox
