"""Vatti polygon clipping (union / intersection) with snap-rounding —
a from-scratch Python implementation of the algorithm used by the
reference's polygon cleaning (mapbox wagyu 0.5.0 as vendored under
reference mapbox/geometry/wagyu/, driven by clean_or_clip_poly
clip.cpp:260-388).

The reference cleans every polygon feature per tile with
wagyu.execute(union, positive, positive) over rings scaled x16, then
retries at x1 if the result is not on the x16 grid. Byte-exact parity
of the output ring vertex ORDER (the linked-list head position after
the sweep and topology correction) matters for MVT parity, so this is
a faithful behavioral re-implementation of the published Vatti
algorithm with wagyu's conventions:

- screen coordinates: edge.bot is the endpoint with the LARGER y; the
  scanline sweeps from max y down to min y (scanbeam popped from the
  back of an ascending-sorted vector);
- snap rounding via a "hot pixel" pre-pass (own Vatti sweep that only
  collects intersection / vertex pixels), then the main sweep inserts
  hot pixels into output paths as they are traversed;
- output rings are doubly-linked point lists; left-side bounds prepend
  (the list head moves), right-side bounds append — reproducing the
  head position is what fixes the output start vertex;
- topology correction: orientation fix by ring depth, collinear-edge
  merging, self-intersection splitting at repeated points, chained
  ring merging, full tree rebuild (with the reference's tippecanoe
  patch: orphan holes are dropped, not fatal).

Ports semantics from (cited per function):
  build_edges.hpp, local_minimum_util.hpp, build_local_minima_list.hpp,
  snap_rounding.hpp, vatti.hpp, active_bound_list.hpp, ring.hpp,
  ring_util.hpp, intersect_util.hpp, process_horizontal.hpp,
  process_maxima.hpp, topology_correction.hpp, build_result.hpp,
  almost_equal.hpp, util.hpp, and clip.cpp:230-388 (decode/scale loop).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# float comparison (almost_equal.hpp: google-test FloatingPoint, 4 ULPs)
# ---------------------------------------------------------------------------

_PACK = struct.Struct("<d")
_UNPACK_Q = struct.Struct("<q")
_SIGN = 1 << 63


def _bits(x: float) -> int:
    return _UNPACK_Q.unpack(_PACK.pack(x))[0] & 0xFFFFFFFFFFFFFFFF


def _biased(b: int) -> int:
    # sign-magnitude -> biased representation (almost_equal.hpp:186-196)
    if b & _SIGN:
        return ~b & 0xFFFFFFFFFFFFFFFF  # ~bits + 1 with the +1 folded below
    return b | _SIGN


def values_are_equal(x: float, y: float) -> bool:
    """almost_equal.hpp:220-227 — within 4 ULPs; NaN never equal.

    Fast paths (exact): x == y is always within 4 ULPs; and for normal
    magnitudes, 4 ULPs spans at most 4 * 2^-52 * 2*max(|x|,|y|)
    ≈ 1.78e-15 * m, so a gap beyond 2e-15 * m can never be equal.
    """
    if x == y:
        return True
    d = x - y
    if d != d:  # NaN operand
        return False
    m = abs(x) if abs(x) > abs(y) else abs(y)
    if m > 1e-300 and (d if d > 0 else -d) > 2e-15 * m:
        return False
    bx = _bits(x)
    by = _bits(y)
    # SignAndMagnitudeToBiased (almost_equal.hpp:186): ~sam + 1 for negatives
    if bx & _SIGN:
        bx = (~bx + 1) & 0xFFFFFFFFFFFFFFFF
    else:
        bx = bx | _SIGN
    if by & _SIGN:
        by = (~by + 1) & 0xFFFFFFFFFFFFFFFF
    else:
        by = by | _SIGN
    return abs(bx - by) <= 4


def value_is_zero(v: float) -> bool:
    return values_are_equal(v, 0.0)


def greater_than(x: float, y: float) -> bool:
    if x <= y:
        return False
    return not values_are_equal(x, y)


def less_than(x: float, y: float) -> bool:
    if x >= y:
        return False
    return not values_are_equal(x, y)


def _llround(v: float) -> int:
    # C llround: round half away from zero
    if v >= 0.0:
        return int(math.floor(v + 0.5))
    return int(math.ceil(v - 0.5))


def round_towards_min(v: float) -> int:
    """ring_util.hpp:80-91 — 0.5 -> 0, -0.5 -> -1."""
    half = math.floor(v) + 0.5
    if values_are_equal(v, half):
        return int(math.floor(v))
    return _llround(v)


def round_towards_max(v: float) -> int:
    """ring_util.hpp:93-104 — 0.5 -> 1, -0.5 -> 0."""
    half = math.floor(v) + 0.5
    if values_are_equal(v, half):
        return int(math.ceil(v))
    return _llround(v)


# ---------------------------------------------------------------------------
# constants (config.hpp)
# ---------------------------------------------------------------------------

CLIP_INTERSECTION = 0
CLIP_UNION = 1
CLIP_DIFFERENCE = 2
CLIP_XOR = 3

PTYPE_SUBJECT = 0
PTYPE_CLIP = 1

FILL_EVEN_ODD = 0
FILL_NON_ZERO = 1
FILL_POSITIVE = 2
FILL_NEGATIVE = 3

SIDE_LEFT = 0
SIDE_RIGHT = 1

INF = math.inf


# ---------------------------------------------------------------------------
# data structures
# ---------------------------------------------------------------------------


class Edge:
    __slots__ = ("botx", "boty", "topx", "topy", "dx")

    def __init__(self, cur, nxt):
        # edge.hpp:41-57: bot is the endpoint with y >= other
        cx, cy = cur
        nx, ny = nxt
        if cy >= ny:
            self.botx, self.boty = cx, cy
            self.topx, self.topy = nx, ny
        else:
            self.botx, self.boty = nx, ny
            self.topx, self.topy = cx, cy
        dy = float(self.topy - self.boty)
        if value_is_zero(dy):
            self.dx = INF
        else:
            self.dx = float(self.topx - self.botx) / dy

    def recompute_dx(self):
        dy = float(self.topy - self.boty)
        self.dx = INF if value_is_zero(dy) else float(self.topx - self.botx) / dy

    def __repr__(self):  # pragma: no cover - debug aid
        return f"E[({self.botx},{self.boty})->({self.topx},{self.topy})]"


def is_horizontal(e: Edge) -> bool:
    # dx is +inf for horizontals (edge.hpp:53-56); never NaN
    return e.dx == INF or e.dx == -INF


def get_current_x(e: Edge, current_y: int) -> float:
    # edge.hpp:84-91
    if current_y == e.topy:
        return float(e.topx)
    return float(e.botx) + e.dx * float(current_y - e.boty)


def slopes_equal_edges(e1: Edge, e2: Edge) -> bool:
    # edge.hpp:70-74 (int64 cross product; Python ints are exact)
    return (e1.topy - e1.boty) * (e2.topx - e2.botx) == (e1.topx - e1.botx) * (
        e2.topy - e2.boty
    )


def slopes_equal_points(p1, p2, p3) -> bool:
    # util.hpp:55-60
    return (p1[1] - p2[1]) * (p2[0] - p3[0]) == (p1[0] - p2[0]) * (p2[1] - p3[1])


class Bound:
    __slots__ = (
        "edges",
        "current_edge",  # index into edges, len(edges) == "end"
        "next_edge",
        "last_point",
        "ring",
        "maximum_bound",
        "current_x",
        "pos",
        "winding_count",
        "winding_count2",
        "winding_delta",
        "poly_type",
        "side",
    )

    def __init__(self):
        self.edges = []
        self.current_edge = 0
        self.next_edge = 0
        self.last_point = (0, 0)
        self.ring = None
        self.maximum_bound = None
        self.current_x = 0.0
        self.pos = 0
        self.winding_count = 0
        self.winding_count2 = 0
        self.winding_delta = 0
        self.poly_type = PTYPE_SUBJECT
        self.side = SIDE_LEFT

    @property
    def cur(self) -> Edge:
        return self.edges[self.current_edge]

    def at_end(self) -> bool:
        return self.current_edge >= len(self.edges)

    def next_at_end(self) -> bool:
        return self.next_edge >= len(self.edges)


class LocalMinimum:
    __slots__ = ("left_bound", "right_bound", "y", "minimum_has_horizontal")

    def __init__(self, left, right, y, has_horz):
        self.left_bound = left
        self.right_bound = right
        self.y = y
        self.minimum_has_horizontal = has_horz


class PointNode:
    __slots__ = ("ring", "x", "y", "next", "prev")

    def __init__(self, ring, x, y):
        self.ring = ring
        self.x = x
        self.y = y
        self.next = self
        self.prev = self

    def same_xy(self, other) -> bool:
        return self.x == other.x and self.y == other.y

    def __repr__(self):  # pragma: no cover - debug aid
        return f"P({self.x},{self.y})"


class Ring:
    __slots__ = (
        "ring_index",
        "size_",
        "area_",
        "bbox",
        "parent",
        "children",
        "points",
        "bottom_point",
        "is_hole_",
        "corrected",
    )

    def __init__(self):
        self.ring_index = 0
        self.size_ = 0
        self.area_ = math.nan
        self.bbox = (0, 0, 0, 0)  # minx, miny, maxx, maxy
        self.parent = None
        self.children = []
        self.points = None
        self.bottom_point = None
        self.is_hole_ = False
        self.corrected = False

    def reset_stats(self):
        self.area_ = math.nan
        self.is_hole_ = False
        self.bbox = (0, 0, 0, 0)
        self.size_ = 0

    def recalculate_stats(self):
        if self.points is not None:
            a, s, box = area_from_point(self.points)
            self.area_ = a
            self.size_ = s
            self.bbox = box
            self.is_hole_ = not (a > 0.0)

    def set_stats(self, a, s, box):
        self.bbox = box
        self.area_ = a
        self.size_ = s
        self.is_hole_ = not (a > 0.0)

    def area(self) -> float:
        if math.isnan(self.area_):
            self.recalculate_stats()
        return self.area_

    def is_hole(self) -> bool:
        if math.isnan(self.area_):
            self.recalculate_stats()
        return self.is_hole_

    def size(self) -> int:
        if math.isnan(self.area_):
            self.recalculate_stats()
        return self.size_


def area_from_point(op: PointNode):
    """ring.hpp:33-61 — signed area (doubles), vertex count, bbox."""
    start = op
    size = 0
    a = 0.0
    min_x = max_x = op.x
    min_y = max_y = op.y
    while True:
        size += 1
        if op.x > max_x:
            max_x = op.x
        elif op.x < min_x:
            min_x = op.x
        if op.y > max_y:
            max_y = op.y
        elif op.y < min_y:
            min_y = op.y
        a += float(op.prev.x + op.x) * float(op.prev.y - op.y)
        op = op.next
        if op is start:
            break
    return a * 0.5, size, (min_x, min_y, max_x, max_y)


class RingManager:
    __slots__ = ("children", "all_points", "hot_pixels", "current_hp_idx", "rings", "index")

    def __init__(self):
        self.children = []
        self.all_points = []
        self.hot_pixels = []
        self.current_hp_idx = 0
        self.rings = []
        self.index = 0


def create_new_ring(manager: RingManager) -> Ring:
    r = Ring()
    r.ring_index = manager.index
    manager.index += 1
    manager.rings.append(r)
    return r


def create_new_point(r: Ring, pt, manager: RingManager, before=None) -> PointNode:
    p = PointNode(r, pt[0], pt[1])
    if before is not None:
        # point.hpp:49-54 - link before `before`
        p.next = before
        p.prev = before.prev
        before.prev = p
        p.prev.next = p
    manager.all_points.append(p)
    return p


# ---------------------------------------------------------------------------
# build_edges.hpp
# ---------------------------------------------------------------------------


def _point_2_is_between(pt1, pt2, pt3) -> bool:
    # build_edges.hpp:16-26
    if pt1 == pt3 or pt1 == pt2 or pt3 == pt2:
        return False
    if pt1[0] != pt3[0]:
        return (pt2[0] > pt1[0]) == (pt2[0] < pt3[0])
    return (pt2[1] > pt1[1]) == (pt2[1] < pt3[1])


def build_edge_list(ring_pts) -> list | None:
    """build_edges.hpp:28-133 — drop duplicate + collinear/spike points,
    with wraparound cleanup between the first and last edges."""
    n = len(ring_pts)
    if n < 3:
        return None
    edges: list[Edge] = []

    # walk backwards from the end to find the starting pt1 (skip dups of
    # the first point)
    rev_i = n - 1  # itr_rev
    pt2 = ring_pts[0]
    pt1 = ring_pts[rev_i]
    while pt1 == pt2:
        rev_i -= 1
        if rev_i < 0:
            return None
        pt1 = ring_pts[rev_i]
    itr = 1
    pt3 = ring_pts[itr]
    itr_last = rev_i + 1  # index one-past usable range (itr_rev.base())
    front_pt = None
    back_pt = None
    while True:
        if pt3 == pt2:
            if itr == itr_last:
                break
            itr += 1
            if itr == itr_last:
                if not edges:
                    break
                pt3 = front_pt
            else:
                pt3 = ring_pts[itr]
            continue

        if slopes_equal_points(pt1, pt2, pt3):
            pt2 = pt1
            if edges:
                edges.pop()
            if edges:
                back = edges[-1]
                if back_pt == (back.topx, back.topy):
                    pt1 = (back.botx, back.boty)
                else:
                    pt1 = (back.topx, back.topy)
                back_pt = pt1
            else:
                while ring_pts[rev_i] == pt2:
                    rev_i -= 1
                    if itr + 1 == rev_i + 1:
                        return None
                pt1 = ring_pts[rev_i]
                itr_last = rev_i + 1
            continue

        if not edges:
            front_pt = pt2
        edges.append(Edge(pt2, pt3))
        back_pt = pt2
        if itr == itr_last:
            break
        pt1 = pt2
        pt2 = pt3
        itr += 1
        if itr == itr_last:
            if not edges:
                break
            pt3 = front_pt
        else:
            pt3 = ring_pts[itr]

    # wraparound cleanup (build_edges.hpp:135-183)
    while True:
        if len(edges) < 3:
            return None
        f = edges[0]
        b = edges[-1]
        if not slopes_equal_edges(f, b):
            break
        fbot = (f.botx, f.boty)
        ftop = (f.topx, f.topy)
        bbot = (b.botx, b.boty)
        btop = (b.topx, b.topy)
        if fbot == btop:
            if ftop == bbot:
                edges.pop()
                edges.pop(0)
            else:
                f.botx, f.boty = bbot
                f.recompute_dx()
                edges.pop()
        elif ftop == bbot:
            f.topx, f.topy = btop
            f.recompute_dx()
            edges.pop()
        elif ftop == btop and fbot == bbot:
            edges.pop()
            edges.pop(0)
        elif ftop == btop:
            if _point_2_is_between(ftop, fbot, bbot):
                b.topx, b.topy = fbot
                b.recompute_dx()
                edges.pop(0)
            else:
                f.topx, f.topy = bbot
                f.recompute_dx()
                edges.pop()
        elif fbot == bbot:
            if _point_2_is_between(fbot, ftop, btop):
                b.botx, b.boty = ftop
                b.recompute_dx()
                edges.pop(0)
            else:
                f.botx, f.boty = btop
                f.recompute_dx()
                edges.pop()
        else:
            break
    if len(edges) < 3:
        return None
    return edges


# ---------------------------------------------------------------------------
# local_minimum_util.hpp — bound construction
# ---------------------------------------------------------------------------


def _reverse_horizontal(e: Edge):
    e.topx, e.botx = e.botx, e.topx


def start_list_on_local_maximum(edges: list):
    """local_minimum_util.hpp:28-58 — rotate the edge list so it starts
    on a local maximum (smallest y corner)."""
    if len(edges) <= 2:
        return edges
    prev_edge = edges[-1]
    prev_horz = is_horizontal(prev_edge)
    y_decreasing_before_last_horizontal = False
    idx = 0
    n = len(edges)
    while idx < n:
        edge = edges[idx]
        edge_horz = is_horizontal(edge)
        if (not prev_horz and not edge_horz
                and (edge.topx, edge.topy) == (prev_edge.topx, prev_edge.topy)):
            break
        if not edge_horz and prev_horz:
            if y_decreasing_before_last_horizontal and (
                (edge.topx, edge.topy) == (prev_edge.botx, prev_edge.boty)
                or (edge.topx, edge.topy) == (prev_edge.topx, prev_edge.topy)
            ):
                break
        elif (not y_decreasing_before_last_horizontal and not prev_horz and edge_horz
              and ((prev_edge.topx, prev_edge.topy) == (edge.topx, edge.topy)
                   or (prev_edge.topx, prev_edge.topy) == (edge.botx, edge.boty))):
            y_decreasing_before_last_horizontal = True
        prev_horz = edge_horz
        prev_edge = edge
        idx += 1
    return edges[idx:] + edges[:idx]


def create_bound_towards_minimum(edges: list) -> tuple:
    """local_minimum_util.hpp:61-110. Returns (bound_edges, remaining).
    The consumed run is REVERSED into the bound (descending the ring
    toward the local minimum / larger y)."""
    if len(edges) == 1:
        e = edges[0]
        if is_horizontal(e):
            _reverse_horizontal(e)
        b = Bound()
        b.edges = edges[:]
        return b, []
    next_i = 1
    edge = edges[0]
    edge_horz = is_horizontal(edge)
    if edge_horz:
        _reverse_horizontal(edge)
    y_increasing_before_last_horizontal = False
    n = len(edges)
    while next_i < n:
        nxt = edges[next_i]
        next_horz = is_horizontal(nxt)
        if (not next_horz and not edge_horz
                and (edge.botx, edge.boty) == (nxt.botx, nxt.boty)):
            break
        if not next_horz and edge_horz:
            if y_increasing_before_last_horizontal and (
                (nxt.botx, nxt.boty) == (edge.botx, edge.boty)
                or (nxt.botx, nxt.boty) == (edge.topx, edge.topy)
            ):
                break
        elif (not y_increasing_before_last_horizontal and not edge_horz and next_horz
              and ((edge.botx, edge.boty) == (nxt.topx, nxt.topy)
                   or (edge.botx, edge.boty) == (nxt.botx, nxt.boty))):
            y_increasing_before_last_horizontal = True
        edge_horz = next_horz
        edge = nxt
        if edge_horz:
            _reverse_horizontal(edge)
        next_i += 1
    b = Bound()
    if next_i >= n:
        b.edges = edges[:]
        remaining = []
    else:
        b.edges = edges[:next_i]
        remaining = edges[next_i:]
    b.edges.reverse()
    return b, remaining


def create_bound_towards_maximum(edges: list) -> tuple:
    """local_minimum_util.hpp:112-157."""
    if len(edges) == 1:
        b = Bound()
        b.edges = edges[:]
        return b, []
    next_i = 1
    edge = edges[0]
    edge_horz = is_horizontal(edge)
    y_decreasing_before_last_horizontal = False
    n = len(edges)
    while next_i < n:
        nxt = edges[next_i]
        next_horz = is_horizontal(nxt)
        if (not next_horz and not edge_horz
                and (edge.topx, edge.topy) == (nxt.topx, nxt.topy)):
            break
        if not next_horz and edge_horz:
            if y_decreasing_before_last_horizontal and (
                (nxt.topx, nxt.topy) == (edge.botx, edge.boty)
                or (nxt.topx, nxt.topy) == (edge.topx, edge.topy)
            ):
                break
        elif (not y_decreasing_before_last_horizontal and not edge_horz and next_horz
              and ((edge.topx, edge.topy) == (nxt.topx, nxt.topy)
                   or (edge.topx, edge.topy) == (nxt.botx, nxt.boty))):
            y_decreasing_before_last_horizontal = True
        edge_horz = next_horz
        edge = nxt
        next_i += 1
    b = Bound()
    if next_i >= n:
        b.edges = edges[:]
        remaining = []
    else:
        b.edges = edges[:next_i]
        remaining = edges[next_i:]
    return b, remaining


def fix_horizontals(bnd: Bound):
    """local_minimum_util.hpp:159-177."""
    edges = bnd.edges
    if len(edges) < 2:
        return
    if is_horizontal(edges[0]) and (edges[1].botx, edges[1].boty) != (
        edges[0].topx,
        edges[0].topy,
    ):
        _reverse_horizontal(edges[0])
    for i in range(1, len(edges)):
        if is_horizontal(edges[i]) and (edges[i - 1].topx, edges[i - 1].topy) != (
            edges[i].botx,
            edges[i].boty,
        ):
            _reverse_horizontal(edges[i])


def move_horizontals_on_left_to_right(left_bound: Bound, right_bound: Bound):
    """local_minimum_util.hpp:179-199."""
    k = 0
    while k < len(left_bound.edges) and is_horizontal(left_bound.edges[k]):
        _reverse_horizontal(left_bound.edges[k])
        k += 1
    if k == 0:
        return
    moved = left_bound.edges[:k]
    moved.reverse()
    left_bound.edges = left_bound.edges[k:]
    # append then rotate so the moved run leads (std::rotate with
    # prev(end, dist) puts the appended run at the front)
    right_bound.edges = moved + right_bound.edges


def add_ring_to_local_minima_list(edges: list, minima_list: list, poly_type: int):
    """local_minimum_util.hpp:201-286."""
    if not edges:
        return
    edges = start_list_on_local_maximum(edges)
    first_minimum = None
    last_maximum = None
    while edges:
        lm_minimum_has_horizontal = False
        to_minimum, edges = create_bound_towards_minimum(edges)
        if not edges:
            raise RuntimeError("Edges is empty after only creating a single bound.")
        to_maximum, edges = create_bound_towards_maximum(edges)
        fix_horizontals(to_minimum)
        fix_horizontals(to_maximum)
        max_non_horz = None
        min_non_horz = None
        for e in to_maximum.edges:
            if is_horizontal(e):
                lm_minimum_has_horizontal = True
            else:
                max_non_horz = e
                break
        for e in to_minimum.edges:
            if is_horizontal(e):
                lm_minimum_has_horizontal = True
            else:
                min_non_horz = e
                break
        if max_non_horz is None or min_non_horz is None:
            raise RuntimeError("should not have a horizontal only bound for a ring")
        if lm_minimum_has_horizontal:
            if max_non_horz.botx > min_non_horz.botx:
                minimum_is_left = True
                move_horizontals_on_left_to_right(to_minimum, to_maximum)
            else:
                minimum_is_left = False
                move_horizontals_on_left_to_right(to_maximum, to_minimum)
        else:
            minimum_is_left = not (max_non_horz.dx > min_non_horz.dx)
        min_front = to_minimum.edges[0]
        if last_maximum is not None:
            to_minimum.maximum_bound = last_maximum
        to_minimum.poly_type = poly_type
        to_maximum.poly_type = poly_type
        to_minimum.winding_delta = -1
        to_maximum.winding_delta = 1
        if not minimum_is_left:
            to_minimum.side = SIDE_RIGHT
            to_maximum.side = SIDE_LEFT
            lm = LocalMinimum(to_maximum, to_minimum, min_front.boty,
                              lm_minimum_has_horizontal)
            minima_list.append(lm)
            if last_maximum is None:
                first_minimum = lm.right_bound
            else:
                last_maximum.maximum_bound = lm.right_bound
            last_maximum = lm.left_bound
        else:
            to_minimum.side = SIDE_LEFT
            to_maximum.side = SIDE_RIGHT
            lm = LocalMinimum(to_minimum, to_maximum, min_front.boty,
                              lm_minimum_has_horizontal)
            minima_list.append(lm)
            if last_maximum is None:
                first_minimum = lm.left_bound
            else:
                last_maximum.maximum_bound = lm.left_bound
            last_maximum = lm.right_bound
    last_maximum.maximum_bound = first_minimum
    first_minimum.maximum_bound = last_maximum


def add_linear_ring(ring_pts, minima_list: list, poly_type: int) -> bool:
    """build_local_minima_list.hpp:13-24."""
    edges = build_edge_list(ring_pts)
    if not edges:
        return False
    add_ring_to_local_minima_list(edges, minima_list, poly_type)
    return True


def initialize_lm(lm: LocalMinimum):
    """local_minimum_util.hpp:288-314."""
    for bnd, side in ((lm.left_bound, SIDE_LEFT), (lm.right_bound, SIDE_RIGHT)):
        if bnd.edges:
            bnd.current_edge = 0
            bnd.next_edge = 1
            bnd.current_x = float(bnd.edges[0].botx)
            bnd.winding_count = 0
            bnd.winding_count2 = 0
            bnd.side = side
            bnd.ring = None


# ---------------------------------------------------------------------------
# scanbeam (scanbeam.hpp) — ascending sorted unique vector, popped from back
# ---------------------------------------------------------------------------

import bisect


def insert_sorted_scanbeam(scanbeam: list, y: int):
    i = bisect.bisect_left(scanbeam, y)
    if i == len(scanbeam) or y < scanbeam[i]:
        scanbeam.insert(i, y)


def pop_from_scanbeam(scanbeam: list):
    if not scanbeam:
        return None
    return scanbeam.pop()


def setup_scanbeam(minima_list: list, scanbeam: list):
    for lm in minima_list:
        scanbeam.append(lm.y)
    scanbeam.sort()


def sort_minima(minima_list: list) -> list:
    # local_minimum.hpp:46-55: descending y; ties put has-horizontal first
    out = list(minima_list)

    import functools

    def cmp(a, b):
        # sorter(lm1, lm2) returns lm1-before-lm2
        if a.y != b.y:
            return -1 if b.y < a.y else 1
        if a.minimum_has_horizontal != b.minimum_has_horizontal:
            return -1 if a.minimum_has_horizontal else 1
        return 0

    out.sort(key=functools.cmp_to_key(cmp))
    return out


# ---------------------------------------------------------------------------
# active bound list helpers (active_bound_list.hpp)
# ---------------------------------------------------------------------------


def _bound_insert_location(b2: Bound, b1: Bound) -> bool:
    # active_bound_list.hpp:82-105: True when the new bound b2 goes
    # before b1
    if values_are_equal(b2.current_x, b1.current_x):
        if b2.cur.topy > b1.cur.topy:
            return less_than(float(b2.cur.topx), get_current_x(b1.cur, b2.cur.topy))
        return greater_than(float(b1.cur.topx), get_current_x(b2.cur, b1.cur.topy))
    return b2.current_x < b1.current_x


def insert_bound_into_ABL(left: Bound, right: Bound, active_bounds: list) -> int:
    idx = len(active_bounds)
    for i, b in enumerate(active_bounds):
        if b is not None and _bound_insert_location(left, b):
            idx = i
            break
        # NOTE: nullptr entries never match find_if's predicate in C++
        # (bound_insert_location dereferences; nullptrs are only present
        # transiently inside horizontal processing, never during inserts)
    active_bounds[idx:idx] = [left, right]
    return idx


def is_maxima_b(bnd: Bound, y: int) -> bool:
    return bnd.next_at_end() and bnd.cur.topy == y


def is_intermediate_b(bnd: Bound, y: int) -> bool:
    return (not bnd.next_at_end()) and bnd.cur.topy == y


def next_edge_in_bound(bnd: Bound, scanbeam: list):
    # active_bound_list.hpp:152-163
    bnd.current_edge += 1
    if bnd.current_edge < len(bnd.edges):
        bnd.next_edge += 1
        bnd.current_x = float(bnd.cur.botx)
        if not is_horizontal(bnd.cur):
            insert_sorted_scanbeam(scanbeam, bnd.cur.topy)


def get_maxima_pair(bnd: Bound, active_bounds: list):
    m = bnd.maximum_bound
    for i, b in enumerate(active_bounds):
        if b is m:
            return i
    return None


def set_winding_count(bnd_idx: int, active_bounds: list, subject_fill: int, clip_fill: int):
    """active_bound_list.hpp:168-238 (nonzero/positive path; even-odd
    included for completeness)."""
    bnd = active_bounds[bnd_idx]
    rev = bnd_idx - 1
    if rev < 0:
        bnd.winding_count = bnd.winding_delta
        bnd.winding_count2 = 0
        return
    while rev >= 0 and active_bounds[rev].poly_type != bnd.poly_type:
        rev -= 1
    if rev < 0:
        bnd.winding_count = bnd.winding_delta
        bnd.winding_count2 = 0
    else:
        prev = active_bounds[rev]
        fill = subject_fill if bnd.poly_type == PTYPE_SUBJECT else clip_fill
        if fill == FILL_EVEN_ODD:
            bnd.winding_count = bnd.winding_delta
            bnd.winding_count2 = prev.winding_count2
        else:
            if prev.winding_count * prev.winding_delta < 0:
                if abs(prev.winding_count) > 1:
                    if prev.winding_delta * bnd.winding_delta < 0:
                        bnd.winding_count = prev.winding_count
                    else:
                        bnd.winding_count = prev.winding_count + bnd.winding_delta
                else:
                    bnd.winding_count = bnd.winding_delta
            else:
                if prev.winding_delta * bnd.winding_delta < 0:
                    bnd.winding_count = prev.winding_count
                else:
                    bnd.winding_count = prev.winding_count + bnd.winding_delta
            bnd.winding_count2 = prev.winding_count2
    # update winding_count2 from bounds between rev+1 .. bnd_idx-1
    alt_fill = clip_fill if bnd.poly_type == PTYPE_SUBJECT else subject_fill
    start = rev + 1 if rev >= 0 else 0
    if alt_fill == FILL_EVEN_ODD:
        for i in range(start, bnd_idx):
            bnd.winding_count2 = 1 if bnd.winding_count2 == 0 else 0
    else:
        for i in range(start, bnd_idx):
            bnd.winding_count2 += active_bounds[i].winding_delta


def is_contributing(bnd: Bound, cliptype: int, subject_fill: int, clip_fill: int) -> bool:
    """active_bound_list.hpp:241-320."""
    if bnd.poly_type == PTYPE_SUBJECT:
        pft, pft2 = subject_fill, clip_fill
    else:
        pft, pft2 = clip_fill, subject_fill
    if pft == FILL_NON_ZERO:
        if abs(bnd.winding_count) != 1:
            return False
    elif pft == FILL_POSITIVE:
        if bnd.winding_count != 1:
            return False
    elif pft == FILL_NEGATIVE:
        if bnd.winding_count != -1:
            return False
    if cliptype == CLIP_INTERSECTION:
        if pft2 in (FILL_EVEN_ODD, FILL_NON_ZERO):
            return bnd.winding_count2 != 0
        if pft2 == FILL_POSITIVE:
            return bnd.winding_count2 > 0
        return bnd.winding_count2 < 0
    if cliptype == CLIP_UNION:
        if pft2 in (FILL_EVEN_ODD, FILL_NON_ZERO):
            return bnd.winding_count2 == 0
        if pft2 == FILL_POSITIVE:
            return bnd.winding_count2 <= 0
        return bnd.winding_count2 >= 0
    if cliptype == CLIP_DIFFERENCE:
        if bnd.poly_type == PTYPE_SUBJECT:
            if pft2 in (FILL_EVEN_ODD, FILL_NON_ZERO):
                return bnd.winding_count2 == 0
            if pft2 == FILL_POSITIVE:
                return bnd.winding_count2 <= 0
            return bnd.winding_count2 >= 0
        else:
            if pft2 in (FILL_EVEN_ODD, FILL_NON_ZERO):
                return bnd.winding_count2 != 0
            if pft2 == FILL_POSITIVE:
                return bnd.winding_count2 > 0
            return bnd.winding_count2 < 0
    return True


# ---------------------------------------------------------------------------
# ring/point output machinery (ring_util.hpp)
# ---------------------------------------------------------------------------


def set_hole_state(bnd: Bound, active_bounds: list, manager: RingManager):
    """ring_util.hpp:30-57 — pair off bounds to the left sharing a ring;
    first unpaired ringed bound is the parent."""
    # find bnd from the back
    pos = None
    for i in range(len(active_bounds) - 1, -1, -1):
        if active_bounds[i] is bnd:
            pos = i
            break
    bnd_tmp = None
    for i in range(pos - 1, -1, -1):
        b = active_bounds[i]
        if b is None:
            continue
        if b.ring is not None:
            if bnd_tmp is None:
                bnd_tmp = b
            elif bnd_tmp.ring is b.ring:
                bnd_tmp = None
    if bnd_tmp is None:
        bnd.ring.parent = None
        manager.children.append(bnd.ring)
    else:
        bnd.ring.parent = bnd_tmp.ring
        bnd_tmp.ring.children.append(bnd.ring)


def update_current_hp_itr(scanline_y: int, manager: RingManager):
    while manager.hot_pixels[manager.current_hp_idx][1] > scanline_y:
        manager.current_hp_idx += 1


def sort_hot_pixels(manager: RingManager):
    # ring_util.hpp:68-76 + 232-237: y desc, x asc; unique
    manager.hot_pixels.sort(key=lambda p: (-p[1], p[0]))
    out = []
    prev = None
    for p in manager.hot_pixels:
        if p != prev:
            out.append(p)
        prev = p
    manager.hot_pixels = out


def get_edge_min_x(e: Edge, current_y: int) -> int:
    # ring_util.hpp:107-133
    if is_horizontal(e):
        return e.botx if e.botx < e.topx else e.topx
    if e.dx > 0.0:
        if current_y == e.topy:
            return e.topx
        lower = float(current_y - e.boty) - 0.5
        return round_towards_min(float(e.botx) + e.dx * lower)
    else:
        if current_y == e.boty:
            return e.botx
        return round_towards_min(float(e.botx) + e.dx * (float(current_y - e.boty) + 0.5))


def get_edge_max_x(e: Edge, current_y: int) -> int:
    # ring_util.hpp:136-162
    if is_horizontal(e):
        return e.botx if e.botx > e.topx else e.topx
    if e.dx < 0.0:
        if current_y == e.topy:
            return e.topx
        lower = float(current_y - e.boty) - 0.5
        return round_towards_max(float(e.botx) + e.dx * lower)
    else:
        if current_y == e.boty:
            return e.botx
        return round_towards_max(float(e.botx) + e.dx * (float(current_y - e.boty) + 0.5))


def _hp_set_left_to_right(y, start_x, end_x, bnd, manager, i, band_end, add_end_point):
    # ring_util.hpp:165-199; iterate band ascending x
    hp = manager.hot_pixels
    x_min = max(get_edge_min_x(bnd.cur, y), start_x)
    x_max = min(get_edge_max_x(bnd.cur, y), end_x)
    to_front = bnd.side == SIDE_LEFT
    while i < band_end:
        px, py = hp[i]
        if px < x_min:
            i += 1
            continue
        if px > x_max:
            break
        if not add_end_point and px == end_x:
            i += 1
            continue
        op = bnd.ring.points
        if to_front and px == op.x and py == op.y:
            i += 1
            continue
        if (not to_front) and px == op.prev.x and py == op.prev.y:
            i += 1
            continue
        new_point = create_new_point(bnd.ring, (px, py), manager, before=op)
        if to_front:
            bnd.ring.points = new_point
        i += 1


def _hp_set_right_to_left(y, start_x, end_x, bnd, manager, band_start, i, add_end_point):
    # ring_util.hpp:202-229; iterate band descending x (i is the last
    # index of the band; stop before band_start-1)
    hp = manager.hot_pixels
    x_min = max(get_edge_min_x(bnd.cur, y), end_x)
    x_max = min(get_edge_max_x(bnd.cur, y), start_x)
    to_front = bnd.side == SIDE_LEFT
    while i >= band_start:
        px, py = hp[i]
        if px > x_max:
            i -= 1
            continue
        if px < x_min:
            break
        if not add_end_point and px == end_x:
            i -= 1
            continue
        op = bnd.ring.points
        if to_front and px == op.x and py == op.y:
            i -= 1
            continue
        if (not to_front) and px == op.prev.x and py == op.prev.y:
            i -= 1
            continue
        new_point = create_new_point(bnd.ring, (px, py), manager, before=op)
        if to_front:
            bnd.ring.points = new_point
        i -= 1


def insert_hot_pixels_in_path(bnd: Bound, end_pt, manager: RingManager, add_end_point: bool):
    """ring_util.hpp:240-296."""
    if end_pt == bnd.last_point:
        return
    start_x, start_y = bnd.last_point
    end_x, end_y = end_pt
    hp = manager.hot_pixels
    itr = manager.current_hp_idx
    while itr > 0 and hp[itr][1] <= start_y:
        itr -= 1
    if start_x > end_x:
        while itr < len(hp):
            if hp[itr][1] > start_y:
                itr += 1
                continue
            if hp[itr][1] < end_y:
                break
            y = hp[itr][1]
            band_start = itr
            while itr < len(hp) and hp[itr][1] == y:
                itr += 1
            add_end = y != end_pt[1] or add_end_point
            _hp_set_right_to_left(y, start_x, end_x, bnd, manager, band_start, itr - 1, add_end)
    else:
        while itr < len(hp):
            if hp[itr][1] > start_y:
                itr += 1
                continue
            if hp[itr][1] < end_y:
                break
            y = hp[itr][1]
            band_start = itr
            while itr < len(hp) and hp[itr][1] == y:
                itr += 1
            add_end = y != end_pt[1] or add_end_point
            _hp_set_left_to_right(y, start_x, end_x, bnd, manager, band_start, itr, add_end)
    bnd.last_point = end_pt


def add_first_point(bnd: Bound, active_bounds: list, pt, manager: RingManager):
    r = create_new_ring(manager)
    bnd.ring = r
    r.points = create_new_point(r, pt, manager)
    set_hole_state(bnd, active_bounds, manager)
    bnd.last_point = pt


def add_point_to_ring(bnd: Bound, pt, manager: RingManager):
    insert_hot_pixels_in_path(bnd, pt, manager, False)
    op = bnd.ring.points
    to_front = bnd.side == SIDE_LEFT
    if to_front and pt[0] == op.x and pt[1] == op.y:
        return
    if (not to_front) and pt[0] == op.prev.x and pt[1] == op.prev.y:
        return
    new_point = create_new_point(bnd.ring, pt, manager, before=op)
    if to_front:
        bnd.ring.points = new_point


def add_point(bnd: Bound, active_bounds: list, pt, manager: RingManager):
    if bnd.ring is None:
        add_first_point(bnd, active_bounds, pt, manager)
    else:
        add_point_to_ring(bnd, pt, manager)


def add_local_minimum_point(b1: Bound, b2: Bound, active_bounds: list, pt, manager: RingManager):
    # ring_util.hpp:358-377
    if is_horizontal(b2.cur) or (b1.cur.dx > b2.cur.dx):
        add_point(b1, active_bounds, pt, manager)
        b2.last_point = pt
        b2.ring = b1.ring
        b1.side = SIDE_LEFT
        b2.side = SIDE_RIGHT
    else:
        add_point(b2, active_bounds, pt, manager)
        b1.last_point = pt
        b1.ring = b2.ring
        b1.side = SIDE_RIGHT
        b2.side = SIDE_LEFT


# ---------------------------------------------------------------------------
# ring tree maintenance (ring.hpp:220-330)
# ---------------------------------------------------------------------------


def set_to_children(r: Ring, children: list):
    for i, c in enumerate(children):
        if c is None:
            children[i] = r
            return
    children.append(r)


def remove_from_children(r: Ring, children: list):
    for i, c in enumerate(children):
        if c is r:
            children[i] = None
            return


def assign_as_child(new_ring: Ring, parent, manager: RingManager):
    if (parent is None and new_ring.is_hole()) or (
        parent is not None and new_ring.is_hole() == parent.is_hole()
    ):
        raise RuntimeError("Trying to assign a child that is the same orientation as the parent")
    children = manager.children if parent is None else parent.children
    set_to_children(new_ring, children)
    new_ring.parent = parent


def reassign_as_child(ring: Ring, parent, manager: RingManager):
    if (parent is None and ring.is_hole()) or (
        parent is not None and ring.is_hole() == parent.is_hole()
    ):
        raise RuntimeError("Trying to re-assign a child that is the same orientation as the parent")
    old_children = manager.children if ring.parent is None else ring.parent.children
    remove_from_children(ring, old_children)
    children = manager.children if parent is None else parent.children
    set_to_children(ring, children)
    ring.parent = parent


def assign_as_sibling(new_ring: Ring, sibling: Ring, manager: RingManager):
    if new_ring.is_hole() != sibling.is_hole():
        raise RuntimeError("Trying to assign to be a sibling that is not the same orientation as the sibling")
    children = manager.children if sibling.parent is None else sibling.parent.children
    set_to_children(new_ring, children)
    new_ring.parent = sibling.parent


def reassign_as_sibling(ring: Ring, sibling: Ring, manager: RingManager):
    if ring.parent is sibling.parent:
        return
    if ring.is_hole() != sibling.is_hole():
        raise RuntimeError("Trying to assign to be a sibling that is not the same orientation as the sibling")
    old_children = manager.children if ring.parent is None else ring.parent.children
    remove_from_children(ring, old_children)
    children = manager.children if sibling.parent is None else sibling.parent.children
    set_to_children(ring, children)
    ring.parent = sibling.parent


def ring1_replaces_ring2(ring1, ring2: Ring, manager: RingManager):
    # ring.hpp:310-330
    ring1_children = manager.children if ring1 is None else ring1.children
    for i, c in enumerate(ring2.children):
        if c is None:
            continue
        c.parent = ring1
        set_to_children(c, ring1_children)
        ring2.children[i] = None
    old_children = manager.children if ring2.parent is None else ring2.parent.children
    remove_from_children(ring2, old_children)
    ring2.points = None
    ring2.reset_stats()


def remove_ring_and_points(r: Ring, manager: RingManager, remove_children=True, remove_from_parent=True):
    for i, c in enumerate(r.children):
        if c is None:
            continue
        if remove_children:
            remove_ring_and_points(c, manager, True, False)
        r.children[i] = None
    if remove_from_parent:
        old_children = manager.children if r.parent is None else r.parent.children
        remove_from_children(r, old_children)
    pt = r.points
    if pt is not None:
        pt.prev.next = None
        while pt is not None:
            tmp = pt
            pt = pt.next
            tmp.next = None
            tmp.prev = None
            tmp.ring = None
    r.points = None
    r.reset_stats()


def remove_ring(r: Ring, manager: RingManager, remove_children=True, remove_from_parent=True):
    for i, c in enumerate(r.children):
        if c is None:
            continue
        if remove_children:
            remove_ring(c, manager, True, False)
        r.children[i] = None
    if remove_from_parent:
        old_children = manager.children if r.parent is None else r.parent.children
        remove_from_children(r, old_children)
    r.points = None
    r.reset_stats()


def ring_depth(r) -> int:
    depth = 0
    if r is None:
        return depth
    while r.parent is not None:
        depth += 1
        r = r.parent
    return depth


def ring_is_hole(r: Ring) -> bool:
    return bool(ring_depth(r) & 1)


def reverse_ring(pp: PointNode):
    if pp is None:
        return
    pp1 = pp
    while True:
        pp2 = pp1.next
        pp1.next = pp1.prev
        pp1.prev = pp2
        pp1 = pp2
        if pp1 is pp:
            break


def update_points_ring(ring: Ring):
    op = ring.points
    while True:
        op.ring = ring
        op = op.prev
        if op is ring.points:
            break


# ---------------------------------------------------------------------------
# bottom point / lowermost ring (ring_util.hpp:380-470)
# ---------------------------------------------------------------------------


def _get_dx(pt1, pt2) -> float:
    if pt1.y == pt2.y:
        return INF
    return float(pt2.x - pt1.x) / float(pt2.y - pt1.y)


def first_is_bottom_point(btmPt1: PointNode, btmPt2: PointNode) -> bool:
    p = btmPt1.prev
    while p.same_xy(btmPt1) and p is not btmPt1:
        p = p.prev
    dx1p = abs(_get_dx(btmPt1, p))
    p = btmPt1.next
    while p.same_xy(btmPt1) and p is not btmPt1:
        p = p.next
    dx1n = abs(_get_dx(btmPt1, p))
    p = btmPt2.prev
    while p.same_xy(btmPt2) and p is not btmPt2:
        p = p.prev
    dx2p = abs(_get_dx(btmPt2, p))
    p = btmPt2.next
    while p.same_xy(btmPt2) and p is not btmPt2:
        p = p.next
    dx2n = abs(_get_dx(btmPt2, p))

    if values_are_equal(max(dx1p, dx1n), max(dx2p, dx2n)) and values_are_equal(
        min(dx1p, dx1n), min(dx2p, dx2n)
    ):
        a, _, _ = area_from_point(btmPt1)
        return a > 0.0
    ge = lambda x, y: x > y or values_are_equal(x, y)
    return (ge(dx1p, dx2p) and ge(dx1p, dx2n)) or (ge(dx1n, dx2p) and ge(dx1n, dx2n))


def get_bottom_point(pp: PointNode) -> PointNode:
    dups = None
    p = pp.next
    while p is not pp:
        if p.y > pp.y:
            pp = p
            dups = None
        elif p.y == pp.y and p.x <= pp.x:
            if p.x < pp.x:
                dups = None
                pp = p
            else:
                if p.next is not pp and p.prev is not pp:
                    dups = p
        p = p.next
    if dups is not None:
        while dups is not p:
            if not first_is_bottom_point(p, dups):
                pp = dups
            dups = dups.next
            while not dups.same_xy(pp):
                dups = dups.next
    return pp


def get_lower_most_ring(ring1: Ring, ring2: Ring) -> Ring:
    if ring1.bottom_point is None:
        ring1.bottom_point = get_bottom_point(ring1.points)
    if ring2.bottom_point is None:
        ring2.bottom_point = get_bottom_point(ring2.points)
    pt1 = ring1.bottom_point
    pt2 = ring2.bottom_point
    if pt1.y > pt2.y:
        return ring1
    if pt1.y < pt2.y:
        return ring2
    if pt1.x < pt2.x:
        return ring1
    if pt1.x > pt2.x:
        return ring2
    if pt1.next is pt1:
        return ring2
    if pt2.next is pt2:
        return ring1
    if first_is_bottom_point(pt1, pt2):
        return ring1
    return ring2


def ring1_child_below_ring2(ring1: Ring, ring2: Ring) -> bool:
    while True:
        ring1 = ring1.parent
        if ring1 is ring2:
            return True
        if ring1 is None:
            return False


def append_ring(b1: Bound, b2: Bound, active_bounds: list, manager: RingManager):
    """ring_util.hpp:474-580 — join two output rings at a local maximum."""
    outRec1 = b1.ring
    outRec2 = b2.ring
    if ring1_child_below_ring2(outRec1, outRec2):
        keep_ring, keep_bound = outRec2, b2
        remove_ring_, remove_bound = outRec1, b1
    elif ring1_child_below_ring2(outRec2, outRec1):
        keep_ring, keep_bound = outRec1, b1
        remove_ring_, remove_bound = outRec2, b2
    elif outRec1 is get_lower_most_ring(outRec1, outRec2):
        keep_ring, keep_bound = outRec1, b1
        remove_ring_, remove_bound = outRec2, b2
    else:
        keep_ring, keep_bound = outRec2, b2
        remove_ring_, remove_bound = outRec1, b1

    p1_lft = keep_ring.points
    p1_rt = p1_lft.prev
    p2_lft = remove_ring_.points
    p2_rt = p2_lft.prev

    if keep_bound.side == SIDE_LEFT:
        if remove_bound.side == SIDE_LEFT:
            reverse_ring(p2_lft)
            p2_lft.next = p1_lft
            p1_lft.prev = p2_lft
            p1_rt.next = p2_rt
            p2_rt.prev = p1_rt
            keep_ring.points = p2_rt
        else:
            p2_rt.next = p1_lft
            p1_lft.prev = p2_rt
            p2_lft.prev = p1_rt
            p1_rt.next = p2_lft
            keep_ring.points = p2_lft
    else:
        if remove_bound.side == SIDE_RIGHT:
            reverse_ring(p2_lft)
            p1_rt.next = p2_rt
            p2_rt.prev = p1_rt
            p2_lft.next = p1_lft
            p1_lft.prev = p2_lft
        else:
            p1_rt.next = p2_lft
            p2_lft.prev = p1_rt
            p1_lft.prev = p2_rt
            p2_rt.next = p1_lft

    keep_ring.bottom_point = None
    keep_is_hole = ring_is_hole(keep_ring)
    remove_is_hole = ring_is_hole(remove_ring_)

    remove_ring_.points = None
    remove_ring_.bottom_point = None
    if keep_is_hole != remove_is_hole:
        ring1_replaces_ring2(keep_ring.parent, remove_ring_, manager)
    else:
        ring1_replaces_ring2(keep_ring, remove_ring_, manager)

    update_points_ring(keep_ring)
    keep_bound.ring = None
    remove_bound.ring = None

    for b in active_bounds:
        if b is None:
            continue
        if b.ring is remove_ring_:
            b.ring = keep_ring
            b.side = keep_bound.side
            break


def add_local_maximum_point(b1: Bound, b2: Bound, pt, manager: RingManager, active_bounds: list):
    # ring_util.hpp:583-598
    insert_hot_pixels_in_path(b2, pt, manager, False)
    add_point(b1, active_bounds, pt, manager)
    if b1.ring is b2.ring:
        b1.ring = None
        b2.ring = None
    elif b1.ring.ring_index < b2.ring.ring_index:
        append_ring(b1, b2, active_bounds, manager)
    else:
        append_ring(b2, b1, active_bounds, manager)


# ---------------------------------------------------------------------------
# point in polygon (ring_util.hpp:600-760)
# ---------------------------------------------------------------------------

PT_ON = -1
PT_INSIDE = 0
PT_OUTSIDE = 1


def point_in_polygon(ptx, pty, op: PointNode) -> int:
    result = PT_OUTSIDE
    start = op
    while True:
        if op.next.y == pty:
            if op.next.x == ptx or (op.y == pty and ((op.next.x > ptx) == (op.x < ptx))):
                return PT_ON
        if (op.y < pty) != (op.next.y < pty):
            if op.x >= ptx:
                if op.next.x > ptx:
                    result = PT_INSIDE if result == PT_OUTSIDE else PT_OUTSIDE
                else:
                    d = float(op.x - ptx) * float(op.next.y - pty) - float(
                        op.next.x - ptx
                    ) * float(op.y - pty)
                    if value_is_zero(d):
                        return PT_ON
                    if (d > 0) == (op.next.y > op.y):
                        result = PT_INSIDE if result == PT_OUTSIDE else PT_OUTSIDE
            else:
                if op.next.x > ptx:
                    d = float(op.x - ptx) * float(op.next.y - pty) - float(
                        op.next.x - ptx
                    ) * float(op.y - pty)
                    if value_is_zero(d):
                        return PT_ON
                    if (d > 0) == (op.next.y > op.y):
                        result = PT_INSIDE if result == PT_OUTSIDE else PT_OUTSIDE
        op = op.next
        if op is start:
            break
    return result


def point_in_polygon_d(ptx: float, pty: float, op: PointNode) -> int:
    result = PT_OUTSIDE
    start = op
    while True:
        op_x = float(op.x)
        op_y = float(op.y)
        op_next_x = float(op.next.x)
        op_next_y = float(op.next.y)
        if values_are_equal(op_next_y, pty):
            if values_are_equal(op_next_x, ptx) or (
                values_are_equal(op_y, pty) and ((op_next_x > ptx) == (op_x < ptx))
            ):
                return PT_ON
        if (op_y < pty) != (op_next_y < pty):
            if op_x > ptx or values_are_equal(op_x, ptx):
                if op_next_x > ptx:
                    result = PT_INSIDE if result == PT_OUTSIDE else PT_OUTSIDE
                else:
                    d = (op_x - ptx) * (op_next_y - pty) - (op_next_x - ptx) * (op_y - pty)
                    if value_is_zero(d):
                        return PT_ON
                    if (d > 0.0) == (op_next_y > op_y):
                        result = PT_INSIDE if result == PT_OUTSIDE else PT_OUTSIDE
            else:
                if op_next_x > ptx:
                    d = (op_x - ptx) * (op_next_y - pty) - (op_next_x - ptx) * (op_y - pty)
                    if value_is_zero(d):
                        return PT_ON
                    if (d > 0.0) == (op_next_y > op_y):
                        result = PT_INSIDE if result == PT_OUTSIDE else PT_OUTSIDE
        op = op.next
        if op is start:
            break
    return result


def _is_convex(edge: PointNode) -> bool:
    prev = edge.prev
    nxt = edge.next
    v1x = edge.x - prev.x
    v1y = edge.y - prev.y
    v2x = nxt.x - edge.x
    v2y = nxt.y - edge.y
    cross = v1x * v2y - v2x * v1y
    if cross < 0 and edge.ring.area() > 0:
        return True
    if cross > 0 and edge.ring.area() < 0:
        return True
    return False


def inside_or_outside_special(first_pt: PointNode, other_poly: PointNode) -> int:
    itr = first_pt
    while True:
        if _is_convex(itr):
            cx = float(itr.prev.x + itr.x + itr.next.x) / 3.0
            cy = float(itr.prev.y + itr.y + itr.next.y) / 3.0
            if point_in_polygon_d(cx, cy, first_pt) == PT_INSIDE:
                return point_in_polygon_d(cx, cy, other_poly)
        itr = itr.next
        if itr is first_pt:
            break
    raise RuntimeError("Could not find a point within the polygon to test")


def poly2_contains_poly1(ring1: Ring, ring2: Ring) -> bool:
    b1 = ring1.bbox
    b2 = ring2.bbox
    # box2_contains_box1
    if not (b2[2] >= b1[2] and b2[3] >= b1[3] and b2[0] <= b1[0] and b2[1] <= b1[1]):
        return False
    if abs(ring2.area()) < abs(ring1.area()):
        return False
    outpt1 = ring1.points.next
    outpt2 = ring2.points.next
    op = outpt1
    while True:
        res = point_in_polygon(op.x, op.y, outpt2)
        if res != PT_ON:
            return res == PT_INSIDE
        op = op.next
        if op is outpt1:
            break
    return inside_or_outside_special(outpt1, outpt2) == PT_INSIDE


# ---------------------------------------------------------------------------
# intersections (intersect_util.hpp)
# ---------------------------------------------------------------------------


def get_edge_intersection(e1: Edge, e2: Edge):
    # intersect_util.hpp:47-74 (double arithmetic)
    p0_x, p0_y = float(e1.botx), float(e1.boty)
    p1_x, p1_y = float(e1.topx), float(e1.topy)
    p2_x, p2_y = float(e2.botx), float(e2.boty)
    p3_x, p3_y = float(e2.topx), float(e2.topy)
    s1_x = p1_x - p0_x
    s1_y = p1_y - p0_y
    s2_x = p3_x - p2_x
    s2_y = p3_y - p2_y
    denom = -s2_x * s1_y + s1_x * s2_y
    s = (-s1_y * (p0_x - p2_x) + s1_x * (p0_y - p2_y)) / denom
    t = (s2_x * (p0_y - p2_y) - s2_y * (p0_x - p2_x)) / denom
    if 0.0 <= s <= 1.0 and 0.0 <= t <= 1.0:
        return (p0_x + t * s1_x, p0_y + t * s1_y)
    return None


def round_point(pt):
    return (round_towards_max(pt[0]), round_towards_max(pt[1]))


def _intersection_compare(b1: Bound, b2: Bound) -> bool:
    # intersect_util.hpp:77-81
    return not (b1.current_x > b2.current_x and not slopes_equal_edges(b1.cur, b2.cur))


def bubble_sort_bounds(active_bounds: list, on_swap):
    # bubble_sort.hpp — adjacent swaps; on_swap(b1, b2) fires per swap
    n = len(active_bounds)
    if n == 0:
        return
    while True:
        modified = False
        for i in range(n - 1):
            b1 = active_bounds[i]
            b2 = active_bounds[i + 1]
            if not _intersection_compare(b1, b2):
                on_swap(b1, b2)
                active_bounds[i], active_bounds[i + 1] = b2, b1
                modified = True
        if not modified:
            break


def update_current_x(active_bounds: list, top_y: int):
    for pos, bnd in enumerate(active_bounds):
        bnd.pos = pos
        bnd.current_x = get_current_x(bnd.cur, top_y)


def swap_rings(b1: Bound, b2: Bound):
    b1.ring, b2.ring = b2.ring, b1.ring


def swap_sides(b1: Bound, b2: Bound):
    b1.side, b2.side = b2.side, b1.side


def intersect_bounds(b1: Bound, b2: Bound, pt, cliptype, subject_fill, clip_fill,
                     manager: RingManager, active_bounds: list):
    """intersect_util.hpp:108-262."""
    b1_contributing = b1.ring is not None
    b2_contributing = b2.ring is not None

    if b1.poly_type == b2.poly_type:
        fill1 = subject_fill if b1.poly_type == PTYPE_SUBJECT else clip_fill
        if fill1 == FILL_EVEN_ODD:
            b1.winding_count, b2.winding_count = b2.winding_count, b1.winding_count
        else:
            if b1.winding_count + b2.winding_delta == 0:
                b1.winding_count = -b1.winding_count
            else:
                b1.winding_count += b2.winding_delta
            if b2.winding_count - b1.winding_delta == 0:
                b2.winding_count = -b2.winding_count
            else:
                b2.winding_count -= b1.winding_delta
    else:
        fill2 = subject_fill if b2.poly_type == PTYPE_SUBJECT else clip_fill
        fill1 = subject_fill if b1.poly_type == PTYPE_SUBJECT else clip_fill
        if fill2 != FILL_EVEN_ODD:
            b1.winding_count2 += b2.winding_delta
        else:
            b1.winding_count2 = 1 if b1.winding_count2 == 0 else 0
        if fill1 != FILL_EVEN_ODD:
            b2.winding_count2 -= b1.winding_delta
        else:
            b2.winding_count2 = 1 if b2.winding_count2 == 0 else 0

    if b1.poly_type == PTYPE_SUBJECT:
        b1_ft, b1_ft2 = subject_fill, clip_fill
    else:
        b1_ft, b1_ft2 = clip_fill, subject_fill
    if b2.poly_type == PTYPE_SUBJECT:
        b2_ft, b2_ft2 = subject_fill, clip_fill
    else:
        b2_ft, b2_ft2 = clip_fill, subject_fill

    if b1_ft == FILL_POSITIVE:
        b1_wc = b1.winding_count
    elif b1_ft == FILL_NEGATIVE:
        b1_wc = -b1.winding_count
    else:
        b1_wc = abs(b1.winding_count)
    if b2_ft == FILL_POSITIVE:
        b2_wc = b2.winding_count
    elif b2_ft == FILL_NEGATIVE:
        b2_wc = -b2.winding_count
    else:
        b2_wc = abs(b2.winding_count)

    if b1_contributing and b2_contributing:
        if ((b1_wc != 0 and b1_wc != 1) or (b2_wc != 0 and b2_wc != 1)
                or (b1.poly_type != b2.poly_type and cliptype != CLIP_XOR)):
            add_local_maximum_point(b1, b2, pt, manager, active_bounds)
        else:
            add_point(b1, active_bounds, pt, manager)
            add_point(b2, active_bounds, pt, manager)
            swap_sides(b1, b2)
            swap_rings(b1, b2)
    elif b1_contributing:
        if b2_wc == 0 or b2_wc == 1:
            add_point(b1, active_bounds, pt, manager)
            b2.last_point = pt
            swap_sides(b1, b2)
            swap_rings(b1, b2)
    elif b2_contributing:
        if b1_wc == 0 or b1_wc == 1:
            b1.last_point = pt
            add_point(b2, active_bounds, pt, manager)
            swap_sides(b1, b2)
            swap_rings(b1, b2)
    elif (b1_wc == 0 or b1_wc == 1) and (b2_wc == 0 or b2_wc == 1):
        if b1_ft2 == FILL_POSITIVE:
            b1_wc2 = b1.winding_count2
        elif b1_ft2 == FILL_NEGATIVE:
            b1_wc2 = -b1.winding_count2
        else:
            b1_wc2 = abs(b1.winding_count2)
        if b2_ft2 == FILL_POSITIVE:
            b2_wc2 = b2.winding_count2
        elif b2_ft2 == FILL_NEGATIVE:
            b2_wc2 = -b2.winding_count2
        else:
            b2_wc2 = abs(b2.winding_count2)

        if b1.poly_type != b2.poly_type:
            add_local_minimum_point(b1, b2, active_bounds, pt, manager)
        elif b1_wc == 1 and b2_wc == 1:
            if cliptype == CLIP_INTERSECTION:
                if b1_wc2 > 0 and b2_wc2 > 0:
                    add_local_minimum_point(b1, b2, active_bounds, pt, manager)
            elif cliptype == CLIP_DIFFERENCE:
                if ((b1.poly_type == PTYPE_CLIP and b1_wc2 > 0 and b2_wc2 > 0)
                        or (b1.poly_type == PTYPE_SUBJECT and b1_wc2 <= 0 and b2_wc2 <= 0)):
                    add_local_minimum_point(b1, b2, active_bounds, pt, manager)
            elif cliptype == CLIP_XOR:
                add_local_minimum_point(b1, b2, active_bounds, pt, manager)
            else:  # union (default branch in C++)
                if b1_wc2 <= 0 and b2_wc2 <= 0:
                    add_local_minimum_point(b1, b2, active_bounds, pt, manager)
        else:
            swap_sides(b1, b2)


def process_intersect_list(intersects: list, cliptype, subject_fill, clip_fill,
                           manager: RingManager, active_bounds: list):
    """intersect_util.hpp:295-330 — enforce adjacency order, then apply."""
    for node_idx in range(len(intersects)):
        node = intersects[node_idx]
        # find first position of either bound
        b1_idx = None
        for i, b in enumerate(active_bounds):
            if b is node[0] or b is node[1]:
                b1_idx = i
                break
        b2_idx = b1_idx + 1
        nb = active_bounds[b2_idx]
        if not (nb is node[0] or nb is node[1]):
            # find a later node that IS adjacent and swap it forward
            nxt = node_idx + 1
            while nxt < len(intersects):
                cand = intersects[nxt]
                c1 = None
                for i, b in enumerate(active_bounds):
                    if b is cand[0] or b is cand[1]:
                        c1 = i
                        break
                c2 = c1 + 1
                if active_bounds[c2] is cand[0] or active_bounds[c2] is cand[1]:
                    b1_idx, b2_idx = c1, c2
                    break
                nxt += 1
            if nxt == len(intersects):
                raise RuntimeError("Could not properly correct intersection order.")
            intersects[node_idx], intersects[nxt] = intersects[nxt], intersects[node_idx]
            node = intersects[node_idx]
        pt = round_point(node[2])
        intersect_bounds(node[0], node[1], pt, cliptype, subject_fill, clip_fill,
                         manager, active_bounds)
        active_bounds[b1_idx], active_bounds[b2_idx] = (
            active_bounds[b2_idx],
            active_bounds[b1_idx],
        )


def process_intersections(top_y: int, active_bounds: list, cliptype, subject_fill,
                          clip_fill, manager: RingManager):
    """intersect_util.hpp:344-369."""
    if not active_bounds:
        return
    update_current_x(active_bounds, top_y)
    intersects = []

    def on_swap(b1, b2):
        pt = get_edge_intersection(b1.cur, b2.cur)
        if pt is None:
            raise RuntimeError("Trying to find intersection of lines that do not intersect")
        intersects.append([b1, b2, pt])

    bubble_sort_bounds(active_bounds, on_swap)
    if not intersects:
        return
    # restore original order
    active_bounds.sort(key=lambda b: b.pos)
    # sort intersect list: descending pt.y (values_are_equal ties ->
    # larger winding_count2 sum first)   intersect_util.hpp:17-27
    import functools

    def cmp(n1, n2):
        if not values_are_equal(n2[2][1], n1[2][1]):
            return -1 if n2[2][1] < n1[2][1] else 1
        s1 = n1[0].winding_count2 + n1[1].winding_count2
        s2 = n2[0].winding_count2 + n2[1].winding_count2
        if s2 > s1:
            return -1
        if s2 < s1:
            return 1
        return 0

    intersects.sort(key=functools.cmp_to_key(cmp))
    process_intersect_list(intersects, cliptype, subject_fill, clip_fill, manager,
                           active_bounds)


# ---------------------------------------------------------------------------
# horizontal edge processing (process_horizontal.hpp)
# ---------------------------------------------------------------------------


def _wround(v: float) -> int:
    return _llround(v)


def process_horizontal_left_to_right(scanline_y, hz_i, active_bounds, manager,
                                     scanbeam, cliptype, subject_fill, clip_fill):
    """process_horizontal.hpp:16-122. Returns index to continue from."""
    behind = hz_i
    shifted = False
    horz = active_bounds[hz_i]
    is_maxima_edge = is_maxima_b(horz, scanline_y)
    max_pair_idx = get_maxima_pair(horz, active_bounds) if is_maxima_edge else None

    hp = manager.hot_pixels
    hp_i = manager.current_hp_idx
    while hp_i < len(hp) and (
        hp[hp_i][1] > scanline_y
        or (hp[hp_i][1] == scanline_y and hp[hp_i][0] < horz.cur.botx)
    ):
        hp_i += 1

    i = hz_i + 1
    while i < len(active_bounds):
        bnd = active_bounds[i]
        if bnd is None:
            i += 1
            continue
        while (hp_i < len(hp) and hp[hp_i][1] == scanline_y
               and hp[hp_i][0] < _wround(bnd.current_x)
               and hp[hp_i][0] < horz.cur.topx):
            if horz.ring is not None:
                add_point_to_ring(horz, hp[hp_i], manager)
            hp_i += 1

        if greater_than(bnd.current_x, float(horz.cur.topx)):
            break
        if (_wround(bnd.current_x) == horz.cur.topx
                and not horz.next_at_end()
                and horz.cur.dx < horz.edges[horz.next_edge].dx):
            break

        if horz.ring is not None:
            add_point_to_ring(horz, (_wround(bnd.current_x), scanline_y), manager)

        if is_maxima_edge and i == max_pair_idx:
            mp = active_bounds[max_pair_idx]
            if horz.ring is not None and mp.ring is not None:
                add_local_maximum_point(horz, mp, (horz.cur.topx, horz.cur.topy),
                                        manager, active_bounds)
            active_bounds[max_pair_idx] = None
            # horz is at index hz_i currently
            active_bounds[hz_i] = None
            if not shifted:
                behind += 1
            return behind

        intersect_bounds(horz, bnd, (_wround(bnd.current_x), scanline_y), cliptype,
                         subject_fill, clip_fill, manager, active_bounds)
        active_bounds[hz_i], active_bounds[i] = active_bounds[i], active_bounds[hz_i]
        hz_i = i
        i += 1
        shifted = True

    if horz.ring is not None:
        while hp_i < len(hp) and hp[hp_i][1] == scanline_y and hp[hp_i][0] < horz.cur.topx:
            add_point_to_ring(horz, hp[hp_i], manager)
            hp_i += 1
    if horz.ring is not None:
        add_point_to_ring(horz, (horz.cur.topx, horz.cur.topy), manager)

    if not horz.next_at_end():
        next_edge_in_bound(horz, scanbeam)
    else:
        active_bounds[hz_i] = None
    if not shifted:
        behind += 1
    return behind


def process_horizontal_right_to_left(scanline_y, hz_i, active_bounds, manager,
                                     scanbeam, cliptype, subject_fill, clip_fill):
    """process_horizontal.hpp:124-232. Returns index to continue from."""
    next_bnd_idx = hz_i + 1
    horz = active_bounds[hz_i]
    is_maxima_edge = is_maxima_b(horz, scanline_y)
    max_pair_idx = None
    if is_maxima_edge:
        mpi = get_maxima_pair(horz, active_bounds)
        # rev itr then --rev => the element itself in reverse traversal
        max_pair_idx = mpi

    hp = manager.hot_pixels
    hp_f = manager.current_hp_idx
    while hp_f < len(hp) and (
        hp[hp_f][1] < scanline_y
        or (hp_f < len(hp) and hp[hp_f][1] == scanline_y and hp[hp_f][0] < horz.cur.topx)
    ):
        hp_f += 1
    hp_i = hp_f - 1  # reverse iterator position

    i = hz_i - 1  # reverse traversal
    while i >= 0:
        bnd = active_bounds[i]
        if bnd is None:
            i -= 1
            continue
        while (hp_i >= 0 and hp[hp_i][1] == scanline_y
               and hp[hp_i][0] > _wround(bnd.current_x)
               and hp[hp_i][0] > horz.cur.topx):
            if horz.ring is not None:
                add_point_to_ring(horz, hp[hp_i], manager)
            hp_i -= 1

        if less_than(bnd.current_x, float(horz.cur.topx)):
            break
        if (_wround(bnd.current_x) == horz.cur.topx
                and not horz.next_at_end()
                and horz.cur.dx < horz.edges[horz.next_edge].dx):
            break

        if horz.ring is not None:
            add_point_to_ring(horz, (_wround(bnd.current_x), scanline_y), manager)

        if is_maxima_edge and i == max_pair_idx:
            mp = active_bounds[max_pair_idx]
            if horz.ring is not None and mp.ring is not None:
                add_local_maximum_point(horz, mp, (horz.cur.topx, horz.cur.topy),
                                        manager, active_bounds)
            active_bounds[max_pair_idx] = None
            active_bounds[hz_i] = None
            return next_bnd_idx

        intersect_bounds(bnd, horz, (_wround(bnd.current_x), scanline_y), cliptype,
                         subject_fill, clip_fill, manager, active_bounds)
        active_bounds[hz_i], active_bounds[i] = active_bounds[i], active_bounds[hz_i]
        hz_i = i
        i -= 1

    if horz.ring is not None:
        while hp_i >= 0 and hp[hp_i][1] == scanline_y and hp[hp_i][0] > horz.cur.topx:
            add_point_to_ring(horz, hp[hp_i], manager)
            hp_i -= 1
    if horz.ring is not None:
        add_point_to_ring(horz, (horz.cur.topx, horz.cur.topy), manager)

    if not horz.next_at_end():
        next_edge_in_bound(horz, scanbeam)
    else:
        active_bounds[hz_i] = None
    return next_bnd_idx


def process_horizontals(scanline_y, active_bounds, manager, scanbeam, cliptype,
                        subject_fill, clip_fill):
    i = 0
    while i < len(active_bounds):
        bnd = active_bounds[i]
        if bnd is not None and is_horizontal(bnd.cur):
            if bnd.cur.botx < bnd.cur.topx:
                i = process_horizontal_left_to_right(
                    scanline_y, i, active_bounds, manager, scanbeam, cliptype,
                    subject_fill, clip_fill)
            else:
                i = process_horizontal_right_to_left(
                    scanline_y, i, active_bounds, manager, scanbeam, cliptype,
                    subject_fill, clip_fill)
        else:
            i += 1
    active_bounds[:] = [b for b in active_bounds if b is not None]


# ---------------------------------------------------------------------------
# maxima / top of scanbeam (process_maxima.hpp)
# ---------------------------------------------------------------------------


def do_maxima(i, max_pair_idx, cliptype, subject_fill, clip_fill, manager,
              active_bounds):
    """process_maxima.hpp:20-55. Returns index to continue from."""
    bnd_next = i + 1
    return_idx = i
    skipped = False
    while bnd_next < len(active_bounds) and bnd_next != max_pair_idx:
        if active_bounds[bnd_next] is None:
            bnd_next += 1
            continue
        skipped = True
        b = active_bounds[i]
        intersect_bounds(b, active_bounds[bnd_next], (b.cur.topx, b.cur.topy),
                         cliptype, subject_fill, clip_fill, manager, active_bounds)
        active_bounds[i], active_bounds[bnd_next] = (
            active_bounds[bnd_next],
            active_bounds[i],
        )
        i = bnd_next
        bnd_next += 1

    b = active_bounds[i]
    mp = active_bounds[max_pair_idx]
    if b.ring is not None and mp.ring is not None:
        add_local_maximum_point(b, mp, (b.cur.topx, b.cur.topy), manager, active_bounds)
    elif b.ring is not None or mp.ring is not None:
        raise RuntimeError("DoMaxima error")
    active_bounds[max_pair_idx] = None
    active_bounds[i] = None
    if not skipped:
        return_idx += 1
    return return_idx


def insert_lm_left_and_right_bound(left_bound, right_bound, active_bounds, manager,
                                   scanbeam, cliptype, subject_fill, clip_fill):
    # active_bound_list.hpp:323-350
    lb = insert_bound_into_ABL(left_bound, right_bound, active_bounds)
    rb = lb + 1
    set_winding_count(lb, active_bounds, subject_fill, clip_fill)
    active_bounds[rb].winding_count = active_bounds[lb].winding_count
    active_bounds[rb].winding_count2 = active_bounds[lb].winding_count2
    if is_contributing(left_bound, cliptype, subject_fill, clip_fill):
        add_local_minimum_point(active_bounds[lb], active_bounds[rb], active_bounds,
                                (active_bounds[lb].cur.botx, active_bounds[lb].cur.boty),
                                manager)
    insert_sorted_scanbeam(scanbeam, active_bounds[lb].cur.topy)
    if not is_horizontal(active_bounds[rb].cur):
        insert_sorted_scanbeam(scanbeam, active_bounds[rb].cur.topy)


def insert_local_minima_into_ABL(bot_y, minima_sorted, lm_state, active_bounds,
                                 manager, scanbeam, cliptype, subject_fill, clip_fill):
    while lm_state[0] < len(minima_sorted) and minima_sorted[lm_state[0]].y == bot_y:
        lm = minima_sorted[lm_state[0]]
        initialize_lm(lm)
        insert_lm_left_and_right_bound(lm.left_bound, lm.right_bound, active_bounds,
                                       manager, scanbeam, cliptype, subject_fill,
                                       clip_fill)
        lm_state[0] += 1


def insert_horizontal_local_minima_into_ABL(top_y, minima_sorted, lm_state,
                                            active_bounds, manager, scanbeam,
                                            cliptype, subject_fill, clip_fill):
    while (lm_state[0] < len(minima_sorted)
           and minima_sorted[lm_state[0]].y == top_y
           and minima_sorted[lm_state[0]].minimum_has_horizontal):
        lm = minima_sorted[lm_state[0]]
        initialize_lm(lm)
        insert_lm_left_and_right_bound(lm.left_bound, lm.right_bound, active_bounds,
                                       manager, scanbeam, cliptype, subject_fill,
                                       clip_fill)
        lm_state[0] += 1


def process_edges_at_top_of_scanbeam(top_y, active_bounds, scanbeam, minima_sorted,
                                     lm_state, manager, cliptype, subject_fill,
                                     clip_fill):
    """process_maxima.hpp:58-123."""
    i = 0
    while i < len(active_bounds):
        bnd = active_bounds[i]
        if bnd is None:
            i += 1
            continue
        # 1. maxima (not horizontal)
        is_maxima_edge = is_maxima_b(bnd, top_y)
        if is_maxima_edge:
            max_pair_idx = get_maxima_pair(bnd, active_bounds)
            is_maxima_edge = (
                (max_pair_idx is None
                 or not is_horizontal(active_bounds[max_pair_idx].cur))
                and max_pair_idx is not None
                and is_maxima_b(active_bounds[max_pair_idx], top_y)
            )
            # NOTE C++: is_maxima(active_bounds.end(), y) is never reached
            # because of short-circuit when pair missing; pair missing
            # means not maxima here
            if is_maxima_edge:
                i = do_maxima(i, max_pair_idx, cliptype, subject_fill, clip_fill,
                              manager, active_bounds)
                continue
        # 2. promote horizontal edges
        if is_intermediate_b(bnd, top_y) and is_horizontal(bnd.edges[bnd.next_edge]):
            if bnd.ring is not None:
                insert_hot_pixels_in_path(bnd, (bnd.cur.topx, bnd.cur.topy), manager,
                                          False)
            next_edge_in_bound(bnd, scanbeam)
            if bnd.ring is not None:
                add_point_to_ring(bnd, (bnd.cur.botx, bnd.cur.boty), manager)
        else:
            bnd.current_x = get_current_x(bnd.cur, top_y)
        i += 1
    active_bounds[:] = [b for b in active_bounds if b is not None]

    insert_horizontal_local_minima_into_ABL(top_y, minima_sorted, lm_state,
                                            active_bounds, manager, scanbeam,
                                            cliptype, subject_fill, clip_fill)
    process_horizontals(top_y, active_bounds, manager, scanbeam, cliptype,
                        subject_fill, clip_fill)

    # 4. promote intermediate vertices
    for bnd in active_bounds:
        if is_intermediate_b(bnd, top_y):
            if bnd.ring is not None:
                add_point_to_ring(bnd, (bnd.cur.topx, bnd.cur.topy), manager)
            next_edge_in_bound(bnd, scanbeam)


def execute_vatti(minima_list, manager, cliptype, subject_fill, clip_fill):
    """vatti.hpp:21-63."""
    active_bounds = []
    scanbeam = []
    minima_sorted = sort_minima(minima_list)
    lm_state = [0]
    setup_scanbeam(minima_list, scanbeam)
    manager.current_hp_idx = 0

    while True:
        scanline_y = pop_from_scanbeam(scanbeam)
        if scanline_y is None:
            if lm_state[0] >= len(minima_sorted):
                break
            scanline_y = None  # unreachable: scanbeam always seeded by minima
            raise RuntimeError("scanbeam empty with minima left")
        process_intersections(scanline_y, active_bounds, cliptype, subject_fill,
                              clip_fill, manager)
        update_current_hp_itr(scanline_y, manager)
        process_edges_at_top_of_scanbeam(scanline_y, active_bounds, scanbeam,
                                         minima_sorted, lm_state, manager, cliptype,
                                         subject_fill, clip_fill)
        insert_local_minima_into_ABL(scanline_y, minima_sorted, lm_state,
                                     active_bounds, manager, scanbeam, cliptype,
                                     subject_fill, clip_fill)


# ---------------------------------------------------------------------------
# snap rounding / hot pixel pass (snap_rounding.hpp)
# ---------------------------------------------------------------------------


def _hp_horizontals_at_top_scanbeam(top_y, bnd_curr_idx, active_bounds, manager):
    """snap_rounding.hpp:49-94. Returns (new_idx, shifted)."""
    shifted = False
    bnd_curr = active_bounds[bnd_curr_idx]
    cur = bnd_curr.cur
    bnd_curr.current_x = float(cur.topx)
    if cur.botx < cur.topx:
        # left to right
        nxt = bnd_curr_idx + 1
        while nxt < len(active_bounds) and (
            active_bounds[nxt] is None
            or active_bounds[nxt].current_x < bnd_curr.current_x
        ):
            b2 = active_bounds[nxt]
            if b2 is not None and b2.cur.topy != top_y and b2.cur.boty != top_y:
                manager.hot_pixels.append((_wround(b2.current_x), top_y))
            active_bounds[bnd_curr_idx], active_bounds[nxt] = (
                active_bounds[nxt],
                active_bounds[bnd_curr_idx],
            )
            bnd_curr_idx = nxt
            nxt += 1
            shifted = True
    else:
        # right to left
        if bnd_curr_idx > 0:
            prv = bnd_curr_idx - 1
            while bnd_curr_idx > 0 and (
                active_bounds[prv] is None
                or active_bounds[prv].current_x > bnd_curr.current_x
            ):
                b2 = active_bounds[prv]
                if b2 is not None and b2.cur.topy != top_y and b2.cur.boty != top_y:
                    manager.hot_pixels.append((_wround(b2.current_x), top_y))
                active_bounds[bnd_curr_idx], active_bounds[prv] = (
                    active_bounds[prv],
                    active_bounds[bnd_curr_idx],
                )
                bnd_curr_idx = prv
                if bnd_curr_idx > 0:
                    prv -= 1
    return bnd_curr_idx, shifted


def _hp_process_edges_at_top(top_y, scanbeam, active_bounds, manager):
    """snap_rounding.hpp:96-128."""
    i = 0
    while i < len(active_bounds):
        bnd = active_bounds[i]
        if bnd is None:
            i += 1
            continue
        bnd_curr_idx = i
        shifted = False
        while (bnd.current_edge < len(bnd.edges)
               and bnd.cur.topy == top_y):
            manager.hot_pixels.append((bnd.cur.topx, bnd.cur.topy))
            if is_horizontal(bnd.cur):
                bnd_curr_idx, sh = _hp_horizontals_at_top_scanbeam(
                    top_y, bnd_curr_idx, active_bounds, manager)
                if sh:
                    shifted = True
            next_edge_in_bound(bnd, scanbeam)
        if bnd.current_edge >= len(bnd.edges):
            active_bounds[bnd_curr_idx] = None
        if not shifted:
            i += 1
    active_bounds[:] = [b for b in active_bounds if b is not None]


def _hp_insert_local_minima(top_y, minima_sorted, lm_state, active_bounds, manager,
                            scanbeam):
    """snap_rounding.hpp:130-160."""
    while lm_state[0] < len(minima_sorted) and minima_sorted[lm_state[0]].y == top_y:
        lm = minima_sorted[lm_state[0]]
        manager.hot_pixels.append(
            (lm.left_bound.edges[0].botx, lm.left_bound.edges[0].boty))
        lb = lm.left_bound
        rb = lm.right_bound
        lb.current_edge = 0
        lb.next_edge = 1
        lb.current_x = float(lb.edges[0].botx)
        rb.current_edge = 0
        rb.next_edge = 1
        rb.current_x = float(rb.edges[0].botx)
        lbi = insert_bound_into_ABL(lb, rb, active_bounds)
        if not is_horizontal(active_bounds[lbi].cur):
            insert_sorted_scanbeam(scanbeam, active_bounds[lbi].cur.topy)
        rbi = lbi + 1
        if not is_horizontal(active_bounds[rbi].cur):
            insert_sorted_scanbeam(scanbeam, active_bounds[rbi].cur.topy)
        lm_state[0] += 1


def build_hot_pixels(minima_list, manager: RingManager):
    """snap_rounding.hpp:162-196."""
    active_bounds = []
    scanbeam = []
    minima_sorted = sort_minima(minima_list)
    lm_state = [0]
    setup_scanbeam(minima_list, scanbeam)

    while True:
        scanline_y = pop_from_scanbeam(scanbeam)
        if scanline_y is None:
            if lm_state[0] >= len(minima_sorted):
                break
            raise RuntimeError("scanbeam empty with minima left")
        # hot pixel intersections: bubble sort by current_x, record
        # rounded intersection points
        if active_bounds:
            update_current_x(active_bounds, scanline_y)

            def on_swap(b1, b2):
                pt = get_edge_intersection(b1.cur, b2.cur)
                if pt is None:
                    raise RuntimeError(
                        "Trying to find intersection of lines that do not intersect")
                manager.hot_pixels.append(round_point(pt))

            bubble_sort_bounds(active_bounds, on_swap)
        _hp_insert_local_minima(scanline_y, minima_sorted, lm_state, active_bounds,
                                manager, scanbeam)
        _hp_process_edges_at_top(scanline_y, scanbeam, active_bounds, manager)
    sort_hot_pixels(manager)


# ---------------------------------------------------------------------------
# topology correction (topology_correction.hpp)
# ---------------------------------------------------------------------------


def correct_orientations(manager: RingManager):
    # topology_correction.hpp:166-182
    for r in manager.rings:
        if r.points is None:
            continue
        r.recalculate_stats()
        if r.size() < 3:
            remove_ring_and_points(r, manager, False)
            continue
        if ring_is_hole(r) != r.is_hole():
            reverse_ring(r.points)
            r.recalculate_stats()


def sort_ring_points(r: Ring) -> list:
    # topology_correction.hpp:184-201
    pts = []
    p = r.points
    last = p.prev
    while p is not last:
        pts.append(p)
        p = p.next
    pts.append(last)
    pts.sort(key=lambda pt: (-pt.y, pt.x))
    return pts


def correct_self_intersection(pt1: PointNode, pt2: PointNode, manager: RingManager):
    """topology_correction.hpp:203-241 — split a ring at a repeated point."""
    if pt1.ring is not pt2.ring:
        return None
    ring = pt1.ring
    pt3 = pt1.prev
    pt4 = pt2.prev
    pt1.prev = pt4
    pt4.next = pt1
    pt2.prev = pt3
    pt3.next = pt2

    new_ring = create_new_ring(manager)
    area_1, size_1, box1 = area_from_point(pt1)
    area_2, size_2, box2 = area_from_point(pt2)
    if abs(area_1) > abs(area_2):
        ring.points = pt1
        ring.set_stats(area_1, size_1, box1)
        new_ring.points = pt2
        new_ring.set_stats(area_2, size_2, box2)
    else:
        ring.points = pt2
        ring.set_stats(area_2, size_2, box2)
        new_ring.points = pt1
        new_ring.set_stats(area_1, size_1, box1)
    update_points_ring(new_ring)
    return new_ring


def correct_repeated_points(manager, new_rings, pts, begin, end):
    # topology_correction.hpp:243-263 (begin/end are indices into pts)
    for i1 in range(begin, end):
        if pts[i1].ring is None:
            continue
        for i2 in range(i1 + 1, end):
            if pts[i2].ring is None:
                continue
            nr = correct_self_intersection(pts[i1], pts[i2], manager)
            if nr is not None:
                new_rings.append(nr)


def _repeated_point_bands(pts, fn):
    """Shared scan (topology_correction.hpp:265-292 pattern): find runs
    of equal points in a sorted point vector and call fn(first, last)
    with the inclusive index range expressed as [first, last)."""
    count = 0
    prev_i = 0
    i = 1
    n = len(pts)
    while i < n:
        if pts[prev_i].same_xy(pts[i]):
            count += 1
            prev_i += 1
            i += 1
            if i < n:
                continue
            else:
                prev_i += 1
        else:
            prev_i += 1
            i += 1
        if count == 0:
            continue
        first = prev_i - (count + 1)
        fn(first, prev_i)
        count = 0


def find_and_correct_repeated_points(r: Ring, manager, new_rings):
    pts = sort_ring_points(r)
    _repeated_point_bands(
        pts, lambda a, b: correct_repeated_points(manager, new_rings, pts, a, b))


def reassign_children_if_necessary(new_ring, sibling_ring, manager, new_rings):
    # topology_correction.hpp:294-312
    children = manager.children if sibling_ring is None else sibling_ring.children
    for c in list(children):
        if c is None:
            continue
        if c in new_rings:
            continue
        if poly2_contains_poly1(c, new_ring):
            reassign_as_child(c, new_ring, manager)


def find_parent_in_tree(r, possible_parent, manager):
    # topology_correction.hpp:314-337
    for c in possible_parent.children:
        if c is None:
            continue
        for gc in c.children:
            if gc is None:
                continue
            if find_parent_in_tree(r, gc, manager):
                return True
    if poly2_contains_poly1(r, possible_parent):
        reassign_as_child(r, possible_parent, manager)
        return True
    return False


def assign_new_ring_parents(manager, original_ring, new_rings):
    """topology_correction.hpp:339-452."""
    new_rings[:] = [
        r for r in new_rings
        if r.points is not None and not value_is_zero(r.area())
    ]
    if not new_rings:
        return
    original_positive = original_ring.area() > 0.0
    if len(new_rings) == 1:
        new_positive = new_rings[0].area() > 0.0
        if original_positive == new_positive:
            assign_as_child(new_rings[0], original_ring.parent, manager)
            reassign_children_if_necessary(new_rings[0], original_ring, manager, new_rings)
        else:
            assign_as_child(new_rings[0], original_ring, manager)
            reassign_children_if_necessary(new_rings[0], original_ring.parent, manager, new_rings)
        return

    new_rings.sort(key=lambda r: -abs(r.area()))
    for idx, r in enumerate(new_rings):
        new_positive = r.area() > 0.0
        same_orientation = new_positive == original_positive
        found = False
        for s in new_rings[:idx]:
            if s.parent is not original_ring.parent:
                continue
            if same_orientation:
                for s_child in s.children:
                    if s_child is None:
                        continue
                    if find_parent_in_tree(r, s_child, manager):
                        reassign_children_if_necessary(r, original_ring, manager, new_rings)
                        found = True
                        break
            else:
                if find_parent_in_tree(r, s, manager):
                    reassign_children_if_necessary(r, original_ring.parent, manager, new_rings)
                    found = True
            if found:
                break
        if found:
            continue
        if same_orientation:
            for o_child in original_ring.children:
                if o_child is None:
                    continue
                if find_parent_in_tree(r, o_child, manager):
                    reassign_children_if_necessary(r, original_ring, manager, new_rings)
                    found = True
                    break
            if not found:
                assign_as_child(r, original_ring.parent, manager)
                reassign_children_if_necessary(r, original_ring, manager, new_rings)
        else:
            if find_parent_in_tree(r, original_ring, manager):
                reassign_children_if_necessary(r, original_ring.parent, manager, new_rings)
            else:
                raise RuntimeError("Unable to find a proper parent ring")


def correct_ring_self_intersections(manager, r, correct_tree_flag):
    # topology_correction.hpp:454-470
    if r.corrected or r.points is None:
        return False
    new_rings = []
    find_and_correct_repeated_points(r, manager, new_rings)
    if correct_tree_flag:
        assign_new_ring_parents(manager, r, new_rings)
    r.corrected = True
    return True


def find_intersect_loop(dupe_ring, iList, ring_parent, ring_origin, ring_search,
                        visited, orig_pt, prev_pt, manager):
    """topology_correction.hpp:100-146. dupe_ring: dict ring -> list of
    [op1, op2] pairs (multimap)."""
    entries = dupe_ring.get(ring_search)
    if entries is not None:
        k = 0
        while k < len(entries):
            pair = entries[k]
            it_ring1 = pair[0].ring
            it_ring2 = pair[1].ring
            if (it_ring1 is None or it_ring2 is None or it_ring1 is not ring_search
                    or (not it_ring1.is_hole() and not it_ring2.is_hole())):
                entries.pop(k)
                continue
            if (it_ring2 is ring_origin
                    and (ring_parent is it_ring2 or ring_parent is it_ring2.parent)
                    and not prev_pt.same_xy(pair[1])
                    and not orig_pt.same_xy(pair[1])):
                iList.insert(0, (ring_search, pair))
                return True
            k += 1
    entries = dupe_ring.get(ring_search, [])
    visited.add(id(ring_search))
    for pair in list(entries):
        it_ring = pair[1].ring
        if (id(it_ring) in visited or it_ring is None
                or (ring_parent is not it_ring and ring_parent is not it_ring.parent)
                or value_is_zero(it_ring.area())
                or prev_pt.same_xy(pair[1])):
            continue
        if find_intersect_loop(dupe_ring, iList, ring_parent, ring_origin, it_ring,
                               visited, orig_pt, pair[1], manager):
            iList.insert(0, (ring_search, pair))
            return True
    return False


def process_single_intersection(connection_map, op_j, op_k, manager):
    """topology_correction.hpp:473-734."""
    ring_j = op_j.ring
    ring_k = op_k.ring
    if ring_j is ring_k:
        return
    if not ring_j.is_hole() and not ring_k.is_hole():
        return
    if not ring_j.is_hole():
        ring_origin = ring_j
        ring_parent = ring_origin
        ring_search = ring_k
        op_origin_1 = op_j
        op_origin_2 = op_k
    elif not ring_k.is_hole():
        ring_origin = ring_k
        ring_parent = ring_origin
        ring_search = ring_j
        op_origin_1 = op_k
        op_origin_2 = op_j
    else:
        ring_origin = ring_j
        ring_parent = ring_origin.parent
        ring_search = ring_k
        op_origin_1 = op_j
        op_origin_2 = op_k
    if ring_parent is not ring_search.parent:
        return

    found = False
    iList = []
    entries = connection_map.get(ring_search)
    if entries is not None:
        k = 0
        while k < len(entries):
            pair = entries[k]
            if pair[0].ring is None:
                entries.pop(k)
                continue
            if pair[1].ring is None:
                entries.pop(k)
                continue
            it_ring2 = pair[1].ring
            if it_ring2 is ring_origin:
                found = True
                if not op_origin_1.same_xy(pair[1]):
                    iList.append((ring_search, pair))
                    break
            k += 1
    if not iList:
        entries = connection_map.get(ring_search, [])
        visited = {id(ring_search)}
        for pair in list(entries):
            it_ring = pair[1].ring
            if (it_ring is not ring_search and not op_origin_2.same_xy(pair[1])
                    and it_ring is not None
                    and (ring_parent is it_ring or ring_parent is it_ring.parent)
                    and not value_is_zero(it_ring.area())
                    and find_intersect_loop(connection_map, iList, ring_parent,
                                            ring_origin, it_ring, visited,
                                            op_origin_2, pair[1], manager)):
                found = True
                iList.insert(0, (ring_search, pair))
                break
    if not found:
        connection_map.setdefault(ring_origin, []).append([op_origin_1, op_origin_2])
        connection_map.setdefault(ring_search, []).append([op_origin_2, op_origin_1])
        return
    if not iList:
        missing = True
        for pair in connection_map.get(ring_origin, []):
            if pair[1].ring is ring_search:
                missing = False
        if missing:
            connection_map.setdefault(ring_origin, []).append([op_origin_1, op_origin_2])
        return
    if ring_origin.is_hole():
        for n, iRing in enumerate(iList):
            ring_itr = iRing[0]
            if not ring_itr.is_hole():
                # make the hole the origin
                pair = iRing[1]
                op_origin_1, pair[0] = pair[0], op_origin_1
                op_origin_2, pair[1] = pair[1], op_origin_2
                iList[n] = (ring_origin, pair)
                ring_origin = ring_itr
                ring_parent = ring_origin
                break
    origin_is_hole = ring_origin.is_hole()

    # switch the origin link
    op_origin_1_next = op_origin_1.next
    op_origin_2_next = op_origin_2.next
    op_origin_1.next = op_origin_2_next
    op_origin_2.next = op_origin_1_next
    op_origin_1_next.prev = op_origin_2
    op_origin_2_next.prev = op_origin_1

    for iRing in iList:
        op_search_1 = iRing[1][0]
        op_search_2 = iRing[1][1]
        op_search_1_next = op_search_1.next
        op_search_2_next = op_search_2.next
        op_search_1.next = op_search_2_next
        op_search_2.next = op_search_1_next
        op_search_1_next.prev = op_search_2
        op_search_2_next.prev = op_search_1

    ring_new = create_new_ring(manager)
    ring_origin.corrected = False
    area_1, size_1, box1 = area_from_point(op_origin_1)
    area_2, size_2, box2 = area_from_point(op_origin_2)
    if origin_is_hole and area_1 < 0.0:
        ring_origin.points = op_origin_1
        ring_origin.set_stats(area_1, size_1, box1)
        ring_new.points = op_origin_2
        ring_new.set_stats(area_2, size_2, box2)
    else:
        ring_origin.points = op_origin_2
        ring_origin.set_stats(area_2, size_2, box2)
        ring_new.points = op_origin_1
        ring_new.set_stats(area_1, size_1, box1)

    update_points_ring(ring_origin)
    update_points_ring(ring_new)
    ring_origin.bottom_point = None

    for iRing in iList:
        ring_itr = iRing[0]
        ring_itr.bottom_point = None
        if origin_is_hole:
            ring1_replaces_ring2(ring_origin, ring_itr, manager)
        else:
            ring1_replaces_ring2(ring_origin.parent, ring_itr, manager)
    if origin_is_hole:
        assign_as_child(ring_new, ring_origin, manager)
        for c in list(ring_parent.children):
            if c is None:
                continue
            if poly2_contains_poly1(c, ring_new):
                reassign_as_child(c, ring_new, manager)
    else:
        assign_as_sibling(ring_new, ring_origin, manager)
        for c in list(ring_origin.children):
            if c is None:
                continue
            if poly2_contains_poly1(c, ring_new):
                reassign_as_child(c, ring_new, manager)

    move_list = []
    for iRing in iList:
        entries = connection_map.get(iRing[0])
        if entries:
            for pair in entries:
                it_ring = pair[0].ring
                it_ring2 = pair[1].ring
                if it_ring is None or it_ring2 is None or it_ring is it_ring2:
                    continue
                if it_ring.is_hole() or it_ring2.is_hole():
                    move_list.append((it_ring, pair))
            connection_map.pop(iRing[0], None)
    entries = connection_map.get(ring_origin)
    if entries is not None:
        k = 0
        while k < len(entries):
            pair = entries[k]
            it_ring = pair[0].ring
            it_ring2 = pair[1].ring
            if it_ring is None or it_ring2 is None or it_ring is it_ring2:
                entries.pop(k)
                continue
            if it_ring is not ring_origin:
                if it_ring.is_hole() or it_ring2.is_hole():
                    move_list.append((it_ring, pair))
                entries.pop(k)
            else:
                if it_ring.is_hole() or it_ring2.is_hole():
                    k += 1
                else:
                    entries.pop(k)
        if not entries:
            connection_map.pop(ring_origin, None)
    for key, pair in move_list:
        connection_map.setdefault(key, []).append(pair)


def correct_chained_repeats(manager, connection_map, pts, begin, end):
    # topology_correction.hpp:737-753
    for i1 in range(begin, end):
        if pts[i1].ring is None:
            continue
        for i2 in range(i1 + 1, end):
            if pts[i2].ring is None:
                continue
            process_single_intersection(connection_map, pts[i1], pts[i2], manager)


def correct_chained_rings(manager: RingManager):
    # topology_correction.hpp:755-795
    if len(manager.all_points) < 2:
        return
    connection_map = {}
    pts = manager.all_points
    _repeated_point_bands(
        pts, lambda a, b: correct_chained_repeats(manager, connection_map, pts, a, b))


def sort_rings_largest_to_smallest(manager):
    rings = list(manager.rings)

    def key(r):
        has = r.points is not None
        return (0 if has else 1, -abs(r.area()) if has else 0.0)

    rings.sort(key=key)
    return rings


def sort_rings_smallest_to_largest(manager):
    rings = list(manager.rings)

    def key(r):
        has = r.points is not None
        return (0 if has else 1, abs(r.area()) if has else 0.0)

    rings.sort(key=key)
    return rings


def fix_collinear_path(path):
    """topology_correction.hpp:832-940. path = [start_1, end_1, start_2,
    end_2]; returns (pt1, pt2)."""
    start_1, end_1, start_2, end_2 = path
    spike_left = start_1 is end_2
    spike_right = start_2 is end_1

    if spike_left and spike_right:
        itr = start_1
        while itr is not None:
            itr.prev.next = None
            itr.prev = None
            itr.ring = None
            itr = itr.next
        return (None, None)
    elif spike_left:
        prev = start_2.prev
        itr = start_2
        while itr is not end_1:
            itr.prev.next = None
            itr.prev = None
            itr.ring = None
            itr = itr.next
        prev.next = end_1
        end_1.prev = prev
        return (end_1, None)
    elif spike_right:
        prev = start_1.prev
        itr = start_1
        while itr is not end_2:
            itr.prev.next = None
            itr.prev = None
            itr.ring = None
            itr = itr.next
        prev.next = end_2
        end_2.prev = prev
        return (end_2, None)
    else:
        prev_1 = start_1.prev
        prev_2 = start_2.prev
        itr = start_1
        while True:
            itr.prev.next = None
            itr.prev = None
            itr.ring = None
            itr = itr.next
            if itr is end_1 or itr is None:
                break
        itr = start_2
        while True:
            itr.prev.next = None
            itr.prev = None
            itr.ring = None
            itr = itr.next
            if itr is end_2 or itr is None:
                break
        if start_1 is end_1 and start_2 is end_2:
            return (None, None)
        elif start_1 is end_1:
            prev_2.next = end_2
            end_2.prev = prev_2
            return (end_2, None)
        elif start_2 is end_2:
            prev_1.next = end_1
            end_1.prev = prev_1
            return (end_1, None)
        else:
            prev_1.next = end_2
            end_2.prev = prev_1
            prev_2.next = end_1
            end_1.prev = prev_2
            return (end_1, end_2)


def find_start_and_end_of_collinear_edges(pt_a, pt_b):
    """topology_correction.hpp:942-1022."""
    same_ring = pt_a.ring is pt_b.ring
    back = pt_a
    forward = pt_b
    first = True
    while True:
        while back.prev.same_xy(back) and back is not forward:
            back = back.prev
            if back is pt_a:
                break
        if back is forward:
            back = back.prev
            forward = forward.next
            break
        while forward.next.same_xy(forward) and back is not forward:
            forward = forward.next
            if forward is pt_b:
                break
        if not first and (back is pt_a or forward is pt_b):
            break
        if back is forward:
            back = back.prev
            forward = forward.next
            break
        back = back.prev
        forward = forward.next
        first = False
        if not back.same_xy(forward):
            break
    start_a = back.next
    while (not same_ring) and start_a.same_xy(start_a.next) and start_a is not pt_a:
        start_a = start_a.next
    end_b = forward.prev
    while (not same_ring) and end_b.same_xy(end_b.prev) and end_b is not pt_b:
        end_b = end_b.prev
    # second pass: backward on B, forward on A
    back = pt_b
    forward = pt_a
    first = True
    while True:
        while back.prev.same_xy(back) and back is not forward:
            back = back.prev
            if back is pt_b:
                break
        if back is forward:
            back = back.prev
            forward = forward.next
            break
        while forward.next.same_xy(forward) and back is not forward:
            forward = forward.next
            if forward is pt_a:
                break
        if not first and (back is pt_b or forward is pt_a):
            break
        if back is forward or (not first and (back is end_b or forward is start_a)):
            back = back.prev
            forward = forward.next
            break
        back = back.prev
        forward = forward.next
        first = False
        if not back.same_xy(forward):
            break
    start_b = back.next
    while (not same_ring) and start_b.same_xy(start_b.next) and start_b is not pt_b:
        start_b = start_b.next
    end_a = forward.prev
    while (not same_ring) and end_a.same_xy(end_a.prev) and end_a is not pt_a:
        end_a = end_a.prev
    return [start_a, end_a, start_b, end_b]


def has_collinear_edge(pt_a, pt_b):
    # topology_correction.hpp:1024-1028
    return pt_a.next.same_xy(pt_b.prev) or pt_b.next.same_xy(pt_a.prev)


def process_collinear_edges_same_ring(pt_a, pt_b, manager):
    # topology_correction.hpp:1030-1058
    original_ring = pt_a.ring
    path = find_start_and_end_of_collinear_edges(pt_a, pt_b)
    pt1, pt2 = fix_collinear_path(path)
    if pt1 is None:
        remove_ring(original_ring, manager, False)
    elif pt2 is None:
        original_ring.points = pt1
        original_ring.recalculate_stats()
    else:
        ring_new = create_new_ring(manager)
        ring_new.points = pt2
        ring_new.recalculate_stats()
        update_points_ring(ring_new)
        original_ring.points = pt1
        original_ring.recalculate_stats()


def process_collinear_edges_different_rings(pt_a, pt_b, manager):
    # topology_correction.hpp:1060-1085
    ring_a = pt_a.ring
    ring_b = pt_b.ring
    ring_a_larger = abs(ring_a.area()) > abs(ring_b.area())
    path = find_start_and_end_of_collinear_edges(pt_a, pt_b)
    pt1, pt2 = fix_collinear_path(path)
    if pt1 is None:
        remove_ring(ring_a, manager, False)
        remove_ring(ring_b, manager, False)
        return
    merged_ring = ring_a if ring_a_larger else ring_b
    deleted_ring = ring_b if ring_a_larger else ring_a
    merged_ring.points = pt1
    update_points_ring(merged_ring)
    merged_ring.recalculate_stats()
    if merged_ring.size() < 3:
        remove_ring_and_points(merged_ring, manager, False)
    remove_ring(deleted_ring, manager, False)


def remove_duplicate_points(pt_a, pt_b, manager):
    """topology_correction.hpp:1087-1174."""
    if pt_a.ring is pt_b.ring:
        if pt_a.next is pt_b:
            pt_a.next = pt_b.next
            pt_a.next.prev = pt_a
            pt_b.next = None
            pt_b.prev = None
            pt_b.ring = None
            if pt_a.ring.points is pt_b:
                pt_a.ring.points = pt_a
            return True
        elif pt_b.next is pt_a:
            pt_a.prev = pt_b.prev
            pt_a.prev.next = pt_a
            pt_b.next = None
            pt_b.prev = None
            pt_b.ring = None
            if pt_a.ring.points is pt_b:
                pt_a.ring.points = pt_a
            return True
    while pt_a.next.same_xy(pt_a) and pt_a.next is not pt_a:
        remove = pt_a.next
        pt_a.next = remove.next
        pt_a.next.prev = pt_a
        remove.next = None
        remove.prev = None
        remove.ring = None
        if pt_a.ring.points is remove:
            pt_a.ring.points = pt_a
    while pt_a.prev.same_xy(pt_a) and pt_a.prev is not pt_a:
        remove = pt_a.prev
        pt_a.prev = remove.prev
        pt_a.prev.next = pt_a
        remove.next = None
        remove.prev = None
        remove.ring = None
        if pt_a.ring.points is remove:
            pt_a.ring.points = pt_a
    if pt_a.next is pt_a:
        remove_ring_and_points(pt_a.ring, manager, False)
        return True
    if pt_b.ring is None:
        return True
    while pt_b.next.same_xy(pt_b) and pt_b.next is not pt_b:
        remove = pt_b.next
        pt_b.next = remove.next
        pt_b.next.prev = pt_b
        remove.next = None
        remove.prev = None
        remove.ring = None
        if pt_b.ring.points is remove:
            pt_b.ring.points = pt_b
    while pt_b.prev.same_xy(pt_b) and pt_b.prev is not pt_b:
        remove = pt_b.prev
        pt_b.prev = remove.prev
        pt_b.prev.next = pt_b
        remove.next = None
        remove.prev = None
        remove.ring = None
        if pt_b.ring.points is remove:
            pt_b.ring.points = pt_b
    if pt_b.next is pt_b:
        remove_ring_and_points(pt_b.ring, manager, False)
        return True
    if pt_a.ring is None:
        return True
    return False


def process_collinear_edges(pt_a, pt_b, manager):
    # topology_correction.hpp:1176-1200
    if pt_a.ring is None or pt_b.ring is None:
        return False
    if remove_duplicate_points(pt_a, pt_b, manager):
        return True
    if not has_collinear_edge(pt_a, pt_b):
        if pt_a.ring is pt_b.ring:
            correct_self_intersection(pt_a, pt_b, manager)
            return True
        return False
    if pt_a.ring is pt_b.ring:
        process_collinear_edges_same_ring(pt_a, pt_b, manager)
    else:
        process_collinear_edges_different_rings(pt_a, pt_b, manager)
    return True


def correct_collinear_repeats(manager, pts, begin, end):
    # topology_correction.hpp:1202-1224
    for i1 in range(begin, end):
        if pts[i1].ring is None:
            continue
        i2 = begin
        while i2 < end:
            if pts[i1].ring is None:
                break
            if pts[i2].ring is None or pts[i2] is pts[i1]:
                i2 += 1
                continue
            if process_collinear_edges(pts[i1], pts[i2], manager):
                i2 = begin
            else:
                i2 += 1


def correct_collinear_edges(manager: RingManager):
    # topology_correction.hpp:1226-1253
    if len(manager.all_points) < 2:
        return
    pts = manager.all_points
    _repeated_point_bands(
        pts, lambda a, b: correct_collinear_repeats(manager, pts, a, b))


def correct_tree(manager: RingManager):
    """topology_correction.hpp:1255-1302 (including the reference's
    tippecanoe patch: orphan holes are DROPPED, not an error)."""
    sorted_rings = sort_rings_largest_to_smallest(manager)
    for idx, r in enumerate(sorted_rings):
        if r.points is None:
            continue
        if r.size() < 3 or value_is_zero(r.area()):
            remove_ring_and_points(r, manager, False)
            continue
        r.corrected = True
        found = False
        for j in range(idx - 1, -1, -1):
            cand = sorted_rings[j]
            if cand.is_hole() == r.is_hole():
                continue
            if cand.points is None:
                continue
            if poly2_contains_poly1(r, cand):
                reassign_as_child(r, cand, manager)
                found = True
                break
        if not found:
            if r.is_hole():
                remove_ring_and_points(r, manager, False)
            else:
                reassign_as_child(r, None, manager)


def correct_self_intersections(manager: RingManager, correct_tree_flag: bool) -> bool:
    fixed = False
    for r in sort_rings_smallest_to_largest(manager):
        if correct_ring_self_intersections(manager, r, correct_tree_flag):
            fixed = True
    return fixed


def correct_topology(manager: RingManager):
    """topology_correction.hpp:1317-1343."""
    manager.all_points.sort(
        key=lambda p: (-p.y, p.x, -ring_depth(p.ring)))
    correct_orientations(manager)
    correct_collinear_edges(manager)
    correct_self_intersections(manager, False)
    correct_tree(manager)
    fixed = True
    while fixed:
        correct_chained_rings(manager)
        fixed = correct_self_intersections(manager, True)


# ---------------------------------------------------------------------------
# result assembly (build_result.hpp) + public API
# ---------------------------------------------------------------------------


def _ring_to_list(r: Ring, reverse_output=False) -> list:
    # build_result.hpp:13-31: walk prev pointers from the head; close
    # with the first point
    out = []
    first = r.points
    p = first
    if reverse_output:
        while True:
            out.append((p.x, p.y))
            p = p.next
            if p is first:
                break
    else:
        while True:
            out.append((p.x, p.y))
            p = p.prev
            if p is first:
                break
    out.append((first.x, first.y))
    return out


def _build_result_polygons(solution: list, rings: list, reverse_output: bool):
    for r in rings:
        if r is None:
            continue
        poly = [_ring_to_list(r, reverse_output)]
        for c in r.children:
            if c is None:
                continue
            poly.append(_ring_to_list(c, reverse_output))
        solution.append(poly)
        for c in r.children:
            if c is None:
                continue
            if any(gc is not None for gc in c.children):
                _build_result_polygons(solution, c.children, reverse_output)


class Wagyu:
    """wagyu.hpp:30-145 public driver (subject/clip rings -> multipolygon)."""

    def __init__(self):
        self.minima_list = []
        self.reverse_output = False

    def add_ring(self, ring_pts, p_type=PTYPE_SUBJECT) -> bool:
        return add_linear_ring(ring_pts, self.minima_list, p_type)

    def execute(self, cliptype, subject_fill, clip_fill):
        if not self.minima_list:
            return []
        manager = RingManager()
        build_hot_pixels(self.minima_list, manager)
        execute_vatti(self.minima_list, manager, cliptype, subject_fill, clip_fill)
        correct_topology(manager)
        solution = []
        _build_result_polygons(solution, manager.children, self.reverse_output)
        return solution


def union_multi(rings, try_scaling: bool = False):
    """clean_or_clip_poly clip.cpp:260-388 for the clip=False path:
    rings (each a list of int (x, y), >= 4 points including the closing
    duplicate as emitted by remove_noop runs) -> multipolygon as nested
    lists, positive-fill union, x16 scale retry. Returns a list of
    polygons, each a list of rings, each a list of (x, y) int tuples
    with the closing point repeated."""
    scale = 16 if try_scaling else 1
    while True:
        w = Wagyu()
        for ring in rings:
            if len(ring) >= 4:
                lr = [(x * scale, y * scale) for x, y in ring]
                w.add_ring(lr)
        result = w.execute(CLIP_UNION, FILL_POSITIVE, FILL_POSITIVE)
        if scale != 1:
            again = False
            for poly in result:
                for ring in poly:
                    for x, y in ring:
                        if x % scale or y % scale:
                            again = True
                            break
                    if again:
                        break
                if again:
                    break
            if again:
                scale = 1
                continue
        break
    if scale != 1:
        result = [
            [[(x // scale, y // scale) for x, y in ring] for ring in poly]
            for poly in result
        ]
    return result


def clean_rings(rings, try_scaling: bool = False):
    """decode_clipped (clip.cpp:230-258) flattening: union_multi then
    flatten to a list of rings with orientation sanity checks (outer
    ring area > 0, holes < 0 in the y-down shoelace used by the
    engine)."""
    result = union_multi(rings, try_scaling)
    out = []
    for poly in result:
        for j, ring in enumerate(poly):
            if ring and ring[-1] != ring[0]:
                ring = ring + [ring[0]]
            out.append(ring)
    return out
