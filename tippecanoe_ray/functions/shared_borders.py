"""--detect-shared-borders (-ab): TopoJSON-style arc decomposition so
polygons that share a border simplify that border identically.

Behavioral re-implementation of the reference's find_common_edges
(shared_borders.cpp:86-575).  The upstream callsite passes
merge_fraction == 1 unconditionally (tile.cpp:1666,2464), so
merge_count == 0 and the adjacent-polygon merging block
(shared_borders.cpp:366-526) never executes; only the arc rewrite
survives.  The pass runs once per tile over EVERY polygon feature
(across layers — the ring counter is global, shared_borders.cpp:113),
after the read loop and before the per-feature simplification workers
(tile.cpp:2463-2465); polygons then skip individual simplification
("already_marked", tile.cpp:626-629).

Stages, matching the reference exactly:
  1. drop consecutive duplicate LINETO points (comparisons on the
     ORIGINAL adjacency, shared_borders.cpp:89-106);
  2. build the edge->rings multimap: edges normalized by draw
     operator< (y then x, SIGNED), stored as unsigned-wrapped 32-bit
     coords and sorted (y1,x1,y2,x2,ring) (shared_borders.cpp:20-67,
     112-139);
  3. mark a point "necessary" when the sorted ring-id list of its
     incoming edge differs from its outgoing edge's
     (shared_borders.cpp:145-217), then propagate necessity to every
     point anywhere with the same coordinates (the std::set<draw>
     "necessaries", keyed on coords only, :140,:230-234);
  4. rotate each ring to start at its LAST necessary point (or its
     lowest point by draw< if none, :236-289);
  5. peel arcs between consecutive necessary points, deduplicated
     globally forward/reverse (ids 1..N in discovery order, reversed
     use as -id; the trailing duplicate endpoint yields a harmless
     one-point arc that emits nothing but consumes an id, :291-339);
  6. simplify each arc once (retain=4, tx=ty=0, no shared nodes,
     :341-364) unless simplification is disabled for this zoom;
  7. reassemble each polygon from its arc list, each ring closed by
     re-appending its first emitted point (:528-568).
"""

from __future__ import annotations

import numpy as np

from . import drawvec as dv

_U32 = np.uint64(0xFFFFFFFF)


def _pack_signed(xy: np.ndarray) -> np.ndarray:
    """(x, y) -> complex128 key for coordinate-equality sets.
    Exact for |coord| < 2^53 (coords here are <= 2^32 + buffer)."""
    return xy[:, 0].astype(np.float64) + 1j * xy[:, 1].astype(np.float64)


def _edge_keys(a: np.ndarray, b: np.ndarray):
    """Normalize edges a->b by draw operator< (y then x, signed:
    shared_borders.cpp:124-130), then pack each endpoint as the
    reference's unsigned 32-bit edge fields ((y << 32) | x) so the
    equal_range comparisons ((long long) on unsigned members,
    shared_borders.cpp:35-47) order identically."""
    swap = (b[:, 1] < a[:, 1]) | ((b[:, 1] == a[:, 1]) & (b[:, 0] < a[:, 0]))
    p1 = np.where(swap[:, None], b, a)
    p2 = np.where(swap[:, None], a, b)

    def pack_u(p):
        x = p[:, 0].astype(np.int64).view(np.uint64) & _U32
        y = p[:, 1].astype(np.int64).view(np.uint64) & _U32
        return (y << np.uint64(32)) | x

    return pack_u(p1), pack_u(p2)


def find_common_edges(geoms, z, line_detail, simplification,
                      skip_simplify, mark_bounds,
                      use_visvalingam=False, pn=False):
    """Rewrite every polygon of a tile as shared simplified arcs.

    geoms: list of (ops, xy) for the tile's VT_POLYGON features in
    stream order (world coordinates).  Returns the rewritten list.
    """
    # -- stage 1: drop consecutive duplicate LINETOs -------------------
    cleaned = []
    for ops, xy in geoms:
        if len(ops) > 1:
            keep = np.ones(len(ops), bool)
            same = (xy[1:] == xy[:-1]).all(axis=1)
            keep[1:] = ~((ops[1:] == dv.LINETO) & same)
            ops, xy = ops[keep], xy[keep].copy()
        cleaned.append((ops, xy))

    # -- stage 2: edge -> sorted ring-id signature ---------------------
    ring_base = 0
    k1s, k2s, rids = [], [], []
    pos_slices = []  # (feature idx, per-position valid mask offset)
    for ops, xy in cleaned:
        n = len(ops)
        if n < 2:
            pos_slices.append(None)
            continue
        # ring id at position k = MOVETOs in ops[0..k] + base
        # (ring++ fires at the MOVETO before the edge is emitted,
        # shared_borders.cpp:118-120; the loop stops at k+1 < n)
        ring_ids = ring_base + np.cumsum(ops == dv.MOVETO)
        mask = ops[1:] == dv.LINETO
        a = xy[:-1][mask]
        b = xy[1:][mask]
        k1, k2 = _edge_keys(a, b)
        k1s.append(k1)
        k2s.append(k2)
        rids.append(ring_ids[:-1][mask].astype(np.int64))
        pos_slices.append(mask)
        ring_base += int((ops[:-1] == dv.MOVETO).sum())

    if not k1s:
        return [(o, x) for o, x in cleaned]

    all_k1 = np.concatenate(k1s)
    all_k2 = np.concatenate(k2s)
    all_r = np.concatenate(rids)
    keys = np.empty(len(all_k1), dtype=[("a", "u8"), ("b", "u8")])
    keys["a"] = all_k1
    keys["b"] = all_k2
    uniq, inv = np.unique(keys, return_inverse=True)
    # ring signature per unique edge key (stable sort by ring ==
    # sorted ascending ring list, shared_borders.cpp:50-67,139)
    order = np.lexsort((all_r, inv))
    sig_of_uniq = np.empty(len(uniq), dtype=np.int64)
    sig_ids: dict = {}
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    for u in range(len(uniq)):
        sig = all_r[order[bounds[u]:bounds[u + 1]]].tobytes()
        sid = sig_ids.setdefault(sig, len(sig_ids))
        sig_of_uniq[u] = sid
    egid = sig_of_uniq[inv]  # per-edge ring-signature id

    # -- stage 3: necessary marking ------------------------------------
    necs = []  # per-feature bool arrays
    nec_keys = []  # coords of marked points (the std::set<draw>)
    off = 0
    for fi, (ops, xy) in enumerate(cleaned):
        n = len(ops)
        nec = np.zeros(n, bool)
        mask = pos_slices[fi]
        if mask is not None:
            cnt = int(mask.sum())
            gid_pos = np.full(n - 1, -1, np.int64)
            gid_pos[mask] = egid[off:off + cnt]
            off += cnt
            for a, b in dv.rings(ops):
                s = b - a - 1
                if s <= 0:
                    continue
                rg = gid_pos[a:a + s]
                flags = rg != np.roll(rg, 1)
                nec[a:a + s] |= flags
                if flags.any():
                    nec_keys.append(_pack_signed(xy[a:a + s][flags]))
        necs.append(nec)

    if nec_keys:
        nec_set = np.unique(np.concatenate(nec_keys))
        for fi, (ops, xy) in enumerate(cleaned):
            if len(ops):
                necs[fi] |= np.isin(_pack_signed(xy), nec_set)

    # -- stages 4+5: rotate rings, peel + dedup arcs --------------------
    arcs: dict = {}  # arc coord bytes -> id (1-based, discovery order)
    arc_pts: list = [None]  # id -> points array
    arc_polys: list = []  # per feature: list of signed arc ids + 0s
    for fi, (ops, xy) in enumerate(cleaned):
        nec = necs[fi]
        arc_polygon: list = []
        for a, b in dv.rings(ops):
            # rotation scan (shared_borders.cpp:238-259): LAST
            # necessary in (a, b); lowest by signed (y, x), first
            # occurrence, seeded at the MOVETO
            necessary = -1
            lowest = a
            for l in range(a + 1, b):
                if nec[l]:
                    necessary = l
                if (xy[l, 1] < xy[lowest, 1]
                        or (xy[l, 1] == xy[lowest, 1]
                            and xy[l, 0] < xy[lowest, 0])):
                    lowest = l
            if necessary < 0:
                necessary = lowest
                nec[lowest] = True
            idx = (list(range(necessary, b - 1))
                   + list(range(a, necessary)) + [necessary])
            xy[a:b] = xy[idx]
            nec_r = nec[idx]
            nec[a:b] = nec_r

            # arc peel (shared_borders.cpp:291-330)
            m = a
            while m < b:
                n = m
                start = m
                while n < b:
                    if n > m and nec[n]:
                        break
                    n += 1
                end = min(n + 1, b)  # inclusive of the break point
                pts = xy[start:end]
                key = pts.tobytes()
                aid = arcs.get(key)
                if aid is None:
                    rkey = pts[::-1].tobytes()
                    raid = arcs.get(rkey)
                    if raid is None:
                        aid = len(arcs) + 1
                        arcs[key] = aid
                        arc_pts.append(pts.copy())
                    else:
                        aid = -raid
                arc_polygon.append(aid)
                m = n
            arc_polygon.append(0)
        arc_polys.append(arc_polygon)

    # -- stage 6: simplify each arc -------------------------------------
    simplified: list = [None]
    for pts in arc_pts[1:]:
        if skip_simplify or len(pts) < 2:
            simplified.append(pts)
            continue
        ops_a = np.full(len(pts), dv.LINETO, np.uint8)
        ops_a[0] = dv.MOVETO
        # shared_borders.cpp:360 calls the full simplify_lines with
        # EMPTY node lists, but the global -pn flag still reaches
        # douglas_peucker, where it burns `retain` for each pre-marked
        # point (clip.cpp:924-928) — so the flag must pass through
        # even though no nodes are looked up here
        _, sxy = dv.simplify_lines(
            ops_a, pts, z, line_detail, mark_bounds,
            simplification, 4, pn=pn,
            use_visvalingam=use_visvalingam,
        )
        simplified.append(sxy)

    # -- stage 7: reassemble ---------------------------------------------
    out = []
    for fi, (ops, xy) in enumerate(cleaned):
        chunks_xy: list = []
        chunks_ops: list = []
        first_pt = None
        at_start = True
        for p in arc_polys[fi]:
            if p == 0:
                if first_pt is not None:
                    chunks_ops.append(np.array([dv.LINETO], np.uint8))
                    chunks_xy.append(first_pt.reshape(1, 2))
                    first_pt = None
                at_start = True
                continue
            # forward: indices 0..len-2; reverse: len-1..1
            if p > 0:
                seg = simplified[p][:-1]
            else:
                seg = simplified[-p][:0:-1]
            if len(seg) == 0:
                continue
            o = np.full(len(seg), dv.LINETO, np.uint8)
            if at_start:
                o[0] = dv.MOVETO
                first_pt = seg[0]
            chunks_ops.append(o)
            chunks_xy.append(seg)
            at_start = False
        if chunks_ops:
            out.append((np.concatenate(chunks_ops),
                        np.ascontiguousarray(
                            np.concatenate(chunks_xy), dtype=np.int64)))
        else:
            out.append(dv.empty_geom())
    return out
