"""-pn shared-node global pass.

Re-expresses the reference's vertex/node temp-file machinery
(serial.cpp:507-599 emission, main.cpp:2015-2169 sort/scan/dedup,
projection.cpp:221 encode_vertex) as a Ray Data pipeline:

  features ──map_batches──▶ vertex/node rows (mid, full coords, direct)
           ──groupby(mid).map_groups──▶ shared mids
           ──driver collect──▶ sorted uint64 array (broadcast ray.put)

A vertex row carries the central point of one consecutive coordinate
triple with its neighbor pair canonicalized (vertex struct ctor,
serial.hpp:279-299: neighbors sorted by the draw (y, x) order); a
point becomes a shared node when it appears with two or more DISTINCT
neighbor pairs anywhere in the dataset (the sorted-scan rule
main.cpp:2048-2066). `direct` rows are the unconditional nodes
(add_scaled_node, serial.cpp:405-413): every ring/line start, line
endpoints, and for polygons the two Douglas-Peucker anchor points
(furthest-from-start and furthest-from-that-line,
serial.cpp:553-592).

Coordinates ride FULL int64 through the distinctness scan — vertexcmp
compares long long draws, so lon=180 (x = 2^32) and lon=-180 (x = 0)
are different mids — and only the final node index truncates to
unsigned 32-bit per axis (encode_vertex((unsigned) x, (unsigned) y),
main.cpp:2060, serial.cpp:405-410). The `mid` group key is that
truncated index; colliding full mids land in one group and are
re-split inside the decider.

The final node set is the analogue of the reference's mmap'd sorted
node file + bloom filter (main.cpp:2075-2169): collected to the
driver (it is the deduplicated set of feature-boundary points, orders
of magnitude smaller than the input) and broadcast to encode tasks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import drawvec as dv

_NODE_SCHEMA = pa.schema(
    [
        ("mid", pa.uint64()),
        ("mx", pa.int64()),
        ("my", pa.int64()),
        ("p1x", pa.int64()),
        ("p1y", pa.int64()),
        ("p2x", pa.int64()),
        ("p2y", pa.int64()),
        ("direct", pa.uint8()),
    ]
)

_M32 = np.uint64(0xFFFFFFFF)


def _node_index(xy: np.ndarray) -> np.ndarray:
    """encode_vertex (projection.cpp:221) of the truncated coords:
    ((unsigned) x << 32) | (unsigned) y."""
    x = xy[:, 0].astype(np.int64).view(np.uint64) & _M32
    y = xy[:, 1].astype(np.int64).view(np.uint64) & _M32
    return (x << np.uint64(32)) | y


def _scan_min(d: np.ndarray, pts: np.ndarray, include0: bool) -> int:
    """The reference's sequential arg-scan: strictly-greater d wins,
    ties go to the draw-less ((y, x)-lex, geometry.hpp:46-52) point
    (serial.cpp:559-566, 578-589). `d` excludes the initial candidate
    (ring index 0); include0 adds it to the tie set when the running
    max never rises above 0."""
    if len(d) == 0:
        return 0
    dmax = float(d.max())
    cand = np.flatnonzero(d == dmax) + 1
    if dmax <= 0.0 and include0:
        cand = np.concatenate(([0], cand))
    cx = pts[cand, 0]
    cy = pts[cand, 1]
    best = np.lexsort((cand, cx, cy))[0]
    return int(cand[best])


def emit_vertex_rows(tbl: pa.Table) -> pa.Table:
    """map_batches kernel over ingested feature rows (world
    coordinates, geometry_scale=0 — forced by -pn, main.cpp:3764-3766):
    emits the vertex triples and unconditional nodes of every line /
    polygon feature (serial.cpp:507-599). remove_noop has already been
    applied at ingest (serial.cpp:507-508)."""
    mxs: list[np.ndarray] = []
    mys: list[np.ndarray] = []
    p1s: list[np.ndarray] = []
    p2s: list[np.ndarray] = []
    dd: list[np.ndarray] = []

    def _triples(mid: np.ndarray, p1: np.ndarray, p2: np.ndarray):
        # canonicalize neighbors by (y, x) draw order (serial.hpp:283-293)
        swap = (p2[:, 1] < p1[:, 1]) | (
            (p2[:, 1] == p1[:, 1]) & (p2[:, 0] < p1[:, 0])
        )
        a = np.where(swap[:, None], p2, p1)
        b = np.where(swap[:, None], p1, p2)
        mxs.append(mid[:, 0])
        mys.append(mid[:, 1])
        p1s.append(a)
        p2s.append(b)
        dd.append(np.zeros(len(mid), np.uint8))

    def _direct(pts: np.ndarray):
        pts = pts.reshape(-1, 2)
        mxs.append(pts[:, 0])
        mys.append(pts[:, 1])
        z = np.zeros((len(pts), 2), np.int64)
        p1s.append(z)
        p2s.append(z)
        dd.append(np.ones(len(pts), np.uint8))

    ts = tbl["t"].to_numpy(zero_copy_only=False)
    ops_col = tbl["ops"].to_pylist()
    xy_col = tbl["xy"].to_pylist()
    for fi in range(len(tbl)):
        t = int(ts[fi])
        if t not in (2, 3):
            continue
        ops = np.frombuffer(ops_col[fi], dtype=np.uint8)
        xy = np.frombuffer(xy_col[fi], dtype=np.int64).reshape(-1, 2)
        for i, j in dv.rings(ops):
            seg = j - i
            if t == 3 and seg >= 4:
                r = xy[i:j - 1]  # drop the duplicate closing point
                _triples(np.roll(r, -1, axis=0), r, np.roll(r, -2, axis=0))
            elif t == 2 and seg >= 3:
                _triples(xy[i + 1:j - 1], xy[i:j - 2], xy[i + 2:j])
            # unconditional nodes (serial.cpp:547-592)
            _direct(xy[i])
            if t == 2 and seg >= 2:
                _direct(xy[j - 1])
            elif t == 3 and seg >= 4:
                r = xy[i:j - 1]
                dx = (r[1:, 0] - r[0, 0]).astype(np.float64)
                dy = (r[1:, 1] - r[0, 1]).astype(np.float64)
                d = dx * dx + dy * dy
                which = _scan_min(d, r, include0=True)
                _direct(r[which])
                d2 = np.abs(dv._dfl_vec(
                    r[1:, 0], r[1:, 1],
                    int(r[0, 0]), int(r[0, 1]),
                    int(r[which, 0]), int(r[which, 1]),
                ))
                which2 = _scan_min(d2, r, include0=True)
                _direct(r[which2])
    if not mxs:
        return _NODE_SCHEMA.empty_table()
    mx = np.concatenate(mxs)
    my = np.concatenate(mys)
    p1 = np.concatenate(p1s)
    p2 = np.concatenate(p2s)
    mid = _node_index(np.stack([mx, my], axis=1))
    return pa.table(
        {
            "mid": pa.array(mid, pa.uint64()),
            "mx": pa.array(mx, pa.int64()),
            "my": pa.array(my, pa.int64()),
            "p1x": pa.array(p1[:, 0], pa.int64()),
            "p1y": pa.array(p1[:, 1], pa.int64()),
            "p2x": pa.array(p2[:, 0], pa.int64()),
            "p2y": pa.array(p2[:, 1], pa.int64()),
            "direct": pa.array(np.concatenate(dd), pa.uint8()),
        }
    )


def _cols(tbl: pa.Table):
    return tuple(
        tbl[c].to_numpy(zero_copy_only=False)
        for c in ("mx", "my", "p1x", "p1y", "p2x", "p2y", "direct")
    )


def _dedup_rows(tbl: pa.Table) -> pa.Table:
    """Per-batch pre-shrink: duplicate rows carry no information for
    the distinct-pair rule."""
    if len(tbl) == 0:
        return tbl
    arrs = _cols(tbl)
    order = np.lexsort(arrs[::-1])
    srt = [a[order] for a in arrs]
    keep = np.ones(len(order), bool)
    diff = np.zeros(len(order) - 1, bool)
    for a in srt:
        diff |= a[1:] != a[:-1]
    keep[1:] = diff
    return tbl.take(pa.array(order[keep]))


def _shared_indexes(arrs) -> np.ndarray:
    """Distinctness scan over (deduplicated) rows sharing one
    truncated-index group; full coords decide, the truncated index is
    emitted (main.cpp:2048-2066 + 2133-2146)."""
    mx, my, p1x, p1y, p2x, p2y, direct = arrs
    out = []
    pts = np.stack([mx, my], axis=1)
    idx = _node_index(pts)
    if direct.any():
        out.append(np.unique(idx[direct == 1]))
    nd = direct == 0
    if nd.any():
        cols = [mx[nd], my[nd], p1x[nd], p1y[nd], p2x[nd], p2y[nd]]
        order = np.lexsort(cols[::-1])
        s = [c[order] for c in cols]
        same_mid = (s[0][1:] == s[0][:-1]) & (s[1][1:] == s[1][:-1])
        diff_pair = (
            (s[2][1:] != s[2][:-1]) | (s[3][1:] != s[3][:-1])
            | (s[4][1:] != s[4][:-1]) | (s[5][1:] != s[5][:-1])
        )
        hit = same_mid & diff_pair
        if hit.any():
            hx = s[0][1:][hit]
            hy = s[1][1:][hit]
            out.append(np.unique(_node_index(np.stack([hx, hy], axis=1))))
    if not out:
        return np.array([], np.uint64)
    return np.unique(np.concatenate(out))


def _decide_group(grp: pa.Table) -> pa.Table:
    shared = _shared_indexes(_cols(grp))
    return pa.table({"node": pa.array(shared, pa.uint64())})


def shared_nodes_global(feats) -> np.ndarray:
    """Full -pn global pass over an ingested feature Dataset (or a
    pa.Table for driver-side tests). Returns the sorted uint64 node
    index array ((x << 32) | y truncated world keys) for broadcast."""
    import ray
    import ray.data

    if isinstance(feats, pa.Table):
        rows = _dedup_rows(emit_vertex_rows(feats))
        if len(rows) == 0:
            return np.array([], np.uint64)
        return np.sort(_shared_indexes(_cols(rows)))
    rows = feats.map_batches(
        lambda t: _dedup_rows(emit_vertex_rows(t)), batch_format="pyarrow"
    )
    nodes = rows.groupby("mid").map_groups(_decide_group, batch_format="pyarrow")
    parts = [
        t["node"].to_numpy(zero_copy_only=False)
        for t in ray.get(nodes.to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return np.array([], np.uint64)
    return np.unique(np.concatenate(parts).astype(np.uint64))
