"""Vectorized assembly of point MVT tiles for a whole bucket at once.

The engine's hot path: a zoom-B bucket holds every feature of its
subtree, sorted by (index, seq); a zoom-z tile (z ≥ B) is a contiguous
index range because the tile key is a prefix of the quadkey index. This
module encodes ALL tiles of a bucket at one zoom with numpy buffer
fills — per-feature protobuf bytes are laid out via cumsum offsets, per
tile assembly is two slices — no per-feature Python.

Wire layout per feature (no id/attrs fast path):
  [0x12][body_len][0x18][type=1][0x22][geom_len][cmd=9][zz(x)][zz(y)]
with zigzag varints ≤ 3 bytes for tile-local coordinates (extent 4096 +
buffer). Reference semantics: tile.cpp:2614-2684 (encoding), tile-local
rebase tile.cpp:443-483.
"""

from __future__ import annotations

import zlib

import numpy as np

from .mvt import DEFAULT_EXTENT, _len_delim, _tag_varint

WORLD_BITS = 32


def _varint_lens(v: np.ndarray) -> np.ndarray:
    """Byte length of LEB128 for values < 2^21 (1..3 bytes)."""
    return np.where(v < 128, 1, np.where(v < 1 << 14, 2, 3)).astype(np.int64)


def _fill_varints(buf: np.ndarray, offs: np.ndarray, v: np.ndarray, lens: np.ndarray):
    """Write ≤3-byte varints of v at byte offsets offs into buf."""
    b0 = (v & 0x7F).astype(np.uint8)
    m2 = lens >= 2
    buf[offs[m2]] = b0[m2] | 0x80
    buf[offs[~m2]] = b0[~m2]
    if m2.any():
        v2 = (v[m2] >> 7) & 0x7F
        l3 = lens[m2] >= 3
        o2 = offs[m2] + 1
        buf[o2[l3]] = (v2[l3] | 0x80).astype(np.uint8)
        buf[o2[~l3]] = v2[~l3].astype(np.uint8)
        if l3.any():
            buf[o2[l3] + 1] = ((v[m2][l3] >> 14) & 0x7F).astype(np.uint8)


def _scatter_varints(buf: np.ndarray, offs: np.ndarray, blob: bytes, lens: np.ndarray):
    """Scatter concatenated varints (blob, one per feature with byte
    lengths `lens`) to per-feature offsets `offs`."""
    total = int(lens.sum())
    if total == 0:
        return
    cum = np.cumsum(lens) - lens
    pos = np.repeat(offs, lens) + (np.arange(total) - np.repeat(cum, lens))
    buf[pos] = np.frombuffer(blob, dtype=np.uint8)


def _varint_lens_any(v: np.ndarray) -> np.ndarray:
    lens = np.ones(len(v), dtype=np.int64)
    tmp = np.asarray(v, dtype=np.uint64).copy()
    while True:
        tmp = tmp >> np.uint64(7)
        more = tmp != 0
        if not more.any():
            break
        lens += more
    return lens


def encode_point_features(
    local_x: np.ndarray, local_y: np.ndarray, ids: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Encode n point features into one uint8 buffer, optionally with
    per-feature ids (MVT Feature.id, field 1).

    Returns (buffer, per-feature byte lengths); feature f occupies
    [cum[f-1], cum[f]) of the buffer.
    """
    from .mvt import varint_array

    lx = np.asarray(local_x, dtype=np.int64)
    ly = np.asarray(local_y, dtype=np.int64)
    zx = ((lx << 1) ^ (lx >> 63)).astype(np.int64)
    zy = ((ly << 1) ^ (ly >> 63)).astype(np.int64)
    lzx = _varint_lens(zx)
    lzy = _varint_lens(zy)
    glen = 1 + lzx + lzy  # cmd byte + coords
    n = len(lx)
    if ids is None:
        body = 4 + glen  # 0x18 0x01 0x22 glen-varint(1B: glen<=7) + geom
        total = 2 + body  # 0x12 bodylen(1B: body<=11)
        ends = np.cumsum(total)
        starts = ends - total
        buf = np.empty(int(ends[-1]) if n else 0, dtype=np.uint8)
        buf[starts] = 0x12
        buf[starts + 1] = body.astype(np.uint8)
        base = starts + 2
    else:
        idv = np.asarray(ids, dtype=np.uint64)
        id_lens = _varint_lens_any(idv)
        id_blob = varint_array(idv)
        body = 1 + id_lens + 4 + glen  # 0x08 id … ≤ 22 < 128 ⇒ 1-byte len
        total = 2 + body
        ends = np.cumsum(total)
        starts = ends - total
        buf = np.empty(int(ends[-1]) if n else 0, dtype=np.uint8)
        buf[starts] = 0x12
        buf[starts + 1] = body.astype(np.uint8)
        buf[starts + 2] = 0x08
        _scatter_varints(buf, starts + 3, id_blob, id_lens)
        base = starts + 3 + id_lens
    buf[base] = 0x18
    buf[base + 1] = 0x01
    buf[base + 2] = 0x22
    buf[base + 3] = glen.astype(np.uint8)
    buf[base + 4] = 0x09
    _fill_varints(buf, base + 5, zx, lzx)
    _fill_varints(buf, base + 5 + lzx, zy, lzy)
    return buf, total


def layer_wrap(feature_bytes: bytes, name: str, extent: int = DEFAULT_EXTENT) -> bytes:
    header = _tag_varint(15, 2) + _len_delim(1, name.encode("utf-8"))
    layer = header + feature_bytes + _tag_varint(5, extent)
    return _len_delim(3, layer)


def encode_point_tiles(
    wx: np.ndarray,
    wy: np.ndarray,
    run_starts: np.ndarray,
    run_ends: np.ndarray,
    tx: np.ndarray,
    ty: np.ndarray,
    z: int,
    layer_name: str = "points",
    detail: int = 12,
    compress: bool = True,
    ids: np.ndarray | None = None,
) -> list[bytes]:
    """Encode one MVT per tile run.

    wx/wy: world coords of KEPT features (sorted by index so each tile's
    features are the contiguous run [run_starts[t], run_ends[t])).
    tx/ty: per-run tile keys. Tile-local coords are rebased by
    subtracting tx << (32-z) then scaled to the 2^detail extent
    (tile.cpp:443-483; extent 2^detail, mvt.hpp default detail 12).
    """
    extent = 1 << detail
    shift = WORLD_BITS - z - detail  # world units per extent unit, log2
    n_runs = len(run_starts)
    out: list[bytes] = []
    if len(wx) == 0 or n_runs == 0:
        return [b""] * n_runs
    # gather features covered by the runs (runs need not tile the whole
    # array — the hybrid boundary path encodes run subsets)
    run_starts = np.asarray(run_starts, dtype=np.int64)
    run_ends = np.asarray(run_ends, dtype=np.int64)
    lengths = run_ends - run_starts
    total = int(lengths.sum())
    run_of = np.repeat(np.arange(n_runs), lengths)
    off = np.repeat(np.cumsum(lengths) - lengths, lengths)
    sel = np.repeat(run_starts, lengths) + (np.arange(total) - off)
    wx = np.asarray(wx, dtype=np.int64)[sel]
    wy = np.asarray(wy, dtype=np.int64)[sel]
    if ids is not None:
        ids = np.asarray(ids, dtype=np.int64)[sel]
    span_shift = WORLD_BITS - z
    ox = tx[run_of].astype(np.int64) << span_shift
    oy = ty[run_of].astype(np.int64) << span_shift
    if shift >= 0:
        lx = (wx - ox) >> shift
        ly = (wy - oy) >> shift
    else:
        lx = (wx - ox) << -shift
        ly = (wy - oy) << -shift
    buf, per_feat = encode_point_features(lx, ly, ids=ids)
    fe = np.cumsum(per_feat)
    fs = fe - per_feat
    gends = np.cumsum(lengths)
    gstarts = gends - lengths
    header = _tag_varint(15, 2) + _len_delim(1, layer_name.encode("utf-8"))
    trailer = _tag_varint(5, extent)
    # ---- vectorized tile assembly: every tile's uncompressed bytes are
    # [0x1A][varint body_len][header][feature run][trailer]; lay all of
    # them out in ONE buffer via cumsum offsets, then slice per tile (no
    # per-tile varint/concat Python).
    hl, tl = len(header), len(trailer)
    nonempty = lengths > 0
    ne_idx = np.flatnonzero(nonempty)
    feat_bytes = np.zeros(n_runs, dtype=np.int64)
    feat_bytes[ne_idx] = fe[gends[ne_idx] - 1] - fs[gstarts[ne_idx]]
    body_len = np.where(nonempty, hl + tl + feat_bytes, 0)
    env_len = 1 + _varint_lens_any(body_len)
    tile_len = np.where(nonempty, env_len + body_len, 0)
    t_ends = np.cumsum(tile_len)
    t_starts = t_ends - tile_len
    big = np.empty(int(t_ends[-1]), dtype=np.uint8)
    ne = ne_idx
    if len(ne):
        from .mvt import varint_array

        big[t_starts[ne]] = 0x1A
        _scatter_varints(big, t_starts[ne] + 1, varint_array(body_len[ne].astype(np.uint64)), env_len[ne] - 1)
        h_arr = np.frombuffer(header, dtype=np.uint8)
        t_arr = np.frombuffer(trailer, dtype=np.uint8)
        big[(t_starts[ne] + env_len[ne])[:, None] + np.arange(hl)] = h_arr
        big[(t_ends[ne] - tl)[:, None] + np.arange(tl)] = t_arr
        # feature runs: one gather from the feature buffer
        fb = feat_bytes[ne]
        dst0 = np.repeat(t_starts[ne] + env_len[ne] + hl, fb)
        src0 = np.repeat(fs[gstarts[ne]], fb)
        local = np.arange(int(fb.sum())) - np.repeat(np.cumsum(fb) - fb, fb)
        big[dst0 + local] = buf[src0 + local]
    if not compress:
        mv = memoryview(big.tobytes())
        for t in range(n_runs):
            out.append(bytes(mv[t_starts[t]:t_ends[t]]))
        return out
    # ---- compression. Tiny tiles (the overwhelming majority of a z14
    # pyramid) gain nothing from deflate (a 1-point tile is ~45 B of
    # near-random varints) but pay ~4 µs of deflateInit each. Emit them
    # as gzip with a single STORED deflate block — still valid gzip for
    # every reader, assembled fully vectorized; only crc32 is a (cheap)
    # per-tile C call. Bigger tiles use a size-adaptive deflate window
    # (state init dominates below ~2 KB).
    STORED_MAX = 80
    small = nonempty & (tile_len <= STORED_MAX)
    sm = np.flatnonzero(small)
    if len(sm):
        rl = tile_len[sm]
        gl = rl + 23  # 10B header + 5B stored-block intro + data + 8B trailer
        g_ends = np.cumsum(gl)
        g_starts = g_ends - gl
        gz = np.empty(int(g_ends[-1]), dtype=np.uint8)
        hdr = np.array([0x1F, 0x8B, 8, 0, 0, 0, 0, 0, 0, 3], dtype=np.uint8)
        gz[g_starts[:, None] + np.arange(10)] = hdr
        gz[g_starts + 10] = 1  # BFINAL=1, BTYPE=00 (stored)
        gz[g_starts + 11] = (rl & 0xFF).astype(np.uint8)
        gz[g_starts + 12] = (rl >> 8).astype(np.uint8)
        gz[g_starts + 13] = (~rl & 0xFF).astype(np.uint8)
        gz[g_starts + 14] = ((~rl >> 8) & 0xFF).astype(np.uint8)
        dst = np.repeat(g_starts + 15, rl)
        src = np.repeat(t_starts[sm], rl)
        loc = np.arange(int(rl.sum())) - np.repeat(np.cumsum(rl) - rl, rl)
        gz[dst + loc] = big[src + loc]
        bigb = big.tobytes()
        bmv = memoryview(bigb)
        crc = np.fromiter(
            (zlib.crc32(bmv[a:bb]) for a, bb in zip(t_starts[sm].tolist(), t_ends[sm].tolist())),
            dtype=np.uint64, count=len(sm),
        )
        tr = g_ends - 8
        gz[tr] = (crc & 0xFF).astype(np.uint8)
        gz[tr + 1] = ((crc >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint8)
        gz[tr + 2] = ((crc >> np.uint64(16)) & np.uint64(0xFF)).astype(np.uint8)
        gz[tr + 3] = ((crc >> np.uint64(24)) & np.uint64(0xFF)).astype(np.uint8)
        gz[tr + 4] = (rl & 0xFF).astype(np.uint8)
        gz[tr + 5] = (rl >> 8).astype(np.uint8)
        gz[tr + 6] = np.uint8(0)
        gz[tr + 7] = np.uint8(0)
        gmv = memoryview(gz.tobytes())
    small_pos = np.full(n_runs, -1, dtype=np.int64)
    if len(sm):
        small_pos[sm] = np.arange(len(sm))
        gs_l = g_starts.tolist()
        ge_l = g_ends.tolist()
    sp_l = small_pos.tolist()
    mv = memoryview(big.tobytes())
    _cobj = zlib.compressobj
    _DEFL = zlib.DEFLATED
    _MAXW = 16 + zlib.MAX_WBITS
    ts_l = t_starts.tolist()
    te_l = t_ends.tolist()
    for t, (a, b) in enumerate(zip(ts_l, te_l)):
        if a == b:
            out.append(b"")
            continue
        sp = sp_l[t]
        if sp >= 0:
            out.append(bytes(gmv[gs_l[sp]:ge_l[sp]]))
            continue
        raw = bytes(mv[a:b])
        n_ = b - a
        if n_ <= 512:
            co = _cobj(6, _DEFL, 25, 2)
        elif n_ <= 2048:
            co = _cobj(6, _DEFL, 27, 4)
        else:
            co = _cobj(6, _DEFL, _MAXW)
        out.append(co.compress(raw) + co.flush())
    return out


def encode_point_tiles_attrs(
    wx: np.ndarray,
    wy: np.ndarray,
    run_starts: np.ndarray,
    run_ends: np.ndarray,
    tx: np.ndarray,
    ty: np.ndarray,
    z: int,
    layer_name: str = "points",
    detail: int = 12,
    compress: bool = True,
    attr_name: str | None = None,
    attr_vals: np.ndarray | None = None,
    cluster_counts: np.ndarray | None = None,
    cluster_stats: bool = False,
    density: np.ndarray | None = None,
    mult_first: np.ndarray | None = None,
    mult_seq: np.ndarray | None = None,
    ids: np.ndarray | None = None,
) -> list[bytes]:
    """Attribute-carrying (slow-path) sibling of encode_point_tiles:
    per-feature accumulate-attribute values (attribute.cpp:92-180
    folds, already applied upstream) and -K cluster stats
    (clustered/point_count/sqrt_point_count/point_count_abbreviated,
    tile.cpp:2420-2451)."""
    import math as _math

    from .mvt import encode_layer, encode_tile, varint_array, zigzag

    extent = 1 << detail
    shift = WORLD_BITS - z - detail
    span_shift = WORLD_BITS - z
    out: list[bytes] = []
    for t in range(len(run_starts)):
        a, b = int(run_starts[t]), int(run_ends[t])
        if a == b:
            out.append(b"")
            continue
        ox = int(tx[t]) << span_shift
        oy = int(ty[t]) << span_shift
        feats = []
        for i in range(a, b):
            lx = int(wx[i]) - ox
            ly = int(wy[i]) - oy
            if shift >= 0:
                lx >>= shift
                ly >>= shift
            else:
                lx <<= -shift
                ly <<= -shift
            geom = varint_array(
                np.array(
                    [(1 << 3) | 1,
                     int(zigzag(np.array([lx]))[0]),
                     int(zigzag(np.array([ly]))[0])],
                    dtype=np.uint64,
                )
            )
            attrs = {}
            if attr_name is not None and attr_vals is not None:
                attrs[attr_name] = float(attr_vals[i])
            if cluster_stats and cluster_counts is not None and cluster_counts[i] > 1:
                pc = int(cluster_counts[i])
                attrs["clustered"] = True
                attrs["point_count"] = float(pc)
                attrs["sqrt_point_count"] = round(100 * _math.sqrt(pc)) / 100.0
                if pc >= 10000:
                    attrs["point_count_abbreviated"] = f"{pc / 1000.0:.0f}k"
                elif pc >= 1000:
                    attrs["point_count_abbreviated"] = f"{pc / 1000.0:.1f}k"
                else:
                    attrs["point_count_abbreviated"] = str(pc)
            if density is not None:
                attrs["tippecanoe_feature_density"] = int(density[i])
            if mult_first is not None and mult_first[i]:
                attrs["tippecanoe:retain_points_multiplier_first"] = True
            if mult_seq is not None:
                attrs["tippecanoe:retain_points_multiplier_sequence"] = float(mult_seq[i])
            f = {"geom": geom, "type": 1, "attrs": attrs}
            if ids is not None:
                f["id"] = int(ids[i])
            feats.append(f)
        layer = encode_layer(layer_name, feats, extent)
        out.append(encode_tile([layer], compress=compress))
    return out


def encode_multipoint(local_xy: np.ndarray) -> bytes:
    """MVT multipoint geometry: one MoveTo with count n, successive
    zigzag deltas."""
    from .mvt import varint_array

    pts = np.asarray(local_xy, dtype=np.int64).reshape(-1, 2)
    n = len(pts)
    dx = np.diff(np.concatenate(([0], pts[:, 0])))
    dy = np.diff(np.concatenate(([0], pts[:, 1])))
    zz = np.empty(2 * n, dtype=np.int64)
    zz[0::2] = (dx << 1) ^ (dx >> 63)
    zz[1::2] = (dy << 1) ^ (dy >> 63)
    vals = np.concatenate(([np.int64((n << 3) | 1)], zz)).astype(np.uint64)
    return varint_array(vals)


def encode_point_tiles_coalesced(
    wx: np.ndarray,
    wy: np.ndarray,
    run_starts: np.ndarray,
    run_ends: np.ndarray,
    tx: np.ndarray,
    ty: np.ndarray,
    z: int,
    layer_name: str = "points",
    detail: int = 12,
    compress: bool = True,
    attr_name: str | None = None,
    attr_vals: np.ndarray | None = None,
) -> tuple[list[bytes], np.ndarray]:
    """-ac coalesce (tile.cpp:2524-2546): consecutive features with
    identical attributes merge into one multipoint feature (the first
    feature's attrs win). Returns (tiles, post-coalesce counts)."""
    from .mvt import encode_layer, encode_tile

    extent = 1 << detail
    shift = WORLD_BITS - z - detail
    span_shift = WORLD_BITS - z
    out: list[bytes] = []
    counts = np.zeros(len(run_starts), dtype=np.int64)
    for t in range(len(run_starts)):
        a, b = int(run_starts[t]), int(run_ends[t])
        if a == b:
            out.append(b"")
            continue
        ox = int(tx[t]) << span_shift
        oy = int(ty[t]) << span_shift
        lx = (np.asarray(wx[a:b], dtype=np.int64) - ox)
        ly = (np.asarray(wy[a:b], dtype=np.int64) - oy)
        if shift >= 0:
            lx >>= shift
            ly >>= shift
        else:
            lx <<= -shift
            ly <<= -shift
        vals = attr_vals[a:b] if attr_vals is not None else None
        # group consecutive equal-attribute features
        if vals is None:
            bounds = [0, b - a]
        else:
            cuts = np.flatnonzero(vals[1:] != vals[:-1]) + 1
            bounds = [0] + cuts.tolist() + [b - a]
        feats = []
        for gi in range(len(bounds) - 1):
            s0, e0 = bounds[gi], bounds[gi + 1]
            pts = np.stack([lx[s0:e0], ly[s0:e0]], axis=1)
            attrs = {}
            if attr_name is not None and vals is not None:
                attrs[attr_name] = float(vals[s0])
            feats.append({"geom": encode_multipoint(pts), "type": 1, "attrs": attrs})
        counts[t] = len(feats)
        layer = encode_layer(layer_name, feats, extent)
        out.append(encode_tile([layer], compress=compress))
    return out, counts
