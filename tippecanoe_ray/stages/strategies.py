"""Per-tile feature-reduction strategies — the ordered scans of the
reference's write_tile (tile.cpp:1665-3079), applied to a tile's kept
features in (index, seq) order.

Implemented (semantics cited to the reference):

- gap computation: per-feature squared distance to the previous feature
  in global index order (next_feature, tile.cpp:1180-1199; the previous
  position is the DECODED INDEX of the previous feature).
- gamma dot-thinning: manage_gap (tile.cpp:720-753), scale =
  2^(64-2(z+8)) (tile.cpp:1729).
- cluster (-K): merge a point into the previous kept feature when the
  1-D index distance < cluster_mingap = ((2^(32-z))/256 · distance)²
  (tile.cpp:1696, 1993-2019); position averaging over the cluster,
  point_count accounting (tile.cpp:2420-2451).
- drop-densest-as-needed: drop features with gap < mingap; on
  overflow, re-run with mingap from choose_mingap — the (1-f) quantile
  of the stable-sorted gap samples, monotonically increasing
  (tile.cpp:753-763, 2755-2770: fraction ×= limit/count × 0.80,
  capped at 0.80).
- drop-smallest-as-needed: extent ≤ minextent; point pseudo-extent
  π(√Δindex/4)² per the per-tile scan (tile.cpp:1896-1908).
- drop-fraction-as-needed: deterministic drop_sequence =
  ~(minzoom:5bits ‖ bit_reverse(index) masked) (tile.cpp:859-864);
  drop when sequence ≤ mindrop_sequence.
- limit-tile-feature-count: hard truncation (tile.cpp:2595-2611).
- accumulate-attribute folds: sum, product, mean, max, min, concat,
  comma, count onto the surviving feature (attribute.cpp:92-180; mean
  and count carry (value, count) partial state — serial.hpp:74-86).

The retry ladder here is per-tile (the reference's `-pd` dynamic-drop
variant); the reference default makes thresholds zoom-global by
re-running the whole zoom (tile.cpp:3392-3572) — at engine level that
corresponds to re-running the zoom's grouped pass with the broadcast
max threshold, which build_pyramid exposes through the channel rows.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..functions.spatial import decode_quadkey

MAX_TILE_FEATURES = 200_000  # main.cpp:86
U64 = np.uint64


@dataclasses.dataclass
class StrategyConfig:
    gamma: float = 0.0
    cluster_distance: int = 0  # -K, in 256ths of a tile
    cluster_maxzoom: int = 24
    drop_densest: bool = False
    drop_smallest: bool = False
    drop_fraction: bool = False
    drop_by_attribute: bool = False  # --drop-by-attribute-as-needed
    drop_by_attribute_descending: bool = False
    increase_gamma: bool = False  # --increase-gamma-as-needed
    # -pd: the drop-fraction gate with PER-TILE thresholds only — the
    # chosen mindrop_sequence is not propagated zoom-globally
    # (tile.cpp:2841 gate, 3020-3023 non-propagation)
    dynamic_drop: bool = False
    # what happens to features below the as-needed threshold:
    # drop (default) | coalesce (multipoint append, tile.cpp:2092-2107)
    # | cluster (position averaging, tile.cpp:2030-2050)
    as_needed_mode: str = "drop"
    max_tile_features: int = MAX_TILE_FEATURES
    limit_tile_feature_count: int = 0
    accumulate: dict[str, str] | None = None  # attr -> op

    def any_active(self) -> bool:
        return bool(
            self.gamma > 0
            or self.cluster_distance
            or self.drop_densest
            or self.drop_smallest
            or self.drop_fraction
            or self.dynamic_drop
            or self.drop_by_attribute
            or self.increase_gamma
            or self.limit_tile_feature_count
        )


def compute_gaps(index: np.ndarray, swx: np.ndarray | None = None,
                 swy: np.ndarray | None = None) -> np.ndarray:
    """Squared planar distance from each feature's SNAPPED GEOMETRY
    position to the PREVIOUS feature's decoded-index position, in
    global (index, seq) order; 0 for duplicates of the previous index
    (tile.cpp:1180-1199: dx = decode_index(previndex) - g.x — the
    current side is the geometry coordinate, the previous side is the
    bit-dropped index decode). Falls back to index-decode for the
    current side when snapped coords are not provided."""
    idx = np.asarray(index, dtype=np.uint64)
    px, py = decode_quadkey(idx)
    if swx is None:
        swx, swy = px.astype(np.int64), py.astype(np.int64)
    else:
        swx = np.asarray(swx, dtype=np.int64)
        swy = np.asarray(swy, dtype=np.int64)
    prevx = np.empty_like(px)
    prevy = np.empty_like(py)
    prevx[0] = 0
    prevy[0] = 0
    prevx[1:] = px[:-1]
    prevy[1:] = py[:-1]
    with np.errstate(over="ignore"):
        dx = (prevx.astype(np.int64) - swx).astype(np.uint64)
        dy = (prevy.astype(np.int64) - swy).astype(np.uint64)
        gap = dx * dx + dy * dy  # unsigned long long wrap, tile.cpp:1193
    same = np.zeros(len(idx), dtype=bool)
    same[1:] = idx[1:] == idx[:-1]
    gap[same] = 0
    return gap


def bit_reverse(v: np.ndarray) -> np.ndarray:
    x = np.asarray(v, dtype=np.uint64)
    m1 = U64(0x5555555555555555)
    m2 = U64(0x3333333333333333)
    m4 = U64(0x0F0F0F0F0F0F0F0F)
    x = ((x >> U64(1)) & m1) | ((x & m1) << U64(1))
    x = ((x >> U64(2)) & m2) | ((x & m2) << U64(2))
    x = ((x >> U64(4)) & m4) | ((x & m4) << U64(4))
    x = x.byteswap()
    return x


def drop_sequence(minzoom: np.ndarray, index: np.ndarray) -> np.ndarray:
    """calculate_drop_sequence (tile.cpp:859-864)."""
    zoom = np.clip(np.asarray(minzoom, dtype=np.uint64), 0, 31)
    out = zoom << U64(64 - 5)
    out |= bit_reverse(index) & ~(U64(31) << U64(64 - 5))
    return ~out


def choose_mingap(gaps: np.ndarray, f: float, existing) -> int:
    """(1-f) quantile of the sorted gaps, strictly past the existing
    threshold (tile.cpp:753-763)."""
    g = np.sort(np.asarray(gaps))
    ix = int((len(g) - 1) * (1 - f))
    while ix + 1 < len(g) and g[ix] <= existing:
        ix += 1
    return int(g[ix])


def choose_minattribute(values: np.ndarray, f: float, existing: float | None,
                        descending: bool) -> float | None:
    """tile.cpp:822-857 — asymmetric quantile for ascending/descending
    attribute dropping. `existing` None = no threshold yet (the
    reference's ±HUGE_VAL sentinels)."""
    if len(values) == 0:
        return existing
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    if descending:
        ix = int((n - 1) * f)
        while ix > 0 and (existing is not None and v[ix] >= existing):
            ix -= 1
        if existing is not None and v[ix] >= existing:
            return existing
        return float(v[ix])
    ix = int(math.ceil((n - 1) * (1 - f)))
    if ix >= n:
        ix = n - 1
    while ix + 1 < n and (existing is not None and v[ix] <= existing):
        ix += 1
    if existing is not None and v[ix] <= existing:
        return existing
    return float(v[ix])


def gamma_keep_mask(index: np.ndarray, z: int, gamma: float) -> np.ndarray:
    """manage_gap scan (tile.cpp:720-753): True = keep.

    Fast path: when every consecutive spacing is already >= scale the
    scan never enters the gap state and keeps everything — one
    vectorized check instead of a Python loop (the common case for
    sparse tiles)."""
    scale = float(1 << (64 - 2 * (z + 8)))
    if len(index) == 0:
        return np.ones(0, dtype=bool)
    iu = index.astype(np.uint64)
    d0 = np.empty(len(iu), dtype=np.float64)
    d0[0] = float(iu[0])  # previndex starts at 0
    d0[1:] = (iu[1:] - iu[:-1]).astype(np.float64)
    if bool(((iu[1:] >= iu[:-1]).all() if len(iu) > 1 else True)) and bool(
        (d0 >= scale).all()
    ):
        return np.ones(len(index), dtype=bool)
    keep = np.ones(len(index), dtype=bool)
    previndex = 0
    gap = 0.0
    for i in range(len(index)):
        ix = int(index[i])
        drop = False
        if gap > 0:
            if ix == previndex:
                drop = True
            elif ix < previndex or math.exp(math.log((ix - previndex) / scale) * gamma) >= gap:
                gap = 0.0
            else:
                drop = True
        elif ix >= previndex:
            g = (ix - previndex) / scale
            if g == 0:
                drop = True
            elif g < 1:
                gap = g
                drop = True
            else:
                gap = 0.0
        if drop:
            keep[i] = False
        else:
            previndex = ix
    return keep


def cluster_scan(
    index: np.ndarray, wx: np.ndarray, wy: np.ndarray, z: int, cluster_distance: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-K clustering (tile.cpp:1993-2019): merge into the previous kept
    feature when index distance < cluster_mingap; average positions.
    merge_previndex updates only at the END of the feature loop
    (tile.cpp:2311), which every merge path's `continue` skips — so the
    comparison is against the last KEPT feature's index, not the
    previous scanned feature's (verified vs the binary on chained
    points). Returns (keep mask, cx, cy, point_count per kept feature)."""
    span = 1 << (32 - z)
    # unsigned long long cluster_mingap (tile.cpp:1696) — Python int
    # reproduces the unsigned wrap of the squared product exactly
    mingap = ((span // 256 * int(cluster_distance)) ** 2) % (1 << 64)
    n = len(index)
    keep = np.ones(n, dtype=bool)
    cx = wx.astype(np.float64).copy()
    cy = wy.astype(np.float64).copy()
    count = np.ones(n, dtype=np.int64)
    if n == 0:
        return keep, cx, cy, count
    iu = index.astype(np.uint64)
    if bool((iu[1:] >= iu[:-1]).all() if n > 1 else True):
        # sorted input (the per-tile stream order): the kept set is a
        # greedy jump chain — next kept = first index >= kept + mingap.
        # O(clusters * log n) instead of a Python loop over every row;
        # the iterative running average (tile.cpp:2001-2012, NOT the
        # arithmetic mean in floating point) folds only merged members.
        bounds = []
        i = 0
        while i < n:
            bounds.append(i)
            target = int(iu[i]) + mingap
            if target >= (1 << 64):
                i = n  # prev + mingap overflows: everything left merges
            else:
                i = int(np.searchsorted(iu, np.uint64(target), side="left"))
                if i <= bounds[-1]:
                    i = bounds[-1] + 1
        bounds.append(n)
        for b in range(len(bounds) - 1):
            s, e = bounds[b], bounds[b + 1]
            if e - s > 1:
                keep[s + 1 : e] = False
                a_x = cx[s]
                a_y = cy[s]
                for t, i2 in enumerate(range(s + 1, e), start=1):
                    a_x = (a_x * t + wx[i2]) / (t + 1)
                    a_y = (a_y * t + wy[i2]) / (t + 1)
                cx[s] = a_x
                cy[s] = a_y
                count[s] = e - s
        return keep, cx, cy, count
    last_kept = -1
    merge_previndex = 0
    for i in range(n):
        ix = int(index[i])
        if last_kept >= 0 and (ix < merge_previndex or ix - merge_previndex < mingap):
            j = last_kept
            # running average (tile.cpp:2001-2012 semantics)
            c = count[j]
            cx[j] = (cx[j] * c + wx[i]) / (c + 1)
            cy[j] = (cy[j] * c + wy[i]) / (c + 1)
            count[j] = c + 1
            keep[i] = False
        else:
            last_kept = i
            merge_previndex = ix
    return keep, cx, cy, count


def point_extents(index: np.ndarray) -> np.ndarray:
    """Per-tile point pseudo-extent from index spacing
    (tile.cpp:1896-1908). sf.extent is a long long (serial.hpp:123):
    M_PI*r*r is TRUNCATED to int64 before both the `extent <= minextent`
    comparison and choose_minextent's stable sort."""
    idx = np.asarray(index, dtype=np.uint64)
    n = len(idx)
    out = np.ones(n, dtype=np.int64)
    if n == 0:
        return out
    prev = np.empty_like(idx)
    prev[0] = 0
    prev[1:] = idx[:-1]
    grow = idx > prev
    # double radius = sqrt(d) / 4.0; extent = (M_PI * radius) * radius
    # — left-to-right float evaluation order preserved for bit parity
    d = (idx - prev).astype(np.float64)
    radius = np.sqrt(d) / 4.0
    ext = ((math.pi * radius) * radius).astype(np.int64)
    out[grow] = np.maximum(ext[grow], 1)
    return out


def apply_strategies(
    index: np.ndarray,
    wx: np.ndarray,
    wy: np.ndarray,
    minzoom: np.ndarray,
    gaps: np.ndarray,
    z: int,
    scfg: StrategyConfig,
    overrides: dict | None = None,
    attrs: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, dict]:
    """Run the enabled strategies over one tile's kept features (sorted
    by index,seq). `overrides` carries the zoom-global thresholds from a
    previous iteration (the reference's whole-zoom retry with monotone
    thresholds, tile.cpp:3392-3572 / mingap_out 2762-2770). Returns
    (keep, out_x, out_y, point_count, report) where report holds the
    tile's final thresholds for the zoom-global consensus."""
    n = len(index)
    keep = np.ones(n, dtype=bool)
    cx = wx.astype(np.float64)
    cy = wy.astype(np.float64)
    count = np.ones(n, dtype=np.int64)
    report: dict = {}
    ov = overrides or {}
    n_before = n  # strategy counter checkpoints (tile.cpp:1986/2015/1643)
    gamma_eff = max(scfg.gamma, float(ov.get("gamma", 0.0)))
    if gamma_eff > 0:
        keep &= gamma_keep_mask(index, z, gamma_eff)
    if scfg.increase_gamma:
        # gamma x1.25 retry ladder (tile.cpp:2737-2753); zoom-global via
        # the gamma report like the other thresholds
        g = gamma_eff
        limit0 = scfg.max_tile_features
        while keep.sum() > limit0 and g < 10:
            g = 1.0 if g < 1 else g * 1.25
            keep = gamma_keep_mask(index, z, g)
        if g > gamma_eff:
            report["gamma"] = g
        keep = keep.copy()
    n_after_gamma = int(keep.sum())
    if n_before - n_after_gamma:
        report["_c_dropped_by_gamma"] = n_before - n_after_gamma
    if scfg.cluster_distance and z <= scfg.cluster_maxzoom:
        sel = np.flatnonzero(keep)
        k2, cx2, cy2, cnt2 = cluster_scan(index[sel], wx[sel], wy[sel], z, scfg.cluster_distance)
        keep[sel[~k2]] = False
        cx[sel] = cx2
        cy[sel] = cy2
        count[sel] = cnt2
    n_after_cluster = int(keep.sum())
    if n_after_gamma - n_after_cluster:
        report["_c_coalesced_as_needed"] = n_after_gamma - n_after_cluster
    # as-needed ladders (monotone thresholds; zoom-global via overrides)
    limit = scfg.max_tile_features
    if scfg.drop_densest:
        mingap = int(ov.get("mingap", 0))
        if mingap:
            keep &= ~(gaps < mingap)
        fraction = 1.0
        samples = gaps.copy()  # the sample vector accumulates across
        # retries (add_sample_to is never cleared between scans)
        while keep.sum() > limit:
            fraction = min(fraction * limit / keep.sum() * 0.80, 0.80)
            m = choose_mingap(samples, fraction, mingap)
            if m <= mingap:
                break
            mingap = m
            keep &= ~(gaps < mingap)
            samples = np.concatenate((samples, gaps))
        if mingap > int(ov.get("mingap", 0)):
            report["mingap"] = mingap
    if scfg.drop_smallest:
        extents = point_extents(index)
        minextent = int(ov.get("minextent", 0))
        if scfg.as_needed_mode == "coalesce":
            # coalesce-smallest (tile.cpp:2086-2107): the target must
            # itself have extent <= minextent, and coalesced_area
            # accumulates into the drop condition
            def scan_coalesce(minext):
                k = keep.copy()
                members: dict[int, list[int]] = {}
                coalesced_area = 0
                last_small = -1
                for i in np.flatnonzero(keep):
                    ext = int(extents[i])
                    if (
                        minext != 0
                        and ext + coalesced_area <= minext
                        and last_small >= 0
                    ):
                        k[i] = False
                        members.setdefault(last_small, []).append(int(i))
                        coalesced_area += ext
                        continue
                    # appended: the accumulated run resets
                    # (tile.cpp:2312)
                    coalesced_area = 0
                    if ext <= minext:
                        last_small = int(i)
                return k, members

            k2, members = scan_coalesce(minextent)
            fraction = 1.0
            samples = extents[keep].copy()
            while k2.sum() > limit:
                fraction = min(fraction * limit / k2.sum() * 0.75, 0.80)
                m = choose_mingap(samples, fraction, minextent)
                if m <= minextent:
                    break
                minextent = m
                k2, members = scan_coalesce(minextent)
                samples = np.concatenate((samples, extents[keep]))
            keep &= k2
            report["_members"] = members
        else:
            if minextent:
                keep &= ~(extents <= minextent)
            fraction = 1.0
            samples = extents.copy()
            while keep.sum() > limit:
                # minextent retry fraction uses ×0.75 (tile.cpp:2779)
                fraction = min(fraction * limit / keep.sum() * 0.75, 0.80)
                m = choose_mingap(samples, fraction, minextent)
                if m <= minextent:
                    break
                minextent = m
                keep &= ~(extents <= minextent)
                samples = np.concatenate((samples, extents))
        if minextent > int(ov.get("minextent", 0)):
            report["minextent"] = minextent
    if scfg.drop_fraction or scfg.dynamic_drop:
        seqs = drop_sequence(minzoom, index)
        minseq = int(ov.get("mindrop_sequence", 0))
        if minseq:
            keep &= ~(seqs <= np.uint64(minseq))
        fraction = 1.0
        samples = seqs.copy()
        while keep.sum() > limit:
            # fraction update uses ×0.95 for the sequence ladder
            # (tile.cpp:2845), still capped at 0.80
            fraction = min(fraction * limit / keep.sum() * 0.95, 0.80)
            m = choose_mingap(samples, fraction, minseq)  # uint64 quantile
            if m <= minseq:
                break
            minseq = m
            keep &= ~(seqs <= np.uint64(minseq))
            samples = np.concatenate((samples, seqs))
        if minseq > int(ov.get("mindrop_sequence", 0)) and not scfg.dynamic_drop:
            report["mindrop_sequence"] = minseq
    if scfg.drop_by_attribute and attrs is not None:
        desc = scfg.drop_by_attribute_descending
        valid = np.isfinite(attrs)
        minattr = ov.get("minattribute")  # None = no threshold yet
        if minattr is not None:
            if desc:
                keep &= ~(valid & (attrs > minattr))
            else:
                keep &= ~(valid & (attrs < minattr))
        fraction = 1.0
        samples = attrs[valid].astype(np.float64).copy()
        while keep.sum() > limit:
            # feature-overflow retry uses ×0.75 (tile.cpp:2803-2804)
            fraction = min(fraction * limit / keep.sum() * 0.75, 0.80)
            m = choose_minattribute(samples, fraction, minattr, desc)
            better = (
                m is not None
                and (minattr is None or (m < minattr if desc else m > minattr))
            )
            if not better:
                break
            minattr = m
            if desc:
                keep &= ~(valid & (attrs > minattr))
            else:
                keep &= ~(valid & (attrs < minattr))
            samples = np.concatenate((samples, attrs[valid]))
        prev = ov.get("minattribute")
        if minattr is not None and (
            prev is None or (minattr < prev if desc else minattr > prev)
        ):
            report["minattribute"] = minattr
    if n > 0:
        # the first candidate can never be dropped by gamma/cluster/
        # as-needed ladders: every drop path requires a previous feature
        # to accumulate onto (find_feature_to_accumulate_onto fails on an
        # empty layer — tile.cpp:1576-1590, 1639-1657)
        keep[0] = True
    if scfg.limit_tile_feature_count and keep.sum() > scfg.limit_tile_feature_count:
        kept_pos = np.flatnonzero(keep)
        keep[kept_pos[scfg.limit_tile_feature_count:]] = False
    n_end = int(keep.sum())
    as_needed = n_after_cluster - n_end
    if as_needed:
        # drop mode counts dropped_as_needed (tile.cpp:1643); the
        # coalesce/cluster variants merge instead (tile.cpp:2015-2105)
        key = ("_c_dropped_as_needed" if scfg.as_needed_mode == "drop"
               else "_c_coalesced_as_needed")
        report[key] = report.get(key, 0) + as_needed
    return keep, cx, cy, count, report


# ------------------------------------------------- accumulate-attribute


def accumulate_fold(values: list, op: str):
    """The 8 accumulate-attribute ops (attribute.cpp:9-188). `values`
    is the survivor's value first, then the dropped features' values in
    scan order. mean carries (sum, count) partial state — exactly the
    reference's "value\\0count" accumulator."""
    if op == "sum":
        return sum(values)
    if op == "product":
        out = 1
        for v in values:
            out *= v
        return out
    if op == "mean":
        return sum(values) / len(values)
    if op == "max":
        return max(values)
    if op == "min":
        return min(values)
    if op == "count":
        return len(values)
    if op == "concat":
        return "".join(str(v) for v in values)
    if op == "comma":
        return ",".join(str(v) for v in values)
    raise ValueError(f"unknown accumulate op {op}")


class MeanState:
    """Mergeable partial state for mean/count accumulation — the
    explicit (sum, count) the reference piggybacks on its accumulator
    strings (serial.hpp:74-86); usable as a Ray AggregateFn kernel."""

    __slots__ = ("total", "count")

    def __init__(self, total: float = 0.0, count: int = 0):
        self.total = total
        self.count = count

    def add(self, v: float):
        self.total += v
        self.count += 1

    def merge(self, other: "MeanState"):
        self.total += other.total
        self.count += other.count

    def finalize(self) -> float:
        return self.total / self.count if self.count else float("nan")


def multiplier_keep(
    index: np.ndarray,
    minzoom: np.ndarray,
    z: int,
    multiplier: int,
    droprate: float,
) -> tuple[np.ndarray, np.ndarray]:
    """--retain-points-multiplier N (tile.cpp:1290-1319 + the
    fractional feature_minzoom of next_feature, tile.cpp:1163):
    per tile scan in index order; a feature whose fractional minzoom
    clears z is a KEPT lead (resets the cluster counter); otherwise up
    to N-1 features with z + log(N)/log(droprate) >= fractional minzoom
    are retained as cluster secondaries. The first feature of the tile
    is always kept. Returns (keep mask, is_lead mask)."""
    frac = bit_reverse(np.asarray(index, dtype=np.uint64) >> U64(2)).astype(np.float64) / float(2**64)
    fmz = np.asarray(minzoom, dtype=np.float64) - frac
    extra = math.log(multiplier) / math.log(droprate) if droprate > 1 else float("inf")
    n = len(index)
    keep = np.zeros(n, dtype=bool)
    lead = np.zeros(n, dtype=bool)
    count = 0
    for i in range(n):
        if i == 0 or z >= fmz[i]:
            keep[i] = True
            lead[i] = True
            count = 0
        elif z + extra >= fmz[i] and count + 1 < multiplier:
            count += 1
            keep[i] = True
    return keep, lead


def cluster_fold_positions(
    wx: np.ndarray, wy: np.ndarray, keep: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """--cluster-densest-as-needed position averaging
    (tile.cpp:2030-2050): each merged feature updates the target's
    STORED (long long, truncated) coordinate with the running mean.
    Returns (x, y, point_count) per position."""
    px = wx.astype(np.int64).copy()
    py = wy.astype(np.int64).copy()
    clustered = np.zeros(len(wx), dtype=np.int64)
    dropped, tgt = fold_targets(keep)
    for d, t in zip(dropped, tgt):
        clustered[t] += 1
        c = clustered[t]
        x = float(px[t]) * c + float(wx[d])
        y = float(py[t]) * c + float(wy[d])
        px[t] = int(x / (c + 1))  # truncation on store into draw.x
        py[t] = int(y / (c + 1))
    return px, py, clustered + 1


def fold_targets(keep: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """find_feature_to_accumulate_onto (tile.cpp:1576-1590): each
    dropped feature folds onto the most recent KEPT feature before it
    in scan order. Returns (dropped_positions, target_positions) for
    dropped features that have a target."""
    n = len(keep)
    idx = np.arange(n)
    last_keep = np.maximum.accumulate(np.where(keep, idx, -1))
    dropped = np.flatnonzero(~keep)
    tgt = last_keep[dropped]
    valid = tgt >= 0
    return dropped[valid], tgt[valid]


def fold_numeric(vals: np.ndarray, keep: np.ndarray, op: str) -> np.ndarray:
    """Fold dropped features' attribute values onto survivors
    (preserve_attribute1, attribute.cpp:92-180) in scan order. Returns
    the folded value per position (meaningful for kept positions).

    mean reproduces the reference's ITERATIVE update — (v+d)/2 at count
    2, then (v*count+d)/(count+1) — not a plain sum/count, for bit
    parity with the accumulator-string math."""
    out = np.asarray(vals, dtype=np.float64).copy()
    dropped, tgt = fold_targets(keep)
    if op == "sum":
        np.add.at(out, tgt, out[dropped])
    elif op == "product":
        np.multiply.at(out, tgt, out[dropped])
    elif op == "max":
        np.maximum.at(out, tgt, out[dropped])
    elif op == "min":
        np.minimum.at(out, tgt, out[dropped])
    elif op == "count":
        counts = np.ones(len(out), dtype=np.int64)
        np.add.at(counts, tgt, 1)
        out = counts.astype(np.float64)
    elif op == "mean":
        counts = np.ones(len(out), dtype=np.int64)
        for d, t in zip(dropped, tgt):
            c = counts[t]
            if c <= 1:
                out[t] = (out[t] + out[d]) / 2
                counts[t] = 2
            else:
                s = out[t] * c + out[d]
                counts[t] = c + 1
                out[t] = s / counts[t]
    else:
        raise ValueError(f"unknown accumulate op {op}")
    return out


def density_glow(index: np.ndarray, kept: np.ndarray, z: int) -> np.ndarray:
    """-ag feature density (tile.cpp:2147-2157, 2656-2675): per-tile
    manage_gap scan with gamma fixed at 1 computes each kept feature's
    spacing; glow = trunc(1/spacing) clamped to 255 (255 when spacing
    is unset). Returns the 0-255 glow per position (kept ones
    meaningful)."""
    scale = float(1 << (64 - 2 * (z + 8)))
    glow = np.full(len(index), 255, dtype=np.int64)
    previndex = 0
    gap = 0.0
    spacing = 0.0  # STICKY across the scan (declared once per tile,
    # tile.cpp:1731): a manage_gap-dropped feature inherits the
    # previous feature's spacing
    for i in np.flatnonzero(kept):
        ix = int(index[i])
        o_prev = previndex
        # manage_gap with gamma=1 (tile.cpp:720-753)
        drop = False
        if gap > 0:
            if ix == previndex:
                drop = True
            elif ix < previndex or math.exp(math.log(
                    (ix - previndex) / scale)) >= gap:
                # exp(log(x)*1) verbatim: the round trip is inexact and
                # boundary flips matter (manage_gap tile.cpp:727)
                gap = 0.0
            else:
                drop = True
        elif ix >= previndex:
            g = (ix - previndex) / scale
            if g == 0:
                drop = True
            elif g < 1:
                gap = g
                drop = True
            else:
                gap = 0.0
        if not drop:
            previndex = ix
            spacing = (ix - o_prev) / scale
        if spacing > 0:
            glow[i] = min(int(1 / spacing), 255)
    return glow


def stringify_strategies(per_zoom: list[dict]) -> str:
    """mbtiles.cpp:372-460 — the `strategies` metadata JSON: one hash
    per zoom 0..maxzoom, only nonzero counters written, in the
    reference's fixed key order."""
    order = [
        ("dropped_by_rate", "dropped_by_rate"),
        ("dropped_by_gamma", "dropped_by_gamma"),
        ("dropped_as_needed", "dropped_as_needed"),
        ("coalesced_as_needed", "coalesced_as_needed"),
        ("detail_reduced", "detail_reduced"),
        ("tiny_polygons", "tiny_polygons"),
        ("tile_size", "tile_size_desired"),
        ("feature_count", "feature_count_desired"),
        ("truncated_zooms", "truncated_zooms"),
    ]
    parts = []
    for zc in per_zoom:
        kv = []
        for key, out_key in order:
            v = int(zc.get(key, 0))
            if v > 0:
                kv.append(f'"{out_key}":{v}')
        parts.append("{" + ",".join(kv) + "}")
    return "[" + ",".join(parts) + "]"


def strategies_from_tile_table(tbl, maxzoom: int) -> list[dict]:
    """Aggregate the vector pipeline's per-tile counter columns
    (s_rate/s_tiny/s_detail + leafed) into the per-zoom list. Accepts
    a pyarrow Table or pandas DataFrame."""
    import numpy as np

    out = [dict() for _ in range(maxzoom + 1)]
    if tbl is None or len(tbl) == 0:
        return out
    cols = list(tbl.column_names if hasattr(tbl, "column_names") else tbl.columns)

    def col_np(c):
        v = tbl[c]
        return (v.to_numpy(zero_copy_only=False) if hasattr(v, "to_numpy")
                and not hasattr(v, "values") else np.asarray(v))

    zs = np.asarray(col_np("z"))

    def acc(col, key):
        if col not in cols:
            return
        v = np.asarray(col_np(col))
        for z in range(maxzoom + 1):
            s = int(v[zs == z].sum())
            if s:
                out[z][key] = out[z].get(key, 0) + s
    def acc_max(col, key):
        # zoom_tile_size / zoom_feature_count are per-zoom MAXIMA
        # (tile.cpp:3529-3533), not sums
        if col not in cols:
            return
        v = np.asarray(col_np(col))
        for z in range(maxzoom + 1):
            sub = v[zs == z]
            m = int(sub.max()) if len(sub) else 0
            if m:
                out[z][key] = max(out[z].get(key, 0), m)

    acc("s_rate", "dropped_by_rate")
    acc("s_gamma", "dropped_by_gamma")
    acc("s_need_d", "dropped_as_needed")
    acc("s_need_c", "coalesced_as_needed")
    acc("s_tiny", "tiny_polygons")
    acc("s_detail", "detail_reduced")
    acc_max("s_tsize", "tile_size")
    acc_max("s_fcount", "feature_count")
    acc("leafed", "truncated_zooms")

    def acc_max(col, key):
        # per-zoom MAX (zoom_tile_size / zoom_feature_count,
        # tile.cpp:3529-3534)
        if col not in cols:
            return
        v = np.asarray(col_np(col))
        for z in range(maxzoom + 1):
            m = v[zs == z]
            s = int(m.max()) if len(m) else 0
            if s:
                out[z][key] = max(out[z].get(key, 0), s)
    acc_max("s_tsize", "tile_size")
    acc_max("s_fcount", "feature_count")
    return out
