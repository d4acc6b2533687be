"""The drop ladder: per-feature `feature_minzoom` assignment.

Re-derivation of the reference semantics (calc_feature_minzoom,
/root/reference/main.cpp:299-350 + prep_drop_states main.cpp:1074-1087):

Scanning features in global (index, seq) order, each zoom level i keeps a
float counter ``seq[i]`` (interval[i] = droprate^(basezoom-i) for
i < basezoom, else 0). Per feature: every level's counter is incremented;
then, descending from maxzoom, a level that is non-negative "passes"
(counter -= interval) and the scan continues downward; the first negative
level stops the scan and the feature's minzoom is that level + 1. A
feature passing every level has minzoom 0. droprate=1 ⇒ every feature
passes every level ⇒ minzoom 0 for all (keep-all, `-r1`).

KEY SCALING PROPERTY: for point features with gamma=0 and no
--preserve-point-density-threshold (the defaults), the counters never
read the feature's spatial index — minzoom is a pure function of the
feature's GLOBAL RANK in the sorted order and of (maxzoom, basezoom,
droprate). The pass set of each level is therefore data-free and near-
arithmetic: level i's j-th pass happens at the first surviving rank
≥ j*interval[i]. This module exploits that three ways:

- ``drop_ladder_scan``: faithful sequential emulation (the oracle).
- ``minzoom_from_ranks``: vectorized level-descending cascade over all
  ranks — O(n/(droprate-1)) numpy work after the top level.
- ``minzoom_for_rank_range``: the same cascade evaluated on a contiguous
  rank range with a leading apron, so each sorted partition computes its
  own minzooms independently — no sequential chain across partitions at
  100 TB scale. (Apron ≈ a few × droprate^basezoom ranks; level-L pass
  spacing is droprate^(basezoom-L), so the apron contains members of
  every level's pass set and the prev-member chain is pinned before the
  range of interest.)
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_DROPRATE = 2.5  # reference default -r (main.cpp:3198)
DEFAULT_MAXZOOM = 14


def intervals(maxzoom: int, basezoom: int, droprate: float) -> list[float]:
    """interval[i] per prep_drop_states (main.cpp:1074-1087): computed as
    exp(log(droprate) * (basezoom - i)) to match the C float exactly."""
    out = []
    for i in range(maxzoom + 1):
        if i < basezoom:
            out.append(math.exp(math.log(droprate) * (basezoom - i)))
        else:
            out.append(0.0)
    return out


def drop_ladder_scan(
    n: int,
    maxzoom: int = DEFAULT_MAXZOOM,
    basezoom: int | None = None,
    droprate: float = DEFAULT_DROPRATE,
) -> np.ndarray:
    """Faithful sequential emulation of calc_feature_minzoom for n point
    features in sorted order (gamma=0, no density-preserve). Increment
    of every level per feature is applied lazily: seq[i] = base[i] + m.
    """
    if basezoom is None:
        basezoom = maxzoom
    iv = intervals(maxzoom, basezoom, droprate)
    base = [0.0] * (maxzoom + 1)
    out = np.zeros(n, dtype=np.uint8)
    rng = range(maxzoom, -1, -1)
    for m in range(1, n + 1):
        for i in rng:
            if base[i] + m < 0:
                out[m - 1] = i + 1
                break
            base[i] -= iv[i]
    return out


def minzoom_scan_with_density(
    ixs,
    maxzoom: int,
    basezoom: int,
    droprate: float,
    threshold: int,
) -> np.ndarray:
    """calc_feature_minzoom (main.cpp:299-347) with
    --preserve-point-density-threshold: the rank ladder plus the
    previndex escape — a feature chosen only for a high zoom is pushed
    down to the lowest zoom i where its index gap from that zoom's last
    chosen feature exceeds ((1<<(32-i))/threshold)^2. Needs the actual
    index stream (data-dependent), so it exists alongside the
    rank-closed-form minzoom_from_ranks."""
    iv = intervals(maxzoom, basezoom, droprate)
    seq = [0.0] * (maxzoom + 1)
    previndex = [0] * (maxzoom + 1)
    n = len(ixs)
    out = np.zeros(n, dtype=np.uint8)
    for m in range(n):
        ix = int(ixs[m])
        fmz = 0
        for i in range(maxzoom, -1, -1):
            seq[i] += 1
        for i in range(maxzoom, -1, -1):
            if seq[i] < 0:
                fmz = i + 1
                for j in range(i + 1, maxzoom + 1):
                    previndex[j] = ix
                break
            seq[i] -= iv[i]
        if threshold > 0:
            for i in range(min(fmz, maxzoom)):
                if ix - previndex[i] > ((1 << (32 - i)) // threshold) ** 2:
                    fmz = i
                    for j in range(i, maxzoom + 1):
                        previndex[j] = ix
                    break
        out[m] = fmz
    return out


def _threshold_count(x: np.ndarray, d: float) -> np.ndarray:
    """#{j >= 0 : j*d <= x} for x >= 1, with float-floor correction; 0
    where x <= 0 (sentinel: no previous member). Memory-free count for
    the windowed scale path (thresholds modeled as j*d; the repeated-
    subtraction drift is ~j*ulp, far below any real index gap)."""
    j = np.floor(x / d).astype(np.int64)
    # correct possible off-by-one from float division
    j = np.where((j + 1) * d <= x, j + 1, j)
    j = np.where(j * d > x, j - 1, j)
    return np.where(x <= 0, 0, j + 1)


# exact accumulated thresholds are built only up to this many ranks;
# past it the multiplicative form is used (the float drift of repeated
# subtraction vs j*d is ~k*ulp — far below any real index gap at scale)
_EXACT_ACC_MAX = 1 << 23


def _level_thresholds(d: float, hi: float, n: int | None, exact: bool) -> np.ndarray:
    """T_0=0, T_j = the reference's j-times-repeated float subtraction
    of the interval (base[i] -= iv[i]); left-to-right np.add.accumulate
    reproduces it bit-exactly (IEEE: -x - y == -(x + y)). Enough
    entries to cover values up to hi plus one per possible pass. The
    `n` cap (passes ≤ features seen) is only valid from the global
    origin — windowed callers must pass n=None, since their pass count
    entering the window is ~hi/d regardless of window length."""
    nacc = int(hi / d) + 3
    if n is not None:
        nacc = min(n + 2, nacc)
    if exact:
        acc = np.add.accumulate(np.full(nacc, d))
    else:
        acc = np.arange(1, nacc + 1, dtype=np.float64) * d
    return np.concatenate(([0.0], acc))


def _greedy_passes(m: np.ndarray, T: np.ndarray, j0: int) -> np.ndarray:
    """Indexes into m of the features that pass a ladder level: the
    scan's k-th pass is the first remaining feature with value >= T_k
    (calc_feature_minzoom: pass iff base + m >= 0, base = -T_k). Both
    sequences ascend, so the greedy chain f_j = max(f_{j-1}+1,
    first index with m >= T_j) vectorizes as j + running-max(sp_j - j).
    j0 = already-consumed thresholds before this window."""
    J = min(len(T) - j0, len(m) + 1)
    Tw = T[j0 : j0 + J]
    sp = np.searchsorted(m, Tw, side="left")
    f = np.arange(J) + np.maximum.accumulate(sp - np.arange(J))
    f = f[f < len(m)]
    return f


def _cascade(
    ranks: np.ndarray,
    prev: np.ndarray,
    maxzoom: int,
    basezoom: int,
    droprate: float,
) -> np.ndarray:
    """Run the level-descending pass cascade over 1-based GLOBAL ranks
    (sorted). `prev` is kept for signature compatibility; prev[0] == 0
    means the window starts at global rank 1 (exact from the origin),
    anything else means an apron window — the pass count entering the
    window is estimated at the no-lag steady state, with the first
    apron member forced to pass (the old sentinel semantics; the apron
    length lets the chain pin before the range of interest)."""
    iv = intervals(maxzoom, basezoom, droprate)
    out = np.zeros(len(ranks), dtype=np.uint8)
    if not len(ranks):
        return out
    surv_idx = np.arange(len(ranks), dtype=np.int64)
    surv = ranks.astype(np.float64)
    sprev = prev.astype(np.float64)
    from_origin = int(prev[0]) == 0 and int(ranks[0]) == 1
    hi = float(ranks[-1])
    exact = hi <= _EXACT_ACC_MAX
    for i in range(maxzoom, -1, -1):
        d = iv[i]
        if d == 0.0 or len(surv) == 0:
            continue  # interval 0 ⇒ counter never negative ⇒ all pass
        if d == 1.0:
            continue  # droprate 1 ⇒ a threshold in every unit gap ⇒ all pass
        if from_origin:
            # exact greedy matching from the global origin
            T = _level_thresholds(d, hi, len(surv) + 1, exact)
            f = _greedy_passes(surv, T, 0)
            passed = np.zeros(len(surv), dtype=bool)
            passed[f] = True
        else:
            # apron window: the steady-state threshold-increment
            # criterion (a new T in (prev, m] ⇒ pass; the sentinel
            # prev=0 forces the first apron member to pass) — the
            # apron length lets the chain pin before the range of
            # interest (validated for the default droprate; windowed
            # mode is only reached by the distributed rank-range path).
            # Threshold count is ~hi/d INDEPENDENT of window length, so
            # exact mode materializes the full ladder (hi ≤ 2^23) while
            # the scale path counts thresholds arithmetically.
            if exact:
                T = _level_thresholds(d, hi, None, exact)
                cm = np.searchsorted(T, surv, side="right")
                cp = np.where(sprev <= 0, 0,
                              np.searchsorted(T, sprev, side="right"))
            else:
                cm = _threshold_count(surv, d)
                cp = _threshold_count(sprev, d)
            passed = cm > cp
        out[surv_idx[~passed]] = i + 1
        surv_idx = surv_idx[passed]
        surv = surv[passed]
        sprev = np.concatenate(([0.0], surv[:-1])) if len(surv) else surv
    return out


def minzoom_from_ranks(
    n: int,
    maxzoom: int = DEFAULT_MAXZOOM,
    basezoom: int | None = None,
    droprate: float = DEFAULT_DROPRATE,
) -> np.ndarray:
    """Vectorized minzoom for all global ranks 0..n-1 (equals
    drop_ladder_scan; asserted in tests)."""
    if basezoom is None:
        basezoom = maxzoom
    ranks = np.arange(1, n + 1, dtype=np.int64)
    prev = ranks - 1  # previous member of the all-ranks set; 0 ⇒ none
    return _cascade(ranks, prev, maxzoom, basezoom, droprate)


def default_apron(basezoom: int, droprate: float) -> int:
    """Apron length guaranteeing (empirically validated in tests) that
    every level's pass chain is pinned before the range of interest."""
    if droprate <= 1.0:
        return 1
    return int(4 * droprate ** basezoom) + 64


def minzoom_for_rank_range(
    r0: int,
    r1: int,
    maxzoom: int = DEFAULT_MAXZOOM,
    basezoom: int | None = None,
    droprate: float = DEFAULT_DROPRATE,
    apron: int | None = None,
) -> np.ndarray:
    """Minzoom for global ranks [r0, r1) (0-based), computed partition-
    locally with a leading apron. This is the per-partition kernel used
    by the distributed pipeline: each sorted block knows its global rank
    offset (an exclusive prefix-sum of block row counts) and calls this —
    no cross-partition sequential chain."""
    if basezoom is None:
        basezoom = maxzoom
    if apron is None:
        apron = default_apron(basezoom, droprate)
    if 1.0 < droprate < 2.0 and apron == default_apron(basezoom, droprate):
        # below droprate 2 the threshold gaps are never empty of
        # survivors, so the steady-state chain lag persists and NO
        # apron pins it (validated in tests) — compute exactly from
        # the origin instead. O(r1) per partition, parallel across
        # partitions; acceptable because sub-2 droprates are rare and
        # explicit. Droprate ≥ 2 pins within the default apron
        # (validated sweep: dr ∈ [2,8] × (maxzoom, basezoom) grid).
        return minzoom_from_ranks(r1, maxzoom, basezoom, droprate)[r0:r1]
    a0 = max(0, r0 - apron)
    if a0 == 0:
        return minzoom_from_ranks(r1, maxzoom, basezoom, droprate)[r0:r1]
    ranks = np.arange(a0 + 1, r1 + 1, dtype=np.int64)  # 1-based
    prev = ranks - 1
    prev[0] = 0  # unknown previous ⇒ sentinel: first apron member passes
    out = _cascade(ranks, prev, maxzoom, basezoom, droprate)
    return out[r0 - a0 :]
