"""Dataset-level statistics: maxzoom / basezoom / droprate guessing and
tilestats — the reference's global passes (main.cpp:2279-2670,
mbtiles.cpp:206-370) as mergeable distributed aggregates.

- guess_maxzoom: Welford mean/M2 of log(index deltas) over the sorted
  feature stream (main.cpp:2313-2320). Per-bucket partial states carry
  (count, mean, M2, dupes, first_ix, last_ix); the driver merges with
  Chan's parallel-Welford combination and splices the bucket-boundary
  deltas — a textbook mergeable aggregate instead of a global scan.
- guess_basezoom_droprate: per-zoom densest-tile feature counts
  (max 50k target, main.cpp:2566) from per-bucket partial (z, tile,
  count) maxima; droprate fitted per main.cpp:2618-2634.
- tilestats: per-attribute type/min/max/≤100 sample values with the
  reference's caps (1000 attributes, 100 values)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MAX_FEATURES_BASEZOOM = 50_000  # -Bg densest-tile target, main.cpp:2566
MAX_GUESS_ZOOM = 32


def _welford_merge(a, b):
    """Chan's combination of (count, mean, M2) partials."""
    (na, ma, m2a), (nb, mb, m2b) = a, b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    delta = mb - ma
    mean = ma + delta * nb / n
    m2 = m2a + m2b + delta * delta * na * nb / n
    return (n, mean, m2)


def _bucket_partials(group: pd.DataFrame, max_zoom_hist: int) -> pd.DataFrame:
    idx = np.sort(group["index"].to_numpy().astype(np.uint64))
    diffs = (idx[1:] - idx[:-1]).astype(np.float64)
    nz = diffs[diffs > 0]
    dupes = int((diffs == 0).sum())
    logs = np.log(nz) if len(nz) else np.empty(0)
    n = len(logs)
    mean = float(logs.mean()) if n else 0.0
    m2 = float(((logs - mean) ** 2).sum()) if n else 0.0
    # per-zoom tile histogram partials: (z, tile_key, count)
    zs, keys, counts = [], [], []
    for z in range(0, max_zoom_hist + 1):
        tk = idx >> np.uint64(64 - 2 * z) if z > 0 else np.zeros(len(idx), np.uint64)
        u, c = np.unique(tk, return_counts=True)
        zs.append(np.full(len(u), z))
        keys.append(u)
        counts.append(c)
    hist = pd.DataFrame(
        {
            "z": np.concatenate(zs),
            "tile": np.concatenate(keys).astype(np.uint64).astype(np.int64),
            "cnt": np.concatenate(counts),
        }
    )
    head = pd.DataFrame(
        {
            "z": [-1],
            "tile": [0],
            "cnt": [0],
            "n": [n],
            "mean": [mean],
            "m2": [m2],
            "dupes": [dupes],
            "first_ix": [np.int64(np.uint64(idx[0]).astype(np.int64)) if len(idx) else 0],
            "last_ix": [np.int64(np.uint64(idx[-1]).astype(np.int64)) if len(idx) else 0],
            "bucket": [int(group["bucket"].iloc[0])],
        }
    )
    for c in ("n", "mean", "m2", "dupes", "first_ix", "last_ix", "bucket"):
        hist[c] = 0
    return pd.concat([head, hist], ignore_index=True)


def index_statistics(narrow_bucketed: ray.data.Dataset, max_zoom_hist: int = 14) -> dict:
    """One grouped pass → merged Welford state + per-zoom densest-tile
    counts. Returns {count, mean, m2, dupes, max_count_per_zoom}."""
    parts = (
        narrow_bucketed.groupby("bucket")
        .map_groups(lambda g: _bucket_partials(g, max_zoom_hist), batch_format="pandas")
        .to_pandas()
    )
    heads = parts[parts["z"] == -1].sort_values("bucket")
    state = (0, 0.0, 0.0)
    dupes = 0
    prev_last = None
    for _, r in heads.iterrows():
        state = _welford_merge(state, (int(r["n"]), float(r["mean"]), float(r["m2"])))
        dupes += int(r["dupes"])
        if prev_last is not None:
            d = np.uint64(np.int64(r["first_ix"])) - np.uint64(prev_last)
            if d == 0:
                dupes += 1
            else:
                state = _welford_merge(state, (1, math.log(float(d)), 0.0))
        prev_last = np.int64(r["last_ix"])
    hist = parts[parts["z"] >= 0]
    per_tile = hist.groupby(["z", "tile"], as_index=False)["cnt"].sum()
    max_per_zoom = per_tile.groupby("z")["cnt"].max().to_dict()
    return {
        "count": state[0],
        "mean": state[1],
        "m2": state[2],
        "dupes": dupes,
        "max_count_per_zoom": {int(k): int(v) for k, v in max_per_zoom.items()},
    }


def guess_maxzoom(stats: dict, full_detail: int = 12) -> int:
    """main.cpp:2340-2364: maxzoom for features typically
    exp(mean−1.5σ) apart (geometric mean; lognormal spacing)."""
    n, mean, m2 = stats["count"], stats["mean"], stats["m2"]
    if n == 0:
        return 0
    stddev = math.sqrt(m2 / n)
    nearby = math.exp(mean - 1.5 * stddev)
    nearby_ft = math.sqrt(nearby) / 33  # tile units → pseudo-feet
    want = nearby_ft / 2
    mz = math.ceil(math.log(360 / (0.00000274 * want)) / math.log(2) - full_detail)
    return max(0, min(mz, 32 - full_detail))


def guess_droprate_from_spread(stats: dict) -> float:
    """main.cpp:2390-2398: droprate from the spacing stddev fit."""
    n, m2 = stats["count"], stats["m2"]
    if n == 0:
        return 2.5
    stddev = math.sqrt(m2 / n)
    if stddev <= 0:
        return 2.5
    return max(0.0, math.exp(-0.7681 * math.log(stddev) + 1.582))


def guess_basezoom_droprate(
    stats: dict,
    maxzoom: int,
    max_features: int = MAX_FEATURES_BASEZOOM,
) -> tuple[int, float]:
    """main.cpp:2560-2634: basezoom = lowest zoom whose densest tile
    holds ≤ max_features; droprate fitted so lower zooms hit the target."""
    maxes = stats["max_count_per_zoom"]
    basezoom = 0
    for z in range(maxzoom, -1, -1):
        if maxes.get(z, 0) > max_features:
            basezoom = z + 1
            break
    basezoom = min(basezoom, maxzoom)
    droprate = 1.0
    for z in range(basezoom - 1, -1, -1):
        interval = math.exp(math.log(droprate) * (basezoom - z)) if droprate > 0 else 1
        cnt = maxes.get(z, 0)
        if interval > 0 and cnt / interval >= max_features:
            interval = cnt / max_features
            droprate = math.exp(math.log(interval) / (basezoom - z))
    if droprate == 1.0:
        droprate = 2.5 if basezoom > 0 else 1.0
    return basezoom, droprate


# ------------------------------------------------------------- tilestats


MAX_TILESTATS_ATTRIBUTES = 1000  # mbtiles.cpp caps
MAX_TILESTATS_VALUES = 100


def tilestats(ds: ray.data.Dataset, attr_cols: list[str], layer: str = "points") -> dict:
    """Per-attribute type/min/max/sample values with the reference's
    caps — partial per batch, merged on the driver (mergeable sets)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for c in attr_cols[:MAX_TILESTATS_ATTRIBUTES]:
            s = df[c].dropna()
            if len(s) == 0:
                continue
            is_num = pd.api.types.is_numeric_dtype(s)
            vals = s.unique()[:MAX_TILESTATS_VALUES]
            recs.append(
                {
                    "attribute": c,
                    "type": "number" if is_num else "string",
                    "min": float(s.min()) if is_num else None,
                    "max": float(s.max()) if is_num else None,
                    "values": [v.item() if hasattr(v, "item") else v for v in vals],
                    "count": len(s),
                }
            )
        return pd.DataFrame(recs)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out: dict = {"layer": layer, "attributes": []}
    for attr, g in parts.groupby("attribute"):
        vals: list = []
        seen = set()
        for vs in g["values"]:
            for v in vs:
                if v not in seen and len(vals) < MAX_TILESTATS_VALUES:
                    seen.add(v)
                    vals.append(v)
        entry = {
            "attribute": attr,
            "type": g["type"].iloc[0],
            "count": int(g["count"].sum()),
            "values": sorted(vals, key=str),
        }
        if g["type"].iloc[0] == "number":
            entry["min"] = float(g["min"].min())
            entry["max"] = float(g["max"].max())
        out["attributes"].append(entry)
    out["attributes"].sort(key=lambda e: e["attribute"])
    out["attributeCount"] = len(out["attributes"])
    return out


def cluster_distance_maxzoom(
    stats: dict,
    maxzoom: int,
    cluster_distance: int,
    cluster_maxzoom: int = 24,
    full_detail: int = 12,
    low_detail: int = 12,
) -> int:
    """main.cpp:2376-2388: raise the guessed maxzoom until the average
    index gap exceeds the cluster mingap at that zoom, so -K clustering
    leaves most features distinct."""
    if cluster_distance <= 0 or stats["count"] == 0:
        return maxzoom
    avg = math.exp(stats["mean"])  # geometric mean spacing (index units)
    while (
        maxzoom < 32 - full_detail
        and maxzoom < 33 - low_detail
        and maxzoom < cluster_maxzoom
    ):
        step = (1 << (32 - maxzoom)) // 256 * cluster_distance
        if avg > step * step:
            break
        maxzoom += 1
    return maxzoom


def guess_basezoom_droprate_exact(
    ix_sorted, maxzoom: int, gamma: float = 0.0,
    marker_width: float = 1.0, basezoom: int | None = None,
    droprate: float | None = None, prevent_basezoom_above: bool = False,
    scheme: str = "quadkey",
) -> tuple[int, float]:
    """The -Bg/-Bf/-rg/-rf basezoom + droprate guess
    (main.cpp:2489-2634): per zoom 0..24, scan the index-sorted stream
    counting features per tile RUN (gamma thinning applied via
    manage_gap), track the densest tile, then choose basezoom as the
    shallowest zoom from the top whose densest tile holds <
    50000/width^2 features, with the reference's
    "work from the other direction" and droprate-fit fallbacks.
    `basezoom`/`droprate` None = guess requested."""
    import numpy as np

    if scheme == "hilbert":
        from ..functions.spatial import decode_hilbert as _dec
    else:
        from ..functions.spatial import decode_quadkey as _dec

    MAXZ = 24
    ix = np.asarray(ix_sorted, dtype=np.uint64)
    xx, yy = _dec(ix)
    max_count = [0] * (MAXZ + 1)
    for z in range(MAXZ + 1):
        if z == 0:
            tid = np.zeros(len(ix), np.uint64)
        else:
            tid = ((xx >> np.uint64(32 - z)).astype(np.uint64)
                   << np.uint64(32)) | (yy >> np.uint64(32 - z)).astype(
                       np.uint64)
        if len(tid) == 0:
            continue
        # run boundaries; the C scan starts from tile (0, 0), so a
        # leading run at tile id 0 CONTINUES the initial state
        starts = np.flatnonzero(np.concatenate(
            ([tid[0] != 0], tid[1:] != tid[:-1])))
        bounds = np.concatenate(([0], starts, [len(tid)]))
        scale = float(1 << (64 - 2 * (z + 8)))
        best = 0
        for bi in range(len(bounds) - 1):
            lo, hi = int(bounds[bi]), int(bounds[bi + 1])
            if lo == hi:
                continue
            if gamma > 0:
                prev = 0
                gap = 0.0
                cnt = 0
                for k in range(lo, hi):
                    index = int(ix[k])
                    # manage_gap (tile.cpp:720-753)
                    skip = False
                    if gap > 0:
                        if index == prev:
                            skip = True
                        elif index < prev or math.exp(
                            math.log((index - prev) / scale) * gamma
                        ) >= gap:
                            gap = 0.0
                        else:
                            skip = True
                    elif index >= prev:
                        g = (index - prev) / scale
                        if g == 0:
                            skip = True
                        elif g < 1:
                            gap = g
                            skip = True
                        else:
                            gap = 0.0
                    if not skip:
                        prev = index
                        cnt += 1
                if cnt > best:
                    best = cnt
            else:
                if hi - lo > best:
                    best = hi - lo
        max_count[z] = best
    max_features = int(50000 / (marker_width * marker_width))
    obasezoom = -1 if basezoom is None else basezoom
    bz = obasezoom
    if bz < 0:
        bz = MAXZ
        for z in range(MAXZ, -1, -1):
            if max_count[z] < max_features:
                bz = z
    if obasezoom < 0 and bz > maxzoom and prevent_basezoom_above:
        bz = maxzoom
    def _round5(x):
        # C std::round = half away from zero (round_droprate,
        # main.cpp:1236-1238); Python round() is banker's
        return math.floor(x * 100000.0 + 0.5) / 100000.0

    dr = -1.0 if droprate is None else droprate
    if obasezoom < 0 and bz > maxzoom:
        # "Working from the other direction" (main.cpp:2589-2616)
        if dr < 0:
            if maxzoom == 0:
                dr = 2.5
            else:
                dr = _round5(math.exp(math.log(
                    max_count[0] / max_count[maxzoom]) / maxzoom))
        bz = 0
        for z in range(0, maxzoom + 1):
            # C double math: log(0) = -inf, x/0.0 = ±inf
            with np.errstate(divide="ignore", invalid="ignore"):
                zoomdiff = float(np.log(np.float64(max_count[z])
                                        / max_features)
                                 / np.log(np.float64(dr)))
            if zoomdiff + z > bz:
                bz = math.ceil(zoomdiff + z)
    elif dr < 0:
        dr = 1.0
        for z in range(bz - 1, -1, -1):
            interval = math.exp(math.log(dr) * (bz - z))
            if max_count[z] / interval >= max_features:
                interval = max_count[z] / max_features
                dr = _round5(math.exp(math.log(interval) / (bz - z)))
    return bz, dr


def guess_vector_zoom(tbl, droprate: float, full_detail: int = 12,
                      low_detail: int = 12, minimum_maxzoom: int = 0,
                      cluster_distance: int = 0,
                      cluster_maxzoom: int = 24) -> tuple[int, float, int]:
    """-zg over an ingested vector feature table (main.cpp:2279-2470):
    Welford over log-gaps of the SORTED per-feature spatial indexes
    (dupes counted), per-feature within-geometry vertex spacing
    (serial.cpp:608-634), polygon area_sum for the 2M-tile cap, the
    -rp fitted droprate (sentinel -3) with the duplicate-location
    maxzoom bump. Ingest must be at geometry_scale 0 (the reference
    computes gscale from the provisional MAX_ZOOM before guessing).
    Returns (maxzoom, droprate, basezoom)."""
    import numpy as np

    from ..functions.spatial import encode_quadkey

    idx = np.sort(tbl["vindex"].to_numpy(zero_copy_only=False).astype(np.uint64))
    gaps = np.diff(idx)
    nz = gaps[gaps != 0].astype(np.float64)
    dupes = int((gaps == 0).sum())
    count = len(nz)
    if count:
        logs = np.log(nz)
        mean = float(logs.mean())
        m2 = float(((logs - mean) ** 2).sum())
    else:
        mean = m2 = 0.0

    dist_sum = 0.0
    dist_count = 0
    area_sum = 0.0
    ts = tbl["t"].to_pylist()
    for i in range(len(tbl)):
        ops = np.frombuffer(tbl["ops"][i].as_py(), dtype=np.uint8)
        xy = np.frombuffer(tbl["xy"][i].as_py(), dtype=np.int64).reshape(-1, 2)
        m = ops != 7
        if m.sum() > 1:
            locs = np.sort(encode_quadkey(
                (xy[m, 0] & ((1 << 32) - 1)).astype(np.uint64),
                (xy[m, 1] & ((1 << 32) - 1)).astype(np.uint64),
            ))
            g = np.diff(locs)
            g = g[g != 0].astype(np.float64)
            n = len(g)
            if n:
                avg = math.exp(float(np.log(g).mean()))
                dist_ft = math.sqrt(avg) / 33
                dist_sum += math.log(dist_ft) * n
                dist_count += n
        if ts[i] == 3:
            from ..functions import drawvec as dv

            area_sum += dv.get_mp_area(ops, xy)

    maxzoom = 0
    if count == 0 and dist_count == 0:
        maxzoom = minimum_maxzoom
        if droprate < 0:
            droprate = 1
    elif count > 0:
        stddev = math.sqrt(m2 / count)
        nearby = math.exp(mean - 1.5 * stddev)
        nearby_ft = math.sqrt(nearby) / 33
        want = nearby_ft / 2
        maxzoom = max(0, math.ceil(
            math.log(360 / (0.00000274 * want)) / math.log(2) - full_detail))
        # -K with -zg: extend maxzoom until typical spacing exceeds the
        # cluster mingap (main.cpp:2377-2388)
        avg = math.exp(mean)
        while (maxzoom < 32 - full_detail and maxzoom < 33 - low_detail
               and maxzoom < cluster_maxzoom and cluster_distance > 0):
            zoom_mingap = ((1 << (32 - maxzoom)) // 256 * cluster_distance) ** 2
            if avg > zoom_mingap:
                break
            maxzoom += 1
        if droprate == -3:
            stddev = max(stddev, 1e-300)
            droprate = round(math.exp(-0.7681 * math.log(stddev) + 1.582)
                             * 100000.0) / 100000.0
            if droprate < 0:
                droprate = 0
            if dupes != 0 and droprate != 0:
                # (dupes + count) / count is size_t INTEGER division in
                # the reference (main.cpp:2404)
                maxzoom += round(
                    math.log((dupes + count) // count) / math.log(droprate))
    if dist_count != 0:
        want2 = math.exp(dist_sum / dist_count) / 8
        mz = math.ceil(
            math.log(360 / (0.00000274 * want2)) / math.log(2) - full_detail)
        if mz > maxzoom or count <= 0:
            maxzoom = mz
    maxzoom = max(0, maxzoom)
    maxzoom = min(maxzoom, 32 - full_detail, 33 - low_detail)
    total = 0.0
    for i in range(1, maxzoom + 1):
        total += math.ceil(area_sum / float((1 << (32 - i)) ** 2))
        if total > 2 * 1024 * 1024:
            maxzoom = i - 1
            break
    # plain -Bg binds to the maxzoom BEFORE the --smallest-maximum-zoom-
    # guess floor (main.cpp:2457 precedes :2464); basezoom-unspecified
    # binds after (main.cpp:2480)
    premin_maxzoom = maxzoom
    maxzoom = max(maxzoom, minimum_maxzoom)
    # a still-negative droprate (-rg/-rf, or -rp with no point spacing
    # to fit) falls through to the density scan
    # (guess_basezoom_droprate_exact), exactly as in the reference
    return maxzoom, droprate, maxzoom, premin_maxzoom
