"""GeoJSON source — parse features into the engine's tables
(the reference's primary input: geojson.cpp:43-100, parse loop
geojson-loop.cpp:39; our output feeds the point pipeline's image-table
shape or the vector pyramid's drawvec feature table).

Supports bare features, newline-delimited features, FeatureCollection
documents (including pretty-printed multi-line ones) and gzip input.
All six geometry types; `tippecanoe` extension minzoom/maxzoom carried
as fmin/fmax columns for points.
"""

from __future__ import annotations

import gzip
import json

import numpy as np
import pyarrow as pa

from ..functions.spatial import lonlat_to_world

VT_POINT, VT_LINE, VT_POLYGON = 1, 2, 3


def _iter_features(path: str):
    """Pull-parse a stream of JSON objects (the reference's json_pull
    accepts FeatureCollections, bare features, newline- or
    concatenation-delimited sequences, RFC 8142 separators, and any
    pretty-printing)."""
    with open(path, "rb") as f:
        head = f.read(2)
    is_gz = head == b"\x1f\x8b" or path.endswith(".gz")
    op = gzip.open if is_gz else open
    # utf-8-sig strips a leading BOM (json_pull does the same)
    with op(path, "rt", encoding="utf-8-sig") as f:
        text = f.read()
    yield from _iter_features_text(text)


def _iter_features_text(text: str, state: dict | None = None):
    """The text-level core of _iter_features; `state` carries the
    per-FILE bare-geometry gate when the caller parses a file in
    pieces (record by record)."""
    dec = json.JSONDecoder()
    if state is None:
        state = {"found_features": 0}  # per-file bare-geometry gate
    pos = 0
    n = len(text)
    while pos < n:
        while pos < n and text[pos] in " \t\r\n,\x1e[]":
            pos += 1
        if pos >= n:
            break
        try:
            obj, pos = dec.raw_decode(text, pos)
        except json.JSONDecodeError:
            # jsonpull resilience (geojson.cpp feature callback): a
            # malformed/truncated container doesn't kill the parse —
            # complete objects nested inside it are still recognized
            # as features/geometries as they close. Step into the
            # broken region and try the next object start.
            nxt = text.find("{", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        if not isinstance(obj, dict):
            continue
        yield from _flatten(obj, state)


_GEOM_TYPE_NAMES = frozenset(
    ("Point", "MultiPoint", "LineString", "MultiLineString",
     "Polygon", "MultiPolygon"))


def _flatten(obj: dict, _state=None):
    """jsonpull close-order walk (parse_json, geojson-loop.cpp:39-146):
    Features and bare geometries are recognized wherever they appear in
    the object tree — children before their containers. A bare
    geometry is skipped inside a "geometries" array, inside a hash
    that has a "geometry" key (a Feature), under any "properties"
    value, or once ANY Feature has been found in the file; only the
    six concrete geometry type names count (a bare GeometryCollection
    contributes nothing). A Feature needs a geometry key and a
    hash-or-null properties key."""
    state = _state if _state is not None else {"found_features": 0}
    yield from _walk_json(obj, None, None, False, state)


def _walk_json(v, parent, grandparent, in_properties, state):
    if isinstance(v, list):
        for e in v:
            yield from _walk_json(e, v, parent, in_properties, state)
        return
    if not isinstance(v, dict):
        return
    for k, vv in v.items():
        yield from _walk_json(vv, v, parent,
                              in_properties or k == "properties", state)
    t = v.get("type")
    if not isinstance(t, str):
        return
    if t in _GEOM_TYPE_NAMES and state["found_features"] == 0:
        if in_properties:
            return
        if isinstance(parent, list) and isinstance(grandparent, dict) \
                and "geometries" in grandparent:
            return  # inside a GeometryCollection
        if isinstance(parent, dict) and "geometry" in parent:
            return  # inside a Feature
        yield {"type": "Feature", "properties": {}, "geometry": v}
    elif t == "Feature":
        if in_properties:
            return  # Features under a properties value are data, not
            #         input (geojson-loop.cpp:158-173)
        if "geometry" not in v or v["geometry"] is None:
            return  # "feature with no geometry" (warn + skip)
        props = v.get("properties", _MISSING)
        if props is _MISSING or not (props is None or isinstance(props, dict)):
            return  # "feature without properties hash" (warn + skip)
        state["found_features"] += 1
        yield v


_MISSING = object()


def _geom_parts(geometry: dict):
    """Yield (vt_type, parts) where parts is a list of coordinate lists
    (rings for polygons, lines for linestrings, single points)."""
    t = geometry.get("type")
    c = geometry.get("coordinates")
    if t == "Point":
        yield VT_POINT, [[c]]
    elif t == "MultiPoint":
        yield VT_POINT, [[p] for p in c]
    elif t == "LineString":
        yield VT_LINE, [c]
    elif t == "MultiLineString":
        yield VT_LINE, list(c)
    elif t == "Polygon":
        yield VT_POLYGON, [list(c)]  # one polygon: its rings
    elif t == "MultiPolygon":
        yield VT_POLYGON, [list(poly) for poly in c]
    elif t == "GeometryCollection":
        for g in geometry.get("geometries", []):
            yield from _geom_parts(g)



def _pts2(positions) -> np.ndarray:
    """Coordinate positions -> (n, 2) float64, dropping elevation and
    any extra ordinates (GeoJSON allows [lon, lat, z, ...])."""
    return np.array([(p[0], p[1]) for p in positions], np.float64).reshape(-1, 2)

def read_geojson_vector(path: str, include_points: bool = True,
                        projection: str = "EPSG:4326") -> pa.Table:
    """All features as the vector pyramid's input table (seq, t, ops,
    xy world coords). Mixed corpora ride one pipeline like the
    reference; pass include_points=False to route points to the
    dedicated point pipeline instead (read_geojson_points).
    projection: EPSG:4326 (lon/lat, default) or EPSG:3857 (meters,
    -s, projection.cpp:13-17)."""
    from ..functions.spatial import epsg3857_to_world
    from ..pipelines.vector_pyramid import features_table

    project = (epsg3857_to_world if projection == "EPSG:3857"
               else lonlat_to_world)

    rows = []
    seq = 0
    for feat in _iter_features(path):
        geom = feat.get("geometry") or {}
        tc = feat.get("tippecanoe") or {}
        fmin = int(float(tc.get("minzoom", -1)))
        fmax = int(float(tc.get("maxzoom", -1)))
        for vt, parts in _geom_parts(geom):
            if vt == VT_POINT and not include_points:
                continue
            ops_l = []
            xy_l = []
            if vt == VT_POLYGON:
                # parts = polygons, each a list of rings; a CLOSEPATH
                # after each POLYGON separates the polygons of a multi-
                # polygon so fix_polygon can reset its outer-ring
                # expectation (read_json.cpp:104-116)
                for poly in parts:
                    for ring in poly:
                        arr = _pts2(ring)
                        wx, wy = project(arr[:, 0], arr[:, 1])
                        n = len(arr)
                        ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                        xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
                    ops_l.append(np.array([7], np.uint8))
                    xy_l.append(np.zeros((1, 2), np.int64))
            else:
                for part in parts:
                    arr = _pts2(part)
                    wx, wy = project(arr[:, 0], arr[:, 1])
                    n = len(arr)
                    ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                    xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
            if ops_l:
                rows.append((seq, vt, np.concatenate(ops_l),
                             np.concatenate(xy_l), -1, -1, 0, fmin, fmax))
        seq += 1
    return features_table(rows)


def read_geojson_points(path: str) -> pa.Table:
    """Point features as (seq, wx, wy, fmin, fmax) — the point
    pipeline's narrow shape; fmin/fmax from the tippecanoe extension
    object (geojson.cpp:81-100), -1 when absent."""
    seqs, wxs, wys, fmins, fmaxs = [], [], [], [], []
    seq = 0
    for feat in _iter_features(path):
        geom = feat.get("geometry") or {}
        tc = feat.get("tippecanoe", {}) or {}
        for vt, parts in _geom_parts(geom):
            if vt != VT_POINT:
                continue
            for part in parts:
                lon, lat = float(part[0][0]), float(part[0][1])
                wx, wy = lonlat_to_world(np.array([lon]), np.array([lat]))
                seqs.append(seq)
                wxs.append(int(wx[0]))
                wys.append(int(wy[0]))
                fmins.append(int(tc.get("minzoom", -1)))
                fmaxs.append(int(tc.get("maxzoom", -1)))
        seq += 1
    return pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "wx": pa.array(wxs, pa.int64()),
            "wy": pa.array(wys, pa.int64()),
            "fmin": pa.array(fmins, pa.int16()),
            "fmax": pa.array(fmaxs, pa.int16()),
        }
    )


def reference_parallel_seqs(path: str, cpus: int | None = None,
                            initial_offset: int = 0) -> list[int] | None:
    """Per-ordinal reference `sf.seq` values for inputs the reference
    binary auto-parses in PARALLEL — RFC 7464 text sequences (first
    byte 0x1E, also behind gzip via the streamed-chunk path). In
    do_read_parallel (main.cpp:451-523) each of CPUS segments starts
    at byte offset len*i/CPUS advanced to the next 0x1E, and that
    segment's seq counter BEGINS AT ITS BYTE OFFSET (+ the cumulative
    offset of earlier inputs), incrementing once per feature — so
    `--generate-ids` ids (sf.seq + 1, serial.cpp:601-605) are
    byte-offset-based, not ordinals. Ordinal seqs are order-isomorphic
    (both increase in file order), so this only matters where the seq
    VALUE escapes into output. Returns (per-ordinal seqs, consumed
    length in the reference's overall_offset units) — or None for
    inputs the reference reads serially (where seqs are plain
    ordinals). Caveat, documented: gzipped text sequences larger than
    the reference's 10 MB PARSE_MIN are chunked by parse TIMING
    (main.cpp:1766-1830, gated on !is_parsing), so their generated ids
    are nondeterministic in the reference itself; this model treats
    the file as one chunk."""
    with open(path, "rb") as f:
        head = f.read(2)
    if head[:2] == b"\x1f\x8b" or path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            data = f.read()
    else:
        with open(path, "rb") as f:
            data = f.read()
    if not data or data[0] != 0x1E:
        return None
    if cpus is None:
        from ..pipelines.vector_pyramid import _tippecanoe_cpus_tempfiles

        cpus = _tippecanoe_cpus_tempfiles()[0]
    n = len(data)
    segs = [0] * (cpus + 1)
    segs[cpus] = n
    for i in range(1, cpus):
        s = n * i // cpus
        while s < n and data[s] != 0x1E:
            s += 1
        segs[i] = s
    # record starts: RFC 7464 JSON cannot contain a raw 0x1E byte, so
    # every occurrence is a record separator
    rec_pos = [i for i in range(n) if data[i] == 0x1E]
    rec_pos.append(n)
    state = {"found_features": 0}  # file-scoped bare-geometry gate
    out: list[int] = []
    seg_i = 0
    counter = segs[0] + initial_offset
    for r in range(len(rec_pos) - 1):
        start = rec_pos[r]
        while seg_i + 1 < cpus + 1 and start >= segs[seg_i + 1]:
            seg_i += 1
            counter = segs[seg_i] + initial_offset
        rec_text = data[start:rec_pos[r + 1]].decode(
            "utf-8", errors="replace")
        for _ in _iter_features_text(rec_text, state):
            out.append(counter)
            counter += 1
    return out, n


# ----------------------------------------------- parallel fragment read


def _is_ndjson(path: str) -> bool:
    """True when the first line is a complete JSON value — i.e. the
    file is newline-delimited features, safe to split at newlines (the
    reference's -P precondition, main.cpp:451-540: 'each feature is on
    its own line')."""
    if path.endswith(".gz"):
        return False
    with open(path, "rb") as f:
        head = f.readline(16 << 20)
    try:
        line = head.decode("utf-8").strip().rstrip(",\x1e")
        if not line:
            return False
        json.loads(line)
        return True
    except (UnicodeDecodeError, json.JSONDecodeError):
        return False


def _fragment_bounds(path: str, target_bytes: int) -> list[tuple[int, int]]:
    """Byte ranges [(start, end)) at ~target_bytes, unsnapped — each
    parse task discards the partial first line (it belongs to the
    previous fragment) and runs past `end` to finish its last record
    (the reference's split-then-snap, main.cpp:470-520)."""
    import os

    size = os.path.getsize(path)
    n = max(1, (size + target_bytes - 1) // target_bytes)
    cuts = [size * i // n for i in range(n)] + [size]
    return [(cuts[i], cuts[i + 1]) for i in range(n) if cuts[i] < cuts[i + 1]]


def _iter_fragment_features(path: str, start: int, end: int,
                            raw_numbers: bool = False):
    """Features whose record STARTS in [start, end): seek, drop the
    partial first line, then parse line records until past `end`.
    raw_numbers keeps JSON numbers as their source tokens (_RawNum) —
    required by the attribute/id side-table extraction."""
    dec = (json.JSONDecoder(parse_float=_RawNum, parse_int=_RawNum)
           if raw_numbers else json.JSONDecoder())
    with open(path, "rb") as f:
        f.seek(start)
        if start > 0:
            f.readline()  # partial line: previous fragment's record
        while f.tell() < end:
            raw = f.readline()
            if not raw:
                break
            line = raw.decode("utf-8").strip()
            # strip record separators / collection punctuation
            line = line.strip("\x1e,[] \t\r")
            if not line or line in ("{", "}"):
                continue
            try:
                obj, _ = dec.raw_decode(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict):
                yield from _flatten(obj)


def _vector_rows_of(feats, include_points: bool = True) -> list[tuple]:
    """Shared geometry flattening: feature dicts → vector feature rows
    (local_seq, t, ops, xy); the seq is LOCAL to the iteration order."""
    rows = []
    seq = 0
    for feat in feats:
        geom = feat.get("geometry") or {}
        tc = feat.get("tippecanoe") or {}
        fmin = int(float(tc.get("minzoom", -1)))
        fmax = int(float(tc.get("maxzoom", -1)))
        for vt, parts in _geom_parts(geom):
            if vt == VT_POINT and not include_points:
                continue
            ops_l = []
            xy_l = []
            if vt == VT_POLYGON:
                for poly in parts:
                    for ring in poly:
                        arr = _pts2(ring)
                        wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                        n = len(arr)
                        ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                        xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
                    ops_l.append(np.array([7], np.uint8))
                    xy_l.append(np.zeros((1, 2), np.int64))
            else:
                for part in parts:
                    arr = _pts2(part)
                    wx, wy = lonlat_to_world(arr[:, 0], arr[:, 1])
                    n = len(arr)
                    ops_l.append(np.array([1] + [2] * (n - 1), np.uint8))
                    xy_l.append(np.stack([wx, wy], axis=1).astype(np.int64))
            if ops_l:
                rows.append((seq, vt, np.concatenate(ops_l),
                             np.concatenate(xy_l), -1, -1, 0, fmin, fmax))
        seq += 1
    return rows


def _count_fragment_features(path: str, start: int, end: int) -> int:
    """Number of flattened features whose record starts in [start, end)
    — must match _iter_fragment_features exactly (seq parity)."""
    return sum(1 for _ in _iter_fragment_features(path, start, end))


def read_geojson_vector_ds(path: str, target_bytes: int = 8 << 20):
    """Line/polygon features as a MULTI-BLOCK Dataset of FEATURE_SCHEMA
    rows with globally consistent seq (file order): newline-delimited
    inputs split into ~target_bytes fragments parsed by parallel tasks
    (the reference's -P path, main.cpp:451-540); other layouts fall
    back to one parse task. A cheap parallel count pass first fixes
    each fragment's global seq base (every input feature advances seq,
    including point-only ones that emit no vector rows), so the
    parallel read is row-identical to the serial one."""
    import ray
    import ray.data

    bounds = (
        _fragment_bounds(path, target_bytes) if _is_ndjson(path) else None
    )
    if not bounds or len(bounds) == 1:
        tbl = read_geojson_vector(path)
        return ray.data.from_arrow(tbl)

    counts = ray.get([
        _count_fragment_task.remote(path, s, e) for s, e in bounds
    ])
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    frags = [
        {"start": s, "end": e, "base": int(b)}
        for (s, e), b in zip(bounds, bases)
    ]
    return _vector_ds_from_frags(path, frags)


try:  # defined lazily so importing this module never touches ray
    import ray as _ray

    @_ray.remote(num_cpus=1)
    def _count_fragment_task(path: str, start: int, end: int) -> int:
        return _count_fragment_features(path, start, end)

    @_ray.remote(num_cpus=1)
    def _attrs_fragment_task(path: str, start: int, end: int) -> dict:
        """Attrs side dict over one fragment, seqs local to the
        fragment; __n__ doubles as the seq-rebase count."""
        return _attrs_of(
            _iter_fragment_features(path, start, end, raw_numbers=True))
except ImportError:  # pragma: no cover
    _count_fragment_task = None
    _attrs_fragment_task = None


def read_geojson_parallel(path: str, target_bytes: int = 8 << 20,
                          projection: str = "EPSG:4326"):
    """(vector Dataset, attrs dict) for a fragmentable NDJSON input —
    the CLI's parallel ingest (the reference's -P path,
    main.cpp:451-540) with ONE fan-out doing double duty: each
    fragment task parses its byte range once and returns the per-seq
    attribute side dict PLUS its feature count, so the count pass that
    rebases global seqs is free. Returns None when the input isn't
    splittable (non-NDJSON / single fragment) or uses a projection the
    fragment parser doesn't handle — callers fall back to the serial
    readers."""
    import ray
    import ray.data

    if projection != "EPSG:4326" or not _is_ndjson(path):
        return None
    bounds = _fragment_bounds(path, target_bytes)
    if len(bounds) < 2:
        return None
    parts = ray.get([
        _attrs_fragment_task.remote(path, s, e) for s, e in bounds
    ])
    counts = [p["__n__"] for p in parts]
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    attrs: dict = {}
    layers: dict = {}
    strids: dict = {}
    for p, b in zip(parts, bases):
        b = int(b)
        for k, v in p.items():
            if isinstance(k, int):
                attrs[k + b] = v
        for k, v in p.get("__layers__", {}).items():
            layers[k + b] = v
        for k, v in p.get("__strids__", {}).items():
            strids[k + b] = v
    if layers:
        attrs["__layers__"] = layers
    if strids:
        attrs["__strids__"] = strids
    attrs["__n__"] = int(np.sum(counts))
    frags = [
        {"start": s, "end": e, "base": int(b)}
        for (s, e), b in zip(bounds, bases)
    ]
    return _vector_ds_from_frags(path, frags), attrs


def _vector_ds_from_frags(path: str, frags: list):
    """Fragment descriptors → multi-block Dataset of FEATURE_SCHEMA
    rows (shared by read_geojson_vector_ds / read_geojson_parallel)."""
    import ray.data

    from ..pipelines.vector_pyramid import features_table

    def parse(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            base = int(batch["base"][i].as_py())
            rows = _vector_rows_of(
                _iter_fragment_features(
                    path, int(batch["start"][i].as_py()),
                    int(batch["end"][i].as_py())
                )
            )
            rows = [(r[0] + base, *r[1:]) for r in rows]
            out.append(features_table(rows))
        if not out:
            return features_table([])
        return pa.concat_tables(out)

    return ray.data.from_items(frags).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def read_geojson_points_ds(path: str, target_bytes: int = 8 << 20):
    """Point features as a MULTI-BLOCK Dataset of the point narrow
    shape (seq, wx, wy, fmin, fmax), fragment-parallel like
    read_geojson_vector_ds with identical global seq assignment."""
    import ray
    import ray.data

    bounds = (
        _fragment_bounds(path, target_bytes) if _is_ndjson(path) else None
    )
    if not bounds or len(bounds) == 1:
        return ray.data.from_arrow(read_geojson_points(path))

    counts = ray.get([
        _count_fragment_task.remote(path, s, e) for s, e in bounds
    ])
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    frags = [
        {"start": s, "end": e, "base": int(b)}
        for (s, e), b in zip(bounds, bases)
    ]

    def parse(batch: pa.Table) -> pa.Table:
        seqs, wxs, wys, fmins, fmaxs = [], [], [], [], []
        for i in range(batch.num_rows):
            base = int(batch["base"][i].as_py())
            seq = 0
            for feat in _iter_fragment_features(
                path, int(batch["start"][i].as_py()), int(batch["end"][i].as_py())
            ):
                geom = feat.get("geometry") or {}
                tc = feat.get("tippecanoe", {}) or {}
                for vt, parts in _geom_parts(geom):
                    if vt != VT_POINT:
                        continue
                    for part in parts:
                        wx, wy = lonlat_to_world(
                            np.array([float(part[0][0])]), np.array([float(part[0][1])])
                        )
                        seqs.append(base + seq)
                        wxs.append(int(wx[0]))
                        wys.append(int(wy[0]))
                        fmins.append(int(tc.get("minzoom", -1)))
                        fmaxs.append(int(tc.get("maxzoom", -1)))
                seq += 1
        return pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "wx": pa.array(wxs, pa.int64()),
                "wy": pa.array(wys, pa.int64()),
                "fmin": pa.array(fmins, pa.int16()),
                "fmax": pa.array(fmaxs, pa.int16()),
            }
        )

    return ray.data.from_items(frags).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


# ------------------------------------------------------- attribute side table


class _RawNum(str):
    """JSON number kept as its raw token (the reference's jsonpull
    keeps the text to preserve large integers exactly)."""

    __slots__ = ()


def _iter_features_tokens(path: str):
    """_iter_features with numbers preserved as raw tokens (for the
    attribute side table; geometry readers use the float parse)."""
    with open(path, "rb") as f:
        head = f.read(2)
    is_gz = head == b"\x1f\x8b" or path.endswith(".gz")
    op = gzip.open if is_gz else open
    with op(path, "rt", encoding="utf-8-sig") as f:
        text = f.read()
    dec = json.JSONDecoder(parse_float=_RawNum, parse_int=_RawNum)
    state = {"found_features": 0}  # per-file bare-geometry gate
    pos = 0
    n = len(text)
    while pos < n:
        while pos < n and text[pos] in " \t\r\n,\x1e[]":
            pos += 1
        if pos >= n:
            break
        try:
            obj, pos = dec.raw_decode(text, pos)
        except json.JSONDecodeError:
            nxt = text.find("{", pos + 1)  # jsonpull resilience (above)
            if nxt < 0:
                break
            pos = nxt
            continue
        if not isinstance(obj, dict):
            continue
        yield from _flatten(obj, state)


_MAX_SAFE = 9007199254740991.0


def _num_token_sv(tok: str) -> str:
    """stringify_value's number path (read_json.cpp:140-149 +
    jsonpull.c large int capture): integer tokens beyond ±2^53 keep
    their exact digits; everything else prints via dtoa_milo."""
    from ..functions.text import dtoa_milo

    d = float(tok)
    plain_int = not any(c in tok for c in ".eE")
    if plain_int:
        if d > _MAX_SAFE:
            try:
                v = int(tok, 10)
            except ValueError:
                v = None
            if v is not None and 0 <= v < (1 << 64):
                return str(v)
        if d < -_MAX_SAFE:
            try:
                v = int(tok, 10)
            except ValueError:
                v = None
            if v is not None and -(1 << 63) <= v < (1 << 63):
                return str(v)
    return dtoa_milo(d)


def _json_stringify(o) -> str:
    """jsonpull json_stringify (jsonpull.c:908-996): compact separators,
    numbers via dtoa_milo / exact large ints, strings escaping only
    backslash, quote and control chars (\\u%04x)."""
    out: list[str] = []

    def emit(v):
        if isinstance(v, dict):
            out.append("{")
            for i, (k, vv) in enumerate(v.items()):
                emit(k)
                out.append(":")
                emit(vv)
                if i + 1 < len(v):
                    out.append(",")
            out.append("}")
        elif isinstance(v, list):
            out.append("[")
            for i, vv in enumerate(v):
                emit(vv)
                if i + 1 < len(v):
                    out.append(",")
            out.append("]")
        elif isinstance(v, _RawNum):
            out.append(_num_token_sv(str(v)))
        elif v is None:
            out.append("null")
        elif v is True:
            out.append("true")
        elif v is False:
            out.append("false")
        elif isinstance(v, str):
            out.append('"')
            for ch in v:
                if ch in ('\\', '"'):
                    out.append("\\" + ch)
                elif ch < " ":
                    out.append("\\u%04x" % ord(ch))
                else:
                    out.append(ch)
            out.append('"')
        else:  # plain int/float (shouldn't occur with token parsing)
            out.append(_num_token_sv(repr(v)))
    emit(o)
    return "".join(out)


def _stringify_value(value) -> tuple[str, str]:
    """stringify_value (read_json.cpp:124-168) → (type, string) with
    type in {'string','double','bool','null'}."""
    if isinstance(value, _RawNum):
        return "double", _num_token_sv(str(value))
    if value is True:
        return "bool", "true"
    if value is False:
        return "bool", "false"
    if value is None:
        return "null", "null"
    if isinstance(value, str):
        from ..functions.text import check_utf8

        err = check_utf8(value)
        if err:
            raise ValueError(err)  # read_json.cpp:136-139 (EXIT_UTF8)
        return "string", value
    return "string", _json_stringify(value)


def read_geojson_attrs(path: str) -> dict:
    """Per-feature attribute side table: seq -> (feature_id | None,
    [(key, type, stringified value), ...]) with the reference's
    serial_val stringification. The table is broadcast to the vector
    pipeline's encode actors (attributes never ride the geometry
    exchange)."""
    return _attrs_of(_iter_features_tokens(path))


def _attrs_of(feats) -> dict:
    """Attribute side-table extraction over any feature iterator, seqs
    local to the iteration (read_geojson_attrs's loop body, shared
    with the fragment-parallel task)."""
    out: dict = {}
    seq = 0
    layers: dict = {}  # seq -> per-feature layer override name
    strids: dict = {}  # seq -> raw string feature id (for -aI)
    for feat in feats:
        tc = feat.get("tippecanoe") or {}
        if isinstance(tc, dict) and isinstance(tc.get("layer"), str):
            # per-feature layer (geojson.cpp:96-100): the feature goes
            # into its own MVT layer within each tile
            layers[seq] = tc["layer"]
        props = feat.get("properties")
        rows = []
        if isinstance(props, dict):
            for k, v in props.items():
                vt, s = _stringify_value(v)
                rows.append((k, vt, s))
        fid = None
        rid = feat.get("id")
        if isinstance(rid, str):
            # string ids drop with a warning unless -aI converts them
            # later (geojson.cpp:141-166); keep the raw string so the
            # CLI can apply the conversion
            strids[seq] = rid
        if isinstance(rid, _RawNum):
            # geojson.cpp:102-140: negative ids are dropped; an exact
            # uint64 literal is kept verbatim (large_unsigned); any
            # other numeric id survives only if dtoa_milo(double) is a
            # pure integer string that strtoull round-trips (so 2.5,
            # 1e20-style exponents, and doubles past uint64 all drop)
            from ..functions.text import dtoa_milo

            tok = str(rid)
            d = float(tok)
            if d >= 0:
                if tok.isdigit() and int(tok) < (1 << 64):
                    fid = int(tok)
                else:
                    s = dtoa_milo(d)
                    if s.isdigit():
                        v = min(int(s), (1 << 64) - 1)  # strtoull clamp
                        if str(v) == s:
                            fid = v
        if rows or fid is not None:
            out[seq] = (fid, rows)
        seq += 1
    if layers:
        out["__layers__"] = layers
    if strids:
        out["__strids__"] = strids
    out["__n__"] = seq  # total feature count (incl. attribute-less)
    return out


def stringify_value_sv(value) -> tuple:
    """Public alias for the serial_val stringification (CLI
    --set-attribute JSON form)."""
    return _stringify_value(value)
