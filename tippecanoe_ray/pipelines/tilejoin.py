"""tile-join / tileset-merge / overzoom / decode / enumerate — the
reference's tileset post-processing tools (tile-join.cpp, overzoom.cpp,
decode.cpp, enumerate.cpp) re-expressed over the tile dataset
(z, x, y, n_features, tile) produced by the pyramid.

All operators are per-tile pure functions → plain ``map_batches``
stages; the CSV join is a broadcast hash join (tile-join.cpp:101-300:
CSV loaded into a map, matched per feature; `-i` = semi-join keeps only
matched features).
"""

from __future__ import annotations

import sqlite3

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..stages.mvt import (
    DEFAULT_EXTENT,
    decode_tile,
    encode_layer,
    encode_point_geometries,
    encode_tile,
)

WORLD_BITS = 32


def _feature_points(layers) -> list[tuple]:
    """Flatten decoded layers → [(layer, fid, px, py, tags)] (points)."""
    out = []
    for lay in layers:
        for f in lay["features"]:
            if f["type"] != 1 or not f["geometry"]:
                continue
            for cmd, pts in f["geometry"]:
                for px, py in pts:
                    out.append((lay["name"], f["id"], px, py, f["tags"]))
    return out


# ------------------------------------------------------------- CSV join


def join_csv(
    tile_ds: ray.data.Dataset,
    csv_table: pa.Table,
    key: str,
    semi: bool = False,
    compress: bool = True,
) -> ray.data.Dataset:
    """Join CSV attributes onto tile features by matching the CSV's
    first column against the feature attribute (or feature id when
    key == 'id'). semi=True reproduces `tile-join -i`: only features
    with a CSV match are kept (tile-join.cpp:223-273)."""
    cols = csv_table.column_names
    key_col = cols[0]
    mapping: dict = {}
    rows = csv_table.to_pylist()
    for r in rows:
        mapping[r[key_col]] = {c: r[c] for c in cols[1:]}
    map_ref = ray.put(mapping)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        out_tiles = []
        out_counts = []
        for data, nf in zip(df["tile"], df["n_features"]):
            if len(data) == 0:
                out_tiles.append(b"")
                out_counts.append(0)
                continue
            layers = decode_tile(bytes(data))
            new_layers = []
            total = 0
            for lay in layers:
                feats = []
                for f in lay["features"]:
                    k = f["id"] if key == "id" else f["tags"].get(key)
                    extra = m.get(k)
                    if extra is None and semi:
                        continue
                    tags = dict(f["tags"])
                    if extra:
                        tags.update(extra)
                    feats.append(
                        {
                            "geom": _reencode_geom(f),
                            "type": f["type"],
                            "id": f["id"],
                            "attrs": tags,
                        }
                    )
                total += len(feats)
                new_layers.append(encode_layer(lay["name"], feats, lay["extent"]))
            out_tiles.append(encode_tile(new_layers, compress=compress))
            out_counts.append(total)
        df = df.copy()
        df["tile"] = out_tiles
        df["n_features"] = out_counts
        return df[df["n_features"] > 0]

    return tile_ds.map_batches(fn, batch_format="pandas")


def csv_split(s: str) -> list[str]:
    """csv.cpp:5-40: split on commas outside double quotes; whitespace
    after a separating comma is skipped; a trailing comma yields an
    empty final field."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n and s[i] not in "\n\r":
        start = i
        within = False
        while i < n and s[i] not in "\n\r":
            if s[i] == '"':
                within = not within
            if s[i] == "," and not within:
                break
            i += 1
        out.append(s[start:i])
        if i < n and s[i] == ",":
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if i >= n or s[i] in "\r\n":
                out.append("")
                break
    return out


def csv_dequote(s: str) -> str:
    """csv.cpp:42-54: strip quotes, '""' → '"'."""
    out = []
    i = 0
    while i < len(s):
        if s[i] == '"':
            if i + 1 < len(s) and s[i + 1] == '"':
                out.append('"')
        else:
            out.append(s[i])
        i += 1
    return "".join(out)


def is_number_json(s: str) -> bool:
    """csv.cpp:114-175 — JSON number grammar, transliterated (including
    the quirk that a lone '-' followed by end-of-string is a number)."""
    t = s + "\0\0\0"
    i = 0
    c = t[i]
    i += 1
    if not (c == "-" or "0" <= c <= "9"):
        return False
    if c == "-":
        c = t[i]
        i += 1
    if c == "0":
        pass
    elif "1" <= c <= "9":
        c = t[i]
        while "0" <= c <= "9":
            i += 1
            c = t[i]
    if t[i] == ".":
        i += 1
        c = t[i]
        if not ("0" <= c <= "9"):
            return False
        while "0" <= c <= "9":
            i += 1
            c = t[i]
    c = t[i]
    if c in "eE":
        i += 1
        c = t[i]
        if c in "+-":
            i += 1
        c = t[i]
        if not ("0" <= c <= "9"):
            return False
        while "0" <= c <= "9":
            i += 1
            c = t[i]
    return t[i] == "\0"


def read_join_csv(path: str) -> tuple[list[str], dict[str, list[str]]]:
    """csv.cpp:68-111 readcsv: header fields dequoted; each line's key
    (first field) dequoted, remaining fields kept RAW (quotes intact —
    typing happens at join time); first occurrence of a key wins."""
    header: list[str] = []
    mapping: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as f:
        first = f.readline()
        if first:
            header = [csv_dequote(h) for h in csv_split(first)]
        for line in f:
            if not line:
                continue
            fields = csv_split(line)
            if not fields:
                continue
            fields[0] = csv_dequote(fields[0])
            if fields[0] not in mapping:
                mapping[fields[0]] = fields
    return header, mapping


def join_csv_exact(
    tile_ds: ray.data.Dataset,
    csv_path: str | None,
    exclude: frozenset | set = frozenset(),
    exclude_all: bool = False,
    semi: bool = False,
    empty_null: bool = False,
    compress: bool = True,
) -> ray.data.Dataset:
    """Byte-parity tile-join rewrite (tile-join.cpp:160-400): decode
    each tile keeping wire bytes, rebuild features with
    insertion-ordered attributes — original values reused verbatim,
    joined CSV columns typed by the reference's rules (quoted→string,
    JSON-number→double via the smallest-loss-free MVT value,
    empty→null under --empty-csv-columns-are-null) and REPLACING an
    existing attribute in place — then re-encode with the shared
    exact-mode layer writer (sorted/deduped value table, exact gzip).
    csv_path=None rewrites without a join (e.g. -X attribute strip).
    Empty layers and empty tiles are dropped; >500000-byte tiles are
    skipped with a warning (tile-join.cpp:880-886)."""
    header: list[str] = []
    mapping: dict[str, list[str]] = {}
    if csv_path is not None:
        header, mapping = read_join_csv(csv_path)
    map_ref = ray.put((header, mapping))
    exclude = frozenset(exclude)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        hdr, m = ray.get(map_ref)
        out_tiles = []
        out_counts = []
        for data in df["tile"]:
            enc, total = _rewrite_tile_group(
                [bytes(data)] if len(data) else [], hdr, m, exclude,
                exclude_all, semi, empty_null, compress)
            out_tiles.append(enc)
            out_counts.append(total)
        df = df.copy()
        df["tile"] = out_tiles
        df["n_features"] = out_counts
        return df[df["n_features"] > 0]

    return tile_ds.map_batches(fn, batch_format="pandas")


def _ctrunc_scale(v: int, num: int, den: int) -> int:
    """C++ long long `v * num / den` (truncation toward zero)."""
    p = v * num
    q = abs(p) // den
    return q if p >= 0 else -q


def _scale_draws(draws: list, num: int, den: int) -> list:
    return [
        (cmd, [(_ctrunc_scale(x, num, den), _ctrunc_scale(y, num, den))
               for x, y in pts])
        for cmd, pts in draws
    ]


def _geom_raw_to_draws(geom_raw: bytes) -> list:
    from ..stages.mvt import _decode_geometry, _read_varint

    vals = []
    pos = 0
    while pos < len(geom_raw):
        v, pos = _read_varint(geom_raw, pos)
        vals.append(v)
    return _decode_geometry(vals)


def _rewrite_tile_group(
    tiles: list[bytes],
    hdr: list[str],
    mapping: dict,
    exclude: frozenset,
    exclude_all: bool,
    semi: bool,
    empty_null: bool,
    compress: bool,
    keep_layers: frozenset = frozenset(),
    remove_layers: frozenset = frozenset(),
    renames: dict | None = None,
    zxy: tuple[int, int, int] | None = None,
    stats: dict | None = None,
    feature_filter=None,
    include: frozenset = frozenset(),
    no_size_limit: bool = False,
    exclude_all_tile_attrs: bool = False,
    exclude_all_tile_geoms: bool = False,
) -> tuple[bytes, int]:
    """The append_tile accumulation (tile-join.cpp:105-400) over all
    input tiles sharing one (z, x, y): layers found-or-created by name
    in first-seen order; on an extent mismatch the smaller side is
    scaled UP with C-truncating integer math (existing features when
    the incoming layer is finer, incoming features otherwise); features
    rebuilt with insertion-ordered attributes and the CSV join rules.
    Returns (encoded tile bytes or b'', feature count) — empty layers
    dropped, >500000-byte tiles skipped (tile-join.cpp:866-886)."""
    from ..stages.mvt import decode_tile_raw, serial_val_of_raw

    out_layers: list[dict] = []  # {name, extent, feats: [...]}
    by_name: dict[str, int] = {}
    for data in tiles:
        if not data:
            continue
        for lay in decode_tile_raw(data):
            name = lay["name"]
            if renames and name in renames:
                name = renames[name]
            if keep_layers and name not in keep_layers:
                continue
            if name in remove_layers:
                continue
            ol = by_name.get(name)
            if ol is None:
                ol = len(out_layers)
                by_name[name] = ol
                out_layers.append(
                    {"name": name, "extent": lay["extent"], "feats": []})
            out = out_layers[ol]
            if lay["extent"] != out["extent"]:
                if lay["extent"] > out["extent"]:
                    # scale UP the already-accumulated features
                    # (tile-join.cpp:149-162)
                    for f in out["feats"]:
                        draws = (f["draws"] if f.get("draws") is not None
                                 else _geom_raw_to_draws(f["geom"]))
                        f["draws"] = _scale_draws(
                            draws, lay["extent"], out["extent"])
                        f["geom"] = None
                    out["extent"] = lay["extent"]
            keys = lay["keys"]
            vraw = lay["values_raw"]
            feats_in = lay["features"]
            if feature_filter is not None and feats_in:
                # -j: evaluated per feature BEFORE the join/attr pass
                # (tile-join.cpp:182); batch the layer through the
                # same oracle-checked expression evaluator as the
                # tiler's -j
                from ..stages.mvt import _decode_value

                tname = {1: "Point", 2: "LineString", 3: "Polygon"}
                recs = []
                for f in feats_in:
                    ti = f["tag_idx"]
                    rec = {keys[ti[t]]: _decode_value(vraw[ti[t + 1]])
                           for t in range(0, len(ti) - 1, 2)}
                    rec["$__type"] = tname.get(f["type"], "Point")
                    rec["$__id"] = f["id"]
                    recs.append(rec)
                fdf = pd.DataFrame(recs)
                keep = feature_filter.mask(
                    fdf, zoom=(zxy[0] if zxy else 0), layer=name,
                    type_col="$__type", id_col="$__id")
                feats_in = [f for f, k in zip(feats_in, keep) if k]
            for f in feats_in:
                attrs: dict = {}
                matched = False
                ti = f["tag_idx"]
                for t in range(0, len(ti) - 1, 2):
                    key = keys[ti[t]]
                    raw = vraw[ti[t + 1]]
                    vt, sv = serial_val_of_raw(raw)
                    if vt == "null":
                        continue
                    # include (-y) overrides -X/-x (tile-join.cpp:217);
                    # --exclude-all-tile-attributes drops everything,
                    # -y included (tile-join.cpp:216,289 gate both
                    # insert sites but not the CSV match lookup)
                    if (not exclude_all_tile_attrs
                            and (key in include
                                 or (not exclude_all and key not in exclude))
                            and key not in attrs):
                        attrs[key] = ("raw", raw, vt, sv)
                    if hdr and key == hdr[0]:
                        row = mapping.get(sv)
                        if row is not None:
                            matched = True
                            for i in range(1, min(len(row), len(hdr))):
                                joinkey = hdr[i]
                                joinval = row[i]
                                jt = "string"
                                if joinval:
                                    if joinval[0] == '"':
                                        joinval = csv_dequote(joinval)
                                    elif is_number_json(joinval):
                                        jt = "double"
                                elif empty_null:
                                    jt = "null"
                                # joined columns SURVIVE
                                # --exclude-all-tile-attributes: only
                                # the original-attribute inserts are
                                # gated (tile-join.cpp:216,289 vs the
                                # ungated join insert at :268)
                                if (joinkey in include
                                        or (not exclude_all
                                            and joinkey not in exclude
                                            and jt != "null")):
                                    attrs[joinkey] = (jt, joinval, jt, joinval)
                if semi and not matched:
                    continue
                nf = {
                    "geom": f["geom_raw"],
                    "draws": None,
                    "type": f["type"],
                    "id": f["id"],
                    "attrs_sv": [(k, v[0], v[1]) for k, v in attrs.items()],
                    "attrs_stats": [(k, v[2], v[3]) for k, v in attrs.items()],
                }
                if lay["extent"] != out["extent"]:
                    # incoming layer is coarser: scale it up on emission
                    # (tile-join.cpp:334-339)
                    nf["draws"] = _scale_draws(
                        _geom_raw_to_draws(f["geom_raw"]),
                        out["extent"], lay["extent"])
                    nf["geom"] = None
                if exclude_all_tile_geoms:
                    # --exclude-all-tile-geometries: outfeature.type
                    # = -1 (tile-join.cpp:328-329) — serialized with
                    # neither type nor geometry fields; the tilestats
                    # geometry counters still see the ORIGINAL type
                    nf["geom"] = b""
                    nf["draws"] = None
                    nf["no_geom"] = True
                out["feats"].append(nf)
    enc_layers = []
    total = 0
    for out in out_layers:
        if not out["feats"]:
            continue
        feats = []
        for f in out["feats"]:
            geom = (f["geom"] if f["geom"] is not None
                    else _reencode_geom({"geometry": f["draws"]}))
            feats.append({"geom": geom,
                          "type": None if f.get("no_geom") else f["type"],
                          "id": f["id"], "attrs_sv": f["attrs_sv"]})
        total += len(feats)
        if stats is not None and zxy is not None:
            _accumulate_join_stats(stats, out, zxy)
        enc_layers.append(encode_layer(out["name"], feats, out["extent"]))
    if not enc_layers:
        return b"", 0
    enc = encode_tile(enc_layers, compress=compress, exact_gzip=True)
    if len(enc) > 500000 and not no_size_limit:  # -pk lifts the cap
        return b"", 0
    return enc, total


def _accumulate_join_stats(stats: dict, out: dict, zxy) -> None:
    """Per-(tile, layer) metadata accumulation (tile-join.cpp:305-408):
    layermap zoom range + geometry-type counters + add_to_tilestats per
    written attribute, and the world-bbox walk over pinned geometry
    (both the plain and the antimeridian-shifted lon range)."""
    from ..stages.metadata import LayerEntry, add_to_tilestats, tile2lonlat

    z, x, y = zxy
    lmap = stats.setdefault("layers", {})
    ent = lmap.get(out["name"])
    if ent is None:
        ent = lmap[out["name"]] = LayerEntry()
        ent.minzoom = z
        ent.maxzoom = z
    extent = out["extent"]
    span = 1 << (32 - z)
    minx = miny = 1 << 62
    maxx = maxy = -(1 << 62)
    minx2, maxx2 = 1 << 62, -(1 << 62)
    for f in out["feats"]:
        for k, vt, sv in f["attrs_stats"]:
            add_to_tilestats(ent.tilestats, k, vt, sv)
        if f["type"] == 1:
            ent.points += 1
        elif f["type"] == 2:
            ent.lines += 1
        elif f["type"] == 3:
            ent.polygons += 1
        if z < ent.minzoom:
            ent.minzoom = z
        if z > ent.maxzoom:
            ent.maxzoom = z
        draws = (f["draws"] if f["draws"] is not None
                 else _geom_raw_to_draws(f["geom"]))
        for cmd, pts in draws:
            if cmd not in (1, 2):
                continue
            for gx0, gy0 in pts:
                gx = min(extent, max(0, gx0))
                gy = min(extent, max(0, gy0))
                gx = gx * span // extent + span * x
                gy = gy * span // extent + span * y
                minx = min(minx, gx)
                miny = min(miny, gy)
                maxx = max(maxx, gx)
                maxy = max(maxy, gy)
                if gx < 1 << 31:  # western hemisphere: try shifting east
                    gx += 1 << 32
                minx2 = min(minx2, gx)
                maxx2 = max(maxx2, gx)
    if maxx < minx:
        return
    bb = stats.setdefault(
        "bbox", {"minlat": 999.0, "minlon": 999.0, "maxlat": -999.0,
                 "maxlon": -999.0, "minlon2": 999.0, "maxlon2": -999.0})
    lon1, lat1 = tile2lonlat(minx, maxy, 32)
    lon2, lat2 = tile2lonlat(maxx, miny, 32)
    bb["minlat"] = min(bb["minlat"], min(lat1, lat2))
    bb["minlon"] = min(bb["minlon"], min(lon1, lon2))
    bb["maxlat"] = max(bb["maxlat"], max(lat1, lat2))
    bb["maxlon"] = max(bb["maxlon"], max(lon1, lon2))
    lon1, _ = tile2lonlat(minx2, maxy, 32)
    lon2, _ = tile2lonlat(maxx2, miny, 32)
    bb["minlon2"] = min(bb["minlon2"], min(lon1, lon2))
    bb["maxlon2"] = max(bb["maxlon2"], max(lon1, lon2))


def _join_stats_to_row(stats: dict) -> dict:
    """LayerEntry objects → a plain nested dict (Arrow/pandas-safe)."""
    layers = {}
    for name, ent in stats.get("layers", {}).items():
        layers[name] = {
            "points": ent.points, "lines": ent.lines,
            "polygons": ent.polygons, "minzoom": ent.minzoom,
            "maxzoom": ent.maxzoom,
            "ts": {k: {"mask": t.type_mask, "min": t.min, "max": t.max,
                       "samples": list(t.sample_values)}
                   for k, t in ent.tilestats.items()},
        }
    return {"layers": layers, "bbox": stats.get("bbox")}


def merge_join_stats(rows: list[dict]):
    """Reduce the per-tile partials into one layermap + bbox — the
    reference's merge_layermaps (mbtiles.cpp:836-915; sample sets keep
    the cap-smallest distinct values, which is order-independent)."""
    import bisect

    from ..stages.metadata import (
        MAX_TILESTATS_SAMPLE_VALUES, LayerEntry, Tilestat,
    )

    lmap: dict[str, LayerEntry] = {}
    bbox = {"minlat": 999.0, "minlon": 999.0, "maxlat": -999.0,
            "maxlon": -999.0, "minlon2": 999.0, "maxlon2": -999.0}
    for row in rows:
        if not row:
            continue
        for name, le in row.get("layers", {}).items():
            ent = lmap.get(name)
            if ent is None:
                ent = lmap[name] = LayerEntry()
                ent.minzoom = le["minzoom"]
                ent.maxzoom = le["maxzoom"]
            ent.minzoom = min(ent.minzoom, le["minzoom"])
            ent.maxzoom = max(ent.maxzoom, le["maxzoom"])
            ent.points += le["points"]
            ent.lines += le["lines"]
            ent.polygons += le["polygons"]
            for k, td in le["ts"].items():
                ts = ent.tilestats.get(k)
                if ts is None:
                    ts = ent.tilestats[k] = Tilestat()
                ts.type_mask |= td["mask"]
                ts.min = min(ts.min, td["min"])
                ts.max = max(ts.max, td["max"])
                for val in td["samples"]:
                    val = (val[0], val[1])
                    sv = ts.sample_values
                    pt = bisect.bisect_left(sv, val)
                    if pt == len(sv) or sv[pt] != val:
                        if len(sv) >= MAX_TILESTATS_SAMPLE_VALUES:
                            if pt < len(sv):
                                sv.insert(pt, val)
                                sv.pop()
                        else:
                            sv.insert(pt, val)
        b = row.get("bbox")
        if b:
            bbox["minlat"] = min(bbox["minlat"], b["minlat"])
            bbox["minlon"] = min(bbox["minlon"], b["minlon"])
            bbox["maxlat"] = max(bbox["maxlat"], b["maxlat"])
            bbox["maxlon"] = max(bbox["maxlon"], b["maxlon"])
            bbox["minlon2"] = min(bbox["minlon2"], b["minlon2"])
            bbox["maxlon2"] = max(bbox["maxlon2"], b["maxlon2"])
    return lmap, bbox


def reduce_join_stats(ds: ray.data.Dataset) -> list[dict]:
    """Tree-reduce the per-tile __stats__ partials inside tasks (one
    merged partial per block reaches the driver — the layermap merge is
    associative, so this equals the flat merge at any tile count)."""
    import json as _json

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = [_json.loads(s) for s in df["__stats__"]]
        lmap, bbox = merge_join_stats(rows)
        return pd.DataFrame({"__stats__": [
            _json.dumps(_join_stats_to_row({"layers": lmap, "bbox": bbox}))
        ]})

    out = ds.select_columns(["__stats__"]).map_batches(
        partial, batch_format="pandas")
    return [_json.loads(r["__stats__"]) for r in out.take_all()]


def gather_input_metadata(paths: list[str],
                          minzoom: int | None = None,
                          maxzoom: int | None = None,
                          final_keys: dict | None = None) -> dict:
    """The reference's per-reader metadata merge (tile-join.cpp:
    1120-1255), iterating inputs in the readers' FINAL priority order —
    each reader ends positioned at its last tile, so the order is by
    (last z, x, tms_y, tile bytes). name concatenates with ' + ' while
    under 255 chars; attribution/description/center are last-wins;
    generator_options join with '; '; per-zoom strategies counters add;
    input vector_layers seed layer descriptions and attribute
    descriptions; min/maxzoom rows clamp to -Z/-z."""
    import json as _json

    import os as _os

    def last_key(path):
        if path.endswith(".pmtiles"):
            from ..stages.decode_json import _pmtiles_meta_and_entries

            entries, _ = _pmtiles_meta_and_entries(path)
            if not entries:
                return (-1, -1, -1, b"")
            z, x, y, data = entries[-1]  # already (z, x, tms_y) sorted
            return (z, x, (1 << z) - 1 - y, data)
        if _os.path.isdir(path):
            best = None
            for zs in _os.listdir(path):
                zp = _os.path.join(path, zs)
                if not zs.isdigit() or not _os.path.isdir(zp):
                    continue
                z = int(zs)
                for xs in _os.listdir(zp):
                    for yf in _os.listdir(_os.path.join(zp, xs)):
                        if yf.endswith(".pbf"):
                            tms = (1 << z) - 1 - int(yf[:-4])
                            k = (z, int(xs), tms,
                                 _os.path.join(zp, xs, yf))
                            if best is None or k[:3] > best[:3]:
                                best = k
            if best is None:
                return (-1, -1, -1, b"")
            with open(best[3], "rb") as f:
                return (best[0], best[1], best[2], f.read())
        con = sqlite3.connect("file:" + path + "?mode=ro", uri=True)
        try:
            row = con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
                "ORDER BY zoom_level DESC, tile_column DESC, tile_row DESC "
                "LIMIT 1").fetchone()
            if row is None:
                return (-1, -1, -1, b"")
            return (int(row[0]), int(row[1]), int(row[2]), bytes(row[3]))
        finally:
            con.close()

    out = {
        "name": "", "description": "", "attribution": "",
        "midlon": 0.0, "midlat": 0.0,
        "minzoom": 1 << 30, "maxzoom": -(1 << 30),
        "generator_options": "", "strategies": [],
        "layer_descriptions": {}, "attribute_descriptions": {},
    }
    # under -O the readers end at their minimum level-(target+1)
    # overzoom candidate instead of their last real tile; the caller
    # passes those keys (overzoom_exact.overzoom_final_key)
    key_fn = (lambda p: final_keys[p]) if final_keys else last_key
    for path in sorted(paths, key=key_fn):
        if path.endswith(".pmtiles"):
            from ..stages.decode_json import _pmtiles_meta_and_entries

            _, md = _pmtiles_meta_and_entries(path)
        elif _os.path.isdir(path):
            mdp = _os.path.join(path, "metadata.json")
            md = {}
            if _os.path.exists(mdp):
                with open(mdp, encoding="utf-8") as f:
                    md = {k: str(v) for k, v in _json.load(f).items()}
        else:
            con = sqlite3.connect("file:" + path + "?mode=ro", uri=True)
            md = dict(con.execute("SELECT name, value FROM metadata"))
            con.close()
        if "minzoom" in md:
            minz = int(float(md["minzoom"]))
            if minzoom is not None:
                minz = max(minz, minzoom)
            out["minzoom"] = min(out["minzoom"], minz)
        if "maxzoom" in md:
            maxz = int(float(md["maxzoom"]))
            if maxzoom is not None:
                maxz = min(maxz, maxzoom)
            out["maxzoom"] = max(out["maxzoom"], maxz)
        if "center" in md:
            parts = md["center"].split(",")
            if len(parts) >= 2:
                out["midlon"], out["midlat"] = float(parts[0]), float(parts[1])
        if md.get("attribution"):
            out["attribution"] = md["attribution"]
        if md.get("description"):
            out["description"] = md["description"]
        if md.get("name"):
            if not out["name"]:
                out["name"] = md["name"]
            else:
                proposed = out["name"] + " + " + md["name"]
                if len(proposed) < 255:
                    out["name"] = proposed
        if md.get("json"):
            try:
                j = _json.loads(md["json"])
            except ValueError:
                j = None
            if isinstance(j, dict):
                for vl in j.get("vector_layers") or []:
                    if not isinstance(vl, dict):
                        continue
                    if isinstance(vl.get("id"), str) and vl.get("description"):
                        out["layer_descriptions"][vl["id"]] = vl["description"]
                    flds = vl.get("fields")
                    if isinstance(flds, dict):
                        for k, v in flds.items():
                            if (isinstance(v, str) and v not in
                                    ("Number", "String", "Boolean", "Mixed")
                                    and k not in out["attribute_descriptions"]):
                                out["attribute_descriptions"][k] = v
        if md.get("generator_options"):
            if out["generator_options"]:
                out["generator_options"] += "; " + md["generator_options"]
            else:
                out["generator_options"] = md["generator_options"]
        if md.get("strategies"):
            try:
                arr = _json.loads(md["strategies"])
            except ValueError:
                arr = []
            key_map = {"tile_size_desired": "tile_size",
                       "feature_count_desired": "feature_count"}
            if isinstance(arr, list):
                for i, h in enumerate(arr):
                    if isinstance(h, dict):
                        for k, v in h.items():
                            # the vector grows only when a counter is
                            # actually set, so trailing {} entries are
                            # truncated (handle_strategies resize-on-set)
                            while len(out["strategies"]) <= i:
                                out["strategies"].append({})
                            k = key_map.get(k, k)
                            out["strategies"][i][k] = (
                                out["strategies"][i].get(k, 0) + int(v))
    return out


def tilejoin_metadata(
    stats_rows: list[dict],
    inputs_meta: dict,
    commandline: str = "",
    set_name: str | None = None,
    set_description: str | None = None,
    set_attribution: str | None = None,
    no_tilestats: bool = False,
    tilestats_attributes_limit: int | None = None,
    tilestats_sample_values_limit: int | None = None,
    tilestats_values_limit: int | None = None,
    sentinel_bounds: bool = False,
) -> dict[str, str]:
    """Final metadata assembly (tile-join.cpp:1628-1667 +
    make_metadata): -n/-N/-A overrides, own command line appended to
    generator_options, zooms re-derived from the layermap (the zooms
    actually written), degenerate-bbox guard, antimeridian narrowing,
    per-layer zooms preserved."""
    from ..stages.metadata import (
        MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES,
        MAX_TILESTATS_VALUES, _sixdig, make_metadata,
    )
    from ..stages.strategies import stringify_strategies

    lmap, bbox = merge_join_stats(stats_rows)
    for name, desc in inputs_meta["layer_descriptions"].items():
        if name in lmap:
            lmap[name].description = desc
    name = set_name or inputs_meta["name"]
    description = set_description or inputs_meta["description"]
    attribution = set_attribution or inputs_meta["attribution"] or None
    gen = inputs_meta["generator_options"]
    gen = gen + "; " + commandline if gen else commandline
    minzoom = min((e.minzoom for e in lmap.values()), default=0)
    maxzoom = max((e.maxzoom for e in lmap.values()), default=0)
    b = dict(bbox)
    if b["maxlon"] < b["minlon"]:
        if sentinel_bounds:
            # --exclude-all-tile-geometries: no geometry ever updates
            # the reference's INT_MIN/INT_MAX-seeded world bbox, and
            # make_metadata converts the sentinels unguarded —
            # lon = x*360 ± 180 of INT_MIN/INT_MAX, lat clamped ±90
            b["minlon"] = b["minlon2"] = -2147483648.0 * 360.0 - 180.0
            b["maxlon"] = b["maxlon2"] = 2147483647.0 * 360.0 + 180.0
            b["minlat"] = -90.0
            b["maxlat"] = 90.0
        else:
            for k in b:
                b[k] = 0.0
    if b["maxlon"] - b["minlon"] <= b["maxlon2"] - b["minlon2"]:
        b["minlon2"], b["maxlon2"] = b["minlon"], b["maxlon"]
    bc = {
        "minlat": _sixdig(b["minlat"]), "minlon": _sixdig(b["minlon"]),
        "maxlat": _sixdig(b["maxlat"]), "maxlon": _sixdig(b["maxlon"]),
        "minlat2": _sixdig(b["minlat"]), "minlon2": _sixdig(b["minlon2"]),
        "maxlat2": _sixdig(b["maxlat"]), "maxlon2": _sixdig(b["maxlon2"]),
        "midlat": _sixdig(inputs_meta["midlat"]),
        "midlon": _sixdig(inputs_meta["midlon"]),
    }
    return make_metadata(
        name, minzoom, maxzoom, bc, lmap,
        description=description, attribution=attribution,
        # stringify_strategies returns "" unless ANY counter is set
        # (the `any` gate, mbtiles.cpp:372-460), so all-empty inputs
        # write no strategies row
        strategies_json=(stringify_strategies(inputs_meta["strategies"])
                         if any(h for h in inputs_meta["strategies"])
                         else ""),
        generator_options=gen,
        do_tilestats=not no_tilestats,
        attribute_descriptions=inputs_meta["attribute_descriptions"],
        elements=(tilestats_values_limit if tilestats_values_limit is not None
                  else MAX_TILESTATS_VALUES),
        attributes_cap=(tilestats_attributes_limit
                        if tilestats_attributes_limit is not None
                        else MAX_TILESTATS_ATTRIBUTES),
        sample_cap=(tilestats_sample_values_limit
                    if tilestats_sample_values_limit is not None
                    else MAX_TILESTATS_SAMPLE_VALUES),
        overwrite_layer_zooms=False,
    )


def merge_tilesets_exact(
    tile_dss: list[ray.data.Dataset],
    csv_path: str | None = None,
    exclude: frozenset | set = frozenset(),
    exclude_all: bool = False,
    semi: bool = False,
    empty_null: bool = False,
    keep_layers: frozenset | set = frozenset(),
    remove_layers: frozenset | set = frozenset(),
    renames: dict | None = None,
    compress: bool = True,
    with_stats: bool = False,
    feature_filter=None,
    include: frozenset | set = frozenset(),
    no_size_limit: bool = False,
    exclude_all_tile_attrs: bool = False,
    exclude_all_tile_geoms: bool = False,
) -> ray.data.Dataset:
    """Byte-parity tile-join over N input tilesets: tiles grouped by
    (z, x, y), inputs accumulated in argument order (the reference's
    append_tile call order), then the shared rewrite. The group-by is
    the only shuffle and moves tile bytes once. with_stats adds a
    __stats__ JSON column of per-tile metadata partials (layermap +
    bbox) for tilejoin_metadata."""
    header: list[str] = []
    mapping: dict[str, list[str]] = {}
    if csv_path is not None:
        header, mapping = read_join_csv(csv_path)
    map_ref = ray.put((header, mapping))
    exclude = frozenset(exclude)
    keep_layers = frozenset(keep_layers)
    remove_layers = frozenset(remove_layers)

    tagged = []
    for i, ds in enumerate(tile_dss):
        def tag(df: pd.DataFrame, i=i) -> pd.DataFrame:
            df = df.copy()
            if "n_features" not in df.columns:  # read_mbtiles: (z,x,y,tile)
                df["n_features"] = 0
            df["__input__"] = i
            return df[["z", "x", "y", "n_features", "tile", "__input__"]]

        tagged.append(ds.map_batches(tag, batch_format="pandas"))
    merged = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        hdr, m = ray.get(map_ref)
        # readers at the same (z, x, y) pop in LEXICOGRAPHIC tile-bytes
        # order (tileset_reader::operator< final tie-break on `data`,
        # tile-join.cpp:788-790), not in argument order
        blobs = sorted(bytes(t) for t in g["tile"] if len(t))
        zxy = (int(g["z"].iloc[0]), int(g["x"].iloc[0]), int(g["y"].iloc[0]))
        stats: dict | None = {} if with_stats else None
        enc, total = _rewrite_tile_group(
            blobs, hdr, m, exclude,
            exclude_all, semi, empty_null, compress,
            keep_layers, remove_layers, renames,
            zxy=zxy, stats=stats, feature_filter=feature_filter,
            include=frozenset(include), no_size_limit=no_size_limit,
            exclude_all_tile_attrs=exclude_all_tile_attrs,
            exclude_all_tile_geoms=exclude_all_tile_geoms)
        cols = {"z": "int64", "x": "int64", "y": "int64",
                "n_features": "int64", "tile": "object"}
        if total == 0:
            empty = {k: [] for k in cols}
            if with_stats:
                empty["__stats__"] = []
            return pd.DataFrame(empty).astype(cols)
        row = {
            "z": [zxy[0]], "x": [zxy[1]], "y": [zxy[2]],
            "n_features": [total], "tile": [enc],
        }
        if with_stats:
            row["__stats__"] = [_json.dumps(_join_stats_to_row(stats))]
        return pd.DataFrame(row)

    return merged.groupby(["z", "x", "y"]).map_groups(
        per_tile, batch_format="pandas")


def _reencode_geom(f: dict) -> bytes:
    """Re-encode a decoded feature's geometry commands."""
    from ..stages.mvt import CLOSEPATH, LINETO, MOVETO, varint_array, zigzag

    vals: list[int] = []
    px = py = 0
    for cmd, pts in f["geometry"]:
        if cmd == CLOSEPATH:
            vals.append((1 << 3) | CLOSEPATH)
            continue
        vals.append((len(pts) << 3) | cmd)
        for x, y in pts:
            d = zigzag(np.array([x - px, y - py]))
            vals += [int(d[0]), int(d[1])]
            px, py = x, y
    return varint_array(np.array(vals, dtype=np.uint64))


# --------------------------------------------------------- tileset merge


def merge_tilesets(*tile_dss: ray.data.Dataset, compress: bool = True) -> ray.data.Dataset:
    """N tilesets → one: tiles with the same (z,x,y) merged layer-wise;
    same-name layers concatenate their features (tile-join.cpp:118-165).
    union → groupby(z,x,y) → per-group merge."""
    ds = tile_dss[0]
    for other in tile_dss[1:]:
        ds = ds.union(other)

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 1:
            return df[["z", "x", "y", "n_features", "tile"]]
        by_name: dict[str, dict] = {}
        order: list[str] = []
        total = 0
        for data in df["tile"]:
            if len(data) == 0:
                continue
            for lay in decode_tile(bytes(data)):
                if lay["name"] not in by_name:
                    by_name[lay["name"]] = {"extent": lay["extent"], "features": []}
                    order.append(lay["name"])
                by_name[lay["name"]]["features"].extend(lay["features"])
        layers = []
        for name in order:
            lay = by_name[name]
            feats = [
                {"geom": _reencode_geom(f), "type": f["type"], "id": f["id"],
                 "attrs": f["tags"]}
                for f in lay["features"]
            ]
            total += len(feats)
            layers.append(encode_layer(name, feats, lay["extent"]))
        return pd.DataFrame(
            {
                "z": [df["z"].iloc[0]],
                "x": [df["x"].iloc[0]],
                "y": [df["y"].iloc[0]],
                "n_features": [total],
                "tile": [encode_tile(layers, compress=compress)],
            }
        )

    return (
        ds.select_columns(["z", "x", "y", "n_features", "tile"])
        .groupby(["z", "x", "y"])
        .map_groups(merge_group, batch_format="pandas")
    )


# -------------------------------------------------------------- overzoom


def overzoom_tiles(
    tile_ds: ray.data.Dataset,
    compress: bool = True,
    dedup_by_id: bool = False,
    buffer: int = 0,
    demultiply: bool = False,
    same_tile: bool = False,
) -> ray.data.Dataset:
    """Each zoom-z tile → up to 4 zoom-(z+1) children, all geometry
    types, reproducing overzoom() (clip.cpp:1453-1660): decode to world
    coordinates (closepath → explicit ring closure), offset to the
    child tile, bbox quick exclusion, type-specific clip with `buffer`
    (the tippecanoe-overzoom tool default is 5; 0 keeps the historical
    inclusive-edge point behavior), to_tile_scale, noop removal and
    polygon cleaning. dedup_by_id keeps the first feature per
    (layer, id) (clip.cpp:1470-1509)."""
    from ..functions import drawvec as dv

    WORLD_BITS = 32

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"z": [], "x": [], "y": [], "n_features": [], "tile": []}
        for z, x, y, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            if len(data) == 0:
                continue
            layers = decode_tile(bytes(data))
            z, x, y = int(z), int(x), int(y)
            tilesize = 1 << (WORLD_BITS - z)
            nz = z if same_tile else z + 1
            outtilesize = 1 << (WORLD_BITS - nz)
            child_range = ((0,),) if same_tile else ((0, 1), (0, 1))
            for dx in (0,) if same_tile else (0, 1):
                for dy in (0,) if same_tile else (0, 1):
                    nx = x if same_tile else 2 * x + dx
                    ny = y if same_tile else 2 * y + dy
                    out_layers = []
                    total = 0
                    seen: set = set()
                    for lay in layers:
                        extent = lay["extent"]
                        det = int(round(np.log2(extent)))
                        feats = []
                        pending: list[dict] = []

                        def flush(pending=None, feats_ref=None):
                            if pending:
                                feats_ref.append(pending[0])
                                pending.clear()

                        for f in lay["features"]:
                            t = f["type"]
                            is_first = False
                            if demultiply:
                                tags = dict(f.get("tags", {}))
                                if tags.pop("tippecanoe:retain_points_multiplier_first", None):
                                    is_first = True
                                tags.pop("tippecanoe:retain_points_multiplier_sequence", None)
                                f = dict(f)
                                f["tags"] = tags
                                if is_first:
                                    flush(pending, feats)
                            # decode to world coords; closepath becomes
                            # an explicit closing point (clip.cpp:1521-35)
                            ops_l: list[int] = []
                            xy_l: list[tuple[int, int]] = []
                            ring_closure = (0, 0)
                            for cmd, ps in f["geometry"]:
                                if cmd == 7:
                                    ops_l.append(2)
                                    xy_l.append(ring_closure)
                                    continue
                                for k, (px, py) in enumerate(ps):
                                    wxp = px * tilesize // extent + x * tilesize
                                    wyp = py * tilesize // extent + y * tilesize
                                    ops_l.append(1 if (cmd == 1) else 2)
                                    xy_l.append((wxp, wyp))
                                    if cmd == 1:
                                        ring_closure = (wxp, wyp)
                            ops = np.array(ops_l, np.uint8)
                            xy = np.array(xy_l, np.int64).reshape(-1, 2)
                            # offset to child tile, world scale
                            xy = xy - np.array([nx * outtilesize, ny * outtilesize])
                            b = outtilesize * buffer // 256
                            bb = dv.geom_bbox(xy)
                            if bb is None or bb[2] < -b or bb[3] < -b or bb[0] > outtilesize + b or bb[1] > outtilesize + b:
                                if dedup_by_id and f.get("id") is not None:
                                    seen.add((lay["name"], f["id"]))
                                continue
                            if t == 2:
                                ops, xy = dv.clip_lines(ops, xy, -b, -b, outtilesize + b, outtilesize + b)
                            elif t == 3:
                                ops, xy = dv.simple_clip_poly(ops, xy, -b, -b, outtilesize + b, outtilesize + b)
                            else:
                                m = (
                                    (xy[:, 0] >= -b) & (xy[:, 1] >= -b)
                                    & (xy[:, 0] <= outtilesize + b)
                                    & (xy[:, 1] <= outtilesize + b)
                                )
                                ops, xy = ops[m], xy[m]
                            if len(ops) == 0:
                                if dedup_by_id and f.get("id") is not None:
                                    seen.add((lay["name"], f["id"]))
                                continue
                            if dedup_by_id and f.get("id") is not None:
                                kkey = (lay["name"], f["id"])
                                if kkey in seen:
                                    continue
                                seen.add(kkey)
                            xy = dv.to_tile_scale(xy, nz, det)
                            ops, xy = dv.remove_noop(ops, xy, t, 0)
                            if t == 3:
                                ops, xy = dv.clean_poly_tile_scale(ops, xy)
                            if len(ops) == 0:
                                continue
                            parts = [xy[i:j] for i, j in dv.rings(ops)]
                            if not parts:
                                continue
                            if t == 3:
                                from ..stages.mvt import encode_polygon

                                g = encode_polygon(parts)
                            elif t == 2:
                                from ..stages.mvt import encode_linestring

                                g = encode_linestring(parts)
                            else:
                                from ..stages.tile_encode import encode_multipoint

                                g = encode_multipoint(np.concatenate(parts))
                            outf = {"geom": g, "type": t, "id": f.get("id"),
                                    "attrs": f.get("tags", {})}
                            if demultiply:
                                pending.append(outf)
                            else:
                                feats.append(outf)
                        if demultiply:
                            flush(pending, feats)
                        if feats:
                            total += len(feats)
                            out_layers.append(encode_layer(lay["name"], feats, lay["extent"]))
                    if total:
                        rows["z"].append(nz)
                        rows["x"].append(nx)
                        rows["y"].append(ny)
                        rows["n_features"].append(total)
                        rows["tile"].append(encode_tile(out_layers, compress=compress))
        return pd.DataFrame(rows)

    return tile_ds.select_columns(["z", "x", "y", "tile"]).map_batches(
        fn, batch_format="pandas"
    )


# ------------------------------------------------------ decode/enumerate


def enumerate_tiles(tile_ds: ray.data.Dataset) -> pd.DataFrame:
    """`tippecanoe-enumerate` (enumerate.cpp): the (z, x, y) listing."""
    return (
        tile_ds.select_columns(["z", "x", "y", "n_features"])
        .to_pandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )


def decode_tileset(tile_ds: ray.data.Dataset) -> ray.data.Dataset:
    """`tippecanoe-decode` (decode.cpp): tiles → one row per feature
    with tile-local and world coordinates."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"z": [], "x": [], "y": [], "layer": [], "fid": [], "px": [], "py": [],
                "lon": [], "lat": []}
        from ..functions.spatial import world_to_lonlat

        for z, x, y, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            if len(data) == 0:
                continue
            for lay in decode_tile(bytes(data)):
                ext = lay["extent"]
                for name, fid, px, py, tags in _feature_points([lay]):
                    rows["z"].append(z)
                    rows["x"].append(x)
                    rows["y"].append(y)
                    rows["layer"].append(name)
                    rows["fid"].append(fid if fid is not None else -1)
                    rows["px"].append(px)
                    rows["py"].append(py)
                    span = 1 << (WORLD_BITS - z)
                    wx = x * span + px * span // ext
                    wy = y * span + py * span // ext
                    lon, lat = world_to_lonlat(np.array([wx]), np.array([wy]))
                    rows["lon"].append(round(float(lon[0]), 7))
                    rows["lat"].append(round(float(lat[0]), 7))
        return pd.DataFrame(rows)

    return tile_ds.select_columns(["z", "x", "y", "tile"]).map_batches(
        fn, batch_format="pandas"
    )


def layer_ops(
    tile_ds: ray.data.Dataset,
    keep: set[str] | None = None,
    remove: set[str] | None = None,
    rename: dict[str, str] | None = None,
    compress: bool = True,
) -> ray.data.Dataset:
    """tile-join -l (keep only) / -L (remove) / -R old:new (rename)
    (tile-join.cpp:121-131): per-tile decode → filter/rename layers →
    re-encode; tiles whose layers all vanish are dropped."""
    from ..stages.mvt import encode_layer, encode_tile

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"z": [], "x": [], "y": [], "n_features": [], "tile": []}
        for z, x, y, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            if len(data) == 0:
                continue
            out_layers = []
            total = 0
            for lay in decode_tile(bytes(data)):
                name = lay["name"]
                if keep is not None and name not in keep:
                    continue
                if remove is not None and name in remove:
                    continue
                if rename and name in rename:
                    name = rename[name]
                feats = [
                    {"geom": _reencode_geom(f), "type": f["type"], "id": f["id"],
                     "attrs": f["tags"]}
                    for f in lay["features"]
                ]
                total += len(feats)
                out_layers.append(encode_layer(name, feats, lay["extent"]))
            if not out_layers:
                continue
            rows["z"].append(int(z))
            rows["x"].append(int(x))
            rows["y"].append(int(y))
            rows["n_features"].append(total)
            rows["tile"].append(encode_tile(out_layers, compress=compress))
        return pd.DataFrame(rows)

    return tile_ds.map_batches(fn, batch_format="pandas")


def postfilter_tiles(
    tile_ds: ray.data.Dataset,
    fn,
    compress: bool = True,
) -> ray.data.Dataset:
    """The -c postfilter hook surface (plugin.cpp:78-375, README
    §pre/post filters) as a first-class callable instead of a shell
    subprocess: `fn(z, x, y, features) -> features` receives each
    tile's decoded features (dicts with type/geometry/tags/id, the
    NDJSON envelope's content) at tile resolution and returns the
    features to keep/modify. Runs inside map_batches tasks — the
    distributed equivalent of the per-tile pipe."""
    from ..stages.mvt import encode_layer, encode_tile

    def run(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"z": [], "x": [], "y": [], "n_features": [], "tile": []}
        for z, x, y, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            if len(data) == 0:
                continue
            out_layers = []
            total = 0
            for lay in decode_tile(bytes(data)):
                feats_in = lay["features"]
                feats_out = fn(int(z), int(x), int(y), feats_in)
                if not feats_out:
                    continue
                enc = [
                    {"geom": _reencode_geom(f), "type": f["type"],
                     "id": f.get("id"), "attrs": f.get("tags", {})}
                    for f in feats_out
                ]
                total += len(enc)
                out_layers.append(encode_layer(lay["name"], enc, lay["extent"]))
            if not out_layers:
                continue
            rows["z"].append(int(z))
            rows["x"].append(int(x))
            rows["y"].append(int(y))
            rows["n_features"].append(total)
            rows["tile"].append(encode_tile(out_layers, compress=compress))
        return pd.DataFrame(rows)

    return tile_ds.map_batches(run, batch_format="pandas")
