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
            for f in lay["features"]:
                attrs: dict = {}
                matched = False
                ti = f["tag_idx"]
                for t in range(0, len(ti) - 1, 2):
                    key = keys[ti[t]]
                    raw = vraw[ti[t + 1]]
                    vt, sv = serial_val_of_raw(raw)
                    if vt == "null":
                        continue
                    if not exclude_all and key not in exclude and key not in attrs:
                        attrs[key] = ("raw", raw)
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
                                if (not exclude_all and joinkey not in exclude
                                        and jt != "null"):
                                    attrs[joinkey] = (jt, joinval)
                if semi and not matched:
                    continue
                nf = {
                    "geom": f["geom_raw"],
                    "draws": None,
                    "type": f["type"],
                    "id": f["id"],
                    "attrs_sv": [(k, v[0], v[1]) for k, v in attrs.items()],
                }
                if lay["extent"] != out["extent"]:
                    # incoming layer is coarser: scale it up on emission
                    # (tile-join.cpp:334-339)
                    nf["draws"] = _scale_draws(
                        _geom_raw_to_draws(f["geom_raw"]),
                        out["extent"], lay["extent"])
                    nf["geom"] = None
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
            feats.append({"geom": geom, "type": f["type"], "id": f["id"],
                          "attrs_sv": f["attrs_sv"]})
        total += len(feats)
        enc_layers.append(encode_layer(out["name"], feats, out["extent"]))
    if not enc_layers:
        return b"", 0
    enc = encode_tile(enc_layers, compress=compress, exact_gzip=True)
    if len(enc) > 500000:
        return b"", 0
    return enc, total


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
) -> ray.data.Dataset:
    """Byte-parity tile-join over N input tilesets: tiles grouped by
    (z, x, y), inputs accumulated in argument order (the reference's
    append_tile call order), then the shared rewrite. The group-by is
    the only shuffle and moves tile bytes once."""
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
        hdr, m = ray.get(map_ref)
        # readers at the same (z, x, y) pop in LEXICOGRAPHIC tile-bytes
        # order (tileset_reader::operator< final tie-break on `data`,
        # tile-join.cpp:788-790), not in argument order
        blobs = sorted(bytes(t) for t in g["tile"] if len(t))
        enc, total = _rewrite_tile_group(
            blobs, hdr, m, exclude,
            exclude_all, semi, empty_null, compress,
            keep_layers, remove_layers, renames)
        if total == 0:
            return pd.DataFrame(
                {"z": [], "x": [], "y": [], "n_features": [], "tile": []}
            ).astype({"z": "int64", "x": "int64", "y": "int64",
                      "n_features": "int64", "tile": "object"})
        return pd.DataFrame({
            "z": [g["z"].iloc[0]], "x": [g["x"].iloc[0]],
            "y": [g["y"].iloc[0]], "n_features": [total], "tile": [enc],
        })

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
