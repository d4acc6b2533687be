"""tippecanoe-overzoom: cut one or more parent tiles into a child (or
re-slice the same tile), byte-identical to the reference binary.

Port of overzoom() (clip.cpp:1453-1755) and feature_out
(clip.cpp:1308-1446) with the tool's flag surface (overzoom.cpp):
-d detail (default 12), -b buffer (default 5), -y/-x/--exclude-prefix
attribute filtering, -j/-J feature filters, -m multiplier demultiply,
--accumulate-attribute, -S line simplification, --tiny-polygon-size,
--preserve-input-order, --deduplicate-by-id, --no-tile-compression.

Per feature, in the reference's order: decode to world coordinates
(closepath -> explicit ring closure; extent rescale with C-truncating
division), offset to the output tile, bbox quick-exclusion, clip
(lines Cohen-Sutherland / polygons Sutherland-Hodgman / points
in-rect, all at buffer*tilesize/256), multiplier-tag scan (erase
tippecanoe:retain_points_multiplier_first/_sequence, flush the pending
cluster on a new first), feature-filter evaluation, tiny-polygon
reduction, basic Douglas-Peucker simplification, to_tile_scale, and —
unless the output is the same tile at >= extent — remove_noop plus a
wagyu clean without the x16 retry (clean_or_clip_poly(..., false)).
close_poly drops each ring's duplicate endpoint and appends a
CLOSEPATH (clip.cpp:712-742).  feature_out emits the cluster's first
feature, deduplicates by id, filters attributes through should_keep
(clip.cpp:1271-1290), and accumulates the specified attributes from
the cluster's dropped features (preserve_attribute,
attribute.cpp:92-189).  Layers assemble in first-seen order; values
reuse the input tiles' wire bytes verbatim and are sorted/deduplicated
by the encoder exactly like mvt_tile::encode.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions import drawvec as dv
from ..functions.text import dtoa_milo
from ..stages.mvt import (
    _decode_geometry, _key, _len_delim, _part_vals, _read_varint,
    decode_tile_raw, encode_layer, encode_tile, serial_val_of_raw,
)
from ..stages.tile_encode import encode_multipoint

MULT_FIRST = "tippecanoe:retain_points_multiplier_first"
MULT_SEQ = "tippecanoe:retain_points_multiplier_sequence"


def _cdiv(a: int, b: int) -> int:
    """C long long division: truncation toward zero."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _typed_of_raw(raw: bytes):
    """Wire value message -> (field, python value); field numbers are
    the mvt value message's (1 string .. 7 bool)."""
    pos = 0
    key, pos = _read_varint(raw, pos)
    field = key >> 3
    if field == 1:
        ln, pos = _read_varint(raw, pos)
        return 1, raw[pos:pos + ln].decode("utf-8")
    if field == 2:
        return 2, struct.unpack("<f", raw[pos:pos + 4])[0]
    if field == 3:
        return 3, struct.unpack("<d", raw[pos:pos + 8])[0]
    if field in (4, 5):
        v, pos = _read_varint(raw, pos)
        if field == 4 and v >= 1 << 63:
            v -= 1 << 64
        return field, v
    if field == 6:
        v, pos = _read_varint(raw, pos)
        return 6, (v >> 1) ^ -(v & 1)
    if field == 7:
        v, pos = _read_varint(raw, pos)
        return 7, bool(v)
    return 0, None


def _encode_typed(field: int, v) -> bytes:
    if field == 1:
        return _len_delim(1, str(v).encode("utf-8"))
    if field == 2:
        return _key(2, 5) + struct.pack("<f", float(v))
    if field == 3:
        return _key(3, 1) + struct.pack("<d", float(v))
    if field == 4:
        u = int(v) & ((1 << 64) - 1)
        from ..stages.mvt import varint
        return _key(4, 0) + varint(u)
    if field in (5, 6, 7):
        from ..stages.mvt import varint
        if field == 6:
            u = (int(v) << 1) ^ (int(v) >> 63)
            u &= (1 << 64) - 1
        else:
            u = int(v) if field == 5 else (1 if v else 0)
        return _key(field, 0) + varint(u)
    raise ValueError(f"unencodable value field {field}")


class _AccVal:
    """mvt_value with the accumulation count side-channel
    (mvt.hpp:151-178)."""

    __slots__ = ("field", "v", "count", "raw")

    def __init__(self, field, v, raw=None):
        self.field = field
        self.v = v
        self.count = 0
        self.raw = raw

    def to_double(self) -> float:
        if self.field == 1:  # string: atof
            from ..functions.attributes import _atof
            return _atof(self.v)
        if self.field == 7:
            return 1.0 if self.v else 0.0
        if self.field == 0:
            return 0.0
        return float(self.v)

    def get_string_value(self) -> str:
        if self.field == 1:
            return self.v
        if self.raw is not None:
            return serial_val_of_raw(self.raw)[1]
        if self.field == 3:
            return dtoa_milo(self.v)
        return str(self.v)

    def set_double_count(self, v: float, c: int):
        self.field = 3
        self.v = v
        self.count = c
        self.raw = None

    def set_string_value(self, s: str):
        self.field = 1
        self.v = s
        self.raw = None

    def encode(self) -> bytes:
        if self.raw is not None:
            return self.raw
        return _encode_typed(self.field, self.v)


def _preserve_attribute(op: str, key: str, val: _AccVal,
                        full_keys: list, full_values: list):
    """preserve_attribute1 (attribute.cpp:92-189) over mvt values."""
    for i, k in enumerate(full_keys):
        if key == k:
            fv = full_values[i]
            if op == "sum":
                full_values[i] = _AccVal(3, fv.to_double() + val.to_double())
            elif op == "product":
                full_values[i] = _AccVal(3, fv.to_double() * val.to_double())
            elif op == "max":
                if val.to_double() > fv.to_double():
                    full_values[i] = val
            elif op == "min":
                if val.to_double() < fv.to_double():
                    full_values[i] = val
            elif op == "mean":
                count = fv.count
                if count <= 1:
                    fv.set_double_count(
                        (fv.to_double() + val.to_double()) / 2, 2)
                else:
                    s = fv.to_double() * count + val.to_double()
                    fv.set_double_count(s / (count + 1), count + 1)
            elif op == "concat":
                fv.set_string_value(
                    fv.get_string_value() + val.get_string_value())
            elif op == "comma":
                fv.set_string_value(
                    fv.get_string_value() + "," + val.get_string_value())
            elif op == "count":
                count = fv.count
                if count <= 1:
                    fv.set_double_count(2, 2)
                else:
                    fv.set_double_count(count + 1, count + 1)
            return
    # not found: new value (attribute.cpp:156-189)
    if op in ("sum", "max", "min"):
        v = val
    elif op == "count":
        v = _AccVal(3, 1.0)
        v.count = 1
    elif op == "mean":
        v = _AccVal(3, val.to_double())
        v.count = 1
    elif op in ("concat", "comma"):
        v = _AccVal(1, val.get_string_value())
    elif op == "product":
        v = val
    else:
        raise ValueError(op)
    full_keys.append(key)
    full_values.append(v)


def _should_keep(key: str, keep, exclude, exclude_prefix) -> bool:
    """should_keep (clip.cpp:1271-1290)."""
    if not keep or key in keep:
        if key in exclude:
            return False
        for p in exclude_prefix:
            if key.startswith(p):
                return False
        return True
    return False


def _encode_poly_closed(ops, xy) -> bytes:
    """close_poly (clip.cpp:712-742) + the mvt geometry writer: per
    ring, every point except the duplicate endpoint (dropped
    unconditionally), then a CLOSEPATH command."""
    from ..stages.mvt import varint_array

    px = py = 0
    chunks = []
    for i, j in dv.rings(ops):
        pts = xy[i:j - 1]
        if len(pts):
            vals, px, py = _part_vals(pts, px, py, True)
            chunks.append(vals)
        else:
            chunks.append(np.array([(1 << 3) | 7], np.uint64))
    return varint_array(
        np.concatenate(chunks) if chunks else np.empty(0, np.uint64))


def _encode_lines(ops, xy) -> bytes:
    from ..stages.mvt import varint_array

    px = py = 0
    chunks = []
    for i, j in dv.rings(ops):
        vals, px, py = _part_vals(xy[i:j], px, py, False)
        chunks.append(vals)
    return varint_array(
        np.concatenate(chunks) if chunks else np.empty(0, np.uint64))


def _feature_out(pending: list, outlayer: dict, keep, exclude,
                 exclude_prefix, accum: dict, dedup_ids):
    """feature_out (clip.cpp:1308-1446) with buffer = -1 (the overzoom
    callsite): no re-clip, no polygon re-fix; emit the cluster's first
    feature, accumulate attributes from the rest."""
    f0 = pending[0]
    geom_empty = len(f0["ops"]) == 0

    if f0["id"] is not None and dedup_ids is not None and not geom_empty:
        if f0["id"] in dedup_ids:
            geom_empty = True
        else:
            dedup_ids.add(f0["id"])

    if geom_empty:
        return

    t = f0["t"]
    ops, xy = f0["ops"], f0["xy"]
    if t == 3:
        geom = _encode_poly_closed(ops, xy)
    elif t == 2:
        geom = _encode_lines(ops, xy)
    else:
        geom = encode_multipoint(xy)

    attrs_sv: list = []
    if accum:
        full_keys: list = []
        full_values: list = []
        lay = f0["layer"]
        for i in range(0, len(f0["tags"]) - 1, 2):
            key = lay["keys"][f0["tags"][i]]
            if _should_keep(key, keep, exclude, exclude_prefix):
                raw = lay["values_raw"][f0["tags"][i + 1]]
                if key in accum:
                    field, v = _typed_of_raw(raw)
                    full_keys.append(key)
                    full_values.append(_AccVal(field, v, raw))
                else:
                    attrs_sv.append((key, "raw", raw))
        for fx in pending[1:]:
            layx = fx["layer"]
            for j in range(0, len(fx["tags"]) - 1, 2):
                key = layx["keys"][fx["tags"][j]]
                if _should_keep(key, keep, exclude, exclude_prefix) \
                        and key in accum:
                    raw = layx["values_raw"][fx["tags"][j + 1]]
                    field, v = _typed_of_raw(raw)
                    _preserve_attribute(accum[key], key,
                                        _AccVal(field, v, raw),
                                        full_keys, full_values)
        for i, key in enumerate(full_keys):
            if _should_keep(key, keep, exclude, exclude_prefix):
                attrs_sv.append((key, "raw", full_values[i].encode()))
    else:
        lay = f0["layer"]
        for i in range(0, len(f0["tags"]) - 1, 2):
            key = lay["keys"][f0["tags"][i]]
            if _should_keep(key, keep, exclude, exclude_prefix):
                attrs_sv.append(
                    (key, "raw", lay["values_raw"][f0["tags"][i + 1]]))

    outlayer["features"].append({
        "type": t,
        "geom": geom,
        "id": f0["id"],
        "attrs_sv": attrs_sv,
        "_seq": f0["seq"],
    })


def overzoom_bytes(tiles, nz: int, nx: int, ny: int, *,
                   detail: int = 12, buffer: int = 5,
                   keep=(), exclude=(), exclude_prefix=(),
                   compress: bool = True, demultiply: bool = False,
                   filter_doc=None, preserve_input_order: bool = False,
                   attribute_accum: dict | None = None,
                   simplification: float = 0.0,
                   tiny_polygon_size: float = 0.0,
                   deduplicate_by_id: bool = False,
                   feature_limit: int | None = None,
                   collect_next: bool = False):
    """tiles: [(tile_bytes, z, x, y), ...] -> encoded child tile bytes
    ('' when everything clips away), clip.cpp:1453-1755.

    With collect_next (the next_overzoomed_tiles out-param,
    clip.cpp:1697-1731), returns (bytes, [(cx, cy), ...]): each of the
    four z+1 children is probed by overzooming the JUST-BUILT tile
    with feature_limit=1, and non-empty children are listed — the
    pruning tile-join -O uses to walk deeper overzoom levels."""
    keep = set(keep)
    exclude = set(exclude)
    exclude_prefix = list(exclude_prefix)
    accum = attribute_accum or {}
    if feature_limit is None:
        feature_limit = 1 << 62

    out_layers: list[dict] = []
    dedup_ids_by_name: dict[str, set] = {}
    outtilesize = 1 << (32 - nz)

    for tile_bytes, tz, tx, ty in tiles:
        tilesize = 1 << (32 - tz)
        for layer in decode_tile_raw(bytes(tile_bytes)):
            det = detail
            if det <= 0:
                det = int(round(np.log2(layer["extent"])))
            outlayer = None
            for ol in out_layers:
                if ol["name"] == layer["name"]:
                    outlayer = ol
            if outlayer is None:
                outlayer = {"name": layer["name"],
                            "version": layer.get("version", 2),
                            "extent": 1 << det, "features": []}
                out_layers.append(outlayer)

            dedup_ids = None
            if deduplicate_by_id:
                dedup_ids = dedup_ids_by_name.setdefault(
                    layer["name"], set())

            extent = layer["extent"]
            sametile_layer = (nz == tz and nx == tx and ny == ty
                              and outlayer["extent"] >= extent)
            b = outtilesize * buffer // 256  # positive operands

            pending: list = []
            accum_area = 0.0
            hit_limit = False

            for feature in layer["features"]:
                t = feature["type"]
                fid = feature["id"]
                tags = list(feature["tag_idx"])

                # decode to world coordinates (clip.cpp:1520-1546);
                # extent rescale is C-truncating division
                ops_l: list[int] = []
                xy_l: list[tuple[int, int]] = []
                rc = (0, 0)
                for cmd, pts in _decode_geometry(
                        _geom_vals(feature["geom_raw"])):
                    if cmd == 7:
                        ops_l.append(2)
                        xy_l.append(rc)
                        continue
                    for px, py in pts:
                        wx = _cdiv(px * tilesize, extent) + tx * tilesize
                        wy = _cdiv(py * tilesize, extent) + ty * tilesize
                        ops_l.append(cmd)
                        xy_l.append((wx, wy))
                        if cmd == 1:
                            rc = (wx, wy)
                ops = np.array(ops_l, np.uint8)
                xy = np.array(xy_l, np.int64).reshape(-1, 2)
                xy = xy - np.array([nx * outtilesize, ny * outtilesize])

                # quick exclusion by bounding box (clip.cpp:1552-1572)
                if len(xy) == 0 or \
                        xy[:, 0].max() < -b or xy[:, 1].max() < -b or \
                        xy[:, 0].min() > outtilesize + b or \
                        xy[:, 1].min() > outtilesize + b:
                    if deduplicate_by_id and fid is not None:
                        dedup_ids.add(fid)
                    continue

                if t == 2:
                    ops, xy = dv.clip_lines(
                        ops, xy, -b, -b, outtilesize + b, outtilesize + b)
                elif t == 3:
                    ops, xy = dv.simple_clip_poly(
                        ops, xy, -b, -b, outtilesize + b, outtilesize + b)
                elif t == 1:
                    m = ((xy[:, 0] >= -b) & (xy[:, 1] >= -b)
                         & (xy[:, 0] <= outtilesize + b)
                         & (xy[:, 1] <= outtilesize + b))
                    ops, xy = ops[m], xy[m]

                if len(ops) == 0:
                    if deduplicate_by_id and fid is not None:
                        dedup_ids.add(fid)
                    continue

                # multiplier tags (clip.cpp:1593-1609)
                seq = 0
                flush_cluster = True
                if demultiply:
                    flush_cluster = False
                    i = len(tags) - 2
                    while i >= 0:
                        key = layer["keys"][tags[i]]
                        if key == MULT_FIRST:
                            fld, v = _typed_of_raw(
                                layer["values_raw"][tags[i + 1]])
                            if fld == 7 and v:
                                flush_cluster = True
                                del tags[i:i + 2]
                        elif i < len(tags) and key == MULT_SEQ:
                            fld, v = _typed_of_raw(
                                layer["values_raw"][tags[i + 1]])
                            seq = int(v) if fld != 1 else int(float(v))
                            del tags[i:i + 2]
                        i -= 2

                if flush_cluster and pending:
                    _feature_out(pending, outlayer, keep, exclude,
                                 exclude_prefix, accum, dedup_ids)
                    pending = []
                    if len(outlayer["features"]) >= feature_limit:
                        hit_limit = True
                        break

                if filter_doc is not None:
                    from ..functions.filters import evaluate_feature

                    rows = []
                    for i in range(0, len(tags) - 1, 2):
                        vt, s = serial_val_of_raw(
                            layer["values_raw"][tags[i + 1]])
                        rows.append((layer["keys"][tags[i]], vt, s))
                    ok, _excl = evaluate_feature(
                        filter_doc, layer["name"], rows, t, fid, nz)
                    if not ok:
                        if deduplicate_by_id and fid is not None:
                            dedup_ids.add(fid)
                        continue

                still_needs_simplification = True
                if t == 3 and tiny_polygon_size > 0:
                    ops, xy, still, _red, accum_area = dv.reduce_tiny_poly(
                        ops, xy, nz, det, accum_area, tiny_polygon_size)
                    still_needs_simplification = still

                if simplification > 0 and still_needs_simplification:
                    if t in (2, 3):
                        ops, xy = dv.simplify_lines(
                            ops, xy, nz, det, False, simplification,
                            4 if t == 3 else 0)

                xy = dv.to_tile_scale(xy, nz, det)

                if not sametile_layer:
                    ops, xy = dv.remove_noop(ops, xy, t, 0)
                    if t == 3:
                        # clean WITHOUT the x16 retry (clip.cpp:1659)
                        ops, xy = dv.clean_poly_tile_scale(
                            ops, xy, try_scaling=False)

                if t == 3:
                    # close_poly validation happens at encode; empty
                    # check here (clip.cpp:1663-1669)
                    pass
                if len(ops) == 0:
                    if deduplicate_by_id and fid is not None:
                        dedup_ids.add(fid)
                    continue

                pending.append({"ops": ops, "xy": xy, "t": t, "id": fid,
                                "tags": tags, "layer": layer, "seq": seq})

            if pending and not hit_limit:
                _feature_out(pending, outlayer, keep, exclude,
                             exclude_prefix, accum, dedup_ids)
                if len(outlayer["features"]) >= feature_limit:
                    hit_limit = True

            if preserve_input_order:
                outlayer["features"].sort(key=lambda f: f["_seq"])

            if hit_limit:
                break

    next_children: list = []
    if collect_next and out_layers:
        # probe each z+1 child against the just-built tile
        # (clip.cpp:1705-1731; the probe precedes the empty-layer
        # erase, which changes nothing — empty layers clip empty)
        probe_layers = [ol for ol in out_layers if ol["features"]]
        if probe_layers:
            probe = encode_tile(
                [encode_layer(ol["name"], ol["features"], ol["extent"])
                 for ol in probe_layers], compress=False)
            for dx in (0, 1):
                for dy in (0, 1):
                    child = overzoom_bytes(
                        [(probe, nz, nx, ny)],
                        nz + 1, nx * 2 + dx, ny * 2 + dy,
                        detail=detail, buffer=buffer, keep=keep,
                        exclude=exclude, exclude_prefix=exclude_prefix,
                        compress=False, demultiply=demultiply,
                        filter_doc=filter_doc,
                        preserve_input_order=preserve_input_order,
                        attribute_accum=attribute_accum,
                        simplification=simplification,
                        tiny_polygon_size=tiny_polygon_size,
                        deduplicate_by_id=deduplicate_by_id,
                        feature_limit=1)
                    if child:
                        next_children.append((nx * 2 + dx, ny * 2 + dy))

    out_layers = [ol for ol in out_layers if ol["features"]]
    if not out_layers:
        return (b"", next_children) if collect_next else b""
    encoded = [encode_layer(ol["name"], ol["features"], ol["extent"])
               for ol in out_layers]
    out = encode_tile(encoded, compress=compress)
    return (out, next_children) if collect_next else out


def _geom_vals(geom_raw: bytes) -> list[int]:
    vals = []
    pos = 0
    while pos < len(geom_raw):
        v, pos = _read_varint(geom_raw, pos)
        vals.append(v)
    return vals


def overzoom_ds(tile_ds, **opts):
    """Ray-Data-native overzoom over a whole tileset: every (z, x, y,
    tile) row maps to its 4 children through the byte-exact kernel —
    an embarrassingly parallel map_batches, no shuffle (each child of
    a z+1 overzoom has exactly one parent). Children that clip empty
    are dropped. opts forward to overzoom_bytes (detail/buffer/...)."""
    import pandas as pd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"z": [], "x": [], "y": [], "tile": []}
        for z, x, y, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            z, x, y = int(z), int(x), int(y)
            for dx in (0, 1):
                for dy in (0, 1):
                    out = overzoom_bytes(
                        [(bytes(data), z, x, y)],
                        z + 1, 2 * x + dx, 2 * y + dy, **opts)
                    if out:
                        rows["z"].append(z + 1)
                        rows["x"].append(2 * x + dx)
                        rows["y"].append(2 * y + dy)
                        rows["tile"].append(out)
        return pd.DataFrame(rows)

    return tile_ds.map_batches(fn, batch_format="pandas")


def overzoom_extend_ds(ds, target_zoom: int, buffer: int = 5):
    """tile-join -O: overzoom a shallow tileset's maxzoom tiles up to
    ``target_zoom`` (the deepest real zoom across the join's inputs —
    the reference's tileset_reader stops when a fresh overzoom level
    finds every reader done, tile-join.cpp:550-605,676-705).

    Each maxzoom parent's overzoom subtree is independent (every
    overzoomed tile is built FROM ITS MAXZOOM ANCESTOR,
    retrieve_overzoom tile-join.cpp:796-840), so this is a shuffle-free
    map_batches: per parent, level L+1 candidates start as all four
    children and deeper levels use the constructed tiles'
    next_overzoomed_tiles pruning. detail=-1 keeps the source layer
    extent; tiles return UNCOMPRESSED (do_compress=false at the
    callsite) for the join rewrite to re-encode. Returns a Dataset of
    the generated (z, x, y, tile) rows, or None when nothing to do."""
    import pandas as pd

    zmax = ds.max("z")
    if zmax is None or zmax >= target_zoom:
        return None
    parents = ds.filter(expr=f"z == {zmax}")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"z": [], "x": [], "y": [], "tile": []}
        for z0, x0, y0, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            z0, x0, y0 = int(z0), int(x0), int(y0)
            src = [(bytes(data), z0, x0, y0)]
            frontier = [(2 * x0 + dx, 2 * y0 + dy)
                        for dx in (0, 1) for dy in (0, 1)]
            for cz in range(z0 + 1, target_zoom + 1):
                nxt: list = []
                for cx, cy in frontier:
                    out, children = overzoom_bytes(
                        src, cz, cx, cy, detail=-1, buffer=buffer,
                        compress=False, collect_next=True)
                    if out:
                        rows["z"].append(cz)
                        rows["x"].append(cx)
                        rows["y"].append(cy)
                        rows["tile"].append(out)
                    nxt.extend(children)
                frontier = nxt
                if not frontier:
                    break
            # the level-(target+1) frontier, marked with negative z:
            # the reader's FINAL queue position pops the minimum of
            # this candidate list (tile-join.cpp:594-605), which
            # decides the metadata accumulation order
            for cx, cy in frontier:
                rows["z"].append(-(target_zoom + 1))
                rows["x"].append(cx)
                rows["y"].append(cy)
                rows["tile"].append(b"")
        return pd.DataFrame(rows)

    return parents.map_batches(expand, batch_format="pandas")


def overzoom_final_key(ds, zmax: int, target: int, frontier=None,
                       gen_target_rows=None, buffer: int = 5):
    """The reader's FINAL priority-queue key under -O — (zoom, x,
    tms_y, tile_bytes) — which orders the metadata accumulation
    (tile-join.cpp:1135-1137 iterates the queue's final order; each
    reader's last advance pops the MINIMUM level-(target+1) candidate
    and builds its tile from the maxzoom ancestor before the loop
    exits, tile-join.cpp:576-605,762-793).

    For a reader whose real maxzoom equals the target, the candidates
    are all four children of its real target tiles, so the minimum is
    child (2px, 2py+1) of the first target tile in (x asc, tms asc)
    order.  For an overzoomed reader, the candidates are the
    collect_next frontier.  ``frontier``: the extension's marked rows
    (pandas with x, y at target+1), or None for a deep reader.

    A fully tied primary key falls back to the order the readers
    exhausted the last level — the reader whose LAST level-target tile
    (by z/x/tms/bytes) sorts earlier re-queued its final state first —
    so the key carries that last tile as a secondary component.
    ``gen_target_rows``: pandas (x, y, tile) of an overzoomed reader's
    GENERATED tiles at the target zoom (a deep reader's come from its
    own real tiles)."""
    import pandas as pd

    M1 = target + 1

    def _extreme(df: pd.DataFrame, best: bool):
        if not len(df):
            return None
        tms = (1 << target) - 1 - df["y"]
        order = np.lexsort((tms.to_numpy(), df["x"].to_numpy()))
        return df.iloc[order[0] if best else order[-1]]

    def _collect(pds):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            lo = _extreme(df, True)
            hi = _extreme(df, False)
            return pd.DataFrame([lo, hi])

        return pds.map_batches(part, batch_format="pandas").to_pandas()

    if frontier is None:
        tdf = _collect(ds.filter(expr=f"z == {target}"))
        row = _extreme(tdf, True)
        if row is None:
            return (1 << 30, 0, 0, b"", 0, 0, 0, b"")
        px, py = int(row["x"]), int(row["y"])
        cand = (2 * px, 2 * py + 1)
        src = (bytes(row["tile"]), target, px, py)
        last = _extreme(tdf, False)
    else:
        if not len(frontier):
            return (1 << 30, 0, 0, b"", 0, 0, 0, b"")
        tms = (1 << M1) - 1 - frontier["y"]
        i = np.lexsort((tms.to_numpy(), frontier["x"].to_numpy()))[0]
        cand = (int(frontier["x"].iloc[i]), int(frontier["y"].iloc[i]))
        sh = M1 - zmax
        ax, ay = cand[0] >> sh, cand[1] >> sh
        anc = ds.filter(
            expr=f"z == {zmax} and x == {ax} and y == {ay}").take(1)
        if not anc:
            return (1 << 30, 0, 0, b"", 0, 0, 0, b"")
        src = (bytes(anc[0]["tile"]), zmax, ax, ay)
        last = (_extreme(gen_target_rows, False)
                if gen_target_rows is not None and len(gen_target_rows)
                else None)

    data = overzoom_bytes([src], M1, cand[0], cand[1],
                          detail=-1, buffer=buffer, compress=False)
    if last is not None:
        lkey = (target, int(last["x"]),
                (1 << target) - 1 - int(last["y"]), bytes(last["tile"]))
    else:
        lkey = (0, 0, 0, b"")
    return (M1, cand[0], (1 << M1) - 1 - cand[1], data, *lkey)


def overzoom_main(argv) -> int:
    """`python -m tippecanoe_ray overzoom` — tippecanoe-overzoom
    (overzoom.cpp:111-305)."""
    import argparse
    import json as _json
    import sys

    ap = argparse.ArgumentParser(prog="tippecanoe_ray overzoom")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-t", "--source-tile", default=None, metavar="Z/X/Y")
    ap.add_argument("-d", "--full-detail", type=int, default=12)
    ap.add_argument("-b", "--buffer", type=int, default=5)
    ap.add_argument("-y", "--include", action="append", default=[])
    ap.add_argument("-x", "--exclude", action="append", default=[])
    ap.add_argument("--exclude-prefix", action="append", default=[])
    ap.add_argument("-E", "--accumulate-attribute", action="append",
                    default=[])
    ap.add_argument("-j", "--feature-filter", default=None)
    ap.add_argument("-J", "--feature-filter-file", default=None)
    ap.add_argument("-m", "--filter-points-multiplier",
                    action="store_true")
    ap.add_argument("-i", "--deduplicate-by-id", action="store_true")
    ap.add_argument("-S", "--line-simplification", type=float,
                    default=0.0)
    ap.add_argument("--tiny-polygon-size", type=float, default=0.0)
    ap.add_argument("--preserve-input-order", action="store_true")
    ap.add_argument("--no-tile-compression", action="store_true")
    ap.add_argument("args", nargs="+")
    a = ap.parse_args(argv)

    sources = []
    if a.source_tile is None:
        if len(a.args) != 3:
            print("Wrong number of arguments", file=sys.stderr)
            return 1
        nz, nx, ny = map(int, a.args[2].split("/"))
        oz, ox, oy = map(int, a.args[1].split("/"))
        sources.append((a.args[0], oz, ox, oy))
    else:
        nz, nx, ny = map(int, a.source_tile.split("/"))
        if len(a.args) % 2 != 0:
            print("Unpaired arguments", file=sys.stderr)
            return 1
        for i in range(0, len(a.args), 2):
            oz, ox, oy = map(int, a.args[i + 1].split("/"))
            sources.append((a.args[i], oz, ox, oy))

    filter_doc = None
    if a.feature_filter_file:
        filter_doc = _json.load(open(a.feature_filter_file))
    elif a.feature_filter:
        filter_doc = _json.loads(a.feature_filter)

    accum = {}
    for spec in a.accumulate_attribute:
        k, _, op = spec.rpartition(":")
        accum[k] = op

    tiles = []
    for fname, oz, ox, oy in sources:
        with open(fname, "rb") as f:
            tiles.append((f.read(), oz, ox, oy))

    out = overzoom_bytes(
        tiles, nz, nx, ny, detail=a.full_detail, buffer=a.buffer,
        keep=a.include, exclude=a.exclude,
        exclude_prefix=a.exclude_prefix,
        compress=not a.no_tile_compression,
        demultiply=a.filter_points_multiplier, filter_doc=filter_doc,
        preserve_input_order=a.preserve_input_order,
        attribute_accum=accum or None,
        simplification=a.line_simplification,
        tiny_polygon_size=a.tiny_polygon_size,
        deduplicate_by_id=a.deduplicate_by_id,
    )
    with open(a.output, "wb") as f:
        f.write(out)
    return 0
