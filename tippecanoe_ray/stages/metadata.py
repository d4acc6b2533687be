"""mbtiles/dirtiles metadata: the reference's make_metadata +
mbtiles_write_metadata content (mbtiles.cpp:468-651, 655-760) —
bounds/center from the file bbox and the biggest-maxzoom-tile
midpoint, the per-layer ``vector_layers`` field-type map and the
``tilestats`` attribute statistics (add_to_tilestats,
mbtiles.cpp:917-961; the nospace json_writer serialization,
mbtiles.cpp:206-368, write_json.cpp:57-100).

The layermap accumulates at ingest like the reference's serialize pass
(serial.cpp:864-867): per feature, post include/exclude, the
(key, type, stringified-value) rows feed the per-layer tilestat
(sorted distinct sample values with the bump-last cap rule) and the
geometry-type counters.
"""

from __future__ import annotations

import math

from ..functions.text import dtoa_milo


def truncate16(s: str, runes: int) -> str:
    """text.cpp:110-133 truncate16: cut at the last codepoint boundary
    whose UTF-16 length (chars beyond the BMP count double) fits."""
    out = 0
    length = 0
    for i, ch in enumerate(s):
        length += 1 if ord(ch) <= 0xFFFF else 2
        if length <= runes:
            out = i + 1
        else:
            break
    return s[:out]

# mvt value-type codes (mvt.hpp:67-76)
TYPE_CODE = {
    "string": 1, "float": 2, "double": 3, "int": 4,
    "uint": 5, "sint": 6, "bool": 7, "null": 8,
}

MAX_TILESTATS_ATTRIBUTES = 1000
MAX_TILESTATS_SAMPLE_VALUES = 1000
MAX_TILESTATS_VALUES = 100


class Tilestat:
    __slots__ = ("type_mask", "min", "max", "sample_values")

    def __init__(self):
        self.type_mask = 0
        self.min = float("inf")
        self.max = float("-inf")
        self.sample_values: list[tuple[str, int]] = []  # sorted (s, type)


class LayerEntry:
    __slots__ = ("points", "lines", "polygons", "tilestats", "description",
                 "minzoom", "maxzoom")

    def __init__(self):
        self.points = 0
        self.lines = 0
        self.polygons = 0
        self.description = ""
        self.minzoom = 0
        self.maxzoom = 0
        self.tilestats: dict[str, Tilestat] = {}


def _atof(s: str) -> float:
    from ..functions.attributes import _atof as a

    return a(s)


def add_to_tilestats(tilestats: dict[str, Tilestat], attrib: str, vt: str,
                     s: str, sample_cap: int = MAX_TILESTATS_SAMPLE_VALUES):
    """mbtiles.cpp:917-961 exactly: null skipped; doubles update
    min/max via atof; the distinct sample set is a sorted vector with
    a bump-the-last rule once full (order-sensitive, like the
    reference's single-threaded serialize)."""
    if vt == "null":
        return
    ts = tilestats.get(attrib)
    if ts is None:
        ts = tilestats[attrib] = Tilestat()
    tcode = TYPE_CODE[vt]
    if vt == "double":
        d = _atof(s)
        if d < ts.min:
            ts.min = d
        if d > ts.max:
            ts.max = d
    import bisect

    val = (s, tcode)
    sv = ts.sample_values
    pt = bisect.bisect_left(sv, val)
    if pt == len(sv) or sv[pt] != val:
        if len(sv) >= sample_cap:
            if pt < len(sv):
                sv.insert(pt, val)
                sv.pop()
        else:
            sv.insert(pt, val)
    ts.type_mask |= 1 << tcode


def accumulate_layermap(
    attrs: dict,
    types_of_seq: dict[int, int],
    default_layer: str,
    n_features: int,
    sample_cap: int = MAX_TILESTATS_SAMPLE_VALUES,
) -> dict[str, LayerEntry]:
    """The serialize-time layermap: iterate features in seq order,
    count geometry types, feed every surviving attribute row into the
    layer's tilestats. `attrs` is the CLI side table {seq: (fid,
    [(key, type, value), ...])} plus the optional __layers__
    per-feature overrides; `types_of_seq` maps seq -> geometry type
    (1=point 2=line 3=polygon)."""
    lmap: dict[str, LayerEntry] = {}
    overrides = attrs.get("__layers__", {}) if attrs else {}
    for seq in range(n_features):
        lname = overrides.get(seq, default_layer)
        ent = lmap.get(lname)
        if ent is None:
            ent = lmap[lname] = LayerEntry()
        t = types_of_seq.get(seq, 1)
        if t == 1:
            ent.points += 1
        elif t == 2:
            ent.lines += 1
        elif t == 3:
            ent.polygons += 1
        row = attrs.get(seq) if attrs else None
        if row:
            for k, vt, s in row[1]:
                add_to_tilestats(ent.tilestats, k, vt, s, sample_cap)
    return lmap


# ------------------------------------------------ nospace json writing


def _jstr(s: str) -> str:
    """json_write_string escaping (write_json.cpp:57-71)."""
    out = ['"']
    for ch in s:
        if ch in ('\\', '"'):
            out.append("\\" + ch)
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _jnum(d: float) -> str:
    return dtoa_milo(d)


def merge_layermaps_trunc(lmap: dict[str, LayerEntry],
                          sample_cap: int = MAX_TILESTATS_SAMPLE_VALUES
                          ) -> dict[str, LayerEntry]:
    """merge_layermaps(..., trunc=true) (mbtiles.cpp:828-915):
    consolidate layers and attributes whose utf-16-rune-truncated names
    collide; sample values merge with the same sorted-insert+cap rule."""
    out: dict[str, LayerEntry] = {}
    for lname in lmap:
        tname = truncate16(lname, 256)
        src = lmap[lname]
        dst = out.get(tname)
        if dst is None:
            dst = out[tname] = LayerEntry()
            dst.description = src.description
            dst.minzoom = src.minzoom
            dst.maxzoom = src.maxzoom
        if src.minzoom < dst.minzoom:
            dst.minzoom = src.minzoom
        if src.maxzoom > dst.maxzoom:
            dst.maxzoom = src.maxzoom
        dst.points += src.points
        dst.lines += src.lines
        dst.polygons += src.polygons
        for key in src.tilestats:
            tkey = truncate16(key, 256)
            sts = src.tilestats[key]
            dts = dst.tilestats.get(tkey)
            if dts is None:
                dts = dst.tilestats[tkey] = Tilestat()
            dts.type_mask |= sts.type_mask
            if sts.min < dts.min:
                dts.min = sts.min
            if sts.max > dts.max:
                dts.max = sts.max
            import bisect

            for val in sts.sample_values:
                sv = dts.sample_values
                pt = bisect.bisect_left(sv, val)
                if pt == len(sv) or sv[pt] != val:
                    if len(sv) >= sample_cap:
                        if pt < len(sv):
                            sv.insert(pt, val)
                            sv.pop()
                    else:
                        sv.insert(pt, val)
    return out


def tilestats_json(lmap: dict[str, LayerEntry],
                   elements: int = MAX_TILESTATS_VALUES,
                   attributes_cap: int = MAX_TILESTATS_ATTRIBUTES,
                   sample_cap: int = MAX_TILESTATS_SAMPLE_VALUES) -> str:
    """The tilestats object (mbtiles.cpp:206-368), nospace form."""
    lmap = merge_layermaps_trunc(lmap, sample_cap)
    parts = ['{"layerCount":', str(len(lmap)), ',"layers":[']
    first_layer = True
    for lname in sorted(lmap):
        ent = lmap[lname]
        if not first_layer:
            parts.append(",")
        first_layer = False
        count = ent.points + ent.lines + ent.polygons
        if ent.points >= ent.lines and ent.points >= ent.polygons:
            geomtype = "Point"
        elif ent.lines >= ent.polygons and ent.lines >= ent.points:
            geomtype = "LineString"
        else:
            geomtype = "Polygon"
        attrib_count = min(len(ent.tilestats), attributes_cap)
        parts.append(
            '{"layer":' + _jstr(lname) + ',"count":' + str(count)
            + ',"geometry":' + _jstr(geomtype)
            + ',"attributeCount":' + str(attrib_count) + ',"attributes":['
        )
        attrs_written = 0
        first_attr = True
        for key in sorted(ent.tilestats):
            if attrs_written == elements:
                break
            attrs_written += 1
            ts = ent.tilestats[key]
            if not first_attr:
                parts.append(",")
            first_attr = False
            retained = ts.sample_values[:sample_cap]
            val_count = len(retained)
            # type comes from the RETAINED samples, not the accumulated
            # mask (mbtiles.cpp:291-303) — they differ when the sample
            # cap dropped every value of some type
            mask = 0
            for _, tc in retained:
                mask |= 1 << tc
            if mask == 1 << TYPE_CODE["double"]:
                type_str = "number"
            elif mask == 1 << TYPE_CODE["bool"]:
                type_str = "boolean"
            elif mask == 1 << TYPE_CODE["string"]:
                type_str = "string"
            else:
                type_str = "mixed"
            parts.append(
                '{"attribute":' + _jstr(key) + ',"count":' + str(val_count)
                + ',"type":' + _jstr(type_str) + ',"values":['
            )
            vals = 0
            first_val = True
            for s, tcode in retained:
                if vals == elements:
                    break
                if tcode in (TYPE_CODE["double"], TYPE_CODE["bool"]):
                    vals += 1
                    if not first_val:
                        parts.append(",")
                    first_val = False
                    parts.append(s)  # json_write_stringified
                else:
                    trunc = truncate16(s, 256)
                    if len(trunc) == len(s):
                        vals += 1
                        if not first_val:
                            parts.append(",")
                        first_val = False
                        parts.append(_jstr(s))
            parts.append("]")
            if mask & (1 << TYPE_CODE["double"]):
                parts.append(',"min":' + _jnum(ts.min)
                             + ',"max":' + _jnum(ts.max))
            parts.append("}")
        parts.append("]}")
    parts.append("]}")
    return "".join(parts)


def vector_layers_json(lmap: dict[str, LayerEntry],
                       attribute_descriptions: dict[str, str] | None = None,
                       attributes_cap: int = MAX_TILESTATS_ATTRIBUTES,
                       sample_cap: int = MAX_TILESTATS_SAMPLE_VALUES
                       ) -> str:
    """The vector_layers array (mbtiles.cpp:718-805), nospace form;
    field types from the RETAINED sample values (mbtiles.cpp:771-774),
    fields truncated at max_tilestats_attributes (mbtiles.cpp:794-797)."""
    ad = attribute_descriptions or {}
    parts = ["["]
    first = True
    for lname in sorted(lmap):
        ent = lmap[lname]
        if not first:
            parts.append(",")
        first = False
        parts.append(
            '{"id":' + _jstr(lname) + ',"description":'
            + _jstr(ent.description) + ',"minzoom":' + str(ent.minzoom)
            + ',"maxzoom":' + str(ent.maxzoom) + ',"fields":{'
        )
        first_field = True
        n_fields = 0
        for key in sorted(ent.tilestats):
            ts = ent.tilestats[key]
            if not first_field:
                parts.append(",")
            first_field = False
            parts.append(_jstr(key) + ":")
            desc = ad.get(key)
            if desc is not None:
                parts.append(_jstr(desc))
            else:
                mask = 0
                for _, tc in ts.sample_values[:sample_cap]:
                    mask |= 1 << tc
                if mask == 1 << TYPE_CODE["double"]:
                    parts.append(_jstr("Number"))
                elif mask == 1 << TYPE_CODE["bool"]:
                    parts.append(_jstr("Boolean"))
                elif mask == 1 << TYPE_CODE["string"]:
                    parts.append(_jstr("String"))
                else:
                    parts.append(_jstr("Mixed"))
            n_fields += 1
            if n_fields >= attributes_cap:
                break
        parts.append("}}")
    parts.append("]")
    return "".join(parts)


# ------------------------------------------------------ bounds / center


def tile2lonlat(x: int, y: int, zoom: int) -> tuple[float, float]:
    """projection.cpp tile2lonlat."""
    n = 1 << zoom
    lon = 360.0 * x / n - 180.0
    lat = math.atan(math.sinh(math.pi * (1 - 2.0 * y / n))) * 180.0 / math.pi
    return lon, lat


def _sixdig(v: float) -> float:
    # std::round = half away from zero (mbtiles.cpp:653); Python's
    # round() is banker's and differs on exact .5 at the 6th digit
    s = v * 1e6
    return (math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)) / 1e6


def bounds_and_center(file_bbox, file_bbox1, file_bbox2, midx: int,
                      midy: int, maxzoom: int) -> dict:
    """main.cpp:2795-2830: clamp the plain bbox, derive lon/lat bounds,
    clamp the midpoint-tile center into them, and pick the narrower of
    the two antimeridian candidate boxes."""
    fb = list(file_bbox)
    if fb[0] < 0:
        fb[0] = 0
        fb[2] = (1 << 32) - 1
    if fb[2] > (1 << 32) - 1:
        fb[0] = 0
        fb[2] = (1 << 32) - 1
    if fb[1] < 0:
        fb[1] = 0
    if fb[3] > (1 << 32) - 1:
        fb[3] = (1 << 32) - 1
    minlon, maxlat = tile2lonlat(int(midx), int(midy), maxzoom)
    maxlon, minlat = tile2lonlat(int(midx) + 1, int(midy) + 1, maxzoom)
    midlat = (maxlat + minlat) / 2
    midlon = (maxlon + minlon) / 2
    minlon, maxlat = tile2lonlat(fb[0], fb[1], 32)
    maxlon, minlat = tile2lonlat(fb[2], fb[3], 32)
    midlat = min(max(midlat, minlat), maxlat)
    midlon = min(max(midlon, minlon), maxlon)
    if file_bbox2[2] - file_bbox2[0] < file_bbox1[2] - file_bbox1[0]:
        minlon2, maxlat2 = tile2lonlat(file_bbox2[0], file_bbox2[1], 32)
        maxlon2, minlat2 = tile2lonlat(file_bbox2[2], file_bbox2[3], 32)
    else:
        minlon2, maxlat2 = tile2lonlat(file_bbox1[0], file_bbox1[1], 32)
        maxlon2, minlat2 = tile2lonlat(file_bbox1[2], file_bbox1[3], 32)
    return {
        "minlat": _sixdig(minlat), "minlon": _sixdig(minlon),
        "maxlat": _sixdig(maxlat), "maxlon": _sixdig(maxlon),
        "minlat2": _sixdig(minlat2), "minlon2": _sixdig(minlon2),
        "maxlat2": _sixdig(maxlat2), "maxlon2": _sixdig(maxlon2),
        "midlat": _sixdig(midlat), "midlon": _sixdig(midlon),
    }


def make_metadata(
    fname: str,
    minzoom: int,
    maxzoom: int,
    bc: dict,
    lmap: dict[str, LayerEntry] | None,
    vector: bool = True,
    description: str | None = None,
    attribution: str | None = None,
    strategies_json: str = "",
    generator_options: str = "",
    do_tilestats: bool = True,
    attribute_descriptions: dict[str, str] | None = None,
    basezoom: int | None = None,
    droprate: float = 2.5,
    retain_points_multiplier: int = 1,
    elements: int = MAX_TILESTATS_VALUES,
    attributes_cap: int = MAX_TILESTATS_ATTRIBUTES,
    sample_cap: int = MAX_TILESTATS_SAMPLE_VALUES,
    overwrite_layer_zooms: bool = True,
) -> dict[str, str]:
    """make_metadata + the json assembly of mbtiles_write_metadata:
    everything as the metadata-table string values the reference
    writes. Layer min/max zoom are overwritten with the global range
    (main.cpp:2833-2836) — tippecanoe does this before calling;
    tile-join does NOT (it keeps the per-layer zooms actually written),
    so it passes overwrite_layer_zooms=False."""
    meta: dict[str, str] = {}
    meta["name"] = fname
    meta["description"] = description if description is not None else fname
    meta["version"] = "2"
    meta["minzoom"] = str(minzoom)
    meta["maxzoom"] = str(maxzoom)
    meta["center"] = f"{bc['midlon']:f},{bc['midlat']:f},{maxzoom}"
    meta["bounds"] = (f"{bc['minlon']:f},{bc['minlat']:f},"
                      f"{bc['maxlon']:f},{bc['maxlat']:f}")
    meta["antimeridian_adjusted_bounds"] = (
        f"{bc['minlon2']:f},{bc['minlat2']:f},"
        f"{bc['maxlon2']:f},{bc['maxlat2']:f}")
    meta["type"] = "overlay"
    if attribution:
        meta["attribution"] = attribution
    meta["format"] = "pbf" if vector else "png"
    meta["generator"] = "tippecanoe_ray v0.4.0"
    meta["generator_options"] = generator_options
    if strategies_json:
        meta["strategies"] = strategies_json
    bz = maxzoom if basezoom is None else basezoom
    dr = droprate
    if math.isinf(dr):
        # (double) LLONG_MAX rounds up to 2^63 (mbtiles.cpp comment)
        dr = float(2**63)
    if bz != maxzoom or dr != 2.5 or retain_points_multiplier != 1:
        meta["tippecanoe_decisions"] = (
            '{"basezoom":' + dtoa_milo(float(bz))
            + ',"droprate":' + dtoa_milo(dr)
            + ',"retain_points_multiplier":' + str(retain_points_multiplier)
            + "}")
    if vector and lmap is not None:
        if overwrite_layer_zooms:
            for ent in lmap.values():
                ent.minzoom = minzoom
                ent.maxzoom = maxzoom
        j = '{"vector_layers":' + vector_layers_json(
            lmap, attribute_descriptions, attributes_cap, sample_cap)
        if do_tilestats and elements > 0:
            j += ',"tilestats":' + tilestats_json(
                lmap, elements, attributes_cap, sample_cap)
        j += "}"
        meta["json"] = j
    return meta


# ----------------------------------------------------- file bbox inputs


def _bbox_init():
    big = 1 << 62
    return [big, big, -big, -big]


def _bbox_inits_ref():
    """The reference's initial values (main.cpp:3836-3839 /
    serial.hpp:197-199) participate in the unconditional min/max merge,
    so they are observable: bbox2's max-x floor of 2^32 in particular."""
    bbox = [0xFFFFFFFF, 0xFFFFFFFF, 0, 0]
    bbox1 = [0xFFFFFFFF, 0xFFFFFFFF, 0, 0]
    bbox2 = [0x1FFFFFFFF, 0xFFFFFFFF, 0x100000000, 0]
    return bbox, bbox1, bbox2


def bbox_update_points(bbox, bbox1, bbox2, xs, ys):
    """serial.cpp:420-452: the plain bbox over the raw coords; the
    antimeridian candidates over masked-x / pinned-y (bbox1) and the
    western hemisphere shifted east by 360 deg (bbox2)."""
    import numpy as np

    if len(xs) == 0:
        return
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    bbox[0] = min(bbox[0], int(xs.min()))
    bbox[1] = min(bbox[1], int(ys.min()))
    bbox[2] = max(bbox[2], int(xs.max()))
    bbox[3] = max(bbox[3], int(ys.max()))
    mx = xs & 0xFFFFFFFF
    py = np.clip(ys, 0, 0xFFFFFFFF)
    bbox1[0] = min(bbox1[0], int(mx.min()))
    bbox1[1] = min(bbox1[1], int(py.min()))
    bbox1[2] = max(bbox1[2], int(mx.max()))
    bbox1[3] = max(bbox1[3], int(py.max()))
    sx = np.where(mx < 0x80000000, mx + 0x100000000, mx)
    bbox2[0] = min(bbox2[0], int(sx.min()))
    bbox2[1] = min(bbox2[1], int(py.min()))
    bbox2[2] = max(bbox2[2], int(sx.max()))
    bbox2[3] = max(bbox2[3], int(py.max()))


def file_bboxes_of_features(vec_tbl=None, vec_ds=None, pts_tbl=None):
    """The three file bboxes over every geometry vertex of the CLI's
    sources: the feature table's packed xy blobs and/or the point
    table's wx/wy columns. The Dataset form reduces per-batch partial
    bboxes (12 ints per batch) — nothing geometric reaches the driver."""
    import numpy as np
    import pyarrow as pa

    bbox, bbox1, bbox2 = _bbox_inits_ref()

    def update_from(t: pa.Table, b, b1, b2):
        # only MOVETO/LINETO vertices update the bboxes
        # (serial.cpp:425-426); closepath ops carry a dummy (0, 0) row
        for blob, opb in zip(t["xy"], t["ops"]):
            xy = np.frombuffer(blob.as_py(), dtype=np.int64).reshape(-1, 2)
            ops = np.frombuffer(opb.as_py(), dtype=np.uint8)
            m = (ops == 1) | (ops == 2)
            bbox_update_points(b, b1, b2, xy[m, 0], xy[m, 1])

    if vec_tbl is not None and len(vec_tbl):
        update_from(vec_tbl, bbox, bbox1, bbox2)
    if vec_ds is not None:
        def partial(t: pa.Table) -> pa.Table:
            b, b1, b2 = _bbox_init(), _bbox_init(), _bbox_init()
            update_from(t, b, b1, b2)
            return pa.table({"b": [b], "b1": [b1], "b2": [b2]})

        for row in vec_ds.map_batches(
            partial, batch_format="pyarrow"
        ).take_all():
            for dst, src in ((bbox, row["b"]), (bbox1, row["b1"]),
                             (bbox2, row["b2"])):
                dst[0] = min(dst[0], src[0])
                dst[1] = min(dst[1], src[1])
                dst[2] = max(dst[2], src[2])
                dst[3] = max(dst[3], src[3])
    if pts_tbl is not None and len(pts_tbl):
        bbox_update_points(
            bbox, bbox1, bbox2,
            pts_tbl["wx"].to_numpy(), pts_tbl["wy"].to_numpy(),
        )
    return bbox, bbox1, bbox2
