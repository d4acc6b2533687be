"""`tippecanoe-decode` text output, byte-for-byte (decode.cpp +
write_json.cpp): the stateful json_writer (space/comma/newline rules
preserved exactly, including the historical double-space before `}` of
an empty hash), layer_to_geojson's geometry reassembly (multipoint /
multilinestring split on movetos, polygon ring grouping by signed
area), milo-dtoa property numbers, and the driver loops over mbtiles
(z/x/tms_y order), dirtiles (y reversed within x) and single .pbf
tiles. Verified cmp-identical against the reference binary in
tests/test_decode_reference.py."""

from __future__ import annotations

import gzip
import math
import sqlite3
import struct
import zlib

from ..functions.text import dtoa_milo
from .mvt import _read_varint, decode_tile_raw

MOVETO, LINETO, CLOSEPATH = 1, 2, 7

JSON_WRITE_TOP = 0
JSON_WRITE_HASH = 1
JSON_WRITE_HASH_KEY = 2
JSON_WRITE_HASH_VALUE = 3
JSON_WRITE_ARRAY = 4
JSON_WRITE_ARRAY_ELEMENT = 5


class JsonWriter:
    """write_json.cpp:20-201 json_writer, appending to a list of str."""

    __slots__ = ("out", "state", "nospace", "wantnl")

    def __init__(self):
        self.out: list[str] = []
        self.state: list[int] = []
        self.nospace = False
        self.wantnl = False

    def _adjust(self):
        st = self.state
        if not st:
            st.append(JSON_WRITE_TOP)
        elif st[-1] == JSON_WRITE_TOP:
            self.out.append("\n")
        elif st[-1] == JSON_WRITE_HASH:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            st[-1] = JSON_WRITE_HASH_KEY
        elif st[-1] == JSON_WRITE_HASH_KEY:
            self.out.append(":")
            if not self.nospace:
                self.out.append(" ")
                self.nospace = False
            st[-1] = JSON_WRITE_HASH_VALUE
        elif st[-1] == JSON_WRITE_HASH_VALUE:
            if self.wantnl:
                self.out.append(",\n")
                self.nospace = False
            elif self.nospace:
                self.out.append(",")
                self.nospace = False
            else:
                self.out.append(", ")
            self.wantnl = False
            st[-1] = JSON_WRITE_HASH_KEY
        elif st[-1] == JSON_WRITE_ARRAY:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            st[-1] = JSON_WRITE_ARRAY_ELEMENT
        elif st[-1] == JSON_WRITE_ARRAY_ELEMENT:
            if self.wantnl:
                self.out.append(",\n")
                self.nospace = False
            elif self.nospace:
                self.out.append(",")
                self.nospace = False
            else:
                self.out.append(", ")
            self.wantnl = False

    def write_array(self):
        self._adjust()
        self.out.append("[")
        self.state.append(JSON_WRITE_ARRAY)

    def end_array(self):
        tok = self.state.pop()
        if tok in (JSON_WRITE_ARRAY, JSON_WRITE_ARRAY_ELEMENT):
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            self.out.append("]")

    def write_hash(self):
        self._adjust()
        self.out.append("{")
        self.state.append(JSON_WRITE_HASH)

    def end_hash(self):
        tok = self.state.pop()
        if tok == JSON_WRITE_HASH:
            if not self.nospace:
                self.out.append("  ")  # preserved accidental extra space
            self.nospace = False
            self.out.append("}")
        else:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            self.out.append("}")

    def write_string(self, s: str):
        self._adjust()
        buf = ['"']
        for ch in s:
            if ch in ('\\', '"'):
                buf.append("\\" + ch)
            elif ord(ch) < 0x20:
                buf.append("\\u%04x" % ord(ch))
            else:
                buf.append(ch)
        buf.append('"')
        self.out.append("".join(buf))

    def write_number(self, d: float):
        self._adjust()
        self.out.append(dtoa_milo(float(d)))

    def write_float(self, d: float):  # "%f"
        self._adjust()
        self.out.append("%f" % d)

    def write_unsigned(self, v: int):
        self._adjust()
        self.out.append(str(int(v)))

    def write_signed(self, v: int):
        self._adjust()
        self.out.append(str(int(v)))

    def write_bool(self, b: bool):
        self._adjust()
        self.out.append("true" if b else "false")

    def write_null(self):
        self._adjust()
        self.out.append("null")

    def write_newline(self):
        self.out.append("\n")
        self.nospace = True

    def comma_newline(self):
        self.wantnl = True

    def text(self) -> str:
        return "".join(self.out)


def _value_typed(raw: bytes):
    """Wire value message → (mvt kind, python value)."""
    pos = 0
    key, pos = _read_varint(raw, pos)
    field = key >> 3
    if field == 1:
        ln, pos = _read_varint(raw, pos)
        return "string", raw[pos:pos + ln].decode("utf-8")
    if field == 2:
        return "float", struct.unpack("<f", raw[pos:pos + 4])[0]
    if field == 3:
        return "double", struct.unpack("<d", raw[pos:pos + 8])[0]
    if field == 4:
        v, pos = _read_varint(raw, pos)
        if v >= 1 << 63:
            v -= 1 << 64
        return "int", v
    if field == 5:
        v, pos = _read_varint(raw, pos)
        return "uint", v
    if field == 6:
        v, pos = _read_varint(raw, pos)
        return "sint", (v >> 1) ^ -(v & 1)
    if field == 7:
        v, pos = _read_varint(raw, pos)
        return "bool", bool(v)
    return "null", None


# -s projection (decode.cpp:560,611; projection.cpp:13-19): module
# state like the reference's global `projection`
PROJECTION = "EPSG:4326"
PROJECTION_ALIAS = {"EPSG:4326": "urn:ogc:def:crs:OGC:1.3:CRS84",
                    "EPSG:3857": "urn:ogc:def:crs:EPSG::3857"}


def _unproject(wx: int, wy: int) -> tuple[float, float]:
    """projection.cpp unproject at zoom 32 (tile2lonlat, or
    tiletoepsg3857 under -s EPSG:3857)."""
    if PROJECTION == "EPSG:3857":
        ox = (wx - (1 << 31)) * math.pi * 6378137.0 / (1 << 31)
        oy = (((1 << 32) - 1 - wy) - (1 << 31)) * math.pi * 6378137.0 \
            / (1 << 31)
        return ox, oy
    n = 1 << 32
    lon = 360.0 * wx / n - 180.0
    lat = math.atan(math.sinh(math.pi * (1 - 2.0 * wy / n))) * 180.0 / math.pi
    return lon, lat


def _flat_ops(geom_raw: bytes) -> list[tuple[int, int, int]]:
    """Geometry bytes → flat [(op, x, y)] vertex list (closepath has
    no coordinates)."""
    vals = []
    pos = 0
    while pos < len(geom_raw):
        v, pos = _read_varint(geom_raw, pos)
        vals.append(v)
    out = []
    x = y = 0
    i = 0
    while i < len(vals):
        cmd = vals[i] & 7
        count = vals[i] >> 3
        i += 1
        if cmd == CLOSEPATH:
            for _ in range(max(1, count)):
                out.append((CLOSEPATH, 0, 0))
            continue
        for _ in range(count):
            dx = (vals[i] >> 1) ^ -(vals[i] & 1)
            dy = (vals[i + 1] >> 1) ^ -(vals[i + 1] & 1)
            i += 2
            x += dx
            y += dy
            out.append((cmd, x, y))
    return out


def _write_coords(state: JsonWriter, ll, scale: float):
    op, lon, lat, px, py = ll
    if scale == 0:
        state.write_float(lon)
        state.write_float(lat)
    else:
        state.write_number(px / scale)
        state.write_number(py / scale)


def layer_to_geojson(lay: dict, z: int, x: int, y: int, comma: bool,
                     name: bool, zoom: bool, state: JsonWriter,
                     scale: float = 0.0,
                     include_attr: frozenset = frozenset()):
    """write_json.cpp:271-630 over a decode_tile_raw layer dict."""
    keys = lay["keys"]
    vraw = lay["values_raw"]
    extent = lay["extent"]
    for f in lay["features"]:
        state.write_hash()
        state.write_string("type")
        state.write_string("Feature")
        if f["id"] is not None:
            state.write_string("id")
            state.write_unsigned(f["id"])
        if name or zoom:
            state.write_string("tippecanoe")
            state.write_hash()
            if name:
                state.write_string("layer")
                state.write_string(lay["name"])
            if zoom:
                state.write_string("minzoom")
                state.write_unsigned(z)
                state.write_string("maxzoom")
                state.write_unsigned(z)
            state.end_hash()
        state.write_string("properties")
        state.write_hash()
        ti = f["tag_idx"]
        for t in range(0, len(ti) - 1, 2):
            key = keys[ti[t]]
            if include_attr and key not in include_attr:
                continue
            kind, val = _value_typed(vraw[ti[t + 1]])
            state.write_string(key)
            if kind == "string":
                state.write_string(val)
            elif kind in ("int", "sint"):
                state.write_signed(val)
            elif kind == "uint":
                state.write_unsigned(val)
            elif kind in ("double", "float"):
                state.write_number(val)
            elif kind == "bool":
                state.write_bool(val)
            else:
                state.write_null()
        state.end_hash()

        state.write_string("geometry")
        state.write_hash()
        ops = []
        wscale = 1 << (32 - z)
        per = wscale // extent
        for op, px, py in _flat_ops(f["geom_raw"]):
            if op in (MOVETO, LINETO):
                wx = wscale * x + per * px
                wy = wscale * y + per * py
                lon, lat = _unproject(wx, wy)
                ops.append((op, lon, lat, px, py))
            else:
                ops.append((op, 0.0, 0.0, 0, 0))

        ftype = f["type"]
        if ftype == 1:  # point
            if len(ops) == 1:
                state.write_string("type")
                state.write_string("Point")
                state.write_string("coordinates")
                state.write_array()
                _write_coords(state, ops[0], scale)
                state.end_array()
            else:
                state.write_string("type")
                state.write_string("MultiPoint")
                state.write_string("coordinates")
                state.write_array()
                for ll in ops:
                    state.write_array()
                    _write_coords(state, ll, scale)
                    state.end_array()
                state.end_array()
        elif ftype == 2:  # line
            movetos = sum(1 for ll in ops if ll[0] == MOVETO)
            if movetos < 2:
                state.write_string("type")
                state.write_string("LineString")
                state.write_string("coordinates")
                state.write_array()
                for ll in ops:
                    state.write_array()
                    _write_coords(state, ll, scale)
                    state.end_array()
                state.end_array()
            else:
                state.write_string("type")
                state.write_string("MultiLineString")
                state.write_string("coordinates")
                state.write_array()
                state.write_array()
                sstate = 0
                for ll in ops:
                    if ll[0] == MOVETO:
                        if sstate == 0:
                            state.write_array()
                            _write_coords(state, ll, scale)
                            state.end_array()
                            sstate = 1
                        else:
                            state.end_array()
                            state.write_array()
                            state.write_array()
                            _write_coords(state, ll, scale)
                            state.end_array()
                            sstate = 1
                    else:
                        state.write_array()
                        _write_coords(state, ll, scale)
                        state.end_array()
                state.end_array()
                state.end_array()
        elif ftype == 3:  # polygon
            rings: list[list] = []
            areas: list[float] = []
            for i, ll in enumerate(ops):
                if ll[0] == MOVETO:
                    rings.append([])
                    areas.append(0.0)
                if rings:
                    if ll[0] == CLOSEPATH:
                        rings[-1].append(rings[-1][0])
                    else:
                        rings[-1].append(ll)
            outer = 0
            for i, ring in enumerate(rings):
                area = 0.0
                m = len(ring)
                for k in range(m):
                    if ring[k][0] != CLOSEPATH:
                        area += float(ring[k][3]) * float(ring[(k + 1) % m][4])
                        area -= float(ring[k][4]) * float(ring[(k + 1) % m][3])
                area /= 2
                areas[i] = area
                if area >= 0 or i == 0:
                    outer += 1
            if outer > 1:
                state.write_string("type")
                state.write_string("MultiPolygon")
                state.write_string("coordinates")
                state.write_array()
                state.write_array()
                state.write_array()
            else:
                state.write_string("type")
                state.write_string("Polygon")
                state.write_string("coordinates")
                state.write_array()
                state.write_array()
            sstate = 0
            for i, ring in enumerate(rings):
                if areas[i] >= 0:
                    if sstate != 0:
                        state.end_array()
                        state.end_array()
                        state.write_array()
                        state.write_array()
                    sstate = 1
                if sstate == 2:
                    state.end_array()
                    state.write_array()
                for ll in ring:
                    state.write_array()
                    _write_coords(state, ll, scale)
                    state.end_array()
                sstate = 2
            if outer > 1:
                state.end_array()
                state.end_array()
                state.end_array()
            else:
                state.end_array()
                state.end_array()
        state.end_hash()
        state.end_hash()
        if comma:
            state.write_newline()
            state.comma_newline()


def _handle(message: bytes, z: int, x: int, y: int,
            to_decode: frozenset, stats: bool, state: JsonWriter,
            coordinate_mode: int, pipeline: bool = False):
    """decode.cpp:96-238 handle() for one tile."""
    was_compressed = message[:2] == b"\x1f\x8b" or message[:1] == b"\x78"
    layers = decode_tile_raw(bytes(message))
    if stats:
        _do_stats(layers, len(message), was_compressed, z, x, y, state)
        return
    if pipeline:
        # -c: bare features at the top level with the tippecanoe
        # envelope (layer/minzoom/maxzoom), newline-separated
        for lay in layers:
            if to_decode and lay["name"] not in to_decode:
                continue
            scale = 0.0
            if coordinate_mode == 1:
                scale = float(lay["extent"])
            elif coordinate_mode == 2:
                scale = 1.0
            layer_to_geojson(lay, z, x, y, False, True, True, state,
                             scale=scale)
        return
    state.write_hash()
    state.write_string("type")
    state.write_string("FeatureCollection")
    state.write_string("properties")
    state.write_hash()
    state.write_string("zoom")
    state.write_signed(z)
    state.write_string("x")
    state.write_signed(x)
    state.write_string("y")
    state.write_signed(y)
    if not was_compressed:
        state.write_string("compressed")
        state.write_bool(False)
    state.end_hash()
    if PROJECTION != "EPSG:4326":
        # crs block (decode.cpp:141-157)
        state.write_string("crs")
        state.write_hash()
        state.write_string("type")
        state.write_string("name")
        state.write_string("properties")
        state.write_hash()
        state.write_string("name")
        state.write_string(PROJECTION_ALIAS[PROJECTION])
        state.end_hash()
        state.end_hash()
    state.write_string("features")
    state.write_array()
    state.write_newline()
    first_layer = True
    for lay in layers:
        if to_decode and lay["name"] not in to_decode:
            continue
        if not first_layer:
            state.comma_newline()
        state.write_hash()
        state.write_string("type")
        state.write_string("FeatureCollection")
        state.write_string("properties")
        state.write_hash()
        state.write_string("layer")
        state.write_string(lay["name"])
        state.write_string("version")
        state.write_signed(lay["version"])
        state.write_string("extent")
        state.write_signed(lay["extent"])
        state.end_hash()
        state.write_string("features")
        state.write_array()
        state.write_newline()
        first_layer = False
        scale = 0.0
        if coordinate_mode == 1:  # fraction
            scale = float(lay["extent"])
        elif coordinate_mode == 2:  # integer
            scale = 1.0
        layer_to_geojson(lay, z, x, y, True, False, False, state,
                         scale=scale)
        state.end_array()
        state.end_hash()
        state.write_newline()
    state.end_array()
    state.end_hash()
    state.write_newline()


def _do_stats(layers, size, compressed, z, x, y, state: JsonWriter):
    state.write_hash()
    state.write_string("zoom")
    state.write_signed(z)
    state.write_string("x")
    state.write_unsigned(x)
    state.write_string("y")
    state.write_unsigned(y)
    state.write_string("bytes")
    state.write_unsigned(size)
    state.write_string("compressed")
    state.write_bool(compressed)
    state.write_string("layers")
    state.write_hash()
    for lay in layers:
        state.write_string(lay["name"])
        points = sum(1 for f in lay["features"] if f["type"] == 1)
        lines = sum(1 for f in lay["features"] if f["type"] == 2)
        polygons = sum(1 for f in lay["features"] if f["type"] == 3)
        state.write_hash()
        state.write_string("points")
        state.write_unsigned(points)
        state.write_string("lines")
        state.write_unsigned(lines)
        state.write_string("polygons")
        state.write_unsigned(polygons)
        state.write_string("extent")
        state.write_signed(lay["extent"])
        state.end_hash()
    state.end_hash()
    state.end_hash()
    state.write_newline()


def _pmtiles_meta_and_entries(path: str):
    """Parse a PMTiles v3 archive: ((z, x, y, tile_bytes) entries in
    TMS order, metadata rows per pmtilesmeta2tmp —
    pmtiles_file.cpp:341-470: header bounds/center/zooms plus the JSON
    metadata keys with vector_layers/tilestats re-wrapped as 'json')."""
    import json as _json

    from ..sources.pmtiles import (
        COMPRESSION_GZIP, deserialize_directory, tileid_to_zxy,
    )

    with open(path, "rb") as f:
        buf = f.read()
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len, _na, _ne, _nc) = struct.unpack("<11Q", buf[8:96])
    min_zoom, max_zoom = buf[100], buf[101]
    min_lon = int.from_bytes(buf[102:106], "little", signed=True) / 1e7
    min_lat = int.from_bytes(buf[106:110], "little", signed=True) / 1e7
    max_lon = int.from_bytes(buf[110:114], "little", signed=True) / 1e7
    max_lat = int.from_bytes(buf[114:118], "little", signed=True) / 1e7
    center_zoom = buf[118]
    center_lon = int.from_bytes(buf[119:123], "little", signed=True) / 1e7
    center_lat = int.from_bytes(buf[123:127], "little", signed=True) / 1e7
    internal_comp = buf[97]

    def dec(b: bytes) -> bytes:
        return gzip.decompress(b) if internal_comp == COMPRESSION_GZIP else b

    entries = []

    def emit(dir_entries):
        for tid, off, ln, rl in dir_entries:
            for k in range(max(rl, 1)):
                z, x, y = tileid_to_zxy(tid + k)
                entries.append(
                    (z, x, y, buf[data_off + off:data_off + off + ln]))

    root = deserialize_directory(dec(buf[root_off:root_off + root_len]))
    if leaf_len == 0:
        emit(root)
    else:
        for tid, off, ln, rl in root:
            emit(deserialize_directory(
                dec(buf[leaf_off + off:leaf_off + off + ln])))
    # entries_tms order: (z, x, tms_y) ascending
    entries.sort(key=lambda e: (e[0], e[1], (1 << e[0]) - 1 - e[2]))

    md_raw = dec(buf[meta_off:meta_off + meta_len])
    jm = _json.loads(md_raw) if md_raw else {}
    rows = {
        "minzoom": "%d" % min_zoom,
        "maxzoom": "%d" % max_zoom,
        "center": "%f,%f,%d" % (center_lon, center_lat, center_zoom),
        "bounds": "%f,%f,%f,%f" % (min_lon, min_lat, max_lon, max_lat),
    }
    compact = {}
    for k, v in jm.items():
        if k == "vector_layers" and isinstance(v, list):
            compact["vector_layers"] = v
        elif k == "tilestats" and isinstance(v, dict):
            compact["tilestats"] = v
        elif k in ("strategies", "tippecanoe_decisions"):
            rows[k] = _json.dumps(v, separators=(",", ":"),
                                  ensure_ascii=False)
        elif isinstance(v, str):
            rows[k] = v
    if compact:
        rows["json"] = _json.dumps(compact, separators=(",", ":"),
                                   ensure_ascii=False)
    return entries, rows


def decode_to_text(
    path: str,
    minzoom: int = 0,
    maxzoom: int = 32,
    to_decode: frozenset | set = frozenset(),
    exclude_meta: frozenset | set = frozenset(),
    stats: bool = False,
    coordinate_mode: int = 0,
    one_tile: tuple[int, int, int] | None = None,
    pipeline: bool = False,
    projection: str = "EPSG:4326",
) -> str:
    """decode.cpp:240-520: the whole-tileset decode (metadata block
    sorted by name, tiles in z/x/tms_y order), a single z/x/y tile,
    or a bare single-tile .pbf file (decode.cpp:247-270: any file
    whose magic is neither SQLite nor PMTiles, z/x/y required).
    Reads mbtiles or a dirtiles directory (y reversed within x, like
    enumerate_dirtiles)."""
    import os

    global PROJECTION
    PROJECTION = projection

    state = JsonWriter()
    to_decode = frozenset(to_decode)
    exclude_meta = frozenset(exclude_meta)

    if os.path.isfile(path):
        with open(path, "rb") as f:
            magic = f.read(16)
        if (not magic.startswith(b"SQLite format 3")
                and not magic.startswith(b"PMTiles")):
            if one_tile is None:
                raise SystemExit(
                    "Must specify zoom/x/y to decode a single pbf file")
            z, x, y = one_tile
            with open(path, "rb") as f:
                data = f.read()
            _handle(data, z, x, y, to_decode, stats, state,
                    coordinate_mode, pipeline=pipeline)
            return state.text()

    is_pmtiles = path.endswith(".pmtiles")

    pm_entries = pm_meta = None
    if is_pmtiles:
        pm_entries, pm_meta = _pmtiles_meta_and_entries(path)

    def iter_tiles():
        if is_pmtiles:
            for z, x, y, data in pm_entries:
                if minzoom <= z <= maxzoom:
                    yield z, x, y, data
        elif os.path.isdir(path):
            entries = []
            for zs in os.listdir(path):
                zp = os.path.join(path, zs)
                if not zs.isdigit() or not os.path.isdir(zp):
                    continue
                z = int(zs)
                if z < minzoom or z > maxzoom:
                    continue
                for xs in os.listdir(zp):
                    for yf in os.listdir(os.path.join(zp, xs)):
                        if yf.endswith(".pbf"):
                            entries.append((z, int(xs), int(yf[:-4])))
            # zxy::operator<: z asc, x asc, y DESC (TMS order)
            entries.sort(key=lambda e: (e[0], e[1], -e[2]))
            for z, x, y in entries:
                with open(os.path.join(path, str(z), str(x),
                                       f"{y}.pbf"), "rb") as f:
                    yield z, x, y, f.read()
        else:
            con = sqlite3.connect("file:" + path + "?mode=ro", uri=True)
            try:
                for z, x, ty, data in con.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data "
                    "FROM tiles WHERE zoom_level BETWEEN ? AND ? "
                    "ORDER BY zoom_level, tile_column, tile_row",
                    (minzoom, maxzoom),
                ):
                    yield int(z), int(x), (1 << int(z)) - 1 - int(ty), bytes(data)
            finally:
                con.close()

    def read_meta():
        if is_pmtiles:
            return sorted(pm_meta.items())
        if os.path.isdir(path):
            import json as _json

            mdp = os.path.join(path, "metadata.json")
            if not os.path.exists(mdp):
                return []
            with open(mdp, encoding="utf-8") as f:
                md = _json.load(f)
            return sorted((str(k), str(v)) for k, v in md.items())
        con = sqlite3.connect("file:" + path + "?mode=ro", uri=True)
        try:
            return list(con.execute(
                "SELECT name, value FROM metadata ORDER BY name"))
        finally:
            con.close()

    if one_tile is not None:
        z, x, y = one_tile
        # parent fallback (decode.cpp:496-560): walk up the pyramid
        # until a tile exists
        while z >= 0:
            found = None
            if is_pmtiles:
                for ez, ex, ey, data in pm_entries:
                    if (ez, ex, ey) == (z, x, y):
                        found = data
                        break
            elif os.path.isdir(path):
                p = os.path.join(path, str(z), str(x), f"{y}.pbf")
                if os.path.exists(p):
                    with open(p, "rb") as f:
                        found = f.read()
            else:
                con = sqlite3.connect("file:" + path + "?mode=ro", uri=True)
                row = con.execute(
                    "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
                    "tile_column=? AND tile_row=?",
                    (z, x, (1 << z) - 1 - y)).fetchone()
                con.close()
                if row is not None:
                    found = bytes(row[0])
            if found is not None:
                _handle(found, z, x, y, to_decode, stats, state,
                        coordinate_mode, pipeline=pipeline)
                break
            z -= 1
            x >>= 1
            y >>= 1
        return state.text()

    within = 0
    if pipeline:
        pass
    elif not stats:
        state.write_hash()
        state.write_string("type")
        state.write_string("FeatureCollection")
        state.write_string("properties")
        state.write_hash()
        state.write_newline()
        for mname, mvalue in read_meta():
            if mname in exclude_meta:
                continue
            if within:
                state.comma_newline()
            within = 1
            state.write_string(str(mname))
            state.write_string(str(mvalue))
        state.write_newline()
        state.wantnl = False  # XXX (decode.cpp:363)
        state.end_hash()
        state.write_string("features")
        state.write_array()
        state.write_newline()
    else:
        state.write_array()
        state.write_newline()

    within = 0
    for z, x, y, data in iter_tiles():
        if within and not pipeline:
            state.comma_newline()
        within = 1
        _handle(data, z, x, y, to_decode, stats, state, coordinate_mode,
                pipeline=pipeline)

    if pipeline:
        state.write_newline()
    elif not stats:
        state.end_array()
        state.end_hash()
        state.write_newline()
    else:
        state.end_array()
        state.write_newline()
    return state.text()
