"""Mapbox Vector Tile codec — self-contained protobuf writer/reader.

Wire format per the public MVT 2.1 spec (reference encoder:
/root/reference/mvt.cpp:114+, mvt.hpp:213-238 via protozero; this is a
from-scratch implementation, vectorized for the point-heavy case):

Tile { repeated Layer layers = 3 }
Layer { version=15 (=2), name=1, repeated Feature features=2,
        repeated string keys=3, repeated Value values=4, extent=5 }
Feature { id=1, packed tags=2, type=3, packed geometry=4 }
Value { string=1 | float=2 | double=3 | int=4 | uint=5 | sint=6 | bool=7 }

Geometry: command integers (id & 7) | (count << 3); MoveTo=1, LineTo=2,
ClosePath=7; parameters are zigzag-encoded deltas from the previous
coordinate. Tiles are gzip-compressed unless disabled (reference
compression.cpp; `-pC`).
"""

from __future__ import annotations

import gzip
import math
import struct
import zlib

import numpy as np

DEFAULT_EXTENT = 4096
MOVETO, LINETO, CLOSEPATH = 1, 2, 7
POINT, LINESTRING, POLYGON = 1, 2, 3


# ------------------------------------------------------------- varint kernels


def varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_array(vals: np.ndarray) -> bytes:
    """Vectorized LEB128 of a uint64 array (the hot path: packed
    geometry / tags of big point tiles)."""
    v = np.asarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    nb = np.ones(n, dtype=np.int64)
    while True:
        tmp = tmp >> np.uint64(7)
        more = tmp != 0
        if not more.any():
            break
        nb += more
    del nbits
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.zeros(n, dtype=np.int64)
    pos[1:] = np.cumsum(nb)[:-1]
    shift = np.uint64(0)
    idx = pos.copy()
    remaining = v.copy()
    alive = np.ones(n, dtype=bool)
    while alive.any():
        b = (remaining & np.uint64(0x7F)).astype(np.uint8)
        remaining = remaining >> np.uint64(7)
        more = remaining != 0
        b = np.where(more, b | 0x80, b)
        out[idx[alive]] = b[alive]
        idx = idx + 1
        alive = alive & more
        shift += np.uint64(7)
    return out.tobytes()


def zigzag(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def unzigzag(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -((v & np.uint64(1)).astype(np.int64))


def gzip_tile(raw: bytes, exact: bool = False) -> bytes:
    """Per-tile gzip. exact=True reproduces the reference byte-for-byte
    (deflateInit2(Z_DEFAULT_COMPRESSION, 31, memLevel 8), mvt.cpp:87-95)
    — the vector path uses it so whole tiles stay byte-identical.
    exact=False keeps the size-adaptive deflate window (deflateInit's
    window+hash allocation dominates for the tiny tiles that make up
    most of a z14 point pyramid, ~30 µs vs ~2 µs per call; same
    decompressed content, different deflate bytes)."""
    if exact:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS, 8)
        return co.compress(raw) + co.flush()
    n = len(raw)
    if n <= 512:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + 9, 2)
    elif n <= 2048:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + 11, 4)
    else:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def _key(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + varint(len(payload)) + payload


def _tag_varint(field: int, v: int) -> bytes:
    return _key(field, 0) + varint(v)


# ------------------------------------------------------------------ values


def encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag_varint(7, 1 if v else 0)
    if isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            return _tag_varint(4, v)
        return _key(6, 0) + varint(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))
    if isinstance(v, (float, np.floating)):
        return _key(3, 1) + struct.pack("<d", float(v))
    if isinstance(v, bytes):
        return _len_delim(1, v)
    return _len_delim(1, str(v).encode("utf-8"))


# ----------------------------------------------------------------- geometry


def encode_point_geometries(xs: np.ndarray, ys: np.ndarray) -> list[bytes]:
    """Per-feature single-point geometries, vectorized: each is
    [MoveTo|1<<3, zz(dx), zz(dy)] with deltas from (0,0)."""
    zx = zigzag(xs)
    zy = zigzag(ys)
    cmd = np.uint64((1 << 3) | MOVETO)
    out = []
    # encode each triple; vectorize by concatenating then splitting
    tri = np.empty(len(xs) * 3, dtype=np.uint64)
    tri[0::3] = cmd
    tri[1::3] = zx
    tri[2::3] = zy
    blob = varint_array(tri)
    # split points: recompute per-value byte lengths
    lens = np.ones(len(tri), dtype=np.int64)
    tmp = tri.copy()
    while True:
        tmp = tmp >> np.uint64(7)
        more = tmp != 0
        if not more.any():
            break
        lens += more
    ends = np.cumsum(lens)
    starts = ends - lens
    for i in range(len(xs)):
        out.append(blob[starts[3 * i] : ends[3 * i + 2]])
    return out


def _part_vals(pts: np.ndarray, px: int, py: int, close: bool) -> tuple[np.ndarray, int, int]:
    """Command+zigzag value stream for one part, vectorized."""
    pts = np.asarray(pts, dtype=np.int64)
    n = len(pts)
    dx = np.diff(np.concatenate(([px], pts[:, 0])))
    dy = np.diff(np.concatenate(([py], pts[:, 1])))
    zz = np.empty(2 * n, dtype=np.int64)
    zz[0::2] = (dx << 1) ^ (dx >> 63)
    zz[1::2] = (dy << 1) ^ (dy >> 63)
    k = n - 1
    vals = np.empty(2 * n + (1 if k > 0 else 0) + 1 + (1 if close else 0), dtype=np.uint64)
    vals[0] = (1 << 3) | MOVETO
    vals[1:3] = zz[:2]
    pos = 3
    if k > 0:
        vals[3] = (k << 3) | LINETO
        vals[4 : 4 + 2 * k] = zz[2:]
        pos = 4 + 2 * k
    if close:
        vals[pos] = (1 << 3) | CLOSEPATH
        pos += 1
    return vals[:pos], int(pts[-1, 0]), int(pts[-1, 1])


def encode_linestring(parts: list[np.ndarray]) -> bytes:
    """parts: list of (k,2) int arrays (tile coords)."""
    px = py = 0
    chunks = []
    for pts in parts:
        vals, px, py = _part_vals(pts, px, py, False)
        chunks.append(vals)
    return varint_array(np.concatenate(chunks) if chunks else np.empty(0, np.uint64))


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    px = py = 0
    chunks = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.int64)
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]  # MVT closes rings implicitly
        vals, px, py = _part_vals(ring, px, py, True)
        chunks.append(vals)
    return varint_array(np.concatenate(chunks) if chunks else np.empty(0, np.uint64))


# -------------------------------------------------------------------- layer


def _fnv1a64_slot(s: str) -> int:
    """fnv1a-64 of the utf-8 bytes, reduced mod the reference's
    65536-slot key_dedup table (text.cpp:260-271, mvt.hpp:225)."""
    h = 14695981039346656037
    for c in s.encode("utf-8"):
        h = ((h ^ c) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h & 0xFFFF


_KEY_SLOT_CACHE: dict[str, int] = {}


class ValuePool:
    """Layer-scoped key/value constant pools (mvt.hpp:180-210 interning;
    Arrow dictionary encoding makes this cheap upstream).

    The KEY pool replicates the reference's LOSSY fixed-size dedup
    table (mvt.cpp:617-625): slot = fnv1a64(key) % 65536; on a slot
    collision with a different key, the key is pushed into the pool
    AGAIN and the slot repointed — so colliding keys appear multiple
    times in the wire key table (observed on ne_110m_populated_places:
    POP_MIN/ADM0CAP and POP1990/CITYALT collide, giving 91 pooled keys
    for 87 distinct). Values don't need this: mvt.cpp:383-402 re-sorts
    and crunches value duplicates at encode time, so collision-made
    duplicates never reach the wire."""

    def __init__(self):
        self.keys: list[str] = []
        self.key_slots: dict[int, int] = {}
        self.values: list[bytes] = []
        self.val_idx: dict[bytes, int] = {}

    def key(self, k: str) -> int:
        slot = _KEY_SLOT_CACHE.get(k)
        if slot is None:
            slot = _fnv1a64_slot(k)
            _KEY_SLOT_CACHE[k] = slot
        i = self.key_slots.get(slot, -1)
        if i >= 0 and self.keys[i] == k:
            return i
        i = len(self.keys)
        self.keys.append(k)
        self.key_slots[slot] = i
        return i

    def value(self, v) -> int:
        return self._intern(encode_value(v))

    def value_sv(self, vt: str, s: str) -> int | None:
        enc = encode_serial_value(vt, s)
        if enc is None:
            return None
        return self._intern(enc)

    def value_raw(self, enc: bytes) -> int:
        """Intern a value already in wire form (tile-join reuses the
        input tile's mvt_value verbatim, tile-join.cpp:219)."""
        return self._intern(enc)

    def _intern(self, enc: bytes) -> int:
        i = self.val_idx.get(enc)
        if i is None:
            i = len(self.values)
            self.values.append(enc)
            self.val_idx[enc] = i
        return i


def encode_layer(
    name: str,
    features: list[dict],
    extent: int = DEFAULT_EXTENT,
) -> bytes:
    """features: dicts with 'geom' (bytes), 'type' (int), optional 'id'
    (int), optional 'tags' (list[int], pre-pooled), 'attrs_sv'
    (list[(key, type, string)]) or 'attrs' (dict).

    Byte layout matches mvt_tile::encode (mvt.cpp:321-470): layer
    fields version(15), name(1), extent(5), keys(3), values(4) —
    values stable-sorted by serialized bytes and deduplicated, with
    feature tag indexes remapped — then features(2); feature fields
    type(3), packed tags(2), id(1), geometry(4)."""
    pool = ValuePool()
    spec = []
    for f in features:
        tags = f.get("tags")
        if tags is None and f.get("attrs_sv"):
            tags = []
            for k, vt, s in f["attrs_sv"]:
                if vt == "raw":  # pre-serialized wire value (tile-join)
                    vi = pool.value_raw(s)
                else:
                    vi = pool.value_sv(vt, s)
                    if vi is None:
                        continue  # nulls dropped (write_tile skips mvt_null)
                tags += [pool.key(k), vi]
        if tags is None and f.get("attrs"):
            tags = []
            for k, v in f["attrs"].items():
                if v is None:
                    continue
                tags += [pool.key(k), pool.value(v)]
        spec.append((None if f["type"] is None else int(f["type"]),
                     tags or [], f.get("id"), f["geom"]))
    # sort + dedup values by serialized bytes (mvt.cpp:385-420)
    order = sorted(range(len(pool.values)), key=lambda v: (pool.values[v], v))
    mapping = [0] * len(pool.values)
    value_list: list[bytes] = []
    i = 0
    while i < len(order):
        v = order[i]
        value_list.append(pool.values[v])
        mapping[v] = len(value_list) - 1
        while i + 1 < len(order) and pool.values[order[i + 1]] == pool.values[v]:
            i += 1
            mapping[order[i]] = len(value_list) - 1
        i += 1
    out = _tag_varint(15, 2) + _len_delim(1, name.encode("utf-8"))
    out += _tag_varint(5, extent)
    for k in pool.keys:
        out += _len_delim(3, k.encode("utf-8"))
    for v in value_list:
        out += _len_delim(4, v)
    for t, tags, fid, geom in spec:
        # type None: a geometry-stripped feature (tile-join
        # --exclude-all-tile-geometries sets type -1, which the writer
        # serializes as NO type and NO geometry field at all)
        body = _tag_varint(3, t) if t is not None else b""
        if tags:
            rt = list(tags)
            for j in range(1, len(rt), 2):
                rt[j] = mapping[rt[j]]
            body += _len_delim(2, varint_array(np.array(rt, dtype=np.uint64)))
        if fid is not None:
            body += _tag_varint(1, int(fid))
        if t is not None:
            body += _len_delim(4, geom)
        out += _len_delim(2, body)
    return out


def encode_tile(layers: list[bytes], compress: bool = True,
                exact_gzip: bool = False) -> bytes:
    raw = b"".join(_len_delim(3, l) for l in layers)
    if compress:
        return gzip_tile(raw, exact=exact_gzip)
    return raw


# ------------------------------------------------------------------ decoder


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _decode_value(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            ln, pos = _read_varint(buf, pos)
            return buf[pos : pos + ln].decode("utf-8")
        if field == 2:
            return struct.unpack("<f", buf[pos : pos + 4])[0]
        if field == 3:
            return struct.unpack("<d", buf[pos : pos + 8])[0]
        if field in (4, 5):
            v, pos = _read_varint(buf, pos)
            return v
        if field == 6:
            v, pos = _read_varint(buf, pos)
            return (v >> 1) ^ -(v & 1)
        if field == 7:
            v, pos = _read_varint(buf, pos)
            return bool(v)
    return None


def decode_tile(data: bytes) -> list[dict]:
    """Decode an MVT (transparently gunzipping, mvt.cpp decode) into
    [{name, extent, version, features: [{id, type, tags: {k: v},
    geometry: [(cmd, [(x, y), ...]), ...]}]}]."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    elif data[:1] == b"\x78":
        data = zlib.decompress(data)
    layers = []
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if field == 3 and wire == 2:
            ln, pos = _read_varint(data, pos)
            layers.append(_decode_layer(data[pos : pos + ln]))
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return layers


def decode_tile_raw(data: bytes) -> list[dict]:
    """Decode an MVT preserving wire bytes, for byte-parity rewrites
    (tile-join keeps the input tile's values and geometry verbatim,
    tile-join.cpp:219,332): layers as {name, extent, version, keys:
    [str], values_raw: [bytes] (serialized value messages), features:
    [{id, type, tag_idx: [int], geom_raw: bytes}]}."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    elif data[:1] == b"\x78":
        data = zlib.decompress(data)
    layers = []
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if field == 3 and wire == 2:
            ln, pos = _read_varint(data, pos)
            layers.append(_decode_layer_raw(data[pos : pos + ln]))
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return layers


def _decode_layer_raw(buf: bytes) -> dict:
    name = ""
    extent = DEFAULT_EXTENT
    version = 1
    raw_feats = []
    keys: list[str] = []
    values_raw: list[bytes] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            ln, pos = _read_varint(buf, pos)
            name = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            raw_feats.append(buf[pos : pos + ln])
            pos += ln
        elif field == 3:
            ln, pos = _read_varint(buf, pos)
            keys.append(buf[pos : pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            values_raw.append(bytes(buf[pos : pos + ln]))
            pos += ln
        elif field == 5:
            extent, pos = _read_varint(buf, pos)
        elif field == 15:
            version, pos = _read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    feats = [_decode_feature_raw(f) for f in raw_feats]
    return {"name": name, "extent": extent, "version": version,
            "keys": keys, "values_raw": values_raw, "features": feats}


def _decode_feature_raw(buf: bytes) -> dict:
    fid = None
    ftype = 0
    tag_idx: list[int] = []
    geom_raw = b""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            fid, pos = _read_varint(buf, pos)
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                tag_idx.append(v)
        elif field == 3:
            ftype, pos = _read_varint(buf, pos)
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            geom_raw = bytes(buf[pos : pos + ln])
            pos += ln
        else:
            pos = _skip(buf, pos, wire)
    return {"id": fid, "type": ftype, "tag_idx": tag_idx, "geom_raw": geom_raw}


def serial_val_of_raw(raw: bytes) -> tuple[str, str]:
    """mvt_value_to_serial_val (mvt.cpp:779-817): wire value message →
    (vt, s) with the reference's stringifications — milo dtoa for
    float/double, std::to_string for the integer types."""
    from ..functions.text import dtoa_milo

    pos = 0
    key, pos = _read_varint(raw, pos)
    field = key >> 3
    if field == 1:
        ln, pos = _read_varint(raw, pos)
        return "string", raw[pos : pos + ln].decode("utf-8")
    if field == 2:
        return "double", dtoa_milo(struct.unpack("<f", raw[pos : pos + 4])[0])
    if field == 3:
        return "double", dtoa_milo(struct.unpack("<d", raw[pos : pos + 8])[0])
    if field in (4, 5):
        v, pos = _read_varint(raw, pos)
        if field == 4 and v >= 1 << 63:  # two's-complement int_value
            v -= 1 << 64
        return "double", str(v)
    if field == 6:
        v, pos = _read_varint(raw, pos)
        return "double", str((v >> 1) ^ -(v & 1))
    if field == 7:
        v, pos = _read_varint(raw, pos)
        return "bool", "true" if v else "false"
    return "null", "null"


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    elif wire == 1:
        pos += 8
    return pos


def _decode_layer(buf: bytes) -> dict:
    name = ""
    extent = DEFAULT_EXTENT
    version = 1
    raw_feats = []
    keys: list[str] = []
    values: list = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            ln, pos = _read_varint(buf, pos)
            name = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            raw_feats.append(buf[pos : pos + ln])
            pos += ln
        elif field == 3:
            ln, pos = _read_varint(buf, pos)
            keys.append(buf[pos : pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            values.append(_decode_value(buf[pos : pos + ln]))
            pos += ln
        elif field == 5:
            extent, pos = _read_varint(buf, pos)
        elif field == 15:
            version, pos = _read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    feats = [_decode_feature(f, keys, values) for f in raw_feats]
    return {"name": name, "extent": extent, "version": version, "features": feats}


def _decode_feature(buf: bytes, keys: list, values: list) -> dict:
    fid = None
    ftype = 0
    tags: dict = {}
    geom: list = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1:
            fid, pos = _read_varint(buf, pos)
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            ts = []
            while pos < end:
                v, pos = _read_varint(buf, pos)
                ts.append(v)
            for i in range(0, len(ts) - 1, 2):
                tags[keys[ts[i]]] = values[ts[i + 1]]
        elif field == 3:
            ftype, pos = _read_varint(buf, pos)
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            vals = []
            while pos < end:
                v, pos = _read_varint(buf, pos)
                vals.append(v)
            geom = _decode_geometry(vals)
        else:
            pos = _skip(buf, pos, wire)
    return {"id": fid, "type": ftype, "tags": tags, "geometry": geom}


def _decode_geometry(vals: list[int]) -> list:
    out = []
    x = y = 0
    i = 0
    while i < len(vals):
        cmd = vals[i] & 7
        count = vals[i] >> 3
        i += 1
        if cmd == CLOSEPATH:
            out.append((cmd, []))
            continue
        pts = []
        for _ in range(count):
            dx = (vals[i] >> 1) ^ -(vals[i] & 1)
            dy = (vals[i + 1] >> 1) ^ -(vals[i + 1] & 1)
            i += 2
            x += dx
            y += dy
            pts.append((x, y))
        out.append((cmd, pts))
    return out


# ------------------------------------------------ serialized attribute values


def _c_strtoll(s: str, unsigned: bool):
    """C strtol(l)/strtoull with base 0 (mvt.cpp:637-705 callers):
    optional whitespace + sign, 0x hex / leading-0 octal / decimal.
    Returns (value, end_index) or None on no parse."""
    i = 0
    n = len(s)
    while i < n and s[i] in " \t\r\n\f\v":
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        if s[i] == "-":
            sign = -1
        i += 1
    base = 10
    if i + 1 < n and s[i] == "0" and s[i + 1] in "xX":
        base = 16
        i += 2
    elif i < n and s[i] == "0":
        base = 8
    digits = "0123456789abcdef"[:base]
    start = i
    v = 0
    while i < n and s[i].lower() in digits:
        v = v * base + int(s[i], base)
        i += 1
    if i == start and base != 8:
        return None
    return sign * v, i


def is_integer_str(s: str):
    """mvt.cpp:637-666 — strtoll then allow a trailing .000… run.
    Returns int64 value or None."""
    r = _c_strtoll(s, False)
    if r is None:
        return None
    v, end = r
    if v > (1 << 63) - 1 or v < -(1 << 63):
        return None  # ERANGE clamps to LLONG_MIN/MAX -> rejected
    rest = s[end:]
    if rest:
        if not rest.startswith("."):
            return None
        if any(c != "0" for c in rest[1:]):
            return None
    return v


def is_unsigned_integer_str(s: str):
    """mvt.cpp:668-705. Returns uint64 value or None."""
    i = 0
    while i < len(s) and s[i] in " \t\r\n\f\v":
        i += 1
    if i < len(s) and s[i] == "-":
        return None
    r = _c_strtoll(s, True)
    if r is None:
        return None
    v, end = r
    if v >= (1 << 64):
        return None  # ERANGE
    rest = s[end:]
    if rest:
        if not rest.startswith("."):
            return None
        if any(c != "0" for c in rest[1:]):
            return None
    return v


def encode_serial_value(vt: str, s: str) -> bytes | None:
    """stringified_to_mvt_value (mvt.cpp:713-772) + the MVT value wire
    writes (mvt.cpp:340-360): choose the smallest numeric type that
    keeps precision. vt: 'string' | 'double' | 'bool' | 'null'.
    Returns None for null (dropped from tags)."""
    if vt == "double":
        uv = is_unsigned_integer_str(s)
        if uv is not None:
            if uv <= (1 << 63) - 1:
                return _tag_varint(4, uv)  # mvt_int
            return _tag_varint(5, uv)      # mvt_uint
        v = is_integer_str(s)
        if v is not None:
            return _key(6, 0) + varint(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))
        try:
            d = float(s)
        except ValueError:
            d = 0.0
        # strtof ERANGE (value out of float range) → double; a literal
        # Infinity parses as float-inf == double-inf → float, like the
        # reference's f == d check (mvt.cpp:737-755)
        try:
            f32 = struct.unpack("<f", struct.pack("<f", d))[0]
            use_float = f32 == d
        except OverflowError:
            use_float = False
        if use_float:
            return _key(2, 5) + struct.pack("<f", d)   # mvt_float
        return _key(3, 1) + struct.pack("<d", d)        # mvt_double
    if vt == "sint":
        # mvt_sint zigzag (the -ag density tag, tile.cpp:2668-2671)
        v = int(s)
        return _key(6, 0) + varint(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))
    if vt == "bool":
        return _tag_varint(7, 1 if s.startswith("t") else 0)
    if vt == "null":
        return None
    return _len_delim(1, s.encode("utf-8"))
