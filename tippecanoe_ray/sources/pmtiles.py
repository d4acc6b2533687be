"""PMTiles v3 physical container — single-file archive with a
Hilbert-ordered, run-length-coded directory (public spec; semantics
mirrored from the reference writer pmtiles_file.cpp:154-336 and the
vendored spec implementation pmtiles/pmtiles.hpp).

Writer shape: the parallel tiling stages produce the (z, x, y, tile)
dataset; packaging is a driver-side single-writer finalization (same
role as the reference's), streaming tiles in tileid order with
content-hash dedup + run-length coalescing.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import struct

import numpy as np
import ray.data

HEADER_SIZE = 127
COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2
TILETYPE_MVT = 1


def zxy_to_tileid(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Cumulative Hilbert tile id (pmtiles.hpp:387-408), vectorized."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    # zoom base offset: sum of 4^t for t < z
    acc = ((np.int64(1) << (2 * z)) - 1) // 3
    d = np.zeros(len(z), dtype=np.int64)
    tx = x.copy()
    ty = y.copy()
    maxz = int(z.max()) if len(z) else 0
    for bit in range(maxz - 1, -1, -1):
        s = np.int64(1) << bit
        active = z > bit  # levels where this bit participates (s < 2^z)
        rx = ((tx & s) > 0).astype(np.int64)
        ry = ((ty & s) > 0).astype(np.int64)
        d = np.where(active, d + s * s * ((3 * rx) ^ ry), d)
        # rotate quadrant (Hilbert curve reflection)
        swap = active & (ry == 0)
        flip = swap & (rx == 1)
        ntx = np.where(flip, s - 1 - tx, tx)
        nty = np.where(flip, s - 1 - ty, ty)
        tx2 = np.where(swap, nty, ntx)
        ty2 = np.where(swap, ntx, nty)
        tx, ty = tx2, ty2
    return acc + d


def tileid_to_zxy(tileid: int) -> tuple[int, int, int]:
    acc = 0
    for tz in range(32):
        num = 1 << (2 * tz)
        if acc + num > tileid:
            pos = tileid - acc
            # Hilbert d -> (x, y)
            tx = ty = 0
            t = pos
            s = 1
            while s < (1 << tz):
                rx = 1 & (t // 2)
                ry = 1 & (t ^ rx)
                if ry == 0:
                    if rx == 1:
                        tx = s - 1 - tx
                        ty = s - 1 - ty
                    tx, ty = ty, tx
                tx += s * rx
                ty += s * ry
                t //= 4
                s *= 2
            return tz, tx, ty
        acc += num
    raise OverflowError("tileid too large")


def _write_varint(out: bytearray, v: int):
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length) sorted by tile_id
    (pmtiles.hpp:410-439)."""
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for tid, _, _, _ in entries:
        _write_varint(out, tid - last)
        last = tid
    for _, _, _, rl in entries:
        _write_varint(out, rl)
    for _, _, ln, _ in entries:
        _write_varint(out, ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            _write_varint(out, 0)
        else:
            _write_varint(out, off + 1)
    return bytes(out)


def deserialize_directory(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    tids = []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        tids.append(last)
    rls = []
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        rls.append(v)
    lens = []
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        lens.append(v)
    offs = []
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        if v == 0 and i > 0:
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(tids, offs, lens, rls))


def _make_root_leaves(entries: list) -> tuple[bytes, bytes]:
    """Root-only when the compressed root fits 16384-127 bytes, else
    split into gzip leaf directories (pmtiles.hpp:484-516)."""
    test = gzip.compress(serialize_directory(entries), mtime=0)
    if len(test) <= 16384 - HEADER_SIZE:
        return test, b""
    leaf_size = 4096
    while True:
        root_entries = []
        leaves = bytearray()
        for i in range(0, len(entries), leaf_size):
            sub = entries[i : i + leaf_size]
            comp = gzip.compress(serialize_directory(sub), mtime=0)
            root_entries.append((sub[0][0], len(leaves), len(comp), 0))
            leaves += comp
        root = gzip.compress(serialize_directory(root_entries), mtime=0)
        if len(root) <= 16384 - HEADER_SIZE:
            return root, bytes(leaves)
        leaf_size *= 2


def write_pmtiles(
    tile_ds: ray.data.Dataset,
    path: str,
    minzoom: int | None = None,
    maxzoom: int | None = None,
    layer_name: str = "points",
    bounds: tuple[float, float, float, float] = (-180.0, -85.0, 180.0, 85.0),
    compressed_tiles: bool = True,
    meta: dict | None = None,
) -> int:
    """Package a (z, x, y, tile) dataset into a PMTiles v3 archive with
    content-hash dedup and run-length entries (pmtiles_file.cpp:154-336).

    With `meta` (a metadata-table dict, e.g. tile-join's), the JSON
    metadata carries the reference's key set
    (metadata_to_pmtiles_json, pmtiles_file.cpp:86-140: name/format/
    type/description/version/attribution/strategies/decisions/
    generator_options/antimeridian_adjusted_bounds + vector_layers and
    tilestats unpacked from the 'json' row) and the header
    bounds/center/zooms parse from the same dict — so a decode of the
    archive matches a decode of the equivalent mbtiles."""
    rows = tile_ds.select_columns(["z", "x", "y", "tile"]).take_all()
    rows = [r for r in rows if r["tile"] is not None and len(r["tile"])]
    zs = np.array([r["z"] for r in rows], dtype=np.int64)
    xs = np.array([r["x"] for r in rows], dtype=np.int64)
    ys = np.array([r["y"] for r in rows], dtype=np.int64)
    tids = zxy_to_tileid(zs, xs, ys)
    order = np.argsort(tids, kind="stable")

    entries: list[tuple[int, int, int, int]] = []
    data = bytearray()
    seen: dict[str, tuple[int, int]] = {}
    n_addressed = 0
    for i in order:
        blob = bytes(rows[int(i)]["tile"])
        if not blob:
            continue
        tid = int(tids[i])
        n_addressed += 1
        h = hashlib.sha1(blob).hexdigest()
        if h in seen:
            off, ln = seen[h]
            if (
                entries
                and entries[-1][1] == off
                and entries[-1][0] + entries[-1][3] == tid
            ):
                e = entries[-1]
                entries[-1] = (e[0], e[1], e[2], e[3] + 1)
            else:
                entries.append((tid, off, ln, 1))
        else:
            off = len(data)
            data += blob
            seen[h] = (off, len(blob))
            entries.append((tid, off, len(blob), 1))

    root, leaves = _make_root_leaves(entries)
    # metadata is compressed with internal_compression (spec §metadata)
    if meta is not None:
        jm: dict = {}
        for key in ("name", "format", "type", "description", "version",
                    "attribution", "generator", "generator_options",
                    "antimeridian_adjusted_bounds"):
            if key in meta:
                jm[key] = meta[key]
        for key in ("strategies", "tippecanoe_decisions"):
            if meta.get(key):
                jm[key] = json.loads(meta[key])
        if meta.get("json"):
            packed = json.loads(meta["json"])
            if "vector_layers" in packed:
                jm["vector_layers"] = packed["vector_layers"]
            if "tilestats" in packed:
                jm["tilestats"] = packed["tilestats"]
        meta_bytes = gzip.compress(
            json.dumps(jm, separators=(",", ":"),
                       ensure_ascii=False).encode(), mtime=0)
        if "minzoom" in meta:
            minzoom = int(float(meta["minzoom"]))
        if "maxzoom" in meta:
            maxzoom = int(float(meta["maxzoom"]))
        if "bounds" in meta:
            bounds = tuple(float(v) for v in meta["bounds"].split(","))
        center = None
        if "center" in meta:
            cp = meta["center"].split(",")
            center = (float(cp[0]), float(cp[1]),
                      int(float(cp[2])) if len(cp) > 2 else 0)
    else:
        center = None
        meta_bytes = gzip.compress(
            json.dumps(
                {"vector_layers": [{"id": layer_name, "fields": {}}]},
                separators=(",", ":"),
            ).encode(),
            mtime=0,
        )
    zmin = int(minzoom if minzoom is not None else (zs.min() if len(zs) else 0))
    zmax = int(maxzoom if maxzoom is not None else (zs.max() if len(zs) else 0))
    w, s, e, n = bounds
    hdr = b"PMTiles" + bytes([3])
    root_off = HEADER_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_bytes)
    data_off = leaf_off + len(leaves)
    hdr += struct.pack(
        "<11Q", root_off, len(root), meta_off, len(meta_bytes),
        leaf_off, len(leaves),
        data_off, len(data), n_addressed, len(entries), len(seen),
    )
    hdr += bytes([
        1,  # clustered
        COMPRESSION_GZIP,  # internal compression
        COMPRESSION_GZIP if compressed_tiles else COMPRESSION_NONE,
        TILETYPE_MVT,
        zmin, zmax,
    ])
    hdr += struct.pack(
        "<4i", int(w * 1e7), int(s * 1e7), int(e * 1e7), int(n * 1e7)
    )
    if center is not None:
        hdr += bytes([center[2]]) + struct.pack(
            "<2i", int(center[0] * 1e7), int(center[1] * 1e7))
    else:
        hdr += bytes([zmin]) + struct.pack(
            "<2i", int((w + e) / 2 * 1e7), int((s + n) / 2 * 1e7)
        )
    assert len(hdr) == HEADER_SIZE, len(hdr)
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(root)
        f.write(meta_bytes)
        f.write(leaves)
        f.write(data)
    return len(entries)


def read_pmtiles(path: str) -> ray.data.Dataset:
    """Read a PMTiles v3 archive back into a (z, x, y, tile) dataset."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:7] == b"PMTiles" and buf[7] == 3, "not a PMTiles v3 file"
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len, _na, _ne, _nc) = struct.unpack("<11Q", buf[8:96])
    internal_comp = buf[97]

    def _dec(b: bytes) -> bytes:
        return gzip.decompress(b) if internal_comp == COMPRESSION_GZIP else b

    root = deserialize_directory(_dec(buf[root_off : root_off + root_len]))
    rows = []

    def _emit(entries):
        for tid, off, ln, rl in entries:
            for k in range(max(rl, 1)):
                z, x, y = tileid_to_zxy(tid + k)
                rows.append(
                    {"z": z, "x": x, "y": y,
                     "tile": buf[data_off + off : data_off + off + ln]}
                )

    if leaf_len == 0:
        _emit(root)
    else:
        for tid, off, ln, rl in root:
            leaf = deserialize_directory(_dec(buf[leaf_off + off : leaf_off + off + ln]))
            _emit(leaf)
    return ray.data.from_items(rows)
