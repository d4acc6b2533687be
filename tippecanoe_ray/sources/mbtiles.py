"""mbtiles physical sink/reader — the reference's primary tileset
container (mbtiles.cpp:29-149: map/images split with content-hash
dedup, TMS row flip, metadata table).

Parallel tiling writes stay on the parquet tileset (embarrassingly
parallel); mbtiles packaging is a single-writer finalization pass, the
same role the sqlite mutex plays in the reference (tile.cpp:3038-3057)
— here a driver-side stream over ``iter_batches`` so the tile dataset
never materializes in memory.
"""

from __future__ import annotations

import hashlib
import json
import sqlite3

import ray.data


def write_mbtiles(tile_ds: ray.data.Dataset, path: str, name: str = "tiles",
                  minzoom: int | None = None, maxzoom: int | None = None,
                  layer_name: str = "points",
                  bounds: tuple[float, float, float, float] | None = None):
    """Package a tile dataset (z, x, y, tile) into an mbtiles file with
    content-hash dedup (mbtiles.cpp:66-149). `layer_name` must match the
    layer id actually encoded in the tiles (PyramidConfig.layer_name);
    bounds/center follow mbtiles.cpp:468-651."""
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA journal_mode = OFF")
    cur.execute("PRAGMA synchronous = OFF")
    cur.execute("CREATE TABLE IF NOT EXISTS metadata (name text, value text)")
    cur.execute(
        "CREATE TABLE IF NOT EXISTS map (zoom_level integer, tile_column integer, "
        "tile_row integer, tile_id text)"
    )
    cur.execute("CREATE TABLE IF NOT EXISTS images (tile_data blob, tile_id text)")
    cur.execute(
        "CREATE VIEW IF NOT EXISTS tiles AS SELECT map.zoom_level AS zoom_level, "
        "map.tile_column AS tile_column, map.tile_row AS tile_row, "
        "images.tile_data AS tile_data FROM map JOIN images ON images.tile_id = map.tile_id"
    )
    seen: set[str] = set()
    zmin, zmax = 32, 0
    n = 0
    for batch in tile_ds.select_columns(["z", "x", "y", "tile"]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        rows_map = []
        rows_img = []
        for z, x, y, data in zip(batch["z"], batch["x"], batch["y"], batch["tile"]):
            if data is None or len(data) == 0:
                continue
            data = bytes(data)
            tid = hashlib.sha1(data).hexdigest()
            tms_y = (1 << int(z)) - 1 - int(y)
            rows_map.append((int(z), int(x), tms_y, tid))
            if tid not in seen:
                seen.add(tid)
                rows_img.append((sqlite3.Binary(data), tid))
            zmin, zmax = min(zmin, int(z)), max(zmax, int(z))
            n += 1
        cur.executemany("INSERT INTO map VALUES (?, ?, ?, ?)", rows_map)
        cur.executemany("INSERT INTO images VALUES (?, ?)", rows_img)
    meta = {
        "name": name,
        "format": "pbf",
        "type": "overlay",
        "version": "2",
        "minzoom": str(minzoom if minzoom is not None else zmin),
        "maxzoom": str(maxzoom if maxzoom is not None else zmax),
        "json": json.dumps({"vector_layers": [{"id": layer_name, "fields": {}}]}),
    }
    if bounds is not None:
        w, s, e, nb = bounds
        meta["bounds"] = f"{w:f},{s:f},{e:f},{nb:f}"
        meta["center"] = f"{(w + e) / 2:f},{(s + nb) / 2:f},{max(zmin, 0)}"
    cur.executemany("INSERT INTO metadata VALUES (?, ?)", list(meta.items()))
    cur.execute(
        "CREATE UNIQUE INDEX IF NOT EXISTS map_index ON map (zoom_level, tile_column, tile_row)"
    )
    cur.execute("CREATE UNIQUE INDEX IF NOT EXISTS images_id ON images (tile_id)")
    con.commit()
    con.close()
    return n


def read_mbtiles(path: str) -> ray.data.Dataset:
    """Read an mbtiles file back into a (z, x, y, n?, tile) dataset —
    also reads tilesets produced by the reference binary."""
    con = sqlite3.connect(path)
    rows = []
    for z, col, row, data in con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ):
        rows.append(
            {
                "z": int(z),
                "x": int(col),
                "y": (1 << int(z)) - 1 - int(row),
                "tile": bytes(data),
            }
        )
    con.close()
    return ray.data.from_items(rows)
