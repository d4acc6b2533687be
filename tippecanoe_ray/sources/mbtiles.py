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
                  bounds: tuple[float, float, float, float] | None = None,
                  strategies: list[dict] | None = None,
                  meta_fn=None):
    """Package a tile dataset (z, x, y, tile) into an mbtiles file with
    content-hash dedup (mbtiles.cpp:66-149). `layer_name` must match the
    layer id actually encoded in the tiles (PyramidConfig.layer_name);
    bounds/center follow mbtiles.cpp:468-651.

    With `meta_fn`, the metadata table is produced by
    meta_fn(midx, midy, zmin_seen, zmax_seen) — the reference's full
    make_metadata path (stages/metadata.py) — where (midx, midy) is the
    maxzoom tile with the most features, ties to the smallest
    (x << 32 | y) (tile.cpp:3214-3229)."""
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
    cols = ["z", "x", "y", "tile"]
    track_mid = meta_fn is not None and maxzoom is not None
    schema_names = tile_ds.schema().names if track_mid else []
    # rank by total written drawvec entries (write_tile's return value,
    # tile.cpp:2640) when available; feature count otherwise (points)
    mid_col = ("n_geom" if "n_geom" in schema_names
               else "n_features" if "n_features" in schema_names else None)
    if track_mid and mid_col:
        cols.append(mid_col)
    midx = midy = 0
    most = 0
    for batch in tile_ds.select_columns(cols).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        rows_map = []
        rows_img = []
        nf_col = batch[mid_col] if mid_col and mid_col in batch.columns else None
        for i, (z, x, y, data) in enumerate(
            zip(batch["z"], batch["x"], batch["y"], batch["tile"])
        ):
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
            if track_mid and nf_col is not None and int(z) == maxzoom:
                cnt = int(nf_col.iloc[i])
                if cnt > most or (
                    cnt == most
                    and ((int(x) << 32) | int(y)) < ((midx << 32) | midy)
                ):
                    midx, midy, most = int(x), int(y), cnt
        cur.executemany("INSERT INTO map VALUES (?, ?, ?, ?)", rows_map)
        cur.executemany("INSERT INTO images VALUES (?, ?)", rows_img)
    if meta_fn is not None:
        meta = meta_fn(midx, midy, zmin, zmax)
        cur.executemany("INSERT INTO metadata VALUES (?, ?)", list(meta.items()))
        cur.execute(
            "CREATE UNIQUE INDEX IF NOT EXISTS map_index ON map "
            "(zoom_level, tile_column, tile_row)"
        )
        cur.execute(
            "CREATE UNIQUE INDEX IF NOT EXISTS images_id ON images (tile_id)"
        )
        con.commit()
        con.close()
        return n
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
    if strategies is not None:
        # per-zoom strategy counters (mbtiles.cpp:372-460; written when
        # any counter is nonzero, like `any` gates in the reference)
        from ..stages.strategies import stringify_strategies

        if any(zc for zc in strategies):
            meta["strategies"] = stringify_strategies(strategies)
    cur.executemany("INSERT INTO metadata VALUES (?, ?)", list(meta.items()))
    cur.execute(
        "CREATE UNIQUE INDEX IF NOT EXISTS map_index ON map (zoom_level, tile_column, tile_row)"
    )
    cur.execute("CREATE UNIQUE INDEX IF NOT EXISTS images_id ON images (tile_id)")
    con.commit()
    con.close()
    return n


def read_mbtiles(path: str, rows_per_block: int = 2048) -> ray.data.Dataset:
    """Read an mbtiles file into a (z, x, y, tile) Dataset as a
    PARALLEL STREAM: the driver touches only the (z, col, row) key
    space to pick ~rows_per_block-sized key ranges (keyset pagination
    on the tiles index order — works whether `tiles` is a table or the
    reference's map/images view), then each range is read by its own
    task with its own read-only sqlite connection. No tile bytes ever
    pass through the driver. Also reads tilesets produced by the
    reference binary."""
    import os

    uri = "file:" + os.path.abspath(path) + "?mode=ro"
    con = sqlite3.connect(uri, uri=True)
    (total,) = con.execute("SELECT COUNT(*) FROM tiles").fetchone()
    bounds: list[tuple[int, int, int] | None] = [None]
    if total:
        n_blocks = max(1, (int(total) + rows_per_block - 1) // rows_per_block)
        for b in range(1, n_blocks):
            row = con.execute(
                "SELECT zoom_level, tile_column, tile_row FROM tiles "
                "ORDER BY zoom_level, tile_column, tile_row "
                "LIMIT 1 OFFSET ?",
                (b * rows_per_block,),
            ).fetchone()
            if row is not None and (not bounds or bounds[-1] != tuple(row)):
                bounds.append((int(row[0]), int(row[1]), int(row[2])))
    con.close()
    ranges = [
        {"lo_z": -1 if lo is None else lo[0],
         "lo_c": -1 if lo is None else lo[1],
         "lo_r": -1 if lo is None else lo[2],
         "hi_z": (1 << 30) if hi is None else hi[0],
         "hi_c": 0 if hi is None else hi[1],
         "hi_r": 0 if hi is None else hi[2]}
        for lo, hi in zip(bounds, bounds[1:] + [None])
    ]

    import pyarrow as pa

    schema = pa.schema([
        ("z", pa.int32()), ("x", pa.int64()), ("y", pa.int64()),
        ("tile", pa.large_binary()),
    ])

    def read_range(batch: pa.Table) -> pa.Table:
        c = sqlite3.connect(uri, uri=True)
        zs: list[int] = []
        xs: list[int] = []
        ys: list[int] = []
        blobs: list[bytes] = []
        for i in range(batch.num_rows):
            lo = (int(batch["lo_z"][i].as_py()), int(batch["lo_c"][i].as_py()),
                  int(batch["lo_r"][i].as_py()))
            hi = (int(batch["hi_z"][i].as_py()), int(batch["hi_c"][i].as_py()),
                  int(batch["hi_r"][i].as_py()))
            for z, col, row, data in c.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
                "WHERE (zoom_level, tile_column, tile_row) >= (?, ?, ?) "
                "AND (zoom_level, tile_column, tile_row) < (?, ?, ?) "
                "ORDER BY zoom_level, tile_column, tile_row",
                (*lo, *hi),
            ):
                zs.append(int(z))
                xs.append(int(col))
                ys.append((1 << int(z)) - 1 - int(row))
                blobs.append(bytes(data))
        c.close()
        return pa.table(
            {"z": pa.array(zs, pa.int32()), "x": pa.array(xs, pa.int64()),
             "y": pa.array(ys, pa.int64()),
             "tile": pa.array(blobs, pa.large_binary())},
            schema=schema,
        )

    return ray.data.from_items(ranges).map_batches(
        read_range, batch_format="pyarrow", batch_size=1
    )
