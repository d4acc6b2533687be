"""dirtiles physical sink/reader — dir/z/x/y.pbf + metadata.json
(dirtiles.cpp:28-65, 288-351). The naturally parallel container: each
tile is its own file, so the Dataset can write shards concurrently
(write_datasink shape); the driver only writes metadata.json."""

from __future__ import annotations

import json
import os

import ray.data


def write_dirtiles(
    tile_ds: ray.data.Dataset,
    out_dir: str,
    layer_name: str = "points",
    minzoom: int | None = None,
    maxzoom: int | None = None,
    name: str = "tiles",
    meta: dict | None = None,
) -> int:
    """Write dir/z/x/y.pbf files in parallel map_batches tasks plus a
    driver-side metadata.json (dir_write_metadata, dirtiles.cpp:289 —
    same name/value pairs as the mbtiles metadata table; pass `meta`
    to write an externally assembled dict, e.g. tile-join's).
    Returns the tile count."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(df):
        import pandas as pd

        n = 0
        zmin, zmax = 32, 0
        for z, x, y, data in zip(df["z"], df["x"], df["y"], df["tile"]):
            if data is None or len(data) == 0:
                continue
            d = os.path.join(out_dir, str(int(z)), str(int(x)))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f"{int(y)}.pbf.inprogress")
            with open(tmp, "wb") as f:
                f.write(bytes(data))
            os.replace(tmp, os.path.join(d, f"{int(y)}.pbf"))
            n += 1
            zmin, zmax = min(zmin, int(z)), max(zmax, int(z))
        return pd.DataFrame({"n": [n], "zmin": [zmin], "zmax": [zmax]})

    parts = tile_ds.select_columns(["z", "x", "y", "tile"]).map_batches(
        write_batch, batch_format="pandas"
    ).to_pandas()
    total = int(parts["n"].sum())
    if meta is None:
        meta = {
            "name": name,
            "format": "pbf",
            "type": "overlay",
            "version": "2",
            "minzoom": str(minzoom if minzoom is not None else int(parts["zmin"].min())),
            "maxzoom": str(maxzoom if maxzoom is not None else int(parts["zmax"].max())),
            "json": json.dumps({"vector_layers": [{"id": layer_name, "fields": {}}]}),
        }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return total


def read_dirtiles(out_dir: str) -> ray.data.Dataset:
    """Enumerate dir/z/x/y.pbf into a (z, x, y, tile) dataset (reads
    happen inside tasks; the driver only lists paths)."""
    paths = []
    for z in sorted(os.listdir(out_dir)):
        zp = os.path.join(out_dir, z)
        if not z.isdigit() or not os.path.isdir(zp):
            continue
        for x in sorted(os.listdir(zp)):
            xp = os.path.join(zp, x)
            for yf in sorted(os.listdir(xp)):
                if yf.endswith(".pbf"):
                    paths.append((int(z), int(x), int(yf[:-4]), os.path.join(xp, yf)))

    def load(batch):
        import pandas as pd

        rows = {"z": [], "x": [], "y": [], "tile": []}
        for z, x, y, p in zip(batch["z"], batch["x"], batch["y"], batch["path"]):
            with open(p, "rb") as f:
                rows["tile"].append(f.read())
            rows["z"].append(int(z))
            rows["x"].append(int(x))
            rows["y"].append(int(y))
        return pd.DataFrame(rows)

    import pandas as pd

    idx = pd.DataFrame(
        {"z": [p[0] for p in paths], "x": [p[1] for p in paths],
         "y": [p[2] for p in paths], "path": [p[3] for p in paths]}
    )
    return ray.data.from_pandas(idx).map_batches(load, batch_format="pandas")
