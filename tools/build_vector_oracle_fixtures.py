"""Build the reference-binary oracle fixtures for the two vector
driver queries (run once per corpus change; the parquet outputs are
committed under tippecanoe_ray/fixtures/).

    python tools/build_vector_oracle_fixtures.py

Runs the reference tippecanoe (TIPPECANOE env or /tmp/refbuild) over
the deterministic corpus in pipelines/vector_fixture.py:
  - full pyramid -z6  → per-zoom (z, n_tiles, n_features)
  - one zoom -Z3 -z3  → per-tile (z, x, y, n_features)
"""

from __future__ import annotations

import gzip
import os
import sqlite3
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from tippecanoe_ray.pipelines import vector_fixture as vf  # noqa: E402
from tippecanoe_ray.stages.mvt import decode_tile  # noqa: E402

TIPPECANOE = os.environ.get("TIPPECANOE", "/tmp/refbuild/tippecanoe")


def mbtiles_counts(path: str) -> dict[tuple[int, int, int], int]:
    con = sqlite3.connect(path)
    out: dict[tuple[int, int, int], int] = {}
    for z, x, tms_y, data in con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ):
        y = (1 << z) - 1 - tms_y
        raw = bytes(data)
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        n = sum(len(lay["features"]) for lay in decode_tile(raw))
        out[(int(z), int(x), int(y))] = n
    con.close()
    return out


def run_ref(feats, flags: list[str]) -> dict[tuple[int, int, int], int]:
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        vf.write_geojson(gj, feats)
        subprocess.run(
            [TIPPECANOE, "-o", mb, "--no-tile-size-limit", "-q", *flags, gj],
            check=True, capture_output=True,
        )
        return mbtiles_counts(mb)


def main() -> None:
    os.makedirs(vf.FIXTURE_DIR, exist_ok=True)
    feats = vf.corpus()

    counts = run_ref(feats, [f"-z{vf.PYRAMID_MAXZOOM}"])
    per_zoom: dict[int, list[int]] = {}
    for (z, _x, _y), n in counts.items():
        per_zoom.setdefault(z, []).append(n)
    df = pd.DataFrame(
        [{"z": z, "n_tiles": len(v), "n_features": sum(v)}
         for z, v in sorted(per_zoom.items())]
    ).astype({"z": "int64", "n_tiles": "int64", "n_features": "int64"})
    df.to_parquet(vf.PYRAMID_FIXTURE, index=False)
    print(f"wrote {vf.PYRAMID_FIXTURE}:\n{df}")

    counts3 = run_ref(feats, [f"-Z{vf.TILES_ZOOM}", f"-z{vf.TILES_ZOOM}"])
    df3 = pd.DataFrame(
        [{"z": z, "x": x, "y": y, "n_features": n}
         for (z, x, y), n in sorted(counts3.items())]
    ).astype({"z": "int64", "x": "int64", "y": "int64",
              "n_features": "int64"})
    df3.to_parquet(vf.TILES_Z3_FIXTURE, index=False)
    print(f"wrote {vf.TILES_Z3_FIXTURE}: {len(df3)} tiles")


if __name__ == "__main__":
    main()
