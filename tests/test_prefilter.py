"""-C prefilter (plugin.cpp:376-470, run_prefilter tile.cpp:1381-1443):
per-tile shell pipe over NDJSON GeoJSON with the tippecanoe envelope,
applied before the encode scan. Exact per-tile counts vs the reference
binary with the same filter command."""

import os
import sqlite3
import subprocess
import tempfile

import pytest

from tests.conftest import has_reference

FILTER_CMD = (
    "python3 -c \"import sys,json\n"
    "for l in sys.stdin:\n"
    " l=l.strip()\n"
    " if not l: continue\n"
    " f=json.loads(l)\n"
    " if f.get('tippecanoe',{}).get('sequence',0)%2==0: print(json.dumps(f))\""
)


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_prefilter_counts_exact(ray_session):
    from tests.util_reference import TIPPECANOE
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geojson import read_geojson_vector
    from tippecanoe_ray.stages.mvt import decode_tile

    src = "/root/reference/tests/ne_110m_admin_0_countries/in.json.gz"
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "o.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z2", "--no-tile-size-limit", "-q",
             "-C", FILTER_CMD, src],
            check=True, capture_output=True,
        )
        con = sqlite3.connect(mb)
        ref = {}
        for z, x, y, data in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ):
            ref[(z, x, (1 << z) - 1 - y)] = sum(
                len(l["features"]) for l in decode_tile(bytes(data))
            )
        con.close()
    cfg = VectorConfig(maxzoom=2, layer_name="in", prefilter=FILTER_CMD)
    tiles = build_vector_pyramid(ingest_features(read_geojson_vector(src), cfg), cfg)
    ours = {}
    for r in tiles.take_all():
        ours[(int(r["z"]), int(r["x"]), int(r["y"]))] = sum(
            len(l["features"]) for l in decode_tile(bytes(r["tile"]))
        )
    assert ours == ref


def test_prefilter_identity_keeps_counts(ray_session):
    """cat pass-through: same tile set and feature counts as no filter
    (the pipe roundtrips through lon/lat + gscale resnap)."""
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geojson import read_geojson_vector

    src = "/root/reference/tests/ne_110m_admin_0_countries/in.json.gz"
    if not os.path.exists(src):
        pytest.skip("corpus missing")
    base_cfg = VectorConfig(maxzoom=1, layer_name="in")
    raw = read_geojson_vector(src)
    base = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in build_vector_pyramid(ingest_features(raw, base_cfg), base_cfg).take_all()
    }
    cfg = VectorConfig(maxzoom=1, layer_name="in", prefilter="cat")
    ours = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in build_vector_pyramid(ingest_features(raw, cfg), cfg).take_all()
    }
    assert ours == base
