"""FlatGeobuf reader: hand-rolled flatbuffers parse validated against
the reference binary on its own tests/flatgeobuf corpus."""

import os
import subprocess
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import has_reference

FGB = "/root/reference/tests/flatgeobuf/numeric-properties.fgb"


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_flatgeobuf_exact(ray_session):
    from tests.util_reference import (
        TIPPECANOE, diff_counts, read_mbtiles_counts, tile_counts_from_ds,
    )
    from tippecanoe_ray.functions.spatial import encode_quadkey
    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid_from_narrow
    from tippecanoe_ray.sources.flatgeobuf import read_flatgeobuf

    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "out.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z4", "-Z0", "-b0", "--no-tile-size-limit",
             "-q", "-r1", FGB],
            check=True, capture_output=True,
        )
        ref = read_mbtiles_counts(mb)
    pts, vec = read_flatgeobuf(FGB)
    assert len(vec) == 0
    wx = pts["wx"].to_numpy()
    wy = pts["wy"].to_numpy()
    narrow = ray.data.from_arrow(pa.table({
        "wx": wx, "wy": wy,
        "index": pa.array(encode_quadkey(wx & ~1, wy & ~1), pa.uint64()),
        "seq": pts["seq"],
    }))
    cfg = PyramidConfig(maxzoom=4, droprate=1.0, bucket_zoom=0)
    tiles = build_pyramid_from_narrow(narrow, cfg, n_rows=len(pts))
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


def test_flatgeobuf_vs_geojson_twin():
    """The corpus ships a .json twin: both parses must agree."""
    from tippecanoe_ray.sources.flatgeobuf import read_flatgeobuf
    from tippecanoe_ray.sources.geojson import read_geojson_points

    pts, _ = read_flatgeobuf(FGB)
    twin = read_geojson_points("/root/reference/tests/flatgeobuf/numeric-properties.json")
    assert len(pts) == len(twin)
    assert np.array_equal(pts["wx"].to_numpy(), twin["wx"].to_numpy())
    assert np.array_equal(pts["wy"].to_numpy(), twin["wy"].to_numpy())
