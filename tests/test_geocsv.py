"""geocsv point source: column sniffing + reference exact-match on the
reference's own CSV corpus (tests/csv/)."""

import os
import subprocess
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import has_reference

CSV = "/root/reference/tests/csv/ne_110m_populated_places_simple.csv"


def test_sniff_columns():
    from tippecanoe_ray.sources.geocsv import sniff_latlon_columns

    assert sniff_latlon_columns(["name", "lat", "lon"]) == (1, 2)
    assert sniff_latlon_columns(["Y", "X"]) == (0, 1)
    assert sniff_latlon_columns(["MyLatitude", "MyLongitude"]) == (0, 1)
    assert sniff_latlon_columns(["lng", "lat"]) == (1, 0)
    assert sniff_latlon_columns(["a", "b"]) == (-1, -1)


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_geocsv_exact(ray_session):
    from tests.util_reference import (
        TIPPECANOE, diff_counts, read_mbtiles_counts, tile_counts_from_ds,
    )
    from tippecanoe_ray.functions.spatial import encode_quadkey
    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid_from_narrow
    from tippecanoe_ray.sources.geocsv import read_geocsv_points

    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "out.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z6", "-Z0", "-b0", "--no-tile-size-limit",
             "-q", "-r1", CSV],
            check=True, capture_output=True,
        )
        ref = read_mbtiles_counts(mb)
    tbl = read_geocsv_points(CSV)
    wx = tbl["wx"].to_numpy()
    wy = tbl["wy"].to_numpy()
    n = len(tbl)
    narrow = ray.data.from_arrow(
        pa.table(
            {
                "wx": wx, "wy": wy,
                "index": pa.array(encode_quadkey(wx & ~1, wy & ~1), pa.uint64()),
                "seq": tbl["seq"],
            }
        )
    )
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, bucket_zoom=0)
    tiles = build_pyramid_from_narrow(narrow, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d
    # attributes preserved as strings
    assert "name" in tbl.column_names and "pop_max" in tbl.column_names
