"""Exact-match on the reference's own test corpus: Natural Earth
populated places (243 real-world points,
/root/reference/tests/ne_110m_populated_places/in.json — used as INPUT
DATA, the same way the reference's own test suite uses it)."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import has_reference
from tippecanoe_ray.functions.spatial import lonlat_to_world
from tippecanoe_ray.pipelines.pyramid import (
    PyramidConfig,
    build_pyramid_from_narrow,
)

CORPUS = "/root/reference/tests/ne_110m_populated_places/in.json"


def _load_points():
    with open(CORPUS) as f:
        doc = json.load(f)
    lons, lats = [], []
    for feat in doc["features"]:
        if feat["geometry"]["type"] != "Point":
            continue
        lon, lat = feat["geometry"]["coordinates"][:2]
        lons.append(float(lon))
        lats.append(float(lat))
    wx, wy = lonlat_to_world(np.array(lons), np.array(lats))
    return wx, wy


def _run_ours(wx, wy, maxzoom, droprate):
    from tippecanoe_ray.functions.spatial import encode_quadkey

    n = len(wx)
    seq = np.arange(n)
    index = encode_quadkey(wx & ~1, wy & ~1)
    narrow = ray.data.from_arrow(
        pa.table(
            {
                "wx": wx,
                "wy": wy,
                "index": pa.array(index, pa.uint64()),
                "seq": seq,
            }
        )
    )
    cfg = PyramidConfig(maxzoom=maxzoom, droprate=droprate, bucket_zoom=0)
    return build_pyramid_from_narrow(narrow, cfg, n_rows=n)


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("droprate,maxzoom", [(1, 8), (2.5, 10)])
def test_populated_places_exact(ray_session, droprate, maxzoom):
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    wx, wy = _load_points()
    ref = run_reference(wx, wy, maxzoom=maxzoom, droprate=droprate)
    tiles = _run_ours(wx, wy, maxzoom, float(droprate))
    ours = tile_counts_from_ds(tiles)
    d = diff_counts(ours, ref)
    assert not d, d
