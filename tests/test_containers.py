"""pmtiles / dirtiles physical containers: round trips + the reference
toolchain reads our pmtiles output."""

import json
import os
import subprocess

import numpy as np
import pytest

from tests.conftest import has_reference
from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
from tippecanoe_ray.sources.image_table import synthesize_image_table


def _small_tiles(ray_session, n=400, maxzoom=4):
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=maxzoom, droprate=2.5)
    return build_pyramid(ds, cfg, n_rows=n)


def _tile_map(ds):
    return {
        (int(r["z"]), int(r["x"]), int(r["y"])): bytes(r["tile"])
        for r in ds.take_all()
    }


def test_tileid_roundtrip():
    from tippecanoe_ray.sources.pmtiles import tileid_to_zxy, zxy_to_tileid

    rs = np.random.RandomState(0)
    zs = rs.randint(0, 15, 200)
    xs = np.array([rs.randint(0, 1 << z) for z in zs])
    ys = np.array([rs.randint(0, 1 << z) for z in zs])
    tids = zxy_to_tileid(zs, xs, ys)
    for z, x, y, t in zip(zs, xs, ys, tids):
        assert tileid_to_zxy(int(t)) == (int(z), int(x), int(y))
    # zoom offsets: id of (z, 0, 0) == sum of 4^t for t < z
    assert int(zxy_to_tileid(np.array([2]), np.array([0]), np.array([0]))[0]) == 5


def test_pmtiles_roundtrip(ray_session, tmp_path):
    from tippecanoe_ray.sources.pmtiles import read_pmtiles, write_pmtiles

    tiles = _small_tiles(ray_session)
    want = _tile_map(tiles)
    path = str(tmp_path / "out.pmtiles")
    n_entries = write_pmtiles(tiles, path, layer_name="points")
    assert n_entries > 0
    got = _tile_map(read_pmtiles(path))
    assert got == want


@pytest.mark.skipif(not os.path.exists("/tmp/refbuild/tippecanoe-decode"),
                    reason="tippecanoe-decode not built")
def test_pmtiles_read_by_reference(ray_session, tmp_path):
    """The reference's own decoder must accept our archive."""
    from tippecanoe_ray.sources.pmtiles import write_pmtiles

    tiles = _small_tiles(ray_session)
    want = _tile_map(tiles)
    path = str(tmp_path / "ref.pmtiles")
    write_pmtiles(tiles, path, layer_name="points")
    out = subprocess.run(
        ["/tmp/refbuild/tippecanoe-decode", path],
        check=True, capture_output=True, text=True,
    )
    doc = json.loads(out.stdout)
    n_feats = 0
    n_tiles = 0

    def walk(o):
        nonlocal n_feats, n_tiles
        if isinstance(o, dict):
            if o.get("type") == "FeatureCollection" and "zoom" in o.get("properties", {}):
                n_tiles += 1
            if o.get("type") == "Feature" and "geometry" in o:
                n_feats += 1
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(doc)
    assert n_tiles == len(want), (n_tiles, len(want))
    assert n_feats > 0


def test_dirtiles_roundtrip(ray_session, tmp_path):
    from tippecanoe_ray.sources.dirtiles import read_dirtiles, write_dirtiles

    tiles = _small_tiles(ray_session)
    want = _tile_map(tiles)
    out = str(tmp_path / "dir")
    n = write_dirtiles(tiles, out, layer_name="points")
    assert n == len(want)
    got = _tile_map(read_dirtiles(out))
    assert got == want
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert json.loads(meta["json"])["vector_layers"][0]["id"] == "points"
