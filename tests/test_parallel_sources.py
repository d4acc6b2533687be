"""Fragment-parallel GeoJSON reading (the reference's -P split,
main.cpp:451-540): newline-delimited input parsed by per-fragment
tasks must be row-identical to the serial parse, at any fragment
size, with globally consistent seq."""

import json
import os

import pyarrow as pa
import pytest
import ray


@pytest.fixture(scope="module")
def nd_path(tmp_path_factory):
    import gzip

    src = "/root/reference/tests/ne_110m_admin_0_countries/in.json.gz"
    if not os.path.exists(src):
        pytest.skip("corpus missing")
    fc = json.loads(gzip.open(src, "rt").read())
    p = tmp_path_factory.mktemp("nd") / "ne_nd.json"
    with open(p, "w") as f:
        for feat in fc["features"]:
            f.write(json.dumps(feat) + "\n")
    return str(p)


def test_parallel_vector_read_identical(ray_session, nd_path):
    from tippecanoe_ray.sources.geojson import (
        _is_ndjson, read_geojson_vector, read_geojson_vector_ds,
    )

    assert _is_ndjson(nd_path)
    serial = read_geojson_vector(nd_path).sort_by("seq")
    for tb in (64 << 10, 512 << 10):
        ds = read_geojson_vector_ds(nd_path, target_bytes=tb)
        par = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("seq")
        assert serial.equals(par)


def test_parallel_points_read_identical(ray_session, tmp_path):
    import numpy as np

    from tippecanoe_ray.sources.geojson import (
        read_geojson_points, read_geojson_points_ds,
    )

    rng = np.random.RandomState(3)
    p = tmp_path / "pts.json"
    with open(p, "w") as f:
        for i in range(3000):
            lon = float(rng.uniform(-179, 179))
            lat = float(rng.uniform(-80, 80))
            f.write(json.dumps({
                "type": "Feature", "properties": {},
                "geometry": {"type": "Point", "coordinates": [lon, lat]},
            }) + "\n")
    serial = read_geojson_points(str(p)).sort_by("seq")
    ds = read_geojson_points_ds(str(p), target_bytes=32 << 10)
    par = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("seq")
    assert serial.equals(par)


def test_non_ndjson_falls_back(ray_session):
    from tippecanoe_ray.sources.geojson import _is_ndjson, read_geojson_vector_ds

    src = "/root/reference/tests/ne_110m_admin_0_countries/in.json.gz"
    if not os.path.exists(src):
        pytest.skip("corpus missing")
    # gz input: not splittable, serial fallback still yields a dataset
    assert not _is_ndjson(src)
    ds = read_geojson_vector_ds(src)
    assert ds.count() > 0

def test_parallel_attrs_identical(ray_session, nd_path):
    """read_geojson_parallel's merged side dict must equal the serial
    read_geojson_attrs — including _RawNum typing of numeric
    properties and ids (serial_val stringification)."""
    from tippecanoe_ray.sources.geojson import (
        read_geojson_attrs, read_geojson_parallel,
    )

    serial = read_geojson_attrs(nd_path)
    par = read_geojson_parallel(nd_path, target_bytes=48 << 10)
    assert par is not None
    _, pattrs = par
    assert pattrs == serial


def test_cli_parallel_ingest_byte_identical(ray_session, nd_path,
                                            tmp_path, capsys):
    """The CLI's fragment-parallel NDJSON ingest must produce the same
    mbtiles bytes as the serial path, at two parallelism levels, for
    the plain and strategy (-as) pipelines."""
    import sqlite3

    from tippecanoe_ray.__main__ import main

    def tiles(p):
        con = sqlite3.connect(p)
        try:
            return {
                (z, x, y): bytes(d) for z, x, y, d in con.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data"
                    " FROM tiles")
            }
        finally:
            con.close()

    for extra in ([], ["--drop-smallest-as-needed",
                       "--max-tile-bytes", "20000"]):
        got = {}
        for tag, frag in (("serial", 1 << 30), ("par", 48 << 10),
                          ("par2", 24 << 10)):
            mb = str(tmp_path / f"{tag}_{len(extra)}.mbtiles")
            rc = main(["--input", nd_path,
                       "--out", str(tmp_path / f"t_{tag}_{len(extra)}"),
                       "--maxzoom", "3", "--mbtiles", mb, "--force",
                       "--fragment-bytes", str(frag)] + extra)
            assert rc == 0
            capsys.readouterr()
            got[tag] = tiles(mb)
        assert got["par"] == got["serial"]
        assert got["par2"] == got["serial"]
