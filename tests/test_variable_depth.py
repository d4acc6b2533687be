"""-at / --generate-variable-depth-tile-pyramid (tile.cpp:1701-1713,
3059-3066): exact-match vs the reference binary on a property-free
synthetic corpus (the complexity estimate is byte-exact there —
stages/serial_bytes reproduces the temp-stream serialization and the
deflate(Z_NO_FLUSH) flush accounting, validated crc-for-crc against an
instrumented reference build)."""

import json
import os
import sqlite3
import subprocess
import tempfile

import numpy as np
import pytest

from tests.conftest import has_reference


@pytest.fixture(scope="module")
def sparse_corpus(tmp_path_factory):
    rs = np.random.RandomState(11)
    feats = []
    for c in range(12):
        cx, cy = rs.uniform(-150, 150), rs.uniform(-60, 60)
        for i in range(150):
            n = rs.randint(6, 30)
            pts = np.cumsum(rs.uniform(-0.02, 0.02, size=(n, 2)), axis=0) + [
                cx + rs.uniform(-1.5, 1.5), cy + rs.uniform(-1.5, 1.5)]
            feats.append({"type": "Feature", "properties": {}, "geometry": {
                "type": "LineString",
                "coordinates": [[round(float(x), 6), round(float(y), 6)] for x, y in pts]}})
    for i in range(400):
        cx, cy = rs.uniform(-170, 170), rs.uniform(-70, 70)
        k = rs.randint(4, 12)
        ang = np.sort(rs.uniform(0, 2 * np.pi, k))
        r = rs.uniform(0.05, 0.4, k)
        ring = [[round(float(cx + rr * np.cos(a)), 6), round(float(cy + rr * np.sin(a)), 6)]
                for a, rr in zip(ang, r)]
        ring.append(ring[0])
        feats.append({"type": "Feature", "properties": {}, "geometry": {
            "type": "Polygon", "coordinates": [ring]}})
    p = tmp_path_factory.mktemp("at") / "corpus.json"
    with open(p, "w") as f:
        for ft in feats:
            f.write(json.dumps(ft) + "\n")
    return str(p)


def _run_pair(src, maxzoom, bucket_zoom):
    from tests.util_reference import TIPPECANOE
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geojson import read_geojson_vector
    from tippecanoe_ray.stages.mvt import decode_tile

    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "o.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, f"-z{maxzoom}", "-q",
             "--generate-variable-depth-tile-pyramid", src],
            check=True, capture_output=True,
        )
        con = sqlite3.connect(mb)
        ref = {}
        for z, x, y, data in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ):
            n = sum(len(l["features"]) for l in decode_tile(bytes(data)))
            ref[(z, x, (1 << z) - 1 - y)] = n
        con.close()
    cfg = VectorConfig(maxzoom=maxzoom, layer_name="corpus",
                       variable_depth=True, bucket_zoom=bucket_zoom)
    tiles = build_vector_pyramid(ingest_features(read_geojson_vector(src), cfg), cfg)
    ours = {}
    for r in tiles.take_all():
        n = sum(len(l["features"]) for l in decode_tile(bytes(r["tile"])))
        ours[(int(r["z"]), int(r["x"]), int(r["y"]))] = n
    return ours, ref


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("bucket_zoom", [0, 2])
def test_variable_depth_exact(ray_session, sparse_corpus, bucket_zoom):
    ours, ref = _run_pair(sparse_corpus, 6, bucket_zoom)
    assert ours == ref  # same leafed tile SET and same per-tile counts
    # the -at run must actually truncate: no tile at the max zoom
    assert max(z for z, _, _ in ours) < 6


def test_stream_est_unit():
    """StreamSizer header accounting + z0 raw mode."""
    from tippecanoe_ray.stages.serial_bytes import (
        StreamSizer, serialize_feature_bytes, svarint, varint,
    )

    assert varint(0) == b"\x00"
    assert svarint(-1) == b"\x01"
    ops = np.array([1, 2, 2], np.uint8)
    xy = np.array([[10, 10], [20, 10], [20, 20]], np.int64)
    fb = serialize_feature_bytes(2, 0, ops, xy, 0, 0)
    # t + layer + seq + segment + 3 ops(1+2+2 deltas each small) + end
    # + nkeys + minzoom
    assert fb[0] == 2 and fb[-1] == 0
    raw = StreamSizer(0, 0, 0, compressed=False)
    raw.write_feature(fb)
    assert raw.complexity() == 8 + 3 + 1 + len(fb)
    comp = StreamSizer(1, 0, 1, compressed=True)
    comp.write_feature(fb)
    # tiny input: only the 2-byte zlib magic is flushed pre-finish
    assert comp.complexity() == 8 + 3 + 2
