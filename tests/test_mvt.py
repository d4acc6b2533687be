"""MVT codec roundtrip tests."""

import numpy as np

from tippecanoe_ray.stages.mvt import (
    decode_tile,
    encode_layer,
    encode_linestring,
    encode_point_geometries,
    encode_polygon,
    encode_tile,
    varint,
    varint_array,
)
from tippecanoe_ray.stages.tile_encode import encode_point_features, layer_wrap


def test_varint_array_matches_scalar():
    rs = np.random.RandomState(2)
    vals = np.concatenate(
        [
            rs.randint(0, 128, 100),
            rs.randint(0, 1 << 14, 100),
            rs.randint(0, 1 << 35, 100),
            [0, 127, 128, 16383, 16384, (1 << 64) - 1],
        ]
    ).astype(np.uint64)
    blob = varint_array(vals)
    assert blob == b"".join(varint(int(v)) for v in vals)


def test_point_tile_roundtrip():
    xs = np.array([0, 100, 4095, -50, 4200])
    ys = np.array([0, 4095, 100, 4200, -50])
    geoms = encode_point_geometries(xs, ys)
    layer = encode_layer(
        "pts",
        [{"geom": g, "type": 1, "id": i + 1, "attrs": {"name": f"p{i}", "v": i * 1.5}}
         for i, g in enumerate(geoms)],
    )
    tile = encode_tile([layer], compress=True)
    out = decode_tile(tile)
    assert len(out) == 1
    lay = out[0]
    assert lay["name"] == "pts" and lay["extent"] == 4096 and lay["version"] == 2
    assert len(lay["features"]) == 5
    for i, f in enumerate(lay["features"]):
        assert f["id"] == i + 1
        assert f["type"] == 1
        assert f["geometry"][0][1][0] == (xs[i], ys[i])
        assert f["tags"]["name"] == f"p{i}"
        assert f["tags"]["v"] == i * 1.5


def test_line_and_polygon_roundtrip():
    line = encode_linestring([np.array([[0, 0], [10, 5], [20, 5]])])
    poly = encode_polygon([np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])])
    layer = encode_layer(
        "geo",
        [{"geom": line, "type": 2}, {"geom": poly, "type": 3}],
    )
    out = decode_tile(encode_tile([layer], compress=False))
    feats = out[0]["features"]
    assert feats[0]["geometry"][0] == (1, [(0, 0)])
    assert feats[0]["geometry"][1] == (2, [(10, 5), (20, 5)])
    ring = feats[1]["geometry"]
    assert ring[0][1][0] == (0, 0)
    assert ring[-1][0] == 7  # closepath


def test_vectorized_feature_block_matches_decoder():
    rs = np.random.RandomState(4)
    xs = rs.randint(-100, 4200, 500)
    ys = rs.randint(-100, 4200, 500)
    buf, lens = encode_point_features(xs, ys)
    tile = layer_wrap(buf.tobytes(), "points")
    out = decode_tile(tile)
    feats = out[0]["features"]
    assert len(feats) == 500
    for i in (0, 1, 99, 499):
        assert feats[i]["geometry"][0][1][0] == (xs[i], ys[i])
