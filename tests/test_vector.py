"""Line/polygon tiling pipeline tests."""

import numpy as np

from tippecanoe_ray.pipelines.vector import build_vector_tiles, synth_lines_polys
from tippecanoe_ray.stages.mvt import decode_tile


def test_vector_tiles_roundtrip(ray_session):
    ds = synth_lines_polys(12, 6)
    tiles = build_vector_tiles(ds, z=3, detail=10).take_all()
    assert len(tiles) > 0
    extent = 1 << 10
    buf = extent * 5 // 256
    seen_types = set()
    for r in tiles:
        layers = decode_tile(bytes(r["tile"]))
        assert layers[0]["extent"] == extent
        for f in layers[0]["features"]:
            seen_types.add(f["type"])
            for cmd, pts in f["geometry"]:
                for x, y in pts:
                    assert -buf - 1 <= x <= extent + buf + 1
                    assert -buf - 1 <= y <= extent + buf + 1
    assert {2, 3} <= seen_types  # both lines and polygons made it


def test_simplification_reduces_points(ray_session):
    ds = synth_lines_polys(10, 0)

    def count_pts(tiles):
        n = 0
        for r in tiles:
            for lay in decode_tile(bytes(r["tile"])):
                for f in lay["features"]:
                    n += sum(len(p) for _, p in f["geometry"])
        return n

    fine = build_vector_tiles(ds, z=3, detail=10, simplification=0.1).take_all()
    coarse = build_vector_tiles(ds, z=3, detail=10, simplification=30.0).take_all()
    assert count_pts(coarse) < count_pts(fine)


def test_polygon_winding_in_tiles(ray_session):
    from tippecanoe_ray.functions.geometry import shoelace_area

    ds = synth_lines_polys(0, 8)
    tiles = build_vector_tiles(ds, z=2, detail=10).take_all()
    outer = 0
    for r in tiles:
        for lay in decode_tile(bytes(r["tile"])):
            for f in lay["features"]:
                if f["type"] != 3:
                    continue
                ring = []
                for cmd, pts in f["geometry"]:
                    if cmd == 1 and ring:
                        break
                    ring.extend(pts)
                if len(ring) >= 3:
                    a = shoelace_area(np.array(ring + [ring[0]], dtype=float))
                    if a > 0:
                        outer += 1
    assert outer > 0  # exterior rings carry positive winding
