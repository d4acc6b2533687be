"""End-to-end pyramid tests: exact-match vs the reference binary
(FIXTURES.md §4 corpora) and engine invariants."""

import numpy as np
import pytest

from tests.conftest import has_reference
from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
from tippecanoe_ray.sources.image_table import synthesize_image_table
from tippecanoe_ray.stages.geotag import fnv_world


def _build(ds, cfg, n):
    return build_pyramid(ds, cfg, n_rows=n)


@pytest.fixture(scope="module")
def uniform_ids():
    n = 1500
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids)
    return n, ids, wx, wy


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("basezoom", [4, 8])
def test_exact_match_basezoom(ray_session, uniform_ids, basezoom):
    """Explicit -B basezoom (above and below maxzoom)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, ids, wx, wy = uniform_ids
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5, extra_flags=[f"-B{basezoom}"])
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, basezoom=basezoom)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("droprate,maxzoom", [(1, 6), (2.5, 7), (2.5, 12)])
def test_exact_match_uniform(ray_session, uniform_ids, droprate, maxzoom):
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, ids, wx, wy = uniform_ids
    ref = run_reference(wx, wy, maxzoom=maxzoom, droprate=droprate)
    ds = synthesize_image_table(n, with_payload=False)
    tiles = _build(ds, PyramidConfig(maxzoom=maxzoom, droprate=float(droprate)), n)
    ours = tile_counts_from_ds(tiles)
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_exact_match_hotspot(ray_session):
    """50% of rows in city hotspots — skew path (FIXTURES.md §4.2)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n = 1500
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.5, n_hotspots=2)
    ref = run_reference(wx, wy, maxzoom=7, droprate=2.5)
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=7, droprate=2.5, hotspot_frac=0.5, n_hotspots=2)
    # wire the same hotspot config through the geotag stage
    from tippecanoe_ray.stages.geotag import Geotag

    tiles = _build(ds, cfg, n)
    ours = tile_counts_from_ds(tiles)
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_exact_match_coincident(ray_session):
    """500 features at one snapped location (reference radix
    'onelocation' analogue, Makefile:198-210): duplicate-index
    determinism + tie-breaking by seq."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds
    import pyarrow as pa
    import ray

    n = 500
    wx = np.full(n, 1_234_567_936, dtype=np.int64)  # multiple of 2^10
    wy = np.full(n, 2_345_678_848, dtype=np.int64)
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5)
    t = pa.table(
        {
            "image_id": [f"img-{i:012d}" for i in range(n)],
            "seq": np.arange(n),
            "wx": wx,
            "wy": wy,
        }
    )
    ds = ray.data.from_arrow(t)
    # bypass geotag: positions given directly
    from tippecanoe_ray.pipelines.pyramid import (
        add_bucket,
        bucket_offsets,
    )
    from tippecanoe_ray.functions.spatial import encode_quadkey

    def add_index(tb: pa.Table) -> pa.Table:
        ix = tb["wx"].to_numpy() & ~np.int64(1)
        iy = tb["wy"].to_numpy() & ~np.int64(1)
        return tb.append_column("index", pa.array(encode_quadkey(ix, iy), pa.uint64()))

    cfg = PyramidConfig(maxzoom=6, droprate=2.5, rule="precomputed")
    narrow = ds.map_batches(add_index, batch_format="pyarrow").select_columns(
        ["wx", "wy", "index", "seq"]
    )
    from tippecanoe_ray.pipelines.pyramid import build_pyramid_from_narrow

    tiles = build_pyramid_from_narrow(narrow, cfg, n_rows=n)
    ours = tile_counts_from_ds(tiles)
    d = diff_counts(ours, ref)
    assert not d, d


def test_parallelism_invariance(ray_session, uniform_ids):
    """Same output regardless of block structure / bucket zoom
    (mirror of the reference parallel-test, Makefile:220-245)."""
    from tests.util_reference import tile_counts_from_ds

    n, ids, wx, wy = uniform_ids
    results = []
    for blocks, bz in [(2, 2), (16, 4)]:
        ds = synthesize_image_table(n, with_payload=False, override_num_blocks=blocks)
        cfg = PyramidConfig(maxzoom=6, droprate=2.5, bucket_zoom=bz)
        results.append(tile_counts_from_ds(_build(ds, cfg, n)))
    assert results[0] == results[1]


def test_resume_skips_done_buckets(ray_session, uniform_ids, tmp_path):
    n, ids, wx, wy = uniform_ids
    out = str(tmp_path / "tiles")
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, bucket_zoom=2)
    t1 = _build_write(ds, cfg, n, out)
    first = sorted(
        (r["z"], r["x"], r["y"], r["n_features"])
        for r in t1.select_columns(["z", "x", "y", "n_features"]).take_all()
    )
    # resume over a complete run: nothing recomputed, output readable
    t2 = build_pyramid(ds, cfg, n_rows=n, out_dir=out, resume=True)
    second = sorted(
        (r["z"], r["x"], r["y"], r["n_features"])
        for r in t2.select_columns(["z", "x", "y", "n_features"]).take_all()
    )
    assert first == second


def _build_write(ds, cfg, n, out):
    return build_pyramid(ds, cfg, n_rows=n, out_dir=out)


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_per_feature_zoom_ranges_exact(ray_session):
    """GeoJSON tippecanoe extension minzoom/maxzoom (geojson.cpp:81-100):
    explicit-minzoom features bypass the ladder and stay out of the
    multiplier count map; the always-keep slot goes to the first PLAIN
    feature (tile.cpp:1293-1302)."""
    import pyarrow as pa
    import ray.data

    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds
    from tippecanoe_ray.functions.spatial import encode_quadkey
    from tippecanoe_ray.pipelines.pyramid import build_pyramid_from_narrow

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.4, n_hotspots=2)
    rs = np.random.RandomState(3)
    fmin = np.where(rs.rand(n) < 0.3, rs.randint(0, 7, n), -1).astype(np.int16)
    fmax = np.where(rs.rand(n) < 0.3, rs.randint(2, 7, n), -1).astype(np.int16)
    both = (fmin >= 0) & (fmax >= 0) & (fmax < fmin)
    fmax[both] = fmin[both]
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5, fmin=fmin, fmax=fmax)
    index = encode_quadkey(wx & ~1, wy & ~1)
    narrow = ray.data.from_arrow(
        pa.table(
            {
                "wx": wx, "wy": wy, "index": pa.array(index, pa.uint64()),
                "seq": np.arange(n), "fmin": fmin, "fmax": fmax,
            }
        )
    )
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, bucket_zoom=0,
                        fmin_col="fmin", fmax_col="fmax")
    tiles = build_pyramid_from_narrow(narrow, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


def test_center_tile(ray_session):
    """Busiest maxzoom tile with the (x<<32)|y tie-break
    (tile.cpp:3214-3229)."""
    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid, center_tile
    from tippecanoe_ray.sources.image_table import synthesize_image_table

    ds = synthesize_image_table(2000, with_payload=False)
    cfg = PyramidConfig(maxzoom=4, droprate=1.0, hotspot_frac=0.5, n_hotspots=1)
    tiles = build_pyramid(ds, cfg, n_rows=2000)
    cx, cy = center_tile(tiles, 4)
    df = tiles.select_columns(["z", "x", "y", "n_features"]).to_pandas()
    df = df[df["z"] == 4]
    best = df["n_features"].max()
    cand = df[df["n_features"] == best]
    want = min((int(r.x) << 32) | int(r.y) for r in cand.itertuples())
    assert ((cx << 32) | cy) == want
