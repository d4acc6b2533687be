"""Per-tile strategy exact-match tests vs the reference binary."""

import numpy as np
import pytest

from tests.conftest import has_reference
from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
from tippecanoe_ray.sources.image_table import synthesize_image_table
from tippecanoe_ray.stages.geotag import fnv_world
from tippecanoe_ray.stages.strategies import (
    StrategyConfig,
    accumulate_fold,
    choose_mingap,
    compute_gaps,
    drop_sequence,
)


@pytest.fixture(scope="module")
def hotspot_input():
    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    return n, wx, wy


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize(
    "flags,scfg",
    [
        (["-g2"], StrategyConfig(gamma=2.0)),
        (["-K50"], StrategyConfig(cluster_distance=50)),
    ],
)
def test_gamma_cluster_exact(ray_session, hotspot_input, flags, scfg):
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5, extra_flags=flags)
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_drop_densest_near_exact(ray_session, hotspot_input):
    """Zoom-global threshold retry + z0-scan gap formula
    (decode(previndex) -> snapped geometry): exact."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=1,
                        extra_flags=["--drop-densest-as-needed", "-O200"])
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(drop_densest=True, max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


def test_limit_tile_feature_count(ray_session):
    n = 2000
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(limit_tile_feature_count=5)
    cfg = PyramidConfig(maxzoom=4, droprate=1.0, strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    counts = [r["n_features"] for r in tiles.select_columns(["n_features"]).take_all()]
    assert max(counts) <= 5


def test_kernels():
    g = compute_gaps(np.array([10, 10, 50], dtype=np.uint64))
    assert g[1] == 0  # duplicate index
    assert choose_mingap(np.array([1, 5, 9, 14]), 0.5, 0) in (5, 9)
    s = drop_sequence(np.array([0, 5]), np.array([123, 123], dtype=np.uint64))
    assert s[0] != s[1]  # minzoom in the top bits
    assert accumulate_fold([1, 2, 3], "sum") == 6
    assert accumulate_fold([2, 3], "product") == 6
    assert accumulate_fold([1, 2], "mean") == 1.5
    assert accumulate_fold(["a", "b"], "comma") == "a,b"
    assert accumulate_fold([5, 1], "count") == 2


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("mult", [2, 3])
def test_retain_points_multiplier_exact(ray_session, hotspot_input, mult):
    """--retain-points-multiplier N: cluster secondaries retained via
    the fractional minzoom + extra-zooms rule (tile.cpp:1123-1319)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5,
                        extra_flags=[f"--retain-points-multiplier={mult}"])
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        retain_points_multiplier=mult, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_drop_fraction_exact(ray_session, hotspot_input):
    """--drop-fraction-as-needed: deterministic drop_sequence ladder with
    the ×0.95 fraction factor and first-candidate protection — exact."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=1,
                        extra_flags=["--drop-fraction-as-needed", "-O200"])
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(drop_fraction=True, max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_drop_densest_lowzoom_bucket(ray_session, hotspot_input):
    """Strategies must also run for z < bucket_zoom (the biggest tiles):
    with bucket_zoom=2 the z0/z1 tiles go through lowzoom_tiles, which
    previously skipped every strategy (ADVICE r1 high)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=1,
                        extra_flags=["--drop-densest-as-needed", "-O200"])
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(drop_densest=True, max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=2)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_counts_from_ds(tiles)
    # the limit binds everywhere, including z0/z1
    assert max(ours.values()) <= 200
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize(
    "flags,scfg",
    [
        (["-g2"], StrategyConfig(gamma=2.0)),
        (["-K50"], StrategyConfig(cluster_distance=50)),
    ],
)
def test_gamma_cluster_lowzoom_bucket(ray_session, hotspot_input, flags, scfg):
    """gamma/cluster exact-match with bucket_zoom=2 (z0/z1 through the
    lowzoom pass with carried gaps)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5, extra_flags=flags)
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=2)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_retain_multiplier_lowzoom_bucket(ray_session, hotspot_input):
    """multiplier secondaries whose integer minzoom is in
    [bucket_zoom, bucket_zoom + log(N)/log(r)) must still reach the
    lowzoom pass (ADVICE r1 medium)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5,
                        extra_flags=["--retain-points-multiplier=3"])
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        retain_points_multiplier=3, bucket_zoom=2)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_drop_smallest_near_exact(ray_session, hotspot_input):
    """--drop-smallest-as-needed: int64-truncated point pseudo-extents
    and the ×0.75 retry factor (tile.cpp:2779)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n, wx, wy = hotspot_input
    ref = run_reference(wx, wy, maxzoom=6, droprate=1,
                        extra_flags=["--drop-smallest-as-needed", "-O200"])
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(drop_smallest=True, max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_cluster_chain_exact(ray_session):
    """-K with CHAINED merge candidates (each within cluster_mingap of
    its scan predecessor but not of the cluster lead): merge_previndex
    is only updated for KEPT features (tile.cpp:2311 is skipped by the
    cluster branch's continue at :2017), so chains re-seed new clusters
    — the r2 per-feature-update scan undercounted these tiles."""
    import pyarrow as pa
    import ray

    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds
    from tippecanoe_ray.pipelines.pyramid import (
        PyramidConfig,
        build_pyramid_from_narrow,
        point_index,
    )

    rs = np.random.RandomState(42)
    n = 3000
    lo = 1 << 31
    wx = lo + rs.randint(0, 1 << 26, n).astype(np.int64)
    wy = lo + rs.randint(0, 1 << 26, n).astype(np.int64)
    ref = run_reference(wx, wy, maxzoom=5, droprate=1, extra_flags=["-K40"])
    narrow = ray.data.from_arrow(pa.table({
        "wx": wx, "wy": wy,
        "index": pa.array(point_index(wx, wy), pa.uint64()),
        "seq": np.arange(n, dtype=np.int64),
    }))
    cfg = PyramidConfig(maxzoom=5, droprate=1.0,
                        strategies=StrategyConfig(cluster_distance=40),
                        bucket_zoom=0)
    tiles = build_pyramid_from_narrow(narrow, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d
