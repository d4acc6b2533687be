"""--accumulate-attribute + -K cluster stats wired into the drop paths:
exact-match of per-tile decoded attribute multisets vs the reference."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import has_reference
from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
from tippecanoe_ray.sources.image_table import synthesize_image_table
from tippecanoe_ray.stages.geotag import fnv_world
from tippecanoe_ray.stages.strategies import StrategyConfig


def _with_vals(n):
    ds = synthesize_image_table(n, with_payload=False)

    def add_val(t: pa.Table) -> pa.Table:
        return t.append_column("val", t["seq"].cast(pa.float64()))

    return ds.map_batches(add_val, batch_format="pyarrow")


def _diff(ours, ref, limit=8):
    msgs = []
    for k in sorted(set(ours) | set(ref)):
        if ours.get(k) != ref.get(k):
            msgs.append(f"{k}: ours={ours.get(k)} ref={ref.get(k)}")
            if len(msgs) >= limit:
                break
    return msgs


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_accumulate_rate_ladder(ray_session, op):
    """Rate-ladder drops fold the attribute onto the survivor
    (tile.cpp:1970-1977 + attribute.cpp:92-180)."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 800
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    vals = np.arange(n)
    ref = run_reference_attrs(wx, wy, vals, maxzoom=5, droprate=2.5,
                              extra_flags=[f"--accumulate-attribute=val:{op}"])
    ds = _with_vals(n)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        attr_accum=("val", op), bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(tiles, ("val",))
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_accumulate_with_bucket_zoom(ray_session):
    """Folds hold when the bucket exchange + lowzoom side channel are in
    play (full-stream survivor blob)."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 800
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    vals = np.arange(n)
    ref = run_reference_attrs(wx, wy, vals, maxzoom=5, droprate=2.5,
                              extra_flags=["--accumulate-attribute=val:sum"])
    ds = _with_vals(n)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        attr_accum=("val", "sum"), bucket_zoom=2)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(tiles, ("val",))
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_cluster_stats_attrs(ray_session):
    """-K cluster stats: clustered/point_count/sqrt_point_count/
    point_count_abbreviated (tile.cpp:2420-2451)."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 800
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    vals = np.arange(n)
    ref = run_reference_attrs(
        wx, wy, vals, maxzoom=5, droprate=2.5, extra_flags=["-K50"],
        attrs=("point_count", "sqrt_point_count", "point_count_abbreviated"),
    )
    ds = _with_vals(n)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        strategies=StrategyConfig(cluster_distance=50),
                        cluster_stats=True, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(
        tiles, ("point_count", "sqrt_point_count", "point_count_abbreviated")
    )
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("desc", [False, True])
def test_drop_by_attribute_as_needed(ray_session, desc):
    """--drop-by-attribute-as-needed: as-needed ladder on a numeric
    attribute (tile.cpp:2110-2144, choose_minattribute 822-857)."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    vals = (np.arange(n) * 37) % 1009  # spread values
    flags = ["--drop-by-attribute-as-needed=val", "-O200"]
    if desc:
        flags.append("--drop-by-attribute-order=desc")
    ref = run_reference_attrs(wx, wy, vals, maxzoom=6, droprate=1, extra_flags=flags)
    ds = synthesize_image_table(n, with_payload=False)

    import pyarrow.compute as pc

    def add_val(t):
        v = pc.multiply(t["seq"], 37)
        v = pc.cast(pc.subtract(v, pc.multiply(pc.divide(v, 1009), 1009)), pa.float64())
        return t.append_column("val", v)

    ds = ds.map_batches(add_val, batch_format="pyarrow")
    scfg = StrategyConfig(drop_by_attribute=True, drop_by_attribute_descending=desc,
                          max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, attr_col="val", bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = {k: v["n"] for k, v in tile_attrs_from_ds(tiles, ()).items()}
    refn = {k: v["n"] for k, v in ref.items()}
    d = _diff(ours, refn)
    assert not d, d
    assert max(ours.values()) <= 200


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("desc", [False, True])
def test_order_by_attribute(ray_session, desc):
    """--order-by / --order-descending-by: per-tile stable sort of the
    output features by the attribute (tile.cpp:2583-2593) — compared
    ORDER-SENSITIVELY on the decoded value sequences."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 800
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    vals = (np.arange(n) * 37) % 1009
    flag = "--order-descending-by=val" if desc else "--order-by=val"
    ref = run_reference_attrs(wx, wy, vals, maxzoom=5, droprate=2.5,
                              extra_flags=[flag], keep_order=True)
    ds = synthesize_image_table(n, with_payload=False)

    import pyarrow.compute as pc

    def add_val(t):
        v = pc.multiply(t["seq"], 37)
        v = pc.cast(pc.subtract(v, pc.multiply(pc.divide(v, 1009), 1009)), pa.float64())
        return t.append_column("val", v)

    ds = ds.map_batches(add_val, batch_format="pyarrow")
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        attr_col="val", order_by_attr=True, order_descending=desc,
                        emit_attr=True, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(tiles, ("val",), keep_order=True)
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_preserve_input_order(ray_session):
    """-pi: output features restored to input sequence order."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 800
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    vals = np.arange(n)
    ref = run_reference_attrs(wx, wy, vals, maxzoom=5, droprate=2.5,
                              extra_flags=["-pi"], keep_order=True)
    ds = _with_vals(n)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        attr_col="val", preserve_input_order=True, emit_attr=True,
                        bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(tiles, ("val",), keep_order=True)
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_drop_denser(ray_session):
    """--drop-denser=N: global gap-ranked minzoom for N% of features
    (main.cpp:2692-2727)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n = 1000
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    ref = run_reference(wx, wy, maxzoom=6, droprate=2.5,
                        extra_flags=["--drop-denser=40"])
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=6, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        drop_denser=40, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_coalesce_points(ray_session):
    """-ac: consecutive identical-attribute point features merge into
    multipoints (tile.cpp:2524-2546); with no attributes a whole tile
    coalesces to one feature."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n = 600
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    ref = run_reference(wx, wy, maxzoom=5, droprate=2.5, extra_flags=["-ac"])
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        coalesce=True, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_increase_gamma_as_needed(ray_session):
    """--increase-gamma-as-needed: gamma x1.25 retry ladder
    (tile.cpp:2737-2753) with zoom-global gamma consensus."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    ref = run_reference(wx, wy, maxzoom=6, droprate=1,
                        extra_flags=["--increase-gamma-as-needed", "-O600"])
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(increase_gamma=True, max_tile_features=600)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_feature_density(ray_session):
    """-ag: tippecanoe_feature_density 0-255 from the gamma-1 spacing
    scan (tile.cpp:2147-2157, 2656-2675)."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 800
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    ref = run_reference_attrs(wx, wy, np.arange(n), maxzoom=5, droprate=2.5,
                              extra_flags=["-ag"],
                              attrs=("tippecanoe_feature_density",))
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(maxzoom=5, droprate=2.5, hotspot_frac=0.6, n_hotspots=1,
                        calculate_density=True, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(tiles, ("tippecanoe_feature_density",))
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_cluster_densest_as_needed(ray_session):
    """--cluster-densest-as-needed: merged features average into the
    survivor with per-step long-long truncation (tile.cpp:2030-2050);
    point_count stats emitted."""
    from tests.util_reference import run_reference_attrs, tile_attrs_from_ds

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    ref = run_reference_attrs(wx, wy, np.arange(n), maxzoom=6, droprate=1,
                              extra_flags=["--cluster-densest-as-needed", "-O200"],
                              attrs=("point_count",))
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(drop_densest=True, as_needed_mode="cluster",
                          max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, cluster_stats=True, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = tile_attrs_from_ds(tiles, ("point_count",))
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_coalesce_densest_as_needed(ray_session):
    """--coalesce-densest-as-needed: folded features append their
    geometry onto the survivor (coalesce_geometry, tile.cpp:1613-1631)
    — feature counts drop but every point survives as a multipoint
    member."""
    import sqlite3
    import subprocess
    import tempfile
    import os

    from tests.util_reference import TIPPECANOE, write_geojson
    from tippecanoe_ray.stages.mvt import decode_tile

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        write_geojson(gj, wx, wy)
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z6", "-Z0", "-b0", "--no-tile-size-limit",
             "-q", "-r1", "--coalesce-densest-as-needed", "-O200", gj],
            check=True, capture_output=True,
        )
        ref = {}
        con = sqlite3.connect(mb)
        for z, x, r, d in con.execute(
            "select zoom_level, tile_column, tile_row, tile_data from tiles"
        ):
            y = (1 << z) - 1 - r
            nf = npts = 0
            for l in decode_tile(bytes(d)):
                for f in l["features"]:
                    nf += 1
                    for c, p in f["geometry"]:
                        npts += len(p)
            ref[(z, x, y)] = (nf, npts)
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(drop_densest=True, as_needed_mode="coalesce",
                          max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = {}
    for rr in tiles.take_all():
        nf = npts = 0
        for l in decode_tile(bytes(rr["tile"])):
            for f in l["features"]:
                nf += 1
                for c, p in f["geometry"]:
                    npts += len(p)
        ours[(int(rr["z"]), int(rr["x"]), int(rr["y"]))] = (nf, npts)
    d = _diff(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_dynamic_drop(ray_session):
    """-pd: drop-fraction gate with per-tile-only thresholds
    (tile.cpp:2841, non-propagation 3020-3023)."""
    from tests.util_reference import diff_counts, run_reference, tile_counts_from_ds

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    ref = run_reference(wx, wy, maxzoom=6, droprate=1, extra_flags=["-pd", "-O200"])
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(dynamic_drop=True, max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    d = diff_counts(tile_counts_from_ds(tiles), ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("ladder,flag", [
    ("drop_smallest", "--coalesce-smallest-as-needed"),
    ("drop_fraction", "--coalesce-fraction-as-needed"),
])
def test_coalesce_other_ladders(ray_session, ladder, flag):
    """as_needed_mode=coalesce generalizes across ladders
    (tile.cpp:2065-2107): counts and vertex totals exact."""
    import os
    import sqlite3
    import subprocess
    import tempfile

    from tests.util_reference import TIPPECANOE, write_geojson
    from tippecanoe_ray.stages.mvt import decode_tile

    n = 1200
    ids = [f"img-{i:012d}" for i in range(n)]
    wx, wy = fnv_world(ids, hotspot_frac=0.6, n_hotspots=1)
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        write_geojson(gj, wx, wy)
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z6", "-Z0", "-b0", "--no-tile-size-limit",
             "-q", "-r1", flag, "-O200", gj],
            check=True, capture_output=True,
        )
        ref = {}
        con = sqlite3.connect(mb)
        for z, x, r, d in con.execute(
            "select zoom_level, tile_column, tile_row, tile_data from tiles"
        ):
            y = (1 << z) - 1 - r
            nf = npts = 0
            for l in decode_tile(bytes(d)):
                for f in l["features"]:
                    nf += 1
                    for c, p in f["geometry"]:
                        npts += len(p)
            ref[(z, x, y)] = (nf, npts)
    ds = synthesize_image_table(n, with_payload=False)
    scfg = StrategyConfig(**{ladder: True}, as_needed_mode="coalesce",
                          max_tile_features=200)
    cfg = PyramidConfig(maxzoom=6, droprate=1.0, hotspot_frac=0.6, n_hotspots=1,
                        strategies=scfg, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=n)
    ours = {}
    for rr in tiles.take_all():
        nf = npts = 0
        for l in decode_tile(bytes(rr["tile"])):
            for f in l["features"]:
                nf += 1
                for c, p in f["geometry"]:
                    npts += len(p)
        ours[(int(rr["z"]), int(rr["x"]), int(rr["y"]))] = (nf, npts)
    d = _diff(ours, ref)
    assert not d, d


def test_drop_denser_distributed_matches_oracle(ray_session):
    """attach_drop_denser_minzoom (distributed: sort + per-block rank
    windows + gap-rank shuffle) must equal drop_denser_minzooms (the
    driver-side oracle) row for row."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tippecanoe_ray.pipelines.pyramid import (
        PyramidConfig, attach_drop_denser_minzoom, drop_denser_minzooms,
    )

    rng = np.random.RandomState(7)
    n = 5000
    ix = rng.randint(0, 1 << 62, n).astype(np.uint64)
    tbl = pa.table({
        "bucket": pa.array(np.zeros(n, np.int64)),
        "index": pa.array(ix),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "wx": pa.array(rng.randint(0, 1 << 32, n).astype(np.int64)),
        "wy": pa.array(rng.randint(0, 1 << 32, n).astype(np.int64)),
    })
    for pct in (0, 7, 40, 100):
        cfg = PyramidConfig(maxzoom=6, droprate=2.5, drop_denser=pct,
                            bucket_zoom=0)
        narrow = ray.data.from_arrow(tbl).repartition(9)
        oracle = drop_denser_minzooms(narrow, cfg)
        got_ds = attach_drop_denser_minzoom(narrow, cfg)
        got_tbl = pa.concat_tables([
            t for t in ray.get(got_ds.to_arrow_refs()) if t.num_rows
        ])
        o = np.lexsort((
            got_tbl["seq"].to_numpy(zero_copy_only=False),
            got_tbl["index"].to_numpy(zero_copy_only=False).astype(np.uint64),
        ))
        got = got_tbl["ddmz"].to_numpy(zero_copy_only=False)[o] \
            if "ddmz" in got_tbl.column_names else np.zeros(n, np.int16)
        if pct == 0:
            assert "ddmz" not in got_tbl.column_names or (got == oracle).all()
        else:
            assert (got == oracle).all(), (pct, np.flatnonzero(got != oracle)[:5])
