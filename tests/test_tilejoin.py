"""tile-join / merge / overzoom / decode / enumerate tests."""

import numpy as np
import pyarrow as pa
import pytest

from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
from tippecanoe_ray.pipelines.tilejoin import (
    decode_tileset,
    enumerate_tiles,
    join_csv,
    merge_tilesets,
    overzoom_tiles,
)
from tippecanoe_ray.sources.image_table import synthesize_image_table
from tippecanoe_ray.stages.mvt import decode_tile


@pytest.fixture(scope="module")
def small_tiles(ray_session):
    ds = synthesize_image_table(400, with_payload=False)
    cfg = PyramidConfig(maxzoom=3, droprate=1.0, emit_ids=True, bucket_zoom=0)
    return build_pyramid(ds, cfg, n_rows=400)


def test_enumerate_and_decode(small_tiles):
    enum = enumerate_tiles(small_tiles)
    assert (enum["z"] <= 3).all() and len(enum) > 4
    dec = decode_tileset(small_tiles).to_pandas()
    # keep-all: every zoom holds every feature once (plus boundary dups)
    z3 = dec[dec["z"] == 3]
    assert len(z3) >= 400
    assert (dec["lon"].abs() <= 180.0).all()


def test_join_csv_and_semi(ray_session, small_tiles):
    # CSV keyed by feature id (seq): attach a category to even ids
    ids = list(range(0, 400, 2))
    csv = pa.table({"fid": ids, "cat": [f"c{i % 3}" for i in ids]})
    joined = join_csv(small_tiles, csv, key="id").take_all()
    lay = decode_tile(bytes(next(r["tile"] for r in joined if r["z"] == 0)))
    feats = lay[0]["features"]
    assert len(feats) == 400
    tagged = [f for f in feats if "cat" in f["tags"]]
    assert len(tagged) == 200
    # semi-join (-i): only matched features survive
    semi = join_csv(small_tiles, csv, key="id", semi=True).take_all()
    lay = decode_tile(bytes(next(r["tile"] for r in semi if r["z"] == 0)))
    assert len(lay[0]["features"]) == 200
    for r in semi:
        assert r["n_features"] > 0


def test_merge_tilesets(ray_session):
    a = build_pyramid(synthesize_image_table(100, with_payload=False),
                      PyramidConfig(maxzoom=2, droprate=1.0, bucket_zoom=0), n_rows=100)
    import pyarrow.compute as pc
    import ray.data

    def shift_ids(t: pa.Table) -> pa.Table:
        return t

    b = build_pyramid(synthesize_image_table(150, with_payload=False),
                      PyramidConfig(maxzoom=2, droprate=1.0, bucket_zoom=0,
                                    layer_name="points2"), n_rows=150)
    merged = merge_tilesets(a, b)
    rows = merged.take_all()
    z0 = next(r for r in rows if r["z"] == 0)
    assert z0["n_features"] == 250
    layers = decode_tile(bytes(z0["tile"]))
    names = {l["name"] for l in layers}
    assert names == {"points", "points2"}


def test_overzoom_matches_direct(ray_session):
    """Overzooming z2 keep-all tiles reproduces the directly-built z3
    feature counts (modulo quantization-edge duplicates)."""
    ds = synthesize_image_table(300, with_payload=False)
    cfg = PyramidConfig(maxzoom=3, droprate=1.0, bucket_zoom=0)
    tiles = build_pyramid(ds, cfg, n_rows=300)
    import pandas as pd

    direct = {
        (r["z"], r["x"], r["y"]): r["n_features"]
        for r in tiles.take_all()
        if r["z"] == 3
    }
    parents = tiles.filter(expr="z == 2")
    over = {
        (r["z"], r["x"], r["y"]): r["n_features"]
        for r in overzoom_tiles(parents).take_all()
    }
    assert set(direct) == set(over)
    same = sum(direct[k] == over[k] for k in direct)
    assert same >= 0.95 * len(direct), f"{same}/{len(direct)}"


def test_layer_ops(ray_session):
    """-l / -L / -R layer keep/remove/rename (tile-join.cpp:121-131)."""
    import ray.data

    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
    from tippecanoe_ray.pipelines.tilejoin import layer_ops, merge_tilesets
    from tippecanoe_ray.sources.image_table import synthesize_image_table
    from tippecanoe_ray.stages.mvt import decode_tile

    ds = synthesize_image_table(300, with_payload=False)
    a = build_pyramid(ds, PyramidConfig(maxzoom=3, layer_name="alpha"), n_rows=300)
    b = build_pyramid(ds, PyramidConfig(maxzoom=3, layer_name="beta"), n_rows=300)
    merged = merge_tilesets(a, b)

    def names_of(t):
        return sorted({l["name"] for r in t.take_all() for l in decode_tile(bytes(r["tile"]))})

    assert names_of(merged) == ["alpha", "beta"]
    assert names_of(layer_ops(merged, keep={"alpha"})) == ["alpha"]
    assert names_of(layer_ops(merged, remove={"alpha"})) == ["beta"]
    assert names_of(layer_ops(merged, rename={"alpha": "gamma"})) == ["beta", "gamma"]
    # all layers removed -> tiles dropped entirely
    assert layer_ops(merged, remove={"alpha", "beta"}).count() == 0


def test_postfilter_hook(ray_session):
    """-c postfilter equivalent: per-tile feature callable
    (plugin.cpp:78-375 re-expressed as a distributed hook)."""
    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
    from tippecanoe_ray.pipelines.tilejoin import postfilter_tiles
    from tippecanoe_ray.sources.image_table import synthesize_image_table

    ds = synthesize_image_table(400, with_payload=False)
    tiles = build_pyramid(
        ds, PyramidConfig(maxzoom=3, droprate=1.0, emit_ids=True), n_rows=400
    )

    def keep_even(z, x, y, feats):
        return [f for f in feats if f.get("id") is not None and f["id"] % 2 == 0]

    filtered = postfilter_tiles(tiles, keep_even)
    tot_before = sum(r["n_features"] for r in tiles.select_columns(["n_features"]).take_all())
    tot_after = sum(r["n_features"] for r in filtered.select_columns(["n_features"]).take_all())
    assert 0 < tot_after < tot_before
    from tippecanoe_ray.stages.mvt import decode_tile

    for r in filtered.take_all():
        for lay in decode_tile(bytes(r["tile"])):
            for f in lay["features"]:
                assert f["id"] % 2 == 0


def test_cluster_distance_maxzoom():
    """main.cpp:2376-2388: maxzoom raised until avg gap > cluster
    mingap."""
    import math

    from tippecanoe_ray.stages.stats import cluster_distance_maxzoom

    # avg spacing = exp(mean); choose mean so avg sits between the
    # mingaps of z6 and z9 for distance 50
    stats = {"count": 100, "mean": math.log(((1 << (32 - 8)) // 256 * 50) ** 2 * 0.5), "m2": 0}
    mz = cluster_distance_maxzoom(stats, 6, 50)
    assert mz == 9  # first zoom where avg > mingap
    assert cluster_distance_maxzoom(stats, 6, 0) == 6


def test_overzoom_vector_vs_reference_tool(ray_session, tmp_path):
    """Lines/polygons through overzoom: the reference's own
    tippecanoe-overzoom consumes OUR tile bytes; child feature counts
    must match our overzoom of the same tile (buffer 5, tool default)."""
    import os
    import subprocess

    import pytest as _pytest

    tool = "/tmp/refbuild/tippecanoe-overzoom"
    if not os.path.exists(tool):
        _pytest.skip("tippecanoe-overzoom not built")
    import ray.data

    from tests.util_reference import synth_vector_corpus
    from tests.util_reference import geoms_to_table
    from tippecanoe_ray.pipelines.tilejoin import overzoom_tiles
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.stages.mvt import decode_tile

    feats = synth_vector_corpus(n_lines=20, n_polys=10, seed=9)
    cfg = VectorConfig(maxzoom=2, layer_name="in")
    tiles = build_vector_pyramid(ingest_features(geoms_to_table(feats), cfg), cfg)
    parents = [r for r in tiles.take_all() if r["z"] == 2]
    assert parents
    ours_children = {}
    oz = overzoom_tiles(ray.data.from_items(
        [{"z": int(r["z"]), "x": int(r["x"]), "y": int(r["y"]), "tile": bytes(r["tile"])} for r in parents]
    ), buffer=5)
    for r in oz.take_all():
        key = (int(r["z"]), int(r["x"]), int(r["y"]))
        ours_children[key] = ours_children.get(key, 0) + int(r["n_features"])
    ref_children = {}
    for r in parents:
        z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
        pin = str(tmp_path / f"in_{x}_{y}.pbf")
        open(pin, "wb").write(bytes(r["tile"]))
        for dx in (0, 1):
            for dy in (0, 1):
                pout = str(tmp_path / f"out_{x}_{y}_{dx}{dy}.pbf")
                res = subprocess.run(
                    [tool, "-o", pout, pin, f"{z}/{x}/{y}",
                     f"{z+1}/{2*x+dx}/{2*y+dy}"],
                    capture_output=True,
                )
                if res.returncode != 0 or not os.path.exists(pout):
                    continue
                data = open(pout, "rb").read()
                if not data:
                    continue
                n = sum(len(l["features"]) for l in decode_tile(data))
                if n:
                    key = (z + 1, 2 * x + dx, 2 * y + dy)
                    ref_children[key] = ref_children.get(key, 0) + n
    bad = [
        f"{k}: ours={ours_children.get(k)} ref={ref_children.get(k)}"
        for k in sorted(set(ours_children) | set(ref_children))
        if ours_children.get(k) != ref_children.get(k)
    ]
    assert not bad, bad[:10]


def test_demultiply_reverses_multiplier(ray_session):
    """The reference's metamorphic invariant (Makefile:421-428):
    overzooming with -m exactly reverses tiling with
    --retain-points-multiplier — same-tile demultiply of the
    multiplier tileset equals the plain tileset, at every zoom."""
    import ray.data

    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
    from tippecanoe_ray.pipelines.tilejoin import overzoom_tiles
    from tippecanoe_ray.sources.image_table import synthesize_image_table

    n = 1000
    ds = synthesize_image_table(n, with_payload=False)
    base = dict(maxzoom=5, droprate=2.5, hotspot_frac=0.5, n_hotspots=1,
                bucket_zoom=0)
    mult = build_pyramid(
        ds, PyramidConfig(**base, retain_points_multiplier=3, multiplier_tags=True),
        n_rows=n,
    ).materialize()
    plain = build_pyramid(ds, PyramidConfig(**base), n_rows=n)
    want = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in plain.take_all()
    }
    demult = overzoom_tiles(mult, demultiply=True, same_tile=True)
    got = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in demult.take_all()
    }
    bad = [
        f"{k}: demult={got.get(k)} plain={want.get(k)}"
        for k in sorted(set(got) | set(want))
        if got.get(k) != want.get(k)
    ]
    assert not bad, bad[:10]
