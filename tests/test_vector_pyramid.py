"""Lines/polygons through the real per-zoom pyramid — exact-match
tile keys + per-tile feature counts vs the reference binary."""

import numpy as np
import pytest

from tests.conftest import has_reference


def _build_ours(feats, maxzoom, **cfg_kw):
    from tests.util_reference import geoms_to_table
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )

    cfg = VectorConfig(maxzoom=maxzoom, **cfg_kw)
    tbl = ingest_features(geoms_to_table(feats), cfg)
    tiles = build_vector_pyramid(tbl, cfg)
    out = {}
    for r in tiles.select_columns(["z", "x", "y", "n_features"]).take_all():
        if r["n_features"] == 0:
            continue  # strategy-counter phantom rows
        out[(int(r["z"]), int(r["x"]), int(r["y"]))] = int(r["n_features"])
    return out


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_lines_exact(ray_session):
    from tests.util_reference import diff_counts, run_reference_geoms, synth_vector_corpus

    feats = [f for f in synth_vector_corpus(n_lines=25, n_polys=0) if f[0] == "line"]
    ref = run_reference_geoms(feats, maxzoom=6)
    ours = _build_ours(feats, maxzoom=6)
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_polygons_exact(ray_session):
    from tests.util_reference import diff_counts, run_reference_geoms, synth_vector_corpus

    feats = [f for f in synth_vector_corpus(n_lines=0, n_polys=15) if f[0] == "polygon"]
    ref = run_reference_geoms(feats, maxzoom=6)
    ours = _build_ours(feats, maxzoom=6)
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_mixed_exact(ray_session):
    from tests.util_reference import diff_counts, run_reference_geoms, synth_vector_corpus

    feats = synth_vector_corpus(n_lines=20, n_polys=12)
    ref = run_reference_geoms(feats, maxzoom=5)
    ours = _build_ours(feats, maxzoom=5)
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_hard_corpus_z9_exact(ray_session):
    """Holes, tiny polygons (reduction ladder), long diagonals,
    multilines — deep pyramid."""
    from tests.util_reference import diff_counts, run_reference_geoms, synth_vector_hard

    feats = synth_vector_hard()
    ref = run_reference_geoms(feats, maxzoom=9)
    ours = _build_ours(feats, maxzoom=9)
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_byte_limit_detail_ladder(ray_session):
    """-M byte cap triggers the detail-reduction ladder
    (tile.cpp:2717-3036 no-strategy path): tiles re-encode at
    line_detail-1 … min_detail until they fit."""
    import os, sqlite3, subprocess, tempfile
    from tests.util_reference import (
        read_mbtiles_counts, synth_vector_corpus, write_geojson_geoms,
    )
    from tests.util_reference import TIPPECANOE

    feats = synth_vector_corpus(n_lines=40, n_polys=0, seed=3)
    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "in.json")
        mb = os.path.join(td, "out.mbtiles")
        write_geojson_geoms(gj, feats)
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z5", "-M", "3000", "-q", gj],
            check=True, capture_output=True,
        )
        ref = read_mbtiles_counts(mb)
        # reference tile sizes for the boundary check
        con = sqlite3.connect(mb)
        ref_sizes = {
            (z, x, (1 << z) - 1 - r): len(d)
            for z, x, r, d in con.execute(
                "select zoom_level, tile_column, tile_row, tile_data from tiles"
            )
        }
    from tests.util_reference import geoms_to_table
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )

    cfg = VectorConfig(maxzoom=5, max_tile_size=3000)
    tbl = ingest_features(geoms_to_table(feats), cfg)
    tiles = build_vector_pyramid(tbl, cfg)
    ours = {}
    sizes = {}
    for r in tiles.take_all():
        if r["n_features"] == 0:
            continue  # strategy-counter phantom rows
        key = (int(r["z"]), int(r["x"]), int(r["y"]))
        ours[key] = int(r["n_features"])
        sizes[key] = len(r["tile"])
    from tests.util_reference import diff_counts

    d = diff_counts(ours, ref)
    assert not d, d
    # every tile fits the cap on both sides
    assert max(sizes.values()) <= 3000
    assert max(ref_sizes.values()) <= 3000


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("kind,flag", [("line", "--drop-lines"), ("polygon", "--drop-polygons")])
def test_vector_drop_ladder(ray_session, kind, flag):
    """--drop-lines / --drop-polygons: lines/polygons ride the rate
    ladder (calc_feature_minzoom gates, main.cpp:299-305) with the
    vertex-hash spatial index as the sort key."""
    from tests.util_reference import diff_counts, run_reference_geoms, synth_vector_corpus

    feats = [f for f in synth_vector_corpus(n_lines=40, n_polys=40, seed=5) if f[0] == kind]
    ref = run_reference_geoms(feats, maxzoom=6, extra_flags=[flag, "-r2.5"])
    ours = _build_ours(feats, maxzoom=6, droprate=2.5,
                       drop_lines=(kind == "line"), drop_polygons=(kind == "polygon"))
    d = diff_counts(ours, ref)
    assert not d, d


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_wraparound_repair(ray_session):
    """-aw: a line hopping across the antimeridian gets stitched by
    +-360-degree offsets (scale_geometry, serial.cpp:313-337)."""
    import numpy as np

    from tests.util_reference import diff_counts, run_reference_geoms

    # a line jumping 179 -> -179 -> 178 -> -178 (crosses the dateline)
    lons = [179.0, -179.0, 178.5, -178.5, 179.5]
    lats = [10.0, 11.0, 12.0, 13.0, 14.0]
    from tippecanoe_ray.functions.spatial import lonlat_to_world

    wx, wy = lonlat_to_world(np.array(lons), np.array(lats))
    pts = np.stack([wx, wy], axis=1).astype(np.int64)
    feats = [("line", [pts])]
    ref = run_reference_geoms(feats, maxzoom=4, extra_flags=["-aw"])
    ours = _build_ours(feats, maxzoom=4, detect_wraparound=True)
    d = diff_counts(ours, ref)
    assert not d, d


def test_sink_resume_and_ds_parity(ray_session, tmp_path):
    """Ray-Data-native plumbing: (a) ingest_features_ds produces the
    same ingested rows as the driver ingest (incl. the drop-ladder
    minzoom assignment), (b) the out_dir sink + summary matches the
    streamed result, (c) resume skips finished groups and still
    reconstitutes the identical tileset."""
    import shutil

    import pyarrow.parquet as pq
    import ray

    from tests.util_reference import geoms_to_table, synth_vector_corpus
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features, ingest_features_ds,
    )

    feats = synth_vector_corpus(n_lines=25, n_polys=15, seed=9)
    cfg = VectorConfig(maxzoom=5, droprate=2.5, drop_lines=True, drop_polygons=True)
    raw = geoms_to_table(feats)
    tbl = ingest_features(raw, cfg)
    ds_tbl = (
        ingest_features_ds(ray.data.from_arrow(raw).repartition(4), cfg)
        .to_pandas().sort_values(["vindex", "seq"]).reset_index(drop=True)
    )
    drv_tbl = tbl.to_pandas().sort_values(["vindex", "seq"]).reset_index(drop=True)
    assert ds_tbl[["seq", "t", "minzoom", "vindex"]].equals(
        drv_tbl[["seq", "t", "minzoom", "vindex"]]
    )

    def counts(ds):
        return {
            (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
            for r in ds.select_columns(["z", "x", "y", "n_features"]).take_all()
        }

    streamed = counts(build_vector_pyramid(tbl, cfg))
    out_dir = str(tmp_path / "tiles")
    sunk = counts(build_vector_pyramid(tbl, cfg, out_dir=out_dir))
    assert sunk == streamed
    summ = pq.read_table(f"{out_dir}/summary.parquet")
    assert int(sum(summ["n_tiles"].to_pylist())) == len(streamed)

    # resume: delete two group partitions, rerun with resume=True
    import os

    groups = sorted(os.listdir(f"{out_dir}/raw"))
    assert len(groups) > 2
    for g in groups[:2]:
        shutil.rmtree(f"{out_dir}/raw/{g}")
    resumed = counts(build_vector_pyramid(tbl, cfg, out_dir=out_dir, resume=True))
    assert resumed == streamed
    summ2 = pq.read_table(f"{out_dir}/summary.parquet")
    assert int(sum(summ2["n_tiles"].to_pylist())) == len(streamed)


def test_attr_shards_resolve_equals_direct_dict(ray_session):
    """AttrShards (the seq-range-sharded side table) must present the
    identical view the old single-object broadcast did: plain entries,
    the _SeqMap side maps, __layers__, and meta keys — for any seq
    subset, resolving only the overlapping shards."""
    import numpy as np

    from tippecanoe_ray.pipelines.vector_pyramid import (
        _SeqMap, _shard_attr_dict,
    )

    rs = np.random.RandomState(11)
    n = 1000
    attrs = {i: (i * 7 % 97, [("k", "string", f"v{i}")])
             for i in range(0, n, 3)}
    seqs = np.arange(0, n, 2, dtype=np.int64)
    attrs["__vindex__"] = _SeqMap(seqs, rs.randint(0, 1 << 60, len(seqs)).astype(np.uint64))
    attrs["__gap__"] = {int(s): int(g) for s, g in
                        zip(seqs[:50], rs.randint(0, 1 << 30, 50))}
    attrs["__layers__"] = {i: f"layer{i % 4}" for i in range(0, n, 5)}
    attrs["__n__"] = n

    shards = _shard_attr_dict(dict(attrs), 7)
    assert sum(r is not None for r in shards.refs) >= 2  # actually sharded

    for subset in (range(0, 40), range(500, 640, 2), range(n - 30, n),
                   [0, 999], range(0, n)):
        view = shards.resolve(list(subset))
        assert view["__n__"] == n
        for s in subset:
            assert view.get(s) == attrs.get(s)
            got = view.get("__vindex__", {})
            want = attrs["__vindex__"]
            assert got.get(s, -1) == want.get(s, -1)
            gg = view.get("__gap__", {})
            assert gg.get(s, 0) == attrs["__gap__"].get(s, 0)
            lay = view.get("__layers__", {})
            assert lay.get(s) == attrs["__layers__"].get(s)
