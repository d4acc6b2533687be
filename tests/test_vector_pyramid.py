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
