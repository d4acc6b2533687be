"""Geobuf source: our encoder's output is parsed by the REFERENCE
binary (its geobuf reader is the oracle), and our reader's features
tile identically."""

import os
import subprocess
import tempfile

import pytest

from tests.conftest import has_reference


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_geobuf_roundtrip_vs_reference(ray_session):
    from tests.util_reference import read_mbtiles_counts, synth_vector_corpus
    from tests.util_reference import TIPPECANOE
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geobuf import read_geobuf_vector, write_geobuf

    feats = synth_vector_corpus(n_lines=15, n_polys=10, seed=13)
    with tempfile.TemporaryDirectory() as td:
        gb = os.path.join(td, "in.geobuf")
        write_geobuf(feats, gb)
        mb = os.path.join(td, "out.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z5", "--no-tile-size-limit", "-q", gb],
            check=True, capture_output=True,
        )
        ref = read_mbtiles_counts(mb)
        tbl = read_geobuf_vector(gb)
    assert len(tbl) == len(feats)
    cfg = VectorConfig(maxzoom=5, layer_name="in")
    tiles = build_vector_pyramid(ingest_features(tbl, cfg), cfg)
    ours = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in tiles.take_all()
    }
    bad = [
        f"{k}: ours={ours.get(k)} ref={ref.get(k)}"
        for k in sorted(set(ours) | set(ref))
        if ours.get(k) != ref.get(k)
    ]
    assert not bad, bad[:10]
