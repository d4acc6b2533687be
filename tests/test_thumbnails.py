"""Actor-pool image stages: thumbnails, raster tiles, payload PSNR."""

import numpy as np

from tippecanoe_ray.functions.imaging import png_decode
from tippecanoe_ray.sources.image_table import synthesize_image_table
from tippecanoe_ray.stages.thumbnails import (
    compose_raster_tiles,
    thumbnail_stage,
    verify_payloads,
)


def test_thumbnail_actor_pool(ray_session):
    ds = synthesize_image_table(60, with_payload=True)
    out = thumbnail_stage(ds, thumb_px=8, concurrency=2).to_pandas()
    assert len(out) == 60
    assert out["decode_ok"].all()
    assert all(len(t) == 8 * 8 * 3 for t in out["thumb"])


def test_payload_roundtrip_invariant(ray_session):
    """The input_hint per-row invariant: PSNR ≥ 40 dB + caption intact."""
    ds = synthesize_image_table(90, with_payload=True)
    out = verify_payloads(ds, concurrency=2)
    assert len(out) == 90
    assert (out["roundtrip_psnr"] >= 40).all()
    assert out["caption_ok"].all()
    # captions byte-equal to the deterministic generator
    from tippecanoe_ray.sources.image_table import caption_for

    for _, r in out.iterrows():
        i = int(r["image_id"].split("-")[1])
        assert r["caption"] == caption_for(i)


def test_compose_raster_tiles(ray_session):
    ds = synthesize_image_table(120, with_payload=True)
    tiles = compose_raster_tiles(ds, z=1, thumb_px=8, tile_px=64, concurrency=2)
    rows = tiles.take_all()
    assert 1 <= len(rows) <= 4
    assert sum(r["n_images"] for r in rows) == 120
    for r in rows:
        canvas = png_decode(bytes(r["raster"]))
        assert canvas.shape == (64, 64, 3)
        assert canvas.any()  # something was pasted
