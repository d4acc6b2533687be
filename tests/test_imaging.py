"""Image payload kernels: PNG codec, fake-JPEG, PSNR, hashes."""

import numpy as np
import pytest

from tippecanoe_ray.functions.imaging import (
    ahash64,
    block_mean_resize,
    decode_image,
    encode_image,
    fjpg_decode,
    fjpg_encode,
    png_decode,
    png_encode,
    psnr,
    synth_pixels,
)


def test_png_roundtrip_lossless():
    px = synth_pixels(123, 80, 64)
    data = png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = png_decode(data)
    np.testing.assert_array_equal(out, px)
    assert psnr(px, out) == float("inf")


def test_fjpg_lossy_psnr():
    px = synth_pixels(7, 96, 96)
    out = fjpg_decode(fjpg_encode(px))
    assert out.shape == px.shape
    p = psnr(px, out)
    assert p >= 40.0, p  # the per-row invariant (BASELINE.json input_hint)


def test_decode_dispatch_and_unknown():
    px = synth_pixels(1, 16, 16)
    assert decode_image(encode_image(px, "png")).shape == (16, 16, 3)
    assert decode_image(encode_image(px, "jpeg")).shape == (16, 16, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 real jpeg magic")


def test_ahash_stability_and_sensitivity():
    a = synth_pixels(42, 64, 64)
    assert ahash64(a) == ahash64(a.copy())
    b = synth_pixels(43, 64, 64)
    assert ahash64(a) != ahash64(b)
    # near-duplicate (small noise) → small hamming distance
    noisy = np.clip(a.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    ham = bin(ahash64(a) ^ ahash64(noisy)).count("1")
    assert ham <= 8


def test_block_mean_resize():
    img = np.zeros((64, 64))
    img[:32] = 100.0
    out = block_mean_resize(img, 2, 2)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0], 100.0)
    np.testing.assert_allclose(out[1], 0.0)
