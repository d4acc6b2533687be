"""Image payload kernels: minimal PNG codec, deterministic fake-JPEG,
perceptual hash, thumbnailing, PSNR.

The runtime has no image libraries (no PIL / cv2), so this module
implements a real, self-contained PNG encoder/decoder over stdlib zlib
(8-bit RGB, filter 0) and a clearly-marked deterministic fake "JPEG"
container (magic ``FJPG``: quantize-to-step-4 + zlib — lossy enough to
exercise the PSNR≥40dB invariant, deterministic enough to test the Ray
plumbing: schema, batch sizing, actor-pool decode stages). A real
codec drops in by replacing `encode_image` / `decode_image`.

Everything is numpy; per-image work happens inside actor-pool
map_batches stages (see stages/thumbnails.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"
FJPG_QUANT = 4  # quantization step — MSE ≈ (q²−1)/12 ⇒ PSNR ≈ 47 dB


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(rgb: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as a valid RGB8 PNG (filter 0)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by png_encode (RGB8, filter 0/1/2 rows)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, hh, depth, ctype = struct.unpack(">IIBB", body[:10])
            h = hh
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    if (filters == 0).all():
        return rows.astype(np.uint8).reshape(h, w, 3)
    out = np.empty_like(rows)
    for r in range(h):
        f = filters[r]
        if f == 0:
            out[r] = rows[r]
        elif f == 1:  # Sub
            acc = rows[r].copy()
            for i in range(3, acc.shape[0]):
                acc[i] = (acc[i] + acc[i - 3]) & 0xFF
            out[r] = acc
        elif f == 2:  # Up
            out[r] = (rows[r] + out[r - 1]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


def fjpg_encode(rgb: np.ndarray) -> bytes:
    """Deterministic fake-JPEG: quantized + zlib. STAND-IN for a real
    lossy codec (none available in this container); PSNR vs the source
    is ≈47 dB, satisfying the ≥40 dB invariant."""
    h, w, _ = rgb.shape
    q = (rgb.astype(np.int16) // FJPG_QUANT * FJPG_QUANT + FJPG_QUANT // 2).clip(0, 255).astype(np.uint8)
    return FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def fjpg_decode(data: bytes) -> np.ndarray:
    if data[:4] != FJPG_MAGIC:
        raise ValueError("not an FJPG payload")
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)


def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(rgb)
    if fmt in ("jpeg", "jpg"):
        return fjpg_encode(rgb)
    raise ValueError(f"unknown format {fmt}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    if data[:8] == PNG_SIG:
        return png_decode(data)
    if data[:4] == FJPG_MAGIC:
        return fjpg_decode(data)
    raise NotImplementedError(
        f"no decoder for payload (fmt={fmt}); real JPEG/WebP decode requires "
        "an image library not present in this environment"
    )


def synth_pixels(seed_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-row pixel pattern (FIXTURES.md §1): cheap
    reproducible gradients + hash-seeded phase, vectorized."""
    yy, xx = np.mgrid[0:h, 0:w]
    a = (seed_id * 2654435761) & 0xFFFFFFFF
    r = (xx * 3 + (a & 0xFF)) % 256
    g = (yy * 5 + ((a >> 8) & 0xFF)) % 256
    b = ((xx + yy) * 2 + ((a >> 16) & 0xFF)) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def to_gray(rgb: np.ndarray) -> np.ndarray:
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])


def block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample by index-mapped block means (pure numpy)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    flat = img.reshape(h, w, -1).astype(np.float64)
    # integral image for O(1) block sums
    ii = np.zeros((h + 1, w + 1, flat.shape[2]))
    np.cumsum(np.cumsum(flat, axis=0), axis=1, out=ii[1:, 1:])
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    sums = ii[y1][:, x1] - ii[y0][:, x1] - ii[y1][:, x0] + ii[y0][:, x0]
    areas = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[..., None]
    out = sums / areas
    if img.ndim == 2:
        return out[..., 0]
    return out


def ahash64(rgb: np.ndarray) -> int:
    """64-bit average hash: 8×8 block-mean grayscale thresholded at its
    mean — the deterministic stand-in for a perceptual hash."""
    g = block_mean_resize(to_gray(rgb), 8, 8)
    bits = (g > g.mean()).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
