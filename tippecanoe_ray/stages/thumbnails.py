"""Image payload stages: actor-pool decode, thumbnailing, raster-tile
composition, per-row PSNR/caption verification.

The north-star's raster↔vector composition: image rows are geotagged,
assigned to z/x/y tiles, and each tile renders its members' thumbnails
onto a raster canvas (alongside the vector MVT of the same tile). Codec
state lives in actor pools — ``map_batches(Cls, concurrency=N)`` with
setup in ``__init__`` once per actor, work in ``__call__`` per batch.

Codec reality in this container: our own PNG (real, zlib) and a
deterministic fake-JPEG stand-in (functions/imaging.py); a real JPEG
codec drops into ``decode_image`` without touching the Ray plumbing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.imaging import (
    block_mean_resize,
    decode_image,
    encode_image,
    png_encode,
    psnr,
)


class ThumbnailStage:
    """Actor-pool stage: decode payload bytes → fixed-size RGB thumbnail
    (raw bytes, thumb_px²·3). Deterministic; decode failures surface in
    the ``decode_ok`` column instead of killing the task."""

    def __init__(self, thumb_px: int = 16, bytes_col: str = "bytes"):
        self.thumb_px = thumb_px
        self.bytes_col = bytes_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        thumbs = []
        ok = []
        for data in df[self.bytes_col]:
            try:
                px = decode_image(bytes(data))
                t = block_mean_resize(px, self.thumb_px, self.thumb_px)
                thumbs.append(np.clip(t, 0, 255).astype(np.uint8).tobytes())
                ok.append(True)
            except Exception:
                thumbs.append(b"")
                ok.append(False)
        out = df.drop(columns=[self.bytes_col]).copy()
        out["thumb"] = thumbs
        out["decode_ok"] = ok
        return out


class PayloadVerifier:
    """Actor-pool stage for the per-row invariant (BASELINE.json
    input_hint): decode → re-encode (same fmt) → decode; PSNR of the
    round trip vs the first decode must be ≥ 40 dB for lossy formats
    (∞ for lossless), and the caption must survive byte-identical."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 caption_col: str = "caption"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.caption_col = caption_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        psnrs = []
        for data, fmt in zip(df[self.bytes_col], df[self.fmt_col]):
            px = decode_image(bytes(data))
            rt = decode_image(encode_image(px, fmt))
            psnrs.append(round(psnr(px, rt), 2))
        return pd.DataFrame(
            {
                "image_id": df["image_id"],
                "fmt": df[self.fmt_col],
                "roundtrip_psnr": psnrs,
                "caption_ok": [isinstance(c, str) for c in df[self.caption_col]],
                "caption": df[self.caption_col],
            }
        )


def thumbnail_stage(ds: ray.data.Dataset, thumb_px: int = 16,
                    concurrency: int = 4, batch_size: int = 256) -> ray.data.Dataset:
    """Attach thumbnails via an actor pool (codec state per actor;
    small batches because payloads are heavy — memory-aware sizing)."""
    return ds.map_batches(
        ThumbnailStage,
        fn_constructor_kwargs={"thumb_px": thumb_px},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def verify_payloads(ds: ray.data.Dataset, concurrency: int = 4) -> pd.DataFrame:
    """Row-level verify results — DEV-SCALE ONLY: collects one row per
    image to the driver. Fleet-scale QA should call
    verify_payloads_summary, which aggregates distributed."""
    out = ds.map_batches(
        PayloadVerifier, batch_format="pandas", batch_size=256,
        concurrency=concurrency,
    ).to_pandas()
    return out


def verify_payloads_summary(ds: ray.data.Dataset, concurrency: int = 4,
                            psnr_floor: float = 40.0,
                            sample_violators: int = 20) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Fleet-scale payload QA gate: per-format (n, min_psnr,
    caption_ok, n_below_floor) aggregated inside map_batches — only
    per-(batch, fmt) partials and a bounded violator sample reach the
    driver, never a row per image."""

    def agg_batch(df: pd.DataFrame) -> pd.DataFrame:
        v = PayloadVerifier()(df)
        g = v.groupby("fmt", as_index=False).agg(
            n=("image_id", "count"),
            min_psnr=("roundtrip_psnr", "min"),
            caption_ok=("caption_ok", "all"),
            n_below=("roundtrip_psnr", lambda s: int((s < psnr_floor).sum())),
        )
        bad = v[(v["roundtrip_psnr"] < psnr_floor) | ~v["caption_ok"]]
        g["violators"] = [
            bad[bad["fmt"] == f]["image_id"].head(sample_violators).tolist()
            for f in g["fmt"]
        ]
        return g

    parts = ds.map_batches(
        agg_batch, batch_format="pandas", batch_size=256,
        concurrency=concurrency,
    ).to_pandas()
    if len(parts) == 0:
        empty = pd.DataFrame({"fmt": [], "n": [], "min_psnr": [],
                              "caption_ok": [], "n_below": []})
        return empty, pd.DataFrame({"fmt": [], "image_id": []})
    summ = parts.groupby("fmt", as_index=False).agg(
        n=("n", "sum"), min_psnr=("min_psnr", "min"),
        caption_ok=("caption_ok", "all"), n_below=("n_below", "sum"),
    ).sort_values("fmt").reset_index(drop=True)
    viol = pd.DataFrame([
        {"fmt": f, "image_id": i}
        for f, ids in zip(parts["fmt"], parts["violators"])
        for i in ids[:sample_violators]
    ], columns=["fmt", "image_id"])
    return summ, viol.head(sample_violators * max(1, summ["fmt"].nunique()))


def compose_raster_tiles(
    image_ds: ray.data.Dataset,
    z: int,
    thumb_px: int = 16,
    tile_px: int = 256,
    concurrency: int = 4,
    hotspot_frac: float = 0.0,
) -> ray.data.Dataset:
    """Raster tile pyramid layer at zoom z: geotag → thumbnail (actor
    pool) → shuffle by tile → paste thumbnails at their tile-local
    positions onto a tile_px² canvas → PNG rows (z, x, y, n_images,
    raster). The narrow/vector columns and the heavy pixel payloads
    travel together only until the thumbnail stage shrinks them
    (bytes → thumb_px²·3), so the shuffle moves kilobytes per image."""
    from ..pipelines.pyramid import PyramidConfig, geotag_narrow
    from ..stages.geotag import Geotag

    tag = Geotag(id_col="image_id", rule="fnv", curve="quadkey",
                 hotspot_frac=hotspot_frac, seq_col="seq")
    tagged = image_ds.map_batches(tag, batch_format="pyarrow")
    thumbed = thumbnail_stage(tagged, thumb_px=thumb_px, concurrency=concurrency)

    shift = 32 - z

    def add_tile(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        nmax = (1 << z) - 1
        df["tx"] = np.clip(df["wx"].to_numpy() >> shift, 0, nmax)
        df["ty"] = np.clip(df["wy"].to_numpy() >> shift, 0, nmax)
        return df[["tx", "ty", "wx", "wy", "thumb", "decode_ok"]]

    placed = thumbed.map_batches(add_tile, batch_format="pandas")

    def compose(df: pd.DataFrame) -> pd.DataFrame:
        tx = int(df["tx"].iloc[0])
        ty = int(df["ty"].iloc[0])
        span = 1 << shift
        canvas = np.zeros((tile_px, tile_px, 3), dtype=np.uint8)
        n = 0
        for wx, wy, thumb, ok in zip(df["wx"], df["wy"], df["thumb"], df["decode_ok"]):
            if not ok or len(thumb) == 0:
                continue
            t = np.frombuffer(bytes(thumb), dtype=np.uint8).reshape(thumb_px, thumb_px, 3)
            lx = int((wx - tx * span) * tile_px // span)
            ly = int((wy - ty * span) * tile_px // span)
            x0 = min(max(lx - thumb_px // 2, 0), tile_px - thumb_px)
            y0 = min(max(ly - thumb_px // 2, 0), tile_px - thumb_px)
            canvas[y0 : y0 + thumb_px, x0 : x0 + thumb_px] = t
            n += 1
        return pd.DataFrame(
            {
                "z": [z], "x": [tx], "y": [ty], "n_images": [n],
                "raster": [png_encode(canvas)],
            }
        )

    return placed.groupby(["tx", "ty"]).map_groups(compose, batch_format="pandas")
