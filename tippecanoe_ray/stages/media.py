"""Video / audio payload stages: opaque binary columns + typed
metadata, processed by actor-pool map_batches stages — the multimodal
plumbing companion to stages/thumbnails.py (images).

Codec reality in this container: no video or audio libraries exist, so
payloads use two deterministic in-repo containers (real parsing, real
pixel/PCM math, seeded synthesis) and ``decode_video`` /
``decode_audio`` raise ``NotImplementedError`` for any other format —
a real codec drops into those two functions without touching the Ray
plumbing (schema, batch sizing, actor signature, output layout), which
is the part this module makes real and tested:

- TPRV "video": header ``TPRV | u32 n_frames | u32 w | u32 h`` then
  n_frames raw RGB frames (h*w*3 bytes each), frame f of video id v
  being ``synth_pixels(v + f)``. FrameSampleStage explodes each video
  row into every-``stride``-th frame, re-encoded as PNG image rows —
  the row-expanding map_batches shape a frame-sampling stage needs.
- TPRA "audio": header ``TPRA | u32 n_samples | u32 sr`` then int16
  little-endian PCM, sample i of audio id v being
  ``((v * 2654435761 + 12345 * i) mod 65536) - 32768`` (an affine
  integer generator — deliberately closed-form so the feature oracle
  can recompute it exactly in SQL). AudioFeatureStage computes RMS,
  zero-crossing count and spectral centroid (numpy rfft) per row.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.imaging import png_encode, synth_pixels

VIDEO_MAGIC = b"TPRV"
AUDIO_MAGIC = b"TPRA"


# ------------------------------------------------------------ synthesis


def synth_video_bytes(seed_id: int, n_frames: int, w: int = 24, h: int = 16) -> bytes:
    frames = [synth_pixels(seed_id + f, w, h).astype(np.uint8).tobytes()
              for f in range(n_frames)]
    return VIDEO_MAGIC + struct.pack("<III", n_frames, w, h) + b"".join(frames)


def synth_audio_bytes(seed_id: int, n_samples: int = 4096, sr: int = 16000) -> bytes:
    i = np.arange(n_samples, dtype=np.int64)
    s = ((seed_id * 2654435761 + 12345 * i) % 65536 - 32768).astype(np.int16)
    return AUDIO_MAGIC + struct.pack("<II", n_samples, sr) + s.tobytes()


# ------------------------------------------------------------- decoders


def decode_video(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """(frames[n,h,w,3], n_frames, w, h). Real codecs are not available
    in this environment; anything but the TPRV container raises."""
    if data[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            "no video codec available in this environment; only the "
            "deterministic TPRV container is decodable"
        )
    n, w, h = struct.unpack("<III", data[4:16])
    px = np.frombuffer(data[16 : 16 + n * h * w * 3], dtype=np.uint8)
    return px.reshape(n, h, w, 3), n, w, h


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, sample_rate). Same stub gate as decode_video."""
    if data[:4] != AUDIO_MAGIC:
        raise NotImplementedError(
            "no audio codec available in this environment; only the "
            "deterministic TPRA container is decodable"
        )
    n, sr = struct.unpack("<II", data[4:12])
    return np.frombuffer(data[12 : 12 + 2 * n], dtype="<i2"), sr


# ---------------------------------------------------------- actor pools


class FrameSampleStage:
    """Actor-pool stage: one video row in → one image row out per
    sampled frame (every ``stride``-th, always including frame 0),
    frames re-encoded as PNG. Row expansion happens inside the batch,
    so the heavy video payload never crosses the stage boundary —
    only the (much smaller) sampled frames do."""

    def __init__(self, stride: int = 2, bytes_col: str = "bytes",
                 id_col: str = "video_id"):
        self.stride = stride
        self.bytes_col = bytes_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, fidx, pngs, ws, hs = [], [], [], [], []
        for vid, data in zip(df[self.id_col], df[self.bytes_col]):
            frames, n, w, h = decode_video(bytes(data))
            for f in range(0, n, self.stride):
                ids.append(vid)
                fidx.append(f)
                pngs.append(png_encode(frames[f]))
                ws.append(w)
                hs.append(h)
        return pd.DataFrame(
            {self.id_col: ids, "frame_idx": fidx, "frame_png": pngs,
             "w": ws, "h": hs}
        )


class AudioFeatureStage:
    """Actor-pool stage: decode PCM → (rms, zero_crossings, spectral
    centroid, duration). All-numpy per batch; FFT state is trivial but
    the stage keeps the actor-pool shape a model-backed feature
    extractor would need."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "audio_id"):
        self.bytes_col = bytes_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rms, zc, cent, dur, nsmp = [], [], [], [], []
        for data in df[self.bytes_col]:
            s, sr = decode_audio(bytes(data))
            x = s.astype(np.float64)
            n = len(x)
            rms.append(round(float(np.sqrt(np.mean(x * x))), 6) if n else 0.0)
            zc.append(int(np.count_nonzero(x[1:] * x[:-1] < 0)) if n > 1 else 0)
            if n:
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                tot = mag.sum()
                cent.append(round(float((freqs * mag).sum() / tot), 3) if tot > 0 else 0.0)
            else:
                cent.append(0.0)
            dur.append(round(n / sr, 6) if sr else 0.0)
            nsmp.append(n)
        return pd.DataFrame(
            {self.id_col: df[self.id_col], "n_samples": nsmp, "rms": rms,
             "zero_crossings": zc, "spectral_centroid": cent,
             "duration_sec": dur}
        )


# ------------------------------------------------------------ pipelines


def synthesize_video_table(ids: np.ndarray, w: int = 24, h: int = 16) -> pa.Table:
    """Deterministic video table: id v gets 2 + (v % 7) frames."""
    ids = np.asarray(ids, dtype=np.int64)
    return pa.table(
        {
            "video_id": pa.array(ids),
            "bytes": pa.array(
                [synth_video_bytes(int(v), 2 + int(v) % 7, w, h) for v in ids],
                pa.large_binary(),
            ),
            "n_frames": pa.array((2 + ids % 7).astype(np.int32)),
            "w": pa.array(np.full(len(ids), w, np.int32)),
            "h": pa.array(np.full(len(ids), h, np.int32)),
            "fmt": pa.array(["tprv"] * len(ids)),
        }
    )


def synthesize_audio_table(ids: np.ndarray, n_samples: int = 4096,
                           sr: int = 16000) -> pa.Table:
    ids = np.asarray(ids, dtype=np.int64)
    return pa.table(
        {
            "audio_id": pa.array(ids),
            "bytes": pa.array(
                [synth_audio_bytes(int(v), n_samples, sr) for v in ids],
                pa.large_binary(),
            ),
            "sr": pa.array(np.full(len(ids), sr, np.int32)),
            "fmt": pa.array(["tpra"] * len(ids)),
        }
    )


def frame_sample(ds: ray.data.Dataset, stride: int = 2, concurrency: int = 4,
                 batch_size: int = 64) -> ray.data.Dataset:
    """Sample frames from a video table (actor pool; small batches —
    video payloads are the heaviest rows in the system)."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(ds: ray.data.Dataset, concurrency: int = 4,
                   batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
