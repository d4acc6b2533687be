"""Video/audio payload plumbing (stages/media.py): container round
trips, actor-pool frame sampling, audio features, stub gates."""

import numpy as np
import pytest
import ray.data

from tippecanoe_ray.functions.imaging import png_decode, synth_pixels
from tippecanoe_ray.stages.media import (
    AudioFeatureStage,
    decode_audio,
    decode_video,
    frame_sample,
    synth_audio_bytes,
    synth_video_bytes,
    synthesize_audio_table,
    synthesize_video_table,
)


def test_video_container_round_trip():
    data = synth_video_bytes(7, 5, w=24, h=16)
    frames, n, w, h = decode_video(data)
    assert (n, w, h) == (5, 24, 16)
    for f in range(5):
        assert (frames[f] == synth_pixels(7 + f, 24, 16)).all()


def test_audio_container_round_trip():
    data = synth_audio_bytes(3, n_samples=1000, sr=8000)
    s, sr = decode_audio(data)
    assert sr == 8000 and len(s) == 1000
    i = np.arange(1000, dtype=np.int64)
    want = ((3 * 2654435761 + 12345 * i) % 65536 - 32768).astype(np.int16)
    assert (s == want).all()


def test_unknown_container_raises():
    with pytest.raises(NotImplementedError):
        decode_video(b"RIFFxxxx")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04junk")


def test_frame_sample_stage(ray_session):
    ids = np.arange(20)
    ds = ray.data.from_arrow(synthesize_video_table(ids))
    out = frame_sample(ds, stride=2).to_pandas()
    # every video contributes ceil(n_frames / 2) frames, frame 0 first
    for v in ids:
        sub = out[out["video_id"] == v]
        nf = 2 + int(v) % 7
        assert len(sub) == (nf + 1) // 2
        assert sorted(sub["frame_idx"]) == list(range(0, nf, 2))
    # PNG is lossless: a sampled frame decodes back pixel-exact
    row = out[(out["video_id"] == 5) & (out["frame_idx"] == 2)].iloc[0]
    assert (png_decode(bytes(row["frame_png"])) == synth_pixels(7, 24, 16)).all()


def test_audio_feature_stage_values(ray_session):
    ids = np.array([0, 1, 9])
    ds = ray.data.from_arrow(synthesize_audio_table(ids, n_samples=2048))
    out = (
        ds.map_batches(AudioFeatureStage, batch_format="pandas", concurrency=1)
        .to_pandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    for _, r in out.iterrows():
        i = np.arange(2048, dtype=np.int64)
        x = ((int(r["audio_id"]) * 2654435761 + 12345 * i) % 65536 - 32768).astype(
            np.float64
        )
        assert r["n_samples"] == 2048
        assert r["rms"] == round(float(np.sqrt(np.mean(x * x))), 6)
        assert r["zero_crossings"] == int(np.count_nonzero(x[1:] * x[:-1] < 0))
        assert r["duration_sec"] == round(2048 / 16000, 6)
        assert r["spectral_centroid"] > 0
