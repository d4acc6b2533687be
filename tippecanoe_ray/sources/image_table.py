"""The primary input: a Lance table of image + caption pairs
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64) — BASELINE.json input_hint.

- ``read_image_table`` reads a real Lance dataset when the `lance`
  package is importable, else a parquet directory/file with the same
  schema (this container has no lance; the API is format-transparent).
- ``synthesize_image_table`` builds the deterministic synthetic table of
  FIXTURES.md §1 as a streaming Ray Dataset: `ray.data.range(n)` →
  vectorized map_batches; no driver-side materialization, so it scales
  to arbitrary n. Payload bytes are optional — tiling stages shuffle
  ids, never pixels (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.imaging import ahash64, encode_image, synth_pixels

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_WORDS = (
    "ridge harbor cedar lumen quartz delta ember fjord glyph haven "
    "isle juniper krill lagoon mesa nadir onyx prism quay reef summit "
    "tundra umbra vale wharf xylem yonder zephyr"
).split()


def caption_for(i: int) -> str:
    a = _WORDS[i % len(_WORDS)]
    b = _WORDS[(i * 7 + 3) % len(_WORDS)]
    c = _WORDS[(i * 13 + 5) % len(_WORDS)]
    return f"caption {i} {a} {b} {c}"


def make_image_batch(batch, with_payload: bool = True, seed: int = 42):
    """numpy-batch → Arrow table of the image schema; deterministic in i."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    n = len(ids)
    image_id = [f"img-{i:012d}" for i in ids]
    w = (64 + (ids % 5) * 16).astype(np.int32)
    h = (64 + ((ids // 5) % 5) * 16).astype(np.int32)
    fmt = ["png" if (i % 3) else "jpeg" for i in ids]
    caption = [caption_for(int(i)) for i in ids]
    payload: list[bytes | None] = [None] * n
    phash = np.zeros(n, dtype=np.int64)
    if with_payload:
        for k in range(n):
            px = synth_pixels(int(ids[k]) + seed, int(w[k]), int(h[k]))
            payload[k] = encode_image(px, fmt[k])
            phash[k] = np.int64(np.uint64(ahash64(px)))
    else:
        payload = [b""] * n
    return pa.table(
        {
            "image_id": pa.array(image_id, pa.string()),
            "bytes": pa.array(payload, pa.large_binary()),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": pa.array(caption, pa.string()),
            "phash": pa.array(phash, pa.int64()),
            "seq": pa.array(ids, pa.int64()),
        }
    )


def synthesize_image_table(
    n: int,
    with_payload: bool = True,
    seed: int = 42,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Deterministic synthetic image table as a streaming Dataset."""
    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: make_image_batch(b, with_payload=with_payload, seed=seed),
        batch_format="numpy",
        batch_size=4096,
    )


def read_image_table(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the image table from Lance if available, else parquet."""
    try:
        import lance  # noqa: F401

        ds = ray.data.read_lance(path, columns=columns)
        # strip schema metadata so shuffle schema hashing works
        return ds.map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    except ImportError:
        from .parquet_clean import read_parquet_clean

        return read_parquet_clean(path, columns=columns)
