"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library code it uses) initializes or shuts
down Ray.

- ``entry()``: flagship pipeline — the full drop-ladder tile pyramid
  over a deterministic image table derived from sf0.001 documents.
- ``queries()``: one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data ops); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-runnable SQL equivalents — 49 of the 50
  queries, including the LSH families (simhash signatures, the full
  capped-bucket MinHash banding model, sampled exact-shingle n-gram
  Jaccard, the pruned sign-LSH ANN read, the IVF spherical-k-means
  pruned read with unrolled Lloyd iterations, the fp32-jitter
  embedding near-dup), the full image pyramid (geotag + snapping +
  rate ladder as a recursive CTE), the vector cascade's clip-survival
  forms (axis-aligned squares, buffered-point containment incl. the
  z0 dateline duplication), and the multimodal feature models
  (frame-sample counts, integer-exact PCM RMS/zero-crossings).
  vector_pyramid_counts / vector_tiles_z3 are anchored to the
  strongest oracle available: committed parquet fixtures decoded from
  the reference binary's own tiles over the identical corpus
  (tools/build_vector_oracle_fixtures.py); their SQL is a plain
  read_parquet of the fixture. Rows-only by design: payload_psnr
  (pixel kernel — no SQL form).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build a z0–z8 drop-ladder pyramid over an image table
    derived from the sf0.001 documents rows (image ids/captions come
    from the docs; positions from the deterministic geotag rule)."""
    import pyarrow.parquet as pq
    import ray.data

    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    import pyarrow as pa

    tbl = pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in docs["doc_id"].to_pylist()]),
            "caption": docs["text"],
            "seq": docs["doc_id"].cast(pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cfg = PyramidConfig(maxzoom=8, droprate=2.5, hotspot_frac=0.2)
    tiles = build_pyramid(ds, cfg, n_rows=len(tbl))
    return tiles.select_columns(["z", "x", "y", "n_features"])


def queries() -> dict[str, Callable[[str], Any]]:
    from tippecanoe_ray.pipelines.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from tippecanoe_ray.pipelines.queries import all_oracle_sql

    return all_oracle_sql()
