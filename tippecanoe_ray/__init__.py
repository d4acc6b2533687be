"""tippecanoe_ray — a Ray-Data-native tile-pyramid / spatial data engine.

A from-scratch re-expression of the query and data-processing
capabilities of felt/tippecanoe (reference studied at /root/reference,
v2.81.0) as idiomatic Ray Data pipelines:

- ``ray.data.Dataset`` end to end; per-batch transforms are vectorized
  numpy / pyarrow.compute kernels over zero-copy Arrow batches.
- Wide steps (per-tile grouping, global spatial sort, dedup) are
  ``groupby`` / ``sort`` / hash-partitioned ``map_batches``.
- Stateful stages (image codecs, sequential drop-ladder scans) are
  actor pools / chained actors.

Layout:
    functions/   pure vectorized kernels (projection, space-filling
                 curves, cells, geometry, text, imaging, hashing)
    sources/     readers + deterministic synthetic image-table source
    stages/      Dataset-stage building blocks (geotag, minzoom ladder,
                 tile assignment, per-tile pipeline, MVT codec)
    pipelines/   end-to-end pipelines (tile pyramid, dedup, ANN, text)
    relational/  thin relational ops (broadcast joins, aggregates)
    state/       checkpoint / lineage / resume
"""

__version__ = "0.1.0"
