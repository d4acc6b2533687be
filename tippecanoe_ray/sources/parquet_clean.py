"""Parquet reading with a metadata-free schema.

Parquet files written by pandas carry a schema-level b'pandas' metadata
blob. Ray Data's shuffle/unify schema-dedup calls hash(schema), which
raises "unhashable type: 'dict'" on metadata-carrying schemas and logs
a warning once per task (the round-1/2 log spam). Passing an explicit
metadata-stripped schema to read_parquet makes every block's schema
clean from the first operator, so no downstream strip stage is needed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _schema_file(path: str) -> str:
    """read_schema wants a FILE; for a dataset directory use the first
    parquet member (all members share one schema by construction)."""
    import os

    if not os.path.isdir(path):
        return path
    for root, _dirs, files in sorted(os.walk(path)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return path


def clean_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    sch = pq.read_schema(_schema_file(path)).remove_metadata()
    if columns is None:
        return sch
    return pa.schema([sch.field(c) for c in columns])


def read_parquet_clean(
    path: str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    return ray.data.read_parquet(
        path, columns=columns, schema=clean_schema(path, columns), **kwargs
    )
