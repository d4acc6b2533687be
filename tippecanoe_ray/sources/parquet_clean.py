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


def clean_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    sch = pq.read_schema(path).remove_metadata()
    if columns is None:
        return sch
    return pa.schema([sch.field(c) for c in columns])


def read_parquet_clean(
    path: str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    return ray.data.read_parquet(
        path, columns=columns, schema=clean_schema(path, columns), **kwargs
    )
