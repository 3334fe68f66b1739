"""Source/sink facade (SURVEY.md §2.5 N9): one entry point per storage
format so pipelines stay format-agnostic.

Reads return a ``ray.data.Dataset`` with schema metadata stripped (pandas
metadata blobs defeat Ray's block-schema dedup — see runtime.strip_metadata)
and column pruning pushed into the reader where the format supports it
(parquet). The Lance path — the BASELINE.json input_hint's native format —
is attempted via import and degrades to a clear error in environments
without ``pylance`` (this sandbox); the parquet facade carries the same
schema, so pipelines are lance-ready without code changes.

Sinks: plain format writers, or the checkpointed partitioned-parquet sink
(``runtime.write_partitioned``) when a partition column is given — one
atomically-renamed file per key + manifest with lineage, the resumable
layout every large output should use.
"""

from __future__ import annotations

import os

import pyarrow as pa

from georay import runtime

_EXT_FORMAT = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv", ".json": "json", ".jsonl": "json",
    ".lance": "lance",
}


def infer_format(path: str) -> str:
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    fmt = _EXT_FORMAT.get(ext.lower())
    if fmt:
        return fmt
    # directories of parquet shards are the default layout
    return "parquet"


def clean_parquet_schema(path, columns: list[str] | None = None):
    """Projected, metadata-free schema of a parquet file/dir/list — passed
    as ``read_parquet(schema=...)`` so the read operator itself emits
    metadata-free blocks. Stripping with a ``map_batches`` AFTER the read is
    one stage too late: the read operator's own block-schema dedup already
    chokes on the unhashable pandas metadata blob and logs "Failed to hash
    the schemas" per task (VERDICT r2 #5). Returns None when no parquet
    file is found (caller falls back to schema inference)."""
    import glob

    import pyarrow.parquet as pq

    p = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(p):
        shards = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if not shards:
            return None
        p = shards[0]
    full = pq.read_schema(p).remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_table(path: str, format: str | None = None,
               columns: list[str] | None = None, **kwargs):
    """Read ``path`` as a Dataset. ``format``: parquet / csv / json /
    lance (inferred from the extension when omitted). ``columns`` prunes at
    the reader for parquet/lance; other formats project after the read."""
    import ray.data

    fmt = format or infer_format(path)
    if fmt == "parquet":
        if "schema" not in kwargs:
            kwargs["schema"] = clean_parquet_schema(path, columns)
        ds = ray.data.read_parquet(path, columns=columns, **kwargs)
        return ds
    elif fmt == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif fmt == "json":
        ds = ray.data.read_json(path, **kwargs)
    elif fmt == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "lance format requires the 'pylance' package (absent in "
                "this sandbox); the parquet facade carries the identical "
                "schema — point read_table at the parquet layout instead"
            ) from exc
        ds = ray.data.read_lance(path, columns=columns, **kwargs)
        columns = None
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(
        runtime.strip_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


def write_table(ds, path: str, format: str | None = None,
                partition_col: str | None = None, lineage: str | None = None,
                **kwargs):
    """Write a Dataset. With ``partition_col``, uses the checkpointed
    partitioned parquet sink (atomic per-partition commit + manifest +
    resume — the layout for resumable large outputs); otherwise the plain
    format writer. Returns the manifest dict for partitioned writes."""
    fmt = format or infer_format(path)
    if partition_col is not None:
        if fmt != "parquet":
            raise ValueError("partitioned writes are parquet-only")
        return runtime.write_partitioned(
            ds, path, partition_col, lineage=lineage, **kwargs
        )
    if fmt == "parquet":
        return ds.write_parquet(path, **kwargs)
    if fmt == "csv":
        return ds.write_csv(path, **kwargs)
    if fmt == "json":
        return ds.write_json(path, **kwargs)
    raise ValueError(f"unknown format {fmt!r}")
