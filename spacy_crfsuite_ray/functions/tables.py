"""Small Arrow-table utilities shared by the distributed operators."""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa


def stable_rename(names: List[str], types: Sequence[pa.DataType]):
    """``map_batches`` fn: rename post-groupby aggregate columns to stable
    output names. Shuffle partitions that received no keys emit 0-COLUMN
    empty blocks; those become typed empty tables here so the streaming
    executor sees ONE schema end-to-end instead of warning about schema
    drift ("new schema: .") on every empty block — noise that would bury
    real problems at 100x block counts."""
    schema = pa.schema(list(zip(names, types)))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return batch.rename_columns(names)

    return fn


def read_parquet_nometa(paths, *, columns=None, **kw):
    """``ray.data.read_parquet`` with the writer's schema metadata stripped.

    The driver-generated fixtures carry a ``pandas`` schema-metadata blob;
    a ``pa.Schema`` holding that dict is UNHASHABLE, so every schema-dedup
    attempt inside Ray's read-split and shuffle paths logs "Failed to hash
    the schemas" — noise that would bury real problems at 100x block
    counts. Passing an explicit metadata-free schema (one footer read on
    the driver — free) fixes the read stage itself; downstream stages all
    construct fresh metadata-less tables. Files that are already clean skip
    the override entirely."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    schema = None
    try:
        if os.path.isdir(first):
            cands = sorted(
                f for f in os.listdir(first) if f.endswith(".parquet")
            )
            first = os.path.join(first, cands[0]) if cands else None
        if first:
            schema = pq.read_schema(first)
            if schema.metadata:
                schema = schema.remove_metadata()
                if columns is not None:
                    schema = pa.schema([schema.field(c) for c in columns])
            else:
                schema = None  # already clean — no need to constrain
    except Exception:
        schema = None
    if schema is not None:
        kw["schema"] = schema
    return rd.read_parquet(paths, columns=columns, **kw)


def read_documents(sf_dir: str, columns=None):
    """The documents-table reader shared by the text / dedup / clean op
    families — ONE copy of the path convention (was three drifting
    module-local `_docs` helpers)."""
    return read_parquet_nometa(f"{sf_dir}/documents.parquet", columns=columns)


def collect_table(ds, empty_schema: "pa.Schema | None" = None) -> pa.Table:
    """Collect a (small, pre-reduced) Dataset to one driver table. A stream
    whose blocks are ALL empty yields ZERO batches from iter_batches, and
    ``pa.concat_tables([])`` raises — pass ``empty_schema`` to get a typed
    empty table instead (callers that structurally cannot produce an empty
    stream may omit it). Shared by ops.dedup and ops.relational so the
    all-empty-stream semantics cannot drift between them."""
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not tables:
        if empty_schema is not None:
            return empty_schema.empty_table()
        raise ValueError(
            "empty stream collected without an empty_schema fallback"
        )
    return pa.concat_tables(tables)
