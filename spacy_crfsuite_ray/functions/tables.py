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
