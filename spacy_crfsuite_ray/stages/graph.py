"""Graph materialization: nodes/edges with deterministic surrogate ids,
partitioned Parquet output with per-partition lineage + metrics manifests.

Exact dedup is a groupby on the content-hash id (SURVEY.md §2.8): because ids
are deterministic, re-runs are byte-stable and dedup is order-independent.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa

from ..functions.hashing import edge_id

NODE_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("canonical", pa.string()),
        ("type", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)
EDGE_SCHEMA = pa.schema(
    [
        ("edge_id", pa.string()),
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("n_sources", pa.int64()),
        ("confidence", pa.float64()),
    ]
)


def edge_key_batch(batch: pa.Table) -> pa.Table:
    """canonical triples → (edge_id, subj_id, pred, obj_id, url, confidence)."""
    eids = [
        edge_id(s, p, o)
        for s, p, o in zip(
            batch.column("subj_id").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj_id").to_pylist(),
        )
    ]
    return pa.table(
        {
            "edge_id": pa.array(eids, pa.string()),
            "subj_id": batch.column("subj_id"),
            "pred": batch.column("pred"),
            "obj_id": batch.column("obj_id"),
            "url": batch.column("url"),
            "confidence": batch.column("confidence"),
        }
    )


def edge_group_to_row(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups on edge_id: n_sources = distinct source urls,
    confidence = max over observations (deterministic)."""
    return pd.DataFrame(
        {
            "edge_id": [group["edge_id"].iloc[0]],
            "subj_id": [group["subj_id"].iloc[0]],
            "pred": [group["pred"].iloc[0]],
            "obj_id": [group["obj_id"].iloc[0]],
            "n_sources": [int(group["url"].nunique())],
            "confidence": [float(group["confidence"].max())],
        }
    )


def node_group_to_row(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups on node_id: first-wins metadata + mention count."""
    return pd.DataFrame(
        {
            "node_id": [group["node_id"].iloc[0]],
            "canonical": [group["canonical"].iloc[0]],
            "type": [group["type"].iloc[0]],
            "n_mentions": [int(group["cnt"].sum())],
        }
    )


# ---------------------------------------------------------------- manifests


def write_manifest(
    out_dir: str,
    partition_id: str,
    input_refs: List[str],
    rows_out: int,
    wall_s: float,
    extra: Optional[Dict] = None,
) -> str:
    """Per-partition lineage + metrics record. A partition whose manifest
    exists and validates is SKIPPED on resume (see pipelines/kg.py)."""
    manifest_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)
    files = []
    part_dir = os.path.join(out_dir, f"shard={partition_id}")
    if os.path.isdir(part_dir):
        for name in sorted(os.listdir(part_dir)):
            path = os.path.join(part_dir, name)
            if name.endswith(".parquet"):
                with open(path, "rb") as f:
                    digest = hashlib.sha1(f.read()).hexdigest()
                files.append(
                    {"file": name, "bytes": os.path.getsize(path), "sha1": digest}
                )
    record = {
        "partition_id": partition_id,
        "input_refs": input_refs,
        "rows_out": rows_out,
        "bytes": sum(f["bytes"] for f in files),
        "files": files,
        "wall_s": wall_s,
        "written_at": time.time(),
        **(extra or {}),
    }
    path = os.path.join(manifest_dir, f"{partition_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1)
    os.replace(tmp, path)
    return path


def manifest_valid(out_dir: str, partition_id: str) -> bool:
    """True iff the manifest exists and every listed file is present with the
    recorded size."""
    path = os.path.join(out_dir, "_manifest", f"{partition_id}.json")
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            record = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    part_dir = os.path.join(out_dir, f"shard={partition_id}")
    for entry in record.get("files", []):
        fp = os.path.join(part_dir, entry["file"])
        if not os.path.exists(fp) or os.path.getsize(fp) != entry["bytes"]:
            return False
    return True


def read_manifests(out_dir: str) -> List[Dict]:
    manifest_dir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(manifest_dir):
        return []
    out = []
    for name in sorted(os.listdir(manifest_dir)):
        if name.endswith(".json"):
            with open(os.path.join(manifest_dir, name)) as f:
                out.append(json.load(f))
    return out
