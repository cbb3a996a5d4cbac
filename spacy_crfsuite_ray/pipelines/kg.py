"""The flagship KG-construction pipeline (SURVEY.md §3.4 lifecycle).

Two phases, checkpointed between them:

Phase 1 (per input shard, resumable): pages parquet → extract_text →
  lang filter → sentence explode → CRF tag (ACTOR POOL) → write
  ``entities/shard=N/`` parquet + manifest. The tag stage dominates cost, so
  its output is the checkpoint: on resume, shards with a valid manifest are
  skipped.

Phase 2 (global, cheap relative to phase 1): read entities → relation
  extraction → mention explosion → linking (pre-aggregated surfaces →
  minhash-band groupby shuffle → broadcast mapping) → canonical triples →
  nodes/edges with deterministic ids → partitioned parquet + manifests.

Scale notes: the only all-to-all exchanges are the (type, norm) surface
groupby (over UNIQUE surfaces, pre-aggregated in map_batches), the band-key
groupby (unique surfaces × 8 bands), and the node/edge dedup groupbys (over
already-deduplicated keys). Raw sentence/mention traffic never shuffles.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..stages.extract import explode_sentences, extract_text_batch, filter_lang
from ..stages.graph import (
    EDGE_SCHEMA,
    NODE_SCHEMA,
    edge_group_to_row,
    edge_key_batch,
    manifest_valid,
    node_group_to_row,
    write_manifest,
)
from ..stages.link import (
    ApplyCanonicalToTriples,
    explode_band_keys,
    flatten_chains,
    min_canonical_group,
    resolve_block_group,
    surface_counts_batch,
)
from ..stages.relations import mentions_batch, relations_batch
from ..stages.tag import CRFTagStage
from ..state.model import ensure_default_model
from ..functions.hashing import node_id as _node_id

TAG_BATCH_SIZE = 256
TAG_CONCURRENCY = None  # default: let Ray size the task pool


def _shard_groups(files: List[str], shards: int) -> List[List[str]]:
    shards = max(1, min(shards, len(files)))
    return [files[i::shards] for i in range(shards)]


def run_phase1(
    page_files: List[str],
    out_dir: str,
    shards: int = 1,
    model_path: Optional[str] = None,
    tag_concurrency=TAG_CONCURRENCY,
    lang: str = "en",
) -> Dict:
    """pages → tagged sentence entities, checkpointed per shard."""
    model_path = model_path or ensure_default_model()
    entities_dir = os.path.join(out_dir, "entities")
    os.makedirs(entities_dir, exist_ok=True)
    stats = {"shards_run": 0, "shards_skipped": 0}
    for shard_id, group in enumerate(_shard_groups(page_files, shards)):
        pid = f"{shard_id:05d}"
        if manifest_valid(entities_dir, pid):
            stats["shards_skipped"] += 1
            continue
        t0 = time.time()
        ds = rd.read_parquet(group, columns=["url", "html", "lang"])
        ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
        ds = ds.map_batches(
            lambda b: filter_lang(b, lang), batch_format="pyarrow"
        )
        ds = ds.map_batches(explode_sentences, batch_format="pyarrow")
        if tag_concurrency is None:
            # autoscaling actor pool sized to the cluster CPUs
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            tag_concurrency = (1, max(2, n_cpus))
        ds = ds.map_batches(
            CRFTagStage,
            batch_format="pyarrow",
            batch_size=TAG_BATCH_SIZE,
            fn_constructor_kwargs={"model_path": model_path},
            num_cpus=1,
            concurrency=tag_concurrency,
        )
        shard_dir = os.path.join(entities_dir, f"shard={pid}")
        import shutil

        shutil.rmtree(shard_dir, ignore_errors=True)  # stale partial output
        ds.write_parquet(shard_dir)
        rows = sum(
            pq.read_metadata(os.path.join(shard_dir, f)).num_rows
            for f in os.listdir(shard_dir)
            if f.endswith(".parquet")
        )
        write_manifest(
            entities_dir, pid, input_refs=group, rows_out=rows,
            wall_s=time.time() - t0,
        )
        stats["shards_run"] += 1
    stats["entities_dir"] = entities_dir
    return stats


def _entity_files(out_dir: str) -> List[str]:
    entities_dir = os.path.join(out_dir, "entities")
    files = []
    for shard in sorted(os.listdir(entities_dir)):
        if shard.startswith("shard="):
            d = os.path.join(entities_dir, shard)
            files.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return files


def build_canonical_mapping(mentions_ds: "rd.Dataset"):
    """mentions → {(type, norm): canonical} via the banded-LSH shuffle.
    Returns (mapping_dict, surface_counts_dataset)."""
    surf = (
        mentions_ds.map_batches(surface_counts_batch, batch_format="pyarrow")
        .groupby(["type", "norm"])
        .sum("cnt")
    )
    surf = surf.map_batches(
        lambda b: b.rename_columns(["type", "norm", "cnt"]),
        batch_format="pyarrow",
    ).materialize()
    mapping_df = (
        surf.map_batches(explode_band_keys, batch_format="pyarrow")
        .groupby(["type", "band"])
        .map_groups(resolve_block_group, batch_format="pandas")
        .groupby(["type", "norm"])
        .map_groups(min_canonical_group, batch_format="pandas")
        .to_pandas()
    )
    return flatten_chains(mapping_df), surf


def run_phase2(out_dir: str, force: bool = False) -> Dict:
    """entities → triples/mentions → linking → nodes/edges parquet.
    Idempotent: valid manifests short-circuit; otherwise stale output is
    wiped before writing (write_parquet appends by design)."""
    import shutil

    files = _entity_files(out_dir)
    dirs = {
        name: os.path.join(out_dir, name) for name in ("triples", "edges", "nodes")
    }
    if not force and all(manifest_valid(d, "all") for d in dirs.values()):
        return {
            "triples_dir": dirs["triples"],
            "edges_dir": dirs["edges"],
            "nodes_dir": dirs["nodes"],
            "n_unique_surfaces": None,
            "skipped": True,
        }
    for d in dirs.values():
        shutil.rmtree(os.path.join(d, "shard=all"), ignore_errors=True)
    t0 = time.time()

    ent_ds = rd.read_parquet(files)
    triples = ent_ds.map_batches(relations_batch, batch_format="pyarrow")
    mentions = ent_ds.map_batches(mentions_batch, batch_format="pyarrow")

    mapping, surf = build_canonical_mapping(mentions)
    mapping_ref = ray.put(mapping)

    canonical_triples = triples.map_batches(
        ApplyCanonicalToTriples,
        batch_format="pyarrow",
        fn_constructor_kwargs={"mapping_ref": mapping_ref},
        concurrency=(1, 8),
    )

    # --- write canonical triples (shard=all)
    triples_dir = os.path.join(out_dir, "triples")
    canonical_triples.write_parquet(os.path.join(triples_dir, "shard=all"))
    write_manifest(triples_dir, "all", input_refs=files,
                   rows_out=-1, wall_s=time.time() - t0)

    # --- edges: dedup by deterministic edge_id
    t1 = time.time()
    edges = (
        rd.read_parquet(
            os.path.join(triples_dir, "shard=all"),
            columns=["subj_id", "pred", "obj_id", "url", "confidence"],
        )
        .map_batches(edge_key_batch, batch_format="pyarrow")
        .groupby("edge_id")
        .map_groups(edge_group_to_row, batch_format="pandas")
    )
    edges_dir = os.path.join(out_dir, "edges")
    edges.write_parquet(os.path.join(edges_dir, "shard=all"))
    write_manifest(edges_dir, "all", input_refs=[triples_dir],
                   rows_out=-1, wall_s=time.time() - t1)

    # --- nodes: from unique surfaces + mapping (no second mention pass)
    t2 = time.time()

    def node_rows(batch: pa.Table) -> pa.Table:
        ids, canons, types, cnts = [], [], [], []
        for type_, norm, cnt in zip(
            batch.column("type").to_pylist(),
            batch.column("norm").to_pylist(),
            batch.column("cnt").to_pylist(),
        ):
            canon = mapping.get((type_, norm), norm)
            ids.append(_node_id(canon, type_))
            canons.append(canon)
            types.append(type_)
            cnts.append(cnt)
        return pa.table(
            {
                "node_id": pa.array(ids, pa.string()),
                "canonical": pa.array(canons, pa.string()),
                "type": pa.array(types, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    nodes = (
        surf.map_batches(node_rows, batch_format="pyarrow")
        .groupby("node_id")
        .map_groups(node_group_to_row, batch_format="pandas")
    )
    nodes_dir = os.path.join(out_dir, "nodes")
    nodes.write_parquet(os.path.join(nodes_dir, "shard=all"))
    write_manifest(nodes_dir, "all", input_refs=[os.path.join(out_dir, "entities")],
                   rows_out=-1, wall_s=time.time() - t2)

    return {
        "triples_dir": triples_dir,
        "edges_dir": edges_dir,
        "nodes_dir": nodes_dir,
        "n_unique_surfaces": surf.count(),
    }


def run_kg_pipeline(
    page_files: List[str],
    out_dir: str,
    shards: int = 1,
    model_path: Optional[str] = None,
    tag_concurrency=TAG_CONCURRENCY,
) -> Dict:
    s1 = run_phase1(page_files, out_dir, shards=shards, model_path=model_path,
                    tag_concurrency=tag_concurrency)
    s2 = run_phase2(out_dir)
    return {**s1, **s2}
