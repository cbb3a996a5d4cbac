"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_topk``: exact brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (the baseline; SQL-oracled).
- ``ann_lsh``: random-hyperplane LSH bucketed variant — the scale path:
  candidates come from shared buckets only, so work per query is bounded by
  bucket size, not corpus size. Recall vs brute force is asserted in tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

DEFAULT_K = 5
DEFAULT_N_QUERIES = 8
LSH_PLANES = 12
LSH_SEED = 7


def _load_matrix(sf_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    table = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(table.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _query_matrix(sf_dir: str, n_queries: int) -> Tuple[np.ndarray, np.ndarray]:
    ids, mat = _load_matrix(sf_dir)
    mask = ids < n_queries
    return ids[mask], _normalize(mat[mask])


class _BruteForceTopK:
    """Actor stage: per batch, cosine of batch vectors vs the broadcast query
    matrix; emits the batch-local top-k candidates per query (combiner), so
    the final groupby only merges k rows per (query, batch)."""

    def __init__(self, query_ref, k: int):
        import ray

        self.qids, self.qmat = ray.get(query_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = _normalize(
            np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        )
        sims = self.qmat @ vecs.T  # (n_queries, batch)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            order = np.lexsort((vids, -row))  # cosine desc, vec_id asc
            taken = 0
            for j in order:
                if vids[j] == qid:
                    continue  # exclude self
                out_q.append(int(qid))
                out_n.append(int(vids[j]))
                out_c.append(float(row[j]))
                taken += 1
                if taken >= self.k:
                    break
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )


def _final_topk(k: int):
    def top(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)
        return g[["query_id", "neighbor_id"]]

    return top


def ann_topk(
    sf_dir: str, k: int = DEFAULT_K, n_queries: int = DEFAULT_N_QUERIES
) -> "rd.Dataset":
    """Exact top-k cosine neighbors for query vectors (vec_id < n_queries),
    excluding self. Output: (query_id, neighbor_id)."""
    import ray

    query_ref = ray.put(_query_matrix(sf_dir, n_queries))
    return (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(
            _BruteForceTopK,
            batch_format="pyarrow",
            fn_constructor_kwargs={"query_ref": query_ref, "k": k},
            concurrency=(1, 8),
        )
        .groupby("query_id")
        .map_groups(_final_topk(k), batch_format="pandas")
    )


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(LSH_SEED)
    return rng.normal(size=(LSH_PLANES, dim))


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)


def ann_lsh(
    sf_dir: str, k: int = DEFAULT_K, n_queries: int = DEFAULT_N_QUERIES
) -> "rd.Dataset":
    """LSH-bucketed ANN: corpus vectors shuffle once by hyperplane bucket;
    each query probes only its own bucket (multi-probe: exact bucket + 1-bit
    flips). Approximate — tests assert recall ≥ 0.6 vs brute force."""
    import ray

    qids, qmat = _query_matrix(sf_dir, n_queries)
    ids0, mat0 = _load_matrix(sf_dir)
    planes = _hyperplanes(mat0.shape[1])
    qbuckets = _bucket_of(qmat, planes)
    # multi-probe target bucket set per query
    probe: dict = {}
    for qid, qb in zip(qids, qbuckets):
        targets = {int(qb)} | {int(qb) ^ (1 << i) for i in range(LSH_PLANES)}
        for t in targets:
            probe.setdefault(t, []).append(int(qid))
    probe_ref = ray.put((probe, {int(q): v for q, v in zip(qids, qmat)}))

    def bucketize(batch: pa.Table) -> pa.Table:
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        buckets = _bucket_of(_normalize(vecs), planes)
        return batch.append_column(
            "bucket", pa.array([int(b) for b in buckets], pa.int64())
        )

    class Probe:
        def __init__(self, ref):
            self.probe, self.queries = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            vecs = _normalize(
                np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            )
            buckets = batch.column("bucket").to_pylist()
            out_q, out_n, out_c = [], [], []
            for i, bucket in enumerate(buckets):
                for qid in self.probe.get(bucket, ()):
                    if vids[i] == qid:
                        continue
                    c = float(self.queries[qid] @ vecs[i])
                    out_q.append(qid)
                    out_n.append(int(vids[i]))
                    out_c.append(c)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    return (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(bucketize, batch_format="pyarrow")
        .map_batches(
            Probe,
            batch_format="pyarrow",
            fn_constructor_kwargs={"ref": probe_ref},
            concurrency=(1, 8),
        )
        .groupby("query_id")
        .map_groups(
            lambda g: g.sort_values(["cosine", "neighbor_id"],
                                    ascending=[False, True]).head(k)
            .assign(cosine=lambda d: d["cosine"].round(6)),
            batch_format="pandas",
        )
    )
