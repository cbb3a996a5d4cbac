"""Deduplication family over ``documents`` / ``embeddings``:

- exact (hash-partition + per-group first)
- MinHash + LSH banding (shingle → signature → band groupby → verify)
- SimHash (64-bit, banded hamming candidates)
- n-gram Jaccard verification (exact, on LSH candidates)
- embedding-cosine near-dup

Scale design: every candidate-generation step is a groupby on a BOUNDED key
(hash / band / bucket) fed by per-batch map work; no all-pairs pass ever runs
over raw rows. Pair verification happens inside the band group (map_groups),
and pairs are deduplicated by a final groupby on the (a, b) key.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import (
    hamming64,
    jaccard,
    minhash_bands,
    minhash_signature,
    simhash64,
    text_md5,
    word_shingles,
)

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 10


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str) -> "rd.Dataset":
    """First-wins exact dedup: min doc_id + dupe count per distinct text.
    The shuffle key is md5(text) — uniform, collision-safe, and the groups
    carry only (hash, doc_id), never the text bytes."""

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": pa.array(
                    [text_md5(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
                "doc_id": batch.column("doc_id"),
            }
        )

    def first_wins(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": [int(group["doc_id"].min())],
                "n_dupes": [int(len(group))],
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(key, batch_format="pyarrow")
        .groupby("h")
        .map_groups(first_wins, batch_format="pandas")
    )


def _shingle_set(text: str) -> set:
    return set(word_shingles(text.lower(), 3))


def minhash_bands_batch(batch: pa.Table, num_perm: int, bands: int) -> pa.Table:
    """(doc_id, text) → one row per (band_key, doc_id)."""
    band_keys: List[str] = []
    doc_ids: List[int] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sig = minhash_signature(word_shingles(text.lower(), 3), num_perm)
        for key in minhash_bands(sig, bands):
            band_keys.append(key)
            doc_ids.append(doc_id)
    return pa.table(
        {
            "band": pa.array(band_keys, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        }
    )


class _VerifyJaccard:
    """Actor stage: holds a broadcast {doc_id: text} dict for candidate
    verification. At 100TB scale this becomes a co-partitioned join of
    candidate pairs against the docs table instead of a broadcast."""

    def __init__(self, texts_ref):
        import ray

        self.texts = ray.get(texts_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids, b_ids, sims = [], [], []
        for a, b in zip(
            batch.column("a").to_pylist(), batch.column("b").to_pylist()
        ):
            j = jaccard(
                _shingle_set(self.texts[a]), _shingle_set(self.texts[b])
            )
            a_ids.append(a)
            b_ids.append(b)
            sims.append(round(j, 6))
        return pa.table(
            {
                "a": pa.array(a_ids, pa.int64()),
                "b": pa.array(b_ids, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )


def _band_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one band bucket (sorted, a < b)."""
    ids = sorted(set(group["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
    return pd.DataFrame({"a": list(a), "b": list(b)})


def _dedupe_pairs(group: pd.DataFrame) -> pd.DataFrame:
    return group.iloc[:1][["a", "b"]]


def minhash_dedup_pairs(
    sf_dir: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = DEFAULT_THRESHOLD,
) -> "rd.Dataset":
    """Near-duplicate pairs: minhash LSH banding for candidates, exact word
    3-gram Jaccard verification ≥ threshold."""
    import ray

    docs = _docs(sf_dir, ["doc_id", "text"])
    # broadcast doc texts for verification (small side at test scale)
    texts = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        texts.update(
            zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist())
        )
    texts_ref = ray.put(texts)

    candidates = (
        docs.map_batches(
            lambda b: minhash_bands_batch(b, num_perm, bands),
            batch_format="pyarrow",
        )
        .groupby("band")
        .map_groups(_band_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(_dedupe_pairs, batch_format="pandas")
    )
    verified = candidates.map_batches(
        _VerifyJaccard,
        batch_format="pyarrow",
        fn_constructor_kwargs={"texts_ref": texts_ref},
        concurrency=(1, 4),
    )
    return verified.filter(lambda row: row["jaccard"] >= threshold)


def simhash_docs(sf_dir: str) -> "rd.Dataset":
    """Per-doc 64-bit simhash over word tokens (stored as int64 bit-cast)."""

    def sh(batch: pa.Table) -> pa.Table:
        vals = [
            np.uint64(simhash64(text.lower().split())).astype(np.int64)
            for text in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array([int(v) for v in vals], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sh, batch_format="pyarrow"
    )


def simhash_dedup_pairs(
    sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING
) -> "rd.Dataset":
    """SimHash near-dup: band the 64-bit hash into 4×16-bit keys (any pair
    within hamming ≤ 16-bit-band collisions shares ≥1 band for hamming ≤ 3;
    wider radii trade recall), verify exact hamming distance."""

    def band_rows(batch: pa.Table) -> pa.Table:
        bands, ids, hashes = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            h = simhash64(text.lower().split())
            for i in range(4):
                bands.append(f"{i}:{(h >> (16 * i)) & 0xFFFF:04x}")
                ids.append(doc_id)
                hashes.append(np.uint64(h).astype(np.int64))
        return pa.table(
            {
                "band": pa.array(bands, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array([int(x) for x in hashes], pa.int64()),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(group["doc_id"], group["simhash"])))
        out_a, out_b, out_d = [], [], []
        for i, (a, ha) in enumerate(rows):
            for b, hb in rows[i + 1:]:
                d = hamming64(int(np.int64(ha).astype(np.uint64)),
                              int(np.int64(hb).astype(np.uint64)))
                if d <= max_hamming:
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_d}).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby("band")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.iloc[:1], batch_format="pandas")
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.40) -> "rd.Dataset":
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold).

    Test-scale implementation broadcasts the (normalized, float64) matrix and
    scans batches against it — one matmul per batch. The 100TB path replaces
    the broadcast with LSH bucketing (see ann.lsh_buckets)."""
    import pyarrow.parquet as pq
    import ray

    table = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(table.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ref = ray.put((ids, mat))

    class Scan:
        def __init__(self, ref):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            vecs = np.asarray(
                batch.column("embedding").to_pylist(), dtype=np.float64
            )
            n = np.linalg.norm(vecs, axis=1)
            n[n == 0] = 1.0
            vecs = vecs / n[:, None]
            sims = vecs @ self.mat.T
            rows_a, rows_b = np.nonzero(sims >= threshold)
            out_a, out_b = [], []
            for i, j in zip(rows_a, rows_b):
                a, b = int(vids[i]), int(self.ids[j])
                if a < b:
                    out_a.append(a)
                    out_b.append(b)
            return pa.table(
                {
                    "a": pa.array(out_a, pa.int64()),
                    "b": pa.array(out_b, pa.int64()),
                }
            )

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        Scan,
        batch_format="pyarrow",
        fn_constructor_kwargs={"ref": ref},
        concurrency=(1, 8),
    )
