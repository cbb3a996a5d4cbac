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


_VERIFY_CACHE: dict = {}


def make_verify_jaccard(texts_ref):
    """Task-based candidate verification against a broadcast {doc_id: text}
    dict; texts and shingle sets memoized per worker process. At 100TB scale
    this becomes a co-partitioned join of candidate pairs against the docs
    table instead of a broadcast."""

    def verify(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_broadcast

        state = _VERIFY_CACHE.get(texts_ref.hex())
        if state is None:
            state = {"texts": get_broadcast(texts_ref), "shingles": {}}
            _VERIFY_CACHE[texts_ref.hex()] = state
        texts, shingles = state["texts"], state["shingles"]

        def sset(doc_id):
            s = shingles.get(doc_id)
            if s is None:
                s = _shingle_set(texts[doc_id])
                shingles[doc_id] = s
            return s

        a_ids, b_ids, sims = [], [], []
        for a, b in zip(
            batch.column("a").to_pylist(), batch.column("b").to_pylist()
        ):
            j = jaccard(sset(a), sset(b))
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

    return verify



# Below this many band rows the candidate generation runs on the driver with
# numpy group slicing (band tables are tiny relative to the corpus); above
# it, the distributed groupby(band).map_groups path runs.
PAIRGEN_DRIVER_MAX_ROWS = 5_000_000

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def _collect_table(ds) -> pa.Table:
    return pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    )


def _band_group_slices(band_col: np.ndarray):
    """Yield index slices of equal-band runs over a sorted band array."""
    order = np.argsort(band_col, kind="stable")
    sorted_bands = band_col[order]
    boundaries = np.nonzero(sorted_bands[1:] != sorted_bands[:-1])[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(sorted_bands)]])
    for s, e in zip(starts, ends):
        if e - s >= 2:
            yield order[s:e]


def _minhash_pairs_driver(tbl: pa.Table) -> pa.Table:
    bands = np.asarray(tbl.column("band").to_pandas())
    ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    out_a, out_b = [], []
    for idx in _band_group_slices(bands):
        gids = np.unique(ids[idx])
        if len(gids) < 2:
            continue
        ai, bi = np.triu_indices(len(gids), k=1)
        out_a.append(gids[ai])
        out_b.append(gids[bi])
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1])})


def _hamming_matrix(h_rows: np.ndarray, h_cols: np.ndarray) -> np.ndarray:
    """Pairwise hamming distances via byte-popcount LUT (uint64 inputs)."""
    x = h_rows[:, None] ^ h_cols[None, :]
    return _POPCNT[x.view(np.uint8).reshape(x.shape[0], x.shape[1], 8)].sum(2)


def _simhash_pairs_driver(tbl: pa.Table, max_hamming: int) -> pa.Table:
    bands = np.asarray(tbl.column("band").to_pandas())
    ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    hashes = np.asarray(tbl.column("simhash").to_pylist(),
                        dtype=np.int64).view(np.uint64)
    out = []
    for idx in _band_group_slices(bands):
        gids, first = np.unique(ids[idx], return_index=True)
        if len(gids) < 2:
            continue
        ghs = hashes[idx][first]
        # row-chunked to bound the pairwise matrix
        for s in range(0, len(gids), 1024):
            rows = slice(s, min(s + 1024, len(gids)))
            ham = _hamming_matrix(ghs[rows], ghs)
            ai, bi = np.nonzero(ham <= max_hamming)
            ai_g = ai + s
            keep = ai_g < bi  # upper triangle only
            if keep.any():
                out.append(np.stack(
                    [gids[ai_g[keep]], gids[bi[keep]],
                     ham[ai[keep], bi[keep]].astype(np.int64)], axis=1))
    if not out:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    cat = np.concatenate(out)
    # dedupe pairs surfaced by multiple bands (same hamming each time)
    _, first = np.unique(cat[:, :2], axis=0, return_index=True)
    cat = cat[np.sort(first)]
    return pa.table({"a": pa.array(cat[:, 0]), "b": pa.array(cat[:, 1]),
                     "hamming": pa.array(cat[:, 2])})


def _band_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one band bucket (sorted, a < b)."""
    ids = sorted(set(group["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
    return pd.DataFrame({"a": list(a), "b": list(b)})


def _dedupe_pairs_ds(ds):
    """Vectorized pair dedup: groupby-count then drop the count column —
    no per-group Python."""
    return ds.groupby(["a", "b"]).count().map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow"
    )


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

    band_ds = docs.map_batches(
        lambda b: minhash_bands_batch(b, num_perm, bands),
        batch_format="pyarrow",
    ).materialize()
    if band_ds.count() <= PAIRGEN_DRIVER_MAX_ROWS:
        candidates = rd.from_arrow(_minhash_pairs_driver(_collect_table(band_ds)))
    else:
        candidates = _dedupe_pairs_ds(
            band_ds.groupby("band").map_groups(_band_pairs,
                                               batch_format="pandas")
        )
    import pyarrow.compute as pc

    verified = candidates.map_batches(
        make_verify_jaccard(texts_ref), batch_format="pyarrow"
    )
    return verified.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("jaccard"), threshold)),
        batch_format="pyarrow",
    )


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
        if len(rows) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
                {"a": "int64", "b": "int64", "hamming": "int64"}
            )
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        hs = np.array([r[1] for r in rows], dtype=np.int64).view(np.uint64)
        # vectorized pairwise hamming: popcount via 8-bit LUT on xor bytes
        x = hs[:, None] ^ hs[None, :]
        ham = np.unpackbits(
            x.view(np.uint8).reshape(len(rows), len(rows), 8), axis=2
        ).sum(axis=2)
        ai, bi = np.nonzero(np.triu(ham <= max_hamming, k=1))
        return pd.DataFrame(
            {"a": ids[ai], "b": ids[bi],
             "hamming": ham[ai, bi].astype(np.int64)}
        )

    band_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow"
    ).materialize()
    if band_ds.count() <= PAIRGEN_DRIVER_MAX_ROWS:
        return rd.from_arrow(
            _simhash_pairs_driver(_collect_table(band_ds), max_hamming)
        )
    paired = band_ds.groupby("band").map_groups(pairs, batch_format="pandas")
    return paired.groupby(["a", "b"]).min("hamming").map_batches(
        lambda b: b.rename_columns(["a", "b", "hamming"]),
        batch_format="pyarrow",
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
