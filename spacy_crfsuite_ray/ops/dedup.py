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
import pyarrow.compute as pc

import ray.data as rd

from ..functions.tables import read_parquet_nometa

from ..functions.hashing import (
    _shingle_hashes,
    simhash64,
    text_md5,
    word_shingles,
)

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_THRESHOLD = 0.5
# Default simhash radius. Banding is DERIVED from the radius (pigeonhole:
# max_hamming + 1 blocks), so candidate recall is 1.0 at whatever radius is
# configured — the radius dials cost (block width = 64//(r+1) bits), not
# silent recall loss.
SIMHASH_MAX_HAMMING = 3


from ..functions.tables import read_documents as _docs


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

    from ray.data.aggregate import Count, Min

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("min(doc_id)"),
                "n_dupes": batch.column("count()"),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(key, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id"), Count())
        .map_batches(rename, batch_format="pyarrow")
    )


def _shingle_hash_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, sh) where ``sh`` is the doc's UNIQUE word
    3-gram sha1-64 hashes, sorted, serialized as uint64 little-endian bytes.
    Hashing once here feeds BOTH minhash banding and exact-Jaccard
    verification (Jaccard over 64-bit shingle hashes equals Jaccard over the
    shingles themselves up to a ~2^-64 collision)."""
    ids = batch.column("doc_id").to_pylist()
    out = []
    for text in batch.column("text").to_pylist():
        hv = _shingle_hashes(word_shingles(text.lower(), 3))
        hv.sort()
        out.append(hv.tobytes())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "sh": pa.array(out, pa.binary()),
        }
    )


def _jaccard_hashed(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique uint64 shingle-hash arrays
    (two-empty-sets convention matches ``jaccard``: 1.0)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


_VERIFY_CACHE: dict = {}
_BAND_PERM_CACHE: dict = {}


def make_verify_jaccard(sh_ref):
    """Small-corpus candidate verification against a broadcast
    {doc_id: shingle-hash bytes} dict (memoized per worker process). Only
    used below ``VERIFY_BROADCAST_MAX_DOCS``; above it the co-partitioned
    ``_verify_pairs_joined`` join path runs instead."""

    def verify(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_broadcast

        sh = _VERIFY_CACHE.get(sh_ref.hex())
        if sh is None:
            sh = get_broadcast(sh_ref)
            _VERIFY_CACHE[sh_ref.hex()] = sh

        a_ids, b_ids, sims = [], [], []
        for a, b in zip(
            batch.column("a").to_pylist(), batch.column("b").to_pylist()
        ):
            j = _jaccard_hashed(
                np.frombuffer(sh[a], dtype=np.uint64),
                np.frombuffer(sh[b], dtype=np.uint64),
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

    return verify


# Above this many docs, pair verification switches from a broadcast dict to
# the distributed hash-join path (candidates ⋈ shingle hashes, twice) — the
# broadcast grows with the corpus and must not ship to every worker at scale.
VERIFY_BROADCAST_MAX_DOCS = 2_000_000


def _verify_pairs_joined(candidates: "rd.Dataset", sh_ds: "rd.Dataset",
                         num_partitions: int | None = None):
    """100TB verification path: hash-join candidate pairs against the
    (doc_id, sh) shingle-hash table on each side, then compute exact Jaccard
    per row. Nothing corpus-sized ever lands on the driver or is broadcast;
    both joins are hash-partitioned shuffles on a single int key."""
    from ..functions.cluster import join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    j = candidates.join(
        sh_ds, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("doc_id",),
    )
    j = j.join(
        sh_ds, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("doc_id",),
        left_suffix="_a", right_suffix="_b",
    )

    def verify(batch: pa.Table) -> pa.Table:
        sims = [
            round(
                _jaccard_hashed(
                    np.frombuffer(x, dtype=np.uint64),
                    np.frombuffer(y, dtype=np.uint64),
                ),
                6,
            )
            for x, y in zip(
                batch.column("sh_a").to_pylist(),
                batch.column("sh_b").to_pylist(),
            )
        ]
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")



# Below this many band rows the candidate generation runs on the driver with
# numpy group slicing (band tables are tiny relative to the corpus); above
# it, the distributed groupby(band).map_groups path runs.
PAIRGEN_DRIVER_MAX_ROWS = 5_000_000

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


from ..functions.tables import collect_table as _collect_table


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
    3-gram Jaccard verification ≥ threshold.

    Shingles are sha1-64 hashed ONCE per doc (``_shingle_hash_rows``); the
    hashed table feeds both the band keys and verification, so the raw text
    never moves past the first map. Verification is a broadcast-dict probe
    below ``VERIFY_BROADCAST_MAX_DOCS`` and a candidates ⋈ shingles
    hash-join above it (tests force both and assert identical output)."""
    import ray

    sh_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _shingle_hash_rows, batch_format="pyarrow"
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        """Whole-batch minhash banding: ONE (perm-chunked) 2-D universal-hash
        + ``minimum.reduceat`` over the concatenated shingle hashes of every
        doc, then vectorized band-key mixing — no per-doc Python loop. Band
        keys are int64 mixes of each signature band (a ~2^-64 key collision
        only adds a candidate pair, which exact verification then filters, so
        cheap mixing is safe where a cryptographic hash is not needed)."""
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        shb_list = batch.column("sh").to_pylist()
        lens = np.array([len(b) >> 3 for b in shb_list], dtype=np.int64)
        n = len(ids)
        sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.nonzero(lens > 0)[0]
        if nonempty.size:
            hv = np.frombuffer(
                b"".join(shb_list[i] for i in nonempty), dtype=np.uint64
            )
            ne_lens = lens[nonempty]
            starts = np.concatenate(
                [[0], np.cumsum(ne_lens)[:-1]]
            ).astype(np.int64)
            from ..functions.hashing import _perm_params

            if num_perm not in _BAND_PERM_CACHE:
                _BAND_PERM_CACHE[num_perm] = _perm_params(num_perm)
            a, b_ = _BAND_PERM_CACHE[num_perm]
            with np.errstate(over="ignore"):
                for p0 in range(0, num_perm, 16):  # bound the temp matrix
                    p1 = min(p0 + 16, num_perm)
                    vals = a[p0:p1, None] * hv[None, :] + b_[p0:p1, None]
                    sig[nonempty, p0:p1] = np.minimum.reduceat(
                        vals, starts, axis=1
                    ).T
        # mix each band of the signature into one int64 key (vectorized)
        rows = num_perm // bands
        mix = np.uint64(0x9E3779B97F4A7C15)
        band_keys = np.empty((bands, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(bands):
                k = np.full(n, np.uint64(j * 2 + 1), dtype=np.uint64)
                for r in range(rows):
                    k = (k ^ sig[:, j * rows + r]) * mix
                band_keys[j] = k
        return pa.table(
            {
                "band": pa.array(
                    band_keys.reshape(-1).view(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
            }
        )

    band_ds = sh_ds.map_batches(band_rows, batch_format="pyarrow").materialize()
    if band_ds.count() <= PAIRGEN_DRIVER_MAX_ROWS:
        candidates = rd.from_arrow(_minhash_pairs_driver(_collect_table(band_ds)))
    else:
        candidates = _dedupe_pairs_ds(
            band_ds.groupby("band").map_groups(_band_pairs,
                                               batch_format="pandas")
        )

    n_docs = sh_ds.count()
    if n_docs <= VERIFY_BROADCAST_MAX_DOCS:
        sh_map: dict = {}
        for b in sh_ds.iter_batches(batch_format="pyarrow", batch_size=None):
            sh_map.update(
                zip(b.column("doc_id").to_pylist(), b.column("sh").to_pylist())
            )
        verified = candidates.map_batches(
            make_verify_jaccard(ray.put(sh_map)), batch_format="pyarrow"
        )
    else:
        from ..functions.cluster import join_partitions

        verified = _verify_pairs_joined(
            candidates, sh_ds, num_partitions=join_partitions(rows=n_docs)
        )

    import pyarrow.compute as pc

    return verified.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("jaccard"), threshold)),
        batch_format="pyarrow",
    )


_TOKEN_HASH_MEMO: dict = {}


def _simhash_batch(texts) -> np.ndarray:
    """Whole-batch 64-bit simhash (Charikar 2002): per-worker token-hash memo
    (vocabulary repeats heavily across batches), then ONE unpackbits +
    ``add.reduceat`` over the concatenated token hashes — no per-doc Python
    bit math. Bit-exact twin of ``functions.hashing.simhash64`` (tested)."""
    import hashlib
    import struct

    memo = _TOKEN_HASH_MEMO
    all_h: List[int] = []
    lens = []
    for text in texts:
        toks = text.lower().split()
        lens.append(len(toks))
        for t in toks:
            h = memo.get(t)
            if h is None:
                h = struct.unpack(
                    "<Q", hashlib.md5(t.encode("utf-8")).digest()[:8]
                )[0]
                if len(memo) < 2_000_000:  # bounded per-worker cache
                    memo[t] = h
            all_h.append(h)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.asarray(lens, dtype=np.int64)
    nonempty = np.nonzero(lens > 0)[0]
    if nonempty.size:
        hv = np.asarray(all_h, dtype=np.uint64)
        # little-endian byte view matches struct.pack("<Q") in simhash64
        bits = np.unpackbits(hv.view(np.uint8).reshape(-1, 8), axis=1)
        signed = bits.astype(np.int32) * 2 - 1
        starts = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
        acc = np.add.reduceat(signed, starts, axis=0)
        packed = np.packbits((acc > 0).astype(np.uint8), axis=1)
        out[nonempty] = packed.view(">u8").reshape(-1)
    return out


def simhash_docs(sf_dir: str) -> "rd.Dataset":
    """Per-doc 64-bit simhash over word tokens (stored as int64 bit-cast)."""

    def sh(batch: pa.Table) -> pa.Table:
        vals = _simhash_batch(batch.column("text").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(vals.view(np.int64), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sh, batch_format="pyarrow"
    )


def _simhash_band_layout(max_hamming: int):
    """Pigeonhole banding: ``max_hamming + 1`` contiguous blocks over the 64
    bits (widths as equal as possible). Any pair within hamming distance
    ``max_hamming`` differs in at most ``max_hamming`` blocks, so it SHARES
    at least one identical block — candidate recall is guaranteed 1.0 at the
    configured radius (verified against exact all-pairs hamming in tests).
    The cost dial: block width = 64 // (r+1); bucket sizes grow ~2^-width x
    corpus, so wide radii trade shuffle-group size for recall — pick the
    radius you actually need."""
    b = min(max_hamming + 1, 64)
    base, extra = divmod(64, b)
    widths = [base + 1] * extra + [base] * (b - extra)
    offsets = np.cumsum([0] + widths[:-1]).astype(np.uint64)
    return offsets, np.asarray(widths, dtype=np.uint64)


def _simhash_band_keys(hashes: np.ndarray, max_hamming: int) -> np.ndarray:
    """(n,) uint64 simhashes → (bands, n) int64 band keys (vectorized mix of
    block value + block index; a ~2^-64 key collision only adds a candidate
    pair, which exact hamming verification then drops)."""
    offsets, widths = _simhash_band_layout(max_hamming)
    mix = np.uint64(0x9E3779B97F4A7C15)
    keys = np.empty((len(offsets), len(hashes)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j, (off, w) in enumerate(zip(offsets, widths)):
            mask = (np.uint64(1) << w) - np.uint64(1) if w < 64 else np.uint64(~np.uint64(0))
            val = (hashes >> off) & mask
            keys[j] = ((val + np.uint64(2 * j + 1)) * mix) ^ np.uint64(j)
    return keys.view(np.int64)


def simhash_dedup_pairs(
    sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING
) -> "rd.Dataset":
    """SimHash near-dup: pigeonhole banding into ``max_hamming + 1`` blocks
    (candidate recall 1.0 at the configured radius by construction — see
    ``_simhash_band_layout``), exact hamming verification inside each band
    group, pair dedup by (a, b) groupby."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        hashes = _simhash_batch(batch.column("text").to_pylist())
        keys = _simhash_band_keys(hashes, max_hamming)
        n_bands = keys.shape[0]
        return pa.table(
            {
                "band": pa.array(keys.reshape(-1), pa.int64()),
                "doc_id": pa.array(np.tile(ids, n_bands), pa.int64()),
                "simhash": pa.array(
                    np.tile(hashes.view(np.int64), n_bands), pa.int64()
                ),
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


# Above this many embedding rows the all-pairs broadcast scan (exact, used
# as the oracle twin) hands over to the hyperplane-LSH bucketed path.
EMB_ALLPAIRS_MAX_ROWS = 1_000_000
EMB_LSH_TABLES = 16
EMB_LSH_SEED = 11


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.40) -> "rd.Dataset":
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold).

    Below ``EMB_ALLPAIRS_MAX_ROWS``: exact — broadcast the (normalized,
    float64) matrix and scan batches against it, one matmul per batch
    (matches the quadratic SQL oracle bit-for-bit). Above: the bucketed
    ``embedding_dup_pairs_lsh`` path — per-pair work bounded by bucket size,
    nothing corpus-sized broadcast or driver-held; exact cosine verification
    inside buckets keeps precision 1.0, recall is the banding dial
    (tests measure it against the exact path)."""
    import pyarrow.parquet as pq

    if pq.read_metadata(
        f"{sf_dir}/embeddings.parquet"
    ).num_rows > EMB_ALLPAIRS_MAX_ROWS:
        return embedding_dup_pairs_lsh(sf_dir, threshold)
    return _embedding_dup_pairs_exact(sf_dir, threshold)


def _embedding_dup_pairs_exact(sf_dir: str, threshold: float) -> "rd.Dataset":
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

    return read_parquet_nometa(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        Scan,
        batch_format="pyarrow",
        fn_constructor_kwargs={"ref": ref},
        concurrency=(1, 8),
    )


def _emb_n_planes(n_rows: int) -> int:
    """Few planes + many tables: dup thresholds are LOW-cosine (≈0.4), where
    per-plane collision probability is only ~0.65, so recall comes from table
    count, not plane count. Bucket size targets ~512 vectors."""
    return max(2, int(np.log2(max(4.0, n_rows / 512.0))))


# Above this many embedding rows the LSH path stops shipping vectors through
# the bucket shuffle (which replicates each vector once per table — ~n_tables
# x corpus embedding volume): buckets then move only (bk, vec_id) int pairs,
# and verification is a candidates ⋈ vectors double hash-join (vectors cross
# the wire exactly twice, independent of table count) — the same pattern as
# the minhash ``_verify_pairs_joined`` path. Tradeoff: candidate PAIR rows
# (16 B) replace in-bucket vector copies (8·dim B per table), so the join
# path wins whenever pairs-per-bucket < dim·n_tables/4 — true at the ~512
# bucket-size target for dim ≥ 64.
EMB_LSH_SHUFFLE_VECTORS_MAX_ROWS = 2_000_000


def _emb_lsh_tables(sf_dir: str, n_tables: int, n_planes: int | None):
    import pyarrow.parquet as pq

    path = f"{sf_dir}/embeddings.parquet"
    n_rows = pq.read_metadata(path).num_rows
    if n_planes is None:
        n_planes = _emb_n_planes(n_rows)
    pf = pq.ParquetFile(path)
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first.column(0)[0])
    rng = np.random.RandomState(EMB_LSH_SEED)
    tables = rng.normal(size=(n_tables, n_planes, dim))  # tiny; ships in fn
    return path, n_rows, n_planes, tables


def _bucket_keys(vecs: np.ndarray, tables: np.ndarray,
                 n_planes: int) -> np.ndarray:
    """(n_tables, n) int64 bucket keys for normalized vectors."""
    powers = 1 << np.arange(n_planes)
    keys = np.empty((len(tables), len(vecs)), dtype=np.int64)
    for ti in range(len(tables)):
        bits = (vecs @ tables[ti].T) > 0
        keys[ti] = ti * (1 << n_planes) + (bits * powers).sum(axis=1)
    return keys


def embedding_dup_pairs_lsh(
    sf_dir: str,
    threshold: float = 0.40,
    n_tables: int = EMB_LSH_TABLES,
    n_planes: int | None = None,
) -> "rd.Dataset":
    """Hyperplane-LSH bucketed embedding near-dup: each vector lands in ONE
    bucket per table (map_batches), candidate pairs form only inside a
    bucket (bounded groupby groups), cosine is verified exactly, and a final
    (a, b) groupby dedupes pairs found by multiple tables.

    Recall for a pair at cosine c is 1-(1-p^b)^T with p = 1 - arccos(c)/pi;
    at the 0.4 defaults (b from ``_emb_n_planes``, T=16) that is ≥0.95 for
    test-scale bucket counts — measured against the exact path in tests.
    Below ``EMB_LSH_SHUFFLE_VECTORS_MAX_ROWS`` verification happens inside
    the bucket (vectors ride the bucket shuffle); above it the joined path
    runs (identical output, tested)."""
    path, n_rows, n_planes, tables = _emb_lsh_tables(sf_dir, n_tables,
                                                     n_planes)
    if n_rows > EMB_LSH_SHUFFLE_VECTORS_MAX_ROWS:
        return _embedding_lsh_pairs_joined(
            path, threshold, tables, n_planes
        )

    def bucket_rows(batch: pa.Table) -> pa.Table:
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = _normalize_rows(
            np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        )
        keys = _bucket_keys(vecs, tables, n_planes)
        return pa.table(
            {
                "bk": pa.array(keys.reshape(-1), pa.int64()),
                "vec_id": pa.array(np.tile(vids, len(tables)), pa.int64()),
                "v": pa.array(
                    np.tile(vecs, (len(tables), 1)).tolist(),
                    pa.list_(pa.float64()),
                ),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(
                {"a": "int64", "b": "int64"}
            )
        ids = group["vec_id"].to_numpy()
        mat = np.stack(group["v"].to_numpy())
        sims = mat @ mat.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[ai], ids[bi])
        b = np.maximum(ids[ai], ids[bi])
        return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})

    bucketed = (
        read_parquet_nometa(path, columns=["vec_id", "embedding"])
        .map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return _dedupe_pairs_ds(bucketed)


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _embedding_lsh_pairs_joined(
    path: str, threshold: float, tables: np.ndarray, n_planes: int
) -> "rd.Dataset":
    """At-scale LSH verification: buckets shuffle only (bk, vec_id); the
    deduped candidate pairs hash-join the normalized-vector table on each
    side (vectors serialized as float64 bytes — Acero joins reject list
    columns), then exact cosine filters. Identical pairs to the in-bucket
    path by construction (same buckets, same exact verification) — asserted
    in tests."""
    from ..functions.cluster import join_partitions

    def vec_rows(batch: pa.Table) -> pa.Table:
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = _normalize_rows(
            np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        )
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "vb": pa.array([v.tobytes() for v in vecs], pa.binary()),
            }
        )

    def bucket_ids(batch: pa.Table) -> pa.Table:
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = _normalize_rows(
            np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        )
        keys = _bucket_keys(vecs, tables, n_planes)
        return pa.table(
            {
                "bk": pa.array(keys.reshape(-1), pa.int64()),
                "vec_id": pa.array(np.tile(vids, len(tables)), pa.int64()),
            }
        )

    def bucket_id_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(
                {"a": "int64", "b": "int64"}
            )
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi]})

    import pyarrow.parquet as pq

    src = read_parquet_nometa(path, columns=["vec_id", "embedding"])
    vec_ds = src.map_batches(vec_rows, batch_format="pyarrow").materialize()
    # NO dedupe before the join: a pair found by k tables rides the join k
    # times (bounded by n_tables — linear work), because a pre-join
    # (a, b)-groupby would pay Ray's per-GROUP cost on every FALSE candidate
    # (measured: ~0.5 ms/group — 300 s for 500k candidate groups at fixture
    # scale). Dedup happens after verification, when only true pairs remain.
    cand = (
        src.map_batches(bucket_ids, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(bucket_id_pairs, batch_format="pandas")
    )
    # row-bounded partition count: join aggregator ACTORS must never exceed
    # cluster CPUs (they hang unschedulable) nor dominate small joins
    parts = join_partitions(rows=pq.read_metadata(path).num_rows)
    j = cand.join(vec_ds, join_type="inner", num_partitions=parts,
                  on=("a",), right_on=("vec_id",))
    j = j.join(vec_ds, join_type="inner", num_partitions=parts,
               on=("b",), right_on=("vec_id",),
               left_suffix="_a", right_suffix="_b")

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        va = np.frombuffer(
            b"".join(batch.column("vb_a").to_pylist()), dtype=np.float64
        ).reshape(batch.num_rows, -1)
        vb = np.frombuffer(
            b"".join(batch.column("vb_b").to_pylist()), dtype=np.float64
        ).reshape(batch.num_rows, -1)
        keep = np.einsum("ij,ij->i", va, vb) >= threshold
        return pa.table(
            {
                "a": pa.array(
                    np.asarray(batch.column("a"), dtype=np.int64)[keep]
                ),
                "b": pa.array(
                    np.asarray(batch.column("b"), dtype=np.int64)[keep]
                ),
            }
        )

    return _dedupe_pairs_ds(j.map_batches(verify, batch_format="pyarrow"))

# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted index — the SQL-oracled exact twin of
# the minhash family; reference scope: spacy_crfsuite has no dedup at all,
# this family is the LLM-corpus extension the brief requires)

# Exploded (shingle, doc) rows under this many DOCUMENTS run the driver
# inverted index (pyarrow group_by + numpy); above it the distributed
# self-join path runs (identical output, equality-tested like every other
# threshold-gated twin in this module).
NGRAM_JACCARD_DRIVER_MAX_DOCS = 200_000
# Stop-shingle cap: shingles appearing in MORE than this many docs are
# excluded from the intersection count (co becomes a lower bound, so the op
# drops pairs whose similarity rides only on corpus-stopword shingles).
# Set-size denominators always count ALL unique shingles per doc. The SQL
# oracle applies the identical cap, so parity holds at any setting.
NGRAM_JACCARD_MAX_DF = 10_000


def _ngram_explode(k: int):
    """docs → one row per (sh, doc_id, sz): the doc's UNIQUE word-k-gram
    shingles (strings — they ARE the group key the SQL oracle must agree
    on; the minhash path is the hashed-key production variant) plus the
    per-doc unique-shingle count. Vectorized end to end (Arrow RE2 split
    + offset window joins + one per-batch group_by dedupe) — the scalar
    twin ``word_shingles`` defines the semantics."""
    from ..functions.shingles import shingle_set_rows

    out_schema = pa.schema(
        [("sh", pa.string()), ("doc_id", pa.int64()), ("sz", pa.int64())]
    )

    def explode(batch: pa.Table) -> pa.Table:
        sh, d, sz = shingle_set_rows(batch.column("text"), k)
        if len(sh) == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "sh": sh,
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64())
                .take(pa.array(d, pa.int64())),
                "sz": pa.array(sz, pa.int64()),
            }
        )

    return explode


def _jac_c6_table(a, b, co, sz_a, sz_b, threshold: float) -> pa.Table:
    """(a, b, jac_c6) rows for pairs with Jaccard ≥ threshold. Both engines
    compute co / (sz_a + sz_b - co) as IEEE doubles from identical int64s,
    so the floor(x*1e6 + 0.5) scaling matches the oracle bit for bit."""
    jac = co.astype(np.float64) / (sz_a + sz_b - co).astype(np.float64)
    keep = jac >= threshold
    return pa.table(
        {
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "jac_c6": pa.array(
                np.floor(jac[keep] * 1_000_000.0 + 0.5).astype(np.int64)
            ),
        }
    )


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
    k: int = 3,
    max_df: int = NGRAM_JACCARD_MAX_DF,
) -> pa.Table:
    """EXACT word-k-gram Jaccard near-dup pairs via a distributed inverted
    index: explode unique shingles per doc, drop df-1 shingles (they cannot
    co-occur) and stop-shingles (df > max_df), self-join on the shingle to
    count intersections, then Jaccard from the carried set sizes — no
    all-pairs pass ever runs; per-shingle work is bounded by max_df².

    This is the oracle-checkable exact twin of ``minhash_dedup_pairs``
    (which approximates candidate generation but verifies with the same
    hashed-Jaccard); a user tunes cost with max_df instead of bands."""
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ex = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _ngram_explode(k), batch_format="pyarrow"
    )
    return _ngram_pairs_from_exploded(ex, threshold, max_df, n_docs)


def _ngram_pairs_from_exploded(ex, threshold: float, max_df: int,
                               n_docs: int) -> pa.Table:
    """Threshold-gated pair generation over an already-exploded (sh,
    doc_id, sz) stream — shared by ``ngram_jaccard_pairs`` (whole corpus)
    and ``training_set`` (quality-gated subset)."""
    if n_docs > NGRAM_JACCARD_DRIVER_MAX_DOCS:
        return _ngram_jaccard_joined(ex, threshold, max_df, n_docs)

    tbl = _collect_table(
        ex,
        empty_schema=pa.schema(
            [("sh", pa.string()), ("doc_id", pa.int64()),
             ("sz", pa.int64())]
        ),
    )
    if tbl.num_rows == 0:
        return _jac_c6_table(*(np.array([], dtype=np.int64),) * 5, threshold)
    import pyarrow.compute as pc

    sh_arr = tbl.column("sh")
    if isinstance(sh_arr, pa.ChunkedArray):
        sh_arr = (sh_arr.chunk(0) if sh_arr.num_chunks == 1
                  else pa.concat_arrays(sh_arr.chunks))
    enc = pc.dictionary_encode(sh_arr)
    codes = np.asarray(enc.indices, dtype=np.int64)
    ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
    szs = np.asarray(tbl.column("sz"), dtype=np.int64)
    df = np.bincount(codes)
    ok = (df[codes] >= 2) & (df[codes] <= max_df)
    codes, ids, szs = codes[ok], ids[ok], szs[ok]
    order = np.argsort(codes, kind="stable")
    codes, ids, szs = codes[order], ids[order], szs[order]
    bounds = np.concatenate(
        [[0], np.nonzero(np.diff(codes))[0] + 1, [len(codes)]]
    )
    co: dict = {}
    sz_of: dict = {}
    for s, e in zip(bounds[:-1], bounds[1:]):
        g_ids, g_szs = ids[s:e], szs[s:e]
        o = np.argsort(g_ids)
        g_ids, g_szs = g_ids[o], g_szs[o]
        sz_of.update(zip(g_ids.tolist(), g_szs.tolist()))
        ai, bi = np.triu_indices(len(g_ids), k=1)
        for x, y in zip(g_ids[ai].tolist(), g_ids[bi].tolist()):
            co[(x, y)] = co.get((x, y), 0) + 1
    if not co:
        return _jac_c6_table(*(np.array([], dtype=np.int64),) * 5, threshold)
    pairs = np.array(list(co.keys()), dtype=np.int64)
    return _jac_c6_table(
        pairs[:, 0], pairs[:, 1],
        np.array(list(co.values()), dtype=np.int64),
        np.array([sz_of[x] for x in pairs[:, 0].tolist()], dtype=np.int64),
        np.array([sz_of[x] for x in pairs[:, 1].tolist()], dtype=np.int64),
        threshold,
    )


def _ngram_jaccard_joined(ex, threshold: float, max_df: int, n_docs: int):
    """At-scale path: df filter as a semi-join against the in-range shingle
    set, intersection counts as a self-join on the shingle + vectorized
    (a, b) groupby-aggregate, sizes carried in the exploded rows (no second
    join). Byte-identical to the driver path by test."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    from ..functions.cluster import join_partitions

    ex = ex.materialize()
    parts = join_partitions(rows=n_docs * 32)

    def df_filter(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("count()"), 2),
            pc.less_equal(b.column("count()"), max_df),
        )
        return b.filter(keep).select(["sh"])

    df_ok = ex.groupby("sh").count().map_batches(
        df_filter, batch_format="pyarrow"
    )
    ex_ok = ex.join(df_ok, join_type="inner", num_partitions=parts,
                    on=("sh",)).materialize()
    j = ex_ok.join(ex_ok, join_type="inner", num_partitions=parts,
                   on=("sh",), left_suffix="_a", right_suffix="_b")

    def ordered(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("doc_id_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_id_b"), dtype=np.int64)
        keep = a < b
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "sz_a": pa.array(
                    np.asarray(batch.column("sz_a"), dtype=np.int64)[keep]
                ),
                "sz_b": pa.array(
                    np.asarray(batch.column("sz_b"), dtype=np.int64)[keep]
                ),
            }
        )

    agg = (
        j.map_batches(ordered, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(), Max("sz_a"), Max("sz_b"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _jac_c6_table(
                *(np.array([], dtype=np.int64),) * 5, threshold
            )
        return _jac_c6_table(
            np.asarray(batch.column("a"), dtype=np.int64),
            np.asarray(batch.column("b"), dtype=np.int64),
            np.asarray(batch.column("count()"), dtype=np.int64),
            np.asarray(batch.column("max(sz_a)"), dtype=np.int64),
            np.asarray(batch.column("max(sz_b)"), dtype=np.int64),
            threshold,
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return _collect_table(
        out,
        empty_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("jac_c6", pa.int64())]
        ),
    )


# -------------------------------------------------- in-band recall reporting

# Doc count up to which minhash_dedup_pairs_checked computes its exact
# hashed-Jaccard twin in-band (inverted index over the same sha1-64 shingle
# hashes — identical semantics to the verify step) and stamps the measured
# banding recall into every result row. 2000 keeps the sf0.01 driver check
# exact while the sf0.1 bench corpus (5000 docs) skips the twin (-1).
MINHASH_RECALL_MAX_DOCS = 2_000


def _exact_hashed_jaccard_pairs(sf_dir: str, threshold: float) -> set:
    """ALL pairs with hashed-Jaccard >= threshold, via a driver inverted
    index over the shingle hashes (df>=2 co-occurrence counts + carried set
    sizes — no quadratic doc loop)."""
    sh_tbl = pa.concat_tables(
        list(
            _docs(sf_dir, ["doc_id", "text"])
            .map_batches(_shingle_hash_rows, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    ids = np.asarray(sh_tbl.column("doc_id"), dtype=np.int64)
    blobs = sh_tbl.column("sh").to_pylist()
    sizes = {int(i): len(b) >> 3 for i, b in zip(ids, blobs)}
    all_h = np.frombuffer(b"".join(blobs), dtype=np.uint64)
    owner = np.repeat(ids, [len(b) >> 3 for b in blobs])
    _, inv, cnt = np.unique(all_h, return_inverse=True, return_counts=True)
    keep = cnt[inv] >= 2
    inv, owner = inv[keep], owner[keep]
    order = np.argsort(inv, kind="stable")
    inv, owner = inv[order], owner[order]
    bounds = np.concatenate(
        [[0], np.nonzero(np.diff(inv))[0] + 1, [len(inv)]]
    ) if len(inv) else np.array([0])
    co: dict = {}
    for s, e in zip(bounds[:-1], bounds[1:]):
        g = np.sort(owner[s:e])
        ai, bi = np.triu_indices(len(g), k=1)
        for x, y in zip(g[ai].tolist(), g[bi].tolist()):
            if x != y:
                co[(x, y)] = co.get((x, y), 0) + 1
    exact = set()
    for (x, y), c in co.items():
        union = sizes[x] + sizes[y] - c
        if union > 0 and c / union >= threshold:
            exact.add((x, y))
    return exact


def minhash_dedup_pairs_checked(
    sf_dir: str, threshold: float = DEFAULT_THRESHOLD
) -> pa.Table:
    """minhash_dedup_pairs + in-band banding recall vs the exact twin
    (recall_c6 = floor(recall*1e6+0.5); -1 above the gate). Precision is
    1.0 by construction (candidates are exactly verified), so recall is the
    only approximate axis — stamping it makes the driver record show how
    much the banding missed, not just that the query ran."""
    import pyarrow.parquet as pq

    got_tbl = _collect_table(
        minhash_dedup_pairs(sf_dir, threshold=threshold),
        empty_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("jaccard", pa.float64())]
        ),
    )
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_docs <= MINHASH_RECALL_MAX_DOCS:
        exact = _exact_hashed_jaccard_pairs(sf_dir, threshold)
        got = set(zip(got_tbl.column("a").to_pylist(),
                      got_tbl.column("b").to_pylist()))
        recall = len(exact & got) / max(1, len(exact))
        c6 = int(np.floor(recall * 1_000_000.0 + 0.5))
    else:
        c6 = -1
    return got_tbl.append_column(
        "recall_c6", pa.array([c6] * got_tbl.num_rows, pa.int64())
    )


# ------------------------------------------------------------- chunk dedup

CHUNK_WORDS = 8


def _chunk_text_rows(batch: pa.Table, k: int):
    """Shared chunk-explode core: each document's consecutive full k-word
    chunks as (doc_row_indices, within-doc chunk indices, chunk texts).
    Pure list-offset arithmetic (split once, gather, one binary_join) — no
    per-word Python. Split is on a literal single space to mirror SQL
    string_split(text, ' ') byte-for-byte (boundary empties and all).
    Returns None when the batch yields no full chunk."""
    lst = pc.split_pattern(batch.column("text"), " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
    flat = lst.flatten()
    m = counts // k                      # full chunks per doc
    total = int(m.sum()) * k
    if total == 0:
        return None
    offs = np.concatenate([[0], np.cumsum(counts)])
    base = np.repeat(offs[:-1], m * k)
    within = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(m * k)])[:-1], m * k
    )
    taken = flat.take(pa.array(base + within, pa.int64()))
    chunks = pa.ListArray.from_arrays(
        pa.array(np.arange(0, total + 1, k, dtype=np.int32), pa.int32()),
        taken,
    )
    chunk_text = pc.binary_join(chunks, " ")
    doc_of = np.repeat(np.arange(len(counts)), m)
    cidx = np.arange(int(m.sum())) - np.repeat(
        np.concatenate([[0], np.cumsum(m)])[:-1], m
    )
    return doc_of, cidx, chunk_text


def _chunk_key_rows(batch: pa.Table, k: int = CHUNK_WORDS) -> pa.Table:
    """(md5(chunk), doc_id) rows over _chunk_text_rows — the shuffle
    carries a 32-hex key + int64, never the chunk text."""
    rows = _chunk_text_rows(batch, k)
    if rows is None:
        return pa.table({"h": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())})
    doc_of, _, chunk_text = rows
    return pa.table(
        {
            "h": pa.array(
                [text_md5(t) for t in chunk_text.to_pylist()], pa.string()
            ),
            "doc_id": pc.cast(
                batch.column("doc_id").take(pa.array(doc_of, pa.int64())),
                pa.int64(),
            ),
        }
    )


def chunk_documents(sf_dir: str, k: int = CHUNK_WORDS) -> "rd.Dataset":
    """Training-chunk EXPORT (the transform chunk_dup_stats only measures):
    explode every document into its consecutive full k-word chunks as
    (doc_id, chunk_idx, text) rows — the one-to-many prep step that turns a
    cleaned corpus into fixed-size training units. Batch-local flat
    expansion, zero shuffle; shares _chunk_text_rows with chunk_dup_stats
    so the chunk semantics (and the SQL oracle's (ord-1)//k grouping)
    cannot drift between the stats and the export."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = _chunk_text_rows(batch, k)
        if rows is None:
            return pa.schema(
                [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
                 ("text", pa.string())]
            ).empty_table()
        doc_of, cidx, chunk_text = rows
        return pa.table(
            {
                "doc_id": pc.cast(
                    batch.column("doc_id").take(
                        pa.array(doc_of, pa.int64())
                    ),
                    pa.int64(),
                ),
                "chunk_idx": pa.array(cidx, pa.int64()),
                "text": chunk_text,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )


def chunk_dup_stats(sf_dir: str, k: int = CHUNK_WORDS) -> "rd.Dataset":
    """Sub-document exact dedup (C4/RefinedWeb paragraph-dedup shape, over
    word chunks since this corpus is single-line): per document, how many of
    its consecutive k-word chunks occur >= 2 times ANYWHERE in the corpus
    (including within the same document).

    100 TB shape: documents explode to (md5(chunk), doc_id) rows; one
    groupby counts each chunk's corpus frequency; a hash-join ships those
    counts back to the chunk instances (nothing is broadcast and no text is
    shuffled); a combiner-first groupby folds per-doc totals. Docs with no
    full chunk drop out (mirrored by the oracle)."""
    from ..functions.cluster import join_partitions

    chunks = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _chunk_key_rows(b, k), batch_format="pyarrow"
    )
    counts = chunks.groupby("h").count()
    # ~8 full chunks per document on this corpus shape: a footer-metadata
    # row estimate keeps the join from spinning up per-CPU aggregator
    # actors for fixture-scale inputs (actor startup dominates there)
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    num_partitions = join_partitions(rows=n_docs * 8)
    j = chunks.join(
        counts, join_type="inner", num_partitions=num_partitions, on=("h",),
    )

    def fold(batch: pa.Table) -> pa.Table:
        dup = pc.cast(
            pc.greater_equal(batch.column("count()"), 2), pa.int64()
        )
        t = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "dup": dup,
            }
        )
        return t.group_by("doc_id").aggregate(
            [("one", "sum"), ("dup", "sum")]
        ).rename_columns(["doc_id", "one", "dup"])

    from ..functions.tables import stable_rename

    return (
        j.map_batches(fold, batch_format="pyarrow")
        .groupby("doc_id")
        .sum(["one", "dup"])
        .map_batches(
            stable_rename(["doc_id", "n_chunks", "n_dup_chunks"],
                          [pa.int64(), pa.int64(), pa.int64()]),
            batch_format="pyarrow",
        )
    )


# --------------------------------------------- dup clusters (connected comp.)

# Below this many dup pairs the components run as a driver union-find (the
# pair set is the SPARSE output of near-dup detection — even a 100 TB corpus
# with a 1% dup rate yields pairs that fit one node by orders of magnitude);
# above it the distributed min-label-propagation twin runs.
DUP_CLUSTERS_DRIVER_MAX_PAIRS = 1_000_000

# Propagation rounds are bounded by the largest component's diameter. Dup
# clusters are near-cliques (every member pairs with most others), so the
# diameter is tiny; 64 rounds is a generous ceiling that still guarantees
# termination on adversarial chain-shaped inputs.
DUP_CLUSTERS_MAX_ITER = 64


def _clusters_driver(pairs: pa.Table) -> pa.Table:
    """Union-find with path halving over the (a, b) pair list; cluster_id is
    the MIN doc_id of the component (stable, order-independent)."""
    a = np.asarray(pairs.column("a"), dtype=np.int64)
    b = np.asarray(pairs.column("b"), dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(idx[x]), find(idx[y])
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    cluster = nodes[roots]          # min doc_id: union always keeps the
    sizes = {}                      # smaller root, and nodes[] is sorted
    for c in cluster.tolist():
        sizes[c] = sizes.get(c, 0) + 1
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "cluster_size": pa.array(
                [sizes[int(c)] for c in cluster], pa.int64()
            ),
        }
    )


def _clusters_propagate(pairs: pa.Table) -> pa.Table:
    """Distributed min-label propagation: labels start as each node's own
    id; each round every node takes the min of its label and its
    neighbors' labels (edges ⋈ labels hash-join + groupby-Min) until the
    global label sum stops falling (the sum is monotone non-increasing, so
    one int64 per round is the only driver traffic). Rounds are bounded by
    the component diameter — near-clique dup clusters converge in 2-3."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..functions.cluster import join_partitions
    from ..functions.tables import stable_rename

    a = pairs.column("a")
    b = pairs.column("b")
    edges_tbl = pa.table(
        {
            "node": pa.concat_arrays(
                [pc.cast(c, pa.int64()).combine_chunks() for c in (a, b)]
            ),
            "dst": pa.concat_arrays(
                [pc.cast(c, pa.int64()).combine_chunks() for c in (b, a)]
            ),
        }
    )
    parts = join_partitions(rows=edges_tbl.num_rows)
    edges = rd.from_arrow(edges_tbl).materialize()
    nodes = np.unique(
        np.concatenate(
            [np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)]
        )
    )
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(nodes, pa.int64()),
            }
        )
    )
    prev_sum = int(nodes.sum())
    for _ in range(DUP_CLUSTERS_MAX_ITER):
        nbr = edges.join(
            labels, join_type="inner", num_partitions=parts, on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {"node": pc.cast(t.column("dst"), pa.int64()),
                 "label": pc.cast(t.column("label"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(nbr)
            .groupby("node")
            .aggregate(Min("label"))
            .map_batches(
                stable_rename(["node", "label"], [pa.int64(), pa.int64()]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = int(
            labels.sum("label") if labels.count() else 0
        )
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            "dup_clusters: min-label propagation did not converge in "
            f"{DUP_CLUSTERS_MAX_ITER} rounds"
        )
    sizes = labels.groupby("label").count()
    out = labels.join(
        sizes, join_type="inner", num_partitions=parts, on=("label",),
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("node"), pa.int64()),
                "cluster_id": pc.cast(t.column("label"), pa.int64()),
                "cluster_size": pc.cast(t.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    tbl = _collect_table(out)
    order = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
    return tbl.take(order)


def clusters_from_pairs(pairs: pa.Table) -> pa.Table:
    """(doc_id, cluster_id, cluster_size) connected components of a dup-pair
    edge list; cluster_id = MIN doc_id of the component. Threshold-gated
    driver/distributed twins (equality-tested)."""
    if pairs.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "cluster_size": pa.array([], pa.int64()),
            }
        )
    if pairs.num_rows <= DUP_CLUSTERS_DRIVER_MAX_PAIRS:
        return _clusters_driver(pairs)
    return _clusters_propagate(pairs)


def dup_clusters(
    sf_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
    k: int = 3,
    max_df: int = NGRAM_JACCARD_MAX_DF,
) -> pa.Table:
    """Duplicate CLUSTERS: connected components over the exact word-k-gram
    Jaccard pair graph (``ngram_jaccard_pairs``). This is the step a
    corpus-dedup pipeline runs after pair generation — keep one doc per
    cluster, drop the rest — and transitivity means clusters are strictly
    coarser than pairs (A~B, B~C groups A,B,C even when A!~C).

    Reference parity: spacy_crfsuite has no corpus-dedup surface; this
    extends the §2.8 dedup family the brief requires. Oracle: DuckDB
    recursive-CTE reachability over the same pair CTEs."""
    return clusters_from_pairs(
        ngram_jaccard_pairs(sf_dir, threshold=threshold, k=k, max_df=max_df)
    )


def dup_keep_best(
    sf_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
    k: int = 3,
    max_df: int = NGRAM_JACCARD_MAX_DF,
) -> pa.Table:
    """Representative selection: for every dup cluster, the doc to KEEP —
    the longest text (chars), ties to the smallest doc_id — plus how many
    dupes dropping the rest removes. This is the decision step of corpus
    dedup (RefinedWeb/C4 keep-one policy) made explicit and oracle-checked.

    100 TB shape: the cluster membership map is the SPARSE dedup output
    (same size class as the pair list), so it broadcasts via ``ray.put``
    and one memoized read per worker; the documents scan stays a streaming
    column-pruned pass that ships only (cluster_id, doc_id, n_chars) for
    member docs — text never leaves the scan. Per-batch combiner keeps one
    candidate per (batch, cluster); the final per-cluster pick runs on that
    survivor set."""
    import pandas as pd
    import ray

    from ..functions.broadcast import get_broadcast
    from ..functions.cluster import coalesce_small

    clusters = dup_clusters(sf_dir, threshold=threshold, k=k, max_df=max_df)
    if clusters.num_rows == 0:
        return pa.table(
            {
                "cluster_id": pa.array([], pa.int64()),
                "keep_doc_id": pa.array([], pa.int64()),
                "n_dropped": pa.array([], pa.int64()),
            }
        )
    member = dict(
        zip(clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_id").to_pylist())
    )
    ref = ray.put(member)

    def lens(batch: pa.Table) -> pa.Table:
        m = get_broadcast(ref)
        ids = batch.column("doc_id").to_pylist()
        keep = [i in m for i in ids]
        sub = batch.filter(pa.array(keep, pa.bool_()))
        sub_ids = sub.column("doc_id").to_pylist()
        return pa.table(
            {
                "cluster_id": pa.array(
                    [m[i] for i in sub_ids], pa.int64()
                ),
                "doc_id": pc.cast(sub.column("doc_id"), pa.int64()),
                "n_chars": pc.cast(
                    pc.utf8_length(sub.column("text")), pa.int64()
                ),
            }
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True])
            .groupby("cluster_id", sort=False).head(1)
        )

    sizes = dict(
        zip(clusters.column("cluster_id").to_pylist(),
            clusters.column("cluster_size").to_pylist())
    )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True]).head(1)
        cid = int(g["cluster_id"].iloc[0])
        return pd.DataFrame(
            {
                "cluster_id": [cid],
                "keep_doc_id": [int(g["doc_id"].iloc[0])],
                "n_dropped": [int(sizes[cid]) - 1],
            }
        )

    out = (
        coalesce_small(
            _docs(sf_dir, ["doc_id", "text"])
            .map_batches(lens, batch_format="pyarrow")
            .map_batches(partial, batch_format="pandas"),
            cap=2,
        )
        .groupby("cluster_id")
        .map_groups(final, batch_format="pandas")
    )
    tbl = _collect_table(
        out,
        empty_schema=pa.schema(
            [("cluster_id", pa.int64()), ("keep_doc_id", pa.int64()),
             ("n_dropped", pa.int64())]
        ),
    )
    order = pc.sort_indices(tbl, sort_keys=[("cluster_id", "ascending")])
    return tbl.take(order)


# -------------------------------------------------- flagship training set

def training_set(
    sf_dir: str,
    k: int = 100,
    threshold: float = DEFAULT_THRESHOLD,
    ngram_k: int = 3,
    max_df: int = NGRAM_JACCARD_MAX_DF,
) -> "rd.Dataset":
    """END-TO-END training-set construction — the pipeline every LLM corpus
    runs, composed from this repo's primitives and covered by ONE
    end-to-end SQL oracle:

      1. quality gate (length + token-count bounds, Arrow kernels)
      2. EXACT word-n-gram Jaccard near-dup pairs over the survivors
         (inverted index — no all-pairs pass)
      3. connected components + keep-one-per-cluster (longest text)
      4. stratified per-language sample (k smallest md5(doc_id))

    100 TB shape: the gate is a streaming filter; pair generation shuffles
    df-bounded shingle rows; clusters/keepers are the SPARSE dedup output
    (broadcast, like ``dup_keep_best``); the final sample is a per-batch
    top-k combiner. Document text never leaves the column-pruned scans —
    and is never PINNED either: only the (doc_id, lang, n_chars) survivor
    keys materialize (three scalar columns); the one text-needing pass
    (the shingle explode) re-scans the parquet column-pruned with the
    vectorized gate re-applied, and the keep-longest step probes the
    materialized keys (n_chars rode out of the gate pass) instead of
    scanning text again. Round 3 materialized the gated (doc_id, lang,
    text) stream — spilling made that run, not scale."""
    import pandas as pd
    import ray

    from ..core.tokenizer import TOKEN_PATTERN
    from ..functions.broadcast import get_broadcast
    from ..functions.cluster import coalesce_small
    from ..functions.hashing import text_md5

    def _gate_mask(text: pa.ChunkedArray):
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(
            pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
        )
        mask = pc.and_(
            pc.and_(pc.greater_equal(n_chars, 150),
                    pc.less_equal(n_chars, 1000)),
            pc.greater_equal(n_tokens, 30),
        )
        return mask, n_chars

    def gate(batch: pa.Table) -> pa.Table:
        mask, _ = _gate_mask(batch.column("text"))
        return batch.filter(mask)

    def gated_text():
        """Streaming gated (doc_id, text) scan — built fresh per consumer
        so the text column is never materialized."""
        return _docs(sf_dir, ["doc_id", "text"]).map_batches(
            gate, batch_format="pyarrow"
        )

    def gate_keys(batch: pa.Table) -> pa.Table:
        # one pass emits the survivor keys AND their n_chars, so the
        # keep-longest step later never needs its own text scan
        mask, n_chars = _gate_mask(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_chars": n_chars,
            }
        ).filter(mask)

    gated_keys = (
        _docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(gate_keys, batch_format="pyarrow")
        .materialize()
    )
    n_docs = gated_keys.count()

    ex = gated_text().map_batches(
        _ngram_explode(ngram_k), batch_format="pyarrow"
    )
    pairs = _ngram_pairs_from_exploded(ex, threshold, max_df, n_docs)
    clusters = clusters_from_pairs(pairs)

    # keepers: longest gated text per cluster, ties to min doc_id. The
    # member set is sparse dedup output → broadcast probe over the already-
    # materialized gated stream, tiny (cluster_id, doc_id, n_chars) rows
    # back to the driver.
    drop: set = set()
    if clusters.num_rows:
        member = dict(
            zip(clusters.column("doc_id").to_pylist(),
                clusters.column("cluster_id").to_pylist())
        )
        mref = ray.put(member)

        def lens(batch: pa.Table) -> pa.Table:
            # probe the materialized (doc_id, lang, n_chars) keys against
            # the sparse member broadcast — no text scan: n_chars rode out
            # of the single gate pass
            m = get_broadcast(mref)
            ids = batch.column("doc_id").to_pylist()
            keep = [i in m for i in ids]
            sub = batch.filter(pa.array(keep, pa.bool_()))
            sub_ids = sub.column("doc_id").to_pylist()
            return pa.table(
                {
                    "cluster_id": pa.array(
                        [m[i] for i in sub_ids], pa.int64()
                    ),
                    "doc_id": pc.cast(sub.column("doc_id"), pa.int64()),
                    "n_chars": pc.cast(sub.column("n_chars"), pa.int64()),
                }
            )

        mem = _collect_table(
            gated_keys.map_batches(lens, batch_format="pyarrow"),
            empty_schema=pa.schema(
                [("cluster_id", pa.int64()), ("doc_id", pa.int64()),
                 ("n_chars", pa.int64())]
            ),
        ).to_pandas()
        keepers = (
            mem.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .groupby("cluster_id", sort=False).head(1)["doc_id"]
        )
        drop = set(mem["doc_id"]) - set(keepers)
    dref = ray.put(np.array(sorted(drop), dtype=np.int64))

    def surv(batch: pa.Table) -> pa.Table:
        d = get_broadcast(dref)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        if len(d):
            pos = np.searchsorted(d, ids)
            pos_c = np.minimum(pos, len(d) - 1)
            keep = ~((pos < len(d)) & (d[pos_c] == ids))
        else:
            keep = np.ones(len(ids), bool)
        sub_ids = ids[keep]
        return pa.table(
            {
                "lang": pc.cast(batch.column("lang"), pa.string()).filter(
                    pa.array(keep, pa.bool_())
                ),
                "doc_id": pa.array(sub_ids, pa.int64()),
                "h": pa.array(
                    [text_md5(str(i)) for i in sub_ids.tolist()],
                    pa.string(),
                ),
            }
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["h", "doc_id"])
            .groupby("lang", sort=False).head(k)
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["h", "doc_id"]).head(k)[
            ["lang", "doc_id"]
        ]

    return (
        coalesce_small(
            gated_keys.map_batches(surv, batch_format="pyarrow")
            .map_batches(partial, batch_format="pandas"),
            cap=2,
        )
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


# ------------------------------------------------------- decontamination
# The broadcast cap IS the documented partitioning assumption: real
# benchmark/eval suites are megabytes of text, so their distinct shingles
# fit one object-store put even when the training corpus is 100 TB. The
# gated twin below covers the degenerate case of a huge benchmark side.
DECONTAM_BROADCAST_MAX_SHINGLES = 5_000_000
DECONTAM_BENCH_MOD = 101


def decontaminate(
    sf_dir: str,
    ngram_k: int = 3,
    bench_mod: int = DECONTAM_BENCH_MOD,
) -> "rd.Dataset":
    """Benchmark decontamination (the GPT-3 / Gopher pipeline step): flag
    every training document that shares word-k-gram shingles with a
    held-out benchmark set. The synthetic benchmark side is
    ``doc_id % bench_mod == 0`` (deterministic, ~1% of docs — standing in
    for the eval-suite text a real pipeline would load); output is one row
    per CONTAMINATED training doc: (doc_id, n_shingles, n_hit,
    hit_frac_c6) — bounded by contamination, not corpus size.

    100 TB shape: the benchmark side is small by construction, so its
    distinct shingle strings broadcast once via ``ray.put`` and every
    training batch probes with one vectorized ``pc.is_in`` — training text
    streams column-pruned with ZERO shuffle (shingle, probe and per-doc
    fold all happen inside one ``map_batches``; a doc's shingles never
    leave its batch). Above ``DECONTAM_BROADCAST_MAX_SHINGLES`` the gated
    twin inner-joins the exploded training shingles against the benchmark
    shingle Dataset and folds with a groupby (equality-tested in
    tests/test_ops.py)."""
    import ray

    from ..functions.broadcast import get_broadcast

    src = _docs(sf_dir, ["doc_id", "text"])

    from ..functions.shingles import shingle_occurrences, shingle_set_rows

    def bench_shingles(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        sub = batch.filter(pa.array(ids % bench_mod == 0))
        sh, _, _, _ = shingle_occurrences(sub.column("text"), ngram_k)
        if len(sh) == 0:
            return pa.table({"sh": pa.array([], pa.string())})
        return pa.table({"sh": pc.unique(sh)})

    bench_sh = src.map_batches(
        bench_shingles, batch_format="pyarrow"
    ).groupby("sh").count().drop_columns(["count()"]).materialize()

    if bench_sh.count() > DECONTAM_BROADCAST_MAX_SHINGLES:
        return _decontam_joined(src, bench_sh, ngram_k, bench_mod)

    bench_arr = _collect_table(
        bench_sh, empty_schema=pa.schema([("sh", pa.string())])
    ).column("sh").combine_chunks()
    bref = ray.put(bench_arr)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_shingles", pa.int64()),
         ("n_hit", pa.int64()), ("hit_frac_c6", pa.int64())]
    )

    def probe(batch: pa.Table) -> pa.Table:
        bench = get_broadcast(bref)
        ids_in = np.asarray(batch.column("doc_id"), np.int64)
        sub = batch.filter(pa.array(ids_in % bench_mod != 0))
        sh, d, sz = shingle_set_rows(sub.column("text"), ngram_k)
        if len(sh) == 0:
            return out_schema.empty_table()
        hit = pc.cast(pc.is_in(sh, value_set=bench), pa.int64())
        agg = pa.table(
            {"doc_id": pc.cast(sub.column("doc_id"), pa.int64())
             .take(pa.array(d, pa.int64())),
             "n_shingles": pa.array(sz, pa.int64()),
             "n_hit": hit}
        ).group_by(["doc_id", "n_shingles"]).aggregate([("n_hit", "sum")]) \
            .rename_columns(["doc_id", "n_shingles", "n_hit"])
        return _decontam_finish(agg)

    return src.map_batches(probe, batch_format="pyarrow")


def _decontam_finish(agg: pa.Table) -> pa.Table:
    """Keep contaminated docs only; hit_frac_c6 = floor(hit/sz*1e6 + .5)
    from identical int64s via IEEE doubles on both engines."""
    agg = agg.filter(pc.greater(agg.column("n_hit"), 0))
    n_hit = np.asarray(agg.column("n_hit"), np.int64)
    sz = np.asarray(agg.column("n_shingles"), np.int64)
    frac = np.floor(
        n_hit.astype(np.float64) * 1_000_000.0 / sz.astype(np.float64) + 0.5
    ).astype(np.int64)
    return pa.table(
        {"doc_id": agg.column("doc_id"),
         "n_shingles": agg.column("n_shingles"),
         "n_hit": agg.column("n_hit"),
         "hit_frac_c6": pa.array(frac, pa.int64())}
    )


def _decontam_joined(src, bench_sh, ngram_k: int, bench_mod: int):
    """Distributed twin for a benchmark side too big to broadcast: explode
    training shingles (df-unbounded here — every row carries its doc's sz),
    inner-join on the shingle against the benchmark Dataset (the join
    shuffles shingle rows, never document text), then a per-batch
    (doc_id, sz) count combiner + one small groupby over contaminated docs
    only."""
    from ..functions.cluster import join_partitions
    from ..functions.tables import stable_rename

    def train_filter(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return batch.filter(pa.array(ids % bench_mod != 0))

    ex = src.map_batches(train_filter, batch_format="pyarrow").map_batches(
        _ngram_explode(ngram_k), batch_format="pyarrow"
    )
    parts = join_partitions()

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_shingles", pa.int64()),
                 ("n_hit", pa.int64())]
            ).empty_table()
        t = pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_shingles": batch.column("sz"),
             "n_hit": pa.array(np.ones(batch.num_rows, np.int64))}
        )
        return t.group_by(["doc_id", "n_shingles"]) \
            .aggregate([("n_hit", "sum")]) \
            .rename_columns(["doc_id", "n_shingles", "n_hit"])

    hits = (
        ex.join(bench_sh, join_type="inner", num_partitions=parts,
                on=("sh",))
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(["doc_id", "n_shingles"])
        .sum("n_hit")
        .map_batches(
            stable_rename(["doc_id", "n_shingles", "n_hit"],
                          [pa.int64(), pa.int64(), pa.int64()]),
            batch_format="pyarrow",
        )
    )
    return hits.map_batches(_decontam_finish, batch_format="pyarrow")


# ---------------------------------------------------------------- SemDeDup
SEMDEDUP_TARGET_CLUSTER = 4096
SEMDEDUP_RECALL_MAX_ROWS = 20_000
SEMDEDUP_PROBE = 2


def semdedup(
    sf_dir: str, threshold: float = 0.40, train_sample: int = 100_000
) -> pa.Table:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means sharding — embeddings are assigned to a coarse cluster and
    near-dup pairs are searched ONLY within a cluster, turning the
    quadratic all-pairs scan into per-cluster matmuls. Output: (a, b,
    cos_c6, cluster) pairs at cosine ≥ threshold, plus an in-band
    `recall_c6` stamp vs the exact all-pairs twin (−1 above the gate) —
    precision is 1.0 by construction (cosines inside a cluster are exact);
    recall is what clustering trades away (cross-cluster dups).

    100 TB shape: centroids train on a bounded uniform sample (a tiny
    broadcast model, like IVF); assignment is one streaming map_batches;
    the per-cluster pair scan is a `groupby(cluster).map_groups` whose
    group size is CONTROLLED BY K (`n_rows / SEMDEDUP_TARGET_CLUSTER`
    clusters ⇒ ~4k-row groups ⇒ one ~130 MB matmul per group) — the
    published algorithm's own sharding, not an unbounded co-location."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    from ..functions.broadcast import get_broadcast
    from .ann import _corpus_meta, _kmeans, _normalize

    path = f"{sf_dir}/embeddings.parquet"
    n_rows = pq.read_metadata(path).num_rows
    pair_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()),
         ("cos_c6", pa.int64()), ("cluster", pa.int64())]
    )
    if n_rows == 0:
        got = pair_schema.empty_table()
        return got.append_column("recall_c6", pa.array([], pa.int64()))
    n_clusters = max(2, n_rows // SEMDEDUP_TARGET_CLUSTER)
    _, _dim, sample = _corpus_meta(
        sf_dir, sample_rows=min(train_sample, n_rows)
    )
    cent = _kmeans(_normalize(sample.astype(np.float64)), n_clusters)
    ref = ray.put(cent)

    probe = min(SEMDEDUP_PROBE, n_clusters)

    def assign(batch: pa.Table) -> pa.Table:
        # multi-probe: each vector lands in its `probe` nearest clusters
        # (the IVF trick) — near-dup pairs straddling one boundary still
        # co-locate somewhere; duplicate discoveries collapse in the final
        # (a, b) groupby. Cost: x probe rows through the shuffle; each
        # row carries its embedding. If embedding width grows (>>128
        # floats), switch to shipping vec_id only and co-located fetch of
        # the vectors inside `within` from a broadcast/partitioned store —
        # at the current width the xprobe copy is cheaper than the extra
        # round-trip (VERDICT r04 note).
        c = get_broadcast(ref)
        mat = _normalize(np.asarray(
            batch.column("embedding").to_pylist(), dtype=np.float64
        ))
        sims = mat @ c.T
        top = np.argpartition(-sims, probe - 1, axis=1)[:, :probe]
        n = len(mat)
        idx = np.repeat(np.arange(n), probe)
        return pa.table(
            {
                "cluster": pa.array(top.reshape(-1).astype(np.int64)),
                "vec_id": pc.cast(batch.column("vec_id"), pa.int64())
                .take(pa.array(idx, pa.int64())),
                "embedding": batch.column("embedding").take(
                    pa.array(idx, pa.int64())
                ),
            }
        )

    def within(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy(dtype=np.int64)
        mat = _normalize(np.stack(group["embedding"].to_numpy()).astype(
            np.float64
        ))
        sims = mat @ mat.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        cos = np.floor(sims[ii, jj] * 1_000_000.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"a": a, "b": b, "cos_c6": cos,
             "cluster": np.full(len(a), int(group["cluster"].iloc[0]),
                                np.int64)}
        )

    got = _collect_table(
        read_parquet_nometa(path, columns=["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(within, batch_format="pandas")
        .groupby(["a", "b", "cos_c6"])
        .min("cluster")
        .map_batches(
            lambda t: t.rename_columns(["a", "b", "cos_c6", "cluster"]),
            batch_format="pyarrow",
        ),
        empty_schema=pair_schema,
    )
    if n_rows <= SEMDEDUP_RECALL_MAX_ROWS:
        tbl = pq.read_table(path, columns=["vec_id", "embedding"])
        ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        mat = _normalize(np.asarray(tbl.column("embedding").to_pylist(),
                                    dtype=np.float64))
        sims = mat @ mat.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        exact = set(zip(np.minimum(ids[ii], ids[jj]).tolist(),
                        np.maximum(ids[ii], ids[jj]).tolist()))
        found = set(zip(got.column("a").to_pylist(),
                        got.column("b").to_pylist()))
        recall = len(exact & found) / max(1, len(exact))
        c6 = int(np.floor(recall * 1_000_000.0 + 0.5))
    else:
        c6 = -1
    return got.append_column(
        "recall_c6", pa.array([c6] * got.num_rows, pa.int64())
    )


# ------------------------------------------------- exact-substring coverage
# Distinct cross-doc-duplicated shingle count under which the dup-shingle
# set broadcasts (ray.put once, vectorized pc.is_in probe per batch — zero
# document shuffle). Above it, positioned gram rows hash-join the dup set
# and per-doc interval unions run in a doc_id groupby (groups are bounded
# by ONE document's gram count, never a corpus fraction) — equality-tested.
DUP_SPAN_BROADCAST_MAX_SHINGLES = 2_000_000


def _gram_pos_batch(k: int):
    """docs → one row per (sh, doc_id, start, n_words): EVERY word-k-gram
    occurrence with its 0-based start position (unlike ``_ngram_explode``,
    which dedupes — coverage needs positions). Same shingle semantics as
    ``word_shingles`` / the shared SQL CTEs: ``\\s+`` split, empties
    dropped, docs with 0 < words < k contribute ONE whole-text shingle
    (start 0), wordless docs contribute nothing. Fully vectorized: Arrow
    RE2 split, offset-arithmetic window joins — no per-token Python."""

    out_schema = pa.schema(
        [("sh", pa.string()), ("doc_id", pa.int64()),
         ("start", pa.int64()), ("n_words", pa.int64())]
    )

    from ..functions.shingles import shingle_occurrences

    def rows(batch: pa.Table) -> pa.Table:
        sh, d, starts, counts = shingle_occurrences(batch.column("text"), k)
        if len(sh) == 0:
            return out_schema.empty_table()
        doc_ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {"sh": sh,
             "doc_id": pa.array(doc_ids[d], pa.int64()),
             "start": pa.array(starts, pa.int64()),
             "n_words": pa.array(counts[d], pa.int64())}
        )

    return rows


_DUP_SPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_words", pa.int64()),
     ("covered_words", pa.int64()), ("coverage_c6", pa.int64())]
)


def _span_finish(ids, n_words, covered) -> pa.Table:
    """coverage_c6 = floor(covered/n_words*1e6 + .5) from identical int64s
    via IEEE doubles on both engines."""
    frac = np.floor(
        np.asarray(covered, np.float64) * 1_000_000.0
        / np.asarray(n_words, np.float64) + 0.5
    ).astype(np.int64)
    return pa.table(
        {"doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
         "n_words": pa.array(np.asarray(n_words, np.int64), pa.int64()),
         "covered_words": pa.array(np.asarray(covered, np.int64), pa.int64()),
         "coverage_c6": pa.array(frac, pa.int64())}
    )


def dup_span_coverage(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Exact-substring cross-document duplication coverage (the ExactSubstr
    statistic of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", at word-k-gram granularity): for every doc
    with ≥1 word, the fraction of its word positions covered by at least
    one k-gram window that also occurs in ANOTHER document. Output
    (doc_id, n_words, covered_words, coverage_c6) — the per-doc signal a
    span-removal pass would cut on.

    100 TB shape: pass 1 is the ``_ngram_explode`` distinct-per-doc
    combiner + one (sh) groupby — the shuffle moves each doc's UNIQUE
    shingles once, never tokens or text. The cross-doc-duplicated subset
    (df ≥ 2 — a small fraction of the shingle vocabulary on real corpora)
    broadcasts once and pass 2 is batch-local: positioned grams, one
    vectorized ``pc.is_in`` probe, interval-union via a distinct-position
    expansion (≤ k rows per hit). Above
    ``DUP_SPAN_BROADCAST_MAX_SHINGLES`` the gated twin hash-joins
    positioned gram rows against the dup-shingle Dataset and unions
    intervals inside a doc_id groupby — group size is one document's gram
    count, so no worker ever holds a corpus fraction (equality-tested in
    tests/test_ops.py)."""
    import ray

    from ..functions.broadcast import get_broadcast

    src = _docs(sf_dir, ["doc_id", "text"])
    dup = (
        src.map_batches(_ngram_explode(k), batch_format="pyarrow")
        .select_columns(["sh"])
        .groupby("sh")
        .count()
        .map_batches(
            lambda b: (
                pa.schema([("sh", pa.string())]).empty_table()
                if b.num_columns == 0 or b.num_rows == 0
                else b.filter(pc.greater_equal(b.column("count()"), 2))
                .select(["sh"])
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if dup.count() > DUP_SPAN_BROADCAST_MAX_SHINGLES:
        return _dup_span_joined(src, dup, k)

    dup_arr = _collect_table(
        dup, empty_schema=pa.schema([("sh", pa.string())])
    ).column("sh").combine_chunks()
    ref = ray.put(dup_arr)
    gram_rows = _gram_pos_batch(k)

    def probe(batch: pa.Table) -> pa.Table:
        dup_set = get_broadcast(ref)
        rows = gram_rows(batch)
        if rows.num_rows == 0:
            return _DUP_SPAN_SCHEMA.empty_table()
        ids = np.asarray(rows.column("doc_id"), np.int64)
        starts = np.asarray(rows.column("start"), np.int64)
        nw = np.asarray(rows.column("n_words"), np.int64)
        hit = pc.is_in(rows.column("sh"), value_set=dup_set).to_numpy(
            zero_copy_only=False
        )
        # per-doc base rows (first gram row of each doc — rows are
        # doc-contiguous: each doc lands entirely in the long XOR short
        # section of _gram_pos_batch, so runs of equal ids are per-doc,
        # but base_ids is NOT sorted by value — short docs follow long
        # ones and batch row order itself carries no doc_id ordering)
        first = np.concatenate([[0], np.nonzero(np.diff(ids))[0] + 1])
        base_ids, base_nw = ids[first], nw[first]
        covered = np.zeros(len(first), np.int64)
        if hit.any():
            h_d, h_s, h_n = ids[hit], starts[hit], nw[hit]
            span = np.minimum(h_s + k, h_n) - h_s
            rep_d = np.repeat(h_d, span)
            within = np.arange(span.sum()) - np.repeat(
                np.cumsum(span) - span, span
            )
            pos = np.repeat(h_s, span) + within
            max_w = int(nw.max())
            uniq = np.unique(rep_d * max_w + pos)
            u_docs, u_counts = np.unique(uniq // max_w, return_counts=True)
            order = np.argsort(base_ids, kind="stable")
            covered[order[np.searchsorted(base_ids[order], u_docs)]] = (
                u_counts
            )
        return _span_finish(base_ids, base_nw, covered)

    return src.map_batches(probe, batch_format="pyarrow")


def _dup_span_joined(src, dup_ds, k: int) -> "rd.Dataset":
    """Distributed twin for a dup-shingle set too big to broadcast:
    positioned gram rows ⋈ dup shingles on the shingle (the join shuffles
    gram rows, never document text), interval union per doc inside a
    doc_id groupby, then a union + groupby merge with the per-doc base so
    zero-coverage docs still emit rows. Byte-identical to the broadcast
    path (same clipped-interval semantics)."""
    from ray.data.aggregate import Max, Sum

    from ..functions.cluster import join_partitions
    from ..functions.tables import stable_rename

    pos = src.map_batches(_gram_pos_batch(k), batch_format="pyarrow")
    j = pos.join(
        dup_ds, join_type="inner", num_partitions=join_partitions(),
        on=("sh",),
    )

    hit_schema = pa.schema(
        [("doc_id", pa.int64()), ("start", pa.int64()),
         ("n_words", pa.int64())]
    )

    def hit_rows(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return hit_schema.empty_table()
        return batch.select(["doc_id", "start", "n_words"])

    def cover(group: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        s = np.sort(group["start"].to_numpy(np.int64))
        nw = int(group["n_words"].iloc[0])
        e = np.minimum(s + k, nw)
        prev = np.concatenate([[s[0]], np.maximum.accumulate(e)[:-1]])
        covered = int(np.maximum(0, e - np.maximum(s, prev)).sum())
        return pd.DataFrame(
            {"doc_id": [int(group["doc_id"].iloc[0])], "n_words": [nw],
             "covered_words": [covered]}
        )

    cov_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()),
         ("covered_words", pa.int64())]
    )
    covered = (
        j.map_batches(hit_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(cover, batch_format="pandas")
        # map_groups emits pandas blocks; re-type to arrow so the union
        # with the arrow base stream sees one block type end-to-end
        .map_batches(
            lambda b: b.cast(cov_schema) if b.num_rows else
            cov_schema.empty_table(),
            batch_format="pyarrow",
        )
    )

    def base_rows(batch: pa.Table) -> pa.Table:
        rows = _gram_pos_batch(k)(batch)
        if rows.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_words", pa.int64()),
                 ("covered_words", pa.int64())]
            ).empty_table()
        ids = np.asarray(rows.column("doc_id"), np.int64)
        nw = np.asarray(rows.column("n_words"), np.int64)
        first = np.concatenate([[0], np.nonzero(np.diff(ids))[0] + 1])
        return pa.table(
            {"doc_id": pa.array(ids[first], pa.int64()),
             "n_words": pa.array(nw[first], pa.int64()),
             "covered_words": pa.array(
                 np.zeros(len(first), np.int64), pa.int64()
             )}
        )

    base = src.map_batches(base_rows, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _DUP_SPAN_SCHEMA.empty_table()
        return _span_finish(
            np.asarray(batch.column("doc_id"), np.int64),
            np.asarray(batch.column("n_words"), np.int64),
            np.asarray(batch.column("covered_words"), np.int64),
        )

    return (
        base.union(covered)
        .groupby("doc_id")
        .aggregate(Max("n_words"), Sum("covered_words"))
        .map_batches(
            stable_rename(["doc_id", "n_words", "covered_words"],
                          [pa.int64(), pa.int64(), pa.int64()]),
            batch_format="pyarrow",
        )
        .map_batches(finish, batch_format="pyarrow")
    )
