"""Training-data corpus pipeline over Common-Crawl-style pages: extract →
language-ID → quality gates → exact dedup → clean text parquet + metrics.

This is the page-level companion to the document-table ops in ``ops/``: the
stages a 100TB training-data build runs BEFORE tokenization. Dedup is a
groupby on md5(text) (uniform shuffle key); only (hash, url) pairs move, the
winner set is broadcast back, and page text never shuffles.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.tables import read_parquet_nometa

from ..core.tokenizer import TOKEN_PATTERN
from ..functions.hashing import text_md5
from ..ops.text import detect_lang
from ..stages.extract import extract_text_batch
from ..stages.graph import write_manifest

MIN_CHARS = 80
MIN_TOKENS = 10
# Below this many quality rows the dedup winner set ((h, min url) pairs)
# broadcasts; above it a co-partitioned (h, url) hash-join filters instead.
CORPUS_BROADCAST_MAX_ROWS = 5_000_000


def quality_batch(batch: pa.Table) -> pa.Table:
    """(url, text) → + lang_pred, n_chars, n_tokens, uh, uid, keep flag.

    Dedup tiebreakers: ``uh`` is a DETERMINISTIC int64 hash of the url (the
    stage-1 winner key, so which url survives is stable across runs) and
    ``uid`` a random per-row int64 (stage-2 collapse of byte-identical
    copies of the winning (text, url) — interchangeable, so randomness
    cannot change the output bytes). Both columns are dropped before the
    write."""
    import struct as _struct

    import numpy as np

    def url_hash(u: str) -> int:
        import hashlib as _hl

        return _struct.unpack(
            "<q", _hl.sha1(u.encode("utf-8")).digest()[:8]
        )[0]

    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64())
    langs = pa.array(
        [detect_lang(t) for t in text.to_pylist()], pa.string()
    )
    hashes = pa.array([text_md5(t) for t in text.to_pylist()], pa.string())
    urls = batch.column("url").to_pylist()
    uh = pa.array([url_hash(u) for u in urls], pa.int64())
    uid = pa.array(
        np.random.randint(-(2**62), 2**62, size=batch.num_rows,
                          dtype=np.int64)
    )
    keep = pc.and_(
        pc.greater_equal(n_chars, MIN_CHARS),
        pc.greater_equal(n_tokens, MIN_TOKENS),
    )
    return pa.table(
        {
            "url": batch.column("url"),
            "text": text,
            "lang_pred": langs,
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "h": hashes,
            "uh": uh,
            "uid": uid,
        }
    ).filter(keep)


def _keep_min_pairs(ds, key_col: str, n_rows: int):
    """Filter ``ds`` to rows whose (h, key_col) equals the per-h Min of
    ``key_col`` — shuffling only (h, key) pairs; broadcast winner set below
    the threshold, co-partitioned hash-join above."""
    from ray.data.aggregate import Min

    winners = ds.select_columns(["h", key_col]).groupby("h").aggregate(
        Min(key_col)
    )
    if n_rows <= CORPUS_BROADCAST_MAX_ROWS:
        import ray

        from ..functions.broadcast import get_broadcast

        keep: set = set()
        for b in winners.iter_batches(batch_format="pyarrow", batch_size=None):
            keep.update(zip(b.column("h").to_pylist(),
                            b.column(f"min({key_col})").to_pylist()))
        keep_ref = ray.put(keep)

        def winner_rows(batch: pa.Table) -> pa.Table:
            k = get_broadcast(keep_ref)
            mask = [
                (h, u) in k
                for h, u in zip(batch.column("h").to_pylist(),
                                batch.column(key_col).to_pylist())
            ]
            return batch.filter(pa.array(mask, pa.bool_()))

        return ds.map_batches(winner_rows, batch_format="pyarrow")
    from ..functions.cluster import join_partitions

    return ds.join(
        winners.map_batches(
            lambda b: b.rename_columns(["h", key_col]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=join_partitions(rows=n_rows),
        on=("h", key_col),
    )


def run_corpus_pipeline(page_files: List[str], out_dir: str) -> Dict:
    """Returns stats; writes ``clean/`` parquet + manifest."""
    t0 = time.time()
    ds = read_parquet_nometa(page_files, columns=["url", "html", "lang"])
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    ds = ds.map_batches(quality_batch, batch_format="pyarrow")
    ds = ds.materialize()  # counted + deduped
    n_quality = ds.count()

    # exact dedup, one winner row per distinct text; both stages shuffle
    # ONLY (h, key) pairs — never the page text.
    #   stage 1: deterministic winner URL per text (min url-hash) — the
    #            surviving rows of each text are byte-identical copies
    #   stage 2: collapse those copies to one row (min random uid; which
    #            copy wins is interchangeable, output bytes identical)
    # (no mid-materialize: stage 2's two consumers re-run stage 1's cheap
    # filter map over the already-materialized quality rows rather than
    # holding a second corpus-sized copy in the object store)
    clean = _keep_min_pairs(ds, "uh", n_quality)
    clean = _keep_min_pairs(clean, "uid", n_quality)
    clean = clean.drop_columns(["uh", "uid"])
    clean_dir = os.path.join(out_dir, "clean")
    shard = os.path.join(clean_dir, "shard=all")
    import shutil

    shutil.rmtree(shard, ignore_errors=True)
    clean.write_parquet(shard)
    n_clean = clean.count()
    write_manifest(clean_dir, "all", input_refs=page_files,
                   rows_out=n_clean, wall_s=time.time() - t0)
    return {
        "n_quality": n_quality,
        "n_clean": n_clean,
        "n_dupes_removed": n_quality - n_clean,
        "clean_dir": clean_dir,
    }
