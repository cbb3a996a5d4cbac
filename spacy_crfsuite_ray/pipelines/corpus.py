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

from ..core.tokenizer import TOKEN_PATTERN
from ..functions.hashing import text_md5
from ..ops.text import detect_lang
from ..stages.extract import extract_text_batch
from ..stages.graph import write_manifest

MIN_CHARS = 80
MIN_TOKENS = 10


def quality_batch(batch: pa.Table) -> pa.Table:
    """(url, text) → + lang_pred, n_chars, n_tokens, keep flag."""
    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64())
    langs = pa.array(
        [detect_lang(t) for t in text.to_pylist()], pa.string()
    )
    hashes = pa.array([text_md5(t) for t in text.to_pylist()], pa.string())
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
        }
    ).filter(keep)


def run_corpus_pipeline(page_files: List[str], out_dir: str) -> Dict:
    """Returns stats; writes ``clean/`` parquet + manifest."""
    t0 = time.time()
    ds = rd.read_parquet(page_files, columns=["url", "html", "lang"])
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    ds = ds.map_batches(quality_batch, batch_format="pyarrow")
    ds = ds.materialize()  # counted + deduped
    n_quality = ds.count()

    # exact dedup: hash-partition on md5(text), first-wins inside the group
    # (min url; byte-identical copies are interchangeable). This is the
    # canonical exact-dedup shuffle — each group holds only the copies of
    # one distinct text.
    import pandas as pd

    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("url").iloc[:1]

    clean = ds.groupby("h").map_groups(first_row, batch_format="pandas")
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
