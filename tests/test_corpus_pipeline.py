"""Corpus cleaning pipeline: quality gates + exact dedup over pages."""

import os

import pyarrow.parquet as pq
import pytest

from spacy_crfsuite_ray.sources.pages import generate_pages, page_files


def test_corpus_pipeline_dedupes_and_filters(ray_session, tmp_path):
    from spacy_crfsuite_ray.pipelines.corpus import run_corpus_pipeline

    base = str(tmp_path / "pages")
    pages_dir, _ = generate_pages(40, base, rows_per_file=20)
    files = page_files(pages_dir)
    # feed every file twice → every page text duplicated exactly once
    stats = run_corpus_pipeline(files + files, str(tmp_path / "out"))
    assert stats["n_quality"] > 0
    # duplicates removed: one winner per distinct text
    assert stats["n_clean"] * 2 == stats["n_quality"]

    shard = os.path.join(stats["clean_dir"], "shard=all")
    t = pq.read_table(shard)
    assert set(t.column_names) >= {"url", "text", "lang_pred", "n_chars",
                                   "n_tokens", "h"}
    # quality gates hold
    import pandas as pd

    df = t.to_pandas()
    assert (df["n_chars"] >= 80).all()
    assert (df["n_tokens"] >= 10).all()
    assert not df["h"].duplicated().any()
