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


def test_corpus_dedup_join_twin_equals_broadcast(ray_session, tmp_path,
                                                 monkeypatch):
    """The (h, uid) hash-join dedup path must keep exactly the same TEXTS as
    the broadcast winner-set path (winner identity may differ — copies are
    byte-identical, so outputs compare equal on content columns)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.pipelines import corpus

    base = str(tmp_path / "pages")
    pages_dir, _ = generate_pages(30, base, rows_per_file=15)
    files = page_files(pages_dir)

    def clean_df(out):
        stats = corpus.run_corpus_pipeline(files + files, out)
        t = pq.read_table(os.path.join(stats["clean_dir"], "shard=all"))
        cols = ["h", "url", "text", "lang_pred", "n_chars", "n_tokens"]
        return t.to_pandas()[cols].sort_values("h").reset_index(drop=True)

    a = clean_df(str(tmp_path / "out_a"))
    monkeypatch.setattr(corpus, "CORPUS_BROADCAST_MAX_ROWS", 0)
    b = clean_df(str(tmp_path / "out_b"))
    assert a.equals(b)
    assert "uid" not in a.columns


def test_corpus_dedup_winner_deterministic(ray_session, tmp_path):
    """Same text under DIFFERENT urls: the kept url must be identical across
    independent runs (stage-1 winner key is a deterministic url hash)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.pipelines.corpus import run_corpus_pipeline

    html = "<html><body><p>" + "Alice Martin works at Acme Corp. " * 10 \
        + "</p></body></html>"
    rows = [{"url": f"https://site{i}.example/x", "warc_ts": "2024",
             "html": html, "text": "", "lang": "en"} for i in range(6)]
    src = str(tmp_path / "p.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)

    urls = []
    for run in ("a", "b"):
        out = str(tmp_path / f"out_{run}")
        stats = run_corpus_pipeline([src], out)
        t = pq.read_table(os.path.join(stats["clean_dir"], "shard=all"))
        assert t.num_rows == 1  # one winner for the one distinct text
        urls.append(t.column("url").to_pylist()[0])
    assert urls[0] == urls[1]
