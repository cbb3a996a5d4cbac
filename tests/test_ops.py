"""Training-data operators vs DuckDB oracles (mirrors the driver gate) +
ANN recall and multimodal plumbing checks. Runs at sf0.001 for speed."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _df(x):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


from conftest import assert_matches_oracle as _assert_matches_oracle  # noqa: E402


@pytest.mark.parametrize("name", [
    "doc_stats", "lang_count", "token_count_by_source", "quality_filter",
    "doc_fingerprint", "quality_score", "lang_id",
    "exact_dedup", "embedding_dup_pairs", "ann_topk",
    "lineitem_agg", "segment_revenue", "top_parts", "events_daily",
    "user_sessions", "top_orders_per_segment",
    "priority_semijoin", "customers_no_orders", "shipping_priority",
    "event_asof_order", "doc_sample", "ngram_top", "revenue_by_region",
    "user_value_sliding_sum", "event_props_stats", "ngram_jaccard_pairs",
    "purchase_attribution", "tfidf_top_terms", "embedding_centroids",
    "lang_source_rollup", "urgent_revenue_bloom", "first_shipment",
    "event_lag_delta", "order_priority_pivot", "distinct_users_by_type",
    "chunk_dup_stats", "top_bigram_fraction", "dup_clusters",
    "stratified_sample", "dup_keep_best", "event_value_quantiles",
    "orders_upsert", "training_set", "revenue_running_total",
    "order_priority_rank", "decontaminate", "token_rarity",
    "dup_ngram_fraction", "dup_span_coverage", "dsir_weights",
    "pii_scrub", "norm_dedup", "dup_line_stats", "lineitem_corr",
    "customer_order_profile", "user_activity_ledger",
    "dedup_lines", "dsir_resample", "event_funnel", "heavy_hitters",
    "user_retention", "chunk_documents", "source_mixture_sample",
    "corpus_report", "simhash_docs", "simhash_dedup_pairs",
    "gopher_filter", "sequence_pack", "quality_percentile",
    "dedup_paragraphs", "token_budget_select", "ann_topk_filtered",
    "keyword_search", "hybrid_search", "quality_percentile_by_lang",
])
def test_sql_oracled_queries(ray_session, con, name):
    import __ray_entry__ as E

    _assert_matches_oracle(E.queries()[name](SF), E.oracle_sql()[name], con)


def test_tfidf_joined_equals_broadcast(ray_session, monkeypatch):
    """Above TFIDF_BROADCAST_MAX_TERMS the df lookup becomes a term
    hash-join + doc_id groupby rank. Forced here, it must emit exactly the
    broadcast path's rows."""
    from spacy_crfsuite_ray.ops import text

    broadcast = _df(text.tfidf_top_terms(SF))
    monkeypatch.setattr(text, "TFIDF_BROADCAST_MAX_TERMS", 0)
    joined = _df(text.tfidf_top_terms(SF))
    key = ["doc_id", "term", "tf", "df", "score_c6"]
    assert len(broadcast) > 0
    assert (
        set(map(tuple, broadcast[key].itertuples(index=False)))
        == set(map(tuple, joined[key].itertuples(index=False)))
    )


def test_ngram_jaccard_joined_equals_driver(ray_session, monkeypatch):
    """Above NGRAM_JACCARD_DRIVER_MAX_DOCS the inverted index runs as a
    shingle self-join + (a, b) groupby-aggregate. Forced here, it must emit
    exactly the driver path's pairs and jac_c6 values."""
    from spacy_crfsuite_ray.ops import dedup

    driver = _df(dedup.ngram_jaccard_pairs(SF))
    monkeypatch.setattr(dedup, "NGRAM_JACCARD_DRIVER_MAX_DOCS", 0)
    joined = _df(dedup.ngram_jaccard_pairs(SF))
    key = ["a", "b", "jac_c6"]
    assert len(driver) > 0
    assert (
        set(map(tuple, driver[key].itertuples(index=False)))
        == set(map(tuple, joined[key].itertuples(index=False)))
    )


def test_token_rarity_joined_equals_broadcast(ray_session, monkeypatch):
    """Above RARITY_BROADCAST_MAX_TERMS the vocab lookup becomes a term
    hash-join + doc_id groupby. Forced here, it must emit exactly the
    broadcast path's rows (same c6-rounded per-term rarity)."""
    from spacy_crfsuite_ray.ops import text

    broadcast = _df(text.token_rarity(SF))
    monkeypatch.setattr(text, "RARITY_BROADCAST_MAX_TERMS", 0)
    joined = _df(text.token_rarity(SF))
    key = ["doc_id", "n_tokens", "mean_rarity_c6"]
    assert len(broadcast) > 0
    assert (
        set(map(tuple, broadcast[key].itertuples(index=False)))
        == set(map(tuple, joined[key].itertuples(index=False)))
    )


def test_decontaminate_joined_equals_broadcast(ray_session, monkeypatch):
    """Above DECONTAM_BROADCAST_MAX_SHINGLES the benchmark probe runs as a
    shingle inner-join + per-doc groupby instead of a broadcast is_in.
    Forced here, it must emit exactly the broadcast path's rows."""
    from spacy_crfsuite_ray.ops import dedup

    broadcast = _df(dedup.decontaminate(SF))
    monkeypatch.setattr(dedup, "DECONTAM_BROADCAST_MAX_SHINGLES", 0)
    joined = _df(dedup.decontaminate(SF))
    key = ["doc_id", "n_shingles", "n_hit", "hit_frac_c6"]
    assert len(broadcast) > 0
    assert (
        set(map(tuple, broadcast[key].itertuples(index=False)))
        == set(map(tuple, joined[key].itertuples(index=False)))
    )


def test_ann_lsh_recall_vs_bruteforce(ray_session):
    from spacy_crfsuite_ray.ops.ann import ann_lsh, ann_topk

    exact = _df(ann_topk(SF))
    approx = _df(ann_lsh(SF))
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5  # multi-probe LSH over random vectors


def test_minhash_pairs_symmetric_and_thresholded(ray_session):
    from spacy_crfsuite_ray.ops.dedup import minhash_dedup_pairs

    df = _df(minhash_dedup_pairs(SF))
    if len(df):
        assert (df["a"] < df["b"]).all()
        assert (df["jaccard"] >= 0.5).all()


def test_simhash_pairs_valid(ray_session):
    from spacy_crfsuite_ray.ops.dedup import (
        SIMHASH_MAX_HAMMING, simhash_dedup_pairs,
    )

    df = _df(simhash_dedup_pairs(SF))
    if len(df):
        assert (df["a"] < df["b"]).all()
        assert (df["hamming"] <= SIMHASH_MAX_HAMMING).all()
        # no duplicate pairs
        assert not df.duplicated(["a", "b"]).any()


def test_simhash_batch_matches_scalar(ray_session):
    """The whole-batch simhash kernel is a bit-exact twin of simhash64."""
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.functions.hashing import simhash64
    from spacy_crfsuite_ray.ops.dedup import _simhash_batch

    texts = pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()[:200] + ["", "   "]
    batch = _simhash_batch(texts)
    for t, got in zip(texts, batch):
        assert int(got) == simhash64(t.lower().split())


@pytest.mark.parametrize("radius", [3, 6])
def test_simhash_banding_recall_guaranteed(ray_session, radius):
    """Pigeonhole banding (r+1 blocks) must surface EVERY pair within the
    configured hamming radius — recall 1.0 vs exact all-pairs, at the
    default radius and at a wider one (adaptive band count)."""
    import numpy as np
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.ops import dedup

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    hs = dedup._simhash_batch(tbl.column("text").to_pylist())
    x = hs[:, None] ^ hs[None, :]
    ham = np.unpackbits(
        x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2
    ).sum(axis=2)
    ai, bi = np.nonzero(np.triu(ham <= radius, k=1))
    exact = {
        (min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
        for i, j in zip(ai, bi)
    }

    df = _df(dedup.simhash_dedup_pairs(SF, max_hamming=radius))
    got = set(zip(df["a"], df["b"]))
    assert got == exact  # recall 1.0 by pigeonhole; precision exact verify


def test_media_features_real_plumbing(ray_session, tmp_path):
    from spacy_crfsuite_ray.ops import multimodal

    media_path = multimodal.synth_media_table(SF, str(tmp_path / "m.parquet"))
    df = _df(multimodal.media_features(SF, media_path))
    assert {"media_id", "height", "width", "channel_means", "thumb"} <= set(df.columns)
    row = df.iloc[0]
    assert row["height"] >= 8 and row["width"] >= 8
    assert len(row["channel_means"]) == 3
    assert len(row["thumb"]) == 8 * 8 * 3
    # decode parses exactly what encode wrote
    import numpy as np

    arr = np.zeros((4, 5, 3), dtype=np.uint8)
    assert multimodal.decode_simg(multimodal.encode_simg(arr)).shape == (4, 5, 3)
    with pytest.raises(NotImplementedError):
        multimodal.decode_simg(b"JPEGnotsupported")


def test_lang_id_deterministic(ray_session):
    from spacy_crfsuite_ray.ops.text import detect_lang

    assert detect_lang("the cat and the dog are in the house") == "en"
    assert detect_lang("der hund und die katze sind nicht da") == "de"
    assert detect_lang("一些中文内容在这里") == "zh"
    assert detect_lang("xyzzy qwerty") == "und"


def test_audio_video_plumbing(ray_session):
    """Audio/video honest-fake codecs: real Ray plumbing, deterministic
    features, round-trip encode/decode, NotImplementedError on foreign
    formats."""
    import numpy as np

    from spacy_crfsuite_ray.ops import multimodal as mm

    adf = _df(mm.audio_features(SF))
    assert {"media_id", "duration_s", "rms", "zero_cross_rate",
            "peak"} <= set(adf.columns)
    assert (adf["duration_s"] > 0).all() and (adf["rms"] > 0).all()
    assert (adf["peak"] <= 1.0).all()

    vdf = _df(mm.video_frame_sample(SF))
    assert {"media_id", "frame_idx", "channel_means", "thumb"} <= set(vdf.columns)
    assert vdf.groupby("media_id").size().max() <= 4
    assert len(vdf.iloc[0]["channel_means"]) == 3
    assert len(vdf.iloc[0]["thumb"]) == 4 * 4 * 3

    pcm = np.array([0, 1000, -1000, 500], dtype=np.int16)
    s, rate = mm.decode_saud(mm.encode_saud(pcm, 8000))
    assert rate == 8000 and np.array_equal(s, pcm)
    frames = np.zeros((3, 4, 5, 3), dtype=np.uint8)
    assert mm.decode_svid(mm.encode_svid(frames)).shape == (3, 4, 5, 3)
    with pytest.raises(NotImplementedError):
        mm.decode_saud(b"WAVnotsupported")
    with pytest.raises(NotImplementedError):
        mm.decode_svid(b"MP4notsupported")


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    from spacy_crfsuite_ray.ops.ann import ann_ivf, ann_topk

    exact = _df(ann_topk(SF))
    approx = _df(ann_ivf(SF))
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5  # n_probe=4 of ~11 lists over random vectors
    # every query answered with k results
    assert approx.groupby("query_id").size().max() <= 5


def test_hll_distinct_within_tolerance(ray_session, con):
    from spacy_crfsuite_ray.ops.sketch import distinct_hll

    approx = _df(distinct_hll(SF))["approx_distinct"].iloc[0]
    exact = con.execute(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    assert abs(approx - exact) / exact < 0.03  # 4096 registers ≈ 1.6% SE


def test_heavy_hitters_candidate_pruning_stays_exact(ray_session, con,
                                                     tmp_path):
    """With a high support threshold the pass-1 local threshold actually
    prunes (cold keys never reach the driver) yet the result still equals
    the full GROUP BY oracle — the pigeonhole superset guarantee."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.ops import sketch

    rng_keys = np.concatenate([
        np.full(4000, 7, dtype=np.int64),          # hot: 40%
        np.full(2500, 11, dtype=np.int64),         # warm: 25%
        np.arange(1000, 4500, dtype=np.int64),     # 3500 singletons
    ])
    d = tmp_path / "hh"
    d.mkdir()
    pq.write_table(
        pa.table({"user_id": pa.array(rng_keys, pa.int64())}),
        str(d / "events.parquet"),
    )
    got = sketch.heavy_hitters(str(d), phi=0.2).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    import duckdb

    want = duckdb.connect().execute(
        f"SELECT user_id, count(*) AS n_rows "
        f"FROM '{d}/events.parquet' GROUP BY user_id "
        f"HAVING count(*) >= CAST(ceil(0.2 * 10000) AS BIGINT) "
        f"ORDER BY user_id"
    ).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got.user_id) == {7, 11}


def test_hll_twin_paths_equal(ray_session, monkeypatch):
    """The fused driver-merge exact twin (one scan) and the distributed
    groupby twin must emit byte-identical result tables."""
    from spacy_crfsuite_ray.ops import sketch

    fused = sketch.distinct_hll(SF)
    monkeypatch.setattr(sketch, "DISTINCT_DRIVER_MAX_ROWS", 0)
    grouped = sketch.distinct_hll(SF)
    assert fused.equals(grouped)


def test_quantile_sketch_within_bin_error(ray_session, con):
    from spacy_crfsuite_ray.ops.sketch import quantile_sketch

    df = _df(quantile_sketch(SF))
    for q, v in zip(df["quantile"], df["approx_value"]):
        exact = con.execute(
            f"SELECT quantile_cont(o_totalprice, {q}) FROM orders"
        ).fetchone()[0]
        assert abs(v - exact) / exact < 0.02  # log-bin width ~1.2%


def test_sketches_batch_invariant(ray_session):
    """Same input, different batch boundaries → identical sketch results."""
    import numpy as np

    from spacy_crfsuite_ray.ops.sketch import hll_estimate, hll_registers

    vals = np.arange(10000, dtype=np.int64) % 3777
    whole = hll_registers(vals)
    merged = np.maximum(hll_registers(vals[:4000]),
                        hll_registers(vals[4000:]))
    assert np.array_equal(whole, merged)
    assert abs(hll_estimate(whole) - 3777) / 3777 < 0.05
    # accuracy must hold far beyond the linear-counting regime too (the
    # rank-based estimator path, >> 4096 registers)
    big = np.arange(150_000, dtype=np.int64) * 7919 + 13
    est = hll_estimate(hll_registers(big))
    assert abs(est - 150_000) / 150_000 < 0.05


def test_bloom_filter_exact_and_selective():
    """No false negatives ever (correctness of the prefilter); false-positive
    rate near the theoretical ~(1 - e^(-kn/m))^k for the sized filter
    (selectivity — the reason the pattern wins at scale)."""
    import numpy as np

    from spacy_crfsuite_ray.functions.hashing import bloom_build, bloom_contains

    rng = np.random.default_rng(11)
    keys = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
    member, probe = keys[:10_000], keys[10_000:]
    bits, m = bloom_build(member)
    assert bloom_contains(bits, m, member).all()
    fp = bloom_contains(bits, m, probe).mean()
    assert fp < 0.01, fp


def test_ann_checked_inband_recall(ray_session):
    """Driver-facing ANN entries stamp their measured exact recall in-band
    (recall_c6); at fixture scale the exact twin always runs."""
    from spacy_crfsuite_ray.ops.ann import ann_ivf_checked, ann_lsh_checked

    for fn in (ann_lsh_checked, ann_ivf_checked):
        tbl = fn(SF)
        c6 = set(tbl.column("recall_c6").to_pylist())
        assert len(c6) == 1
        val = c6.pop()
        assert 400_000 <= val <= 1_000_000  # recall in [0.4, 1.0], measured


def test_minhash_checked_inband_recall(ray_session):
    """The driver-facing minhash entry stamps banding recall vs the exact
    hashed-Jaccard twin; at fixture scale the twin always runs and the
    pair set must be a subset of the exact set (precision 1.0)."""
    from spacy_crfsuite_ray.ops.dedup import (
        DEFAULT_THRESHOLD, _exact_hashed_jaccard_pairs,
        minhash_dedup_pairs_checked,
    )

    tbl = minhash_dedup_pairs_checked(SF)
    c6 = set(tbl.column("recall_c6").to_pylist())
    assert len(c6) == 1
    val = c6.pop()
    assert 500_000 <= val <= 1_000_000
    exact = _exact_hashed_jaccard_pairs(SF, DEFAULT_THRESHOLD)
    got = set(zip(tbl.column("a").to_pylist(), tbl.column("b").to_pylist()))
    assert got <= exact


def test_kg_domain_stats_sql_matches_written_triples(ray_session, con):
    """The salted domain aggregate must hash-match DuckDB re-aggregating the
    pipeline's OWN written triples parquet (the driver-visible oracle for
    the KG family)."""
    import __ray_entry__ as E

    _assert_matches_oracle(
        E._domain_stats_sql(SF), E._domain_stats_oracle(SF), con
    )


def test_chunk_dup_stats_detects_planted_dup(ray_session, con):
    """Two docs sharing an 8-word run must both carry >= 1 dup chunk, and
    every (n_dup_chunks <= n_chunks) invariant must hold."""
    import __ray_entry__ as E

    df = _df(E.queries()["chunk_dup_stats"](SF))
    assert (df["n_dup_chunks"] <= df["n_chunks"]).all()
    assert (df["n_chunks"] > 0).all()
    # the corpus plants exact/near duplicate documents -> shared chunks
    assert df["n_dup_chunks"].sum() > 0


def test_top_bigram_fraction_bounds(ray_session):
    import __ray_entry__ as E

    df = _df(E.queries()["top_bigram_fraction"](SF))
    assert (df["top_bigram_n"] <= df["n_bigrams"]).all()
    assert (df["top_fraction_c6"] > 0).all()
    assert (df["top_fraction_c6"] <= 1_000_000).all()


def test_empty_input_streams_return_typed_empties(ray_session, tmp_path):
    """An all-empty block stream yields ZERO batches from iter_batches;
    every driver-collect site must fall back to a typed empty table
    instead of crashing in pa.concat_tables([])."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from spacy_crfsuite_ray.ops import dedup, relational

    # the shared collector itself
    empty_ds = rd.range(4).map_batches(
        lambda b: pa.table({"x": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    schema = pa.schema([("x", pa.int64())])
    out = dedup._collect_table(empty_ds, empty_schema=schema)
    assert out.num_rows == 0 and out.schema == schema

    # end-to-end: a 0-row sf dir exercises the quantile + ngram-pairs +
    # clusters + keep-best chain
    sf = str(tmp_path)
    pq.write_table(
        pa.table({"event_type": pa.array([], pa.string()),
                  "value": pa.array([], pa.float64())}),
        f"{sf}/events.parquet",
    )
    q = relational.event_value_quantiles(sf)
    assert q.num_rows == 0

    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "lang": pa.array([], pa.string()),
                  "source": pa.array([], pa.string()),
                  "text": pa.array([], pa.string())}),
        f"{sf}/documents.parquet",
    )
    pairs = dedup.ngram_jaccard_pairs(sf)
    assert pairs.num_rows == 0
    assert dedup.clusters_from_pairs(pairs).num_rows == 0
    assert dedup.dup_keep_best(sf).num_rows == 0
    ts = dedup.training_set(sf)
    assert ts.count() == 0

    # empty CDC base: no rows survive, both columns typed
    pq.write_table(
        pa.table({"o_orderkey": pa.array([], pa.int64()),
                  "o_totalprice": pa.array([], pa.float64())}),
        f"{sf}/orders.parquet",
    )
    up = relational.orders_upsert(sf)
    assert up.count() == 0


def test_dup_ngram_fraction_short_doc_edges(ray_session, tmp_path, con):
    """Docs shorter than k words take the whole-text-shingle CTE branch and
    empty docs drop — the sf fixtures never exercise these, so pin them
    against the same DuckDB oracle on a synthetic table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from spacy_crfsuite_ray.ops.text import dup_ngram_fraction

    sch = pq.read_schema(f"{SF}/documents.parquet")
    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
        "text": ["one two", "", "a b a b a b", "single", "x  y   z",
                 "w w w"],
    }
    cols = {f.name: rows.get(f.name, [None] * 6) for f in sch}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _df(dup_ngram_fraction(str(tmp_path)))
    c2 = duckdb.connect()
    c2.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    orc = c2.execute(E.oracle_sql()["dup_ngram_fraction"]).fetchdf()
    key = ["doc_id", "n_ngrams", "n_distinct", "dup_frac_c6"]
    assert len(got) == 5  # the empty doc dropped
    assert (
        set(map(tuple, got[key].itertuples(index=False)))
        == set(map(tuple, orc[key].itertuples(index=False)))
    )


def test_dup_span_coverage_edges(ray_session, tmp_path):
    """Short (<k words), empty, and zero-coverage docs against the same
    DuckDB oracle on a synthetic table: the 2-word twins share a whole-text
    shingle (full coverage), the unique long doc has 0 coverage but still
    emits a row, the empty doc drops, and overlapping dup windows count
    each position once."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from spacy_crfsuite_ray.ops.dedup import dup_span_coverage

    sch = pq.read_schema(f"{SF}/documents.parquet")
    n = 7
    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "text": ["one two", "one two", "", "p q r s t u v",
                 "a b c d e", "a b c d z", "k k k k"],
    }
    cols = {f.name: rows.get(f.name, [None] * n) for f in sch}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _df(dup_span_coverage(str(tmp_path)))
    c2 = duckdb.connect()
    c2.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    orc = c2.execute(E.oracle_sql()["dup_span_coverage"]).fetchdf()
    key = ["doc_id", "n_words", "covered_words", "coverage_c6"]
    assert len(got) == 6  # the empty doc dropped
    by_id = {r.doc_id: r for r in got.itertuples(index=False)}
    assert by_id[1].covered_words == 2 and by_id[1].coverage_c6 == 1_000_000
    assert by_id[4].covered_words == 0  # unique text, row still present
    # docs 5/6 share trigrams "a b c" and "b c d" → positions 1-4 of 5
    assert by_id[5].covered_words == 4
    assert (
        set(map(tuple, got[key].itertuples(index=False)))
        == set(map(tuple, orc[key].itertuples(index=False)))
    )


def test_dsir_weights_edges(ray_session, tmp_path):
    """Target docs are never scored, letterless raw docs drop, and a raw
    doc made of target-only vocabulary outweighs one made of raw-only
    vocabulary — pinned against the same DuckDB oracle on a synthetic
    table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from spacy_crfsuite_ray.ops.text import dsir_weights

    sch = pq.read_schema(f"{SF}/documents.parquet")
    n = 5
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en"] * n,
        "source": ["src0", "src1", "src1", "src1", "src1"],
        "text": ["alpha beta gamma", "alpha beta gamma", "delta eps zeta",
                 "123 456", "alpha delta"],
    }
    cols = {f.name: rows.get(f.name, [None] * n) for f in sch}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _df(dsir_weights(str(tmp_path)))
    c2 = duckdb.connect()
    c2.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    orc = c2.execute(E.oracle_sql()["dsir_weights"]).fetchdf()
    key = ["doc_id", "n_tokens", "dsir_weight_c6"]
    ids = set(got["doc_id"])
    assert ids == {2, 3, 5}  # target doc 1 and letterless doc 4 drop
    by_id = {r.doc_id: r for r in got.itertuples(index=False)}
    # doc 2 repeats the target text verbatim → highest weight; doc 3
    # shares nothing with the target → lowest
    assert by_id[2].dsir_weight_c6 > by_id[5].dsir_weight_c6 \
        > by_id[3].dsir_weight_c6
    assert (
        set(map(tuple, got[key].itertuples(index=False)))
        == set(map(tuple, orc[key].itertuples(index=False)))
    )


def test_semdedup_precision_and_recall_stamp(ray_session):
    """SemDeDup pairs must be a SUBSET of the exact all-pairs cosine dups
    (precision 1.0 — within-cluster cosines are exact) and the in-band
    recall stamp must report the measured overlap."""
    import numpy as np
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.ops.ann import _normalize
    from spacy_crfsuite_ray.ops.dedup import semdedup

    got = semdedup(SF).to_pandas()
    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = _normalize(np.asarray(tbl.column("embedding").to_pylist(),
                                dtype=np.float64))
    sims = mat @ mat.T
    ii, jj = np.nonzero(np.triu(sims >= 0.40, k=1))
    exact = set(zip(np.minimum(ids[ii], ids[jj]).tolist(),
                    np.maximum(ids[ii], ids[jj]).tolist()))
    found = set(zip(got["a"], got["b"]))
    assert found <= exact  # precision 1.0
    assert len(exact) > 0
    recall = len(found & exact) / len(exact)
    assert got["recall_c6"].nunique() == 1
    assert int(got["recall_c6"].iloc[0]) == int(
        np.floor(recall * 1_000_000.0 + 0.5)
    )
    assert recall >= 0.5
