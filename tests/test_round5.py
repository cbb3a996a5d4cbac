"""Round-5 regression tests for the VERDICT/ADVICE items fixed this round."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(ds):
    out = ds.to_pandas()
    return out


def test_dup_span_coverage_mixed_short_long_batch(ray_session, tmp_path):
    """ADVICE r4 high: _gram_pos_batch emits long-doc grams before short-doc
    whole-text shingles, so within a batch mixing both, base_ids is NOT
    sorted and the broadcast probe's searchsorted misassigned covered-word
    counts (or crashed). 300 docs interleaving short dups, long dups and
    unique long docs in one parquet file — several docs of each kind per
    batch — must match the DuckDB oracle exactly."""
    import duckdb

    import __ray_entry__ as E
    from spacy_crfsuite_ray.ops.dedup import dup_span_coverage

    sch = pq.read_schema(f"{SF}/documents.parquet")
    n = 300
    texts = []
    for i in range(n):
        if i % 3 == 0:
            texts.append("one two")  # short (<k) dup pair member
        elif i % 3 == 1:
            texts.append("alpha beta gamma delta epsilon")  # long dup
        else:
            texts.append(f"u{i} v{i} w{i} x{i} y{i}")  # long unique
    rows = {
        "doc_id": list(range(1, n + 1)),
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "text": texts,
    }
    cols = {f.name: rows.get(f.name, [None] * n) for f in sch}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = _df(dup_span_coverage(str(tmp_path)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    orc = con.execute(E.oracle_sql()["dup_span_coverage"]).fetchdf()
    key = ["doc_id", "n_words", "covered_words", "coverage_c6"]
    assert len(got) == n
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    orc_set = set(map(tuple, orc[key].itertuples(index=False)))
    assert got_set == orc_set
    # spot-check the semantics the bug corrupted: every short dup fully
    # covered, every long dup fully covered, every unique doc zero
    by_id = {int(r.doc_id): r for r in got.itertuples(index=False)}
    for i in range(n):
        r = by_id[i + 1]
        if i % 3 == 0:
            assert r.n_words == 2 and r.covered_words == 2
        elif i % 3 == 1:
            assert r.n_words == 5 and r.covered_words == 5
        else:
            assert r.covered_words == 0


def test_gram_pos_batch_unsorted_doc_ids(ray_session):
    """The probe must also survive batches whose doc_id column is not
    ascending (nothing upstream guarantees row order): descending ids with
    a short doc in the middle, probed via the public op on a one-block
    dataset."""
    from spacy_crfsuite_ray.ops.dedup import _gram_pos_batch

    batch = pa.table(
        {
            "doc_id": pa.array([9, 2, 7], pa.int64()),
            "text": pa.array(["a b c d", "x y", "a b c z"]),
        }
    )
    rows = _gram_pos_batch(3)(batch)
    ids = np.asarray(rows.column("doc_id"), np.int64)
    # long docs (9, 7) first, short (2) last — per-doc contiguity holds
    first = np.concatenate([[0], np.nonzero(np.diff(ids))[0] + 1])
    assert set(ids[first].tolist()) == {9, 2, 7}
    assert sorted(ids[first].tolist()) != ids[first].tolist()

def test_heavy_hitters_driver_pull_bounded_by_distinct(
    ray_session, tmp_path, monkeypatch
):
    """VERDICT r04 #3: the candidate merge must reach the driver bounded by
    DISTINCT candidates, not blocks x 1/phi. 40k rows in ~40 map_batches
    batches, every batch emitting the same two hot candidates: each of the
    two driver collects must see a table of ~2 rows (the distributed
    groupby dedupes/folds first), and the result must still equal the
    plain GROUP BY oracle."""
    import duckdb

    from spacy_crfsuite_ray.functions import tables as T
    from spacy_crfsuite_ray.ops import sketch

    per = 1024  # default map_batches batch size
    n_batches = 40
    block = np.concatenate([
        np.full(500, 7, dtype=np.int64),
        np.full(300, 11, dtype=np.int64),
        np.arange(100_000, 100_000 + per - 800, dtype=np.int64),
    ])
    keys = np.concatenate([block + 0 for _ in range(n_batches)])
    d = tmp_path / "hh_blocks"
    d.mkdir()
    pq.write_table(
        pa.table({"user_id": pa.array(keys, pa.int64())}),
        str(d / "events.parquet"),
    )

    real = T.collect_table
    pulled = []

    def spy(ds, empty_schema=None):
        out = real(ds, empty_schema=empty_schema)
        pulled.append(out.num_rows)
        return out

    monkeypatch.setattr(T, "collect_table", spy)
    got = sketch.heavy_hitters(str(d), phi=0.2).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)

    assert len(pulled) == 2
    # the raw pass-1 stream is ~2 rows x n_batches; post-groupby the
    # driver sees only the distinct candidates (plus nothing else)
    assert max(pulled) <= 4

    want = duckdb.connect().execute(
        f"SELECT user_id, count(*) AS n_rows "
        f"FROM '{d}/events.parquet' GROUP BY user_id "
        f"HAVING count(*) >= CAST(ceil(0.2 * {len(keys)}) AS BIGINT) "
        f"ORDER BY user_id"
    ).fetchdf()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got.user_id) == {7, 11}

def test_mixture_full_weight_source_keeps_all(ray_session, tmp_path):
    """ADVICE r4: a weight-1.0 source must keep EVERY doc — the old 0xffff
    cap silently dropped docs whose md5(text) prefix is 'ffff'. Fixture
    plants such docs in the full-weight source ('src0') and in a
    fractional source; engine and oracle must agree AND the src0 planted
    doc must survive."""
    import duckdb

    import __ray_entry__ as E
    from spacy_crfsuite_ray.ops.clean import (
        _mix_threshold_hex, source_mixture_sample,
    )

    assert _mix_threshold_hex(1.0) == "g"
    assert _mix_threshold_hex(0.5) == "8000"

    # md5('probe 36528')[:4] == 'ffff' (and 37522, 50827)
    sch = pq.read_schema(f"{SF}/documents.parquet")
    n = 4
    rows = {
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * n,
        "source": ["src0", "src0", "src1", "zzz"],
        "text": ["probe 36528", "plain text", "probe 37522", "probe 50827"],
    }
    cols = {f.name: rows.get(f.name, [None] * n) for f in sch}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = source_mixture_sample(str(tmp_path)).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    orc = con.execute(E.oracle_sql()["source_mixture_sample"]).fetchdf()
    orc = orc.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, orc, check_dtype=False)
    # both src0 docs kept (incl. the md5-prefix-'ffff' one); the 'ffff'
    # docs in fractional-weight sources dropped ('ffff' is not < their hex)
    assert got.doc_id.tolist() == [1, 2]
    assert set(got.keep_threshold) == {"g"}

def test_event_asof_joined_salted_skew_equals_broadcast(
    ray_session, tmp_path
):
    """VERDICT r04 #6: the at-scale asof twin salts the user key. A fixture
    with one pathological user holding 10x a normal batch of events (plus
    several orders) must produce byte-identical matches through the salted
    joined path and the broadcast probe, and every salt group stays
    bounded (checked implicitly: 5000 events / 8 salts ~ 625 per group)."""
    import pandas as pd

    from spacy_crfsuite_ray.ops import relational

    rng = np.random.RandomState(7)
    hot_n, cold_users, cold_per = 5000, 50, 20
    base = np.int64(1_600_000_000_000_000)  # us epoch
    day = np.int64(86_400_000_000)

    ev_users = np.concatenate([
        np.full(hot_n, 1, dtype=np.int64),
        np.repeat(np.arange(2, 2 + cold_users, dtype=np.int64), cold_per),
    ])
    n_ev = len(ev_users)
    ev_ts = base + rng.randint(0, 400, size=n_ev).astype(np.int64) * day
    ev = pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "user_id": pa.array(ev_users),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
    })
    od_users = np.concatenate([
        np.full(6, 1, dtype=np.int64),
        np.arange(2, 2 + cold_users, dtype=np.int64),  # one order each
    ])
    n_od = len(od_users)
    od_ts = base + rng.randint(0, 400, size=n_od).astype(np.int64) * day
    od = pa.table({
        "o_orderkey": pa.array(np.arange(1, n_od + 1, dtype=np.int64)),
        "o_custkey": pa.array(od_users),
        "o_orderdate": pa.array(od_ts, pa.timestamp("us")),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    pq.write_table(od, str(tmp_path / "orders.parquet"))

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["event_id", "o_orderkey"])
            .reset_index(drop=True)
        )

    broadcast = norm(relational.event_asof_order(str(tmp_path)))
    joined = norm(relational._event_asof_joined(str(tmp_path)))
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(joined, broadcast, check_dtype=False)

def test_scrub_pipeline_manifests_and_resume(ray_session, tmp_path):
    """VERDICT r04 #7: `cli scrub` gets the KG write's lineage-manifest
    machinery — a re-run skips manifested shards; a corrupted shard (or an
    in-place input rewrite) re-runs only itself."""
    import os
    import shutil

    from spacy_crfsuite_ray.pipelines.kg import _walk_parquet
    from spacy_crfsuite_ray.pipelines.scrub import run_scrub_pipeline
    from spacy_crfsuite_ray.stages.graph import manifest_valid, read_manifests

    # 4 input files with line-dup + PII content -> 2 shards
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    for i in range(4):
        t = pa.table({
            "doc_id": pa.array([i * 10 + 1, i * 10 + 2], pa.int64()),
            "text": pa.array([
                "keep\nkeep\nmail bob@example.com",
                f"unique {i}\nip 10.0.0.{i} end",
            ]),
        })
        pq.write_table(t, str(in_dir / f"part{i}.parquet"))
    out = str(tmp_path / "scrubbed")

    res = run_scrub_pipeline(str(in_dir), out, shards=2)
    assert res["shards_run"] == 2 and res["shards_skipped"] == 0
    assert res["rows"] == 8 and res["files"] >= 2
    manifests = read_manifests(out)
    assert len(manifests) == 2
    for m in manifests:
        assert m["rows_out"] > 0 and m["input_refs"] and m["files"]
        assert manifest_valid(out, m["partition_id"])

    # the scrub actually scrubbed: dup line gone, PII tokenized
    got = pq.read_table(_walk_parquet(out)[0])
    assert "n_lines_removed" in got.schema.names

    # resume: everything skipped, rows unchanged
    res2 = run_scrub_pipeline(str(in_dir), out, shards=2)
    assert res2["shards_run"] == 0 and res2["shards_skipped"] == 2
    assert res2["rows"] == 8

    # corrupt one shard -> only it re-runs
    shard_dir = os.path.join(out, "shard=00000")
    os.remove(_walk_parquet(shard_dir)[0])
    assert not manifest_valid(out, "00000")
    shutil.rmtree(shard_dir)
    res3 = run_scrub_pipeline(str(in_dir), out, shards=2)
    assert res3["shards_run"] == 1 and res3["shards_skipped"] == 1
    assert res3["rows"] == 8

    # in-place input rewrite (same path, new mtime/size) -> its shard re-runs
    t = pa.table({
        "doc_id": pa.array([991, 992], pa.int64()),
        "text": pa.array(["x\nx", "y"]),
    })
    pq.write_table(t, str(in_dir / "part0.parquet"))
    res4 = run_scrub_pipeline(str(in_dir), out, shards=2)
    assert res4["shards_run"] == 1 and res4["shards_skipped"] == 1


def _write_docs(tmp_path, texts, doc_ids=None):
    sch = pq.read_schema(f"{SF}/documents.parquet")
    n = len(texts)
    rows = {
        "doc_id": doc_ids if doc_ids is not None else list(range(1, n + 1)),
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "text": texts,
        "n_chars": [len(t) for t in texts],
    }
    cols = {f.name: rows.get(f.name, [None] * n) for f in sch}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch})
    pq.write_table(t, str(tmp_path / "documents.parquet"))


def test_gopher_filter_crafted_rules(ray_session, tmp_path):
    """Each Gopher rule tripped by exactly one crafted doc (the sf fixture
    has no newlines/bullets/symbols, so the line- and symbol-based rules
    are only exercised here), compared against the DuckDB oracle."""
    import duckdb

    import __ray_entry__ as E
    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops.text import gopher_filter

    good = " ".join(
        ["the cat and dog have fun with that bee to be of joy"] * 5
    )  # 65 words, mean word length exactly 3.0, 8 stopword hits
    texts = [
        good,                                        # 1: keep
        "the cat sat",                               # 2: f_words
        "\n".join(["- item one two three"] * 9 + [good]),   # 3: f_bullet
        "\n".join([good, "trailing off...", "more dots...", "plain"]),
                                                     # 4: f_ellipsis (2/4)
        good + " #" * 20,                            # 5: f_symbol
        " ".join(["111"] * 65),                      # 6: f_alpha (+f_stop)
        " ".join(["cat dog fox owl bat"] * 13),      # 7: f_stop
        " ".join(["extraordinarily"] * 65),          # 8: f_mean_len
        "• point\nthe end is near…\n" + good,        # 9: unicode bullet+…
    ]
    _write_docs(tmp_path, texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    got = assert_matches_oracle(
        gopher_filter(str(tmp_path)), E.oracle_sql()["gopher_filter"], con
    )
    by_id = {int(r.doc_id): r for r in got.itertuples(index=False)}
    assert by_id[1].keep == 1
    assert by_id[2].f_words == 0 and by_id[2].keep == 0
    assert by_id[3].f_bullet == 0 and by_id[3].keep == 0
    assert by_id[4].f_ellipsis == 0 and by_id[4].keep == 0
    assert by_id[5].f_symbol == 0 and by_id[5].keep == 0
    assert by_id[6].f_alpha == 0 and by_id[6].keep == 0
    assert by_id[7].f_stop == 0 and by_id[7].keep == 0
    assert by_id[8].f_mean_len == 0 and by_id[8].keep == 0
    assert by_id[9].f_bullet == 0  # unicode bullet seen (1 of 3 lines)


def test_sequence_pack_multibucket_prefix_scan(ray_session, tmp_path):
    """sequence_pack's two-pass exclusive prefix scan across MANY buckets
    (forced small bucket floor), sparse non-contiguous doc_ids, and a
    zero-token doc — equal to the SQL window prefix sum AND to a driver
    numpy recompute."""
    import duckdb

    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops.text import sequence_pack, sequence_pack_sql

    rng = np.random.RandomState(7)
    n = 100
    doc_ids = [7 * i + 3 for i in range(n)]  # gaps: bucket map is monotone
    texts = [" ".join(["tok"] * int(rng.randint(0, 12))) for _ in range(n)]
    texts[17] = ""  # zero-token doc
    _write_docs(tmp_path, texts, doc_ids=doc_ids)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    got = assert_matches_oracle(
        sequence_pack(str(tmp_path), seq_len=5, _bucket_floor=7),
        sequence_pack_sql(seq_len=5),
        con,
    )
    # driver recompute: exclusive cumsum over doc_id order
    g = got.sort_values("doc_id").reset_index(drop=True)
    ntok = g["n_tokens"].to_numpy()
    start = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    assert (g["start_tok"].to_numpy() == start).all()
    last = start + np.maximum(ntok, 1) - 1
    assert (g["seq_first"].to_numpy() == start // 5).all()
    assert (g["seq_last"].to_numpy() == last // 5).all()
    z = g[g["n_tokens"] == 0]
    assert len(z) >= 1 and (z["n_seqs"] == 1).all()


def test_quality_percentile_ties_and_single_row(ray_session, tmp_path):
    """PERCENT_RANK tie semantics: every member of a tied score group gets
    cnt_less/(n-1); a single-row corpus gets 0 (the SQL 0/0 convention)."""
    import duckdb

    import __ray_entry__ as E
    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops.text import quality_percentile

    d1 = tmp_path / "ties"
    d1.mkdir()
    texts = (
        ["the cat and the dog have fun with that"] * 10
        + ["zq zq zq 111 222"] * 10
        + ["a b c d e f g h"] * 10
    )
    _write_docs(d1, texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d1}/documents.parquet'"
    )
    got = assert_matches_oracle(
        quality_percentile(str(d1)), E.oracle_sql()["quality_percentile"],
        con,
    )
    per_score = got.groupby("quality_c6")["pctile_c6"].nunique()
    assert (per_score == 1).all()  # ties share one percentile
    assert got["pctile_c6"].min() == 0

    d2 = tmp_path / "single"
    d2.mkdir()
    _write_docs(d2, ["only doc"])
    single = quality_percentile(str(d2)).to_pandas()
    assert len(single) == 1 and int(single["pctile_c6"].iloc[0]) == 0


def test_dedup_paragraphs_crafted_and_joined_twin(ray_session, tmp_path,
                                                  monkeypatch):
    """Global paragraph dedup: first occurrence wins corpus-wide; empty
    paragraphs always survive; a doc whose every paragraph loses
    reassembles to ''. Crafted multi-paragraph docs vs the DuckDB oracle,
    then the joined at-scale twin (gate forced to 0) must be byte-equal."""
    import duckdb

    import __ray_entry__ as E
    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops import clean

    texts = [
        "alpha beta\ncommon para\ngamma",       # 1: owns 'common para'
        "common para\ndelta",                   # 2: loses 'common para'
        "unique one\n\nunique two",             # 3: empty para kept
        "common para",                          # 4: loses its ONLY para -> ''
        "delta",                                # 5: 'delta' first seen in 2
        "x\nx\nx",                              # 6: within-doc repeats too
    ]
    _write_docs(tmp_path, texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    got = assert_matches_oracle(
        clean.dedup_paragraphs(str(tmp_path)),
        E.oracle_sql()["dedup_paragraphs"], con,
    )
    by_id = {int(r.doc_id): r for r in got.itertuples(index=False)}
    import hashlib

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert by_id[1].n_paras_removed == 0
    assert by_id[2].n_paras_removed == 1 and by_id[2].clean_fp == fp("delta")
    assert by_id[3].n_paras_removed == 0
    assert by_id[4].n_paras_removed == 1 and by_id[4].clean_fp == fp("")
    assert by_id[5].n_paras_removed == 1 and by_id[5].clean_fp == fp("")
    assert by_id[6].n_paras == 3 and by_id[6].n_paras_removed == 2
    assert by_id[6].clean_fp == fp("x")

    # at-scale twin: force the joined path, must be byte-identical
    monkeypatch.setattr(clean, "PARA_DEDUP_BROADCAST_MAX", 0)
    twin = clean.dedup_paragraphs(str(tmp_path)).to_pandas()
    key = ["doc_id", "n_paras", "n_paras_removed", "clean_fp"]
    a = got[key].sort_values("doc_id").reset_index(drop=True)
    b = twin[key].sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_token_budget_select_tie_boundary(ray_session, tmp_path):
    """The budget boundary falls INSIDE a tie group (20 identical-quality
    docs): only the lowest-doc_id ties that still fit survive, resolved by
    the bucketed prefix scan (forced multi-bucket) — equal to the SQL
    running-sum oracle. A huge budget keeps everything (no-boundary path)."""
    import duckdb

    import __ray_entry__ as E
    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops.text import (
        token_budget_select, token_budget_select_sql,
    )

    good = "the cat and the dog have fun with that"  # 9 tokens, high quality
    junk = "111 111 111"                              # low quality
    _write_docs(tmp_path, [good] * 20 + [junk] * 5)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    got = assert_matches_oracle(
        token_budget_select(str(tmp_path), budget_tokens=67,
                            _bucket_floor=3),
        token_budget_select_sql(E._quality_score_sql(), budget_tokens=67),
        con,
    )
    assert sorted(got["doc_id"]) == list(range(1, 8))  # 7 * 9 = 63 <= 67

    every = token_budget_select(str(tmp_path),
                                budget_tokens=10**9).to_pandas()
    assert len(every) == 25


def test_ann_topk_filtered_respects_predicate(ray_session):
    """Every returned neighbor shares its query's label and is never the
    query itself; per-query result count is <= k."""
    import pyarrow.parquet as pq_

    from spacy_crfsuite_ray.ops.ann import ann_topk_filtered

    got = ann_topk_filtered(SF).to_pandas()
    t = pq_.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "label"])
    label = dict(zip(t.column("vec_id").to_pylist(),
                     t.column("label").to_pylist()))
    assert len(got) > 0
    for q, n in zip(got["query_id"], got["neighbor_id"]):
        assert n != q and label[int(n)] == label[int(q)]
    assert got.groupby("query_id").size().max() <= 5


def test_export_pipeline_select_scrub_chunk_resume(ray_session, tmp_path):
    """Composed training-data export: the budget selects only the
    high-quality docs, the scrub dedupes lines, the chunk explode emits
    full k-word units, resume skips manifested shards, and changing the
    budget (a GLOBAL rule change) invalidates every shard via the layout
    digest."""
    from spacy_crfsuite_ray.pipelines.export import run_export_pipeline
    from spacy_crfsuite_ray.pipelines.kg import _walk_parquet

    good = " ".join(
        ["the cat and the dog have fun with that bee to be of"] * 4
    )  # 52 tokens of high-quality text
    junk = " ".join(["111"] * 48)  # 48 tokens, low quality
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    for i in range(2):
        t = pa.table({
            "doc_id": pa.array([i * 10 + 1, i * 10 + 2], pa.int64()),
            "text": pa.array([good, junk]),
        })
        pq.write_table(t, str(in_dir / f"part{i}.parquet"))
    out = str(tmp_path / "exported")

    # budget 110: the two good docs (2 * 52 = 104) fit, junk does not
    res = run_export_pipeline(str(in_dir), out, budget_tokens=110,
                              chunk_words=8, shards=2)
    assert res["shards_run"] == 2 and res["selected_docs"] == 2
    # each good doc has 52 words -> 6 full 8-word chunks
    assert res["rows"] == 12
    tbl = pa.concat_tables([pq.read_table(f) for f in _walk_parquet(out)])
    assert sorted(set(tbl.column("doc_id").to_pylist())) == [1, 11]
    assert all(len(t.split(" ")) == 8 for t in tbl.column("text").to_pylist())

    # resume: all shards skipped
    res2 = run_export_pipeline(str(in_dir), out, budget_tokens=110,
                               chunk_words=8, shards=2)
    assert res2["shards_run"] == 0 and res2["shards_skipped"] == 2

    # global rule change (bigger budget admits the junk docs) -> every
    # shard re-runs even though per-shard inputs are unchanged
    res3 = run_export_pipeline(str(in_dir), out, budget_tokens=10_000,
                               chunk_words=8, shards=2)
    assert res3["shards_run"] == 2 and res3["selected_docs"] == 4
    assert res3["rows"] == 24


def test_keyword_search_tie_at_limit(ray_session, tmp_path):
    """Many docs share the exact top score (ties cross the LIMIT
    boundary): both engines must rank on the identical c6 integer with
    doc_id tie-break, so the top-k SET matches exactly."""
    import duckdb

    import __ray_entry__ as E
    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops.text import keyword_search

    texts = (["the vector got a merge"] * 30       # identical score
             + ["slow slow slow vector merge"] * 3  # higher score
             + ["nothing relevant here"] * 10)      # score 0, excluded
    _write_docs(tmp_path, texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    got = assert_matches_oracle(
        keyword_search(str(tmp_path)), E.oracle_sql()["keyword_search"],
        con,
    )
    assert len(got) == 20
    # the 3 high scorers first, then the 17 lowest-doc_id tied docs
    ids = set(got["doc_id"])
    assert {31, 32, 33} <= ids
    assert ids - {31, 32, 33} == set(range(1, 18))


def test_quality_percentile_by_lang_single_doc_partition(ray_session,
                                                         tmp_path):
    """A partition with ONE doc gets percentile 0 (the SQL 0/0
    convention), and partitions don't leak into each other."""
    import duckdb

    import __ray_entry__ as E
    from conftest import assert_matches_oracle
    from spacy_crfsuite_ray.ops.text import quality_percentile_by_lang

    sch = pq.read_schema(f"{SF}/documents.parquet")
    texts = ["the cat and dog", "a b c", "zz qq pp", "lone doc here"]
    rows = {
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", "en", "en", "xx"],  # 'xx' is a 1-doc partition
        "source": ["s"] * 4,
        "text": texts,
        "n_chars": [len(t) for t in texts],
    }
    cols = {f.name: rows.get(f.name, [None] * 4) for f in sch}
    pq.write_table(
        pa.table({f.name: pa.array(cols[f.name], f.type) for f in sch}),
        str(tmp_path / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    got = assert_matches_oracle(
        quality_percentile_by_lang(str(tmp_path)),
        E.oracle_sql()["quality_percentile_by_lang"], con,
    )
    xx = got[got["lang"] == "xx"]
    assert len(xx) == 1 and int(xx["pctile_c6"].iloc[0]) == 0
