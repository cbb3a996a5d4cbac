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
