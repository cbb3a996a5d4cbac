"""Salted groupby equals plain aggregation (skew-safety is a pure
restructuring, never a semantics change)."""

import pandas as pd
import pyarrow as pa
import pytest


def test_salted_sum_matches_plain(ray_session):
    import ray.data as rd

    from spacy_crfsuite_ray.stages.salted import salted_sum

    # heavily skewed: one hot key with 10k rows, 50 cold keys
    rows = [{"k": "hot", "v": 1} for _ in range(10_000)]
    rows += [{"k": f"cold{i}", "v": i} for i in range(50)]
    ds = rd.from_items(rows)
    got = salted_sum(ds, ["k"], "v", out_name="total").to_pandas()
    want = (
        pd.DataFrame(rows).groupby("k", as_index=False)["v"].sum()
        .rename(columns={"v": "total"})
    )
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_domain_stats_query(ray_session):
    import __ray_entry__ as E

    df = E.queries()["kg_domain_stats"]("/root/testdata/sf0.001")
    assert (df["n_triples"] > 0).all()
    # the in-band exact twin must agree with the salted result row for row
    assert df["match"].all()
    assert df["domain"].str.startswith("site").all()
    # the fixture's hot domains (site0-2) hold a large share of triples
    hot = df[df["domain"].isin(["site0.example", "site1.example",
                                "site2.example"])]["n_triples"].sum()
    assert hot / df["n_triples"].sum() > 0.15
