"""Round-4 scale-shape fixes: histogram RANK(), Dataset-native graph
analytics, empty-changelog MERGE, pivot inner-join semantics, vectorized
mention explode."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


def test_order_priority_rank_histogram_equals_groups(ray_session):
    """The broadcast-histogram rank (production shape — no whole-class
    pandas group) must equal the per-class map_groups formulation."""
    from spacy_crfsuite_ray.ops import relational

    cols = ["o_orderkey", "o_orderpriority", "price_rank"]

    hist = relational.order_priority_rank(SF).to_pandas()
    groups = relational._order_priority_rank_groups(SF).to_pandas()
    a = hist[cols].sort_values(cols).reset_index(drop=True)
    b = groups[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # force the distributed histogram groupby (the at-scale twin)
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(relational, "RANK_HIST_DRIVER_MAX_ROWS", -1)
        dist = relational.order_priority_rank(SF).to_pandas()
    finally:
        mp.undo()
    c = dist[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(c)
    assert len(a) == pq.read_metadata(f"{SF}/orders.parquet").num_rows
    # ties share the min rank: every class starts at rank 1
    assert (a.groupby("o_orderpriority")["price_rank"].min() == 1).all()


def _edges_tbl(src, dst):
    return pa.table({"src": pa.array(src, pa.string()),
                     "dst": pa.array(dst, pa.string())})


def test_pagerank_dataset_path_equals_driver(ray_session, monkeypatch):
    """Dataset input above the gate: edges never land on the driver and the
    (node_id, rank_c12) Dataset is byte-identical to the numpy twin."""
    import ray.data as rd

    from spacy_crfsuite_ray.ops import graph

    tbl = _edges_tbl(["a", "b", "c", "d", "a", "e"],
                     ["x", "x", "x", "a", "b", "e"])
    driver = graph.pagerank_from_edges(tbl)

    monkeypatch.setattr(graph, "PAGERANK_DRIVER_MAX_EDGES", 0)
    ranks = graph.pagerank_from_edges(rd.from_arrow(tbl))
    assert isinstance(ranks, rd.Dataset)
    got = ranks.to_pandas().sort_values("node_id").reset_index(drop=True)
    want = driver.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert got.equals(want)

    # Dataset input BELOW the gate takes the driver fast path (table out)
    monkeypatch.setattr(graph, "PAGERANK_DRIVER_MAX_EDGES", 10**9)
    small = graph.pagerank_from_edges(rd.from_arrow(tbl))
    assert isinstance(small, pa.Table)
    assert small.equals(driver)


def test_degree_stats_dataset_equals_table(ray_session):
    import ray.data as rd

    from spacy_crfsuite_ray.ops import graph

    tbl = _edges_tbl(["a", "a", "b", "c"], ["b", "c", "c", "a"])
    want = graph.degree_stats_from_edges(tbl)
    got = graph.degree_stats_from_edges(rd.from_arrow(tbl))
    assert got.equals(want)


def _write_orders(tmp_path, keys, prices):
    pq.write_table(
        pa.table({"o_orderkey": pa.array(keys, pa.int64()),
                  "o_totalprice": pa.array(prices, pa.float64()),
                  "o_orderpriority": pa.array(
                      ["1-URGENT"] * len(keys), pa.string()),
                  "o_custkey": pa.array(keys, pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    return str(tmp_path)


def test_orders_upsert_empty_changelog(ray_session, tmp_path):
    """A base whose keys contain no %7/%31 multiples derives an EMPTY
    changelog; the broadcast probe must keep every row (round 3 crashed
    indexing zero-length delta arrays)."""
    from spacy_crfsuite_ray.ops import relational

    sf = _write_orders(tmp_path, [1, 2, 3, 4, 5],
                       [10.0, 20.0, 30.0, 40.0, 50.0])
    df = relational.orders_upsert(sf).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    assert len(df) == 5
    assert (df["op"] == "K").all()
    assert df["price_c2"].tolist() == [1000, 2000, 3000, 4000, 5000]


def test_order_priority_pivot_drops_unknown_custkey(ray_session, tmp_path):
    """Inner-join semantics: an o_custkey missing from customer is DROPPED
    (the oracle's join drops it), never grouped under a null segment."""
    from spacy_crfsuite_ray.ops import relational

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                  "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"],
                                           pa.string())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 2, 99], pa.int64()),
                  "o_orderpriority": pa.array(
                      ["1-URGENT", "2-HIGH", "1-URGENT"], pa.string())}),
        str(tmp_path / "orders.parquet"),
    )
    df = relational.order_priority_pivot(str(tmp_path)).to_pandas()
    assert set(df["c_mktsegment"]) == {"BUILDING", "AUTOMOBILE"}
    # the custkey-99 order contributes nowhere
    num = df.drop(columns=["c_mktsegment"]).to_numpy().sum()
    assert num == 2


def test_mentions_batch_vectorized(ray_session):
    """Null and empty entities lists produce no rows; populated lists
    explode with the url repeated per mention."""
    from spacy_crfsuite_ray.stages.relations import mentions_batch

    ent_t = pa.struct([("value", pa.string()), ("entity", pa.string()),
                       ("confidence", pa.float64())])
    ents = pa.array(
        [[{"value": "v1", "entity": "T1", "confidence": 0.9},
          {"value": "v2", "entity": "T2", "confidence": 0.8}],
         [], None,
         [{"value": "v3", "entity": "T1", "confidence": 0.7}]],
        pa.list_(ent_t),
    )
    batch = pa.table({"url": pa.array(["u1", "u2", "u3", "u4"]),
                      "entities": ents})
    out = mentions_batch(batch)
    assert out.column("url").to_pylist() == ["u1", "u1", "u4"]
    assert out.column("value").to_pylist() == ["v1", "v2", "v3"]
    assert out.column("type").to_pylist() == ["T1", "T2", "T1"]
    assert out.column("confidence").to_pylist() == [0.9, 0.8, 0.7]

    empty = mentions_batch(batch.slice(1, 2))
    assert empty.num_rows == 0
    assert empty.schema.names == ["url", "value", "type", "confidence"]


def test_ngram_top_no_global_sort(ray_session, con):
    """ngram_top returns a driver table built from per-block top-k
    candidates — same 20 rows as the full-sort SQL oracle."""
    import __ray_entry__ as E

    got = E.queries()["ngram_top"](SF)
    assert isinstance(got, pa.Table)
    want = con.execute(E.oracle_sql()["ngram_top"]).fetchdf()
    pd.testing.assert_frame_equal(
        got.to_pandas(), want, check_dtype=False
    )
