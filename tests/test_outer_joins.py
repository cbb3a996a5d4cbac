"""Outer-join ops: zero-fill paths the sf fixtures never exercise.

Every sf-scale customer has at least one order, so customer_order_profile's
LEFT OUTER zero-fill is dead there (the sf oracle equality in test_ops.py
still holds). This fixture plants a customer with no orders and an order
whose customer has no events, and checks both ops against the same DuckDB
oracles the driver runs.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("outerfix")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_mktsegment": pa.array(
                    ["BUILDING", "MACHINERY", "BUILDING", "HOUSEHOLD"]
                ),
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # custkey 3 never orders; custkey 4 orders below the big
                # threshold only
                "o_custkey": pa.array([1, 1, 2, 4], pa.int64()),
                "o_totalprice": pa.array(
                    [350000.0, 120000.5, 410000.25, 99.99], pa.float64()
                ),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # user 4 has events but no big order; user 2 has a big
                # order but no events
                "user_id": pa.array([1, 4, 4], pa.int64()),
                "value": pa.array([10.5, 3.25, 7.0], pa.float64()),
                # ts spans two weeks so user_retention has a nonzero offset
                "ts": pa.array(
                    [1704067200000000, 1704067300000000, 1704672000000000],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def fix_con(fixture_dir):
    con = duckdb.connect()
    for t in ["customer", "orders", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fixture_dir}/{t}.parquet'"
        )
    return con


from conftest import assert_matches_oracle as _cmp  # noqa: E402


def test_left_outer_zero_fills_orderless_customer(ray_session, fixture_dir,
                                                  fix_con):
    from spacy_crfsuite_ray.ops import relational

    a = _cmp(
        relational.customer_order_profile(fixture_dir),
        relational.customer_order_profile_sql(),
        fix_con,
    )
    by_key = a.set_index("c_custkey")
    assert len(a) == 4  # every customer survives the left outer join
    assert by_key.loc[3, "n_orders"] == 0
    assert by_key.loc[3, "spent_c2"] == 0
    assert by_key.loc[1, "n_orders"] == 2
    assert by_key.loc[1, "spent_c2"] == 35000000 + 12000050


def test_full_outer_keeps_both_unmatched_sides(ray_session, fixture_dir,
                                               fix_con):
    from spacy_crfsuite_ray.ops import relational

    a = _cmp(
        relational.user_activity_ledger(fixture_dir),
        relational.user_activity_ledger_sql(),
        fix_con,
    )
    by_key = a.set_index("user_key")
    # user 4: events only (order below threshold) -> big-order side zeroed
    assert by_key.loc[4, "n_events"] == 2
    assert by_key.loc[4, "n_big_orders"] == 0
    # user 2: big order only, no events -> event side zeroed
    assert by_key.loc[2, "n_events"] == 0
    assert by_key.loc[2, "n_big_orders"] == 1
    # user 1: matched on both sides
    assert by_key.loc[1, "n_events"] == 1
    assert by_key.loc[1, "n_big_orders"] == 1
    # user 3 appears on NEITHER side -> absent entirely
    assert 3 not in by_key.index


def test_event_funnel_empty_events_matches_oracle(ray_session, tmp_path):
    """Zero events: the engine's fold emits 0 per stage and the oracle's
    COALESCE(sum(), 0) must agree (bare sum() over zero rows is NULL)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spacy_crfsuite_ray.ops import relational

    d = tmp_path / "emptyev"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    a = _cmp(relational.event_funnel(str(d)),
             relational.event_funnel_sql(), con)
    assert a.n_users.tolist() == [0, 0, 0]

    # the other events-family ops must also agree with their oracles on
    # the empty table (typed-empty results, no crash). Results pass to the
    # comparator UNWRAPPED — ray.data.from_arrow drops the schema of a
    # 0-row table on to_pandas
    from spacy_crfsuite_ray.ops import sketch

    hh = _cmp(sketch.heavy_hitters(str(d)),
              sketch.heavy_hitters_sql(), con)
    assert len(hh) == 0
    r = _cmp(relational.user_retention(str(d)),
             relational.user_retention_sql(), con)
    assert len(r) == 0


def test_outer_join_driver_and_distributed_paths_equal(ray_session,
                                                       fixture_dir,
                                                       monkeypatch):
    """Below OUTER_JOIN_DRIVER_MAX_ROWS the outer joins run as one Arrow
    join kernel on the driver; forced onto the distributed shuffle join
    they must emit exactly the same rows (including the zero-filled
    unmatched sides this fixture plants)."""
    import pandas as pd

    from spacy_crfsuite_ray.ops import relational

    def frame(x):
        df = x.to_pandas() if hasattr(x, "to_pandas") else x
        return df[sorted(df.columns)].sort_values(
            sorted(df.columns)).reset_index(drop=True)

    for fn in [relational.customer_order_profile,
               relational.user_activity_ledger,
               relational.user_retention]:
        driver = frame(fn(fixture_dir))
        monkeypatch.setattr(relational, "OUTER_JOIN_DRIVER_MAX_ROWS", 0)
        dist = frame(fn(fixture_dir))
        monkeypatch.setattr(
            relational, "OUTER_JOIN_DRIVER_MAX_ROWS", 2_000_000
        )
        pd.testing.assert_frame_equal(driver, dist, check_dtype=False)
