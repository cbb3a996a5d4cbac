"""The four flagship KG outputs vs their DuckDB oracles: triples re-read
from the pipeline's own written parquet, edges re-AGGREGATED from the
triples, mentions re-exploded from the tagged checkpoint, and nodes'
n_mentions re-derived end-to-end (tagged mentions → SQL re-normalization →
written mapping artifact → regroup)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def _df(x):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(x, (rd.Dataset, pa.Table)):
        return x.to_pandas()
    return x


def _compare(ray_result, sql):
    a = _df(ray_result)
    b = duckdb.connect().execute(sql).fetchdf()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize(
    "name,oracle",
    [
        ("kg_triples", E._triples_oracle),
        ("kg_edges", E._edges_oracle),
        ("kg_mentions", E._mentions_oracle),
        ("kg_nodes", E._nodes_oracle),
        ("kg_triangles", E._triangles_oracle),
    ],
)
def test_kg_output_matches_oracle(ray_session, name, oracle):
    got = E.queries()[name](SF)
    assert _df(got).shape[0] > 0
    _compare(got, oracle(SF))
