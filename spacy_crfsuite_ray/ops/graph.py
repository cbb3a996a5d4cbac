"""Graph analytics over the constructed knowledge graph.

PageRank here is defined in FIXED-POINT INTEGER arithmetic (scaled by
``PR_SCALE``): every per-edge contribution is an int64 floor division and
every combine is an int64 sum, so the result is bit-identical no matter how
Ray's shuffle orders the additions — the same order-independence trick as
``ops.ann.embedding_centroids``. That makes the distributed pipeline and the
driver numpy twin comparable with ``==``, not a tolerance.

Reference parity: spacy_crfsuite (crf_extractor.py) stops at entity
extraction; graph analytics over the assembled KG is part of the
kg-construction brief this engine targets, not the reference library.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PR_SCALE = 10**12          # ranks are int64 multiples of 1/PR_SCALE
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as an exact rational
PR_ITERS = 10

# Below this many edges the whole graph fits one driver numpy pass (a KG's
# edge list is aggregated output, orders of magnitude smaller than the page
# corpus); above it the iterative Dataset join/groupby twin runs.
PAGERANK_DRIVER_MAX_EDGES = 2_000_000


def _pr_step_driver(r, src, dst, outdeg, n, base):
    """One fixed-point PageRank step over dense-coded edges (driver twin)."""
    contrib = r[src] // outdeg[src]
    in_sum = np.zeros(n, dtype=np.int64)
    np.add.at(in_sum, dst, contrib)
    dangling = int(r[outdeg == 0].sum())
    share = dangling // n
    return base + (PR_DAMP_NUM * (in_sum + share)) // PR_DAMP_DEN


def _pagerank_driver(nodes: np.ndarray, src: np.ndarray,
                     dst: np.ndarray, iters: int) -> np.ndarray:
    n = len(nodes)
    code = {v: i for i, v in enumerate(nodes.tolist())}
    s = np.array([code[v] for v in src.tolist()], dtype=np.int64)
    d = np.array([code[v] for v in dst.tolist()], dtype=np.int64)
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, s, 1)
    base = (PR_SCALE // n) * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    r = np.full(n, PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        r = _pr_step_driver(r, s, d, outdeg, n, base)
    return r


def _pagerank_distributed(edges_tbl: pa.Table, nodes: np.ndarray,
                          iters: int) -> np.ndarray:
    """Iterative Dataset twin: per round, ship rank//outdeg along each edge
    (edges ⋈ ranks hash-join), fold with groupby-sum, rebase. Driver traffic
    per round is ONE scalar (the dangling mass); ranks/edges stay in the
    object store. Identical int64 ops → byte-identical to the driver twin
    (equality-tested)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.cluster import join_partitions
    from ..functions.tables import stable_rename

    n = len(nodes)
    parts = join_partitions(rows=edges_tbl.num_rows)
    edges = rd.from_arrow(edges_tbl).materialize()
    deg_tbl = (
        pa.table({"node": edges_tbl.column("src")})
        .group_by("node").aggregate([([], "count_all")])
        .rename_columns(["node", "outdeg"])
    )
    # outdeg for every node (0 for sinks), built once on the driver from the
    # edge table already present here; shipped to the store once
    deg_map = dict(zip(deg_tbl.column("node").to_pylist(),
                       deg_tbl.column("outdeg").to_pylist()))
    outdeg_all = np.array([deg_map.get(v, 0) for v in nodes.tolist()],
                          dtype=np.int64)
    base = (PR_SCALE // n) * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    node_deg = rd.from_arrow(
        pa.table({"node": pa.array(nodes, pa.string()),
                  "outdeg": pa.array(outdeg_all, pa.int64())})
    ).materialize()
    ranks = rd.from_arrow(
        pa.table({"node": pa.array(nodes, pa.string()),
                  "r": pa.array(np.full(n, PR_SCALE // n, np.int64))})
    )
    for _ in range(iters):
        rd_full = ranks.join(
            node_deg, join_type="inner", num_partitions=parts, on=("node",),
        ).materialize()
        # dangling mass: one scalar to the driver per round
        sinks = rd_full.filter(expr="outdeg == 0")
        dangling = int(sinks.sum("r") or 0) if sinks.count() else 0
        share = dangling // n

        def contrib(batch: pa.Table) -> pa.Table:
            r = np.asarray(batch.column("r"), dtype=np.int64)
            deg = np.asarray(batch.column("outdeg"), dtype=np.int64)
            return pa.table(
                {"node": batch.column("dst"),
                 "c": pa.array(r // np.maximum(deg, 1), pa.int64())}
            )

        srcs = rd_full.filter(expr="outdeg > 0").map_batches(
            lambda t: pa.table({"src": t.column("node"),
                                "r": t.column("r"),
                                "outdeg": t.column("outdeg")}),
            batch_format="pyarrow",
        )
        in_sums = (
            edges.join(srcs, join_type="inner", num_partitions=parts,
                       on=("src",))
            .map_batches(contrib, batch_format="pyarrow")
            .union(
                rd.from_arrow(
                    pa.table({"node": pa.array(nodes, pa.string()),
                              "c": pa.array(np.zeros(n, np.int64))})
                )
            )
            .groupby("node")
            .aggregate(Sum("c"))
            .map_batches(
                stable_rename(["node", "in_sum"],
                              [pa.string(), pa.int64()]),
                batch_format="pyarrow",
            )
        )

        def rebase(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column("in_sum"), dtype=np.int64)
            newr = base + (PR_DAMP_NUM * (s + share)) // PR_DAMP_DEN
            return pa.table({"node": batch.column("node"),
                             "r": pa.array(newr, pa.int64())})

        ranks = in_sums.map_batches(
            rebase, batch_format="pyarrow"
        ).materialize()
    out = pa.concat_tables(
        list(ranks.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    rank_of = dict(zip(out.column("node").to_pylist(),
                       out.column("r").to_pylist()))
    return np.array([rank_of[v] for v in nodes.tolist()], dtype=np.int64)


def pagerank_from_edges(edges_tbl: pa.Table,
                        iters: int = PR_ITERS) -> pa.Table:
    """(node_id, rank_c12) over a directed (src, dst) edge table. Node set =
    all edge endpoints; dangling (sink) mass redistributes uniformly.
    Threshold-gated driver/distributed twins, byte-identical by the
    fixed-point construction (equality-tested)."""
    if edges_tbl.num_rows == 0:
        return pa.table({"node_id": pa.array([], pa.string()),
                         "rank_c12": pa.array([], pa.int64())})
    src = np.asarray(edges_tbl.column("src"))
    dst = np.asarray(edges_tbl.column("dst"))
    nodes = np.unique(np.concatenate([src, dst]))
    if edges_tbl.num_rows <= PAGERANK_DRIVER_MAX_EDGES:
        r = _pagerank_driver(nodes, src, dst, iters)
    else:
        r = _pagerank_distributed(edges_tbl, nodes, iters)
    return pa.table({"node_id": pa.array(nodes.tolist(), pa.string()),
                     "rank_c12": pa.array(r, pa.int64())})


def degree_stats_from_edges(tbl: pa.Table) -> pa.Table:
    """Degree distribution of a directed graph: per (degree kind, degree)
    node counts — the quick structural health check (hub detection,
    disconnected fraction) run after every KG build. Two tiny groupbys over
    the (src, dst) edge table."""
    out = []
    for kind, col in (("out", "src"), ("in", "dst")):
        deg = (
            pa.table({"node": tbl.column(col)})
            .group_by("node").aggregate([([], "count_all")])
        )
        hist = (
            pa.table({"degree": deg.column("count_all")})
            .group_by("degree").aggregate([([], "count_all")])
            .rename_columns(["degree", "n_nodes"])
        )
        out.append(
            hist.append_column(
                "kind", pa.array([kind] * hist.num_rows, pa.string())
            )
        )
    res = pa.concat_tables(out)
    order = pc.sort_indices(
        res, sort_keys=[("kind", "ascending"), ("degree", "ascending")]
    )
    return res.take(order).select(["kind", "degree", "n_nodes"])


def cooccurrence_from_mentions(ds, rows_hint: int | None = None) -> "object":
    """Entity co-occurrence (KG edge weighting): for every unordered pair of
    distinct entity mentions ("type:value") on the same page, the number of
    pages where they co-occur. The standard evidence-weighted
    KG-enrichment edge, computed without an all-pairs pass:

    100 TB shape: mention rows dedupe per (url, key) inside each batch (one
    Arrow group_by), ONE url-key shuffle co-locates a page's mentions
    (pages have tiny mention sets), pairs explode inside the group, and a
    per-batch pair-count combiner feeds the final (a, b) groupby — raw
    sentence text never enters this pipeline."""
    import pandas as pd

    from ..functions.cluster import coalesce_small
    from ..functions.tables import stable_rename

    def keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("url", pa.string()), ("k", pa.string())]
            ).empty_table()
        k = pc.binary_join_element_wise(
            pc.cast(batch.column("type"), pa.string()),
            pc.cast(batch.column("value"), pa.string()),
            ":",
        )
        return (
            pa.table({"url": batch.column("url"), "k": k})
            .group_by(["url", "k"]).aggregate([])
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(group["k"].to_numpy())
        ai, bi = np.triu_indices(len(ks), k=1)
        return pd.DataFrame({"a": ks[ai], "b": ks[bi]})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("a", pa.string()), ("b", pa.string()),
                 ("n", pa.int64())]
            ).empty_table()
        t = batch.append_column(
            "n", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )
        return t.group_by(["a", "b"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["a", "b", "n"])

    from ..functions.cluster import join_partitions

    keyed = ds.map_batches(keys, batch_format="pyarrow")
    # the mention stream is far smaller than its source block count (it came
    # out of a wide read); coalescing to a row-scaled partition count before
    # the url shuffle keeps sort task fan-out proportional to DATA, not to
    # the upstream read's block count (fixture-scale: 64 sort partitions ->
    # 1, total wall 10.6s -> 7.7s). rows_hint comes free from parquet
    # footers.
    keyed = keyed.repartition(join_partitions(cap=16, rows=rows_hint))
    return (
        coalesce_small(
            keyed.groupby("url")
            .map_groups(pairs, batch_format="pandas")
            .map_batches(partial, batch_format="pyarrow"),
            cap=2,
        )
        .groupby(["a", "b"])
        .sum("n")
        .map_batches(
            stable_rename(["a", "b", "n_pages"],
                          [pa.string(), pa.string(), pa.int64()]),
            batch_format="pyarrow",
        )
    )
