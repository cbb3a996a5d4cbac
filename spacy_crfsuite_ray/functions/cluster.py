"""Cluster-size-aware tuning knobs shared by the distributed operators."""

from __future__ import annotations


ROWS_PER_JOIN_PARTITION = 250_000


def join_partitions(cap: int = 32, rows: int | None = None) -> int:
    """Hash-join partition count bounded by cluster CPUs and input size.

    Ray's hash-shuffle join (Ray 2.49) schedules one aggregator actor per
    partition; asking for more partitions than the cluster has CPUs leaves
    aggregators unschedulable and the join hangs. Actor startup is also the
    dominant cost for small inputs (measured: a 600k-row join drops 12s → 4s
    going 32 → 8 partitions), so when the caller knows the input row count
    (parquet footer metadata — free) partitions scale with data volume and
    only reach the CPU bound on genuinely large inputs.
    """
    import os

    import ray

    cpus = None
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cpus = None
    if cpus is None:
        # Ray not (yet) initialized: bound by the machine's cores — a local
        # auto-init will see at most these, and over-requesting partitions
        # would hang the join's aggregator actors
        cpus = os.cpu_count() or 8
    p = min(cap, cpus)
    if rows is not None:
        p = min(p, -(-int(rows) // ROWS_PER_JOIN_PARTITION))
    return max(1, min(p, cpus))


def coalesce_small(ds, cap: int = 2):
    """Coalesce a PRE-COMBINED stream before its final low-cardinality
    groupby. After a per-batch partial aggregate the stream holds at most
    (blocks x groups) tiny rows, but Ray's sort-shuffle still schedules one
    reduce partition per input block — at fixture scale that is dozens of
    reduce tasks for a 5-row result (task overhead dominates, measured 4.2s
    → 0.3s on a 5-group count), and the empty reduce partitions emit
    schema-less blocks that trip the executor's schema-drift warning on
    every run. ``repartition(k)`` here is a block coalesce (split/concat of
    pre-reduced rows), NOT a data shuffle; only use it on streams already
    shrunk by a combiner. ``cap`` stays BELOW the result's group count so
    neither the split nor the sort-groupby reduce produces empty
    partitions (block-less bundles carry no schema and re-trip the
    warning at every downstream operator)."""
    return ds.repartition(join_partitions(cap=cap))
