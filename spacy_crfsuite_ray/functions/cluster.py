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
    import ray

    p = cap
    try:
        if ray.is_initialized():
            p = min(cap, int(ray.cluster_resources().get("CPU", cap)))
    except Exception:
        p = min(cap, 8)
    if rows is not None:
        p = min(p, -(-int(rows) // ROWS_PER_JOIN_PARTITION))
    return max(2, p)
