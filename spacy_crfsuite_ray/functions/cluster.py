"""Cluster-size-aware tuning knobs shared by the distributed operators."""

from __future__ import annotations


def join_partitions(cap: int = 32) -> int:
    """Hash-join partition count bounded by cluster CPUs.

    Ray's hash-shuffle join (Ray 2.49) schedules one aggregator actor per
    partition; asking for more partitions than the cluster has CPUs leaves
    aggregators unschedulable and the join hangs. On a real cluster the cap
    should track total cores — callers can pass a larger cap.
    """
    import ray

    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", cap))
            return max(2, min(cap, cpus))
    except Exception:
        pass
    return max(2, min(cap, 8))
