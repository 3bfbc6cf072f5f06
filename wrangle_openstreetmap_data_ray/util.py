"""Small execution-sizing helpers shared by stages.

Ray Data's hash-shuffle ``Dataset.join`` schedules roughly one
CPU-holding aggregator actor per output partition; asking for more
partitions than the cluster has CPUs deadlocks the streaming executor
(observed in this sandbox: num_partitions=8 on a 4-CPU session never
completes). Size partitions from the live cluster instead of a constant.
"""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def join_partitions(requested: int | None = None) -> int:
    """Partition count for hash joins: capped at half the cluster CPUs so
    the join aggregator pool never starves the upstream map stages."""
    cap = max(2, cluster_cpus() // 2)
    if requested is None:
        return cap
    return max(2, min(requested, cap))


# Hash-join aggregator actors default to 1 whole CPU each; on a small
# cluster the eager map_batches actor pools + two chained joins then
# deadlock waiting on CPUs that are never released. Fractional CPUs keep
# the aggregators schedulable everywhere (they are I/O+concat bound).
JOIN_AGG_REMOTE_ARGS = {"num_cpus": 0.25}


def join_kwargs(requested: int | None = None) -> dict:
    return {
        "num_partitions": join_partitions(requested),
        "aggregator_ray_remote_args": dict(JOIN_AGG_REMOTE_ARGS),
    }


def pool_size(requested: int, reserve: int = 2) -> int:
    """Actor-pool concurrency that always leaves ``reserve`` CPUs free for
    downstream shuffle/aggregator actors."""
    return max(1, min(requested, cluster_cpus() - reserve))


def pool_spec(requested: int, reserve: int = 2) -> tuple[int, int]:
    """Autoscaling actor-pool (min, max) for ``map_batches(Cls, ...)``.

    A FIXED pool of size == cluster CPUs deadlocks the streaming executor:
    the pool's actors are created eagerly and hold every CPU, so upstream
    task-based ops (read/repartition) can never produce the pool's input
    (observed in this sandbox at num_cpus=4, concurrency=4). min=1 +
    a reserve-capped max keeps every topology live while still scaling out.
    """
    return (1, pool_size(requested, reserve))
