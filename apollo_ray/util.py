"""Small execution utilities."""

from __future__ import annotations


def join_partitions(requested: int | None = None) -> int:
    """Partition count for ``Dataset.join``.

    Ray's hash join runs one aggregator actor per partition; asking for
    more partitions than available CPUs deadlocks the actor pool on a
    small cluster (observed: 2 chained joins x 32 partitions on 8 CPUs
    never schedule).  Cap at half the cluster CPUs, floor 2.
    """
    import ray
    cpus = 8.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 8.0)
    cap = max(2, int(cpus) // 2)
    if requested is None:
        return cap
    return max(2, min(requested, cap))


def hash_join(left, right, on: tuple, right_on: tuple | None = None,
              join_type: str = "inner", num_partitions: int | None = None):
    """``Dataset.join`` with deadlock-safe sizing.

    Aggregator actors get fractional CPUs so a join co-scheduled with
    upstream actor pools on a small CPU budget (e.g. the 4-CPU test
    session) can always place its actors; partition count is capped by
    ``join_partitions``.
    """
    return left.join(
        right, join_type=join_type,
        num_partitions=join_partitions(num_partitions),
        on=on, right_on=right_on,
        aggregator_ray_remote_args={"num_cpus": 0.5})
