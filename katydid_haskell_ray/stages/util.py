"""Shared stage helpers."""

from __future__ import annotations


def auto_concurrency(requested=None, *, cap: int | None = None):
    """Actor-pool sizing for stateful map_batches stages.

    ``None`` -> an autoscaling ``(2, cpus-2)`` pool: the stage can take the
    node when it is the bottleneck but releases CPUs as it drains, so no
    stage starves (a fixed tiny pool caps the stage at that many actors no
    matter how many CPUs are idle — Ray warns exactly this).  An explicit
    int/tuple passes through for tests that pin pool size."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    hi = max(2, cpus - 2)
    if cap is not None:
        hi = min(hi, cap)
    return (2, hi) if hi > 2 else 2
