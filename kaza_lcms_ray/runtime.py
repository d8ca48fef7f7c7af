"""Cluster-aware sizing helpers.

Every stage that reserves CPUs (actor pools, hash-shuffle joins) must leave
headroom for the read/write/shuffle operators or the streaming plan
deadlocks — an actor pool that grabs every CPU starves the join aggregators
that need to start alongside it.  These helpers size pools as a *fraction* of
the session's CPUs so the same pipeline code runs at num_cpus=4 (tests),
8/32 (bench scaling levels) and on a real multi-node cluster.
"""

from __future__ import annotations

import logging

import ray

logger = logging.getLogger(__name__)


class DriverCollectBoundExceeded(RuntimeError):
    """A driver-side materialization outgrew its documented row bound."""


def bounded_collect(ds, max_rows: int, reason: str):
    """Materialize a claimed-small Dataset to pandas, ENFORCING the claim.

    Every driver-side ``.to_pandas()`` in this repo is justified by a
    docstring bound ("≤ k² contingency rows", "vocab ≤ top-M words", …).
    This helper makes that bound executable: the dataset is materialized
    ONCE (so the row count is metadata, not a second plan execution), and
    if it exceeds ``max_rows`` we raise instead of silently OOM-ing the
    driver at 100 TB.  ``reason`` names the bound for the error message.

    Returns exactly what ``ds.to_pandas()`` would (same block-builder
    path), so routing a call site through here never changes results.
    """
    mat = ds.materialize()
    n = mat.count()
    if n > max_rows:
        raise DriverCollectBoundExceeded(
            f"driver collect of {n} rows exceeds the documented bound of "
            f"{max_rows} ({reason}); the operator's small-side assumption "
            f"does not hold on this input — redesign or raise the bound"
        )
    return mat.to_pandas()


def cluster_cpus() -> int:
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 4))
    return 4


def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 64) -> int:
    """Actor-pool size: ``frac`` of cluster CPUs, clamped to [lo, hi]."""
    return max(lo, min(hi, int(cluster_cpus() * frac)))


def join_partitions(rows_hint: int | None = None) -> int:
    """Hash-join partition count: ~2 per CPU, bounded."""
    base = max(4, cluster_cpus() * 2)
    if rows_hint is not None:
        base = min(base, max(2, rows_hint // 10_000))
    return min(base, 256)
