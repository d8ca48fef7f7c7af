"""Storage seam: Lance at design scale, Parquet fallback in the sandbox.

BASELINE.json specifies Lance as the design-scale document format.  The
sandbox image has no ``pylance``, so reads/writes fall back to Parquet with
the identical logical schema — a storage limitation, not a semantic one
(SURVEY.md §7).  All engine code goes through these functions, never through
``ray.data.read_parquet`` directly for the document table.
"""

from __future__ import annotations

import ray.data as rd

try:  # pragma: no cover - not installed in the sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str, columns=None, **kwargs):
    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns, **kwargs)
    if "override_num_blocks" not in kwargs:
        # Pin blocks = max(2×CPUs, one-per-file), FLOORED by input bytes
        # (≥1 MiB per block).  Ray's default splitter cuts each ~50 MB file
        # into ~4 sub-file blocks; at that size the per-task overhead
        # dominates the downstream stages (measured at 32 CPUs / 3 M docs:
        # parse 1.7→0.7 s, pip 2.8→1.0 s, zonal_percentile 4.7→1.4 s — the
        # groupby all-to-all cost is O(map_blocks × reduce_partitions)).
        # The max() keeps the rule scale-safe: when files ≫ cluster slots
        # (the 100 TB case) this is exactly one block per file — never
        # merges files into giant blocks, and a handful of files on a big
        # cluster still split for occupancy.  The bytes floor only binds
        # for SMALL inputs (a 500-row table must not become 64 splinter
        # blocks whose empty-partition scheduling dominates every
        # downstream shuffle — measured 8.0→2.5 s on a two-exchange
        # pipeline at sf0.01).
        import math

        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            occupancy = max(cpus * 2, _n_files(path))
            by_bytes = max(1, math.ceil(_input_bytes(path) / (1 << 20)))
            kwargs["override_num_blocks"] = min(occupancy, by_bytes)
    return rd.read_parquet(path, columns=columns, **kwargs)


def _input_bytes(path) -> int:
    import glob
    import os

    if isinstance(path, (list, tuple)):
        return sum(_input_bytes(p) for p in path)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
        )
    return os.path.getsize(path) if os.path.exists(path) else 1 << 30


def _n_files(path) -> int:
    import glob
    import os

    if isinstance(path, (list, tuple)):
        return len(path)
    if os.path.isdir(path):
        return len(glob.glob(os.path.join(path, "*.parquet")))
    return 1


def read_table(path: str, columns=None, **kwargs):
    return read_documents(path, columns=columns, **kwargs)


def read_dim(path: str, columns=None, target_block_bytes: int = 64 << 20, **kwargs):
    """Dimension-table read: block count sized by FILE BYTES (one block per
    ~64 MB), capped at 2×CPUs.  A 100-row dim becomes ONE block instead of
    2×CPU splinters (whose per-task overhead dominates tiny groupbys), and
    a 10 GB dim still parallelizes across the cluster."""
    import glob
    import math
    import os

    import ray

    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=columns, **kwargs)
    if "override_num_blocks" not in kwargs:
        if os.path.isdir(path):
            sz = sum(os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet")))
        else:
            sz = os.path.getsize(path)
        cap = int(ray.cluster_resources().get("CPU", 8)) * 2 if ray.is_initialized() else 64
        kwargs["override_num_blocks"] = max(1, min(math.ceil(sz / target_block_bytes), cap))
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
