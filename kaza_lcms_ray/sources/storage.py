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
        # split finer than one-block-per-file: with blocks ≈ files, a session
        # whose CPU count exceeds the file count runs ragged half-empty
        # waves (measured: 60 files over 32 slots → ~35% idle tail).  Aim
        # for ~8 blocks per CPU; parquet row groups make files splittable.
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            kwargs["override_num_blocks"] = max(64, cpus * 2)
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_table(path: str, columns=None, **kwargs):
    return read_documents(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
