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
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_table(path: str, columns=None, **kwargs):
    return read_documents(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
