"""Per-partition lineage + resumable output (SURVEY.md §4 checkpoint row).

Reference analog: persisted EE assets + check_exists idempotent skip
(src/01composite_s2.py:85-102; src/utils/exports.py:21-34; "Image already
exists" skip).  Here, properly: the output is laid out one directory per
hash partition with an atomic data file and a lineage sidecar
(`_lineage/part-NNNN.json` holding row count, config hash, schema).  A rerun
reads the lineage dir, verifies each finished partition, and filters those
partitions out at the *start* of the pipeline — the streaming plan never
touches finished work.

Partitioning is by hash(doc_id) % num_parts: stable across runs, partition
count chosen by the caller (at 100 TB: thousands of partitions so a lost
node re-does 1/N of the work).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .state.hashing import hash_key

LINEAGE_DIR = "_lineage"


def _part_of(t: pa.Table, key_col: str, num_parts: int) -> np.ndarray:
    col = t.column(key_col)
    if pa.types.is_integer(col.type):
        keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        from .stages.sampling import _str_h

        keys = np.asarray([_str_h(s) for s in col.to_pylist()], dtype=np.uint64)
    return (hash_key(1, "part", keys) % np.uint64(num_parts)).astype(np.int64)


def finished_parts(out_dir: str, config_hash: str) -> set[int]:
    """Partitions with a verified lineage record (matching config + intact
    data file)."""
    ldir = os.path.join(out_dir, LINEAGE_DIR)
    done: set[int] = set()
    if not os.path.isdir(ldir):
        return done
    for fn in os.listdir(ldir):
        if not fn.endswith(".json"):
            continue
        try:
            rec = json.load(open(os.path.join(ldir, fn)))
        except (json.JSONDecodeError, OSError):
            continue
        if rec.get("config_hash") != config_hash:
            continue
        data = os.path.join(out_dir, rec["path"])
        try:
            if pq.read_metadata(data).num_rows == rec["rows"]:
                done.add(int(rec["part"]))
        except Exception:
            continue  # truncated/corrupt data file → redo the partition
    return done


def resumable_write(
    ds,
    out_dir: str,
    key_col: str = "doc_id",
    num_parts: int = 64,
    config_hash: str = "",
    _fail_parts: set[int] | None = None,
):
    """Write ``ds`` partitioned + lineage-tracked; skips finished partitions.

    Returns (n_written_parts, n_skipped_parts).  ``_fail_parts`` is a test
    hook injecting a mid-run failure.
    """
    os.makedirs(os.path.join(out_dir, LINEAGE_DIR), exist_ok=True)
    done = finished_parts(out_dir, config_hash)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(_part_of(t, key_col, num_parts)))

    def not_done(t: pa.Table) -> pa.Table:
        if not done:
            return t
        mask = ~np.isin(t.column("__part").to_numpy(zero_copy_only=False), list(done))
        return t.filter(pa.array(mask))

    fail = _fail_parts or set()

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        if part in fail:
            raise RuntimeError(f"injected failure on part {part}")
        g = g.drop(columns="__part").sort_values(
            [key_col] + [c for c in g.columns if c in ("span_idx",)],
            kind="mergesort",
        )
        rel = f"part={part:05d}/data.parquet"
        final = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)  # atomic publish
        rec = {
            "part": part,
            "path": rel,
            "rows": int(len(g)),
            "config_hash": config_hash,
            "columns": [c for c in g.columns],
        }
        ltmp = os.path.join(out_dir, LINEAGE_DIR, f"part-{part:05d}.json.tmp")
        with open(ltmp, "w") as f:
            json.dump(rec, f)
        os.replace(ltmp, os.path.join(out_dir, LINEAGE_DIR, f"part-{part:05d}.json"))
        return pd.DataFrame({"part": [part], "rows": [len(g)]})

    summary = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .map_batches(not_done, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_part, batch_format="pandas")
    )
    written = summary.to_pandas()
    return len(written), len(done)


def read_output(out_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        [
            os.path.join(out_dir, d, "data.parquet")
            for d in sorted(os.listdir(out_dir))
            if d.startswith("part=")
        ]
    )
