"""Sinks: projected CSV export, idempotent table writes, local metrics
(SURVEY.md S6-S11).

* ``export_csv`` — Export.table.toDrive with ``selectors`` column projection
  (src/utils/exports.py:36-45; src/00sample_pts.py:208).
* ``export_table`` — Export.table.toAsset with the check_exists idempotent
  skip (src/utils/exports.py:21-34; src/utils/check_exists.py:4-9).
* ``write_metrics`` — the per-class OOB/importance/accuracy local writers
  (src/utils/primitives.py:18-30; src/misc/05accuracy.py:151-163).
"""

from __future__ import annotations

import os

import pandas as pd


def export_csv(ds, path: str, selectors: list[str] | None = None):
    """Write a Dataset to a CSV directory, optionally projecting columns
    first (the reference's LON,LAT,PLOTID,SAMPLEID selectors pattern)."""
    if selectors:
        ds = ds.select_columns(selectors)
    ds.write_csv(path)
    return path


def export_table(ds, path: str, overwrite: bool = False) -> bool:
    """Idempotent parquet export: skip when the output already exists
    (reference prints 'Asset already exists' and moves on)."""
    if os.path.exists(path) and not overwrite:
        return False
    tmp = path + ".tmp"
    ds.write_parquet(tmp)
    os.replace(tmp, path) if not os.path.isdir(tmp) else os.rename(tmp, path)
    return True


def write_metrics(models: dict, report: dict | None, out_dir: str):
    """Per-class OOB/importance CSVs + confusion matrix, driver-side."""
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for c, m in sorted(models.items()):
        rows.append({"class": c, "oob_error": m["oob"], "n_features": len(m["features"])})
        pd.DataFrame(
            sorted(m["importance"].items(), key=lambda kv: -kv[1]),
            columns=["feature", "importance"],
        ).to_csv(os.path.join(out_dir, f"importance_class{c}.csv"), index=False)
    pd.DataFrame(rows).to_csv(os.path.join(out_dir, "oob.csv"), index=False)
    if report is not None:
        cm = pd.DataFrame(
            report["matrix"], index=report["classes"], columns=report["classes"]
        )
        cm.to_csv(os.path.join(out_dir, "confusion_matrix.csv"))
        pd.DataFrame(
            {
                "class": report["classes"],
                "producers_accuracy": report["producers_accuracy"],
                "users_accuracy": report["users_accuracy"],
                "f1": report["f1"],
            }
        ).to_csv(os.path.join(out_dir, "accuracy_by_class.csv"), index=False)
        with open(os.path.join(out_dir, "overall.txt"), "w") as f:
            f.write(f"overall_accuracy={report['overall_accuracy']:.6f}\n")
    return out_dir


def export_jsonl(ds, path: str, selectors: list[str] | None = None):
    """Write a Dataset to a JSONL directory (one .json part per block —
    the interchange format curation pipelines exchange document dumps
    in).  Block-parallel like the parquet sink; same resumable
    one-part-per-block layout."""
    if selectors:
        ds = ds.select_columns(selectors)
    ds.write_json(path)
    return path


def read_jsonl(path: str, columns: list[str] | None = None):
    """Read a JSONL directory back into a Dataset (block-per-file)."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds
