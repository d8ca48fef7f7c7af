"""Resumable output: kill mid-run, resume, verify completeness + skip."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from kaza_lcms_ray import lineage


def _flagship_ds(synth_small):
    from kaza_lcms_ray.pipelines import flagship

    return flagship.tile_assignments(synth_small)


def test_resume_after_injected_failure(synth_small, ray_session, tmp_path):
    out = str(tmp_path / "tiles_out")
    ds = _flagship_ds(synth_small)

    # first run fails on two partitions → those (and possibly later ones)
    # are missing
    with pytest.raises(Exception):
        lineage.resumable_write(
            ds, out, key_col="doc_id", num_parts=16, config_hash="cfg1",
            _fail_parts={3, 7},
        )
    done_after_fail = lineage.finished_parts(out, "cfg1")
    assert len(done_after_fail) < 16

    # record mtimes of finished partitions: resume must not rewrite them
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"part={p:05d}/data.parquet"))
        for p in done_after_fail
    }

    # resume (no failure): only unfinished parts are written
    ds2 = _flagship_ds(synth_small)
    written, skipped = lineage.resumable_write(
        ds2, out, key_col="doc_id", num_parts=16, config_hash="cfg1"
    )
    assert skipped == len(done_after_fail)
    assert written == 16 - skipped
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f"part={p:05d}/data.parquet")) == m

    # completeness: partitioned output == direct materialization
    got = lineage.read_output(out).to_pandas()
    exp = _flagship_ds(synth_small).to_pandas()
    assert len(got) == len(exp)
    key = ["doc_id", "span_idx"]
    assert set(map(tuple, got[key].to_numpy())) == set(map(tuple, exp[key].to_numpy()))


def test_config_hash_invalidates(synth_small, ray_session, tmp_path):
    out = str(tmp_path / "tiles_out2")
    ds = _flagship_ds(synth_small)
    lineage.resumable_write(ds, out, num_parts=4, config_hash="A")
    assert len(lineage.finished_parts(out, "A")) == 4
    # different config hash → nothing counts as finished
    assert lineage.finished_parts(out, "B") == set()


def test_deleted_part_and_sidecar_redone(synth_small, ray_session, tmp_path):
    """A part that vanished entirely mid-run (data file AND lineage sidecar
    gone — e.g. the node died before the atomic publish) is rewritten on
    resume, and ONLY that part; finished parts are untouched."""
    out = str(tmp_path / "tiles_out4")
    ds = _flagship_ds(synth_small)
    lineage.resumable_write(ds, out, num_parts=8, config_hash="A")
    victim = 2
    os.remove(os.path.join(out, f"part={victim:05d}/data.parquet"))
    os.remove(os.path.join(out, lineage.LINEAGE_DIR, f"part-{victim:05d}.json"))
    # a killed writer can also leave a stale tmp behind — must be inert
    stale = os.path.join(out, f"part={victim:05d}/data.parquet.tmp.99999")
    with open(stale, "wb") as f:
        f.write(b"half-written")
    assert victim not in lineage.finished_parts(out, "A")
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"part={p:05d}/data.parquet"))
        for p in range(8)
        if p != victim
    }
    ds2 = _flagship_ds(synth_small)
    written, skipped = lineage.resumable_write(ds2, out, num_parts=8, config_hash="A")
    assert written == 1 and skipped == 7
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f"part={p:05d}/data.parquet")) == m
    got = lineage.read_output(out).to_pandas()
    exp = _flagship_ds(synth_small).to_pandas()
    assert len(got) == len(exp)
    key = ["doc_id", "span_idx"]
    assert set(map(tuple, got[key].to_numpy())) == set(map(tuple, exp[key].to_numpy()))


def test_sidecar_without_data_redone(synth_small, ray_session, tmp_path):
    """Lineage record present but data file missing (publish order is
    data-then-sidecar, so this means post-hoc loss): part is not finished
    and resume rewrites it."""
    out = str(tmp_path / "tiles_out5")
    ds = _flagship_ds(synth_small)
    lineage.resumable_write(ds, out, num_parts=4, config_hash="A")
    os.remove(os.path.join(out, "part=00003/data.parquet"))
    assert 3 not in lineage.finished_parts(out, "A")
    ds2 = _flagship_ds(synth_small)
    written, skipped = lineage.resumable_write(ds2, out, num_parts=4, config_hash="A")
    assert written == 1 and skipped == 3
    assert pq.read_metadata(os.path.join(out, "part=00003/data.parquet")).num_rows > 0


def test_corrupt_data_file_redone(synth_small, ray_session, tmp_path):
    out = str(tmp_path / "tiles_out3")
    ds = _flagship_ds(synth_small)
    lineage.resumable_write(ds, out, num_parts=4, config_hash="A")
    victim = os.path.join(out, "part=00001/data.parquet")
    with open(victim, "wb") as f:
        f.write(b"corrupt")
    assert 1 not in lineage.finished_parts(out, "A")
    ds2 = _flagship_ds(synth_small)
    written, skipped = lineage.resumable_write(ds2, out, num_parts=4, config_hash="A")
    assert written == 1 and skipped == 3
    assert pq.read_metadata(victim).num_rows > 0
