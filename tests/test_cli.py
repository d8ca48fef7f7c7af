"""CLI surface: the pretrain job end-to-end (write -> rerun skips) and a
genuinely lazy dry run."""

import os
import time


def test_pretrain_cli_roundtrip_and_dry_run(ray_session, tmp_path):
    from kaza_lcms_ray import cli

    out = str(tmp_path / "packs")
    rc = cli.main(["pretrain", "--sf", "0.001", "--out", out])
    assert rc == 0
    parts = [d for d in os.listdir(out) if d.startswith("part=")]
    assert len(parts) > 0

    # rerun: every partition skipped (lineage)
    rc = cli.main(["pretrain", "--sf", "0.001", "--out", out])
    assert rc == 0

    # dry run prints the plan without running the funnel's reduce stages —
    # it must return fast (the real build takes multiple seconds)
    t0 = time.perf_counter()
    rc = cli.main(["pretrain", "--sf", "0.001", "--out", str(tmp_path / "x"), "-d"])
    assert rc == 0
    assert time.perf_counter() - t0 < 3.0
    assert not os.path.exists(str(tmp_path / "x"))


def test_curate_cli_roundtrip_and_dry_run(ray_session, tmp_path):
    from kaza_lcms_ray import cli

    out = str(tmp_path / "curated")
    rc = cli.main(["curate", "--sf", "0.001", "--out", out, "--num-parts", "8"])
    assert rc == 0
    parts = [d for d in os.listdir(out) if d.startswith("part=")]
    assert len(parts) > 0

    # rerun: every partition skipped (lineage)
    rc = cli.main(["curate", "--sf", "0.001", "--out", out, "--num-parts", "8"])
    assert rc == 0

    t0 = time.perf_counter()
    rc = cli.main(["curate", "--sf", "0.001", "--out", str(tmp_path / "y"), "-d"])
    assert rc == 0
    assert time.perf_counter() - t0 < 3.0
    assert not os.path.exists(str(tmp_path / "y"))
