"""CLI entry points (SURVEY.md §2.10 #3).

Reference analog: the five console scripts with ``-d/--dry_run`` plan-only
mode and ``-r/--reshuffle`` seed control (setup.py:20-28;
src/00sample_pts.py:129-135,186-191).  Here: subcommands over the synth
tables with ``--dry-run`` printing the lazy logical plan without executing,
and ``--seed`` flowing into the PipelineConfig.

Usage:
    python -m kaza_lcms_ray.cli flagship  --sf 0.01 --out /tmp/out [--dry-run]
    python -m kaza_lcms_ray.cli landcover --sf 0.01 --out /tmp/lc  [--seed N]
    python -m kaza_lcms_ray.cli bench-queries --sf 0.001
"""

from __future__ import annotations

import argparse
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_flagship(args) -> int:
    from . import synth
    from .lineage import resumable_write
    from .pipelines import flagship

    root = synth.ensure(args.sf, seed=args.seed)
    _ensure_ray()
    ds = flagship.tile_assignments(root)
    if args.dry_run:
        print("DRY RUN — logical plan:")
        print(ds)
        return 0
    written, skipped = resumable_write(
        ds, args.out, key_col="doc_id", num_parts=args.num_parts,
        config_hash=f"flagship-seed{args.seed}",
    )
    print(f"wrote {written} partitions ({skipped} already complete) -> {args.out}")
    return 0


def cmd_landcover(args) -> int:
    from .config import PipelineConfig
    from . import synth
    from .pipelines import primitives as P

    cfg = PipelineConfig(seed=args.seed)
    root = synth.ensure(args.sf, seed=args.seed)
    _ensure_ray()
    train_df, test_df = P.build_training_table(root, cfg)
    models = P.train_primitives(train_df, cfg)
    labels = P.generate_landcover(root, models, cfg)
    if args.dry_run:
        print("DRY RUN — logical plan:")
        print(labels)
        return 0
    labels.write_parquet(args.out)
    scored = P.score(
        __import__("ray").data.from_pandas(test_df), models
    ).to_pandas()
    rep = P.confusion_report(
        scored["LANDCOVER"].to_numpy(), scored["LANDCOVER_pred"].to_numpy()
    )
    from .sources.sinks import write_metrics

    write_metrics(models, rep, args.out + "_metrics")
    print(
        f"landcover -> {args.out}; holdout overall accuracy "
        f"{rep['overall_accuracy']:.3f}; metrics -> {args.out}_metrics"
    )
    return 0


def cmd_sample_pts(args) -> int:
    """00sample_pts analog: stratified CEO points → projected CSV
    (src/00sample_pts.py:184-208)."""
    from . import synth
    from .pipelines import sample_pts

    root = synth.ensure(args.sf, seed=90210)
    _ensure_ray()
    pts = sample_pts.sample_pts_pipeline(
        root, year=args.year, n_points=args.n_points, seed=args.seed
    )
    if args.dry_run:
        print("DRY RUN — logical plan:")
        print(pts)
        return 0
    sample_pts.export_ceo_csv(pts, args.out)
    print(f"wrote CEO sample points -> {args.out}")
    return 0


def cmd_bench_queries(args) -> int:
    """Run every queries() entry once (smoke over the synth/test tables)."""
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    _ensure_ray()
    sf_dir = f"/root/testdata/sf{args.sf}"
    for name, fn in e.queries().items():
        res = fn(sf_dir)
        n = res.count() if hasattr(res, "count") and not hasattr(res, "columns") else len(res)
        print(f"{name}: {n} rows")
    return 0


def cmd_pretrain(args) -> int:
    """The pretraining data-prep funnel as a deployable job: curation →
    weighted mixing → sequence packing → resumable partitioned output
    (reruns skip finished pack partitions)."""
    import ray.data as rd

    from .lineage import resumable_write
    from .pipelines import curation

    _ensure_ray()
    sf_dir = f"/root/testdata/sf{args.sf}"
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def weight(s: str) -> float:
        return float(int(s[3:]) % 4 + 1)

    if args.dry_run:
        # pretrain_build eagerly runs its reduce stages (survivor counts,
        # bucket totals) at build time, so a true plan-only dry run prints
        # the funnel description instead of constructing the pipeline
        print("DRY RUN — pretrain funnel stages (nothing executed):")
        print("  1. curate_corpus: exact dedup -> lang/quality filter -> subsample")
        print("  2. hash join survivors -> mix_sources (weighted rates)")
        print("  3. hash join survivors -> pack_sequences (512-token windows)")
        print(f"  4. resumable_write({args.out}, key=pack_id, parts={args.num_parts})")
        print(docs)
        return 0
    packed = curation.pretrain_build(docs, weight, seed=args.seed)
    written, skipped = resumable_write(
        packed, args.out, key_col="pack_id", num_parts=args.num_parts,
        config_hash=f"pretrain-seed{args.seed}",
    )
    print(f"wrote {written} partitions ({skipped} already complete) -> {args.out}")
    return 0


def cmd_curate(args) -> int:
    """The web-corpus curation funnel as a deployable job: redact →
    paragraph dedup → Gopher rules → per-source adaptive quality →
    resumable partitioned output (reruns skip finished partitions)."""
    import ray.data as rd

    from .lineage import resumable_write
    from .pipelines import curation

    _ensure_ray()
    sf_dir = f"/root/testdata/sf{args.sf}"
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    if args.dry_run:
        print("DRY RUN — web curation funnel stages (nothing executed):")
        print("  1. redact: stateless RE2 scrub")
        print("  2. drop_dup_paragraphs: corpus line dedup + reassembly")
        print("  3. gopher_quality keep -> skinny id hash join")
        print("  4. adaptive_quality_filter: per-source quantized cutoff")
        print(f"  5. resumable_write({args.out}, key=doc_id, parts={args.num_parts})")
        print(docs)
        return 0
    out_ds = curation.web_curation(docs, r"(spark|customer)", "<ENT>")
    written, skipped = resumable_write(
        out_ds, args.out, key_col="doc_id", num_parts=args.num_parts,
        config_hash=f"curate-seed{args.seed}",
    )
    print(f"wrote {written} partitions ({skipped} already complete) -> {args.out}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kaza_lcms_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("flagship", cmd_flagship),
        ("landcover", cmd_landcover),
        ("sample-pts", cmd_sample_pts),
        ("bench-queries", cmd_bench_queries),
        ("pretrain", cmd_pretrain),
        ("curate", cmd_curate),
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--sf", type=float, default=0.001)
        sp.add_argument("--out", default=f"/tmp/kaza_out/{name}")
        sp.add_argument("--seed", type=int, default=90210)
        sp.add_argument("--num-parts", type=int, default=64)
        sp.add_argument("--year", type=int, default=2020)
        sp.add_argument("--n-points", type=int, default=100)
        sp.add_argument("-d", "--dry-run", action="store_true")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
