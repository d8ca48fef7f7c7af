"""Flagship pipeline: spatial-join + tile assignment (the BASELINE.json
headline metric).

documents → parse geo spans (side table; spans column untouched) → cell/tile
encode → semi-join vs AOI polygon → attach the per-tile LANDCOVER label
(argmax-assembled from the primitives table, hash-joined on (tile_id, year))
→ tile-assignment rows.  Mirrors the reference's end-to-end
01composite→04generate_LC flow (SURVEY.md §3) as one streaming Ray Data plan:
read → map_batches → actor-pool PIP → shuffle-free argmax pre-agg → one hash
join keyed on the partition key reused throughout (tile_id).
"""

from __future__ import annotations

import ray.data as rd

from ..stages import assemblage, pip, spans


def read_documents(doc_dir: str, **kwargs):
    """Read the interleaved-document table (Lance at design scale; the
    sandbox has no pylance, so Parquet with the identical logical schema —
    see sources/storage.py)."""
    from ..sources import storage

    return storage.read_documents(doc_dir, **kwargs)


def tile_assignments(
    synth_root: str,
    concurrency: int | tuple[int, int] | None = None,
    num_partitions: int | None = None,
):
    """Full flagship plan → Dataset[doc_id, span_idx, tile_id, year,
    LANDCOVER].  ``synth_root`` is a directory produced by synth.ensure()."""
    from ..runtime import join_partitions, pool_size

    if concurrency is None:
        # leave ≥ half the CPUs for read / shuffle / join aggregators
        concurrency = (1, pool_size(0.4))
    if num_partitions is None:
        num_partitions = join_partitions()
    docs = read_documents(f"{synth_root}/documents")
    geo = spans.geo_obs(docs)
    inside = pip.pip_join(
        geo,
        f"{synth_root}/polygons.parquet",
        kinds=["aoi"],
        mode="semi",
        concurrency=concurrency,
    ).select_columns(["doc_id", "span_idx", "tile_id", "year"])

    prims = rd.read_parquet(f"{synth_root}/primitives.parquet")
    labels = assemblage.assemble_tile_labels(prims).select_columns(
        ["tile_id", "year", "LANDCOVER"]
    )
    # inner hash join on the reused partition key (tile_id, year)
    joined = inside.map_batches(_year_i64, batch_format="pyarrow").join(
        labels.map_batches(_year_i64, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("tile_id", "year"),
    )
    return joined


def _year_i64(t):
    """Normalize year dtype across both join sides (int16 vs int32)."""
    import pyarrow as pa

    idx = t.schema.get_field_index("year")
    return t.set_column(idx, "year", t.column("year").cast(pa.int64()))
