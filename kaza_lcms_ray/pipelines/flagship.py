"""Flagship pipeline: spatial-join + tile assignment (the BASELINE.json
headline metric).

documents → parse geo spans (side table; spans column untouched) → cell/tile
encode → semi-join vs AOI polygon → attach the per-tile LANDCOVER label
(argmax-assembled from the primitives table) → tile-assignment rows.
Mirrors the reference's end-to-end 01composite→04generate_LC flow
(SURVEY.md §3) as one streaming Ray Data plan.

Label-join strategy (measured, see BASELINE.md):
* ``broadcast`` (default) — the assembled (tile, year)→label table is a few
  MB per AOI-year even at design scale (the label side grows with TILES, not
  documents), so it is packed into two sorted numpy arrays, ``ray.put``
  once, and looked up via ``searchsorted`` inside the same actor that does
  PIP — zero extra shuffle, zero extra operator.
* ``hash`` — the general path when the label side is too big to broadcast:
  ``Dataset.join`` hash-partitioned on (tile_id, year).  Same results
  (tested); ~2× slower at bench scale due to shuffle fixed costs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..stages import assemblage, pip, spans


def read_documents(doc_dir: str, **kwargs):
    """Read the interleaved-document table (Lance at design scale; the
    sandbox has no pylance, so Parquet with the identical logical schema —
    see sources/storage.py)."""
    from ..sources import storage

    return storage.read_documents(doc_dir, **kwargs)


def _pack_key(tile_id: np.ndarray, year: np.ndarray) -> np.ndarray:
    # 14 bits for the year keeps the pack collision-free for any plausible
    # calendar year (tile_id at level 14 uses ≤ 28 bits → ≤ 42 bits total)
    return tile_id.astype(np.int64) * 16384 + year.astype(np.int64)


# worker-process-local broadcast cache: stateless map_batches tasks reuse
# Ray's prewarmed worker pool (no per-run actor spawn storm), and the first
# task on each worker pays the one ray.get (zero-copy for the numpy arrays)
_BROADCAST_CACHE: dict = {}


def _broadcast_state(index_ref, labels_ref):
    key = (index_ref.hex(), labels_ref.hex())
    state = _BROADCAST_CACHE.get(key)
    if state is None:
        state = (ray.get(index_ref), ray.get(labels_ref))
        _BROADCAST_CACHE.clear()  # at most one flagship state per worker
        _BROADCAST_CACHE[key] = state
    return state


class AOITileLabeler:
    """Fused stage: parse batch → PIP semi vs AOI → broadcast label lookup.

    Used as a STATELESS map_batches function via ``make_labeler`` (state in
    the worker-local cache above); the class form remains for callers that
    prefer an explicit actor pool.
    """

    def __init__(self, index_ref, labels_ref):
        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        lab = ray.get(labels_ref) if isinstance(labels_ref, ray.ObjectRef) else labels_ref
        self.keys = lab["keys"]  # sorted packed (tile, year)
        self.labels = lab["labels"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.label_geo(spans.parse_geo_batch(batch))

    def label_geo(self, geo: pa.Table) -> pa.Table:
        px = geo.column("lon").to_numpy(zero_copy_only=False)
        py = geo.column("lat").to_numpy(zero_copy_only=False)
        pt, _ = self.index.join_points(px, py)
        matched = np.zeros(len(geo), dtype=bool)
        matched[pt] = True
        geo = geo.filter(pa.array(matched))
        key = _pack_key(
            geo.column("tile_id").to_numpy(zero_copy_only=False),
            geo.column("year").to_numpy(zero_copy_only=False),
        )
        pos = np.searchsorted(self.keys, key)
        pos_c = np.clip(pos, 0, self.keys.shape[0] - 1)
        hit = self.keys[pos_c] == key
        out = pa.table(
            {
                "doc_id": geo.column("doc_id"),
                "span_idx": geo.column("span_idx"),
                "tile_id": geo.column("tile_id"),
                "year": geo.column("year").cast(pa.int64()),
                "LANDCOVER": pa.array(
                    np.where(hit, self.labels[pos_c], 0).astype(np.int32)
                ),
            }
        )
        return out.filter(pa.array(hit))  # inner-join semantics


def prepare_labels(synth_root: str):
    """Assemble the (tile, year) → LANDCOVER side input once and broadcast.

    In the reference's lifecycle the primitive probability images are
    *persisted assets* built by step 03 before step 04 scans pixels
    (src/03RFprimitives.py → src/04generate_LC.py); this is the engine
    analog — a fixed-cost side-input build whose size grows with TILES, not
    documents.  Returns (index_ref, labels_ref) reusable across runs.
    """
    prims = rd.read_parquet(f"{synth_root}/primitives.parquet")
    lab = (
        assemblage.assemble_tile_labels(prims)
        .select_columns(["tile_id", "year", "LANDCOVER"])
        .to_pandas()
    )
    key = _pack_key(lab["tile_id"].to_numpy(), lab["year"].to_numpy())
    order = np.argsort(key)
    labels_ref = ray.put(
        {"keys": key[order], "labels": lab["LANDCOVER"].to_numpy()[order]}
    )
    index_ref = ray.put(
        pip.load_polygon_index(f"{synth_root}/polygons.parquet", kinds=["aoi"])
    )
    return index_ref, labels_ref


def tile_assignments(
    synth_root: str,
    concurrency: int | tuple[int, int] | None = None,
    num_partitions: int | None = None,
    join_strategy: str = "broadcast",
    prepared=None,
    replicate: int = 1,
):
    """Full flagship plan → Dataset[doc_id, span_idx, tile_id, year,
    LANDCOVER].  ``synth_root`` is a directory produced by synth.ensure().
    Pass ``prepared=prepare_labels(root)`` to reuse the label side input
    across runs (bench does).  ``replicate`` unions k reads of the input —
    same job shape at k× the work, used by the scaling benchmark so the
    measured wall is dominated by pipeline work, not per-run plan startup."""
    from ..runtime import join_partitions, pool_size

    if concurrency is None:
        concurrency = pool_size(0.6)
    if replicate <= 1:
        docs = read_documents(f"{synth_root}/documents")
    else:
        # one read op over the file list repeated k times — k× the work in a
        # single operator (a union of k reads floods the object store with
        # k concurrent read fronts and spills; measured 4× slower)
        import glob

        files = sorted(glob.glob(f"{synth_root}/documents/part-*.parquet"))
        docs = read_documents(files * replicate)

    if join_strategy == "broadcast":
        index_ref, labels_ref = prepared or prepare_labels(synth_root)

        def labeler(batch: pa.Table) -> pa.Table:
            index, lab = _broadcast_state(index_ref, labels_ref)
            worker = AOITileLabeler.__new__(AOITileLabeler)
            worker.index, worker.keys, worker.labels = index, lab["keys"], lab["labels"]
            return worker(batch)

        # no explicit batch_size: letting batches = blocks keeps the stage
        # fusable with ReadParquet (a forced batch_size breaks fusion and
        # round-trips every raw document block through the object store —
        # measured 1.7× slower at 32 CPUs)
        return docs.map_batches(labeler, batch_format="pyarrow")

    # hash-join scale path
    if num_partitions is None:
        num_partitions = join_partitions()
    prims = rd.read_parquet(f"{synth_root}/primitives.parquet")
    labels_ds = assemblage.assemble_tile_labels(prims).select_columns(
        ["tile_id", "year", "LANDCOVER"]
    )
    geo = spans.geo_obs(docs)
    inside = pip.pip_join(
        geo,
        f"{synth_root}/polygons.parquet",
        kinds=["aoi"],
        mode="semi",
        concurrency=(1, concurrency if isinstance(concurrency, int) else 4),
    ).select_columns(["doc_id", "span_idx", "tile_id", "year"])
    joined = inside.map_batches(_year_i64, batch_format="pyarrow").join(
        labels_ds.map_batches(_year_i64, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("tile_id", "year"),
    )
    return joined


def tile_assignments_indexed(synth_root: str, prepared=None, replicate: int = 1):
    """Flagship over the pre-exploded geo side table (sources/geo_table):
    a column-pruned read of 6 plain columns replaces the full spans decode
    + text parse — several-fold fewer decompressed bytes per document, the
    indexed layout a 100 TB deployment would maintain.  Same output as
    ``tile_assignments`` (tested equal); the side table build is a one-time
    persisted-asset cost (reference analog: EE asset exports)."""
    from ..sources.geo_table import read_geo

    index_ref, labels_ref = prepared or prepare_labels(synth_root)
    ds, _, _ = read_geo(
        synth_root,
        columns=["doc_id", "span_idx", "lon", "lat", "tile_id", "year"],
        replicate=replicate,
    )

    def labeler(batch: pa.Table) -> pa.Table:
        index, lab = _broadcast_state(index_ref, labels_ref)
        worker = AOITileLabeler.__new__(AOITileLabeler)
        worker.index, worker.keys, worker.labels = index, lab["keys"], lab["labels"]
        return worker.label_geo(batch)

    return ds.map_batches(labeler, batch_format="pyarrow")


def filter_documents_in_aoi(synth_root: str):
    """Document-level semi-join: keep the ORIGINAL document rows (spans
    column untouched, byte-for-byte) whose geo spans fall inside the AOI.

    This is the stage shape that makes the per-row span-sequence invariant
    (BASELINE.json input_hint) observable: surviving rows must carry their
    spans sequence unmodified — verified by tests via span fingerprints.
    """
    index_ref = ray.put(
        pip.load_polygon_index(f"{synth_root}/polygons.parquet", kinds=["aoi"])
    )

    def keep_in_aoi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        index = _broadcast_state_index(index_ref)
        geo = spans.parse_geo_batch(batch)
        px = geo.column("lon").to_numpy(zero_copy_only=False)
        py = geo.column("lat").to_numpy(zero_copy_only=False)
        pt, _ = index.join_points(px, py)
        keep_docs = pc.unique(geo.column("doc_id").take(pa.array(pt)))
        mask = pc.is_in(batch.column("doc_id"), value_set=keep_docs)
        return batch.filter(mask)

    return read_documents(f"{synth_root}/documents").map_batches(
        keep_in_aoi, batch_format="pyarrow"
    )


_INDEX_CACHE: dict = {}


def _broadcast_state_index(index_ref):
    key = index_ref.hex()
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        _INDEX_CACHE.clear()
        idx = _INDEX_CACHE.setdefault(key, ray.get(index_ref))
    return idx


def _year_i64(t):
    """Normalize year dtype across both join sides (int16 vs int32)."""
    idx = t.schema.get_field_index("year")
    return t.set_column(idx, "year", t.column("year").cast(pa.int64()))
