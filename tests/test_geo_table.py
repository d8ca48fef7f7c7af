"""Indexed geo side table: partition pruning, column projection, and the
indexed flagship variant (S1 read-side pruning)."""

import glob
import os

import numpy as np
import pyarrow.dataset as pds

import ray.data as rd

from kaza_lcms_ray import synth
from kaza_lcms_ray.pipelines import flagship
from kaza_lcms_ray.sources import geo_table, storage
from kaza_lcms_ray.stages import spans


def _bbox():
    return (
        synth.HOT_LON - synth.HOT_HALF,
        synth.HOT_LAT - synth.HOT_HALF,
        synth.HOT_LON + synth.HOT_HALF,
        synth.HOT_LAT + synth.HOT_HALF,
    )


def test_bbox_prunes_partitions_and_matches_full_scan(synth_small, ray_session):
    bbox = _bbox()
    ds, n_read, n_total = geo_table.read_geo(
        synth_small, columns=["doc_id", "span_idx", "lon", "lat"], bbox=bbox
    )
    assert 0 < n_read < n_total / 2, (n_read, n_total)  # the prune is real
    got = (
        ds.map_batches(
            lambda t: geo_table.filter_bbox_batch(t, *bbox), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    full = (
        spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
        .to_pandas()
    )
    x0, y0, x1, y1 = bbox
    want = (
        full[
            (full.lon >= x0) & (full.lon <= x1) & (full.lat >= y0) & (full.lat <= y1)
        ][["doc_id", "span_idx", "lon", "lat"]]
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want) and len(got) > 0


def test_read_filter_pushdown_prunes_rows(synth_small, ray_session):
    ds = storage.read_documents(
        f"{synth_small}/documents", filter=(pds.field("doc_id") < "doc-000000000100")
    )
    assert ds.count() == 100


def test_indexed_flagship_equals_classic(synth_small, ray_session):
    a = (
        flagship.tile_assignments(synth_small)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    b = (
        flagship.tile_assignments_indexed(synth_small)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b) and len(a) > 0


def test_side_table_file_count_bounded(synth_small, ray_session):
    out = geo_table.ensure_geo_table(synth_small)
    parts = glob.glob(os.path.join(out, "part=*"))
    files = glob.glob(os.path.join(out, "part=*", "*.parquet"))
    # sorted-by-part write: O(blocks + partitions) files, not their product
    assert len(files) < 10 * len(parts)
