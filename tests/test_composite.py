"""01composite-analog stack: percentile composites + harmonics per config."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from kaza_lcms_ray.config import PipelineConfig
from kaza_lcms_ray.pipelines import composite
from kaza_lcms_ray.stages import spans, zonal


def _geo_df(synth_dir):
    import glob

    import pyarrow.parquet as pq

    return pd.concat(
        [
            spans.parse_geo_batch(pq.read_table(f)).to_pandas()
            for f in sorted(glob.glob(f"{synth_dir}/documents/part-*.parquet"))
        ],
        ignore_index=True,
    )


def test_percentile_stack_matches_duckdb(synth_small, ray_session):
    cfg = PipelineConfig()
    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    got = (
        composite.percentile_stack(geo, cfg, bands=[3])
        .to_pandas()
        .sort_values(["tile_id", "year"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("geo", _geo_df(synth_small))
    exp = con.sql(
        """
        SELECT tile_id, "year", COUNT(*) AS n,
               quantile_cont(CAST(c3 AS DOUBLE), 0.25) AS q25,
               quantile_cont(CAST(c3 AS DOUBLE), 0.90) AS q90
        FROM geo GROUP BY tile_id, "year" ORDER BY tile_id, "year"
        """
    ).df()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    scale = cfg.scale_factor * 100.0
    assert (got["p25_nir"].to_numpy() == exp["q25"].to_numpy() * scale).all()
    assert (got["p90_nir"].to_numpy() == exp["q90"].to_numpy() * scale).all()


def test_harmonic_stack_doy_window(synth_small, ray_session):
    cfg = PipelineConfig(harmonics_options={"nir": (50, 250)})
    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    got = (
        composite.harmonic_stack(geo, cfg)
        .to_pandas()
        .sort_values(["tile_id", "year"])
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    # independent lstsq oracle on 5 sample keys (tolerance; bit-exactness is
    # the driver contract's DuckDB replay)
    sample = got.head(5)
    for r in sample.itertuples():
        sub = df[(df["tile_id"] == r.tile_id) & (df["year"] == r.year)]
        win = sub[(sub["doy"] >= 50) & (sub["doy"] <= 250)]
        if len(win) == 0:
            assert np.isnan(r.nir_phase) and np.isnan(r.nir_amplitude)
            continue
        t = (
            (win["year"].to_numpy().astype(np.int64) - 1970) * 365
            + (win["doy"].to_numpy().astype(np.int64) - 1)
        ) / 365.0
        y = win["c3"].to_numpy().astype(np.float64)
        w = 2.0 * np.pi * t
        X = np.stack([np.ones_like(t), t, np.cos(w), np.sin(w)], axis=1)
        if np.linalg.matrix_rank(X) < 4 or len(win) < 8:
            # degenerate design: the Cramer solve yields an unspecified (but
            # deterministic and oracle-matched) value; lstsq can't anchor it
            continue
        coef = np.linalg.lstsq(X, y, rcond=None)[0]
        phase = np.arctan2(coef[2], coef[3])
        amp = np.hypot(coef[2], coef[3]) * 0.01
        assert abs(r.nir_phase - phase) < 1e-6
        assert abs(r.nir_amplitude - amp) < 1e-6 * max(1.0, amp)


def test_composite_stack_schema(synth_small, ray_session):
    cfg = PipelineConfig(indices=("EVI", "SAVI"), add_harmonics=True)
    out = composite.composite_stack(synth_small, cfg).to_pandas()
    for col in (
        "tile_id", "year", "blue", "nir", "EVI", "SAVI",
        "p10_blue", "p90_swir2", "nir_phase", "swir1_amplitude",
    ):
        assert col in out.columns, col
    assert len(out) > 0
    assert out.duplicated(["tile_id", "year"]).sum() == 0
