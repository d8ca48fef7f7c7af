"""01composite analog: annual covariate stack per tile
(src/01composite_s2.py → src/utils/s2process.py:108-154, SURVEY.md §3.1).

documents → geo_obs → per-(tile, year):
  * mean-band composite (exact scaled-int means) + covariate kernels from
    config (indices / Tasseled Cap) — the reference's per-image covariates
    then composite,
  * percentile composites ``p{P}_{band}`` for every configured percentile ×
    band (A1; src/utils/s2process.py:138-139),
  * harmonic ``{band}_phase`` / ``{band}_amplitude`` per configured band
    with its DOY window (A2/M13; src/utils/harmonics.py:86-124).

All three branches share one geo_obs scan shape and join on (tile_id, year)
— the single partitioning key.  The joins are hash joins over TILE-sized
tables (≪ document count), not document-sized ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages import covariates, spans, zonal
from ..stages.zonal import _add_bucket, _default_buckets, interp_percentile

KEYS = ["tile_id", "year"]


def percentile_stack(geo, config: PipelineConfig = DEFAULT_CONFIG, bands=range(6)):
    """Per-(tile, year) percentile composite for every band at once.

    One bucketed map_groups pass computes all bands × all percentiles
    (vectorized per bucket) — NOT one shuffle per band.
    Output columns: p{P}_{bandname} (reference naming, e.g. p25_nir).
    """
    ps = list(config.percentile_options)
    band_list = list(bands)
    cols = [f"c{b}" for b in band_list]
    names = [covariates.BANDS[b] for b in band_list]
    nb = _default_buckets()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        kcols = [g[k].to_numpy() for k in KEYS]
        order = np.lexsort(tuple(kcols[::-1]))
        kcols = [k[order] for k in kcols]
        changed = np.zeros(len(g), dtype=bool)
        changed[0] = True
        for k in kcols:
            changed[1:] |= k[1:] != k[:-1]
        starts = np.nonzero(changed)[0]
        ends = np.append(starts[1:], len(g))
        out = {k: kcols[i][starts] for i, k in enumerate(KEYS)}
        out["n"] = (ends - starts).astype(np.int64)
        scale = config.scale_factor * 100.0  # cents → reflectance units
        for c, name in zip(cols, names):
            v = g[c].to_numpy(dtype=np.float64)[order]
            for p in ps:
                res = np.empty(starts.shape[0])
                for i, (s, e) in enumerate(zip(starts, ends)):
                    res[i] = interp_percentile(np.sort(v[s:e]), p)
                out[f"p{p}_{name}"] = res * scale
        return pd.DataFrame(out)

    return (
        _add_bucket(geo.select_columns(KEYS + cols), KEYS, nb)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(KEYS + ["n"] + [f"p{p}_{n}" for n in names for p in ps])
    )


def harmonic_stack(geo, config: PipelineConfig = DEFAULT_CONFIG):
    """Per-(tile, year) harmonic fit for each configured band with its DOY
    window (doHarmonicsFromOptions analog).  Output: {band}_phase,
    {band}_amplitude per band.

    Same exact-partials + shared-Cramer machinery as zonal.harmonic_fit
    (bit-reproducible by the DuckDB oracle); groups whose DOY window is
    empty emit NaN."""
    nb = _default_buckets()
    opts = config.harmonics_options
    band_cols = {b: f"c{covariates.BANDS.index(b)}" for b in opts}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = (g["year"].to_numpy().astype(np.int64) - 1970) * 365 + (
            g["doy"].to_numpy().astype(np.int64) - 1
        )
        doy = g["doy"].to_numpy()
        out = (
            g[KEYS]
            .drop_duplicates()
            .sort_values(KEYS, kind="mergesort")
            .reset_index(drop=True)
        )
        for band, (d0, d1) in opts.items():
            sel = (doy >= d0) & (doy <= d1)
            df = pd.DataFrame(
                {
                    **{kk: g[kk].to_numpy()[sel] for kk in KEYS},
                    "k": k[sel],
                    "y": g[band_cols[band]].to_numpy()[sel],
                }
            )
            p = (
                df.groupby(KEYS + ["k"], as_index=False)
                .agg(m=("y", "size"), sy=("y", "sum"))
                .sort_values(KEYS + ["k"], kind="mergesort")
            )
            fit = zonal._fit_partials(p, KEYS).drop(columns=["n"]).rename(
                columns={"phase": f"{band}_phase", "amplitude": f"{band}_amplitude"}
            )
            out = out.merge(fit, on=KEYS, how="left")
        return out

    cols = list(dict.fromkeys(KEYS + ["year", "doy"] + sorted(set(band_cols.values()))))
    return (
        _add_bucket(geo.select_columns(cols), KEYS, nb)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(
            KEYS + [f"{b}_{suf}" for b in opts for suf in ("phase", "amplitude")]
        )
    )


def composite_stack(synth_root: str, config: PipelineConfig = DEFAULT_CONFIG):
    """The full 01composite stack: mean composite + covariates + percentile
    composites (+ harmonics when configured), joined on (tile_id, year)."""
    import ray.data as rd

    from ..runtime import join_partitions
    from .flagship import read_documents

    docs = read_documents(f"{synth_root}/documents")
    geo = spans.geo_obs(docs)

    from .primitives import tile_composites

    base = tile_composites(geo, config)  # mean bands + covariates
    pcts = percentile_stack(geo, config)
    out = base.join(
        pcts, join_type="inner", num_partitions=join_partitions(), on=tuple(KEYS),
        left_suffix="", right_suffix="_p",
    )
    if config.add_harmonics:
        harm = harmonic_stack(geo, config)
        out = out.join(
            harm, join_type="left_outer", num_partitions=join_partitions(), on=tuple(KEYS),
        )
    return out
