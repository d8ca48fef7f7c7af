"""Covariate kernels: normalized-difference indices, ratios, EVI/SAVI/IBI,
Tasseled Cap transform + angles/distances (SURVEY.md M6-M13).

Semantics follow the reference's band algebra
(src/utils/covariates.py:85-200 indices; :32-83 Tasseled Cap) re-expressed as
one vectorized numpy pass per batch instead of per-pixel EE expressions.
Band naming matches the reference exactly (``ND_a_b``, ``EVI``,
``brightness`` … ``tcDistBW``) so downstream feature selection is
name-compatible.

The registry (``KERNELS``) is the user-extension surface: config names the
kernels to run (src/utils/covariates.py:10-29 functionList;
src/utils/model_inputs.py:7), and users may register their own
``name -> fn(bands dict) -> dict`` entries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig

BANDS = ("blue", "green", "red", "nir", "swir1", "swir2")
BAND_COLS = {b: f"b{i}" for i, b in enumerate(BANDS)}

# Tasseled Cap coefficient matrix (rows: brightness, greenness, wetness,
# fourth, fifth, sixth) — the standard Landsat TC coefficients the reference
# hardcodes (src/utils/covariates.py:38-45).
TC_COEF = np.array(
    [
        [0.3037, 0.2793, 0.4743, 0.5585, 0.5082, 0.1863],
        [-0.2848, -0.2435, -0.5436, 0.7243, 0.0840, -0.1800],
        [0.1509, 0.1973, 0.3279, 0.3406, -0.7112, -0.4572],
        [-0.8242, 0.0849, 0.4392, -0.0580, 0.2012, -0.2768],
        [-0.3280, 0.0549, 0.1075, 0.1855, -0.4357, 0.8085],
        [0.1084, -0.9022, 0.4120, 0.0573, -0.0251, 0.0238],
    ]
)
TC_NAMES = ("brightness", "greenness", "wetness", "fourth", "fifth", "sixth")


def _nd(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return (a - b) / (a + b)


def _make_nd(name: str):
    _, a, b = name.split("_", 2)

    def kernel(bands: dict) -> dict:
        return {name: _nd(bands[a], bands[b])}

    return kernel


KERNELS = {
    name: _make_nd(name)
    for name in (
        "ND_blue_green", "ND_blue_red", "ND_blue_nir", "ND_blue_swir1",
        "ND_blue_swir2", "ND_green_red", "ND_green_nir", "ND_green_swir1",
        "ND_green_swir2", "ND_red_swir1", "ND_red_swir2", "ND_nir_red",
        "ND_nir_swir1", "ND_nir_swir2", "ND_swir1_swir2",
    )
}


def _ratio_swir1_nir(bands):
    with np.errstate(divide="ignore", invalid="ignore"):
        return {"R_swir1_nir": bands["swir1"] / bands["nir"]}


def _ratio_red_swir1(bands):
    with np.errstate(divide="ignore", invalid="ignore"):
        return {"R_red_swir1": bands["red"] / bands["swir1"]}


def _evi(bands):
    nir, red, blue = bands["nir"], bands["red"], bands["blue"]
    return {"EVI": 2.5 * ((nir - red) / (nir + 6 * red - 7.5 * blue + 1))}


def _savi(bands):
    nir, red = bands["nir"], bands["red"]
    return {"SAVI": (nir - red) * (1 + 0.5) / (nir + red + 0.5)}


def _ibi(bands):
    nir, red, green, swir1 = bands["nir"], bands["red"], bands["green"], bands["swir1"]
    with np.errstate(divide="ignore", invalid="ignore"):
        ibi_a = 2 * swir1 / (swir1 + nir)
        ibi_b = (nir / (nir + red)) + (green / (green + swir1))
        return {"IBI": _nd(ibi_a, ibi_b)}


KERNELS.update(
    {
        "R_swir1_nir": _ratio_swir1_nir,
        "R_red_swir1": _ratio_red_swir1,
        "EVI": _evi,
        "SAVI": _savi,
        "IBI": _ibi,
    }
)


def register_kernel(name: str, fn):
    """User extension point: fn(bands: dict[str, ndarray]) -> dict[str, ndarray]."""
    KERNELS[name] = fn


def tasseled_cap(bands: dict) -> dict:
    """6×6 matrixMultiply + angles (atan2/π) and distances (hypot) —
    src/utils/covariates.py:50-83."""
    x = np.stack([bands[b] for b in BANDS], axis=1)
    comp = x @ TC_COEF.T
    out = {name: comp[:, i] for i, name in enumerate(TC_NAMES)}
    br, gr, we = out["brightness"], out["greenness"], out["wetness"]
    out["tcAngleBG"] = np.arctan2(br, gr) / np.pi
    out["tcAngleGW"] = np.arctan2(gr, we) / np.pi
    out["tcAngleBW"] = np.arctan2(br, we) / np.pi
    out["tcDistBG"] = np.hypot(br, gr)
    out["tcDistGW"] = np.hypot(gr, we)
    out["tcDistBW"] = np.hypot(br, we)
    return out


def covariates_batch(
    batch: pa.Table, config: PipelineConfig = DEFAULT_CONFIG, prefix: str = ""
) -> pa.Table:
    """geo_obs batch → + scaled bands + configured covariate columns.

    Bands are scaled by config.scale_factor first (scaleLandsat analog);
    scaled band columns are emitted under their names (blue..swir2), then
    each configured kernel appends its columns.  ``prefix`` reproduces the
    reference's p20_/p80_ renameBands (src/utils/covariates.py:261-274).
    """
    bands = {
        name: batch.column(BAND_COLS[name]).to_numpy(zero_copy_only=False)
        * config.scale_factor
        for name in BANDS
    }
    out = {}
    for name in BANDS:
        out[name] = bands[name]
    for idx_name in config.indices:
        out.update(KERNELS[idx_name](bands))
    if config.add_tassel_cap:
        out.update(tasseled_cap(bands))
    for name, arr in out.items():
        batch = batch.append_column(
            f"{prefix}{name}" if prefix else name,
            pa.array(np.asarray(arr, dtype=np.float64)),
        )
    return batch


def add_covariates(geo, config: PipelineConfig = DEFAULT_CONFIG, prefix: str = ""):
    return geo.map_batches(
        lambda t: covariates_batch(t, config, prefix), batch_format="pyarrow"
    )


def feature_names(config: PipelineConfig = DEFAULT_CONFIG) -> list[str]:
    """Ordered model-feature names produced by add_covariates."""
    names = list(BANDS) + list(config.indices)
    if config.add_tassel_cap:
        names += list(TC_NAMES) + [
            "tcAngleBG", "tcAngleGW", "tcAngleBW", "tcDistBG", "tcDistGW", "tcDistBW"
        ]
    return names
