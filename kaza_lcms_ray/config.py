"""Pipeline configuration — the engine analog of the reference's
user-editable settings dict (src/utils/model_inputs.py:1-48), made a
validated dataclass whose hash goes into checkpoint lineage (the reference's
known footgun is silently mismatched settings across steps,
ProjectWorkflow.md:117 — we validate and fingerprint instead).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

from .state.cells import CELL_LEVEL, TILE_LEVEL
from .state.hashing import DEFAULT_SEED, RF_SEED

# alphanumerically-sorted 8-class strata (src/misc/strata.py:12-21); order is
# load-bearing: argmax assemblage assumes it (src/utils/assemblage.py:3-4)
CLASSES = {
    1: "Bare",
    2: "Built",
    3: "Crop",
    4: "Forest",
    5: "Grass",
    6: "Shrub",
    7: "Water",
    8: "Wetland",
}

ALL_INDICES = [
    "ND_blue_green", "ND_blue_red", "ND_blue_nir", "ND_blue_swir1",
    "ND_blue_swir2", "ND_green_red", "ND_green_nir", "ND_green_swir1",
    "ND_green_swir2", "ND_red_swir1", "ND_red_swir2", "ND_nir_red",
    "ND_nir_swir1", "ND_nir_swir2", "ND_swir1_swir2", "R_swir1_nir",
    "R_red_swir1", "EVI", "SAVI", "IBI",
]


@dataclass(frozen=True)
class PipelineConfig:
    """Defaults mirror the reference's shipped model_inputs settings."""

    indices: tuple[str, ...] = ("EVI", "SAVI", "IBI")  # model_inputs.py:7
    add_tassel_cap: bool = False  # model_inputs.py:15
    percentile_options: tuple[int, ...] = (10, 25, 50, 75, 90)  # :32
    add_harmonics: bool = True  # :37
    # band -> (start DOY, end DOY), model_inputs.py:43-48
    harmonics_options: dict = field(
        default_factory=lambda: {"nir": (1, 365), "swir1": (1, 365)}
    )
    scale_factor: float = 1e-4  # scaleLandsat ×0.0001, covariates.py:292-302
    cell_level: int = CELL_LEVEL
    tile_level: int = TILE_LEVEL
    seed: int = DEFAULT_SEED
    rf_seed: int = RF_SEED
    rf_trees: int = 100  # primitives.py:71
    rf_top_k_features: int = 20  # primitives.py:86 (gettop20)
    split_frac: float = 0.8  # sampling.py:188

    def __post_init__(self):
        unknown = set(self.indices) - set(ALL_INDICES)
        if unknown:
            raise ValueError(f"unknown indices: {sorted(unknown)}")
        for band, (s, e) in self.harmonics_options.items():
            if not (1 <= s <= e <= 366):
                raise ValueError(f"bad DOY window for {band}: ({s}, {e})")

    def config_hash(self) -> str:
        blob = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
