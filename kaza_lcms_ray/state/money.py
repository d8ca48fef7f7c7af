"""Exact money/quantity scaling shared by the analytics and events stages.

One rounding convention on both sides of the oracle contract: numpy
``to_cents`` implements round-half-AWAY-FROM-ZERO, the same convention as
SQL ``round(x * 100, 0)`` in DuckDB — ``np.rint`` (round-half-to-even)
silently disagrees on exact .5 cents values and breaks the bit-exact
engine/oracle contract even though typical test data never hits a true
half-cent.
"""

from __future__ import annotations

import numpy as np


def to_cents(v: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """value → int64 scaled units, round-half-away-from-zero (SQL round)."""
    v = np.asarray(v, dtype=np.float64)
    return np.copysign(np.floor(np.abs(v) * scale + 0.5), v).astype(np.int64)
