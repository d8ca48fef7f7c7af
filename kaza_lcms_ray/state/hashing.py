"""Deterministic hashing primitives.

All randomness in the engine is derived from splitmix64 streams keyed on
(seed, tag, row_key) — no wall-clock, no global RNG state.  This mirrors the
reference's fixed-seed discipline (sampling seed 90210 at
``/root/reference/src/02train_test.py:121``, RF seed 51515 at
``/root/reference/src/utils/primitives.py:73``) while being reproducible
across processes, partitionings and cluster sizes.
"""

from __future__ import annotations

import numpy as np

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

DEFAULT_SEED = 90210  # src/02train_test.py:121
RF_SEED = 51515  # src/utils/primitives.py:73


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer. Input/output uint64."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + _GOLDEN) & _M64
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        z = z ^ (z >> np.uint64(31))
    return z


def hash_key(*parts) -> np.ndarray:
    """Fold parts (ints / int arrays) into one uint64 stream.

    ``hash_key(seed, tag, ids)`` is the canonical per-row key.  Scalars and
    arrays broadcast; the result has the broadcast shape.
    """
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for p in parts:
            p = np.asarray(p)
            if p.dtype.kind in ("U", "S", "O"):  # string tags -> stable int
                p = np.asarray(
                    [_fnv1a(str(s)) for s in np.atleast_1d(p)], dtype=np.uint64
                )
            h = splitmix64((h ^ p.astype(np.uint64)) & _M64)
    return h


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_unit(*parts) -> np.ndarray:
    """Uniform float64 in [0, 1) derived from hash_key(*parts).

    Used for seeded 'random' columns (the engine analog of EE's
    ``randomColumn`` — src/utils/sampling.py:188) and the 80/20 split.
    """
    h = hash_key(*parts)
    return (h >> np.uint64(11)).astype(np.float64) * (2.0**-53)


def fnv1a_bytes(data: bytes) -> int:
    """FNV-1a over raw bytes (content hashing for exact dedup)."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
