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
                p = fnv1a_arr(np.atleast_1d(p))
            h = splitmix64((h ^ p.astype(np.uint64)) & _M64)
    return h


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_arr(col) -> np.ndarray:
    """Vectorized FNV-1a 64 over a string column — bit-identical to
    ``_fnv1a`` per element (verified by test_sqlhash), so the DuckDB mirror
    (state/sqlhash.fnv1a_chars) needs no change.

    Accepts a pyarrow Array/ChunkedArray or any sequence (coerced via
    ``str`` like the scalar path; nulls hash as the string 'None').
    Columns-over-rows: one numpy pass per byte position, vectorized over
    every element still longer than that position — id/token columns are
    short (8-30 bytes), so this is ~15 vector ops per batch instead of a
    Python byte loop per row.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array([str(s) for s in col], type=pa.large_string())
    if col.null_count:
        col = pc.fill_null(col, "None")  # str(None) compat with _fnv1a
    arr = col.cast(pa.large_binary())
    n = len(arr)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    active = np.argsort(lens, kind="stable")[::-1]  # longest first
    with np.errstate(over="ignore"):
        for j in range(int(lens.max())):
            active = active[lens[active] > j]
            if active.size == 0:
                break
            h[active] = (
                h[active] ^ data[starts[active] + j].astype(np.uint64)
            ) * _FNV_PRIME
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


def id_u64(col) -> "np.ndarray":
    """uint64 key per id column: integers pass through, strings hash via
    the vectorized FNV-1a.  The single id→key convention shared by
    packing, lm_score and the samplers, so every SQL mirror (CAST AS
    HUGEINT for integer ids; fnv1a_chars for strings) stays in lockstep
    with ONE implementation."""
    import pyarrow as pa

    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return fnv1a_arr(col)
