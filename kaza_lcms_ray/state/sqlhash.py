"""ANSI-SQL (DuckDB) expression generators reproducing the engine's
deterministic hashing (state/hashing.py) bit-for-bit.

Why: the driver's correctness gate compares engine output against DuckDB SQL
by exact value hash.  Every "random"/hash operator (splitmix64 streams,
FNV-1a, rolling polynomial fingerprints, MinHash, SimHash, the fake media
codec) is a pure integer function — so the oracle can recompute it in SQL,
turning those queries from rows-only checks into full value checks (the
same trick ``state/cells.morton_sql_expr`` plays for cell ids).

All values are carried as non-negative HUGEINT (int128) in [0, 2^64).
64×64-bit modular multiplication would overflow int128 for large operands,
so it is decomposed into 32-bit halves (every intermediate ≤ 2^64).
Mirrors are unit-tested against the numpy implementations in
tests/test_sqlhash.py.
"""

from __future__ import annotations

import numpy as np

from .hashing import _GOLDEN, _MIX1, _MIX2, hash_key

U64 = 1 << 64
U32 = 1 << 32
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3  # ~2^40: direct HUGEINT multiply is overflow-safe


def hug(v: int) -> str:
    """HUGEINT literal."""
    return f"CAST({int(v)} AS HUGEINT)"


def to_i64(x: str) -> str:
    """uint64-in-HUGEINT → signed BIGINT with two's-complement wrap (the
    dtype the engine emits after .astype(np.int64))."""
    return (
        f"CAST(CASE WHEN ({x}) >= {1 << 63} THEN ({x}) - {U64} ELSE ({x}) END AS BIGINT)"
    )


def mulmod_const(x: str, c: int) -> str:
    """(x * c) mod 2^64 for constant c, safe for any x < 2^64.

    Splits c into 32-bit halves so every product stays ≤ 2^96 < 2^127."""
    c = int(c) % U64
    c_lo, c_hi = c % U32, c // U32
    lo = f"(({x}) % {U32})"
    hi = f"(({x}) // {U32})"
    return (
        f"(({lo} * {hug(c_lo)} + (({lo} * {hug(c_hi)} + {hi} * {hug(c_lo)}) % {U32}) * {U32})"
        f" % {U64})"
    )


def mulmod(a: str, b: str) -> str:
    """(a * b) mod 2^64 for two runtime uint64 expressions."""
    alo, ahi = f"(({a}) % {U32})", f"(({a}) // {U32})"
    blo, bhi = f"(({b}) % {U32})", f"(({b}) // {U32})"
    return (
        f"(({alo} * {blo} + (({alo} * {bhi} + {ahi} * {blo}) % {U32}) * {U32}) % {U64})"
    )


def xor64(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def splitmix_steps(x: str, out: str, p: str) -> list[tuple[str, str]]:
    """splitmix64 as a chain of named columns (layer with chain_select).

    ``p`` is a unique prefix for the intermediate column names."""
    return [
        (f"{p}_z0", f"((CAST({x} AS HUGEINT) + {hug(int(_GOLDEN))}) % {U64})"),
        (f"{p}_z1", mulmod_const(xor64(f"{p}_z0", f"({p}_z0 >> 30)"), int(_MIX1))),
        (f"{p}_z2", mulmod_const(xor64(f"{p}_z1", f"({p}_z1 >> 27)"), int(_MIX2))),
        (out, xor64(f"{p}_z2", f"({p}_z2 >> 31)")),
    ]


def splitmix_inline(x: str) -> str:
    """splitmix64 as one (textually expanded) expression — for use inside
    list lambdas where intermediate columns can't be named.  The input
    expression is duplicated ~128×, so keep ``x`` short (a column or lambda
    variable)."""
    z0 = f"((CAST({x} AS HUGEINT) + {hug(int(_GOLDEN))}) % {U64})"
    z1 = mulmod_const(xor64(z0, f"({z0} >> 30)"), int(_MIX1))
    z2 = mulmod_const(xor64(z1, f"({z1} >> 27)"), int(_MIX2))
    return xor64(z2, f"({z2} >> 31)")


def chain_select(base: str, steps: list[tuple[str, str]]) -> str:
    """Chain ``SELECT *, expr AS name`` layers over a base subquery so each
    intermediate is computed (and parsed) once.  Emitted as a linear CTE
    chain inside a parenthesized WITH — textually-nested subqueries grow
    quadratically and exhaust the parser past ~50 layers."""
    pfx = "__" + (steps[0][0] if steps else "c")
    ctes = [f"{pfx}_0 AS ({base})"]
    for i, (name, expr) in enumerate(steps, 1):
        ctes.append(f"{pfx}_{i} AS (SELECT *, {expr} AS {name} FROM {pfx}_{i - 1})")
    return f"(WITH {', '.join(ctes)} SELECT * FROM {pfx}_{len(steps)})"


def fnv1a_chars(text: str) -> str:
    """FNV-1a over the characters of an ASCII string expression (mirrors
    hashing._fnv1a; byte == codepoint for ASCII inputs)."""
    codes = (
        f"list_transform(range(1, length({text}) + 1), "
        f"i -> CAST(unicode(substr({text}, i, 1)) AS HUGEINT))"
    )
    return (
        f"list_reduce(list_prepend({hug(FNV_OFFSET)}, {codes}), "
        f"(h, b) -> ((xor(h, b) * {hug(FNV_PRIME)}) % {U64}))"
    )


def rolling_poly_window(text: str, pos: str, win: str) -> str:
    """Rolling polynomial hash h = fold(h*FNV_PRIME + byte) over the
    ``win``-char window of ``text`` starting at 1-based ``pos`` (mirrors
    dedup._char_shingle_hashes before the splitmix finalize)."""
    codes = (
        f"list_transform(range(0, {win}), "
        f"j -> CAST(unicode(substr({text}, ({pos}) + j, 1)) AS HUGEINT))"
    )
    return (
        f"list_reduce(list_prepend({hug(0)}, {codes}), "
        f"(h, b) -> ((h * {hug(FNV_PRIME)} + b) % {U64}))"
    )


def hash_key_prefix(*parts) -> int:
    """Python-side fold of the CONSTANT leading parts of a hash_key chain
    (so the SQL only computes the data-dependent tail)."""
    return int(np.atleast_1d(hash_key(*parts))[0])


