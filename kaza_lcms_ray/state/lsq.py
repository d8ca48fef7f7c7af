"""Closed-form 4×4 least-squares solve for the harmonic fit, generated ONCE
as an expression string and evaluated by BOTH the engine (numpy, via a
compiled lambda) and the DuckDB oracle (the same string embedded in SQL).

Why not np.linalg.solve: LAPACK's pivoted LU is not reproducible in SQL, so
the fit could never be value-checked.  Cramer's rule over the normal-equation
sums is a fixed expression tree — every multiply/subtract happens in the
same order on both sides, giving bit-identical coefficients (numpy elementwise
float64 ops and DuckDB DOUBLE ops are the same IEEE operations).

Design matrix X = [1, t, cos(2πt), sin(2πt)] (src/utils/harmonics.py:23-46
analog); entries are the 14 normal-equation sums, accumulated in ascending-t
order by a strict left fold on both sides (zonal.seg_left_fold ↔ SQL
list_reduce over list(... ORDER BY k)).
"""

from __future__ import annotations

TWO_PI = 6.283185307179586  # float64 nearest of 2π; repr-stable in SQL

# the 14 normal-equation entries, in canonical order
ENTRY_NAMES = [
    "hn", "st", "stt", "sc", "hss", "stc", "sts", "scc", "scs", "sss",
    "sy", "sty", "scy", "ssy",
]


def _det2(a, b, c, d):
    return f"({a} * {d} - {b} * {c})"


def _det3(m):
    return (
        f"(({m[0][0]} * {_det2(m[1][1], m[1][2], m[2][1], m[2][2])}"
        f" - {m[0][1]} * {_det2(m[1][0], m[1][2], m[2][0], m[2][2])})"
        f" + {m[0][2]} * {_det2(m[1][0], m[1][1], m[2][0], m[2][1])})"
    )


def _minor(m, col):
    return [[m[r][c] for c in range(4) if c != col] for r in range(1, 4)]


def _det4(m):
    terms = [f"{m[0][c]} * {_det3(_minor(m, c))}" for c in range(4)]
    return f"((({terms[0]} - {terms[1]}) + {terms[2]}) - {terms[3]})"


def harmonic4_exprs() -> dict[str, str]:
    """det / det_cos / det_sin expressions over ENTRY_NAMES identifiers.

    M = XᵀX for X = [1, t, cos, sin]; rhs = Xᵀy.  Cramer: coef_i =
    det(M with column i ← rhs) / det(M); cos is column 2, sin column 3."""
    M = [
        ["hn", "st", "sc", "hss"],
        ["st", "stt", "stc", "sts"],
        ["sc", "stc", "scc", "scs"],
        ["hss", "sts", "scs", "sss"],
    ]
    rhs = ["sy", "sty", "scy", "ssy"]

    def repl(col):
        return [[rhs[r] if c == col else M[r][c] for c in range(4)] for r in range(4)]

    return {"det": _det4(M), "det_c": _det4(repl(2)), "det_s": _det4(repl(3))}


# per-(distinct-t) term expressions feeding the 14 entries; {m}/{sy} are the
# per-t count and Σy, {t}/{c}/{s} are t, cos(2πt), sin(2πt).  The SAME
# templates drive the numpy evaluator and the SQL fold arguments.
TERM_TEMPLATES = {
    "hn": "{m}",
    "st": "({m} * {t})",
    "stt": "(({m} * {t}) * {t})",
    "sc": "({m} * {c})",
    "hss": "({m} * {s})",
    "stc": "(({m} * {t}) * {c})",
    "sts": "(({m} * {t}) * {s})",
    "scc": "(({m} * {c}) * {c})",
    "scs": "(({m} * {c}) * {s})",
    "sss": "(({m} * {s}) * {s})",
    "sy": "{sy}",
    "sty": "({sy} * {t})",
    "scy": "({sy} * {c})",
    "ssy": "({sy} * {s})",
}


def term_sql(name: str, m: str, sy: str, t: str, c: str, s: str) -> str:
    return TERM_TEMPLATES[name].format(m=m, sy=sy, t=t, c=c, s=s)


_FN_CACHE: dict = {}


def term_evaluator():
    """Vectorized evaluator of all 14 term arrays from (m, sy, t, c, s)."""
    if "t" not in _FN_CACHE:
        body = ", ".join(
            TERM_TEMPLATES[n].format(m="m", sy="sy", t="t", c="c", s="s")
            for n in ENTRY_NAMES
        )
        _FN_CACHE["t"] = eval(f"lambda m, sy, t, c, s: ({body})")  # noqa: S307
    return _FN_CACHE["t"]


def harmonic4_solver():
    """Vectorized (det, det_c, det_s) evaluator compiled from the SAME
    expression strings the SQL oracle embeds (numpy array identifiers)."""
    if "f" not in _FN_CACHE:
        ex = harmonic4_exprs()
        args = ", ".join(ENTRY_NAMES)
        src = f"lambda {args}: ({ex['det']}, {ex['det_c']}, {ex['det_s']})"
        _FN_CACHE["f"] = eval(src)  # noqa: S307 — generated from literals above
    return _FN_CACHE["f"]
