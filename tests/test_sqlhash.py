"""SQL mirrors of the hashing primitives must match numpy bit-for-bit."""

import duckdb
import numpy as np
import pytest

from kaza_lcms_ray.state import sqlhash
from kaza_lcms_ray.state.hashing import _fnv1a, hash_key, splitmix64
from kaza_lcms_ray.stages.dedup import _char_shingle_hashes


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_mulmod(con):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, 50, dtype=np.int64).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, 50, dtype=np.int64).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    with np.errstate(over="ignore"):
        want = a * b
    import pandas as pd

    con.register("mm", pd.DataFrame({"a": [int(x) for x in a], "b": [int(x) for x in b]}))
    got = con.sql(
        f"SELECT {sqlhash.mulmod('CAST(a AS HUGEINT)', 'CAST(b AS HUGEINT)')} FROM mm"
    ).fetchall()
    assert all(int(g[0]) == int(w) for g, w in zip(got, want))


def test_mulmod_and_splitmix(con):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**63, 200, dtype=np.int64).astype(np.uint64)
    vals = vals * np.uint64(2654435761) + np.uint64(17)  # spread over full range
    import pandas as pd

    df = pd.DataFrame({"x": [int(v) for v in vals]})
    con.register("xs", df)
    base = "SELECT CAST(x AS HUGEINT) AS xh FROM xs"
    q = sqlhash.chain_select(base, sqlhash.splitmix_steps("xh", "out", "s"))
    got = np.array([r[0] for r in con.sql(f"SELECT out FROM ({q})").fetchall()], dtype=object)
    want = splitmix64(vals)
    assert all(int(g) == int(w) for g, w in zip(got, want))
    # inline form agrees with the layered form
    got2 = con.sql(
        f"SELECT {sqlhash.splitmix_inline('CAST(x AS HUGEINT)')} FROM xs"
    ).fetchall()
    assert all(int(g[0]) == int(w) for g, w in zip(got2, want))


def test_fnv1a_chars(con):
    texts = ["", "a", "hello world", "The quick brown fox!", "a b c d e" * 7]
    import pandas as pd

    con.register("ts", pd.DataFrame({"t": texts}))
    got = con.sql(f"SELECT {sqlhash.fnv1a_chars('t')} FROM ts").fetchall()
    for (g,), t in zip(got, texts):
        assert int(g) == _fnv1a(t)


def test_rolling_window_matches_shingles(con):
    """splitmix(rolling_poly(window)) == _char_shingle_hashes per position."""
    import pandas as pd

    texts = ["hello world xyz", "abcd", "a", "abcdefgh"]
    k = 5
    rows = []
    for d, t in enumerate(texts):
        win = min(k, len(t))
        for pos in range(1, len(t) - win + 2):
            rows.append((d, t, pos, win))
    con.register("w", pd.DataFrame(rows, columns=["d", "t", "pos", "win"]))
    expr = sqlhash.rolling_poly_window("t", "pos", "win")
    q = sqlhash.chain_select(
        f"SELECT d, pos, {expr} AS rh FROM w",
        sqlhash.splitmix_steps("rh", "sh", "s"),
    )
    got = con.sql(f"SELECT d, pos, sh FROM ({q}) ORDER BY d, pos").fetchall()
    for d, t in enumerate(texts):
        want = _char_shingle_hashes(t.encode(), k)
        ours = [int(sh) for (dd, pos, sh) in got if dd == d]
        assert ours == [int(w) for w in want], t


def test_to_i64(con):
    vals = [0, 1, 2**63 - 1, 2**63, 2**64 - 1]
    import pandas as pd

    con.register("v", pd.DataFrame({"x": [int(v) for v in vals]}))
    got = con.sql(
        f"SELECT {sqlhash.to_i64('CAST(x AS HUGEINT)')} FROM v"
    ).fetchall()
    want = [int(np.uint64(v).astype(np.int64)) for v in vals]
    assert [g[0] for g in got] == want


def test_hash_key_prefix():
    assert sqlhash.hash_key_prefix(11, "px") == int(hash_key(11, "px"))
