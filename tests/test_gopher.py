"""Gopher repetition/quality rules: hand-checked signals + SQL replay."""

import duckdb
import numpy as np
import pyarrow as pa

from kaza_lcms_ray.stages import text


def test_gopher_quality_hand_check_and_sql(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "spam spam spam spam",          # heavy repetition
                    "alpha beta gamma delta",       # all distinct
                    "",                             # empty
                ]
            ),
        }
    )
    out = (
        text.gopher_quality(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: 4 tokens, 3 bigrams all "spam spam" -> dup frac (3-1)/3
    r0 = out.iloc[0]
    assert r0["n_tokens"] == 4
    assert r0["frac_dup_2gram"] == (3 - 1) / 3
    assert r0["top_word_frac"] == 1.0
    assert r0["keep"] == 0
    # doc 1: all distinct -> zero dup fractions
    r1 = out.iloc[1]
    assert r1["frac_dup_2gram"] == 0.0 and r1["frac_dup_3gram"] == 0.0
    assert r1["top_word_frac"] == 0.25
    # doc 2: empty -> zeros, not NaN
    r2 = out.iloc[2]
    assert r2["n_tokens"] == 0 and r2["mean_word_len"] == 0.0

    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = (
        con.execute(text.gopher_quality_sql("SELECT doc_id, text FROM docs_t"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        np.testing.assert_array_equal(
            out[c].to_numpy(), want[c].to_numpy(), err_msg=c
        )


def test_gopher_string_fallback_matches_packed(ray_session):
    """The >=2^21-dictionary fallback (string grams) must equal the packed
    int64 path exactly."""
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array(
                [f"a{i % 5} b{(i * 7) % 9} a{i % 5} c common" for i in range(60)]
            ),
        }
    )
    a = (
        text.gopher_quality(rd.from_arrow(tbl))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        text.gopher_quality(rd.from_arrow(tbl), force_string_grams=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in a.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), err_msg=c)
