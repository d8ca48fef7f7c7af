"""Robustness sweeps: typed-empty inputs and pathological key skew.

Empty inputs catch the empty-schema/IndexError class of bug (ADVICE r3:
attach_dim's searchsorted on a 0-length dim); the skew sweep evidences the
partial-aggregation treatment (a hot key is one partial row per batch, so
a 100%-skewed corpus must complete and stay exact)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _empty_docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )


def test_text_ops_on_empty_corpus(ray_session):
    from kaza_lcms_ray.stages import dedup, text

    assert text.token_entropy(_empty_docs()).count() == 0
    assert dedup.drop_frequent_lines(_empty_docs()).count() == 0
    assert dedup.drop_dup_paragraphs(_empty_docs()).count() == 0
    assert dedup.exact_dedup_keys(_empty_docs(), "text", "doc_id").count() == 0
    out = text.zipf_fit(_empty_docs(), top=10).to_pandas()
    assert int(out["n_terms"].iloc[0]) == 0


def test_embedding_ops_on_empty_table(ray_session):
    from kaza_lcms_ray.stages import ann

    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    assert ann.gram_quantized(empty).count() == 0


def test_events_ewma_on_empty_and_single(ray_session):
    from kaza_lcms_ray.stages import events as ev

    empty = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    assert ev.ewma(empty).count() == 0
    one = rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [1],
                "user_id": [7],
                "ts": pd.to_datetime(["2024-01-01"]),
                "value": [2.5],
            }
        )
    )
    got = ev.ewma(one).to_pandas()
    assert int(got["ewma_cents"].iloc[0]) == 250


def test_hot_key_skew_exactness(ray_session):
    """100%-skewed corpus: every row in ONE cell — the partial-agg path
    must complete (one partial row per batch) and stay integer-exact."""
    from kaza_lcms_ray.stages import zonal

    n = 200_000
    t = pa.table(
        {
            "cell_id": pa.array(np.full(n, 12345, np.int64)),
            "year": pa.array(np.full(n, 2021, np.int64)),
            "c3": pa.array(np.arange(n, dtype=np.int64) % 1000),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    out = zonal.zonal_counts(ds, keys=("cell_id", "year"), bands=(3,)).to_pandas()
    assert len(out) == 1
    assert int(out["n"].iloc[0]) == n
    want = float((np.arange(n) % 1000).sum()) / (n * 100.0)
    assert abs(float(out["mean_b3"].iloc[0]) - want) < 1e-12
    sm = zonal.kring_smooth(ds, band=3, k=1).to_pandas()
    assert len(sm) == 1  # one occupied cell; its own 3x3 window = itself
    assert int(sm["nbr_n"].iloc[0]) == n
