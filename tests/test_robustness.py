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


def _empty_geo():
    cols = {
        "doc_id": pa.array([], pa.int64()),
        "span_idx": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64()),
        "year": pa.array([], pa.int64()),
        "doy": pa.array([], pa.int64()),
        "cell_id": pa.array([], pa.int64()),
        "tile_id": pa.array([], pa.int64()),
    }
    for b in range(6):
        cols[f"b{b}"] = pa.array([], pa.float64())
        cols[f"c{b}"] = pa.array([], pa.int64())
    return rd.from_arrow(pa.table(cols))


def test_round4_spatial_stats_on_empty_geo(ray_session):
    from kaza_lcms_ray.stages import zonal

    assert zonal.local_morans(_empty_geo()).count() == 0
    assert zonal.idw_fill(_empty_geo()).count() == 0
    assert zonal.getis_ord(_empty_geo()).count() == 0
    assert zonal.raster_upsample(_empty_geo()).count() == 0
    assert zonal.ripley_k(_empty_geo()).count() == 0
    assert zonal.quadrat_test(_empty_geo()).count() == 0
    assert zonal.theilsen_trend(_empty_geo()).count() == 0
    assert zonal.trimmed_mean(_empty_geo()).count() == 0
    # psi on empty still yields the 16 smoothed bins, all-zero counts
    psi = zonal.psi_drift(_empty_geo()).to_pandas()
    assert len(psi) == zonal.PSI_BINS
    assert psi["n_a"].sum() == 0 and psi["n_b"].sum() == 0


def test_round4_events_ops_on_empty(ray_session):
    from kaza_lcms_ray.stages import events as ev

    empty = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    assert ev.event_transitions(empty).shape[0] == 0
    assert ev.rolling_active_users(empty).count() == 0
    assert ev.time_weighted_avg(empty).count() == 0


def test_round4_analytics_on_empty(ray_session):
    from kaza_lcms_ray.pipelines import analytics

    lineitem = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "l_extendedprice": pa.array([], pa.float64()),
                "l_discount": pa.array([], pa.float64()),
                "l_shipdate": pa.array([], pa.timestamp("us")),
            }
        )
    )
    out = analytics.revenue_rollup(lineitem)
    # grand-total row survives with zero counts
    assert out[(out.l_returnflag == "ALL")]["n"].iloc[0] == 0
    orders = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
    )
    assert analytics.order_priority_check(lineitem, orders).count() == 0


def test_round4_continuation_ops_empty_inputs(ray_session):
    """Every session-added label-raster operator handles an empty
    primitives table without crashing (empty or zero-row result)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage

    empty = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": pd.Series([], dtype=np.int64),
                    "year": pd.Series([], dtype=np.int32),
                    "class": pd.Series([], dtype=np.int32),
                    "prob": pd.Series([], dtype=np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    for fn in (
        assemblage.core_area,
        assemblage.iji,
        assemblage.contag,
        assemblage.patch_metrics,
        assemblage.cohesion,
        assemblage.pafrac,
        assemblage.mesh,
        assemblage.join_counts,
        assemblage.std_ellipse,
        assemblage.patch_gini,
        assemblage.isolation_index,
        assemblage.dissimilarity_index,
        assemblage.theil_h,
        assemblage.class_aspect,
        assemblage.class_elevation,
        assemblage.class_slope,
        assemblage.hypsometric,
    ):
        out = fn(empty, year=2022)
        assert out.count() == 0, fn.__name__
    assert assemblage.label_stability(empty).count() == 0
