"""Join helpers, distinct, top-k, and multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from kaza_lcms_ray.stages import joins, media


def test_join_first_semantics(ray_session):
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "lv": ["a", "b", "c"]}))
    right = rd.from_pandas(
        pd.DataFrame({"k": [1, 1, 2], "rv": ["x2", "x1", "y"], "ord": [2, 1, 5]})
    )
    out = (
        joins.join_first(left, right, on=["k"], order_col="ord", num_partitions=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    got = dict(zip(out["k"], out["rv"]))
    assert got[1] == "x1"  # first by order_col, not arrival order
    assert got[2] == "y"
    assert pd.isna(got[3])  # left row with no match survives


def test_anti_join_ids(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"id": list(range(10)), "v": range(10)}))
    out = joins.anti_join_ids(ds, "id", [2, 5, 7]).to_pandas()
    assert sorted(out["id"]) == [0, 1, 3, 4, 6, 8, 9]


def test_distinct_and_topk(synth_small, ray_session):
    from kaza_lcms_ray.stages import spans

    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    years = joins.distinct(geo, ["year"]).to_pandas()
    assert sorted(years["year"]) == [2020, 2021, 2022]
    top = joins.top_k(geo, "c3", 20, "doc_id").to_pandas()
    assert len(top) == 20
    # equals the global sort answer
    full = geo.select_columns(["c3", "doc_id"]).to_pandas()
    exp = full.sort_values(["c3", "doc_id"], ascending=[False, True]).head(20)
    assert top["c3"].tolist() == exp["c3"].tolist()


def test_media_refs_and_decode(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    refs = media.media_refs(docs)
    n = refs.count()
    assert n > 1000
    decoded = media.decode_media(docs, decoder="fake", batch_size=128).limit(50).to_pandas()
    assert set(["doc_id", "span_idx", "media_ref", "pixels", "shape", "mean_intensity"]) <= set(decoded.columns)
    assert all(list(s) == [32, 32, 3] for s in decoded["shape"])
    assert all(len(p) == 32 * 32 * 3 for p in decoded["pixels"])
    # deterministic: same ref → same pixels
    c = media.DeterministicFakeCodec()
    a, b = c.decode_one("m://abc"), c.decode_one("m://abc")
    assert (a == b).all()
    assert not (a == c.decode_one("m://abd")).all()


def test_strict_codec_documents_seam():
    with pytest.raises(NotImplementedError):
        media.StrictCodec().decode_one("m://abc")


def test_strict_codec_surfaces_through_dataset_stage(synth_small, ray_session):
    """The real-codec seam through the actual Dataset plumbing: a strict
    decoder inside the map_batches actor pool fails the pipeline with the
    seam's own NotImplementedError message — the codec swap is one method
    with a known failure mode, not a silent fake."""
    docs = rd.read_parquet(f"{synth_small}/documents")
    strict = media.decode_media(docs, decoder="strict", batch_size=32).limit(8)
    with pytest.raises(Exception, match="requires an image/audio codec"):
        strict.to_pandas()


def test_resizer_shape():
    import pyarrow as pa

    c = media.DeterministicFakeCodec()
    im = c.decode_one("m://zz")
    t = pa.table(
        {
            "pixels": pa.array([im.ravel()], type=pa.list_(pa.uint8())),
            "shape": pa.array([[32, 32, 3]], type=pa.list_(pa.int32())),
        }
    )
    out = media.MediaResizer(8, 8)(t)
    thumb = np.asarray(out.column("thumb")[0].as_py(), dtype=np.uint8).reshape(8, 8, 3)
    assert (thumb == im[::4, ::4]).all()  # nearest-neighbor grid


def test_frame_sampler(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    frames = media.sample_frames(docs, n_frames=3).limit(30).to_pandas()
    assert set(["doc_id", "span_idx", "media_ref", "frame_idx", "pixels"]) <= set(frames.columns)
    assert sorted(frames["frame_idx"].unique()) == [0, 1, 2]
    assert all(len(p) == 16 * 16 * 3 for p in frames["pixels"])
    # distinct frames of one ref differ; same frame deterministic
    one = frames[frames["frame_idx"] == 0].iloc[0]
    two = frames[(frames["media_ref"] == one["media_ref"]) & (frames["frame_idx"] == 1)].iloc[0]
    assert list(one["pixels"]) != list(two["pixels"])


def test_audio_waveform_features(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    out = media.extract_waveforms(docs, n_samples=64).limit(40).to_pandas()
    assert set(
        ["doc_id", "span_idx", "media_ref", "waveform", "energy", "peak", "zero_crossings"]
    ) <= set(out.columns)
    # features recompute exactly from the emitted waveform
    for _, r in out.head(10).iterrows():
        v = np.asarray(list(r["waveform"]), dtype=np.int64)
        assert len(v) == 64
        assert r["energy"] == int((v * v).sum())
        assert r["peak"] == int(np.abs(v).max())
        neg = v < 0
        assert r["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())
    # deterministic per ref, distinct across refs
    ex = media.AudioWaveformExtractor(n_samples=32)
    import pyarrow as pa

    t = pa.table({"media_ref": ["m://a", "m://a", "m://b"]})
    w = ex(t).column("waveform").to_pylist()
    assert w[0] == w[1] and w[0] != w[2]


def test_set_ops_intersect_except(ray_session):
    left = rd.from_pandas(
        pd.DataFrame({"k": [1, 1, 2, 3, 4, 4, 4]})
    ).repartition(3)
    right = rd.from_pandas(pd.DataFrame({"k": [2, 4, 4, 5]})).repartition(2)
    inter = sorted(joins.intersect_distinct(left, right, ["k"]).to_pandas()["k"])
    assert inter == [2, 4]  # distinct-set semantics: dups collapse
    exc = sorted(joins.except_distinct(left, right, ["k"]).to_pandas()["k"])
    assert exc == [1, 3]
    # empty result side
    none = joins.intersect_distinct(
        left, rd.from_pandas(pd.DataFrame({"k": [99]})), ["k"]
    ).to_pandas()
    assert len(none) == 0


def test_set_ops_multi_column(ray_session):
    left = rd.from_pandas(
        pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"]})
    )
    right = rd.from_pandas(pd.DataFrame({"a": [1, 2], "b": ["y", "z"]}))
    inter = joins.intersect_distinct(left, right, ["a", "b"]).to_pandas()
    assert sorted(map(tuple, inter[["a", "b"]].to_numpy())) == [(1, "y")]
    exc = joins.except_distinct(left, right, ["a", "b"]).to_pandas()
    assert sorted(map(tuple, exc[["a", "b"]].to_numpy())) == [(1, "x"), (2, "x")]
