"""Multimodal columns: media spans as opaque binary refs + typed metadata,
with decode / feature-extract / resize / frame-sample as actor-pool stages.

The sandbox has no image/audio codecs, so the *codec* step is stubbed: a
``DeterministicFakeCodec`` produces seeded, shape-correct arrays from the
media_ref (or ``decoder="strict"`` raises NotImplementedError, documenting
exactly where a real libjpeg/ffmpeg call plugs in).  Everything around the
codec — the schema contract, batch sizing for large binary payloads, actor
signature, zero-copy Arrow list output — is real and tested; swapping the
stub for a real codec changes one method.

Design notes for 100 TB: media bytes dominate row size, so media stages run
with SMALL batch_size (default 256) and the documents table's ``spans``
column is projected away everywhere else (SURVEY.md §7 "very wide records").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.hashing import hash_key, hash_unit


def media_refs(documents, batch_size: int = 4096):
    """documents → one row per media span: (doc_id, span_idx, media_ref).

    Same zero-copy list-flatten shape as the geo parser; text/geo spans are
    untouched (span-sequence invariant)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        span_idx = np.arange(offsets[-1] - offsets[0], dtype=np.int64) - np.repeat(
            offsets[:-1] - offsets[0], lengths
        )
        flat = spans.flatten()
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
        mi = np.nonzero(is_media)[0]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(doc_idx[mi])),
                "span_idx": pa.array(span_idx[mi].astype(np.int32)),
                "media_ref": flat.field("media_ref").take(pa.array(mi)),
            }
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class DeterministicFakeCodec:
    """Stand-in for the image/audio codec: seeded pixels from the ref hash.

    Real deployment: replace ``decode_one`` with PIL/libjpeg/ffmpeg on the
    bytes fetched for media_ref.  Shape contract: uint8 (H, W, C)."""

    def __init__(self, height: int = 32, width: int = 32, channels: int = 3, seed: int = 11):
        self.h, self.w, self.c, self.seed = height, width, channels, seed

    def decode_batch(self, refs: list[str]) -> np.ndarray:
        """Vectorized: (n_refs, H, W, C) in one hash pass — per-image Python
        loops made media decode ~100× slower at corpus scale."""
        from ..state.hashing import fnv1a_arr

        keys = hash_key(self.seed, "px", fnv1a_arr(refs))
        n = self.h * self.w * self.c
        with np.errstate(over="ignore"):
            vals = hash_key(
                keys[:, None] if keys.ndim else np.asarray([keys]),
                np.arange(n, dtype=np.int64)[None, :],
            ) % np.uint64(256)
        return vals.astype(np.uint8).reshape(len(refs), self.h, self.w, self.c)

    def decode_one(self, ref: str) -> np.ndarray:
        return self.decode_batch([ref])[0]


class StrictCodec:
    """Documents the real-codec seam: raises until a codec library exists."""

    def decode_one(self, ref: str) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires an image/audio codec (PIL/ffmpeg), "
            "not available in this environment; use DeterministicFakeCodec"
        )


class MediaDecoder:
    """Actor-pool callable: media_ref batch → decoded pixels + basic features.

    Output: + pixels (list<uint8>, flattened H·W·C), shape (list<int32>),
    mean_intensity (f64).  Codec built once per actor."""

    def __init__(self, decoder: str = "fake", height: int = 32, width: int = 32):
        self.codec = (
            DeterministicFakeCodec(height, width) if decoder == "fake" else StrictCodec()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        if hasattr(self.codec, "decode_batch"):
            stack = self.codec.decode_batch(refs)
        else:
            stack = np.stack([self.codec.decode_one(r) for r in refs])
        n = stack.shape[0]
        npx = int(np.prod(stack.shape[1:]))
        means_np = stack.reshape(n, -1).mean(axis=1)
        # zero-copy list column from the contiguous pixel stack
        pixels = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * npx),
            pa.array(stack.reshape(-1)),
        )
        shapes = pa.array([list(stack.shape[1:])] * n, type=pa.list_(pa.int32()))
        means = pa.array(means_np, type=pa.float64())
        return (
            batch.append_column("pixels", pixels)
            .append_column("shape", shapes)
            .append_column("mean_intensity", means)
        )


class MediaResizer:
    """Actor-pool callable: nearest-neighbor resize of decoded pixels.

    Pure-numpy stand-in for the resize kernel; same actor/batch plumbing a
    real implementation uses."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix = batch.column("pixels")
        if isinstance(pix, pa.ChunkedArray):
            pix = pix.combine_chunks()
        shapes = batch.column("shape").to_pylist()
        n = len(batch)
        offs = pix.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pix.flatten().to_numpy(zero_copy_only=False)
        oh, ow = self.out_h, self.out_w
        uniform = n > 0 and all(s == shapes[0] for s in shapes)
        if uniform:
            # contiguous-buffer gather: one fancy-index over the whole stack
            h, w, c = shapes[0]
            stack = flat[offs[0] : offs[-1]].reshape(n, h, w, c)
            ys = np.arange(oh) * h // oh
            xs = np.arange(ow) * w // ow
            thumbs = stack[:, ys][:, :, xs].reshape(n, -1)
            vals = pa.array(thumbs.reshape(-1))
            thumb = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * (oh * ow * c)), vals
            )
            out_c = c
        else:  # ragged shapes: per-row gather into one flat index array
            idx_parts = []
            for i in range(n):
                h, w, c = shapes[i]
                ys = np.arange(oh) * h // oh
                xs = np.arange(ow) * w // ow
                g = ((ys[:, None] * w + xs[None, :])[:, :, None] * c
                     + np.arange(c)[None, None, :]).ravel()
                idx_parts.append(offs[i] - offs[0] + g)
            gathered = flat[np.concatenate(idx_parts)] if n else flat[:0]
            lens = np.array([oh * ow * s[2] for s in shapes], dtype=np.int64)
            thumb = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(lens))).astype(np.int32)),
                pa.array(gathered),
            )
            out_c = shapes[0][2] if n else 3
        # thumb_mean: exact integer sum of the sampled bytes / count — the
        # downstream feature the SQL oracle replays (sum < 2^53, order-free)
        tvals = thumb.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        toffs = thumb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(tvals)))
        sums = csum[toffs[1:]] - csum[toffs[:-1]]
        lens = np.maximum(toffs[1:] - toffs[:-1], 1)
        return (
            batch.append_column("thumb", thumb)
            .append_column(
                "thumb_shape",
                pa.array([[oh, ow, out_c]] * n, type=pa.list_(pa.int32())),
            )
            .append_column("thumb_mean", pa.array(sums / lens))
        )


class FrameSampler:
    """Actor-pool callable: video-style frame sampling from a media ref.

    The codec seam is the same stub as MediaDecoder (a real implementation
    calls ffmpeg seek+decode per sampled timestamp); the Ray-side plumbing —
    one input row fans out to ``n_frames`` frame rows with frame_idx and
    decoded pixels — is real and tested."""

    def __init__(self, n_frames: int = 4, decoder: str = "fake", height: int = 16, width: int = 16):
        self.n_frames = n_frames
        self.codec = (
            DeterministicFakeCodec(height, width) if decoder == "fake" else StrictCodec()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        span_idx = batch.column("span_idx").to_pylist()
        k = self.n_frames
        frame_refs = [f"{r}#frame{f}" for r in refs for f in range(k)]
        if hasattr(self.codec, "decode_batch"):
            stack = self.codec.decode_batch(frame_refs)
        else:
            stack = np.stack([self.codec.decode_one(r) for r in frame_refs])
        n = stack.shape[0]
        npx = int(np.prod(stack.shape[1:]))
        pixels = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * npx),
            pa.array(stack.reshape(-1)),
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(np.asarray(doc_ids, dtype=object), k), type=pa.string()),
                "span_idx": pa.array(np.repeat(np.asarray(span_idx), k), type=pa.int32()),
                "media_ref": pa.array(np.repeat(np.asarray(refs, dtype=object), k), type=pa.string()),
                "frame_idx": pa.array(np.tile(np.arange(k, dtype=np.int32), len(refs))),
                "pixels": pixels,
            }
        )


class AudioWaveformExtractor:
    """Actor-pool callable: media ref → int16 waveform + audio features.

    The audio analog of MediaDecoder: a real deployment decodes PCM via
    ffmpeg/soundfile in ``decode_batch``; the stand-in derives a seeded
    int16 stream per ref (splitmix64 chain keyed (seed, 'au', fnv(ref)),
    sample j = chain(kk ^ j) % 65536 − 32768 — replayed exactly by the SQL
    oracle).  Features are exact integers so they hash-compare bit-for-bit:

    - energy:          Σ v²   (≤ 2^40 at 1024 samples — exact int64)
    - peak:            max |v|
    - zero_crossings:  #{j : sign(v_j) ≠ sign(v_{j−1})}, sign = (v < 0)

    Output keeps the waveform as list<int16> (zero-copy from the
    contiguous sample stack) for downstream stages; feature queries
    project it away before any shuffle.
    """

    def __init__(self, n_samples: int = 512, seed: int = 11):
        self.n, self.seed = n_samples, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.hashing import _fnv1a

        refs = batch.column("media_ref").to_pylist()
        m = len(refs)
        keys = hash_key(
            self.seed, "au", np.asarray([_fnv1a(r) for r in refs], dtype=np.uint64)
        )
        with np.errstate(over="ignore"):
            raw = hash_key(
                np.atleast_1d(keys)[:, None], np.arange(self.n, dtype=np.int64)[None, :]
            ) % np.uint64(65536)
        v = raw.astype(np.int64) - 32768  # (m, n) int16-range samples
        energy = (v * v).sum(axis=1)
        peak = np.abs(v).max(axis=1) if self.n else np.zeros(m, dtype=np.int64)
        neg = v < 0
        zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1).astype(np.int64)
        wave = pa.ListArray.from_arrays(
            pa.array(np.arange(m + 1, dtype=np.int32) * self.n),
            pa.array(v.reshape(-1).astype(np.int16)),
        )
        return (
            batch.append_column("waveform", wave)
            .append_column("energy", pa.array(energy))
            .append_column("peak", pa.array(peak))
            .append_column("zero_crossings", pa.array(zc))
        )


def extract_waveforms(documents, n_samples: int = 512, batch_size: int = 256, concurrency=None):
    """documents → audio feature table (actor pool; small batches — the
    waveform payload dominates row size, same sizing rule as decode)."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    refs = media_refs(documents)
    return refs.map_batches(
        AudioWaveformExtractor,
        fn_constructor_kwargs={"n_samples": n_samples},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(documents, n_frames: int = 4, decoder: str = "fake", batch_size: int = 128, concurrency=None):
    """documents → frame-sampled media rows (n_frames per media span)."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    refs = media_refs(documents)
    return refs.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def decode_media(documents, decoder: str = "fake", batch_size: int = 256, concurrency=None):
    """documents → decoded media feature table (actor pool, small batches —
    binary payloads dominate memory)."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    refs = media_refs(documents)
    return refs.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
