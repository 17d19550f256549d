"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The reference has no media path (its only binary payloads are PDF bytes
and flatbuffers blobs, internal/serial/offset_bbox.go); this module is
the engine's media extension for training-data pipelines: decode →
resize / frame-sample → feature-extract, each a stateful batch stage.

Decode backends: ``backend="real"`` uses the pure-Python/numpy codecs
in functions/media_codecs and functions/jpeg_codec — PNG images (all
five scanline filters, CRC-verified), WAV-PCM audio, and AVI video
(baseline-MJPG or raw-DIB frames, round 4) are ALL decoded for real;
mp4 specifically stays out of scope (no dependency-free codec in this
container — no PIL/ffmpeg).  ``backend="stub"`` produces a
deterministic fake decode (pixel/sample tensors derived from the
payload bytes via a rolling hash — stable across runs, workers and
cluster sizes).
Everything Ray-side — schemas, batch shapes, actor signatures,
fixed-shape tensor columns, the 1→N frame-sampling flat_map — is real
and tested under both backends.

Memory note (the reason these stages exist as separate actor pools):
decoded tensors are ~100-1000× their encoded payloads, so decode stages
must run with SMALL batch sizes (default 32) and bounded concurrency;
callers size ``batch_size × concurrency × tensor_bytes`` to worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),        # images/video
        ("height", pa.int32()),
        ("n_frames", pa.int32()),     # video
        ("sample_rate", pa.int32()),  # audio
        ("duration_ms", pa.int32()),
    ]
)

DEFAULT_MEDIA_BATCH_SIZE = 32


def _stub_tensor(payload: bytes, n: int, seed: int) -> np.ndarray:
    """Deterministic fake decode: n uint8 values derived from the payload
    via splitmix64 over 8-byte windows.  Stable for a given payload —
    the per-row invariant real decoders must also satisfy."""
    h = np.frombuffer(payload.ljust(((len(payload) + 7) // 8) * 8, b"\0"),
                      dtype=np.uint64)
    acc = np.uint64(seed)
    for v in h[:16]:  # bounded mixing work per row
        acc = np.uint64((int(acc) ^ int(v)) * 0x9E3779B97F4A7C15 & (2**64 - 1))
    rng = np.random.Generator(np.random.Philox(key=int(acc)))
    return rng.integers(0, 256, n, dtype=np.uint8)


class MediaDecoder:
    """Actor-pool stage: payload → fixed-shape decoded tensor column.

    Output adds ``decoded:list<uint8>`` (length w*h*3 for images, one
    frame for video, ``n_samples`` for audio) and ``decode_ok:bool``.
    Use as ``ds.map_batches(MediaDecoder, fn_constructor_kwargs=...,
    batch_size=32, concurrency=N)``.

    Backends:
    * ``"stub"`` — deterministic fake tensors (payload-derived hash).
    * ``"real"`` — pure-Python/numpy codecs (functions/media_codecs +
      functions/jpeg_codec): PNG images (all five scanline filters,
      CRC-checked) decoded and nearest-neighbor-resized to
      ``image_hw``; WAV-PCM audio decoded, downmixed to mono and
      fitted to ``audio_samples`` uint8 samples; AVI video (baseline
      MJPG or raw-DIB frames) decoded for REAL — the decoded tensor is
      the FIRST frame resized to ``image_hw`` (FrameSampler is the 1→N
      path).  mp4 stays out of scope (no dependency-free codec).
      Undecodable payloads yield decode_ok=False, never a raised error
      (poison-row rule).
    """

    def __init__(self, backend: str = "stub", image_hw: tuple[int, int] = (32, 32),
                 audio_samples: int = 1024):
        if backend not in ("stub", "real"):
            raise NotImplementedError(
                f"media decode backend {backend!r} unknown; "
                "use backend='stub' or backend='real'"
            )
        self.backend = backend
        self.image_hw = image_hw
        self.audio_samples = audio_samples

    def _decode_one(self, kind: str, payload: bytes) -> np.ndarray | None:
        if payload is None or len(payload) == 0:
            return None
        h, w = self.image_hw
        if self.backend == "real":
            from ..functions.media_codecs import (
                MediaDecodeError,
                audio_to_uint8,
                decode_avi,
                decode_png,
                decode_wav,
                resize_rgb,
            )

            if kind == "image":
                try:
                    return resize_rgb(decode_png(payload),
                                      self.image_hw).ravel()
                except MediaDecodeError:
                    return None
            if kind == "audio":
                try:
                    samples, _rate = decode_wav(payload)
                except MediaDecodeError:
                    return None
                return audio_to_uint8(samples, self.audio_samples)
            if kind == "video":
                try:
                    frames, _fps = decode_avi(payload)
                except MediaDecodeError:
                    return None
                return resize_rgb(frames[0], self.image_hw).ravel()
            return None
        if kind in ("image", "video"):
            return _stub_tensor(payload, h * w * 3, seed=1)
        if kind == "audio":
            return _stub_tensor(payload, self.audio_samples, seed=2)
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        decoded: list = []
        ok: list[bool] = []
        for kind, payload in zip(kinds, payloads):
            try:
                t = self._decode_one(kind, payload)
            except Exception:
                t = None  # poison row must not kill the block (SURVEY §4)
            decoded.append(t if t is None else t.tolist())
            ok.append(t is not None)
        return batch.append_column(
            "decoded", pa.array(decoded, type=pa.list_(pa.uint8()))
        ).append_column("decode_ok", pa.array(ok, type=pa.bool_()))


class ImageResize:
    """Actor-pool stage: decoded (h,w,3) tensors → (out_h,out_w,3) by
    nearest-neighbor sampling — vectorized gather per batch."""

    def __init__(self, in_hw: tuple[int, int], out_hw: tuple[int, int]):
        ih, iw = in_hw
        oh, ow = out_hw
        ys = (np.arange(oh) * ih // oh)
        xs = (np.arange(ow) * iw // ow)
        # flat gather index into (ih*iw*3), built once per actor
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        base = (yy * iw + xx) * 3
        self.gather = np.stack([base, base + 1, base + 2], axis=-1).ravel()
        self.in_n = ih * iw * 3
        self.out_hw = out_hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["decoded"].combine_chunks()
        m = _fixed_matrix(col)
        if m is not None and m.shape[1] == self.in_n:
            # fixed-shape fast path: ONE fancy-gather for the whole batch
            out_m = m[:, self.gather]
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(out_m.ravel(), type=pa.uint8()), out_m.shape[1])
            return batch.set_column(
                batch.schema.get_field_index("decoded"), "decoded", arr)
        out: list = []
        for v in col.to_pylist():
            if v is None or len(v) != self.in_n:
                out.append(None)
            else:
                out.append(np.asarray(v, dtype=np.uint8)[self.gather].tolist())
        return batch.set_column(
            batch.schema.get_field_index("decoded"), "decoded",
            pa.array(out, type=pa.list_(pa.uint8())),
        )


class FrameSampler:
    """Video rows → one output row per sampled frame (1→N flat_map shape,
    the unidoc page-iterator analog S3/unidoc_glue.go:141-261).  Non-video
    rows pass through with frame_idx=0.

    The decoded column is a FIXED-SHAPE tensor column
    (``fixed_size_list<uint8>[h*w*3]`` backed by one contiguous uint8
    buffer), so downstream stages reshape it zero-copy to a (rows, n_px)
    matrix instead of round-tripping per-row Python lists.  The per-row
    decode is stub by default; ``backend="real"`` decodes AVI video
    (MJPG / raw-DIB frames) and PNG images with the pure-python codecs,
    sampling k REAL frames evenly — undecodable rows are dropped
    (poison-row rule); audio rows keep the stub tensor (an image-length
    tensor for audio only makes sense as a placeholder)."""

    def __init__(self, frames_per_video: int = 4, image_hw=(32, 32),
                 backend: str = "stub"):
        if backend not in ("stub", "real"):
            raise NotImplementedError(
                f"frame-sampler backend {backend!r} unknown")
        self.k = frames_per_video
        self.image_hw = image_hw
        self.backend = backend

    def _video_frames(self, payload: bytes, nf) -> list[tuple[int, np.ndarray]]:
        """(frame_idx, tensor) pairs for one video row, or [] to drop."""
        h, w = self.image_hw
        n_px = h * w * 3
        if self.backend == "real":
            from ..functions.media_codecs import (
                MediaDecodeError,
                decode_avi,
                resize_rgb,
            )

            try:
                frames, _fps = decode_avi(payload)
            except MediaDecodeError:
                return []
            total = frames.shape[0]
            k = min(self.k, total)
            return [(j * total // k,
                     resize_rgb(frames[j * total // k],
                                self.image_hw).ravel())
                    for j in range(k)]
        total = max(1, int(nf or 1))
        k = min(self.k, total)
        return [(j * total // k,
                 _stub_tensor(payload, n_px, seed=100 + (j * total // k)))
                for j in range(k)]

    def _still_tensor(self, kind: str, payload: bytes) -> np.ndarray | None:
        h, w = self.image_hw
        n_px = h * w * 3
        if self.backend == "real" and kind == "image":
            from ..functions.media_codecs import (
                MediaDecodeError,
                decode_png,
                resize_rgb,
            )

            try:
                return resize_rgb(decode_png(payload),
                                  self.image_hw).ravel()
            except MediaDecodeError:
                return None
        return _stub_tensor(payload, n_px, seed=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, w = self.image_hw
        n_px = h * w * 3
        mids: list[int] = []
        dids: list[int] = []
        kinds_out: list[str] = []
        fidx: list[int] = []
        tensors: list[np.ndarray] = []
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        media_ids = batch["media_id"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        n_frames = batch["n_frames"].to_pylist()
        for mid, did, kind, payload, nf in zip(
            media_ids, doc_ids, kinds, payloads, n_frames
        ):
            if kind == "video" and payload:
                for frame_no, tensor in self._video_frames(payload, nf):
                    mids.append(mid)
                    dids.append(did)
                    kinds_out.append("image")
                    fidx.append(frame_no)
                    tensors.append(tensor)
            elif payload:
                t = self._still_tensor(kind, payload)
                if t is None:
                    continue
                mids.append(mid)
                dids.append(did)
                kinds_out.append(kind)
                fidx.append(0)
                tensors.append(t)
        flat = (np.concatenate(tensors) if tensors
                else np.empty(0, dtype=np.uint8))
        decoded = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.uint8()), n_px)
        return pa.table({
            "media_id": pa.array(mids, type=pa.int64()),
            "doc_id": pa.array(dids, type=pa.int64()),
            "kind": pa.array(kinds_out, type=pa.string()),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "decoded": decoded,
        })


def _fixed_matrix(col) -> np.ndarray | None:
    """Zero-copy (rows, n) uint8 matrix from a fixed_size_list column, or
    None if the column is variable-length / has nulls."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not pa.types.is_fixed_size_list(arr.type) or arr.null_count:
        return None
    n = arr.type.list_size
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, n)


class MediaFeatures:
    """Decoded tensors → fixed-length float32 feature vectors (channel
    mean/std + 8-bin histogram).  Fixed-shape tensor columns take the
    fully-vectorized path (one reshape + reduction per batch, histogram
    via a single bincount); variable-length columns (raw MediaDecoder
    output with mixed image/audio lengths) fall back to per-row numpy."""

    N_FEATURES = 2 * 3 + 8

    def _features_one(self, a: np.ndarray) -> np.ndarray:
        af = a.astype(np.float32)
        ch = af.reshape(-1, 3) if af.size % 3 == 0 else af.reshape(-1, 1).repeat(3, 1)
        hist, _ = np.histogram(af, bins=8, range=(0, 256))
        return np.concatenate([
            ch.mean(axis=0), ch.std(axis=0),
            (hist / max(1, af.size)).astype(np.float32),
        ]).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["decoded"].combine_chunks()
        m = _fixed_matrix(col)
        if m is not None and m.size:
            rows, n = m.shape
            mf = m.astype(np.float32)
            ch = mf.reshape(rows, -1, 3) if n % 3 == 0 else mf[:, :, None].repeat(3, 2)
            means = ch.mean(axis=1)
            stds = ch.std(axis=1)
            # 8-bin histogram over [0,256) for ALL rows in one bincount:
            # bin = value // 32 (uint8 < 256 → bins 0..7)
            bin_idx = (m >> 5).astype(np.int64) + \
                (np.arange(rows, dtype=np.int64) * 8)[:, None]
            hist = np.bincount(bin_idx.ravel(), minlength=rows * 8) \
                .reshape(rows, 8).astype(np.float32) / n
            feats = np.concatenate([means, stds, hist], axis=1).astype(np.float32)
            farr = pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), self.N_FEATURES)
            return batch.append_column("features", farr.cast(
                pa.list_(pa.float32())))
        feats_list: list = []
        for v in col.to_pylist():
            if v is None:
                feats_list.append(None)
            else:
                feats_list.append(
                    self._features_one(np.asarray(v, dtype=np.uint8)).tolist())
        return batch.append_column(
            "features", pa.array(feats_list, type=pa.list_(pa.float32()))
        )


def synth_media_table(docs: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Deterministic synthetic media rows derived from a documents table
    (round-1 rule: synthesize inputs, no external data).  Each doc yields
    one media row; kind cycles image/audio/video by doc_id, payload is
    the utf-8 text bytes (opaque to the decoder — exactly how real
    pipelines treat undecoded media).

    ``media_id`` is the doc_id (globally unique and BATCH-LOCAL to
    compute), so this function is safe inside ``map_batches`` over a
    distributed read — the synthesis itself is distributed, no
    driver-side table load (pipelines/queries.py:media_features)."""
    ids = docs[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = docs[text_col].to_pylist()
    kinds = [("image", "audio", "video")[int(i) % 3] for i in ids]
    payloads = [(t or "").encode("utf-8") for t in texts]
    n = len(ids)
    return pa.table({
        "media_id": pa.array(ids),
        "doc_id": pa.array(ids),
        "kind": pa.array(kinds, type=pa.string()),
        "mime": pa.array(
            [{"image": "image/png", "audio": "audio/wav",
              "video": "video/mp4"}[k] for k in kinds], type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "width": pa.array(np.full(n, 32, dtype=np.int32)),
        "height": pa.array(np.full(n, 32, dtype=np.int32)),
        "n_frames": pa.array(
            np.where(np.array(kinds) == "video", 12, 0).astype(np.int32)),
        "sample_rate": pa.array(
            np.where(np.array(kinds) == "audio", 16000, 0).astype(np.int32)),
        "duration_ms": pa.array(np.full(n, 1000, dtype=np.int32)),
    })


def synth_real_media_table(docs: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Like synth_media_table but with VALID media payloads, so the
    REAL decode backend runs end-to-end on all THREE modalities: image
    rows carry actual PNGs (deterministic doc_id-derived pixels; the
    PNG filter type cycles doc_id % 5, exercising every unfilter path
    in the codec), audio rows carry WAV-PCM16 (doc_id-seeded waveform),
    video rows carry real AVIs — 4 deterministic frames, the codec
    alternating baseline MJPG and raw-DIB by doc_id, exercising both
    decode paths (functions/media_codecs.encode_avi).  Batch-local and
    deterministic, safe inside map_batches over a distributed read."""
    from ..functions.media_codecs import encode_avi, encode_png, encode_wav

    ids = docs[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = docs[text_col].to_pylist()
    kinds = [("image", "audio", "video")[int(i) % 3] for i in ids]
    payloads: list[bytes] = []
    for i, kind, text in zip(ids, kinds, texts):
        if kind == "image":
            rng = np.random.Generator(np.random.Philox(key=int(i)))
            img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            payloads.append(encode_png(img, filter_type=int(i) % 5))
        elif kind == "audio":
            t = np.arange(400, dtype=np.float64)
            wave = (np.sin(t * (0.05 + (int(i) % 7) * 0.01)) * 12000)
            payloads.append(encode_wav(wave.astype(np.int16), 16000))
        else:
            rng = np.random.Generator(np.random.Philox(key=int(i)))
            # 2 frames: multi-frame container semantics at half the
            # pure-python codec cost (MediaDecoder reads frame 0;
            # FrameSampler tests use their own longer fixtures)
            frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
            codec = "MJPG" if int(i) % 2 else "DIB "
            payloads.append(encode_avi(frames, fps=10, codec=codec))
    n = len(ids)
    return pa.table({
        "media_id": pa.array(ids),
        "doc_id": pa.array(ids),
        "kind": pa.array(kinds, type=pa.string()),
        "mime": pa.array(
            [{"image": "image/png", "audio": "audio/wav",
              "video": "video/avi"}[k] for k in kinds], type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "width": pa.array(np.full(n, 16, dtype=np.int32)),
        "height": pa.array(np.full(n, 16, dtype=np.int32)),
        "n_frames": pa.array(
            np.where(np.array(kinds) == "video", 2, 0).astype(np.int32)),
        "sample_rate": pa.array(
            np.where(np.array(kinds) == "audio", 16000, 0).astype(np.int32)),
        "duration_ms": pa.array(np.full(n, 25, dtype=np.int32)),
    })
