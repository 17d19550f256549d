"""Multimodal stage plumbing: schemas, batching, 1→N frame sampling,
deterministic stub decode, feature shapes — the Ray-side contract that a
real codec backend would plug into."""

import numpy as np
import pyarrow as pa
import pytest

from pdfsearch_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSampler,
    ImageResize,
    MediaDecoder,
    MediaFeatures,
    synth_media_table,
)


def _docs(n=30):
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"document number {i} body text" * (1 + i % 3)
                          for i in range(n)]),
    })


def test_synth_media_schema_and_determinism():
    m1 = synth_media_table(_docs())
    m2 = synth_media_table(_docs())
    assert m1.schema.equals(MEDIA_SCHEMA)
    assert m1.equals(m2)
    kinds = set(m1["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_decoder_stub_shapes_and_determinism():
    media = synth_media_table(_docs())
    dec = MediaDecoder(image_hw=(8, 8), audio_samples=64)
    out1 = dec(media)
    out2 = dec(media)
    assert out1.equals(out2)
    assert out1["decode_ok"].to_pylist() == [True] * media.num_rows
    for kind, v in zip(out1["kind"].to_pylist(), out1["decoded"].to_pylist()):
        assert len(v) == (8 * 8 * 3 if kind in ("image", "video") else 64)


def test_unknown_backend_raises():
    with pytest.raises(NotImplementedError):
        MediaDecoder(backend="ffmpeg")


def _real_media_batch(image_hw=(8, 8)):
    """Synthetic VALID png/wav/avi payloads (encoded with our own
    pure-python writers, functions/media_codecs) + one corrupt row per
    kind."""
    from pdfsearch_ray.functions.media_codecs import (
        encode_avi,
        encode_png,
        encode_wav,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 12, 3), dtype=np.uint8)
    wav = rng.randint(-(2 ** 14), 2 ** 14, 300).astype(np.int16)
    vid = rng.randint(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    rows = [
        ("image", "image/png", encode_png(img, filter_type=4)),
        ("audio", "audio/wav", encode_wav(wav, 16000)),
        ("video", "video/avi", encode_avi(vid, fps=10, codec="DIB ")),
        ("image", "image/png", b"not a png at all"),
        ("audio", "audio/wav", b"RIFF????nope"),
        ("video", "video/mp4", b"\x00\x00\x00 ftypisom fake"),
    ]
    n = len(rows)
    return img, wav, vid, pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([r[0] for r in rows]),
        "mime": pa.array([r[1] for r in rows]),
        "payload": pa.array([r[2] for r in rows], type=pa.large_binary()),
        "width": pa.array([12, 0, 8, 12, 0, 8], type=pa.int32()),
        "height": pa.array([16, 0, 8, 16, 0, 8], type=pa.int32()),
        "n_frames": pa.array([0, 0, 4, 0, 0, 4], type=pa.int32()),
        "sample_rate": pa.array([0, 16000, 0, 0, 16000, 0],
                                type=pa.int32()),
        "duration_ms": pa.array([0, 19, 400, 0, 0, 160], type=pa.int32()),
    })


def test_real_backend_decodes_png_wav_and_avi():
    from pdfsearch_ray.functions.media_codecs import (
        audio_to_uint8,
        resize_rgb,
    )

    img, wav, vid, media = _real_media_batch()
    dec = MediaDecoder(backend="real", image_hw=(8, 8), audio_samples=64)
    out = dec(media)
    ok = out["decode_ok"].to_pylist()
    assert ok == [True, True, True, False, False, False]
    decoded = out["decoded"].to_pylist()
    # image: real pixels, resized with the documented nearest rule
    assert decoded[0] == resize_rgb(img, (8, 8)).ravel().tolist()
    # audio: real samples in the fixed-shape uint8 contract
    assert decoded[1] == audio_to_uint8(wav, 64).tolist()
    # video: REAL first frame of the raw-DIB AVI, exact pixels
    assert decoded[2] == vid[0].ravel().tolist()
    # corrupt rows (incl. the mp4 blob — no dependency-free codec) are
    # poison rows, not errors
    assert decoded[3] is None and decoded[4] is None and decoded[5] is None


def test_png_all_filters_roundtrip():
    from pdfsearch_ray.functions.media_codecs import decode_png, encode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(img, filter_type=f)),
                              img), f"filter {f}"
    gray = rng.randint(0, 256, (9, 11), dtype=np.uint8)
    out = decode_png(encode_png(gray, filter_type=2))
    assert np.array_equal(out[:, :, 0], gray) and out.shape == (9, 11, 3)
    rgba = rng.randint(0, 256, (8, 8, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba, filter_type=4)),
                          rgba[:, :, :3])


def test_wav_roundtrip_and_downmix():
    from pdfsearch_ray.functions.media_codecs import decode_wav, encode_wav

    rng = np.random.RandomState(5)
    s = rng.randint(-30000, 30000, 441).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and np.array_equal(out, s)


def test_real_backend_features_golden():
    """backend='real' through MediaFeatures keeps the same fixed-shape
    tensor contract as the stub path — and the features over REAL
    decoded pixels are deterministic (golden-pinned means)."""
    _img, _wav, _vid, media = _real_media_batch()
    dec = MediaDecoder(backend="real", image_hw=(8, 8), audio_samples=192)
    decoded = dec(media).filter(pa.compute.field("decode_ok"))
    feats = MediaFeatures()(decoded)
    vals = feats["features"].to_pylist()
    assert all(len(v) == MediaFeatures.N_FEATURES for v in vals)
    # golden: channel means of the real-decoded image row equal the
    # numpy means of the resized source pixels
    from pdfsearch_ray.functions.media_codecs import resize_rgb

    expect = resize_rgb(_img, (8, 8)).reshape(-1, 3).astype(
        np.float32).mean(axis=0)
    assert np.allclose(vals[0][:3], expect, atol=1e-4)


def test_resize_gather():
    media = synth_media_table(_docs(6))
    dec = MediaDecoder(image_hw=(8, 8))
    decoded = dec(media)
    rs = ImageResize(in_hw=(8, 8), out_hw=(4, 4))
    out = rs(decoded)
    for kind, v in zip(out["kind"].to_pylist(), out["decoded"].to_pylist()):
        if kind in ("image", "video"):
            assert len(v) == 4 * 4 * 3
        else:
            assert v is None  # audio length != image length → passed as None


def test_frame_sampler_one_to_n():
    media = synth_media_table(_docs(9))  # 3 of each kind
    fs = FrameSampler(frames_per_video=4, image_hw=(8, 8))
    out = fs(media)
    vids = media.filter(pa.compute.equal(media["kind"], "video")).num_rows
    others = media.num_rows - vids
    assert out.num_rows == vids * 4 + others
    # sampled frames differ from each other (per-frame seed)
    vrows = out.filter(pa.compute.greater(out["frame_idx"], 0))
    assert vrows.num_rows > 0


def test_features_fixed_length():
    media = synth_media_table(_docs(9))
    fs = FrameSampler(frames_per_video=2, image_hw=(8, 8))
    frames = fs(media)
    mf = MediaFeatures()
    out = mf(frames)
    for v in out["features"].to_pylist():
        assert v is not None and len(v) == MediaFeatures.N_FEATURES


def test_media_pipeline_end_to_end(ray_session):
    from pdfsearch_ray.pipelines.queries import media_features

    ds = media_features("/root/testdata/sf0.001")
    t = ds.take_all()
    assert len(t) >= 500  # one per doc + extra video frames
    row = t[0]
    assert set(row) >= {"media_id", "doc_id", "kind", "frame_idx", "features"}
    assert len(row["features"]) == MediaFeatures.N_FEATURES


def test_media_features_real_pipeline(ray_session):
    """End-to-end REAL decode in the driver-visible pipeline: every
    synthesized payload decodes (decode_ok for all rows), and an image
    row's channel means equal numpy means of the source pixels."""
    import numpy as np

    from pdfsearch_ray.pipelines.queries import media_features_real

    rows = media_features_real("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500  # one per doc, all decode_ok
    img_rows = [r for r in rows if r["kind"] == "image"]
    assert img_rows
    r0 = min(img_rows, key=lambda r: r["media_id"])
    rng = np.random.Generator(np.random.Philox(key=int(r0["media_id"])))
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    expect = img.reshape(-1, 3).astype(np.float32).mean(axis=0)
    assert np.allclose(r0["features"][:3], expect, atol=1e-3)
