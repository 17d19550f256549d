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


def test_real_backend_raises():
    with pytest.raises(NotImplementedError):
        MediaDecoder(backend="real")


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
