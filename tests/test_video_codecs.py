"""Baseline JPEG codec + AVI container (the round-4 real video path):
round-trips, determinism, table validity, corrupt-input behavior, and
the FrameSampler real backend sampling actual frames."""

import numpy as np
import pytest

from pdfsearch_ray.functions.jpeg_codec import (
    AC_CHR_BITS,
    AC_CHR_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_CHR_BITS,
    DC_CHR_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)
from pdfsearch_ray.functions.media_codecs import (
    MediaDecodeError,
    decode_avi,
    encode_avi,
)


def _smooth(h, w, phase=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(y * 5 + phase * 7 + 10) % 256, (x * 4 + 30) % 256,
                     ((x + y) * 3) % 256], axis=-1).astype(np.uint8)


def test_huffman_tables_valid():
    for bits, vals in [(DC_LUM_BITS, DC_LUM_VALS), (DC_CHR_BITS, DC_CHR_VALS),
                       (AC_LUM_BITS, AC_LUM_VALS), (AC_CHR_BITS, AC_CHR_VALS)]:
        assert sum(bits) == len(vals)
        enc, dec = _canonical_codes(bits, vals)  # raises if overfull
        assert len(enc) == len(vals) and len(dec) == len(vals)
    # AC tables cover every (run, size) the encoder can emit
    _, _ = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    enc_ac, _ = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    for run in range(16):
        for size in range(1, 11):
            assert (run << 4) | size in enc_ac, (run, size)
    assert 0x00 in enc_ac and 0xF0 in enc_ac
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_jpeg_roundtrip_smooth_and_noise():
    img = _smooth(24, 30)
    for q in (70, 85, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=95))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 24
    # quality extremes exercise the q=1 clamp path
    decode_jpeg(encode_jpeg(noise, quality=100))
    decode_jpeg(encode_jpeg(noise, quality=1))


def test_jpeg_gray_and_odd_dims():
    g = (_smooth(24, 30)[:, :, 0]).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (24, 30, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 4
    odd = _smooth(13, 9)
    out = decode_jpeg(encode_jpeg(odd, quality=90))
    assert out.shape == odd.shape  # SOF true size + ceil-MCU crop


def test_jpeg_deterministic_and_corrupt():
    img = _smooth(16, 16)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)
    enc = encode_jpeg(img, 85)
    for bad in (b"", b"\xff\xd8\xff", b"notjpeg", enc[:40],
                enc[:2] + b"\x00" + enc[2:]):
        with pytest.raises(MediaDecodeError):
            decode_jpeg(bad)


def test_avi_dib_exact_roundtrip():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    out, fps = decode_avi(encode_avi(frames, fps=10, codec="DIB "))
    assert fps == 10 and np.array_equal(out, frames)
    # odd width exercises the 4-byte DIB stride padding
    f2 = rng.randint(0, 256, (2, 7, 11, 3), dtype=np.uint8)
    out2, _ = decode_avi(encode_avi(f2, codec="DIB "))
    assert np.array_equal(out2, f2)


def test_avi_mjpg_roundtrip():
    frames = np.stack([_smooth(16, 16, phase=i) for i in range(3)])
    avi = encode_avi(frames, fps=12, codec="MJPG", quality=90)
    out, fps = decode_avi(avi)
    assert fps == 12 and out.shape == frames.shape
    assert np.abs(out.astype(int) - frames.astype(int)).max() <= 12
    assert encode_avi(frames, codec="MJPG") == encode_avi(frames, codec="MJPG")


def test_avi_corrupt_inputs():
    frames = np.zeros((1, 8, 8, 3), dtype=np.uint8)
    avi = encode_avi(frames, codec="DIB ")
    for bad in (b"", b"RIFFxxxxAVI ", avi[:50], b"notavi" + avi[6:],
                b"RIFF\x08\x00\x00\x00WAVEdata"):
        with pytest.raises(MediaDecodeError):
            decode_avi(bad)
    with pytest.raises(MediaDecodeError):
        encode_avi(frames, codec="H264")


def test_frame_sampler_real_backend():
    from pdfsearch_ray.functions.media_codecs import encode_png, resize_rgb
    from pdfsearch_ray.stages.multimodal import FrameSampler

    import pyarrow as pa

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (6, 8, 8, 3), dtype=np.uint8)
    img = rng.randint(0, 256, (10, 10, 3), dtype=np.uint8)
    rows = [
        ("video", encode_avi(frames, codec="DIB "), 6),
        ("image", encode_png(img), 0),
        ("video", b"garbage not avi", 4),  # dropped (poison row)
    ]
    media = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "kind": pa.array([r[0] for r in rows]),
        "payload": pa.array([r[1] for r in rows], type=pa.large_binary()),
        "n_frames": pa.array([r[2] for r in rows], type=pa.int32()),
    })
    fs = FrameSampler(frames_per_video=3, image_hw=(8, 8), backend="real")
    out = fs(media)
    assert out.num_rows == 3 + 1  # 3 sampled frames + the image row
    vid_rows = out.filter(pa.compute.equal(out["media_id"], 0))
    idxs = vid_rows["frame_idx"].to_pylist()
    assert idxs == [0, 2, 4]  # j*total//k sampling over REAL frames
    for fi, dec in zip(idxs, vid_rows["decoded"].to_pylist()):
        assert dec == frames[fi].ravel().tolist()
    img_row = out.filter(pa.compute.equal(out["media_id"], 1))
    assert img_row["decoded"].to_pylist()[0] == \
        resize_rgb(img, (8, 8)).ravel().tolist()
    with pytest.raises(NotImplementedError):
        FrameSampler(backend="ffmpeg")


def test_stub_sampler_unchanged():
    """The stub FrameSampler path (media_inventory's oracle depends on
    its row counts) must keep its exact row/seed semantics."""
    from pdfsearch_ray.stages.multimodal import (
        FrameSampler,
        _stub_tensor,
        synth_media_table,
    )

    import pyarrow as pa

    docs = pa.table({
        "doc_id": pa.array(np.arange(9, dtype=np.int64)),
        "text": pa.array([f"doc {i} text" for i in range(9)]),
    })
    media = synth_media_table(docs)
    fs = FrameSampler(frames_per_video=4, image_hw=(8, 8))
    out = fs(media)
    vids = media.filter(pa.compute.equal(media["kind"], "video")).num_rows
    assert out.num_rows == (media.num_rows - vids) + vids * 4
    # spot-check one stub tensor seed rule
    row0 = out.filter(pa.compute.equal(out["frame_idx"], 0)).slice(0, 1)
    mid = row0["media_id"][0].as_py()
    payload = media.filter(
        pa.compute.equal(media["media_id"], mid))["payload"][0].as_py()
    kind = media.filter(
        pa.compute.equal(media["media_id"], mid))["kind"][0].as_py()
    seed = 100 + 0 if kind == "video" else 1
    assert row0["decoded"].to_pylist()[0] == \
        _stub_tensor(payload, 8 * 8 * 3, seed=seed).tolist()


def test_decoders_raise_only_media_decode_error():
    """Fuzz contract: arbitrary corrupt bytes (random and mutated-valid)
    must raise MediaDecodeError, never any other exception type — the
    FrameSampler real path catches exactly that type."""
    from pdfsearch_ray.functions.media_codecs import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    frames = rng.randint(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    seeds = {
        decode_jpeg: [encode_jpeg(img, 85)],
        decode_avi: [encode_avi(frames, codec="DIB "),
                     encode_avi(frames, codec="MJPG")],
        decode_png: [encode_png(img, filter_type=2)],
        decode_wav: [encode_wav(np.arange(100, dtype=np.int16))],
    }
    for dec, payloads in seeds.items():
        for i in range(800):
            r = np.random.RandomState(i)
            if i % 4 == 0:
                b = bytes(r.randint(0, 256, r.randint(0, 300))
                          .astype(np.uint8))
            else:
                base = bytearray(payloads[i % len(payloads)])
                for _ in range(r.randint(1, 9)):
                    base[r.randint(0, len(base))] = r.randint(0, 256)
                if r.rand() < 0.3:
                    base = base[:r.randint(0, len(base))]
                b = bytes(base)
            try:
                dec(b)
            except MediaDecodeError:
                pass  # the only permitted failure type


def test_jpeg_dimension_sweep():
    """Round-trip across awkward dimensions (1x1, single row/col, exact
    and off-by-one block multiples) — the ceil-MCU crop rule must hold
    everywhere; gradient inputs keep the lossy error small."""
    for h, w in [(1, 1), (1, 17), (17, 1), (7, 7), (8, 8), (9, 8),
                 (8, 9), (15, 16), (16, 15), (33, 31)]:
        img = _smooth(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=92))
        assert out.shape == (h, w, 3), (h, w)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 14, (h, w)
        g = img[:, :, 0]
        outg = decode_jpeg(encode_jpeg(g, quality=92))
        assert outg.shape == (h, w, 3), (h, w)


def test_avi_dib_topdown_negative_height():
    """A negative biHeight (top-down DIB, legal per BITMAPINFOHEADER)
    must decode with rows in stored order — the same file with only the
    height sign flipped decodes as the vertical mirror (round-4 advice:
    abs()+unconditional flip inverted top-down AVIs)."""
    import struct

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (2, 6, 8, 3), dtype=np.uint8)
    avi = encode_avi(frames, fps=10, codec="DIB ")
    pos, _ = decode_avi(avi)

    i = avi.index(b"strf")
    # strf chunk: 4 cid + 4 size, BITMAPINFOHEADER body; biHeight at +8
    off = i + 8 + 8
    (bh,) = struct.unpack_from("<i", avi, off)
    assert bh > 0
    neg = bytearray(avi)
    struct.pack_into("<i", neg, off, -bh)
    top_down, _ = decode_avi(bytes(neg))
    assert top_down.shape == pos.shape
    assert (top_down == pos[:, ::-1]).all()
