"""Pure-Python/numpy media codecs — the dependency-free "real" decode
backend for stages/multimodal.py.

The container has no PIL / libsndfile / ffmpeg, but two formats need
nothing beyond the stdlib: PNG (zlib) and WAV-PCM (struct).  These
codecs make the media pipeline's decode step REAL for
``image/png`` and ``audio/wav`` payloads; video (mp4) has no
pure-Python codec and stays on the deterministic stub.

Scope (matches what the pipeline needs, not a general library):
* PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), no interlacing; all five scanline filters (None / Sub /
  Up / Average / Paeth, per the PNG spec §9).  CRCs are verified.
* WAV: RIFF/WAVE, PCM (format 1) 8- or 16-bit, any channel count
  (downmixed to mono by integer mean).

Per-row unfiltering is a Python loop over SCANLINES (vectorized within
each row where the filter allows); fine for the thumbnail-scale tensors
these stages produce — a production deployment swaps in a C codec
behind the same function signatures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class MediaDecodeError(ValueError):
    """Malformed or unsupported payload (callers treat as a poison row)."""


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one pixel-column of a scanline."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB.  Gray is replicated to 3
    channels; alpha is dropped.  Raises MediaDecodeError on anything
    malformed or outside the supported subset (uniform contract with
    the other decoders: corrupt bytes never surface another type)."""
    try:
        return _decode_png_inner(payload)
    except MediaDecodeError:
        raise
    except Exception as exc:
        raise MediaDecodeError(f"malformed PNG: {exc}") from exc


def _decode_png_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise MediaDecodeError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise MediaDecodeError(f"bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise MediaDecodeError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or color not in _PNG_CHANNELS or comp != 0 or filt != 0:
        raise MediaDecodeError(
            f"unsupported PNG (depth={depth} color={color})")
    if interlace != 0:
        raise MediaDecodeError("interlaced PNG unsupported")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise MediaDecodeError(f"bad dimensions {w}x{h}")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise MediaDecodeError(f"IDAT inflate failed: {exc}") from exc
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError("decompressed size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = rows[y, 1:].copy()
        f = int(filters[y])
        if f == 0:
            cur = line
        elif f == 1:  # Sub — sequential in x, vectorized across channels
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + int(
                    _paeth(np.uint8(left), prev[x:x + 1][0],
                           np.uint8(ul)))) & 0xFF
        else:
            raise MediaDecodeError(f"bad filter type {f} on row {y}")
        img[y] = cur
        prev = img[y]
    px = img.reshape(h, w, ch)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA → drop alpha


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 → PNG bytes.  ``filter_type`` applies
    the given PNG filter to every scanline (0-4) — exists mainly so
    tests can exercise every unfilter path in :func:`decode_png`."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise MediaDecodeError(f"unsupported channel count {ch}")
    flat = a.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    prev = np.zeros(stride, dtype=np.int32)
    out_rows = []
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - (left + prev) // 2
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            pred = _paeth(left.astype(np.uint8), prev.astype(np.uint8),
                          ul.astype(np.uint8)).astype(np.int32)
            enc = cur - pred
        else:
            raise MediaDecodeError(f"bad filter type {filter_type}")
        out_rows.append(bytes([filter_type])
                        + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
            + _png_chunk(b"IEND", b""))


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 samples, sample_rate).  Multi-channel is
    downmixed by integer mean; 8-bit PCM (unsigned) is widened to
    int16.  Raises MediaDecodeError outside the PCM subset (uniform
    contract: corrupt bytes never surface another exception type)."""
    try:
        return _decode_wav_inner(payload)
    except MediaDecodeError:
        raise
    except Exception as exc:
        raise MediaDecodeError(f"malformed WAV: {exc}") from exc


def _decode_wav_inner(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise MediaDecodeError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise MediaDecodeError("short fmt chunk")
    audio_format, n_ch, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if audio_format != 1 or n_ch == 0:
        raise MediaDecodeError(f"unsupported WAV format {audio_format}")
    if bits == 16:
        samples = np.frombuffer(
            data[:len(data) // 2 * 2], dtype="<i2").astype(np.int32)
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int32)
                   - 128) << 8
    else:
        raise MediaDecodeError(f"unsupported bit depth {bits}")
    n_frames = samples.size // n_ch
    mono = samples[:n_frames * n_ch].reshape(n_frames, n_ch) \
        .mean(axis=1, dtype=np.int64)
    return mono.astype(np.int16), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples → WAV-PCM16 bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------- AVI
# RIFF/AVI container (RIFF walking is WAV-adjacent) with two frame
# codecs: 'MJPG' (baseline JPEG per frame — functions/jpeg_codec) and
# raw 'DIB ' (uncompressed bottom-up BGR, BI_RGB).  This makes the
# video decode path REAL; mp4 remains out of scope (no dependency-free
# codec in this container).

_AVI_MAX_FRAMES = 100_000


def encode_avi(frames: np.ndarray, fps: int = 10, codec: str = "MJPG",
               quality: int = 85) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → AVI bytes.

    ``codec="MJPG"``: each frame is a baseline JPEG ('00dc' chunks);
    ``codec="DIB "``: uncompressed BI_RGB bottom-up BGR ('00db')."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3 or a.shape[0] == 0:
        raise MediaDecodeError(f"unsupported frame stack shape {a.shape}")
    n, h, w, _ = a.shape
    if h > 0xFFFF or w > 0xFFFF:
        raise MediaDecodeError(f"frame dimensions {w}x{h} exceed 16-bit "
                               "header fields")
    if codec == "MJPG":
        from .jpeg_codec import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality) for f in a]
        compression = b"MJPG"
        ckid = b"00dc"
    elif codec == "DIB ":
        stride = (w * 3 + 3) // 4 * 4
        payloads = []
        for f in a:
            rows = f[::-1, :, ::-1]  # bottom-up, BGR
            buf = np.zeros((h, stride), dtype=np.uint8)
            buf[:, :w * 3] = rows.reshape(h, w * 3)
            payloads.append(buf.tobytes())
        compression = b"\x00\x00\x00\x00"  # BI_RGB
        ckid = b"00db"
    else:
        raise MediaDecodeError(f"unsupported AVI codec {codec!r}")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # AVIF_HASINDEX
        n, 0, 1, max_bytes, w, h,
        0, 0, 0, 0,
    )
    strh = (b"vids" + compression.ljust(4, b"\x00")
            + struct.pack("<IHHIIIIIIIi4H",
                          0, 0, 0, 0,   # flags, prio, lang, initial
                          1, max(1, fps),  # scale, rate
                          0, n,         # start, length
                          max_bytes, 0xFFFFFFFF - (1 << 31), 0,  # bufsize, quality(-1 as int), samplesize...
                          0, 0, np.uint16(w), np.uint16(h)))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                       compression, len(payloads[0]), 0, 0, 0, 0)
    hdrl = lst(b"hdrl",
               chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(ckid, p) for p in payloads]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: one entry per frame (AVIIF_KEYFRAME=0x10)
    idx = bytearray()
    off = 4  # offsets are relative to the start of 'movi' list data
    for p, ck in zip(payloads, movi_chunks):
        idx += ckid + struct.pack("<III", 0x10, off, len(p))
        off += len(ck)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_children(data: bytes):
    """Yield (fourcc, body) pairs of a RIFF/LIST body."""
    pos = 0
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise MediaDecodeError("truncated RIFF chunk")
        yield cid, body
        pos += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → ((n, h, w, 3) uint8 RGB frames, fps).  Supports the
    two codecs :func:`encode_avi` writes — 'MJPG' baseline-JPEG frames
    and raw BI_RGB 'DIB ' frames.  Raises MediaDecodeError on ANYTHING
    outside the subset or malformed (arbitrary corrupt bytes must never
    surface a different exception type — fuzz-tested)."""
    try:
        return _decode_avi_inner(payload)
    except MediaDecodeError:
        raise
    except Exception as exc:  # struct/Value/Index from corrupt bytes
        raise MediaDecodeError(f"malformed AVI: {exc}") from exc


def _decode_avi_inner(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise MediaDecodeError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    data = payload[12:8 + riff_size]
    w = h = None
    compression = None
    bottom_up = True
    fps = 0
    frames: list[np.ndarray] = []
    for cid, body in _riff_children(data):
        if cid != b"LIST":
            continue
        kind, inner = body[:4], body[4:]
        if kind == b"hdrl":
            for cid2, body2 in _riff_children(inner):
                if cid2 == b"LIST" and body2[:4] == b"strl":
                    for cid3, body3 in _riff_children(body2[4:]):
                        if cid3 == b"strh" and body3[:4] == b"vids":
                            scale, rate = struct.unpack("<II",
                                                        body3[20:28])
                            if scale:
                                fps = max(1, rate // scale)
                        elif cid3 == b"strf" and len(body3) >= 40:
                            (_sz, bw, bh, _pl, bits) = struct.unpack(
                                "<IiiHH", body3[:16])
                            compression = body3[16:20]
                            if bits != 24:
                                raise MediaDecodeError(
                                    f"unsupported bit depth {bits}")
                            # biHeight sign is semantic (BITMAPINFOHEADER):
                            # positive = bottom-up rows, negative =
                            # top-down — only the bottom-up case flips
                            w, h = int(bw), abs(int(bh))
                            bottom_up = int(bh) > 0
        elif kind == b"movi":
            if w is None or compression is None:
                raise MediaDecodeError("movi before stream headers")
            if w <= 0 or h <= 0 or w * h > 64_000_000:
                raise MediaDecodeError(f"bad dimensions {w}x{h}")
            for cid2, body2 in _riff_children(inner):
                if cid2[2:4] not in (b"dc", b"db"):
                    continue
                if len(frames) >= _AVI_MAX_FRAMES:
                    raise MediaDecodeError("too many frames")
                if compression == b"MJPG":
                    from .jpeg_codec import decode_jpeg

                    f = decode_jpeg(body2)
                    if f.shape[:2] != (h, w):
                        raise MediaDecodeError("frame size mismatch")
                    frames.append(f)
                elif compression == b"\x00\x00\x00\x00":
                    stride = (w * 3 + 3) // 4 * 4
                    if len(body2) < stride * h:
                        raise MediaDecodeError("short DIB frame")
                    buf = np.frombuffer(body2[:stride * h],
                                        dtype=np.uint8).reshape(h, stride)
                    bgr = buf[:, :w * 3].reshape(h, w, 3)
                    rgb = bgr[:, :, ::-1]
                    if bottom_up:
                        rgb = rgb[::-1]
                    frames.append(rgb.copy())
                else:
                    raise MediaDecodeError(
                        f"unsupported AVI codec {compression!r}")
    if not frames:
        raise MediaDecodeError("no video frames")
    return np.stack(frames), int(fps)


def resize_rgb(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor (h, w, 3) → (oh, ow, 3) — same sampling rule as
    stages.multimodal.ImageResize's gather."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    ys = np.arange(oh) * h // oh
    xs = np.arange(ow) * w // ow
    return img[ys][:, xs]


def audio_to_uint8(samples: np.ndarray, n_out: int) -> np.ndarray:
    """Mono int16 → exactly n_out uint8 (top byte, re-biased to
    unsigned; trimmed or zero-padded) — the fixed-shape tensor contract
    MediaDecoder's stub also satisfies."""
    u8 = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    if u8.size >= n_out:
        return u8[:n_out]
    return np.concatenate(
        [u8, np.full(n_out - u8.size, 128, dtype=np.uint8)])
