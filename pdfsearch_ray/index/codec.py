"""Posting-list codec: delta-encoded docID gaps + LEB128 varint blocks.

The reference delegates its posting storage to bleve's scorch segment
format (vellum FST + roaring bitmaps; /root/reference/go.mod:4,10).  The
rebuild's format — mandated by the north rule — is its own: per-term
posting lists are cut into fixed-size blocks (``BLOCK_SIZE`` postings),
each block stored as one Arrow row carrying

    (term, salt, block_id, first_doc, n, doc_blob, tf_blob, dl_blob,
     pos_blob, max_wdl)

where ``doc_blob`` is the varint stream of docID deltas within the block,
``tf_blob``/``dl_blob`` are varint term-frequencies / doc-lengths, and
``max_wdl`` is the block's maximum *idf-free* BM25 partial score
``tf / (tf + k1*(1 - b + b*dl/avgdl))`` — multiplied by the term's idf at
query time it is the block upper bound that block-max WAND skips on.

Both encode and decode are numpy-vectorized (no per-value Python loop):
encode computes per-value byte widths by threshold comparison and
scatters 7-bit groups per byte-position; decode locates terminal bytes
(high bit clear) and gathers per byte-position.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a 1-D array of non-negative ints (vectorized)."""
    return varint_encode_offsets(values)[0]


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return the byte offset of every value (length
    n+1).  Lets a caller encode a whole posting run ONCE and slice
    per-block byte ranges out of the stream — no per-block encode calls.

    Bandwidth-aware: works in uint32 when every value fits (the common
    case for positions/tf/dl — halves memory traffic; the encode stage is
    DRAM-bound under full-node concurrency), accepts uint32 input
    WITHOUT a round-trip through uint64 (no full-array upcast copy), and
    short-circuits to a single cast when every value is < 128 (1-byte
    varints)."""
    if values.dtype == np.uint32:
        arr = np.ascontiguousarray(values)
    else:
        arr = np.ascontiguousarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    mx = int(arr.max())
    if mx < 128:
        out = arr.astype(np.uint8)
        return out.tobytes(), np.arange(arr.size + 1, dtype=np.int64)
    if mx < (1 << 32):
        if arr.dtype != np.uint32:
            arr = arr.astype(np.uint32)
        seven = np.uint32(7)
        mask7 = np.uint32(0x7F)
    else:
        seven = np.uint64(7)
        mask7 = np.uint64(0x7F)
    # int32 internals while the stream fits (always, for per-bucket
    # runs): the scatter loop's index temporaries are the stage's
    # biggest allocations, and halving them is wall-time under
    # full-node concurrency
    small = arr.size * 10 < (1 << 31)
    idx_t = np.int32 if small else np.int64
    nbytes = np.ones(arr.shape, dtype=np.int8)
    for t in _THRESHOLDS:
        if int(t) > mx:
            break
        nbytes += arr >= arr.dtype.type(t)
    ends = np.cumsum(nbytes, dtype=idx_t)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        vals = (arr[mask] >> (seven * arr.dtype.type(k))) & mask7
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = vals.astype(np.uint8) | cont
    offsets = np.empty(arr.size + 1, dtype=np.int64)
    offsets[0] = 0
    offsets[1:] = ends
    return out.tobytes(), offsets


def encode_positions_run(
    pos_flat: np.ndarray, pos_lens: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Vectorized positions encoding for a whole run.

    Stream per posting: varint(count), varint(first_pos), varint(gaps...).
    Returns (bytes, byte_offset_per_posting[n+1]) so any block's positions
    slice is bytes[off[a]:off[b]].  Wire-compatible with
    encode_positions/decode_positions.
    """
    lens = np.ascontiguousarray(pos_lens, dtype=np.int64)
    n = lens.size
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # positions are uint32 by schema: stay in 32 bits end-to-end (the
    # positions stream is the fattest array the encode stage touches and
    # the stage is DRAM-bandwidth-bound at full node concurrency)
    flat = np.ascontiguousarray(pos_flat, dtype=np.uint32)
    p_start = np.empty(n + 1, dtype=np.int64)
    p_start[0] = 0
    np.cumsum(lens, out=p_start[1:])
    # per-position gaps with restart at each posting's first position
    gaps = np.empty_like(flat)
    if flat.size:
        gaps[0] = flat[0]
        np.subtract(flat[1:], flat[:-1], out=gaps[1:])
        starts_nonempty = p_start[:-1][lens > 0]
        gaps[starts_nonempty] = flat[starts_nonempty]
    # interleave: out value stream has lens[i] at stream_start[i], then gaps
    total = int(flat.size + n)
    stream = np.empty(total, dtype=np.uint32)
    stream_start = p_start[:-1] + np.arange(n)  # each posting adds 1 count slot
    stream[stream_start] = lens.astype(np.uint32)
    mask = np.ones(total, dtype=bool)
    mask[stream_start] = False
    stream[mask] = gaps
    blob, val_off = varint_encode_offsets(stream)
    # byte offset of each posting's stream start (+ final end)
    post_off = np.empty(n + 1, dtype=np.int64)
    post_off[:-1] = val_off[stream_start]
    post_off[-1] = val_off[-1]
    return blob, post_off


def varint_decode(blob: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream to uint64 (vectorized)."""
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term_idx = np.nonzero(b < 128)[0]
    starts = np.empty_like(term_idx)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    lens = term_idx - starts + 1
    vals = np.zeros(term_idx.shape, dtype=np.uint64)
    maxb = int(lens.max())
    for k in range(maxb):
        mask = lens > k
        vals[mask] |= (b[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    if count is not None and vals.size != count:
        raise ValueError(f"varint stream decoded {vals.size} values, expected {count}")
    return vals


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Encode a sorted docID array as varint deltas (first value absolute)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return b""
    d = np.empty_like(a)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    return varint_encode(d)


def delta_decode(blob: bytes | memoryview, count: int | None = None) -> np.ndarray:
    d = varint_decode(blob, count)
    return np.cumsum(d, dtype=np.uint64)


def encode_positions(pos_lists: list[np.ndarray]) -> bytes:
    """Encode per-posting position lists: varint(count), then varint gaps.

    Positions are 1-based token positions (pre-stop-removal stream, bleve
    semantics); each list must be strictly increasing.
    """
    parts: list[np.ndarray] = []
    for p in pos_lists:
        a = np.ascontiguousarray(p, dtype=np.uint64)
        d = np.empty(a.size + 1, dtype=np.uint64)
        d[0] = a.size
        if a.size:
            d[1] = a[0]
            np.subtract(a[1:], a[:-1], out=d[2:])
        parts.append(d)
    if not parts:
        return b""
    return varint_encode(np.concatenate(parts))


def decode_positions(blob: bytes | memoryview, n_postings: int) -> list[np.ndarray]:
    flat = varint_decode(blob)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_postings):
        cnt = int(flat[i]); i += 1
        out.append(np.cumsum(flat[i : i + cnt], dtype=np.uint64))
        i += cnt
    return out


def bm25_wdl(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    """Idf-free BM25 partial score: tf / (tf + k1*(1 - b + b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    return tf / (tf + k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl)))


# --------------------------------------------------------- Elias-Fano

# Quasi-succinct posting compression (Elias 1974; Vigna, "Quasi-
# succinct indices", WSDM 2013 — the format behind Lucene's and
# MG4J's EF postings): a strictly-increasing id sequence over universe
# u stored as n fixed-width low halves (l = floor(log2(u/n)) bits) plus
# a unary-coded high-halves bitvector of n + (u >> l) + 1 bits — about
# 2 + log2(u/n) bits/posting, the information-theoretic optimum + 2.
# Offered as an ALTERNATIVE to delta_encode (LEB128 gaps); see
# tests/test_ef_codec.py for the round-trip contract and BASELINE.md
# for the measured size/speed comparison on real posting streams that
# decides the default.  Both codecs are self-contained over the same
# (sorted unique ids) contract, so a block's doc_blob could carry
# either; the manifest would name the choice.

def ef_encode(sorted_ids: np.ndarray) -> bytes:
    """Elias-Fano encode a strictly-increasing uint64 array.
    Layout: varint(n), varint(last), 1 byte l, high bitvector bytes
    (length derivable), low bitstream bytes."""
    v = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    n = int(v.size)
    if n == 0:
        return b""
    last = int(v[-1])
    u = last + 1
    l = max(0, (u // n).bit_length() - 1)
    header = varint_encode(np.array([n, last], dtype=np.uint64))
    # high halves, unary: bit (v_i >> l) + i set, in a vector of
    # n + (u >> l) + 1 bits
    hi_pos = (v >> np.uint64(l)) + np.arange(n, dtype=np.uint64)
    n_hi_bits = n + (u >> l) + 1
    hi_bits = np.zeros(int(n_hi_bits), dtype=np.uint8)
    hi_bits[hi_pos] = 1
    hi = np.packbits(hi_bits)
    # low halves: n fixed l-bit fields, MSB-first within each field
    if l:
        shifts = np.arange(l - 1, -1, -1, dtype=np.uint64)
        lo_bits = ((v[:, None] >> shifts[None, :])
                   & np.uint64(1)).astype(np.uint8).ravel()
        lo = np.packbits(lo_bits)
    else:
        lo = np.empty(0, dtype=np.uint8)
    return header + bytes([l]) + hi.tobytes() + lo.tobytes()


def ef_decode(blob: bytes | memoryview,
              count: int | None = None) -> np.ndarray:
    """Decode an ef_encode stream back to uint64 ids."""
    if len(blob) == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(blob, dtype=np.uint8)
    # parse the two varint header fields
    term_idx = np.nonzero(b < 128)[0][:2]
    head = varint_decode(b[:term_idx[1] + 1].tobytes(), count=2)
    n, last = int(head[0]), int(head[1])
    off = int(term_idx[1]) + 1
    l = int(b[off])
    off += 1
    u = last + 1
    n_hi_bits = n + (u >> l) + 1
    n_hi_bytes = (int(n_hi_bits) + 7) // 8
    hi_bits = np.unpackbits(b[off:off + n_hi_bytes],
                            count=int(n_hi_bits))
    high = (np.flatnonzero(hi_bits).astype(np.uint64)
            - np.arange(n, dtype=np.uint64))
    off += n_hi_bytes
    if l:
        lo_bits = np.unpackbits(b[off:], count=n * l)
        weights = (np.uint64(1) << np.arange(l - 1, -1, -1,
                                             dtype=np.uint64))
        low = lo_bits.reshape(n, l).astype(np.uint64) @ weights
        vals = (high << np.uint64(l)) | low
    else:
        vals = high
    if count is not None and vals.size != count:
        raise ValueError(
            f"ef stream decoded {vals.size} values, expected {count}")
    return vals
