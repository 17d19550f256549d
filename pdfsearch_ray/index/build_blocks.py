"""Posting-block builder: one hash-bucket of token tuples → block rows.

This is the body of the core shuffle (SURVEY §2.5 A1 — the work bleve's
scorch segment builder does for the reference).  Keying the groupby on
``bucket = fnv1a64(term) % P`` instead of on raw ``term`` means Ray
dispatches ~P Python calls total rather than one per distinct term (vocab
can be 10^8+ at web scale), and each call encodes all of its terms with
vectorized numpy over one sorted Arrow table.  Head-term skew within a
bucket is bounded by the salt column (stages/tokenize.py): a salted term's
postings arrive as up to S independent, internally docID-sorted runs that
the query engine unions (term-at-a-time scoring never needs them merged).

Two input shapes:

* ``encode_bucket`` — one row per (doc, term) (Tokenizer default mode).
* ``encode_bucket_segments`` — one row per (term, salt) per upstream
  batch with list-typed doc/tf/dl/position payloads (Tokenizer
  ``combine=True``).  The combiner shrinks the shuffle by roughly the
  batch size for head terms — the pre-aggregation the reference
  approximates with its 100-page bleve batches (bleve_pdf.go:64).

Both produce identical output: final doc order per (term, salt) is the
global doc_id sort, so the index is bit-identical whichever path built it
(determinism contract, SURVEY §7.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codec import BLOCK_SIZE, bm25_wdl, encode_positions, varint_encode


class _BlockWriter:
    """Accumulates posting-block output rows."""

    def __init__(self, bucket: int, k1: float, b: float, avgdl: float,
                 block_size: int):
        self.bucket = bucket
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.block_size = block_size
        self.o_bucket: list[int] = []
        self.o_term: list[str] = []
        self.o_salt: list[int] = []
        self.o_block: list[int] = []
        self.o_first: list[int] = []
        self.o_n: list[int] = []
        self.o_doc: list[bytes] = []
        self.o_tf: list[bytes] = []
        self.o_dl: list[bytes] = []
        self.o_pos: list[bytes] = []
        self.o_max: list[float] = []

    def emit_run(self, term: str, salt: int, ids: np.ndarray, tfs: np.ndarray,
                 dls: np.ndarray, plists: list[np.ndarray] | None) -> None:
        """ids must be sorted ascending; one run = one (term, salt)."""
        wdl = bm25_wdl(tfs, dls, self.k1, self.b, self.avgdl)
        bs = self.block_size
        for lo in range(0, ids.size, bs):
            hi = min(lo + bs, ids.size)
            blk_ids = ids[lo:hi]
            deltas = np.empty(blk_ids.size, dtype=np.uint64)
            deltas[0] = 0
            np.subtract(blk_ids[1:], blk_ids[:-1], out=deltas[1:])
            self.o_bucket.append(self.bucket)
            self.o_term.append(term)
            self.o_salt.append(salt)
            self.o_block.append(lo // bs)
            self.o_first.append(int(blk_ids[0]))
            self.o_n.append(hi - lo)
            self.o_doc.append(varint_encode(deltas[1:]))
            self.o_tf.append(varint_encode(tfs[lo:hi]))
            self.o_dl.append(varint_encode(dls[lo:hi]))
            self.o_pos.append(
                encode_positions(plists[lo:hi]) if plists is not None else b""
            )
            self.o_max.append(float(wdl[lo:hi].max()))

    def table(self) -> pa.Table:
        return pa.table(
            {
                "bucket": pa.array(self.o_bucket, type=pa.int32()),
                "term": pa.array(self.o_term, type=pa.string()),
                "salt": pa.array(self.o_salt, type=pa.int32()),
                "block_id": pa.array(self.o_block, type=pa.int32()),
                "first_doc": pa.array(self.o_first, type=pa.int64()),
                "n": pa.array(self.o_n, type=pa.int32()),
                "doc_blob": pa.array(self.o_doc, type=pa.large_binary()),
                "tf_blob": pa.array(self.o_tf, type=pa.large_binary()),
                "dl_blob": pa.array(self.o_dl, type=pa.large_binary()),
                "pos_blob": pa.array(self.o_pos, type=pa.large_binary()),
                "max_wdl": pa.array(self.o_max, type=pa.float32()),
            }
        )


def _empty() -> pa.Table:
    from ..schemas import POSTINGS

    return POSTINGS.empty_table()


def _list_parts(col: pa.ChunkedArray | pa.ListArray):
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return col.offsets.to_numpy(), col.values.to_numpy()


def encode_bucket(
    group: pa.Table,
    *,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Encode one bucket of per-(doc, term) token rows (Tokenizer default
    output) into posting-block rows sorted by (term, salt, block_id)."""
    if group.num_rows == 0:
        return _empty()

    order = pc.sort_indices(
        group,
        sort_keys=[("term", "ascending"), ("salt", "ascending"), ("doc_id", "ascending")],
    )
    t = group.take(order).combine_chunks()

    salts = t["salt"].to_numpy()
    doc_ids = t["doc_id"].to_numpy()
    tfs = t["tf"].to_numpy().astype(np.uint64)
    dls = t["dl"].to_numpy().astype(np.uint64)
    bucket = int(t["bucket"][0].as_py())
    pos_offsets, pos_values = _list_parts(t["positions"])
    pos_values = pos_values.astype(np.uint64)

    term_np = t["term"].to_numpy(zero_copy_only=False)
    n = len(term_np)
    change = np.ones(n, dtype=bool)
    change[1:] = (term_np[1:] != term_np[:-1]) | (salts[1:] != salts[:-1])
    run_starts = np.nonzero(change)[0]
    run_ends = np.append(run_starts[1:], n)

    w = _BlockWriter(bucket, k1, b, avgdl, block_size)
    for rs, re_ in zip(run_starts, run_ends):
        plists = [
            pos_values[pos_offsets[i] : pos_offsets[i + 1]] for i in range(rs, re_)
        ]
        w.emit_run(
            term_np[rs], int(salts[rs]),
            doc_ids[rs:re_].astype(np.uint64), tfs[rs:re_], dls[rs:re_], plists,
        )
    return w.table()


def encode_bucket_segments(
    group: pa.Table,
    *,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    with_positions: bool = True,
) -> pa.Table:
    """Encode one bucket of combined segment rows (Tokenizer
    ``combine=True`` output).  Segments of the same (term, salt) are
    concatenated and globally re-sorted by doc_id, so output is identical
    to the per-row path regardless of upstream batching."""
    if group.num_rows == 0:
        return _empty()

    order = pc.sort_indices(
        group, sort_keys=[("term", "ascending"), ("salt", "ascending")]
    )
    t = group.take(order).combine_chunks()

    salts = t["salt"].to_numpy()
    bucket = int(t["bucket"][0].as_py())
    term_np = t["term"].to_numpy(zero_copy_only=False)

    d_off, d_val = _list_parts(t["seg_docs"])
    tf_off, tf_val = _list_parts(t["seg_tfs"])
    dl_off, dl_val = _list_parts(t["seg_dls"])
    pl_off, pl_val = _list_parts(t["seg_pos_lens"])
    p_off, p_val = _list_parts(t["seg_pos"])
    p_val = p_val.astype(np.uint64)

    # per-posting start offset into the flat position values, row-major:
    # row r's positions occupy p_off[r]..p_off[r+1]; within the row, doc j
    # starts at p_off[r] + sum(lens[:j])
    n_rows = t.num_rows
    change = np.ones(n_rows, dtype=bool)
    change[1:] = (term_np[1:] != term_np[:-1]) | (salts[1:] != salts[:-1])
    run_starts = np.nonzero(change)[0]
    run_ends = np.append(run_starts[1:], n_rows)

    w = _BlockWriter(bucket, k1, b, avgdl, block_size)
    for rs, re_ in zip(run_starts, run_ends):
        ids = d_val[d_off[rs] : d_off[re_]].astype(np.uint64)
        tfs = tf_val[tf_off[rs] : tf_off[re_]].astype(np.uint64)
        dls = dl_val[dl_off[rs] : dl_off[re_]].astype(np.uint64)
        ordr = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[ordr], tfs[ordr], dls[ordr]
        plists = None
        if with_positions:
            lens = pl_val[pl_off[rs] : pl_off[re_]].astype(np.int64)
            starts = np.empty(lens.size + 1, dtype=np.int64)
            starts[0] = int(p_off[rs])
            np.cumsum(lens, out=starts[1:])
            starts[1:] += int(p_off[rs])
            plists = [
                p_val[starts[j] : starts[j + 1]] for j in ordr
            ]
        w.emit_run(term_np[rs], int(salts[rs]), ids, tfs, dls, plists)
    return w.table()