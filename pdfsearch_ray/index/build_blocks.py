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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codec import BLOCK_SIZE, bm25_wdl, encode_positions, varint_encode


def encode_bucket(
    group: pa.Table,
    *,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Encode one bucket's token tuples into posting-block rows.

    Input columns: term, salt, bucket, doc_id, tf, dl, positions.
    Output: schemas.POSTINGS rows, sorted by (term, salt, block_id).
    """
    if group.num_rows == 0:
        return _empty()

    order = pc.sort_indices(
        group,
        sort_keys=[("term", "ascending"), ("salt", "ascending"), ("doc_id", "ascending")],
    )
    t = group.take(order).combine_chunks()

    terms = t["term"]
    salts = t["salt"].to_numpy()
    doc_ids = t["doc_id"].to_numpy()
    tfs = t["tf"].to_numpy().astype(np.uint64)
    dls = t["dl"].to_numpy().astype(np.uint64)
    bucket = int(t["bucket"][0].as_py())

    pos_col = t["positions"].combine_chunks()
    if isinstance(pos_col, pa.ChunkedArray):
        pos_col = pos_col.chunk(0)
    pos_offsets = pos_col.offsets.to_numpy()
    pos_values = pos_col.values.to_numpy().astype(np.uint64)

    # group boundaries where (term, salt) changes — vectorized
    term_np = terms.to_numpy(zero_copy_only=False)
    n = len(term_np)
    change = np.ones(n, dtype=bool)
    change[1:] = (term_np[1:] != term_np[:-1]) | (salts[1:] != salts[:-1])
    run_starts = np.nonzero(change)[0]
    run_ends = np.append(run_starts[1:], n)

    wdl_all = bm25_wdl(tfs, dls, k1, b, avgdl)

    o_bucket, o_term, o_salt, o_block = [], [], [], []
    o_first, o_n, o_doc, o_tf, o_dl, o_pos, o_max = [], [], [], [], [], [], []

    for rs, re_ in zip(run_starts, run_ends):
        term = term_np[rs]
        salt = int(salts[rs])
        ids = doc_ids[rs:re_].astype(np.uint64)
        for bstart in range(0, re_ - rs, block_size):
            lo = rs + bstart
            hi = min(lo + block_size, re_)
            blk_ids = ids[bstart : bstart + (hi - lo)]
            deltas = np.empty(blk_ids.size, dtype=np.uint64)
            deltas[0] = 0
            np.subtract(blk_ids[1:], blk_ids[:-1], out=deltas[1:])
            o_bucket.append(bucket)
            o_term.append(term)
            o_salt.append(salt)
            o_block.append(bstart // block_size)
            o_first.append(int(blk_ids[0]))
            o_n.append(hi - lo)
            o_doc.append(varint_encode(deltas[1:]))
            o_tf.append(varint_encode(tfs[lo:hi]))
            o_dl.append(varint_encode(dls[lo:hi]))
            plists = [
                pos_values[pos_offsets[i] : pos_offsets[i + 1]] for i in range(lo, hi)
            ]
            o_pos.append(encode_positions(plists))
            o_max.append(float(wdl_all[lo:hi].max()))

    return pa.table(
        {
            "bucket": pa.array(o_bucket, type=pa.int32()),
            "term": pa.array(o_term, type=pa.string()),
            "salt": pa.array(o_salt, type=pa.int32()),
            "block_id": pa.array(o_block, type=pa.int32()),
            "first_doc": pa.array(o_first, type=pa.int64()),
            "n": pa.array(o_n, type=pa.int32()),
            "doc_blob": pa.array(o_doc, type=pa.large_binary()),
            "tf_blob": pa.array(o_tf, type=pa.large_binary()),
            "dl_blob": pa.array(o_dl, type=pa.large_binary()),
            "pos_blob": pa.array(o_pos, type=pa.large_binary()),
            "max_wdl": pa.array(o_max, type=pa.float32()),
        }
    )


def _empty() -> pa.Table:
    from ..schemas import POSTINGS

    return POSTINGS.empty_table()
