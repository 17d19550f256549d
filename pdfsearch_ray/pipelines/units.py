"""N:1 unit-per-document indexing (the reference's page-per-PDF shape).

The reference indexes N pages per document and addresses every indexed
record by a composite ID — ``fmt.Sprintf("%04X.%d", docIdx, pageIdx)``
encoded at internal/doclib/bleve_pdf.go:57 and decoded by ``decodeID``
(internal/doclib/search_pdfs.go:528-542); per-page extraction fans one
PDF into N ``pageContents`` records (internal/doclib/unidoc_glue.go:
141-261).  This module is the web-corpus analog: one long document fans
into N chunk UNITS (the doc_chunks 1→N shape), each unit indexed as its
own record under the int64 composite ID

    unit_id = (doc_idx << UNIT_SHIFT) | unit_idx

so the regular build → query → span-hydration path works per unit
unchanged (spans and line numbers are offsets INTO THE UNIT's text,
exactly as the reference's are offsets into one page's text), and a hit
decodes back to (which document, which unit) with two shifts.

Scale shape: chunking is a stateless 1→N ``map_batches`` flat-map — no
shuffle, no driver state; the index build over units is the ordinary
build pipeline at unit granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

UNIT_SHIFT = 32
_UNIT_MASK = (1 << UNIT_SHIFT) - 1


def make_unit_id(doc_idx: int, unit_idx: int) -> int:
    """Composite record ID — the "%04X.%d" analog (bleve_pdf.go:57)."""
    if not (0 <= unit_idx <= _UNIT_MASK):
        raise ValueError(f"unit_idx {unit_idx} out of range")
    return (int(doc_idx) << UNIT_SHIFT) | int(unit_idx)


def split_unit_id(unit_id: int) -> tuple[int, int]:
    """Inverse of make_unit_id — the decodeID analog
    (search_pdfs.go:528-542)."""
    return int(unit_id) >> UNIT_SHIFT, int(unit_id) & _UNIT_MASK


def chunk_units(
    source: str | list[str] | rd.Dataset,
    *,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> rd.Dataset:
    """1→N flat-map: documents → chunk units with composite unit_id.

    Window arithmetic matches queries.doc_chunks (no trailing window
    fully contained in its predecessor); the per-chunk substring copy
    is O(output bytes).  Emits (doc_id, unit_idx, unit_id, text[,
    lang]) — feed straight into build_index(id_col="unit_id")."""
    if not isinstance(source, rd.Dataset):
        cols = [id_col, text_col] + ([lang_col] if lang_col else [])
        from ..functions.tables import read_parquet_nometa

        source = read_parquet_nometa(source, columns=cols)

    def chunk(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = t[lang_col].to_pylist() if lang_col else None
        n_chars = np.fromiter((len(x or "") for x in texts),
                              dtype=np.int64, count=len(texts))
        n_chunks = np.where(
            n_chars == 0, 0,
            np.where(n_chars <= size, 1,
                     1 + (n_chars - size + stride - 1) // stride))
        out_doc: list[int] = []
        out_unit: list[int] = []
        out_text: list[str] = []
        out_lang: list[str] = []
        for i, (did, text, k) in enumerate(zip(ids, texts, n_chunks)):
            for c in range(int(k)):
                out_doc.append(int(did))
                out_unit.append(c)
                out_text.append(text[c * stride:c * stride + size])
                if langs is not None:
                    out_lang.append(langs[i])
        unit_ids = [make_unit_id(d, c) for d, c in zip(out_doc, out_unit)]
        cols = {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "unit_idx": pa.array(out_unit, type=pa.int64()),
            "unit_id": pa.array(unit_ids, type=pa.int64()),
            text_col: pa.array(out_text, type=pa.string()),
        }
        if lang_col:
            cols[lang_col] = pa.array(out_lang, type=pa.string())
        return pa.table(cols)

    return source.map_batches(chunk, batch_format="pyarrow")


def search_units(idx, query: str, *, max_results: int = 10, **kwargs):
    """Search a unit-granularity index and decode composite IDs: returns
    ``(match, doc_idx, unit_idx)`` triples — per-unit hits with the
    regular spans/lines hydration (offsets into the UNIT text), plus
    which document and which unit each hit belongs to (the PdfPageMatch
    path/pageNum analog, search_pdfs.go:42-52)."""
    ms = idx.search(query, max_results=max_results, **kwargs)
    out = []
    for m in ms.matches:
        doc_idx, unit_idx = split_unit_id(m.doc_id)
        out.append((m, doc_idx, unit_idx))
    return ms, out
