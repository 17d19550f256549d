"""BM25 query engine over the posting-block index.

The query-time counterpart of the reference's search path
(internal/doclib/search_pdfs.go:110-277): analyze the query with the same
chain as indexing (search_pdfs.go:160-174), probe the inverted index as
an analyzed OR-of-terms scored top-k (search_pdfs.go:176-194), then
hydrate the top-k with doc metadata, phrase spans and line numbers
(hitToPdfMatch, search_pdfs.go:330-366).

Scoring is BM25 (k1/b from the manifest, Lucene-style idf
``ln(1 + (N - df + 0.5)/(df + 0.5))``), term-at-a-time with vectorized
numpy accumulation.  Determinism (rank-identity contract, SURVEY §7.1):
query terms are processed in sorted unique order, postings per term in
(salt, block_id) order, so float accumulation order is fixed; ties break
(score desc, doc_id asc).

Partition pruning: postings are keyed ``bucket = fnv1a64(term) % P``; a
query computes each term's bucket and reads only matching row groups via
Parquet predicate pushdown — the rebuild's version of the reference's
term-dictionary probe (J3).  Reads are cached per term in the engine
(unlike the reference, which reopens per-doc files on every hit and
documents that as inefficient at bleve_pdf.go:482-484).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..analysis.analyzer import analyze_en, get_analyzer
from ..functions.hashing import fnv1a64_str
from ..index.codec import bm25_wdl, varint_decode
from ..state.manifest import IndexManifest

DEFAULT_MAX_RESULTS = 10  # DefaultMaxResults (index_search.go:54-59)
# method="auto" crossover: below this many candidate postings the
# vectorized exhaustive pass beats pruning's bookkeeping (measured
# crossover ~10^5-10^6 at sf0.1; conservative toward exact counts)
AUTO_MAXSCORE_POSTINGS = 300_000


# ---------------------------------------------------------------- phrase kernels


def best_phrases(
    query_terms: list[str],
    term_locations: dict[str, list[tuple[int, int, int]]],
) -> list[dict]:
    """Exact port of the reference's bestPhrases semantics
    (search_pdfs.go:382-484).

    ``query_terms``: analyzed query tokens IN ORDER (duplicates kept).
    ``term_locations``: matched term → [(pos, start, end)] in the doc.
    Returns phrases [{score:int, start:int, end:int}] keeping only the
    max-score set (ties kept, `>=` comparison).
    """
    term_positions: dict[str, set[int]] = {}
    start_set: set[int] = set()
    pos_loc: dict[int, tuple[int, int, int]] = {}

    for i, term in enumerate(query_terms):
        locs = term_locations.get(term)
        if not locs:
            continue
        tp = term_positions.setdefault(term, set())
        for loc in locs:
            pos = loc[0]
            pos_loc[pos] = loc  # later query-term overwrites, as in the Go map fill
            tp.add(pos)
            start_set.add(pos - i)

    phrases: list[dict] = []
    for pos0 in sorted(start_set):
        locations: list[tuple[int, int, int]] = []
        score = 0
        for k, term in enumerate(query_terms):
            pos = pos0 + k
            if term in term_positions and pos in term_positions[term]:
                locations.append(pos_loc[pos])
                score += 1
        if locations:
            phrases.append(
                {
                    "score": score,
                    "start": int(locations[0][1]),
                    "end": int(locations[-1][2]),
                }
            )

    best_score = 0
    for p in phrases:
        if p["score"] > best_score:
            best_score = p["score"]
    return [p for p in phrases if p["score"] >= best_score]


def line_starts(text: str) -> np.ndarray:
    """Start offset of every line, computed once per doc (the
    "precalculate this" the reference leaves as a TODO at
    search_pdfs.go:546 — it rescans the page text per span)."""
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    # offsets are in characters; for ascii-dominated corpora bytes==chars,
    # but to stay exact under unicode use a python scan only when needed
    if raw.size == len(text):
        nl = np.nonzero(raw == 0x0A)[0]
        return np.concatenate(([0], nl + 1))
    starts = [0]
    idx = text.find("\n")
    while idx != -1:
        starts.append(idx + 1)
        idx = text.find("\n", idx + 1)
    return np.asarray(starts, dtype=np.int64)


def line_number(text: str, offset: int, starts: np.ndarray | None = None
                ) -> tuple[int, str] | None:
    """1-offset line number + line text containing char ``offset``
    (lineNumber, search_pdfs.go:544-584)."""
    if offset < 0 or offset > len(text):
        return None
    if starts is None:
        starts = line_starts(text)
    ln = int(np.searchsorted(starts, offset, side="right")) - 1
    end = int(starts[ln + 1]) - 1 if ln + 1 < len(starts) else len(text)
    return ln + 1, text[int(starts[ln]) : end]


def _aggregate_scores(all_ids: np.ndarray,
                      all_sc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group-sum scores by doc id.

    Large inputs use pandas ``factorize`` (hash table, O(n)) instead of
    ``np.unique`` (argsort, O(n log n)) — measured ~2× on the 1-2M-row
    aggregations behind heavy-query p95 — and ``np.bincount`` instead of
    the buffered ``np.add.at``.  Both paths accumulate in input order,
    so float rounding is identical and the rank-identity contract holds;
    the returned ids are NOT sorted (no caller needs them sorted — top-k
    selection lexsorts explicitly)."""
    if all_ids.size == 0:
        return all_ids, all_sc
    if all_ids.size > 65536:
        import pandas as pd

        codes, uniq = pd.factorize(all_ids, sort=False)
        scores = np.bincount(codes, weights=all_sc, minlength=len(uniq))
        return np.asarray(uniq, dtype=all_ids.dtype), scores
    uniq, inv = np.unique(all_ids, return_inverse=True)
    scores = np.zeros(uniq.size)
    np.add.at(scores, inv, all_sc)
    return uniq, scores


@dataclass
class Match:
    doc_id: int
    url: str
    score: float
    spans: list[dict] = field(default_factory=list)  # {start,end,score}
    line_nums: list[int] = field(default_factory=list)
    lines: list[str] = field(default_factory=list)
    fragment: str = ""


@dataclass
class MatchSet:
    """PdfMatchSet analog (search_pdfs.go:28-60)."""

    total_matches: int = 0
    search_duration: float = 0.0
    matches: list[Match] = field(default_factory=list)

    def best(self) -> "MatchSet":
        """Best() semantics exactly (search_pdfs.go:62-102): keep only
        spans (and their line info) at the global max span score."""
        best_score = 0.0
        for m in self.matches:
            for s in m.spans:
                if s["score"] >= best_score:
                    best_score = s["score"]
        out = MatchSet(search_duration=self.search_duration)
        for m in self.matches:
            spans, line_nums, lines = [], [], []
            for i, s in enumerate(m.spans):
                if s["score"] >= best_score:
                    spans.append(s)
                    if i < len(m.line_nums):
                        line_nums.append(m.line_nums[i])
                        lines.append(m.lines[i])
            if spans:
                out.matches.append(
                    Match(m.doc_id, m.url, m.score, spans, line_nums, lines, m.fragment)
                )
                out.total_matches += len(spans)
        return out

    def files(self) -> list[str]:
        """Distinct urls, first-seen order (Files(), search_pdfs.go:313-326)."""
        seen: set[str] = set()
        out: list[str] = []
        for m in self.matches:
            if m.url not in seen:
                seen.add(m.url)
                out.append(m.url)
        return out


# ---------------------------------------------------------------- engine


class CorruptIndexError(RuntimeError):
    """A posting block failed its crc32 integrity check (F2 framing —
    the reference CRC-frames its page blobs, doc_positions.go:140-153)."""


class BM25Index:
    """Query-side index handle (ST3 analog).  Construct once; reuse —
    ``ReuseIndex`` semantics (index_search.go:86-91)."""

    def __init__(self, index_dir: str | None, *,
                 verify_checksums: bool = False,
                 doc_range: tuple[int, int] | None = None):
        self._postings_mem: pa.Table | None = None
        self._docs_mem: pa.Table | None = None
        self._deleted: np.ndarray | None = None  # sorted tombstoned ids
        self.verify_checksums = verify_checksums
        # doc-range-sharded handle (round 4): posting reads skip row
        # groups whose [first_doc.min, last_doc.max] span misses the
        # range, so a shard's IO ∝ its slice for long posting lists.
        # df/idf stay GLOBAL (a cheap term+n metadata read covers the
        # out-of-range row groups), so scores are bitwise-identical to
        # the unsharded handle.  Use only via topk_in_range with the
        # same range (engine.ShardEngine).
        self.doc_range = doc_range
        self._df_global: dict[str, int] = {}
        # open-handle / read accounting (F7 parity: the reference counts
        # open file handles, utils/fileio.go:131-193)
        self.io_stats: dict[str, int] = {
            "postings_files_opened": 0,
            "postings_row_groups_read": 0,
            "docs_files_opened": 0,
            "docs_row_groups_read": 0,
            "blocks_verified": 0,
            # narrow (term, n) metadata reads over doc-range-pruned row
            # groups (global-df upkeep on shard handles) — tracked
            # separately from blob reads
            "df_row_groups_read": 0,
        }
        if index_dir is not None:
            self.index_dir = index_dir
            self.manifest = IndexManifest.load(index_dir)
            # Segment-aware open (append_index, the forceCreate=false
            # analog): only manifest-COMMITTED segment dirs are read, so
            # a crashed append's half-written segment is invisible.
            # Per-dir avgdl_baked drives the block-max bound correction
            # in _build_bucket_frag_index.
            seg_dirs = [("base", index_dir, self.manifest.avgdl)]
            for s in self.manifest.segments:
                if s["name"] == "base":
                    seg_dirs[0] = ("base", index_dir,
                                   float(s["avgdl_baked"]))
                else:
                    seg_dirs.append((
                        s["name"], f"{index_dir}/segments/{s['name']}",
                        float(s["avgdl_baked"])))
            self._seg_dirs = seg_dirs
            import glob as _glob

            post_files, doc_files = [], []
            self._post_file_seg: dict[str, tuple[int, float]] = {}
            for si, (_, d, baked) in enumerate(seg_dirs):
                pf = sorted(_glob.glob(f"{d}/postings/*.parquet"))
                post_files.extend(pf)
                for p in pf:
                    self._post_file_seg[p] = (si, baked)
                doc_files.extend(sorted(_glob.glob(f"{d}/docs/*.parquet")))
            self.postings = pads.dataset(post_files, format="parquet")
            self.docs = pads.dataset(doc_files, format="parquet")
            self.analyze = get_analyzer(self.manifest.analyzer)
            if self.manifest.tombstones:
                from .build import _load_tombstones

                tomb = _load_tombstones(index_dir, self.manifest)
                if tomb.size:
                    self._deleted = tomb.astype(np.uint64)
        self._term_cache: dict[str, list[dict]] = {}
        self._doc_rg_index: list[tuple[str, int, int, int]] | None = None
        self._pf_cache: dict[str, Any] = {}
        self._bucket_frags: dict[int, list] | None = None
        from collections import OrderedDict

        self._analysis_cache: OrderedDict[int, list] = OrderedDict()
        self._analysis_cache_max = 256

    @classmethod
    def from_tables(cls, manifest: IndexManifest, postings: pa.Table,
                    docs: pa.Table) -> "BM25Index":
        """In-memory index handle (S5 parity: the reference's mem index
        when persistDir=="", bleve_glue.go:35-38) — used for tests and
        small ephemeral corpora; same scoring code paths."""
        self = cls(None)
        self.index_dir = None
        self.manifest = manifest
        self._postings_mem = postings
        self._docs_mem = docs.sort_by("doc_id")
        self.analyze = get_analyzer(manifest.analyzer)
        return self

    def _build_doc_rg_index(self) -> list[tuple[str, int, int, int]]:
        """(file, row_group, min_doc_id, max_doc_id) from parquet footers —
        read once, then every hit hydration touches only matching row
        groups instead of stat-scanning the whole docs dataset (the
        reference reopens per-doc files per hit and calls that slow,
        bleve_pdf.go:482-484; this is the indexed version)."""
        import pyarrow.parquet as pq

        out = []
        for frag in self.docs.get_fragments():
            md = pq.ParquetFile(frag.path).metadata
            idx = md.schema.to_arrow_schema().names.index("doc_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None:
                    out.append((frag.path, rg, -(1 << 62), 1 << 62))
                else:
                    out.append((frag.path, rg, st.min, st.max))
        return out

    # -- posting access ------------------------------------------------

    def _load_terms(self, terms: list[str]) -> None:
        """Fetch posting-block rows for terms (bucket- and row-group-pruned
        parquet read).  Blocks stay ENCODED until a scorer touches them —
        block-max pruning must be able to skip a block without paying its
        decode."""
        missing = [t for t in terms if t not in self._term_cache]
        if not missing:
            return
        nb = self.manifest.num_buckets
        salt_spec = self.manifest.salt_spec or {}
        bucket_set: set[int] = set()
        for t in missing:
            n_salts = int(salt_spec.get(t, 0))
            if n_salts:
                # hot terms are sharded across buckets by salt (see
                # Tokenizer._bucket_salted) — probe every shard bucket
                bucket_set.update(
                    fnv1a64_str(f"{t}#{s}") % nb for s in range(n_salts)
                )
            else:
                bucket_set.add(fnv1a64_str(t) % nb)
        buckets = sorted(bucket_set)
        cols = ["term", "salt", "block_id", "first_doc", "n",
                "doc_blob", "tf_blob", "dl_blob", "pos_blob", "max_wdl"]
        schema_names = (self._postings_mem.schema.names
                        if self._postings_mem is not None
                        else self.postings.schema.names)
        check_crc = self.verify_checksums and "crc" in schema_names
        if check_crc:
            cols = cols + ["crc"]
        if self._postings_mem is not None:
            mask = pc.is_in(self._postings_mem["term"], value_set=pa.array(missing))
            tbl = self._postings_mem.filter(mask).select(cols)
        else:
            if self._bucket_frags is None:
                self._bucket_frags = self._build_bucket_frag_index()
            bucket_arr = set(buckets)
            want_all = [
                (path, rg, seg, bf, dmin, dmax)
                for (path, rg, bmin, bmax, tmin, tmax, seg, bf, dmin, dmax)
                in self._bucket_frags
                if any(bmin <= b <= bmax for b in bucket_arr)
                and (tmin is None or any(tmin <= t <= tmax for t in missing))
            ]
            if self.doc_range is not None:
                lo, hi = self.doc_range
                want = [(p, rg, seg, bf) for (p, rg, seg, bf, dmin, dmax)
                        in want_all if dmax >= lo and dmin < hi]
                skipped = [(p, rg) for (p, rg, seg, bf, dmin, dmax)
                           in want_all if not (dmax >= lo and dmin < hi)]
                # global df for idf: the skipped row groups' postings
                # still count — a narrow (term, n) metadata read, no
                # blob bytes leave storage
                if skipped:
                    self._accumulate_df(skipped, missing)
            else:
                want = [(p, rg, seg, bf)
                        for (p, rg, seg, bf, _d0, _d1) in want_all]

            def _read_one(pr):
                import pyarrow.parquet as pq

                path, rg, seg, bf = pr
                t = pq.ParquetFile(path).read_row_group(
                    rg, columns=cols, use_threads=False
                )
                t = t.filter(
                    pc.is_in(t["term"], value_set=pa.array(missing))
                )
                # block-max bounds were encoded under that segment's
                # avgdl; scaling by max(1, avgdl_now/avgdl_baked) keeps
                # them valid upper bounds (wdl ratio <= avgdl'/avgdl).
                # Cast unconditionally so all fragments concat-compatible.
                t = t.set_column(
                    t.schema.get_field_index("max_wdl"), "max_wdl",
                    pc.multiply(t["max_wdl"].cast(pa.float64()), bf))
                return t.append_column(
                    "seg", pa.array(np.full(t.num_rows, seg,
                                            dtype=np.int32)))

            # direct row-group reads (cheap ParquetFile open, no dataset
            # expression machinery — measured ~10x less per-read overhead
            # than fragment.to_table); reads release the GIL → threaded
            if len(want) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(8, len(want))) as pool:
                    parts = list(pool.map(_read_one, want))
            else:
                parts = [_read_one(pr) for pr in want]
            self.io_stats["postings_files_opened"] += len(
                {p for p, *_ in want})
            self.io_stats["postings_row_groups_read"] += len(want)
            parts = [p for p in parts if p.num_rows]
            if not parts:
                # nothing to decode — also covers an EMPTY index, whose
                # postings dataset has no files and hence no schema
                for t in missing:
                    self._term_cache[t] = []
                return
            tbl = pa.concat_tables(parts)
        for t in missing:
            self._term_cache[t] = []
        if tbl.num_rows == 0:
            return
        if "seg" not in tbl.schema.names:  # mem index: single segment
            tbl = tbl.append_column(
                "seg", pa.array(np.zeros(tbl.num_rows, dtype=np.int32)))
        tbl = tbl.sort_by([("term", "ascending"), ("salt", "ascending"),
                           ("seg", "ascending"),
                           ("block_id", "ascending")]).combine_chunks()
        terms_np = tbl["term"].to_pylist()
        salts = tbl["salt"].to_numpy()
        segs = tbl["seg"].to_numpy()
        firsts = tbl["first_doc"].to_numpy()
        ns = tbl["n"].to_numpy()
        maxw = tbl["max_wdl"].to_numpy()
        doc_b = tbl["doc_blob"].to_pylist()
        tf_b = tbl["tf_blob"].to_pylist()
        dl_b = tbl["dl_blob"].to_pylist()
        pos_b = tbl["pos_blob"].to_pylist()
        if check_crc:
            from zlib import crc32

            crcs = tbl["crc"].to_numpy()
            for i in range(len(terms_np)):
                got = crc32(pos_b[i],
                            crc32(dl_b[i], crc32(tf_b[i], crc32(doc_b[i]))))
                if got != int(crcs[i]):
                    raise CorruptIndexError(
                        f"posting block checksum mismatch for term "
                        f"{terms_np[i]!r} block {i}: stored {int(crcs[i])}, "
                        f"computed {got}"
                    )
            self.io_stats["blocks_verified"] += len(terms_np)
        for i, term in enumerate(terms_np):
            self._term_cache[term].append({
                "salt": int(salts[i]),
                "seg": int(segs[i]),
                "first_doc": int(firsts[i]),
                "n": int(ns[i]),
                "doc_blob": doc_b[i],
                "tf_blob": tf_b[i],
                "dl_blob": dl_b[i],
                "pos_blob": pos_b[i],
                "max_wdl": float(maxw[i]),
            })

    def _build_bucket_frag_index(self) -> list[tuple]:
        """(path, row_group, bucket_min, bucket_max, term_min, term_max,
        seg, bound_factor, doc_min, doc_max) per postings row group, from
        parquet footers — read once per index handle.  The build writes
        one bucket per file with small row groups, so a query prunes to
        the few row groups whose bucket AND term ranges cover its terms,
        then reads them directly.  ``seg`` identifies the append segment
        the file belongs to (MaxScore scores each (term, salt, seg) run
        independently — doc ids are only sorted WITHIN a segment);
        ``bound_factor`` is the max(1, avgdl_now/avgdl_baked) block-max
        correction.  ``doc_min``/``doc_max`` come from the
        first_doc/last_doc column stats (full-range for indexes built
        before the last_doc column existed) and drive the doc-range
        shard pruning."""
        import pyarrow.parquet as pq

        avgdl_now = self.manifest.avgdl
        file_seg = getattr(self, "_post_file_seg", {})
        out: list[tuple] = []
        max_b = self.manifest.num_buckets - 1
        for frag in self.postings.get_fragments():
            seg, baked = file_seg.get(frag.path, (0, avgdl_now))
            bf = max(1.0, avgdl_now / baked) if baked > 0 else 1.0
            md = pq.ParquetFile(frag.path).metadata
            names = md.schema.to_arrow_schema().names
            b_idx = names.index("bucket")
            t_idx = names.index("term")
            f_idx = names.index("first_doc")
            l_idx = names.index("last_doc") if "last_doc" in names else None
            for rg in range(md.num_row_groups):
                bst = md.row_group(rg).column(b_idx).statistics
                tst = md.row_group(rg).column(t_idx).statistics
                bmin, bmax = ((bst.min, bst.max)
                              if bst is not None and bst.min is not None
                              else (0, max_b))
                tmin, tmax = ((tst.min, tst.max)
                              if tst is not None and tst.min is not None
                              else (None, None))
                fst = md.row_group(rg).column(f_idx).statistics
                dmin = (fst.min if fst is not None and fst.min is not None
                        else -(1 << 62))
                if l_idx is not None:
                    lst = md.row_group(rg).column(l_idx).statistics
                    dmax = (lst.max
                            if lst is not None and lst.max is not None
                            else 1 << 62)
                else:
                    dmax = 1 << 62
                out.append((frag.path, rg, bmin, bmax, tmin, tmax, seg, bf,
                            dmin, dmax))
        return out

    def _accumulate_df(self, skipped: list[tuple], missing: list[str]) -> None:
        """Sum posting counts for ``missing`` terms over out-of-range row
        groups — (term, n) columns only, so global idf survives
        doc-range read pruning without touching blob bytes."""
        import pyarrow.parquet as pq

        def _one(pr):
            path, rg = pr
            t = pq.ParquetFile(path).read_row_group(
                rg, columns=["term", "n"], use_threads=False)
            return t.filter(pc.is_in(t["term"], value_set=pa.array(missing)))

        if len(skipped) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(8, len(skipped))) as pool:
                parts = list(pool.map(_one, skipped))
        else:
            parts = [_one(pr) for pr in skipped]
        self.io_stats["df_row_groups_read"] += len(skipped)
        for t in missing:
            self._df_global.setdefault(t, 0)
        for p in parts:
            if p.num_rows == 0:
                continue
            terms = p["term"].to_pylist()
            ns = p["n"].to_numpy()
            for term, n in zip(terms, ns):
                self._df_global[term] += int(n)

    def _decode_block(self, blk: dict, idf: float) -> dict:
        """Decode a posting block in place (memoized): ids, per-posting
        BM25 contribution (idf × wdl)."""
        if "ids" not in blk:
            m = self.manifest
            n = blk["n"]
            first = np.uint64(blk["first_doc"])
            gaps = varint_decode(blk["doc_blob"], count=n - 1)
            ids = np.empty(n, dtype=np.uint64)
            ids[0] = first
            if n > 1:
                np.cumsum(gaps, out=ids[1:])
                ids[1:] += first
            tf = varint_decode(blk["tf_blob"], count=n)
            dl = varint_decode(blk["dl_blob"], count=n)
            blk["ids"] = ids
            blk["tf"] = tf
            blk["dl"] = dl
            blk["scores"] = idf * bm25_wdl(tf, dl, m.k1, m.b, m.avgdl)
        return blk

    def _decode_blocks_bulk(self, blocks: list[dict], idf: float) -> None:
        """Decode many posting blocks in ONE varint pass per stream kind.

        Per-block ``varint_decode`` costs ~30µs of fixed numpy overhead;
        a multi-term query over a large corpus touches thousands of
        blocks, so the exhaustive scorer concatenates the blobs and
        decodes each stream once, then splits per block with cheap
        slices (docID gaps use a segmented cumsum: each block's first id
        is stored absolute, so any split point is a restart).

        CAVEAT: the decode caches each block's ``scores`` at the idf it
        was FIRST given and never re-scores — callers that mix idf=1.0
        positional decodes and idf-weighted scoring must use SEPARATE
        handles (see pipelines/querystring.py)."""
        todo = [b for b in blocks if "ids" not in b]
        if not todo:
            return
        m = self.manifest
        n_arr = np.array([b["n"] for b in todo], dtype=np.int64)
        gap_counts = n_arr - 1
        gaps = varint_decode(b"".join(b["doc_blob"] for b in todo),
                             count=int(gap_counts.sum()))
        tf = varint_decode(b"".join(b["tf_blob"] for b in todo),
                           count=int(n_arr.sum()))
        dl = varint_decode(b"".join(b["dl_blob"] for b in todo),
                           count=int(n_arr.sum()))
        scores_all = idf * bm25_wdl(tf, dl, m.k1, m.b, m.avgdl)
        g = np.cumsum(gaps, dtype=np.uint64)
        gap_ends = np.cumsum(gap_counts)
        ends = np.cumsum(n_arr)
        for i, b in enumerate(todo):
            n = int(n_arr[i])
            first = np.uint64(b["first_doc"])
            ids = np.empty(n, dtype=np.uint64)
            ids[0] = first
            ge = int(gap_ends[i])
            gs = ge - int(gap_counts[i])
            if n > 1:
                base = g[gs - 1] if gs > 0 else np.uint64(0)
                ids[1:] = (g[gs:ge] - base) + first
            e = int(ends[i])
            s = e - n
            b["ids"] = ids
            b["tf"] = tf[s:e]
            b["dl"] = dl[s:e]
            b["scores"] = scores_all[s:e]

    def _term_df(self, term: str) -> int:
        # cached (in-range) blocks + out-of-range metadata counts — df is
        # GLOBAL even on a doc-range-pruned shard handle
        return (sum(b["n"] for b in self._term_cache.get(term, ()))
                + self._df_global.get(term, 0))

    def _idf(self, term: str) -> float:
        df = self._term_df(term)
        if df == 0:
            return 0.0
        m = self.manifest
        return float(np.log(1.0 + (m.n_docs - df + 0.5) / (df + 0.5)))

    # -- scoring -------------------------------------------------------

    def _score(self, uniq_terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Exact TAAT disjunctive scoring → (doc_ids, scores).  Exhaustive:
        used when exact total-match counts are required and for the test
        oracle; decodes every block of every query term."""
        id_parts: list[np.ndarray] = []
        sc_parts: list[np.ndarray] = []
        for t in uniq_terms:
            blocks = self._term_cache.get(t, [])
            idf = self._idf(t)
            if idf == 0.0:
                continue
            self._decode_blocks_bulk(blocks, idf)
            for b in blocks:
                id_parts.append(b["ids"])
                sc_parts.append(b["scores"])
        if not id_parts:
            return np.empty(0, dtype=np.uint64), np.empty(0)
        all_ids = np.concatenate(id_parts)
        all_sc = np.concatenate(sc_parts)
        uniq, scores = _aggregate_scores(all_ids, all_sc)
        if self._deleted is not None and uniq.size:
            keep = ~np.isin(uniq, self._deleted)
            uniq, scores = uniq[keep], scores[keep]
        return uniq, scores

    def _score_range(
        self, uniq_terms: list[str], lo: int, hi: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact TAAT restricted to doc_id ∈ [lo, hi) — the per-shard
        scorer behind scatter-gather serving (engine.ShardedEngine,
        SURVEY §2.6 T1 at scale).  Blocks outside the range are skipped
        WITHOUT decoding: within a (salt, seg) run blocks are
        docID-sorted, so block j covers [first_j, first_{j+1}).  idf
        stays GLOBAL (the shard split is read-side only), so per-doc
        scores are bitwise-identical to unsharded TAAT."""
        id_parts: list[np.ndarray] = []
        sc_parts: list[np.ndarray] = []
        ulo, uhi = np.uint64(max(lo, 0)), np.uint64(max(hi, 0))
        for t in uniq_terms:
            blocks = self._term_cache.get(t, [])
            idf = self._idf(t)
            if idf == 0.0:
                continue
            selected: list[dict] = []
            run_key = None
            run: list[dict] = []

            def flush(run: list[dict]) -> None:
                for j, b in enumerate(run):
                    b_lo = b["first_doc"]
                    if b_lo >= hi:
                        return  # docID-sorted: rest of run is past range
                    if j + 1 < len(run) and run[j + 1]["first_doc"] <= lo:
                        continue
                    selected.append(b)

            for b in blocks:
                key = (b["salt"], b["seg"])
                if key != run_key:
                    if run:
                        flush(run)
                    run, run_key = [], key
                run.append(b)
            if run:
                flush(run)
            self._decode_blocks_bulk(selected, idf)
            for b in selected:
                ids = b["ids"]
                m = (ids >= ulo) & (ids < uhi)
                if m.all():
                    id_parts.append(ids)
                    sc_parts.append(b["scores"])
                elif m.any():
                    id_parts.append(ids[m])
                    sc_parts.append(b["scores"][m])
        if not id_parts:
            return np.empty(0, dtype=np.uint64), np.empty(0)
        all_ids = np.concatenate(id_parts)
        all_sc = np.concatenate(sc_parts)
        uniq, scores = _aggregate_scores(all_ids, all_sc)
        if self._deleted is not None and uniq.size:
            keep = ~np.isin(uniq, self._deleted)
            uniq, scores = uniq[keep], scores[keep]
        return uniq, scores

    def topk_in_range(
        self, query: str, max_results: int, lo: int, hi: int
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """Shard-local top-k: (doc_ids, scores, n_matched_in_range),
        selection rule identical to search()'s (score desc, doc_id asc).
        No hydration — the scatter-gather driver hydrates the merged
        global top-k only."""
        if self.manifest.analyzer == "en":
            q_terms = [tok.term for tok in analyze_en(query)]
        else:
            q_terms = self.analyze(query)
        uniq_terms = sorted(set(q_terms))
        self._load_terms(uniq_terms)
        ids, scores = self._score_range(uniq_terms, lo, hi)
        total = int(ids.size)
        if not ids.size or max_results <= 0:
            return np.empty(0, dtype=np.uint64), np.empty(0), total
        k = min(max_results, ids.size)
        if ids.size > k * 8:
            kth = np.partition(scores, ids.size - k)[ids.size - k]
            mask = scores >= kth
            ids, scores = ids[mask], scores[mask]
        order = np.lexsort((ids, -scores))[:k]
        return ids[order], scores[order], total

    def _score_maxscore(
        self, uniq_terms: list[str], k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized block-max MaxScore top-k (term-at-a-time pruning,
        Buckley & Lewit 1985 / Turtle & Flood MaxScore).

        Scoring units are (term, salt, segment) RUNS: a salted hot
        term\'s postings are independent docID-sorted runs
        (stages/tokenize.py), docID order only holds within one append
        segment, and a doc lives in exactly one run per term — so each
        run is an independent disjunct with upper bound
        idf × max(block max_wdl).  Runs are processed in DESCENDING
        bound order in two phases:

        * GROW — runs are bulk-decoded and aggregated fully vectorized
          (exactly TAAT) while an unseen doc could still enter the top
          k, i.e. while suffix_ub(i) >= θ (θ = k-th best partial so
          far; >= keeps boundary ties eligible, preserving the
          (score desc, doc_id asc) tie rule).
        * PROBE — once suffix_ub(i) < θ no unseen doc can reach the
          heap, so each remaining run is probed ONLY at the surviving
          candidates: one searchsorted over block firsts finds each
          candidate\'s block, only touched blocks are decoded, one
          searchsorted per touched block resolves membership.
          Candidates whose score + remaining bound < θ retire as runs
          advance.  The heavy low-idf runs (the largest postings) sort
          LAST and are never fully decoded — the point of the
          per-block max_wdl metadata.

        Produces the same top-k, scores and tie order as exhaustive
        TAAT (every emitted candidate carries its exact final score and
        the final selection uses the same lexsort); does NOT produce
        total-match counts.
        """
        runs = []
        for t in uniq_terms:
            blocks = self._term_cache.get(t, [])
            idf = self._idf(t)
            if idf == 0.0:
                continue
            by_key: dict[tuple[int, int], list[dict]] = {}
            for b in blocks:
                by_key.setdefault((b["salt"], b.get("seg", 0)),
                                  []).append(b)
            for _key, bl in by_key.items():
                firsts = np.array([b["first_doc"] for b in bl],
                                  dtype=np.uint64)
                ub = idf * max(b["max_wdl"] for b in bl)
                runs.append({"idf": idf, "blocks": bl, "firsts": firsts,
                             "ub": ub})
        if not runs:
            return np.empty(0, dtype=np.uint64), np.empty(0)
        runs_term_order = list(runs)  # term-major, (salt, seg) order
        runs.sort(key=lambda r: -r["ub"])
        ubs = np.array([r["ub"] for r in runs])
        suffix = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])
        deleted = self._deleted

        cand_ids = np.empty(0, dtype=np.uint64)
        cand_sc = np.empty(0)

        def _theta(sc: np.ndarray) -> float:
            if sc.size < k:
                return -np.inf
            return float(np.partition(sc, sc.size - k)[sc.size - k])

        # GROW with a CHEAP θ lower bound so candidate parts are
        # aggregated exactly ONCE (per-run incremental merges over the
        # FULL candidate set made heavy queries O(runs × candidates) —
        # measured slower than TAAT).  The bound must be per-DOC: the
        # k-th largest single-run contribution is NOT a lower bound on
        # the true k-th best total when top contributions concentrate
        # in fewer than k distinct docs (each doc can supply one
        # contribution per query term).  So we keep a small id-deduped
        # scoreboard of per-doc PARTIAL SUMS (idf > 0 ⇒ every
        # contribution is ≥ 0 ⇒ any partial sum lower-bounds that
        # doc's total, even after a doc is evicted and re-enters with a
        # restarted sum), merge each run's top-k (id, score) into it,
        # and use its k-th best only once it holds ≥ k DISTINCT docs.
        pend_ids: list[np.ndarray] = []
        pend_sc: list[np.ndarray] = []
        board_ids = np.empty(0, dtype=np.uint64)
        board_sc = np.empty(0)
        board_cap = 4 * k + 16
        theta_lower = -np.inf
        # Amortized exact-θ folds: when contributions are spread evenly
        # across many docs (mass-tie corpora), the per-run top-k
        # scoreboard's restarted partial sums underestimate θ badly and
        # GROW decodes nearly everything.  Folding the pending parts
        # into one exact aggregation on a DOUBLING size schedule keeps
        # total fold cost O(final aggregation) while giving GROW a true
        # k-th-total bound to stop on.
        pend_total = 0
        fold_at = max(1 << 19, 8 * k)
        # degenerate-corpus guard: when GROW has decoded most of the
        # posting mass and the bound still hasn't closed (flat scores —
        # e.g. every term in every doc, idf ≈ ε), block-max pruning
        # cannot win; stop paying per-run scoreboard/fold overhead and
        # finish exhaustively (exactly TAAT from here on)
        total_postings = sum(b["n"] for r in runs for b in r["blocks"])
        decoded_total = 0
        i = 0
        while i < len(runs) and suffix[i] >= theta_lower:
            if decoded_total > 0.6 * total_postings:
                for r in runs[i:]:
                    self._decode_blocks_bulk(r["blocks"], r["idf"])
                    for b in r["blocks"]:
                        ids_b, sc_b = b["ids"], b["scores"]
                        if deleted is not None and ids_b.size:
                            live = ~np.isin(ids_b, deleted)
                            ids_b, sc_b = ids_b[live], sc_b[live]
                        pend_ids.append(ids_b)
                        pend_sc.append(sc_b)
                i = len(runs)
                break
            r = runs[i]
            self._decode_blocks_bulk(r["blocks"], r["idf"])
            ids_new = np.concatenate([b["ids"] for b in r["blocks"]])
            sc_new = np.concatenate([b["scores"] for b in r["blocks"]])
            if deleted is not None and ids_new.size:
                # tombstoned docs must not inflate θ (they would prune
                # live docs); drop them before they become candidates
                live = ~np.isin(ids_new, deleted)
                ids_new, sc_new = ids_new[live], sc_new[live]
            pend_ids.append(ids_new)
            pend_sc.append(sc_new)
            pend_total += int(ids_new.size)
            decoded_total += int(ids_new.size)
            if sc_new.size:
                if sc_new.size > k:
                    sel = np.argpartition(sc_new, sc_new.size - k)[
                        sc_new.size - k:]
                else:
                    sel = slice(None)
                board_ids, board_sc = _aggregate_scores(
                    np.concatenate([board_ids, ids_new[sel]]),
                    np.concatenate([board_sc, sc_new[sel]]))
                if board_ids.size > board_cap:
                    keep = np.argpartition(
                        board_sc, board_sc.size - board_cap)[
                        board_sc.size - board_cap:]
                    board_ids, board_sc = board_ids[keep], board_sc[keep]
                if board_ids.size >= k:
                    theta_lower = max(theta_lower, float(np.partition(
                        board_sc, board_sc.size - k)[board_sc.size - k]))
            if pend_total >= fold_at:
                pend_ids.insert(0, cand_ids)
                pend_sc.insert(0, cand_sc)
                cand_ids, cand_sc = _aggregate_scores(
                    np.concatenate(pend_ids), np.concatenate(pend_sc))
                pend_ids, pend_sc = [], []
                pend_total = 0
                fold_at = max(fold_at, 2 * int(cand_ids.size))
                th = _theta(cand_sc)
                if np.isfinite(th):
                    theta_lower = max(theta_lower, th)
            i += 1
        if pend_ids:
            pend_ids.insert(0, cand_ids)
            pend_sc.insert(0, cand_sc)
            cand_ids, cand_sc = _aggregate_scores(
                np.concatenate(pend_ids), np.concatenate(pend_sc))
        theta = _theta(cand_sc)

        for j in range(i, len(runs)):
            if cand_ids.size == 0:
                break
            if np.isfinite(theta):
                # retire candidates that cannot reach θ even with every
                # remaining bound (>= keeps exact-θ ties alive)
                keep = cand_sc + suffix[j] >= theta
                cand_ids, cand_sc = cand_ids[keep], cand_sc[keep]
                if cand_ids.size == 0:
                    break
            r = runs[j]
            run_n = sum(b["n"] for b in r["blocks"])
            if cand_ids.size > 2 * run_n:
                # probing dominates when candidates outnumber the run's
                # postings — decoding the whole run and intersecting is
                # strictly cheaper.  Docs of this run that are NOT
                # candidates stay excluded: by the probe-phase invariant
                # any doc first seen now can total at most suffix[j] < θ
                # and can never enter the top k.
                self._decode_blocks_bulk(r["blocks"], r["idf"])
                rids = np.concatenate([b["ids"] for b in r["blocks"]])
                rsc = np.concatenate([b["scores"] for b in r["blocks"]])
                pos = np.searchsorted(rids, cand_ids)
                pos = np.minimum(pos, rids.size - 1)
                hit = rids[pos] == cand_ids
                if hit.any():
                    cand_sc[hit] += rsc[pos[hit]]
                theta = max(theta, _theta(cand_sc))
                continue
            bi = np.searchsorted(r["firsts"], cand_ids,
                                 side="right").astype(np.int64) - 1
            valid = bi >= 0
            if not valid.any():
                continue
            # group candidates by block via ONE stable sort + slices —
            # a per-block boolean mask would cost
            # O(candidates × touched blocks)
            vpos = np.nonzero(valid)[0]
            order = np.argsort(bi[vpos], kind="stable")
            vidx = vpos[order]
            bsorted = bi[vidx]
            touched = np.unique(bsorted)
            bl = [r["blocks"][int(x)] for x in touched]
            self._decode_blocks_bulk(bl, r["idf"])
            starts = np.searchsorted(bsorted, touched, side="left")
            ends = np.searchsorted(bsorted, touched, side="right")
            for x, s0, s1 in zip(touched, starts, ends):
                blk = r["blocks"][int(x)]
                ci = vidx[s0:s1]
                ids_q = cand_ids[ci]
                pos = np.searchsorted(blk["ids"], ids_q)
                pos = np.minimum(pos, blk["n"] - 1)
                hit = blk["ids"][pos] == ids_q
                if hit.any():
                    cand_sc[ci[hit]] += blk["scores"][pos[hit]]
            theta = max(theta, _theta(cand_sc))

        if cand_ids.size == 0:
            return cand_ids, cand_sc
        # Final selection: pick a slack'd candidate head by the phased
        # sums, then RECOMPUTE those docs' scores by probing every run
        # in term-major order — the exact accumulation order TAAT uses —
        # so the returned floats are bitwise identical to _score's (the
        # phased sums add runs in descending-bound order, which can
        # differ by ulps and flip near-ties).  A doc is in exactly one
        # run per term, and adding 0.0 for absent runs is exact, so the
        # per-doc addition sequence matches TAAT's bincount order.
        kk = min(k, cand_ids.size)
        slack = min(cand_ids.size, kk * 4 + 16)
        if cand_ids.size > slack:
            kth = np.partition(cand_sc, cand_ids.size - slack)[
                cand_ids.size - slack]
            m = cand_sc >= kth
            sel_ids = cand_ids[m]
        else:
            sel_ids = cand_ids
        exact = np.zeros(sel_ids.size)
        # the tie-safe >= selection is unbounded when scores mass-tie
        # (degenerate small-vocabulary corpora): for large selections,
        # probe whole runs vectorized (one searchsorted over the run's
        # concatenated docID stream) instead of per-block — the blocks
        # are already decoded in exactly those scenarios
        big_sel = sel_ids.size > 1024
        for r in runs_term_order:
            if big_sel:
                self._decode_blocks_bulk(r["blocks"], r["idf"])
                rids = np.concatenate([b["ids"] for b in r["blocks"]])
                rsc = np.concatenate([b["scores"] for b in r["blocks"]])
                pos = np.searchsorted(rids, sel_ids)
                pos = np.minimum(pos, rids.size - 1)
                hit = rids[pos] == sel_ids
                contrib = np.zeros(sel_ids.size)
                contrib[hit] = rsc[pos[hit]]
                exact += contrib
                continue
            bi = np.searchsorted(r["firsts"], sel_ids,
                                 side="right").astype(np.int64) - 1
            valid = bi >= 0
            if not valid.any():
                continue
            contrib = np.zeros(sel_ids.size)
            for x in np.unique(bi[valid]):
                blk = r["blocks"][int(x)]
                self._decode_blocks_bulk([blk], r["idf"])
                sel = valid & (bi == x)
                ids_q = sel_ids[sel]
                pos = np.searchsorted(blk["ids"], ids_q)
                pos = np.minimum(pos, blk["n"] - 1)
                hit = blk["ids"][pos] == ids_q
                c = np.zeros(ids_q.size)
                c[hit] = blk["scores"][pos[hit]]
                contrib[sel] = c
            exact += contrib
        order = np.lexsort((sel_ids, -exact))[:kk]
        return sel_ids[order], exact[order]

    # -- public API ----------------------------------------------------

    def score_terms(self, terms) -> tuple[np.ndarray, np.ndarray]:
        """Exhaustive disjunctive BM25 over an EXPLICIT term set →
        (doc_ids, scores) for every matching document, unranked.

        This is the scoring half of a MultiTermQuery rewrite (fuzzy /
        prefix / wildcard expansion, pipelines/expand.py): the caller
        expands the pattern against the term dictionary, this scores
        the disjunction with each term's own idf — bypassing query
        analysis, which would re-stem or split the raw pattern."""
        uniq = sorted(set(terms))
        self._load_terms(uniq)
        return self._score(uniq)

    def search(
        self,
        query: str,
        max_results: int = DEFAULT_MAX_RESULTS,
        with_spans: bool = True,
        apply_best: bool = False,
        method: str = "taat",
    ) -> MatchSet:
        """Analyzed OR-of-terms BM25 top-k (SearchBleveIndex analog).

        ``method``: "taat" (exhaustive, exact total_matches — the oracle
        path), "maxscore" (block-max pruned top-k, same ranks/scores,
        total_matches reported as -1/unknown — the scale path), or
        "auto" (taat while the query's posting mass is small enough
        that exhaustive scoring is the faster path, maxscore beyond —
        total_matches is then exact only for the cheap queries)."""
        import time as _time

        t0 = _time.perf_counter()
        if self.manifest.analyzer == "en":
            q_terms = [tok.term for tok in analyze_en(query)]
        else:
            q_terms = self.analyze(query)
        uniq_terms = sorted(set(q_terms))
        self._load_terms(uniq_terms)
        if method == "auto":
            postings = sum(b["n"] for t in uniq_terms
                           for b in self._term_cache.get(t, ()))
            method = "maxscore" if postings > AUTO_MAXSCORE_POSTINGS \
                else "taat"
        if method == "maxscore":
            top_i, top_s = self._score_maxscore(uniq_terms, max(max_results, 1))
            result = MatchSet()
            result.total_matches = -1 if top_i.size else 0
            if top_i.size and max_results > 0:
                result.matches = self._hydrate(
                    q_terms, top_i[:max_results], top_s[:max_results], with_spans
                )
            result.search_duration = _time.perf_counter() - t0
            return result.best() if apply_best else result
        ids, scores = self._score(uniq_terms)

        result = MatchSet()
        result.total_matches = int(ids.size)
        if ids.size and max_results > 0:
            k = min(max_results, ids.size)
            # top-k, tie-break (score desc, doc_id asc); keep every row tied
            # with the k-th score so the lexsort sees all tie candidates
            if ids.size > k * 8:
                kth = np.partition(scores, ids.size - k)[ids.size - k]
                mask = scores >= kth
                cand_ids, cand_sc = ids[mask], scores[mask]
            else:
                cand_ids, cand_sc = ids, scores
            order = np.lexsort((cand_ids, -cand_sc))[:k]
            top_ids = cand_ids[order]
            top_sc = cand_sc[order]
            result.matches = self._hydrate(q_terms, top_ids, top_sc, with_spans)
        result.search_duration = _time.perf_counter() - t0
        if apply_best:
            best = result.best()
            best.total_matches = result.total_matches if not with_spans else best.total_matches
            return best
        return result

    def _hydrate(
        self,
        q_terms: list[str],
        top_ids: np.ndarray,
        top_sc: np.ndarray,
        with_spans: bool,
    ) -> list[Match]:
        """Join hits against the docs table and build spans/lines — the
        hitToPdfMatch join (J1, search_pdfs.go:330-366).  Top-k is tiny,
        so this is a pushdown-filtered read, not a shuffle."""
        import pyarrow.parquet as pq

        id_list = [int(i) for i in top_ids]
        dtbl, has_text = self.fetch_doc_meta(id_list, with_text=with_spans)
        return self._hydrate_from_table(q_terms, id_list, top_sc, with_spans,
                                        dtbl, has_text)

    def fetch_doc_meta(self, id_list: list[int],
                       with_text: bool = True) -> tuple[pa.Table, bool]:
        """Row-group-pruned (doc_id, url[, text]) fetch for a small id
        set — the hitToPdfMatch join's read half, public so renderers
        (pipelines/render.py) can pull evidence text for top-k docs.
        Returns (table, has_text)."""
        import pyarrow.parquet as pq

        cols = ["doc_id", "url"]
        docs_schema = (self._docs_mem.schema if self._docs_mem is not None
                       else self.docs.schema)
        if not docs_schema.names:
            # empty index: the docs dir has no fragments, so the dataset
            # carries no schema — answer with the standard catalog shape
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "url": pa.array([], type=pa.string()),
                "text": pa.array([], type=pa.string()),
            }).select(cols + ["text"] if with_text else cols), True
        has_text = "text" in docs_schema.names
        if has_text and with_text:
            cols.append("text")
        if self._docs_mem is not None:
            return self._docs_mem.filter(
                pc.is_in(self._docs_mem["doc_id"], value_set=pa.array(id_list))
            ).select(cols), has_text
        if self._doc_rg_index is None:
            self._doc_rg_index = self._build_doc_rg_index()
        want = sorted(id_list)
        parts = []
        open_files = self._pf_cache
        for path, rg, lo, hi in self._doc_rg_index:
            if any(lo <= d <= hi for d in want):
                pf = open_files.get(path)
                if pf is None:
                    pf = open_files[path] = pq.ParquetFile(path)
                    self.io_stats["docs_files_opened"] += 1
                t = pf.read_row_group(rg, columns=cols)
                self.io_stats["docs_row_groups_read"] += 1
                parts.append(t.filter(pc.is_in(t["doc_id"], value_set=pa.array(want))))
        dtbl = pa.concat_tables(parts) if parts else self.docs.schema.empty_table().select(cols)
        return dtbl, has_text

    def _hydrate_from_table(
        self,
        q_terms: list[str],
        id_list: list[int],
        top_sc: np.ndarray,
        with_spans: bool,
        dtbl: pa.Table,
        has_text: bool,
    ) -> list[Match]:
        meta: dict[int, tuple[str, str]] = {}
        texts = dtbl["text"].to_pylist() if (has_text and with_spans) else [""] * dtbl.num_rows
        for did, url, text in zip(dtbl["doc_id"].to_pylist(), dtbl["url"].to_pylist(), texts):
            meta[did] = (url, text)

        matches: list[Match] = []
        uniq_q = set(q_terms)
        for did, sc in zip(id_list, [float(s) for s in top_sc]):
            url, text = meta.get(did, ("", ""))
            m = Match(doc_id=did, url=url, score=sc)
            if with_spans and text:
                term_locs: dict[str, list[tuple[int, int, int]]] = {}
                for pos, term, start, end in self._doc_tokens(did, text):
                    if term in uniq_q:
                        term_locs.setdefault(term, []).append((pos, start, end))
                phrases = best_phrases(q_terms, term_locs)
                starts = line_starts(text) if phrases else None
                if phrases:
                    from ..functions.collections import truncate

                    first = phrases[0]
                    m.fragment = truncate(
                        text[first["start"] : first["end"] + 160], 200
                    )
                for p in phrases:
                    m.spans.append(
                        {"start": p["start"], "end": p["end"], "score": float(p["score"])}
                    )
                    ln = line_number(text, p["start"], starts)
                    if ln:
                        m.line_nums.append(ln[0])
                        m.lines.append(ln[1])
            matches.append(m)
        return matches

    def doc_count(self) -> int:
        """Global index cardinality (DocCount analog, index_pdfs.go:99)."""
        return self.manifest.n_docs

    def _doc_tokens(self, doc_id: int, text: str) -> list[tuple[int, str, int, int]]:
        """Analyzed (position, term, start, end) per doc, LRU-cached — the
        hydration-side token stream used for span assembly."""
        toks = self._analysis_cache.get(doc_id)
        if toks is None:
            if self.manifest.analyzer == "en":
                toks = [(t.position, t.term, t.start, t.end) for t in analyze_en(text)]
            else:
                # simple chain: offsets from finditer over the lowered text
                # (str.lower is length-preserving for this corpus domain)
                import re as _re

                toks = [
                    (i + 1, m.group(), m.start(), m.end())
                    for i, m in enumerate(
                        _re.finditer(r"[a-z0-9]+", text.lower())
                    )
                ]
            self._analysis_cache[doc_id] = toks
            if len(self._analysis_cache) > self._analysis_cache_max:
                self._analysis_cache.popitem(last=False)
        else:
            self._analysis_cache.move_to_end(doc_id)
        return toks

    def search_to_table(self, query: str, max_results: int = DEFAULT_MAX_RESULTS,
                        with_spans: bool = True) -> pa.Table:
        """Results as an Arrow table in schemas.QUERY_RESULTS shape."""
        ms = self.search(query, max_results, with_spans=with_spans)
        rows = {
            "query": [], "rank": [], "doc_id": [], "url": [], "score": [], "spans": [],
        }
        for rank, m in enumerate(ms.matches):
            rows["query"].append(query)
            rows["rank"].append(rank)
            rows["doc_id"].append(m.doc_id)
            rows["url"].append(m.url)
            rows["score"].append(m.score)
            rows["spans"].append(
                [
                    {"start": s["start"], "end": s["end"], "score": s["score"]}
                    for s in m.spans
                ]
            )
        from ..schemas import QUERY_RESULTS

        return pa.table(
            {
                "query": pa.array(rows["query"], type=pa.string()),
                "rank": pa.array(rows["rank"], type=pa.int32()),
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "url": pa.array(rows["url"], type=pa.string()),
                "score": pa.array(rows["score"], type=pa.float64()),
                "spans": pa.array(rows["spans"], type=QUERY_RESULTS.field("spans").type),
            }
        )
