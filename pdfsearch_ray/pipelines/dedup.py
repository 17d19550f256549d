"""Deduplication suite (training-data addenda; SURVEY §2.7 extends the
reference's declared-but-inert content dedup, bleve_pdf.go:395-409).

* exact dedup          — pipelines/build.py:dedup_exact (hash groupby)
* n-gram Jaccard       — exact pairwise similarity via a shingle
                         inverted index (SQL-oracled)
* MinHash + LSH        — shingle → minhash signature → banded groupby →
                         candidate pairs → signature-verified → clusters
* SimHash              — 64-bit fingerprints + banded hamming candidates

All stages are map_batches / groupby compositions; the only driver-side
work is union-find over the (small) verified-pair set, with the
documented scale path being iterative min-label propagation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Min

from ..analysis.analyzer import analyze_simple

# ------------------------------------------------------------------ shingles


def _word_ngrams(tokens: list[str], n: int) -> set[str]:
    # docs shorter than n tokens yield NO shingles (matches the SQL oracle,
    # whose self-join can't produce a partial shingle)
    if len(tokens) < n:
        return set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


class _ShingleEmitter:
    """doc → distinct (doc_id, shingle) rows (simple analyzer)."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sh = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = analyze_simple(text or "")
            for s in _word_ngrams(toks, self.n):
                ids.append(did)
                sh.append(s)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shingle": pa.array(sh, type=pa.string()),
        })


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    *,
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int = 1000,
) -> pa.Table:
    """Exact n-gram Jaccard similar pairs (doc_a < doc_b, jaccard ≥
    threshold), via a shingle inverted index:

        shingles → groupby(shingle) → co-occurring pairs → groupby(pair)
        → |A∩B| → join per-doc shingle counts → jaccard

    Shingles with df > ``max_shingle_df`` are dropped (they contribute
    little discrimination and make a pair-explosion hot spot — the same
    skew argument as posting-list salting); at default settings this is a
    no-op on the test tables.  Returns (doc_a, doc_b, jaccard rounded 6).
    """
    shingles = docs.map_batches(_ShingleEmitter(n), batch_format="pyarrow")

    counts = shingles.groupby("doc_id").aggregate(Count(alias_name="n_sh"))

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > max_shingle_df:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pair_rows = shingles.groupby("shingle").map_groups(
        pairs_of_group, batch_format="pandas"
    )
    inter = pair_rows.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="inter"))

    inter_df = inter.to_pandas()
    counts_df = counts.to_pandas()
    if inter_df.empty:
        return pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        })
    m = inter_df.merge(
        counts_df.rename(columns={"doc_id": "doc_a", "n_sh": "na"}), on="doc_a"
    ).merge(counts_df.rename(columns={"doc_id": "doc_b", "n_sh": "nb"}), on="doc_b")
    m["jaccard"] = (m["inter"] / (m["na"] + m["nb"] - m["inter"])).round(6)
    m = m[m["jaccard"] >= threshold].sort_values(["doc_a", "doc_b"])
    return pa.table({
        "doc_a": pa.array(m["doc_a"].astype("int64").tolist(), type=pa.int64()),
        "doc_b": pa.array(m["doc_b"].astype("int64").tolist(), type=pa.int64()),
        "jaccard": pa.array(m["jaccard"].tolist(), type=pa.float64()),
    })


# ------------------------------------------------------------------ minhash


_MERSENNE = (1 << 61) - 1


def _perm_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    import hashlib

    return np.array(
        [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
         for s in shingles],
        dtype=np.uint64,
    )


def _minhash_sig(sh_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """K-permutation minhash via affine hashing mod 2^61-1 (vectorized)."""
    if sh_hashes.size == 0:
        return np.full(a.shape, np.uint64(_MERSENNE))
    x = sh_hashes.astype(object)[:, None]  # python ints: exact mod-arithmetic
    vals = (x * a.astype(object)[None, :] + b.astype(object)[None, :]) % _MERSENNE
    return np.min(np.asarray(vals, dtype=np.uint64), axis=0)


class MinHashBander:
    """Actor: doc → (band_id, band_hash, doc_id) rows.  Permutation
    parameters built once per actor (seeded, identical everywhere)."""

    def __init__(self, num_perm: int = 128, bands: int = 16, shingle_n: int = 3,
                 seed: int = 42):
        assert num_perm % bands == 0
        self.r = num_perm // bands
        self.bands = bands
        self.shingle_n = shingle_n
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        toks = analyze_simple(text or "")
        sh = _hash_shingles(sorted(_word_ngrams(toks, self.shingle_n)))
        return _minhash_sig(sh, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if not text:
                continue
            toks = analyze_simple(text)
            sh = _hash_shingles(sorted(_word_ngrams(toks, self.shingle_n)))
            if sh.size == 0:
                continue  # no shingles → never a near-dup candidate
            sig = _minhash_sig(sh, self.a, self.b)
            sig_bytes = sig.tobytes()
            for bi in range(self.bands):
                band = sig[bi * self.r : (bi + 1) * self.r]
                import hashlib

                bh = int.from_bytes(
                    hashlib.blake2b(band.tobytes(), digest_size=8).digest(), "big"
                ) >> 1  # fit int64
                ids.append(did)
                band_ids.append(bi)
                band_hashes.append(bh)
                sigs.append(sig_bytes)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.int64()),
            "sig": pa.array(sigs, type=pa.large_binary()),
        })


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 2000,
) -> pa.Table:
    """MinHash+LSH near-dup clusters.

    shingle→minhash→band rows → groupby(band_id, band_hash) → candidate
    pairs (star-shaped for oversize buckets: members of a huge bucket are
    near-identical, so (min, other) edges suffice for clustering) →
    verify estimated Jaccard = signature agreement ≥ threshold →
    union-find → (doc_id, keep_id) rows for docs in clusters.
    """
    band_rows = docs.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_n=shingle_n),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "sig_a": [], "sig_b": []})
        if len(ids) > max_bucket:
            a_idx = np.zeros(len(ids) - 1, dtype=np.int64)
            b_idx = np.arange(1, len(ids))
        else:
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({
            "doc_a": ids[a_idx], "doc_b": ids[b_idx],
            "sig_a": sigs[a_idx], "sig_b": sigs[b_idx],
        })

    pair_rows = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        candidates, batch_format="pandas"
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        keep_a, keep_b, est = [], [], []
        for a_id, b_id, sa, sb in zip(batch["doc_a"], batch["doc_b"],
                                      batch["sig_a"], batch["sig_b"]):
            va = np.frombuffer(sa, dtype=np.uint64)
            vb = np.frombuffer(sb, dtype=np.uint64)
            j = float((va == vb).mean())
            if j >= threshold:
                keep_a.append(int(a_id)); keep_b.append(int(b_id)); est.append(j)
        return pd.DataFrame({"doc_a": keep_a, "doc_b": keep_b, "est_jaccard": est})

    verified = pair_rows.map_batches(verify, batch_format="pandas")
    # distinct pairs (same pair can fire in several bands)
    pairs = (
        verified.groupby(["doc_a", "doc_b"])
        .aggregate(Min("est_jaccard", alias_name="est_jaccard"))
        .to_pandas()
    )

    # union-find on the driver: the verified-pair set is tiny relative to
    # the corpus (scale path: iterative min-label propagation via groupby)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a_id, b_id in zip(pairs.get("doc_a", []), pairs.get("doc_b", [])):
        ra, rb = find(int(a_id)), find(int(b_id))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    members = sorted({int(x) for x in pairs.get("doc_a", [])}
                     | {int(x) for x in pairs.get("doc_b", [])})
    return pa.table({
        "doc_id": pa.array(members, type=pa.int64()),
        "keep_id": pa.array([find(m) for m in members], type=pa.int64()),
    })


# ------------------------------------------------------------------ simhash


class SimHasher:
    """Actor: doc → 64-bit simhash over simple-analyzer tokens."""

    def __init__(self):
        import hashlib

        self._h = hashlib.blake2b

    def fingerprint(self, text: str) -> int:
        toks = analyze_simple(text or "")
        if not toks:
            return 0
        hs = np.array(
            [int.from_bytes(self._h(t.encode(), digest_size=8).digest(), "big")
             for t in toks],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(hs)
        fp = 0
        for i in range(64):
            if votes[i] > 0:
                fp |= 1 << i
        return fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ids.append(did)
            fps.append(self.fingerprint(text) - (1 << 63))  # shift into int64
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(fps, type=pa.int64()),
        })


def simhash_fingerprints(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))


def simhash_dup_pairs(docs: rd.Dataset, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs with hamming(simhash) ≤ k via pigeonhole banding:
    split 64 bits into k+1 bands; a pair within distance k must agree on
    ≥1 band → groupby(band value) → verify exact hamming."""
    fps = simhash_fingerprints(docs)
    nbands = max_hamming + 1
    width = 64 // nbands

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sh_i64 = batch["simhash"].to_numpy()
        h = sh_i64.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)
        out_id, out_b, out_v, out_h = [], [], [], []
        for bi in range(nbands):
            shift = np.uint64(bi * width)
            mask = np.uint64((1 << width) - 1)
            vals = (h >> shift) & mask
            out_id += [int(x) for x in ids]
            out_b += [bi] * len(ids)
            out_v += [int(x) for x in vals]
            out_h += [int(x) for x in sh_i64]
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "band_id": pa.array(out_b, type=pa.int32()),
            "band_val": pa.array(out_v, type=pa.int64()),
            "simhash": pa.array(out_h, type=pa.int64()),
        })

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        a, b = np.triu_indices(len(ids), k=1)
        x = hs[a] ^ hs[b]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({
            "doc_a": ids[a][keep], "doc_b": ids[b][keep],
            "hamming": ham[keep].astype("int64"),
        })

    pair_rows = (
        fps.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(candidates, batch_format="pandas")
    )
    pairs = (
        pair_rows.groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    return pa.table({
        "doc_a": pa.array(pairs["doc_a"].astype("int64").tolist(), type=pa.int64()),
        "doc_b": pa.array(pairs["doc_b"].astype("int64").tolist(), type=pa.int64()),
        "hamming": pa.array(pairs["hamming"].astype("int64").tolist(), type=pa.int64()),
    })
