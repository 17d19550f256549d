"""lnc.ltc cosine gate (pipelines/vsm.py): planted-geometry pins.

The property that separates lnc.ltc from BM25: cosine normalization
makes a doc's score invariant to pure repetition of its only term
(w/‖d‖ = 1 whatever the tf), off-topic terms strictly dilute, and
multi-term coverage divided by sqrt(#terms) still wins.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_corpus(tmp_path):
    docs = [
        (1, "data data data data"),               # repetition only
        (2, "data"),                              # single occurrence
        (3, "data alpha beta gamma delta epsilon zeta eta theta"),
        (4, "filter stream data"),                # full query coverage
        (5, "alpha beta gamma"),                  # no query terms
        (6, "merge scan fast"),                   # other gate query
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([s for _, s in docs], type=pa.string()),
        "lang": pa.array(["en"] * len(docs), type=pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_vsm_cosine_properties(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.vsm import vsm_lnc_ltc_topk

    out = vsm_lnc_ltc_topk(_mk_corpus(tmp_path)).to_pandas()
    g = out[out["query"] == "data stream filter"].set_index("doc_id")
    # full-coverage doc wins
    assert g["rank"].idxmin() == 4
    # repetition invariance: tf=4 and tf=1 single-term docs tie exactly
    # (w/||d|| == 1 either way), tie broken doc_id-asc
    assert g.loc[1, "score"] == g.loc[2, "score"]
    assert g.loc[1, "rank"] < g.loc[2, "rank"]
    # off-topic terms strictly dilute
    assert g.loc[3, "score"] < g.loc[2, "score"]
    # non-matching docs never appear
    assert 5 not in g.index
    # exact expected values: idf = ln(N/df) with N=6 docs, df(data)=4,
    # df(stream)=df(filter)=1
    idf_d, idf_sf = np.log(6 / 4), np.log(6 / 1)
    assert g.loc[2, "score"] == round(float(idf_d), 6)
    want4 = round(float((idf_d + 2 * idf_sf) / np.sqrt(3.0)), 6)
    assert abs(g.loc[4, "score"] - want4) <= 1e-6


def test_lm_dirichlet_properties(ray_session, tmp_path):
    """Dirichlet smoothing pins: (a) higher tf on the same doc length
    scores higher; (b) equal tf on a LONGER doc scores lower (the
    ln(mu/(mu+dl)) length prior); (c) rare-term match beats common-term
    match at equal tf/dl (the cf_t/T collection prior)."""
    import numpy as np

    from pdfsearch_ray.pipelines.vsm import lm_dirichlet_topk

    f = "x"
    docs = [
        (1, "dup table " + " ".join([f] * 8)),          # tf=1 each, dl=10
        (2, "dup dup table " + " ".join([f] * 7)),      # tf(dup)=2, dl=10
        (3, "dup table " + " ".join([f] * 18)),         # tf=1 each, dl=20
        (4, " ".join(["table"] * 2 + [f] * 8)),         # common-only
        (5, " ".join([f] * 10 + ["x x x"])),            # no match
        (6, " ".join([f] * 3) + " table table"),        # common tf=2
        (7, "dup " + " ".join([f] * 9)),                # rare, tf=1 dl=10
        (8, "table " + " ".join([f] * 9)),              # common, tf=1 dl=10
    ]
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([s for _, s in docs], type=pa.string()),
        "lang": pa.array(["en"] * len(docs), type=pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = lm_dirichlet_topk(str(tmp_path)).to_pandas()
    g = out[out["query"] == "dup table"].set_index("doc_id")
    assert g.loc[2, "score"] > g.loc[1, "score"]     # tf monotone
    assert g.loc[1, "score"] > g.loc[3, "score"]     # length prior
    assert 5 not in g.index                          # no-match excluded
    # collection prior, isolated: single-term match at equal tf/dl —
    # the rarer term (smaller cf_t/T) scores strictly higher
    assert g.loc[7, "score"] > g.loc[8, "score"]
    # NOTE (a design fact this test records): matching MORE terms can
    # score LOWER because each matched term adds the negative
    # ln(mu/(mu+dl)) prior — the exact behavior Lucene's positive
    # clamp papers over; this gate keeps the unclamped textbook form.
