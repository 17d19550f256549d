"""_retrieve_tie_complete: the tie-group grow loop shared by the
fulltext gates (round-4 verdict item 3).  A planted rounded-score tie
group straddles K and is ordered doc_id-DESC by exact score, so a fixed
``K + buffer`` cutoff would orphan the lowest-doc_id tie members the
gate's (rounded score desc, doc_id asc) ranking must select."""

from types import SimpleNamespace

import pandas as pd

from pdfsearch_ray.pipelines.queries import _retrieve_tie_complete

K = 5
BUFFER = 50


class _FakeIndex:
    """Matches: 2 clear winners, then an 80-doc tie group whose exact
    scores descend by 1e-9 (identical at 6 dp) with doc_id DESCENDING —
    the adversarial order: exact-score retrieval yields the HIGHEST
    doc_ids of the tie group first."""

    def __init__(self):
        ms = [SimpleNamespace(doc_id=1000, score=9.0),
              SimpleNamespace(doc_id=1001, score=8.0)]
        for i in range(80):
            ms.append(SimpleNamespace(doc_id=500 - i, score=5.0 - 1e-9 * i))
        self.all_matches = ms
        self.calls = []

    def search(self, q, max_results=10, with_spans=False):
        self.calls.append(max_results)
        return SimpleNamespace(matches=self.all_matches[:max_results])


def _rank(matches, k):
    df = pd.DataFrame({
        "doc_id": [m.doc_id for m in matches],
        "score": [round(m.score, 6) for m in matches],
    })
    df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                        kind="mergesort")
    return df["doc_id"].tolist()[:k]


def test_grow_loop_retrieves_full_tie_group():
    idx = _FakeIndex()
    got = _retrieve_tie_complete(idx, "q", K, buffer=BUFFER)
    # must have grown past the first K+buffer request
    assert idx.calls[0] == K + BUFFER
    assert len(idx.calls) > 1
    # full tie group retrieved: every member present
    assert len(got) == len(idx.all_matches)
    # gate ranking now selects the LOWEST doc_ids of the tie group
    assert _rank(got, K) == [1000, 1001, 421, 422, 423]


def test_fixed_cutoff_would_orphan_tie_members():
    idx = _FakeIndex()
    naive = idx.search("q", max_results=K + BUFFER).matches
    # the naive cutoff holds only the HIGH doc_ids of the tie group —
    # the correct lowest-doc_id members (421..) are absent
    assert 421 not in {m.doc_id for m in naive}
    assert _rank(naive, K) != [1000, 1001, 421, 422, 423]


def test_no_growth_when_rank_k_unambiguous():
    idx = _FakeIndex()
    # k beyond the tie group boundary: first retrieval is already
    # complete (fewer matches than requested) — single call
    got = _retrieve_tie_complete(idx, "q", K, buffer=len(idx.all_matches))
    assert len(idx.calls) == 1
    assert len(got) == len(idx.all_matches)
