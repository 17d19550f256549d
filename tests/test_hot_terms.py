"""detect_hot_terms equivalence: the distributed (materialized
aggregate → distributed max → in-map threshold) path must return the
exact hot-term dict the straightforward driver-side reference computes,
while the driver-visible table holds O(hot terms) rows only (the
round-4 verdict's `detect_hot_terms` item)."""

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from pdfsearch_ray.analysis.analyzer import get_analyzer
from pdfsearch_ray.pipelines.build import _sample_mask, detect_hot_terms

SF = "/root/testdata/sf0.001/documents.parquet"


def _reference_hot(rate: float, ratio: float, num_salts: int) -> dict:
    """The pre-round-5 semantics, verbatim: per-sampled-doc distinct
    analyzed terms → df dict → threshold at ratio * max(df)."""
    analyze = get_analyzer("en")
    tbl = pq.read_table(SF, columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    mask = _sample_mask(np.asarray(ids), rate)
    counts: dict[str, int] = {}
    for keep, text in zip(mask, tbl["text"].to_pylist()):
        if not keep or not text:
            continue
        for term in set(analyze(text)):
            counts[term] = counts.get(term, 0) + 1
    if not counts:
        return {}
    n_sampled = max(1, max(counts.values()))
    return {t: num_salts for t, c in counts.items()
            if c >= ratio * n_sampled}


def test_detect_hot_terms_matches_reference(ray_session):
    ds = rd.read_parquet(SF, columns=["doc_id", "text"])
    for rate, ratio in [(1.0, 0.2), (0.5, 0.1)]:
        got = detect_hot_terms(
            ds, analyzer="en", text_col="text", id_col="doc_id",
            sample_rate=rate, hot_df_ratio=ratio, num_salts=8)
        want = _reference_hot(rate, ratio, 8)
        assert got == want
        assert len(want) > 0  # the fixture must actually exercise hot terms


def test_detect_hot_terms_driver_rows_bounded(ray_session, monkeypatch):
    """The driver-side to_pandas receives exactly the hot rows, never
    the sampled vocabulary."""
    import pandas as pd

    import pdfsearch_ray.pipelines.build as b

    seen = {}
    real_to_pandas = rd.Dataset.to_pandas

    def spy(self, *a, **k):
        df = real_to_pandas(self, *a, **k)
        seen["rows"] = len(df)
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", spy)
    ds = rd.read_parquet(SF, columns=["doc_id", "text"])
    got = b.detect_hot_terms(
        ds, analyzer="en", text_col="text", id_col="doc_id",
        sample_rate=1.0, hot_df_ratio=0.2, num_salts=8)
    assert seen["rows"] == len(got)
