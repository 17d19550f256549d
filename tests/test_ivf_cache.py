"""ivf_layout_cached: build-once semantics — a second call must reuse
the persisted layout (no rebuild), and a changed input fingerprint or
parameter set must get its own layout (round-5 knn amortization)."""

import os

import numpy as np


def test_ivf_layout_cache_hit_and_key(ray_session, tmp_path, monkeypatch):
    import pdfsearch_ray.pipelines.similarity as sim

    # isolate the cache root for the test
    monkeypatch.setenv("PDFSEARCH_SPILL_ROOT", str(tmp_path / "spill"))

    sf = "/root/testdata/sf0.001"
    calls = {"n": 0}
    real_build = sim.build_partitioned_embeddings

    def counting_build(*a, **k):
        calls["n"] += 1
        return real_build(*a, **k)

    monkeypatch.setattr(sim, "build_partitioned_embeddings", counting_build)

    c1, p1 = sim.ivf_layout_cached(sf, n_clusters=8, exclude_below=0,
                                   extra_cols=("label",))
    assert calls["n"] == 1 and os.path.isdir(p1)
    c2, p2 = sim.ivf_layout_cached(sf, n_clusters=8, exclude_below=0,
                                   extra_cols=("label",))
    # cache hit: same layout dir, identical centroids, NO second build
    assert calls["n"] == 1
    assert p2 == p1
    assert np.array_equal(c1, c2)

    # different params => different key => a fresh build
    c3, p3 = sim.ivf_layout_cached(sf, n_clusters=4, exclude_below=0,
                                   extra_cols=("label",))
    assert calls["n"] == 2
    assert p3 != p1
    assert c3.shape[0] == 4
