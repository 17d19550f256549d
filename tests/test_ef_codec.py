"""Elias-Fano codec (index/codec.py): round-trip contract + the
size comparison vs the delta-varint default on posting-shaped id
streams (the measurement BASELINE.md cites)."""

import numpy as np
import pytest

from pdfsearch_ray.index.codec import (delta_decode, delta_encode,
                                       ef_decode, ef_encode)


def _roundtrip(ids):
    got = ef_decode(ef_encode(ids), count=len(ids))
    assert got.dtype == np.uint64
    assert got.tolist() == ids.astype(np.uint64).tolist()


def test_ef_roundtrip_edges():
    _roundtrip(np.array([], dtype=np.uint64))
    _roundtrip(np.array([0], dtype=np.uint64))
    _roundtrip(np.array([7], dtype=np.uint64))
    _roundtrip(np.arange(100, dtype=np.uint64))          # dense run
    _roundtrip(np.array([0, 1, 2, 10**12], dtype=np.uint64))
    _roundtrip(np.array([2**40, 2**40 + 5], dtype=np.uint64))


@pytest.mark.parametrize("density", [1.1, 2.0, 10.0, 1000.0])
def test_ef_roundtrip_random(density):
    rng = np.random.default_rng(int(density * 100))
    gaps = rng.geometric(1.0 / density, size=5000).astype(np.uint64)
    ids = np.cumsum(gaps) - 1
    _roundtrip(ids)
    # same contract as the default codec
    assert delta_decode(delta_encode(ids),
                        count=len(ids)).tolist() == ids.tolist()


def test_ef_size_regimes():
    """The published trade: EF ≈ 2 + log2(avg gap) bits/posting,
    LEB128 gaps = 8·ceil(bits/7).  EF crushes dense head-term lists
    (the web-corpus pain) AND very sparse lists (multi-byte varint
    gaps); varint's only narrow win is gaps just past one byte's
    capacity (≈ 64-180), where 8 bits beat 2+log2(gap)."""
    rng = np.random.default_rng(7)
    dense = np.cumsum(rng.geometric(1 / 1.5, size=20000)
                      .astype(np.uint64)) - 1
    # constant one-byte gaps: the one shape where varint's flat 8 bits
    # beat EF's 2 + log2(gap) (geometric gaps at the same mean lose —
    # their two-byte tail costs varint more than EF's log)
    mid = np.arange(0, 500000, 100, dtype=np.uint64)
    sparse = np.cumsum(rng.geometric(1 / 100000.0, size=2000)
                       .astype(np.uint64)) - 1
    ef_d, vi_d = len(ef_encode(dense)), len(delta_encode(dense))
    ef_m, vi_m = len(ef_encode(mid)), len(delta_encode(mid))
    ef_s, vi_s = len(ef_encode(sparse)), len(delta_encode(sparse))
    assert ef_d < vi_d * 0.4          # >= 60% smaller on dense lists
    assert vi_m < ef_m                # varint's narrow one-byte regime
    assert ef_s < vi_s                # EF wins the multi-byte tail too


# ------------------------- hypothesis property fuzz (codec.py idiom)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=400, unique=True))
def test_ef_roundtrip_property(ids):
    a = np.array(sorted(ids), dtype=np.uint64)
    got = ef_decode(ef_encode(a), count=len(a))
    assert got.tolist() == a.tolist()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=400, unique=True))
def test_ef_agrees_with_varint_delta(ids):
    """Both codecs decode to the identical id sequence — a cross-codec
    differential oracle (any disagreement is a bug in one of them)."""
    a = np.array(sorted(ids), dtype=np.uint64)
    assert (ef_decode(ef_encode(a), count=len(a)).tolist()
            == delta_decode(delta_encode(a), count=len(a)).tolist())
