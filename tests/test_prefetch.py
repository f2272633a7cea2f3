"""Prefetcher: ordering, state-exact resume, error propagation."""

import numpy as np
import pytest

from shallow_wavenet_tpu.data.prefetch import Prefetcher
from tests.test_data import _toy_utts
from shallow_wavenet_tpu.data.dataset import SegmentSampler


def make_sampler(seed=0):
    return SegmentSampler(_toy_utts(), batch_size=2, segment_length=800,
                          hop_length=80, receptive_field=100, seed=seed)


def test_prefetch_preserves_order():
    a, b = make_sampler(), make_sampler()
    pf = Prefetcher(a)
    for _ in range(5):
        np.testing.assert_array_equal(next(pf)["x"], next(b)["x"])
    pf.close()


def test_prefetch_state_tracks_consumed():
    """state() must describe consumed batches only — resume from it and the
    next batch matches the unprefetched stream."""
    pf = Prefetcher(make_sampler())
    for _ in range(3):
        next(pf)
    st = pf.state()
    want = next(pf)
    pf.close()

    s2 = make_sampler()
    s2.set_state(st)
    got = next(s2)
    np.testing.assert_array_equal(want["x"], got["x"])


def test_prefetch_applies_put_fn():
    pf = Prefetcher(make_sampler(), put_fn=lambda b: {"n": b["x"].shape[0]})
    assert next(pf) == {"n": 2}
    pf.close()


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(3)}
        raise RuntimeError("boom")

    g = gen()

    class It:
        def __next__(self):
            return next(g)

    pf = Prefetcher(It())
    next(pf)
    with pytest.raises((RuntimeError, StopIteration)):
        next(pf)
        next(pf)
    pf.close()


def test_group_sampler_tail_exact_state():
    """With a step budget that is not a multiple of K, the final group is
    tail-sized and the sampler state reflects EXACTLY the batches consumed
    (checkpoint-exact resume after the tail checkpoint)."""
    from shallow_wavenet_tpu.data.prefetch import GroupSampler

    utts = _toy_utts()
    K, total = 8, 20
    gs = GroupSampler(
        SegmentSampler(utts, batch_size=2, segment_length=40, hop_length=8,
                       receptive_field=16, seed=0),
        K, total=total)
    sizes = []
    groups = []
    for g in gs:
        sizes.append(g["x"].shape[0])
        groups.append(g)
    assert sizes == [8, 8, 4]
    state = gs.state()

    # a fresh sampler fast-forwarded by exactly `total` draws agrees
    ref = SegmentSampler(utts, batch_size=2, segment_length=40, hop_length=8,
                         receptive_field=16, seed=0)
    for _ in range(total):
        next(ref)
    assert state == ref.state()

    # and the consumed batches are the same 20 the plain sampler yields
    ref2 = SegmentSampler(utts, batch_size=2, segment_length=40, hop_length=8,
                          receptive_field=16, seed=0)
    flat = [g["x"][i] for g in groups for i in range(g["x"].shape[0])]
    for got in flat:
        np.testing.assert_array_equal(got, next(ref2)["x"])
