"""Streaming synthesis session tests (models/streaming.py).

The incremental path must be bit-identical (fp32, interpret mode) to one
batch generate_pallas call over the whole utterance: exact-halo block
upsampling + teacher-forced ring warm-starts reproduce the batch math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
from shallow_wavenet_tpu.models.streaming import (
    StreamingSynthesizer, StreamPool, upsampler_halo,
)
from shallow_wavenet_tpu.ops.ar_kernel import generate_pallas

from tests.test_model import tiny_cfg


def setup_stream(head, B=2, F=100, seed=0):
    cfg = tiny_cfg(head=head, n_stacks=2, stack_size=3)
    m = WaveNet(cfg)
    rng = np.random.default_rng(seed)
    hop = int(np.prod(cfg.upsample_factors))
    if head == "softmax":
        x0 = jnp.asarray(rng.integers(0, 256, (1, 2 * hop - 1)), jnp.int32)
    else:
        x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop - 1)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((1, 2, cfg.aux_channels)),
                     jnp.float32)
    v = m.init(jax.random.key(3), x0, c0)
    pp = extract_plain_params(v, cfg)
    frames = rng.standard_normal((B, F, cfg.aux_channels)).astype(np.float32)
    return cfg, m, v, pp, frames, hop


def test_upsampler_halo_recurrence():
    assert upsampler_halo((4, 4, 4, 5)) == 2
    assert upsampler_halo((2, 5)) == 2
    assert upsampler_halo((10,)) == 1


def test_streaming_upsample_matches_full():
    """Haloed block upsampling == rows of the full-utterance upsample.

    ulp tolerance, not bitwise: the phase-matmul upsampler stages
    (RepeatSmoothStage) are GEMMs whose CPU lowering can pick a different
    accumulation strategy for the windowed block's row count than for the
    full utterance's (~1e-6 relative, observed only on the CPU backend;
    per-row MXU matmuls are shape-invariant). The e2e contract — streamed
    AR output == one batch kernel call — stays exact
    (test_streaming_equals_batch)."""
    cfg, m, v, pp, frames, hop = setup_stream("laplace", F=40)
    syn = StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=2,
                               block_frames=32, chunk=64, interpret=True)
    syn._frames = frames
    syn._frames_base = 0
    full = np.asarray(m.apply(v, jnp.asarray(frames),
                              method="upsample_cond"))
    # a middle block [8, 24) with halo context on both sides
    blk = syn._upsample_block(8, 24, last=False)
    np.testing.assert_allclose(blk, full[:, 8 * hop:24 * hop], atol=2e-5)
    # the first block (true left edge)
    blk0 = syn._upsample_block(0, 16, last=False)
    np.testing.assert_allclose(blk0, full[:, :16 * hop], atol=2e-5)
    # the last block (true right edge)
    blkN = syn._upsample_block(24, 40, last=True)
    np.testing.assert_allclose(blkN, full[:, 24 * hop:], atol=2e-5)


@pytest.mark.parametrize("head", ["laplace", "softmax"])
def test_streaming_equals_batch(head):
    """Push frames in ragged pieces; the concatenated output must equal one
    batch kernel call over the full conditioning, bit-exactly (fp32)."""
    cfg, m, v, pp, frames, hop = setup_stream(head, F=100)
    B, F, _ = frames.shape
    syn = StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=B,
                               block_frames=32, chunk=64, seed=7,
                               interpret=True, record_noise=True)
    pieces = []
    for s in range(0, F, 7):                       # ragged 7-frame pushes
        pieces.append(syn.push(frames[:, s:s + 7]))
    pieces.append(syn.flush())
    wav = np.concatenate(pieces, axis=1)
    T = F * hop
    assert wav.shape == (B, T)
    assert syn.samples_emitted == T

    c_up = m.apply(v, jnp.asarray(frames), method="upsample_cond")
    noise = syn.noise_so_far()[:, :T]
    oracle = np.asarray(generate_pallas(
        pp, cfg, c_up, noise=jnp.asarray(noise), chunk=64, interpret=True))
    np.testing.assert_array_equal(wav, oracle)


def test_streaming_block_boundary_invisible():
    """Different block sizes must produce the identical waveform when fed
    the identical noise stream."""
    cfg, m, v, pp, frames, hop = setup_stream("laplace", F=96)
    B, F, _ = frames.shape
    outs = []
    for bf in (32, 64):
        syn = StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=B,
                                   block_frames=bf, chunk=64, seed=3,
                                   interpret=True, record_noise=True)
        w = np.concatenate([syn.push(frames), syn.flush()], axis=1)
        # same seed, but blocks draw noise in different-shaped pieces —
        # replay through the batch oracle instead of comparing directly
        T = F * hop
        c_up = m.apply(v, jnp.asarray(frames), method="upsample_cond")
        noise = syn.noise_so_far()[:, :T]
        oracle = np.asarray(generate_pallas(
            pp, cfg, c_up, noise=jnp.asarray(noise), chunk=64,
            interpret=True))
        np.testing.assert_array_equal(w, oracle)
        outs.append(w)


def test_streaming_rejects_bad_shapes():
    cfg, m, v, pp, frames, hop = setup_stream("laplace", F=10)
    syn = StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=2,
                               block_frames=32, chunk=64, interpret=True)
    with pytest.raises(ValueError):
        syn.push(frames[0])                        # missing batch dim
    with pytest.raises(ValueError):
        StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=2,
                             block_frames=3, chunk=64)   # 30 % 64 != 0
    syn.push(frames)
    syn.flush()
    with pytest.raises(RuntimeError):
        syn.push(frames)


def _standalone(cfg, m, v, pp, hop, frames_1xF, seed, bf=32, head_kw=None):
    """Oracle: a batch=1 session fed the whole stream at once."""
    syn = StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=1,
                               block_frames=bf, chunk=64, seed=seed,
                               interpret=True)
    return np.concatenate([syn.push(frames_1xF), syn.flush()], axis=1)[0]


def test_pool_streams_match_standalone_sessions():
    """Staggered multi-tenant serving through StreamPool: three streams of
    different lengths share two slots (one joins mid-flight, one reuses a
    freed slot), and every stream's pooled output must be bit-identical to
    a standalone batch=1 session with the same seed."""
    cfg, m, v, pp, _, hop = setup_stream("laplace", F=4)
    rng = np.random.default_rng(42)
    C = cfg.aux_channels
    fr = {k: rng.standard_normal((n, C)).astype(np.float32)
          for k, n in (("a", 100), ("b", 80), ("c", 70))}
    seeds = {"a": 11, "b": 22, "c": 33}

    pool = StreamPool(pp, m, v, cfg, hop_length=hop, slots=2,
                      block_frames=32, chunk=64, interpret=True)
    got = {k: [] for k in fr}
    sid = {}

    def collect(out):
        for s, w in out.items():
            got[name_of[s]].append(w)

    sid["a"] = pool.open(seed=seeds["a"])
    name_of = {sid["a"]: "a"}
    pool.push(sid["a"], fr["a"][:50])
    collect(pool.step())                       # a: first block
    sid["b"] = pool.open(seed=seeds["b"])
    name_of[sid["b"]] = "b"
    pool.push(sid["b"], fr["b"][:40])
    pool.push(sid["a"], fr["a"][50:])
    shared = pool.step()                       # a mid + b first, one cycle
    assert set(shared) == {sid["a"], sid["b"]}
    collect(shared)
    pool.end(sid["a"])
    with pytest.raises(RuntimeError):
        pool.open(seed=9)                      # both slots busy
    while sid["a"] in pool.active:             # a's tail; slot frees
        collect(pool.step())
    sid["c"] = pool.open(seed=seeds["c"])      # reuses a's slot
    name_of[sid["c"]] = "c"
    pool.push(sid["c"], fr["c"])
    pool.push(sid["b"], fr["b"][40:])
    pool.end(sid["b"])
    pool.end(sid["c"])
    for _ in range(50):
        if not pool.active:
            break
        collect(pool.step())
    assert not pool.active and pool.dispatches >= 1

    for k in fr:
        wav = np.concatenate(got[k])
        oracle = _standalone(cfg, m, v, pp, hop, fr[k][None], seeds[k])
        assert wav.shape == oracle.shape == (fr[k].shape[0] * hop,)
        np.testing.assert_array_equal(wav, oracle)


def test_pool_tails_ride_pooled_dispatch(monkeypatch):
    """VERDICT r4 item 4: an ended multi-block stream's partial final
    block must go through the POOLED fixed-shape tail dispatch (masked-
    upsample end edge), never the per-stream host path — including the
    two-cycle case where the remainder exceeds one block but not
    block+halo. Host-path flush is forbidden by monkeypatch; outputs stay
    bit-identical to standalone sessions."""
    cfg, m, v, pp, _, hop = setup_stream("laplace", F=4)
    rng = np.random.default_rng(7)
    C = cfg.aux_channels
    halo = upsampler_halo(cfg.upsample_factors)
    assert halo >= 1
    # 97 = 2 full blocks of 32 + 33 remaining (> block, < block + halo
    # needs halo > 1; with halo == 2, 33 is in (32, 34) -> two tail cycles)
    lens = {"a": 97, "b": 70}
    fr = {k: rng.standard_normal((n, C)).astype(np.float32)
          for k, n in lens.items()}
    oracles = {k: _standalone(cfg, m, v, pp, hop, fr[k][None], 60 + i)
               for i, k in enumerate(fr)}

    pool = StreamPool(pp, m, v, cfg, hop_length=hop, slots=2,
                      block_frames=32, chunk=64, interpret=True)
    sid = {k: pool.open(seed=60 + i) for i, k in enumerate(fr)}
    for k in fr:
        pool.push(sid[k], fr[k])
        pool.end(sid[k])

    def boom(self):
        raise AssertionError("host-path flush used for a pooled tail")

    monkeypatch.setattr(StreamingSynthesizer, "flush", boom)
    got = {k: [] for k in fr}
    name_of = {v_: k for k, v_ in sid.items()}
    for _ in range(30):
        if not pool.active:
            break
        for s, w in pool.step().items():
            got[name_of[s]].append(w)
    assert not pool.active
    for k in fr:
        wav = np.concatenate(got[k])
        assert wav.shape == (lens[k] * hop,)
        np.testing.assert_array_equal(wav, oracles[k])


def test_pool_softmax_matches_standalone():
    """The pool's warm-start path includes the softmax head's mu-law
    teacher quantization — one staggered two-stream check, bit-exact."""
    cfg, m, v, pp, _, hop = setup_stream("softmax", F=4)
    rng = np.random.default_rng(5)
    C = cfg.aux_channels
    fr = {k: rng.standard_normal((n, C)).astype(np.float32)
          for k, n in (("a", 80), ("b", 70))}
    pool = StreamPool(pp, m, v, cfg, hop_length=hop, slots=2,
                      block_frames=32, chunk=64, interpret=True)
    sid = {k: pool.open(seed=40 + i) for i, k in enumerate(fr)}
    for k in fr:
        pool.push(sid[k], fr[k])
        pool.end(sid[k])
    got = {k: [] for k in fr}
    name_of = {v_: k for k, v_ in sid.items()}
    for _ in range(30):
        if not pool.active:
            break
        for s, w in pool.step().items():
            got[name_of[s]].append(w)
    assert not pool.active
    for i, k in enumerate(fr):
        wav = np.concatenate(got[k])
        oracle = _standalone(cfg, m, v, pp, hop, fr[k][None], 40 + i)
        np.testing.assert_array_equal(wav, oracle)


def test_pool_lifecycle_errors():
    cfg, m, v, pp, _, hop = setup_stream("laplace", F=4)
    pool = StreamPool(pp, m, v, cfg, hop_length=hop, slots=1,
                      block_frames=32, chunk=64, interpret=True)
    a = pool.open(seed=0)
    pool.end(a)
    with pytest.raises(RuntimeError):
        pool.push(a, np.zeros((3, cfg.aux_channels), np.float32))
    assert pool.step() == {}                   # empty ended stream closes
    assert not pool.active
    with pytest.raises(KeyError):
        pool.push(a, np.zeros((3, cfg.aux_channels), np.float32))
    b = pool.open(seed=1)                      # slot was freed
    with pytest.raises(ValueError):
        pool.push(b, np.zeros((2, 3, cfg.aux_channels), np.float32))


def test_streaming_fused_equals_fused_batch():
    """The fused-window kernel plugs into the streaming session: streamed
    output must equal one fused batch call over the full conditioning with
    the same noise (the fused kernel is deterministic, so streaming with
    fused=W is self-consistent even though fused != unfused bitwise)."""
    cfg, m, v, pp, frames, hop = setup_stream("laplace", F=96)
    B, F, _ = frames.shape
    syn = StreamingSynthesizer(pp, m, v, cfg, hop_length=hop, batch=B,
                               block_frames=32, chunk=64, seed=3,
                               interpret=True, record_noise=True, fused=3)
    pieces = [syn.push(frames[:, s:s + 16]) for s in range(0, F, 16)]
    pieces.append(syn.flush())
    wav = np.concatenate(pieces, axis=1)
    T = F * hop
    assert wav.shape == (B, T)

    c_up = m.apply(v, jnp.asarray(frames), method="upsample_cond")
    noise = syn.noise_so_far()[:, :T]
    oracle = np.asarray(generate_pallas(
        pp, cfg, c_up, noise=jnp.asarray(noise), chunk=64, interpret=True,
        fused=3))
    np.testing.assert_array_equal(wav, oracle)
