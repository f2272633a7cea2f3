"""Pallas AR kernel equivalence tests, interpreter mode on CPU (SURVEY.md
§5.2: interpret=True is the TPU analog of running under a sanitizer).

The kernel must reproduce the lax.scan queue path exactly: same weights,
same conditioning, same uniform stream -> identical samples. On real TPU
hardware the same comparison holds bit-exactly (verified on v5e; the bench
runs the compiled kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_wavenet_tpu.models.generate import generate_fast
from shallow_wavenet_tpu.ops.ar_kernel import generate_pallas, pallas_supported

from tests.test_generate import setup_gen
from tests.test_model import tiny_cfg


@pytest.mark.parametrize("head", ["softmax", "laplace"])
@pytest.mark.parametrize("mode", ["greedy", "sample"])
def test_pallas_equals_scan(head, mode):
    cfg, m, v, pp, c_up = setup_gen(head)
    assert pallas_supported(cfg)
    key = jax.random.key(11)
    B, T, _ = c_up.shape
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    fast = np.asarray(generate_fast(pp, cfg, c_up, key, mode, noise=noise))
    pal = np.asarray(generate_pallas(pp, cfg, c_up, mode=mode, noise=noise,
                                     chunk=128, interpret=True))
    np.testing.assert_array_equal(fast, pal)


def test_pallas_state_persists_across_chunks():
    """A chunk boundary must be invisible: compare one-chunk vs many-chunk
    runs of the same generation."""
    cfg, m, v, pp, c_up = setup_gen("laplace", F=30)  # T = 300 samples
    B, T, _ = c_up.shape
    key = jax.random.key(0)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    one = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=384, interpret=True))
    many = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                      noise=noise, chunk=128, interpret=True))
    np.testing.assert_array_equal(one, many)


def test_pallas_handles_nonmultiple_length():
    """T not a multiple of chunk: output is trimmed, values match scan."""
    cfg, m, v, pp, c_up = setup_gen("laplace", F=3)  # T = 3*10 = 30 frames
    B, T, _ = c_up.shape
    assert T % 128 != 0
    key = jax.random.key(2)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    fast = np.asarray(generate_fast(pp, cfg, c_up, key, "sample", noise=noise))
    pal = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=128, interpret=True))
    assert pal.shape == (B, T)
    np.testing.assert_array_equal(fast, pal)


def test_pallas_supported_flags():
    assert pallas_supported(tiny_cfg())
    assert not pallas_supported(tiny_cfg(kernel_size=3))


def _teacher_expected(m, v, cfg, c_up, teacher, noise):
    """Oracle: teacher-forced stack outputs + shared-noise sampling."""
    from shallow_wavenet_tpu.models.generate import _sample

    T = c_up.shape[1]
    if cfg.head == "softmax":
        x_in = teacher.astype(jnp.int32)
    else:
        x_in = teacher
    out = m.apply(v, x_in, c_up[:, :T], method="stack")
    _, x_t = _sample(cfg, out, None, "sample", noise)
    return np.asarray(x_t)


@pytest.mark.parametrize("head", ["softmax", "laplace"])
def test_teacher_mode_matches_stack(head):
    """Teacher-forced kernel == teacher-forced flax stack + sampler (no
    feedback loop -> comparable at fp tolerance)."""
    cfg, m, v, pp, c_up = setup_gen(head)
    B, T, _ = c_up.shape
    key = jax.random.key(4)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    if head == "softmax":
        teacher = jax.random.randint(key, (B, T), 0, 256).astype(jnp.float32)
    else:
        teacher = jax.random.uniform(key, (B, T), minval=-1, maxval=1)
    got = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, teacher=teacher,
                                     chunk=128, interpret=True))
    want = _teacher_expected(m, v, cfg, c_up, teacher, noise)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bfloat16_kernel_close_to_fp32_teacher_forced():
    """bf16 weights/buffers variant stays close to the fp32 oracle under
    teacher forcing (the validation path for reduced-precision kernels)."""
    cfg, m, v, pp, c_up = setup_gen("laplace")
    B, T, _ = c_up.shape
    key = jax.random.key(9)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    teacher = jax.random.uniform(key, (B, T), minval=-1, maxval=1)
    got = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, teacher=teacher,
                                     chunk=128, interpret=True,
                                     dtype="bfloat16"))
    want = _teacher_expected(m, v, cfg, c_up, teacher, noise)
    # bf16 mantissa ~3 decimal digits; untrained-model outputs are O(0.1)
    assert np.abs(got - want).max() < 5e-2
    assert np.abs(got - want).mean() < 1e-2


def test_deep_config_supported_in_bf16():
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.ops.ar_kernel import vmem_bytes_estimate

    deep = get_config("deep_baseline").model
    # fp32 tops out well below bf16: a batch the bf16 estimate admits can
    # exceed the 128 MB physical budget in fp32
    assert not pallas_supported(deep, batch=96, chunk=64)
    assert pallas_supported(deep, batch=4, chunk=256, dtype="bfloat16"), \
        vmem_bytes_estimate(deep, 4, 256, "bfloat16")


def test_deep_decode_batch16_supported_in_bf16():
    """Hardware-probed frontier (v5e, 2026-08): the deep baseline kernel
    compiles at bf16 batch 16 / chunk 64 (row-exact vs batch 4) — the
    static gate must admit it so decode can use it."""
    from shallow_wavenet_tpu.config import get_config

    deep = get_config("deep_baseline").model
    assert pallas_supported(deep, batch=16, chunk=64, dtype="bfloat16")


def test_zero_params_shapes_match_extract():
    """probe_pallas compiles against _zero_params — its shapes must track
    extract_plain_params exactly for both heads."""
    from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
    from shallow_wavenet_tpu.ops.ar_kernel import _zero_params

    for head in ("laplace", "softmax"):
        cfg = tiny_cfg(head=head)
        m = WaveNet(cfg)
        T = 2 * int(np.prod(cfg.upsample_factors)) - 1
        x = (jnp.zeros((1, T), jnp.int32) if head == "softmax"
             else jnp.zeros((1, T)))
        c = jnp.zeros((1, 2, cfg.aux_channels))
        v = m.init(jax.random.key(0), x, c)
        pp = extract_plain_params(v, cfg)
        zp = _zero_params(cfg)
        assert set(zp) == set(pp), (set(zp) ^ set(pp), head)
        for k in pp:
            assert zp[k].shape == pp[k].shape, (k, zp[k].shape, pp[k].shape)


def test_probe_pallas_false_on_cpu_without_raising():
    """On the CPU test backend the try-compile fails; probe_pallas must
    swallow it and report False (decode then falls back to lax.scan)."""
    from shallow_wavenet_tpu.ops.ar_kernel import probe_pallas

    if jax.default_backend() == "tpu":
        import pytest
        pytest.skip("probe succeeds on real TPU")
    assert probe_pallas(tiny_cfg(), batch=2, chunk=64) is False
    # cached verdict, second call is free
    assert probe_pallas(tiny_cfg(), batch=2, chunk=64) is False


def _setup_big_dil(head="laplace", B=2, n_chunks=7, seed=0):
    """Config whose top dilation (128) exceeds the 64-sample chunk, so the
    streamed-ring path actually streams (2 layers HBM-resident) and the
    generation spans several full ring periods (d/chunk = 2)."""
    from shallow_wavenet_tpu.models import WaveNet, extract_plain_params

    cfg = tiny_cfg(head=head, n_stacks=2, stack_size=8,
                   upsample_factors=(8, 8))
    m = WaveNet(cfg)
    rng = np.random.default_rng(seed)
    H = int(np.prod(cfg.upsample_factors))
    F = n_chunks * 64 // H
    T = F * H - 1
    if head == "softmax":
        x = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    else:
        x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, F, cfg.aux_channels)), jnp.float32)
    v = m.init(jax.random.key(3), x, c)
    pp = extract_plain_params(v, cfg)
    c_up = m.apply(v, c, method="upsample_cond")
    return cfg, pp, c_up


@pytest.mark.parametrize("head", ["softmax", "laplace"])
def test_streamed_rings_bitexact_vs_resident(head):
    """HBM-streamed large-dilation rings are pure data movement: the fp32
    streamed kernel must be bit-identical to the resident kernel (and hence
    to the scan path) across chunk boundaries and full ring periods."""
    from shallow_wavenet_tpu.ops.ar_kernel import _stream_split

    cfg, pp, c_up = _setup_big_dil(head)
    res, strm = _stream_split(cfg.dilations, 64, True)
    assert strm, "config must exercise streaming"
    assert all(cfg.dilations[l] > 64 for l in strm)
    B, T, _ = c_up.shape
    key = jax.random.key(5)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    resident = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                          noise=noise, chunk=64,
                                          interpret=True))
    streamed = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                          noise=noise, chunk=64,
                                          interpret=True, stream=True))
    np.testing.assert_array_equal(resident, streamed)


def test_chunk32_streamed_bitexact_vs_chunk64():
    """chunk=32 (the new floor) must generate the same waveform as
    chunk=64, resident or streamed — at chunk 32 the d==64 layers become
    streamable too (window == 2 ring periods per 64 samples), so this
    exercises the smaller-window DMA schedule end to end."""
    from shallow_wavenet_tpu.ops.ar_kernel import _stream_split

    cfg, pp, c_up = _setup_big_dil("laplace")
    assert 64 in cfg.dilations
    strm32 = _stream_split(cfg.dilations, 32, True)[1]
    strm64 = _stream_split(cfg.dilations, 64, True)[1]
    assert len(strm32) > len(strm64), "chunk 32 must stream the d=64 layers"
    B, T, _ = c_up.shape
    noise = jax.random.uniform(jax.random.key(5), (B, T),
                               minval=1e-6, maxval=1 - 1e-6)
    ref = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=64, interpret=True))
    c32 = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=32, interpret=True,
                                     unroll=2))
    c32s = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                      noise=noise, chunk=32, interpret=True,
                                      unroll=2, stream=True))
    np.testing.assert_array_equal(ref, c32)
    np.testing.assert_array_equal(ref, c32s)


def test_streamed_vmem_gate_and_probe_shortcircuit():
    """The streamed estimate drops the large-dilation rings from VMEM (deep
    config: admits bf16 batch 48 where the resident gate tops out at 16);
    probing stream mode on a config with nothing to stream reports False
    without compiling (the resident tier already covered it)."""
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.ops.ar_kernel import (
        probe_pallas, vmem_bytes_estimate,
    )

    deep = get_config("deep_baseline").model
    assert (vmem_bytes_estimate(deep, 160, 64, "bfloat16", stream=True)
            < vmem_bytes_estimate(deep, 160, 64, "bfloat16"))
    assert pallas_supported(deep, batch=160, chunk=64, dtype="bfloat16",
                            stream=True)
    assert not pallas_supported(deep, batch=160, chunk=64, dtype="bfloat16")
    # all tiny_cfg dilations <= 64: stream tier must short-circuit to False
    assert probe_pallas(tiny_cfg(), batch=2, chunk=64, stream=True) is False


@pytest.mark.parametrize("head", ["softmax", "laplace"])
def test_segmented_equals_full(head):
    """Segmented generation (teacher-forced warm-start per segment) must be
    bit-identical to one unsegmented call — SURVEY.md §5.7's long-utterance
    mechanism cannot change the samples."""
    from shallow_wavenet_tpu.models.generate import generate_segmented

    cfg, m, v, pp, c_up = setup_gen(head, F=30)   # T=299, W=sum_d+1=15
    B, T, _ = c_up.shape
    key = jax.random.key(21)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    full = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                      noise=noise, chunk=64, interpret=True))
    seg = np.asarray(generate_segmented(pp, cfg, c_up, noise, seg_len=128,
                                        chunk=64, interpret=True))
    assert seg.shape == full.shape
    np.testing.assert_array_equal(full, seg)


def test_segmented_streamed_rings():
    """Segmentation composes with HBM-streamed rings (both are bit-exact
    transformations) on a config whose dilations exceed the chunk."""
    from shallow_wavenet_tpu.models.generate import generate_segmented

    cfg, pp, c_up = _setup_big_dil("laplace", n_chunks=12)  # W=511, T=767
    B, T, _ = c_up.shape
    key = jax.random.key(23)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    full = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                      noise=noise, chunk=64, interpret=True))
    seg = np.asarray(generate_segmented(pp, cfg, c_up, noise, seg_len=576,
                                        chunk=64, stream=True,
                                        interpret=True))
    np.testing.assert_array_equal(full, seg)


# ---- fused windowed-residual-expansion kernel (fused=W) -----------------
#
# The fused variant expands the within-block residual recurrence into the
# gate inputs (precomputed weight products), shortening the per-sample
# sequential matmul chain from 2L to L + L/W. Algebraically equivalent but
# NOT guaranteed bit-exact (different summation order), so these tests use
# fp32 tolerances; the reduced-precision A/B lives in BASELINE.md.


@pytest.mark.parametrize("head", ["softmax", "laplace"])
@pytest.mark.parametrize("fused", [2, 3, 5])
def test_fused_matches_scan(head, fused):
    cfg, m, v, pp, c_up = setup_gen(head)
    B, T, _ = c_up.shape
    key = jax.random.key(11)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    fast = np.asarray(generate_fast(pp, cfg, c_up, key, "sample",
                                    noise=noise))
    pal = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=128,
                                     interpret=True, fused=fused))
    np.testing.assert_allclose(pal, fast, atol=1e-5, rtol=0)


@pytest.mark.parametrize("head", ["softmax", "laplace"])
def test_fused_teacher_mode_matches_stack(head):
    """Teacher forcing removes the feedback loop, so the fused kernel must
    track the flax stack at fp tolerance — the validation path for any
    non-bit-exact kernel variant."""
    cfg, m, v, pp, c_up = setup_gen(head)
    B, T, _ = c_up.shape
    key = jax.random.key(4)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    if head == "softmax":
        teacher = jax.random.randint(key, (B, T), 0, 256).astype(jnp.float32)
    else:
        teacher = jax.random.uniform(key, (B, T), minval=-1, maxval=1)
    got = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, teacher=teacher,
                                     chunk=128, interpret=True, fused=3))
    want = _teacher_expected(m, v, cfg, c_up, teacher, noise)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_with_streamed_rings():
    """fused composes with HBM-streamed large-dilation rings: the base
    gate inputs read the streamed window, the block expansion is untouched
    by where the rings live."""
    cfg, pp, c_up = _setup_big_dil("laplace")
    B, T, _ = c_up.shape
    key = jax.random.key(5)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    ref = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=64, interpret=True))
    got = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=64, interpret=True,
                                     stream=True, fused=3))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_fused_segmented_warmup():
    """fused composes with the segmented teacher-forced warm-start."""
    from shallow_wavenet_tpu.models.generate import generate_segmented

    cfg, m, v, pp, c_up = setup_gen("laplace", F=30)
    B, T, _ = c_up.shape
    key = jax.random.key(21)
    noise = jax.random.uniform(key, (B, T), minval=1e-6, maxval=1 - 1e-6)
    full = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                      noise=noise, chunk=64, interpret=True,
                                      fused=4))
    seg = np.asarray(generate_segmented(pp, cfg, c_up, noise, seg_len=128,
                                        chunk=64, interpret=True, fused=4))
    np.testing.assert_allclose(seg, full, atol=1e-5, rtol=0)


def test_fused_vmem_estimate_and_gate():
    """The fused estimate carries the widened projections, and the support
    gate accounts for them."""
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.ops.ar_kernel import vmem_bytes_estimate

    deep = get_config("deep_baseline").model
    assert (vmem_bytes_estimate(deep, 64, 64, "bfloat16", fused=6)
            > vmem_bytes_estimate(deep, 64, 64, "bfloat16", fused=3)
            > vmem_bytes_estimate(deep, 64, 64, "bfloat16"))
