"""Autoregressive generation (component C8; SURVEY.md §A.6, §3.4).

Two paths over the same weights:

- `generate_fast`: fast-WaveNet queue caching [P: arXiv 1611.09482] as a
  single `lax.scan` over output samples. Per-layer ring buffers hold each
  layer's past inputs; per sample the work is O(layers) small matmuls.
  One compiled XLA program for the entire utterance batch — this is the
  correct-but-not-yet-Pallas path (the VMEM-persistent Pallas kernel in
  ops/ar_kernel.py is the speed-of-light version of exactly this step
  function).
- `generate_naive`: re-runs the teacher-forced stack on the full prefix for
  every sample — O(T * layers * T) — used only as the equivalence oracle
  (the two are mathematically identical; test §4.2).

Sampling modes: "sample" (per-step fold_in key; categorical or Laplace
inverse CDF) and "greedy" (argmax / mu) for deterministic comparisons.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.config import ModelConfig
from shallow_wavenet_tpu.models import heads
from shallow_wavenet_tpu.ops.mulaw import mulaw_dequantize, mulaw_quantize


def seed_feedback(cfg: ModelConfig):
    """Initial x_prev for t=0 (silence)."""
    if cfg.head == "softmax":
        return mulaw_quantize(jnp.float32(0.0), cfg.quantize_channels)
    return jnp.float32(0.0)


def _input_encode(pp, cfg: ModelConfig, x_prev):
    if cfg.head == "softmax":
        return pp["input_embed"][x_prev]          # (B, R)
    return x_prev[:, None] @ pp["input_w"] + pp["input_b"]


def _head_out(pp, skip):
    out = jax.nn.relu(skip)
    out = jax.nn.relu(out @ pp["head1_w"] + pp["head1_b"])
    return out @ pp["head2_w"] + pp["head2_b"]    # (B, O)


def _sample(cfg: ModelConfig, out, key, mode, u=None):
    """Returns (feedback, waveform_sample). When `u` (per-draw uniform) is
    given it is used instead of `key` — the shared-noise path that makes
    scan/naive/Pallas backends bit-comparable."""
    if cfg.head == "softmax":
        if mode == "greedy":
            ids = jnp.argmax(out, axis=-1).astype(jnp.int32)
        elif u is not None:
            ids = heads.categorical_from_uniform(out, u)
        else:
            ids = heads.sample_softmax(out, key)
        return ids, mulaw_dequantize(ids, cfg.quantize_channels)
    if mode == "greedy":
        x = out[..., 0]
    elif u is not None:
        x = heads.laplace_from_uniform(out, u - 0.5, cfg.log_b_min,
                                       cfg.log_b_max)
    else:
        x = heads.sample_laplace(out, key, cfg.log_b_min, cfg.log_b_max)
    x = jnp.clip(x, -1.0, 1.0)
    return x, x


@functools.partial(jax.jit, static_argnames=("cfg", "mode"))
def generate_fast(pp: dict, cfg: ModelConfig, c_up, key, mode: str = "sample",
                  noise=None):
    """Queue-cached AR generation.

    pp    : plain params from extract_plain_params (fp32)
    c_up  : (B, T, C) sample-rate conditioning (from WaveNet.upsample_cond)
    key   : PRNG key; per-step keys are fold_in(key, t)
    noise : optional (B, T) uniforms in (0,1) — shared-noise sampling that
            is bit-comparable across the scan/naive/Pallas backends
    Returns waveform (B, T) float32.
    """
    B, T, _ = c_up.shape
    dil = jnp.asarray(cfg.dilations, jnp.int32)
    L = len(cfg.dilations)
    D = int(max(cfg.dilations))
    R = cfg.residual_channels
    half = cfg.gate_channels // 2

    bufs0 = jnp.zeros((L, B, D, R), jnp.float32)
    x0 = jnp.broadcast_to(seed_feedback(cfg), (B,)).astype(
        jnp.int32 if cfg.head == "softmax" else jnp.float32
    )

    def step(carry, t):
        bufs, x_prev = carry
        c_t = jax.lax.dynamic_index_in_dim(c_up, t, axis=1, keepdims=False)
        h = _input_encode(pp, cfg, x_prev)

        def layer_fn(acc, xs):
            h, skip = acc
            cw, cb, vw, rw, rb, sw, sb, d, buf = xs
            r_idx = jnp.mod(t - d, D)
            h_prev = jax.lax.dynamic_index_in_dim(buf, r_idx, axis=1,
                                                  keepdims=False)
            # same accumulation order as CausalDilatedConv + ResidualBlock
            u = ((h_prev @ cw[0] + h @ cw[1]) + cb) + c_t @ vw
            z = jnp.tanh(u[:, :half]) * jax.nn.sigmoid(u[:, half:])
            buf = jax.lax.dynamic_update_index_in_dim(buf, h, jnp.mod(t, D),
                                                      axis=1)
            h_new = h + (z @ rw + rb)
            skip = skip + (z @ sw + sb)
            return (h_new, skip), buf

        # conv_w is (L, k=2, R, G); tap 0 = x[t-d], tap 1 = x[t]
        xs = (pp["conv_w"], pp["conv_b"], pp["cond_w"], pp["res_w"],
              pp["res_b"], pp["skip_w"], pp["skip_b"], dil, bufs)
        (h, skip), bufs = jax.lax.scan(
            layer_fn,
            (h, jnp.zeros((B, cfg.skip_channels), jnp.float32)),
            xs,
        )
        out = _head_out(pp, skip)
        u = None if noise is None else jax.lax.dynamic_index_in_dim(
            noise, t, axis=1, keepdims=False)
        fb, x_t = _sample(cfg, out, jax.random.fold_in(key, t), mode, u)
        return (bufs, fb), x_t

    (_, _), wav = jax.lax.scan(step, (bufs0, x0), jnp.arange(T))
    return jnp.transpose(wav, (1, 0))             # (B, T)


def generate_dp(pp: dict, cfg: ModelConfig, c_up, noise, mesh,
                mode: str = "sample", use_pallas: bool = False,
                chunk: int = 512, stream: bool = False,
                dtype: str = "float32", interpret: bool = False,
                fused: int = 0):
    """Batched AR generation sharded over chips (BASELINE config 4;
    SURVEY.md §2.2 DP row): shard_map over the ('data',) mesh — each device
    generates its own utterance shard with the queue-cached step (Pallas
    kernel per device when use_pallas), params replicated, zero cross-chip
    traffic during the AR loop.

    noise: (B, T) uniforms (required — per-utterance streams must be
    explicit so sharding cannot change the samples). B must divide by the
    mesh size.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis = mesh.axis_names[0]
    repl = jax.tree.map(lambda _: P(), pp)

    def per_device(pp_, c_up_, noise_):
        if use_pallas:
            from shallow_wavenet_tpu.ops.ar_kernel import generate_pallas

            return generate_pallas(pp_, cfg, c_up_, mode=mode, noise=noise_,
                                   chunk=chunk, stream=stream, dtype=dtype,
                                   interpret=interpret, fused=fused)
        return generate_fast(pp_, cfg, c_up_, jax.random.key(0), mode,
                             noise=noise_)

    f = shard_map(
        per_device, mesh=mesh,
        in_specs=(repl, P(axis), P(axis)),
        out_specs=P(axis),
        # the scan carries mix device-varying (h) and replicated-zero
        # (skip) inits; skip the varying-axis type check
        check_vma=False,
    )
    return f(pp, c_up, noise)


def generate_segmented(pp: dict, cfg: ModelConfig, c_up, noise,
                       seg_len: int, chunk: int = 64,
                       dtype: str = "float32", stream: bool = False,
                       interpret: bool = False, fused: int = 0):
    """Chunked-conditioning-stream generation (SURVEY.md §5.7): synthesize
    an arbitrarily long utterance batch in fixed-size segments so the
    Pallas kernel's streamed inputs (upsampled conditioning, noise) never
    exceed a bounded footprint — the TPU-native answer to utterances
    longer than a chip's budget (no cross-sample reduction exists to
    shard, so segmentation, not sequence parallelism, is the mechanism).

    Ring state is NOT carried between kernel calls: each segment re-derives
    it with a teacher-forced warm-start of M steps (sum(dilations) + 1
    rounded up to a whole chunk — forced/AR switches at a chunk boundary so
    AR chunks pay zero teacher overhead) fed the previous segment's true
    samples, which reconstructs every ring buffer exactly (each layer's
    horizon is the prefix-sum of dilations). fp32 output is therefore
    bit-identical to a single unsegmented call — locked by
    tests/test_pallas_ar.py. Overhead: M extra steps per segment (<2% for
    10 s segments at 24 kHz).

    noise: (B, T) uniforms — required, so segmentation cannot change the
    samples. seg_len: output samples per segment (multiple of chunk).

    c_up and noise may be HOST (numpy) arrays: only the current segment is
    transferred to the device, so device HBM stays flat in utterance
    length (the generated waveform, 4 bytes/sample, is the only
    full-length device array).
    """
    from shallow_wavenet_tpu.ops.ar_kernel import (
        generate_pallas, warmup_length,
    )

    B, T, _ = c_up.shape
    if seg_len % chunk != 0:
        raise ValueError("seg_len must be a multiple of chunk")
    M = warmup_length(cfg, chunk)
    if seg_len <= M:
        raise ValueError(f"seg_len must exceed the warm-start length {M}")
    segs = []
    for s in range(0, T, seg_len):
        e = min(s + seg_len, T)
        if s == 0:
            wav = generate_pallas(pp, cfg, jnp.asarray(c_up[:, :e]),
                                  noise=jnp.asarray(noise[:, :e]),
                                  chunk=chunk, dtype=dtype, stream=stream,
                                  interpret=interpret, fused=fused)
            segs.append(wav)
            continue
        # the call spans global samples [s - M, e): local step t emits
        # global sample g = s - M + t. Steps t < M are forced with
        # teacher[t] = x(g - 1) = x(s - M - 1 + t) — the previous M true
        # samples — which makes every ring correct by t = M (layer l's
        # horizon is the prefix-sum of dilations < M); outputs are kept
        # from t = M (global s). Zeros beyond (AR region). seg_len > M
        # guarantees the teacher window lies inside the last segment.
        prev = segs[-1][:, -(M + 1):-1]                         # (B, M)
        if cfg.head == "softmax":
            prev = mulaw_quantize(prev, cfg.quantize_channels).astype(
                jnp.float32)
        teacher = jnp.pad(prev, ((0, 0), (0, e - s)))
        wav = generate_pallas(pp, cfg, jnp.asarray(c_up[:, s - M: e]),
                              noise=jnp.asarray(noise[:, s - M: e]),
                              chunk=chunk, dtype=dtype, stream=stream,
                              warmup=M, teacher=teacher,
                              interpret=interpret, fused=fused)
        segs.append(wav[:, M:])
    return jnp.concatenate(segs, axis=1)


def generate_naive(model, variables, cfg: ModelConfig, c_up, key,
                   mode: str = "sample", noise=None):
    """Equivalence oracle: per sample, recompute the teacher-forced stack on
    the whole (fixed-size) prefix and read position t. O(T^2) — tests only."""
    B, T, _ = c_up.shape
    if cfg.head == "softmax":
        x_seq = np.full((B, T), int(seed_feedback(cfg)), np.int32)
    else:
        x_seq = np.zeros((B, T), np.float32)

    @jax.jit
    def full(x_prev_seq):
        return model.apply(variables, x_prev_seq, c_up[:, :T],
                           method="stack")

    wav = np.zeros((B, T), np.float32)
    for t in range(T):
        out = full(jnp.asarray(x_seq))[:, t]
        u = None if noise is None else noise[:, t]
        fb, x_t = _sample(cfg, out, jax.random.fold_in(key, t), mode, u)
        wav[:, t] = np.asarray(x_t)
        if t + 1 < T:
            x_seq[:, t + 1] = np.asarray(fb)
    return jnp.asarray(wav)
