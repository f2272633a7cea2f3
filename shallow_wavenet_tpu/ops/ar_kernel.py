"""Pallas persistent AR generation kernel (SURVEY.md §7 PR5; BASELINE.json
north star: "autoregressive sample-generation loop rewritten as a persistent
Pallas kernel with fast-WaveNet queue caching of per-layer dilated-conv
states in VMEM").

Design (see also models/generate.py — the lax.scan twin of this step):
- One pallas_call; grid over output-sample CHUNKS. TPU grid steps run
  sequentially on a core, so VMEM scratch (the per-layer dilation ring
  buffers + feedback sample) persists across grid steps — the kernel is
  "persistent" while conditioning/noise stream in and samples stream out
  per chunk through the automatic BlockSpec pipeline (double-buffered DMA
  overlaps the AR compute).
- All layer weights live in VMEM for the whole generation (few MB for the
  shallow model) — zero HBM traffic in the per-sample critical path.
- The kernel-2 dilated conv is two (B, R) @ (R, G) MXU contractions per
  layer; the conditioning contribution of ALL layers is one
  (B, C) @ (C, L*G) matmul per sample (weights pre-concatenated), sliced
  per layer — one MXU op instead of L.
- Ring buffers: (L, D, B, R) with D = max dilation (a power of two), write
  slot t & (D-1), read slot (t - d_l) & (D-1); zero history == the zero
  left-padding of teacher-forced training.
- Sampling happens in-kernel from ONE uniform per step (Laplace inverse
  CDF / categorical inverse CDF); the uniforms stream in as an input so
  the scan and naive backends can consume the identical noise — the
  fast==naive==pallas equivalence tests rely on this.

Cited behaviour: reference decode.py's per-sample Python loop over CUDA
kernels (SURVEY.md §3.4) is what this kernel replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shallow_wavenet_tpu.config import ModelConfig
from shallow_wavenet_tpu.models.generate import seed_feedback


def vmem_bytes_estimate(cfg: ModelConfig, batch: int = 8,
                        chunk: int = 512) -> int:
    """fp32 VMEM footprint: resident weights (at the lane-padded gate width
    actually shipped to the kernel) + ring buffers + streamed cond/noise/out
    blocks (double-buffered by the pipeline)."""
    L = len(cfg.dilations)
    D = int(max(cfg.dilations))
    R, S, C = cfg.residual_channels, cfg.skip_channels, cfg.cond_channels
    gp = _gate_pad(cfg.gate_channels // 2)
    Q = cfg.quantize_channels
    w = (L * (2 * R * 2 * gp + C * 2 * gp + gp * R + gp * S)
         + S * S + S * Q)
    if cfg.head == "softmax":
        w += Q * R
    bufs = L * D * batch * R
    stream = 2 * chunk * batch * (C + 2)   # cond + noise + out, x2 buffers
    return 4 * (w + bufs + stream)


# v5e VMEM is ~16 MB/core; leave headroom for Mosaic's own temporaries
_VMEM_BUDGET = 14 * 1024 * 1024


def pallas_supported(cfg: ModelConfig, batch: int = 8,
                     chunk: int = 512) -> bool:
    """The kernel covers both heads, kernel_size 2, power-of-two max
    dilation (true for 2**i schedules), and models whose weights + ring
    buffers fit the VMEM budget at the ACTUAL generation batch/chunk (the
    deep baseline config exceeds it and decodes via the lax.scan path
    instead). Callers must pass the real batch size."""
    d = max(cfg.dilations)
    return (cfg.kernel_size == 2 and (d & (d - 1)) == 0
            and vmem_bytes_estimate(cfg, batch, chunk) <= _VMEM_BUDGET)


def _gate_pad(half: int) -> int:
    """Pad each gate half to a lane-tile multiple: the tanh/sigmoid split
    then lands on a 128-lane boundary instead of forcing sub-tile lane
    slicing in every layer (measured ~25% step-time win). Zero-padded
    weight columns/rows keep the real lanes bit-exact."""
    return max(128, -(-half // 128) * 128)


def _make_kernel(cfg: ModelConfig, chunk: int, n_chunks: int, batch: int,
                 mode: str):
    L = len(cfg.dilations)
    dil = cfg.dilations
    D = int(max(dil))
    G = cfg.gate_channels
    half = G // 2
    gp = _gate_pad(half)
    S = cfg.skip_channels
    Q = cfg.quantize_channels
    softmax = cfg.head == "softmax"
    log_b_min, log_b_max = cfg.log_b_min, cfg.log_b_max
    mu_law = float(Q - 1)

    def kernel(cond_ref, noise_ref, in_w, in_b, conv_w, conv_b, cond_wcat,
               res_w, res_b, skip_w, skip_b, h1_w, h1_b, h2_w, h2_b,
               out_ref, bufs, fb_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            bufs[...] = jnp.zeros_like(bufs)
            if softmax:
                # mulaw_quantize(0.0) == Q // 2 (matches seed_feedback)
                fb_ref[...] = jnp.full(fb_ref.shape, float(Q // 2),
                                       fb_ref.dtype)
            else:
                fb_ref[...] = jnp.zeros_like(fb_ref)

        def body(tt, _):
            t = i * chunk + tt
            x_prev = fb_ref[0, :]                        # (B,)
            c_t = cond_ref[tt]                           # (B, C)
            cc = jnp.dot(c_t, cond_wcat[:],
                         preferred_element_type=jnp.float32)  # (B, L*G)

            if softmax:
                ids = x_prev.astype(jnp.int32)
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (batch, Q), 1) == ids[:, None]
                ).astype(jnp.float32)
                h = jnp.dot(onehot, in_w[:],
                            preferred_element_type=jnp.float32)
            else:
                h = x_prev[:, None] * in_w[0][None, :] + in_b[:][None, :]

            skip = jnp.zeros((batch, S), jnp.float32)
            for l in range(L):
                r_idx = (t + D - dil[l]) & (D - 1)
                h_prev = bufs[l, r_idx]                  # (B, R)
                u = (
                    (jnp.dot(h_prev, conv_w[l, 0],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(h, conv_w[l, 1],
                               preferred_element_type=jnp.float32))
                    + conv_b[l][None, :]
                ) + cc[:, l * 2 * gp:(l + 1) * 2 * gp]
                z = jnp.tanh(u[:, :gp]) * jax.nn.sigmoid(u[:, gp:])
                bufs[l, t & (D - 1)] = h
                h = h + (jnp.dot(z, res_w[l],
                                 preferred_element_type=jnp.float32)
                         + res_b[l][None, :])
                skip = skip + (jnp.dot(z, skip_w[l],
                                       preferred_element_type=jnp.float32)
                               + skip_b[l][None, :])

            o = jax.nn.relu(skip)
            o = jax.nn.relu(jnp.dot(o, h1_w[:],
                                    preferred_element_type=jnp.float32)
                            + h1_b[:][None, :])
            o = jnp.dot(o, h2_w[:],
                        preferred_element_type=jnp.float32) + h2_b[:][None, :]

            if softmax:
                if mode == "greedy":
                    ids = jnp.argmax(o, axis=-1).astype(jnp.int32)
                else:
                    u_t = noise_ref[tt, :]
                    p = jax.nn.softmax(o, axis=-1)
                    # cumsum has no Mosaic lowering; cdf = p @ upper-tri ones
                    # is one (B,Q)@(Q,Q) MXU op
                    tri = (jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
                           <= jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
                           ).astype(jnp.float32)
                    cdf = jnp.dot(p, tri, preferred_element_type=jnp.float32)
                    ids = jnp.clip(
                        jnp.sum((cdf < u_t[:, None]).astype(jnp.int32),
                                axis=-1),
                        0, Q - 1)
                # mu-law dequantize (bin centre) for the output waveform
                y = (ids.astype(jnp.float32) + 0.5) * (2.0 / Q) - 1.0
                x_t = (jnp.sign(y)
                       * ((1.0 + mu_law) ** jnp.abs(y) - 1.0) / mu_law)
                fb = ids.astype(jnp.float32)
            else:
                mu = o[:, 0]
                log_b = jnp.clip(o[:, 1], log_b_min, log_b_max)
                if mode == "greedy":
                    x_t = mu
                else:
                    u_t = noise_ref[tt, :] - 0.5
                    x_t = mu - jnp.exp(log_b) * jnp.sign(u_t) * jnp.log1p(
                        -2.0 * jnp.abs(u_t))
                x_t = jnp.clip(x_t, -1.0, 1.0)
                fb = x_t

            out_ref[tt, :] = x_t
            fb_ref[0, :] = fb
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mode", "chunk", "interpret"),
)
def generate_pallas(pp: dict, cfg: ModelConfig, c_up, key=None,
                    mode: str = "sample", noise=None, chunk: int = 512,
                    interpret: bool = False):
    """Persistent-kernel AR generation; same contract as generate_fast.

    c_up (B, T, C) fp32; returns (B, T) fp32. `noise` (B, T) uniforms in
    (0,1); generated from `key` when omitted (sample mode).
    """
    B, T, C = c_up.shape
    if not pallas_supported(cfg, batch=B, chunk=chunk):
        raise ValueError(
            f"model config/batch not supported by the Pallas kernel "
            f"(VMEM estimate {vmem_bytes_estimate(cfg, B, chunk) >> 20} MB "
            f"> {_VMEM_BUDGET >> 20} MB budget) — use the lax.scan path"
        )
    L = len(cfg.dilations)
    D = int(max(cfg.dilations))
    R = cfg.residual_channels
    G = cfg.gate_channels

    if chunk % 128 != 0:
        raise ValueError("chunk must be a multiple of 128 (lane tiling)")
    n_chunks = -(-T // chunk)
    T_pad = n_chunks * chunk
    if T_pad != T:
        c_up = jnp.pad(c_up, ((0, 0), (0, T_pad - T), (0, 0)))
    if mode == "sample":
        if noise is None:
            if key is None:
                raise ValueError("sample mode needs key or noise")
            noise = jax.random.uniform(key, (B, T_pad), minval=1e-7,
                                       maxval=1.0 - 1e-7)
        elif noise.shape[1] != T_pad:
            noise = jnp.pad(noise, ((0, 0), (0, T_pad - noise.shape[1])),
                            constant_values=0.5)
    else:
        noise = jnp.full((B, T_pad), 0.5, jnp.float32)
    # time-major layouts: the per-sample dynamic index must not land on the
    # minor (lane) dim — Mosaic requires 128-multiple lane offsets
    c_up = jnp.transpose(c_up, (1, 0, 2))     # (T, B, C)
    noise = jnp.transpose(noise, (1, 0))      # (T, B)

    if cfg.head == "softmax":
        in_w = pp["input_embed"]            # (Q, R)
        in_b = jnp.zeros((R,), jnp.float32)
    else:
        in_w = pp["input_w"]                # (1, R)
        in_b = pp["input_b"]

    # gate-half padding to lane-tile boundaries (see _gate_pad); real lanes
    # stay bit-exact (zero columns/rows contribute exact +0)
    half = G // 2
    gp = _gate_pad(half)
    conv_w = pp["conv_w"]
    conv_b = pp["conv_b"]
    cond_w = pp["cond_w"]                   # (L, C, G)
    res_w = pp["res_w"]                     # (L, half, R)
    skip_w = pp["skip_w"]                   # (L, half, S)
    if gp != half:
        def pad_gate_cols(w):               # (..., G) -> (..., 2*gp)
            out = jnp.zeros(w.shape[:-1] + (2 * gp,), w.dtype)
            out = out.at[..., :half].set(w[..., :half])
            return out.at[..., gp:gp + half].set(w[..., half:])

        conv_w = pad_gate_cols(conv_w)
        conv_b = pad_gate_cols(conv_b)
        cond_w = pad_gate_cols(cond_w)
        pad_rows = ((0, 0), (0, gp - half), (0, 0))
        res_w = jnp.pad(res_w, pad_rows)
        skip_w = jnp.pad(skip_w, pad_rows)
    cond_wcat = jnp.transpose(cond_w, (1, 0, 2)).reshape(C, L * 2 * gp)

    kernel = _make_kernel(cfg, chunk, n_chunks, B, mode)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    weights = (in_w, in_b, conv_w, conv_b, cond_wcat,
               res_w, pp["res_b"], skip_w, pp["skip_b"],
               pp["head1_w"], pp["head1_b"], pp["head2_w"], pp["head2_b"])

    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, B, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[wspec(w.shape) for w in weights],
        ],
        out_specs=pl.BlockSpec((chunk, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((L, D, B, R), jnp.float32),   # dilation ring buffers
            pltpu.VMEM((1, B), jnp.float32),         # feedback sample / id
        ],
        interpret=interpret,
    )(c_up, noise, *weights)
    return jnp.transpose(out, (1, 0))[:, :T]
