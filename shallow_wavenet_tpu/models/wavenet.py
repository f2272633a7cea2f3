"""Flax WaveNet: causal dilated conv stack with gated units (SURVEY.md §A.2).

TPU-first design notes:
- The kernel-2 causal dilated conv is decomposed into per-tap dense
  contractions (shift + einsum) rather than lax.conv — (B*T, C) x (C, F)
  maps straight onto the MXU, the decomposition mirrors 1:1 into the Pallas
  AR kernel (ops/ar_kernel.py), and the torch parity test checks the same
  math against nn.Conv1d.
- Activations run in `compute_dtype` (bfloat16 by default) with fp32
  accumulation (`preferred_element_type`); params stay fp32.
- All shapes are static; the whole teacher-forced forward is one fused XLA
  program over (B, T) samples.

The reference model this re-implements is SURVEY.md component C6 (expected
`src/nets/wavenet.py` in the reference tree, which was unmountable — §0).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.config import ModelConfig


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class CausalDilatedConv(nn.Module):
    """Causal conv over (B, T, C) via per-tap shifts + dense contractions.

    Output t = sum_i x[t - (k-1-i)*d] @ kernel[i] + bias; left zero-padding,
    so it is exactly torch's Conv1d(padding=(k-1)*d)[..., :T].
    """

    features: int
    kernel_size: int = 2
    dilation: int = 1
    dtype: Any = jnp.float32
    fold_taps: bool = False

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = (k - 1) * d
        t = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        taps = [jax.lax.dynamic_slice_in_dim(xp, i * d, t, axis=1)
                for i in range(k)]
        if self.fold_taps:
            # one K = k*c_in contraction (full MXU depth for R=64 k=2):
            # sum over taps == contraction over the concatenated axis, so
            # the parameter tree is unchanged (config.py model.fold_taps)
            y = jnp.einsum(
                "btc,cf->btf",
                jnp.concatenate(taps, axis=-1).astype(self.dtype),
                kernel.reshape(k * c_in, self.features).astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            y = jnp.zeros(x.shape[:2] + (self.features,), dtype=jnp.float32)
            for i in range(k):
                y = y + jnp.einsum(
                    "btc,cf->btf",
                    taps[i].astype(self.dtype),
                    kernel[i].astype(self.dtype),
                    preferred_element_type=jnp.float32,
                )
        return (y + bias).astype(self.dtype)


class Dense1x1(nn.Module):
    """1x1 conv == position-wise dense, fp32 accumulation."""

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        y = jnp.einsum(
            "btc,cf->btf",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y.astype(self.dtype)


class ResidualBlock(nn.Module):
    """Gated unit: z = tanh(Wf*x + Vf.c) * sigmoid(Wg*x + Vg.c); 1x1 to
    residual (add) and 1x1 to skip (SURVEY.md §A.2)."""

    residual_channels: int
    gate_channels: int
    skip_channels: int
    kernel_size: int
    dilation: int
    dtype: Any = jnp.float32
    fold_taps: bool = False

    @nn.compact
    def __call__(self, x, c):
        # single conv producing both filter and gate halves
        h = CausalDilatedConv(
            self.gate_channels, self.kernel_size, self.dilation,
            dtype=self.dtype, fold_taps=self.fold_taps, name="conv",
        )(x)
        hc = Dense1x1(self.gate_channels, dtype=self.dtype, use_bias=False,
                      name="cond")(c)
        h = h + hc
        half = self.gate_channels // 2
        z = jnp.tanh(h[..., :half]) * jax.nn.sigmoid(h[..., half:])
        res = Dense1x1(self.residual_channels, dtype=self.dtype, name="res")(z)
        skip = Dense1x1(self.skip_channels, dtype=self.dtype, name="skip")(z)
        return x + res, skip


class RepeatSmoothStage(nn.Module):
    """repeat(f) + SAME conv(kernel 2f+1), computed WITHOUT materializing
    the repeat: the repeated signal is piecewise-constant over f-sample
    runs, so each of the f output phases sees at most 3 distinct frame
    values — output[i*f + p] = sum_m A[p, m] @ c[i + m], m in {-1, 0, 1},
    with A[p, m] = sum of the conv taps j that land in frame i + m
    ((p - f + j) // f == m). One (B, F, 3C) @ (3C, f*C) MXU matmul per
    stage replaces the (2f+1)-tap sample-rate conv: ~(2f+1)/3 fewer FLOPs
    and no small-feature conv lowering — measured 2.8 ms -> sub-ms of the
    B=8 shallow train step (the round-3 training-throughput fix).

    The parameter tree (kernel (2f+1, C, C), bias (C,)) is IDENTICAL to
    the nn.Conv this replaces — old checkpoints load unchanged; outputs
    agree to fp32 regrouping tolerance (weights are summed before the
    product instead of after; unit-tested against nn.Conv)."""

    factor: int
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        f, ch = self.factor, self.channels
        k = 2 * f + 1
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, c.shape[-1], ch))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        # A[m, p] = sum_{j : (p - f + j) // f == m} kernel[j]  (trace-time
        # scatter over at most (2f+1)*f terms — weight-space only)
        w2 = jnp.zeros((3, f, c.shape[-1], ch), kernel.dtype)
        for p in range(f):
            for j in range(k):
                m = (p - f + j) // f
                w2 = w2.at[m + 1, p].add(kernel[j])
        # (3C, f*C): neighbor frames concat on the contraction axis
        w2 = jnp.transpose(w2, (0, 2, 1, 3)).reshape(3 * c.shape[-1], f * ch)
        cp = jnp.pad(c, ((0, 0), (1, 1), (0, 0)))   # conv SAME zero pad
        nb = jnp.concatenate([cp[:, :-2], cp[:, 1:-1], cp[:, 2:]], axis=-1)
        y = jnp.einsum("bfc,cd->bfd", nb.astype(self.dtype),
                       w2.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        b_sz, n_fr = c.shape[0], c.shape[1]
        y = y.reshape(b_sz, n_fr * f, ch) + bias
        return y.astype(self.dtype)


class ConditioningUpsampler(nn.Module):
    """Frame-rate features -> sample-rate conditioning.

    1x1 input projection, then per-stage nearest-neighbour repeat + SAME
    smoothing conv (kernel 2f+1), each stage computed in the collapsed
    phase-matmul form (RepeatSmoothStage). Non-causal on purpose: frame
    features are fully known ahead of AR generation, so lookahead is free
    (the reference family's transposed-conv upsampler is likewise
    bidirectional).
    """

    factors: tuple[int, ...]
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c, valid=None):
        """valid: optional (B,) int32 per-row count of VALID input frames.
        Positions beyond a row's valid length are zeroed after every stage,
        which reproduces bit-for-bit the implicit SAME-conv zero padding of
        an input that truly ends there (every op is linear per position, so
        zeros in == the array-boundary zeros of the shorter input). This is
        what lets a FIXED-shape pooled program synthesize per-row
        variable-length stream tails exactly (models/streaming.StreamPool)."""

        def mask(x, rate):
            if valid is None:
                return x
            pos = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :, None]
            return jnp.where(pos < (valid * rate)[:, None, None], x,
                             jnp.zeros((), x.dtype))

        c = Dense1x1(self.channels, dtype=self.dtype, name="proj")(c)
        c = mask(jax.nn.leaky_relu(c, 0.1), 1)
        rate = 1
        for si, f in enumerate(self.factors):
            c = RepeatSmoothStage(f, self.channels, dtype=self.dtype,
                                  name=f"smooth{si}")(c)
            rate *= f
            c = mask(jax.nn.leaky_relu(c, 0.1), rate)
        return c


class WaveNet(nn.Module):
    """Shallow/deep WaveNet vocoder (component C6 + heads C7).

    __call__(x_prev, cond, speaker) -> head outputs (B, T, out_dim):
      x_prev : (B, T)  previous waveform samples (continuous, in [-1, 1])
               — for the softmax head these are int32 mu-law class ids
      cond   : (B, F, aux) frame features with F * prod(upsample_factors)
               >= T + 1; conditioning for predicting x[t] is c_up[t], and
               since x_prev is x shifted right by one, position i uses
               c_up[i + 1]
      speaker: (B,) int32 ids (ignored unless cfg.n_speakers > 0)

    out_dim = quantize_channels (softmax) or 2 (Laplacian mu, log b).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg.compute_dtype)
        self._dt = dt
        self.upsampler = ConditioningUpsampler(
            cfg.upsample_factors, cfg.cond_channels, dtype=dt
        )
        if cfg.n_speakers > 0:
            self.speaker_embed = nn.Embed(cfg.n_speakers, cfg.cond_channels)
        if cfg.head == "softmax":
            self.input_embed = nn.Embed(
                cfg.quantize_channels, cfg.residual_channels
            )
        else:
            self.input_proj = Dense1x1(cfg.residual_channels, dtype=dt)
        self.layers = [
            ResidualBlock(
                cfg.residual_channels, cfg.gate_channels, cfg.skip_channels,
                cfg.kernel_size, d, dtype=dt, fold_taps=cfg.fold_taps,
                name=f"layer{li}",
            )
            for li, d in enumerate(cfg.dilations)
        ]
        self.head1 = Dense1x1(cfg.skip_channels, dtype=dt)
        out_dim = cfg.quantize_channels if cfg.head == "softmax" else 2
        # zero-init final head: CE starts exactly at ln(Q), Laplace NLL at
        # ln(2) + E|x| — avoids the large-logit init from the unnormalized
        # skip sum over many layers
        self.head2 = Dense1x1(out_dim, dtype=jnp.float32,
                              kernel_init=nn.initializers.zeros)

    def __call__(self, x_prev, cond, speaker=None):
        cfg = self.cfg
        t = x_prev.shape[1]
        c_up = self.upsample_cond(cond, speaker)
        # align conditioning: position i predicts x[i+1] and uses c_up[i+1]
        c_up = jax.lax.dynamic_slice_in_dim(c_up, 1, t, axis=1).astype(self._dt)
        return self.stack(x_prev, c_up)

    def stack(self, x_prev, c_up):
        """Conv stack + head over inputs already aligned at sample rate."""
        cfg = self.cfg
        if cfg.head == "softmax":
            h = self.input_embed(x_prev).astype(self._dt)
        else:
            h = self.input_proj(x_prev[..., None])

        skips = jnp.zeros(h.shape[:2] + (cfg.skip_channels,), dtype=jnp.float32)
        for layer in self.layers:
            h, s = layer(h, c_up)
            skips = skips + s.astype(jnp.float32)

        out = jax.nn.relu(skips.astype(self._dt))
        out = self.head1(out)
        out = jax.nn.relu(out)
        out = self.head2(out)
        return out.astype(jnp.float32)

    def upsample_cond(self, cond, speaker=None, valid_frames=None):
        """Sample-rate conditioning (precomputed before AR generation).
        valid_frames: optional (B,) per-row valid input-frame counts — rows
        are upsampled as if each ended at its own length (exact end edge),
        with positions beyond it zeroed (see ConditioningUpsampler)."""
        cfg = self.cfg
        c_up = self.upsampler(cond, valid_frames)
        if cfg.n_speakers > 0:
            if speaker is None:
                raise ValueError("speaker ids required when n_speakers > 0")
            emb = self.speaker_embed(speaker)
            c_up = c_up + emb[:, None, :].astype(self._dt)
            if valid_frames is not None:
                hop = int(np.prod(cfg.upsample_factors))
                pos = jnp.arange(c_up.shape[1], dtype=jnp.int32)[None, :, None]
                c_up = jnp.where(pos < (valid_frames * hop)[:, None, None],
                                 c_up, jnp.zeros((), c_up.dtype))
        return c_up.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Plain-parameter extraction for the AR generation paths
# ---------------------------------------------------------------------------

def extract_plain_params(variables, cfg: ModelConfig) -> dict:
    """Flatten Flax variables into stacked arrays for the scan/Pallas AR step.

    All residual layers share shapes, so per-layer weights stack into one
    leading `L` axis — the layer loop becomes a lax.scan (and a VMEM-resident
    weight block in the Pallas kernel). Returns float32 arrays:

      conv_w   (L, k, R, G)    dilated conv taps
      conv_b   (L, G)
      cond_w   (L, C, G)       conditioning 1x1 (no bias)
      res_w    (L, G/2, R), res_b (L, R)
      skip_w   (L, G/2, S), skip_b (L, S)
      input_*  embedding (Q, R) or projection (1, R) + bias (R,)
      head1_w  (S, S), head1_b (S,), head2_w (S, O), head2_b (O,)
    """
    p = variables["params"]
    n_layers = len(cfg.dilations)
    out = {
        "conv_w": jnp.stack([p[f"layer{i}"]["conv"]["kernel"] for i in range(n_layers)]),
        "conv_b": jnp.stack([p[f"layer{i}"]["conv"]["bias"] for i in range(n_layers)]),
        "cond_w": jnp.stack([p[f"layer{i}"]["cond"]["kernel"] for i in range(n_layers)]),
        "res_w": jnp.stack([p[f"layer{i}"]["res"]["kernel"] for i in range(n_layers)]),
        "res_b": jnp.stack([p[f"layer{i}"]["res"]["bias"] for i in range(n_layers)]),
        "skip_w": jnp.stack([p[f"layer{i}"]["skip"]["kernel"] for i in range(n_layers)]),
        "skip_b": jnp.stack([p[f"layer{i}"]["skip"]["bias"] for i in range(n_layers)]),
        "head1_w": p["head1"]["kernel"],
        "head1_b": p["head1"]["bias"],
        "head2_w": p["head2"]["kernel"],
        "head2_b": p["head2"]["bias"],
    }
    if cfg.head == "softmax":
        out["input_embed"] = p["input_embed"]["embedding"]
    else:
        out["input_w"] = p["input_proj"]["kernel"]
        out["input_b"] = p["input_proj"]["bias"]
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), out)


def dilations_array(cfg: ModelConfig) -> np.ndarray:
    return np.asarray(cfg.dilations, dtype=np.int32)
