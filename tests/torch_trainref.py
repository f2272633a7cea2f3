"""Trainable PyTorch twin of the WaveNet TRAINING step (SURVEY.md §4.1).

While tests/torch_miniref.py checks the *forward* math functionally, this
module is an end-to-end autograd twin: it consumes the flax-initialized
parameter tree, runs the identical teacher-forced loss, and optimizes with
torch.optim.Adam + clip_grad_norm_ — the reference's training recipe
(SURVEY.md §3.3, component C11: "CE or Laplace NLL, Adam"). The
training-trajectory parity test (tests/test_train_parity_torch.py) runs N
optimizer steps in both frameworks from the same init on the same batches
and asserts the loss curves track — the executable stand-in for
BASELINE.json's "training matches the reference PyTorch loss curves" while
/root/reference stays unmountable (SURVEY.md §0).

Keep in exact sync with shallow_wavenet_tpu/models/wavenet.py and
training/trainer.py (fp32 path).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def params_to_torch(params) -> dict:
    """Flax param pytree -> same-nested dict of torch Parameters."""
    if isinstance(params, dict):
        return {k: params_to_torch(v) for k, v in params.items()}
    t = torch.from_numpy(np.array(params, dtype=np.float32, copy=True))
    return torch.nn.Parameter(t)


def flat_params(tp) -> list:
    if isinstance(tp, dict):
        out = []
        for k in sorted(tp):
            out.extend(flat_params(tp[k]))
        return out
    return [tp]


def _dense(x, node, bias=True):
    y = x @ node["kernel"]
    return y + node["bias"] if bias else y


def _causal_conv(x, node, dilation):
    """x (B, T, C); flax kernel (k, C, Fo); left-pad (k-1)*d."""
    kern = node["kernel"]
    k = kern.shape[0]
    w = kern.permute(2, 1, 0)  # (Fo, C, k)
    pad = (k - 1) * dilation
    xt = x.permute(0, 2, 1)
    y = F.conv1d(F.pad(xt, (pad, 0)), w, node["bias"], dilation=dilation)
    return y.permute(0, 2, 1)


def _same_conv(x, node):
    """flax nn.Conv SAME padding, odd kernel."""
    kern = node["kernel"]
    w = kern.permute(2, 1, 0)
    xt = x.permute(0, 2, 1)
    y = F.conv1d(xt, w, node["bias"], padding=kern.shape[0] // 2)
    return y.permute(0, 2, 1)


def upsample_cond(tp, cfg, cond, speaker=None):
    up = tp["upsampler"]
    c = F.leaky_relu(_dense(cond, up["proj"]), 0.1)
    for si, f in enumerate(cfg.upsample_factors):
        c = torch.repeat_interleave(c, f, dim=1)
        c = F.leaky_relu(_same_conv(c, up[f"smooth{si}"]), 0.1)
    if cfg.n_speakers > 0:
        c = c + tp["speaker_embed"]["embedding"][speaker][:, None, :]
    return c


def forward(tp, cfg, x_prev, cond, speaker=None):
    """Teacher-forced forward == WaveNet.__call__ (fp32)."""
    t = x_prev.shape[1]
    c_up = upsample_cond(tp, cfg, cond, speaker)[:, 1 : t + 1]
    if cfg.head == "softmax":
        h = tp["input_embed"]["embedding"][x_prev]
    else:
        h = _dense(x_prev[..., None], tp["input_proj"])
    half = cfg.gate_channels // 2
    skips = 0.0
    for li in range(len(cfg.dilations)):
        lp = tp[f"layer{li}"]
        u = _causal_conv(h, lp["conv"], cfg.dilations[li])
        u = u + _dense(c_up, lp["cond"], bias=False)
        z = torch.tanh(u[..., :half]) * torch.sigmoid(u[..., half:])
        h = h + _dense(z, lp["res"])
        skips = skips + _dense(z, lp["skip"])
    out = F.relu(skips)
    out = F.relu(_dense(out, tp["head1"]))
    return _dense(out, tp["head2"])


def loss_fn(tp, cfg, seg_len, x, cond, speaker=None,
            quantize=None):
    """== Trainer._loss_fn: shift, forward, mask to the segment tail."""
    if cfg.head == "softmax":
        assert quantize is not None, \
            "softmax head needs the mu-law quantize callable"
        q = quantize(x)
        x_in, target = q[:, :-1], q[:, 1:]
    else:
        x_in, target = x[:, :-1], x[:, 1:]
    out = forward(tp, cfg, x_in, cond, speaker)
    t = x_in.shape[1]
    mask = (torch.arange(t) >= (t - seg_len)).float()[None, :]
    if cfg.head == "softmax":
        logp = F.log_softmax(out, dim=-1)
        nll = -torch.gather(logp, -1, target[..., None].long())[..., 0]
    else:
        mu = out[..., 0]
        log_b = torch.clamp(out[..., 1], cfg.log_b_min, cfg.log_b_max)
        nll = np.log(2.0) + log_b + (target - mu).abs() * torch.exp(-log_b)
    mask = mask.expand_as(nll)
    return (nll * mask).sum() / mask.sum().clamp(min=1.0)


@torch.no_grad()
def generate_fast_torch(tp, cfg, c_up, noise) -> np.ndarray:
    """Queue-cached AR decoder — the torch twin of
    models/generate.generate_fast with an explicit shared noise stream
    (fast-WaveNet per-layer ring buffers; O(layers) per output sample).
    c_up (B, T, C) torch tensor from upsample_cond; noise (B, T) uniforms
    in (0, 1). Returns (B, T) float32 numpy. With identical params and
    noise this tracks the JAX decoder to fp32 tolerance — the decoder half
    of the converged-quality parity harness
    (tests/test_convergence_parity_torch.py)."""
    B, T, _ = c_up.shape
    L = len(cfg.dilations)
    D = int(max(cfg.dilations))
    R = cfg.residual_channels
    half = cfg.gate_channels // 2
    bufs = torch.zeros(L, B, D, R)
    layers = []
    for li in range(L):
        lp = tp[f"layer{li}"]
        layers.append((lp["conv"]["kernel"], lp["conv"]["bias"],
                       lp["cond"]["kernel"], lp["res"]["kernel"],
                       lp["res"]["bias"], lp["skip"]["kernel"],
                       lp["skip"]["bias"], cfg.dilations[li]))
    if cfg.head == "softmax":
        from shallow_wavenet_tpu.ops.mulaw import mulaw_quantize

        x_prev = torch.full((B,), int(np.asarray(
            mulaw_quantize(0.0, cfg.quantize_channels))), dtype=torch.long)
    else:
        x_prev = torch.zeros(B)
    wav = torch.zeros(B, T)
    for t in range(T):
        c_t = c_up[:, t]
        if cfg.head == "softmax":
            h = tp["input_embed"]["embedding"][x_prev]
        else:
            h = x_prev[:, None] @ tp["input_proj"]["kernel"] \
                + tp["input_proj"]["bias"]
        skip = torch.zeros(B, cfg.skip_channels)
        for li, (cw, cb, vw, rw, rb, sw, sb, d) in enumerate(layers):
            h_prev = bufs[li, :, (t - d) % D]
            u = (h_prev @ cw[0] + h @ cw[1]) + cb + c_t @ vw
            z = torch.tanh(u[:, :half]) * torch.sigmoid(u[:, half:])
            bufs[li, :, t % D] = h
            h = h + (z @ rw + rb)
            skip = skip + (z @ sw + sb)
        o = F.relu(skip)
        o = F.relu(o @ tp["head1"]["kernel"] + tp["head1"]["bias"])
        o = o @ tp["head2"]["kernel"] + tp["head2"]["bias"]
        if cfg.head == "softmax":
            from shallow_wavenet_tpu.ops.mulaw import mulaw_dequantize

            p = torch.softmax(o, dim=-1)
            cdf = torch.cumsum(p, dim=-1)
            ids = (cdf < noise[:, t, None]).sum(dim=-1).clamp(
                0, cfg.quantize_channels - 1)
            wav[:, t] = torch.from_numpy(np.asarray(
                mulaw_dequantize(ids.numpy().astype(np.int32),
                                 cfg.quantize_channels)))
            x_prev = ids
        else:
            mu = o[:, 0]
            log_b = torch.clamp(o[:, 1], cfg.log_b_min, cfg.log_b_max)
            u = noise[:, t] - 0.5
            x = mu - torch.exp(log_b) * torch.sign(u) * torch.log1p(
                -2.0 * torch.abs(u))
            x = torch.clamp(x, -1.0, 1.0)
            wav[:, t] = x
            x_prev = x
    return wav.numpy()


def make_optimizer(tp, lr):
    """The twin's Adam, hyper-matched to Trainer._step_core's optax.adam."""
    return torch.optim.Adam(flat_params(tp), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8)


def train_steps(tp, cfg, seg_len, batches, lr, clip_norm,
                quantize=None, lr_schedule=None,
                step_offset: int = 0, opt=None) -> list[float]:
    """Adam + global-norm clip over the given batches; returns the per-step
    losses. Mirrors Trainer._step_core (optax.clip_by_global_norm + adam).
    lr_schedule: optional step -> lr callable mirroring the optax schedule
    (optax applies lr at the GLOBAL step count, so chunked callers pass
    step_offset); overrides `lr` when given.
    opt: the optimizer from make_optimizer. Chunked callers MUST create it
    once and pass it to every chunk — a fresh Adam per chunk zeroes the
    moments and restarts bias correction mid-run, a systematic break from
    the optax side whose state persists across all steps (ADVICE r2)."""
    if opt is None:
        opt = make_optimizer(tp, lr)
    ps = [p for g in opt.param_groups for p in g["params"]]
    losses = []
    for i, b in enumerate(batches):
        if lr_schedule is not None:
            cur = float(lr_schedule(step_offset + i))
            for g in opt.param_groups:
                g["lr"] = cur
        opt.zero_grad()
        loss = loss_fn(tp, cfg, seg_len,
                       torch.from_numpy(b["x"]),
                       torch.from_numpy(b["cond"]),
                       speaker=(torch.from_numpy(b["speaker"]).long()
                                if "speaker" in b else None),
                       quantize=quantize)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ps, clip_norm)
        opt.step()
        losses.append(float(loss.detach()))
    return losses
