"""PyTorch mini-reference of the WaveNet forward (SURVEY.md §4.1).

A functional torch implementation that consumes the *flax* parameter tree,
standing in for the unmountable PyTorch reference: it checks the JAX model's
conv/gate/head math against torch.nn.functional on CPU. Keep in exact sync
with shallow_wavenet_tpu/models/wavenet.py.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def causal_conv(x, kernel, bias, dilation):
    """x (B, T, C); kernel (k, C, Fo) flax layout -> torch conv1d."""
    k = kernel.shape[0]
    w = _t(kernel).permute(2, 1, 0)  # (Fo, C, k); torch tap i == flax tap i
    pad = (k - 1) * dilation
    xt = _t(x).permute(0, 2, 1)  # (B, C, T)
    y = F.conv1d(F.pad(xt, (pad, 0)), w, _t(bias), dilation=dilation)
    return y.permute(0, 2, 1).numpy()


def dense(x, kernel, bias=None):
    y = _t(x) @ _t(kernel)
    if bias is not None:
        y = y + _t(bias)
    return y.numpy()


def same_conv(x, kernel, bias):
    """flax nn.Conv SAME padding, stride 1, odd kernel width."""
    k = kernel.shape[0]
    w = _t(kernel).permute(2, 1, 0)
    xt = _t(x).permute(0, 2, 1)
    y = F.conv1d(xt, w, _t(bias), padding=k // 2)
    return y.permute(0, 2, 1).numpy()


def leaky_relu(x, slope=0.1):
    return np.where(x >= 0, x, slope * x)


def upsample_cond(params, cfg, cond, speaker=None):
    up = params["upsampler"]
    c = dense(cond, up["proj"]["kernel"], up["proj"]["bias"])
    c = leaky_relu(c)
    for si, f in enumerate(cfg.upsample_factors):
        c = np.repeat(c, f, axis=1)
        sm = up[f"smooth{si}"]
        c = same_conv(c, sm["kernel"], sm["bias"])
        c = leaky_relu(c)
    if cfg.n_speakers > 0:
        emb = np.asarray(params["speaker_embed"]["embedding"])[np.asarray(speaker)]
        c = c + emb[:, None, :]
    return c


def forward(params, cfg, x_prev, cond, speaker=None):
    """Mirror of WaveNet.__call__ in float32. params = flax variables['params']."""
    t = x_prev.shape[1]
    c_up = upsample_cond(params, cfg, cond, speaker)[:, 1 : t + 1]

    if cfg.head == "softmax":
        h = np.asarray(params["input_embed"]["embedding"])[np.asarray(x_prev)]
    else:
        h = dense(x_prev[..., None], params["input_proj"]["kernel"],
                  params["input_proj"]["bias"])

    skips = 0.0
    for li, d in enumerate(cfg.dilations):
        lp = params[f"layer{li}"]
        g = causal_conv(h, lp["conv"]["kernel"], lp["conv"]["bias"], d)
        g = g + dense(c_up, lp["cond"]["kernel"])
        half = g.shape[-1] // 2
        z = np.tanh(g[..., :half]) * (1.0 / (1.0 + np.exp(-g[..., half:])))
        h = h + dense(z, lp["res"]["kernel"], lp["res"]["bias"])
        skips = skips + dense(z, lp["skip"]["kernel"], lp["skip"]["bias"])

    out = np.maximum(skips, 0.0)
    out = dense(out, params["head1"]["kernel"], params["head1"]["bias"])
    out = np.maximum(out, 0.0)
    out = dense(out, params["head2"]["kernel"], params["head2"]["bias"])
    return out
