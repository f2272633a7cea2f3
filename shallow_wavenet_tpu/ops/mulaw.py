"""mu-law companding codec (component C9; SURVEY.md §A.1).

encode: f(x) = sign(x) * ln(1 + mu|x|) / ln(1 + mu), mu = 255, x in [-1, 1];
quantize to `channels` uniform bins. decode: inverse + bin-centre
de-quantization. All functions are jit-safe and dtype-polymorphic.
"""

from __future__ import annotations

import jax.numpy as jnp


def mulaw_encode(x, mu: int = 255):
    """Compand x in [-1, 1] to [-1, 1] with mu-law."""
    x = jnp.asarray(x)
    mu = jnp.asarray(mu, x.dtype)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def mulaw_decode(y, mu: int = 255):
    """Inverse of mulaw_encode."""
    mu = jnp.asarray(mu, y.dtype)
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


def mulaw_quantize(x, channels: int = 256):
    """x in [-1, 1] -> int32 class ids in [0, channels)."""
    y = mulaw_encode(x, channels - 1)
    # [-1, 1] -> [0, channels): floor of the affine map, clipped at the top
    q = jnp.floor((y + 1.0) * 0.5 * channels)
    return jnp.clip(q, 0, channels - 1).astype(jnp.int32)


def mulaw_dequantize(q, channels: int = 256, dtype=jnp.float32):
    """Class ids -> bin-centre waveform values in [-1, 1]."""
    y = (q.astype(dtype) + 0.5) * (2.0 / channels) - 1.0
    return mulaw_decode(y, channels - 1)
