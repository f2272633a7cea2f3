"""Output heads: losses + sampling (component C7; SURVEY.md §A.3).

(a) softmax head: 256-way categorical over 8-bit mu-law classes, CE loss,
    categorical sampling.
(b) Laplacian head: (mu, log b); NLL = log(2b) + |x - mu| / b; sampling via
    inverse CDF x = mu - b * sign(u) * ln(1 - 2|u|), u ~ U(-1/2, 1/2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_loss(logits, target_ids, mask=None):
    """Mean CE in nats. logits (B, T, Q), target_ids (B, T) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, mask)


def laplace_loss(out, target, log_b_min=-9.0, log_b_max=3.0, mask=None):
    """Mean Laplacian NLL. out (B, T, 2) = (mu, log b), target (B, T)."""
    mu, log_b = out[..., 0], jnp.clip(out[..., 1], log_b_min, log_b_max)
    nll = jnp.log(2.0) + log_b + jnp.abs(target - mu) * jnp.exp(-log_b)
    return _masked_mean(nll, mask)


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    # broadcast first so a (1, T) mask counts every batch row it covers
    mask = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sample_softmax(logits, key):
    """Categorical sample of class ids; logits (..., Q) -> (...) int32."""
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_laplace(out, key, log_b_min=-9.0, log_b_max=3.0):
    """Laplace inverse-CDF sample; out (..., 2) -> (...) float32."""
    mu, log_b = out[..., 0], jnp.clip(out[..., 1], log_b_min, log_b_max)
    b = jnp.exp(log_b)
    # u in (-1/2, 1/2); nudge away from the endpoints for a finite log
    u = jax.random.uniform(
        key, mu.shape, minval=-0.5 + 1e-7, maxval=0.5 - 1e-7
    )
    return mu - b * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))


def laplace_from_uniform(out, u, log_b_min=-9.0, log_b_max=3.0):
    """Same inverse CDF from externally supplied u in (-1/2, 1/2) — used by
    the Pallas kernel (counter-based in-kernel RNG) and the fast-vs-naive
    equivalence test, which must share the exact noise stream."""
    mu, log_b = out[..., 0], jnp.clip(out[..., 1], log_b_min, log_b_max)
    return mu - jnp.exp(log_b) * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))


def categorical_from_uniform(logits, u):
    """Inverse-CDF categorical sampling from ONE uniform per draw:
    id = #{q : cdf(q) < u}. logits (..., Q), u (...) in (0, 1).

    This is the sampler the Pallas AR kernel uses in-kernel (a single
    uniform per step instead of Q Gumbels); the scan/naive paths call the
    same function so all three backends share one noise stream.
    """
    q = logits.shape[-1]
    p = jax.nn.softmax(logits, axis=-1)
    # cdf via upper-triangular matmul — the exact op the Pallas kernel uses
    # (cumsum has no Mosaic lowering), so both paths share fp behaviour and
    # the equivalence tests can compare exactly
    tri = (jax.lax.broadcasted_iota(jnp.int32, (q, q), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (q, q), 1)).astype(p.dtype)
    cdf = jnp.dot(p, tri, preferred_element_type=p.dtype)
    ids = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    return jnp.clip(ids, 0, q - 1)
