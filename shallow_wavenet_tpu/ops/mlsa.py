"""MLSA filter — Mel Log Spectrum Approximation digital filter
(SURVEY.md §A.4; replaces SPTK's C `mlsadf`, component C13/§2.3).

Realizes H(z) = exp sum_m c(m) Phi_m(z~) with the all-pass
z~^{-1} = (z^{-1}-a)/(1-a z^{-1}) via the [L/L] Pade approximation of exp:

  exp(F) ~= P(F)/P(-F),  P(w) = sum_l A_l w^l
  t_l = F^l v (cascaded basic filters), v = x - sum_l A_l (-F)^l v,
  y = sum_l A_l t_l

where the basic filter F(z) = sum_{m=1..M} b(m) Phi_m(z), b = mc2b(c, a),
is strictly causal (one-sample delay), so the feedback loop is realizable.
Pre-emphasis uses coefficients -beta*c_bar, restoration (de-emphasis) the
inverse filter (+beta*c_bar) — the two cancel up to Pade error.

Two implementations, cross-checked in tests:
- `mlsa_filter`: jax.lax.scan over samples (runs anywhere, jittable);
- native C++ (native/mlsa.cc, via ctypes in utils/native.py): the CPU
  data-prep fast path, mirroring the reference's native SPTK dependency.

Note: standard Pade coefficients of exp (L=4: 1, 1/2, 3/28, 1/84, 1/1680)
rather than SPTK's slightly stability-tweaked table; for |F| in the noise-
shaping range the roundtrip error is << the 16-bit noise floor (tested).
"""

from __future__ import annotations

import functools
from math import factorial

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def pade_coefficients(order: int) -> tuple[float, ...]:
    """A_l of the [L/L] Pade approximant of exp at 0, l = 0..L."""
    return tuple(
        factorial(2 * order - l) * factorial(order)
        / (factorial(2 * order) * factorial(l) * factorial(order - l))
        for l in range(order + 1)
    )


def mc2b(mc, alpha: float):
    """Mel-cepstrum -> MLSA filter coefficients: b[M]=c[M];
    b[m] = c[m] - alpha*b[m+1] (SPTK mc2b)."""
    mc = jnp.asarray(mc)
    m = mc.shape[-1]

    def step(b_next, c_m):
        b_m = c_m - alpha * b_next
        return b_m, b_m

    _, bs = jax.lax.scan(step, jnp.zeros(mc.shape[:-1], mc.dtype),
                         jnp.moveaxis(mc, -1, 0), reverse=True)
    return jnp.moveaxis(bs, 0, -1)


def _basic_filter_step(e, u_prev, b1_to_m, alpha):
    """One time-step of F(z): update all-pass chain states e (M,) given the
    chain input one sample ago; returns (e_new, F_out)."""
    m = e.shape[-1]
    aa = 1.0 - alpha * alpha
    e_new = [aa * u_prev + alpha * e[0]]
    for j in range(1, m):
        e_new.append(-alpha * e_new[j - 1] + e[j - 1] + alpha * e[j])
    e_new = jnp.stack(e_new, axis=-1)
    return e_new, e_new @ b1_to_m


@functools.partial(jax.jit,
                   static_argnames=("alpha", "pade_order", "inverse"))
def mlsa_filter(x, b, alpha: float, pade_order: int = 5,
                inverse: bool = False):
    """Filter waveform x (T,) through exp(b0 + F(z)) (or its inverse).

    b: (M+1,) mc2b coefficients. Returns (T,) float32.
    """
    b = jnp.asarray(b, jnp.float32)
    if inverse:
        b = -b
    gain = jnp.exp(b[0])
    b_rest = b[1:]
    pade = pade_coefficients(pade_order)
    L = pade_order
    m = b_rest.shape[0]

    e0 = jnp.zeros((L, m), jnp.float32)   # per-chain all-pass states
    u0 = jnp.zeros((L,), jnp.float32)     # per-chain previous input

    alpha_f = float(alpha)

    def step(carry, x_t):
        e, u_prev = carry
        e_new, t = jax.vmap(
            lambda ei, ui: _basic_filter_step(ei, ui, b_rest, alpha_f)
        )(e, u_prev)
        # v = x + sum_l A_l (-1)^{l+1} t_l ; y = v + sum_l A_l t_l
        signs = jnp.asarray([(-1.0) ** (l + 1) for l in range(1, L + 1)],
                            jnp.float32)
        coef = jnp.asarray(pade[1:], jnp.float32)
        v = x_t + jnp.sum(coef * signs * t)
        y = v + jnp.sum(coef * t)
        u_next = jnp.concatenate([v[None], t[:-1]])
        return (e_new, u_next), y

    (_, _), y = jax.lax.scan(step, (e0, u0), jnp.asarray(x, jnp.float32))
    return gain * y


@functools.partial(jax.jit, static_argnames=("alpha", "pade_order", "hop"))
def mlsa_filter_tv(x, b_frames, alpha: float, hop: int,
                   pade_order: int = 5):
    """Time-VARYING MLSA synthesis filter: per-frame mc2b coefficients
    b_frames (n_frames, M+1), held constant within each hop (the classic
    MLSA vocoder's frame-rate coefficient update; SPTK mlsadf's `-P` use).
    This is the synthesis half of the WORLD/SPTK equivalent (component
    C12): excitation -> exp(mel log envelope) -> waveform. Returns (T,)
    with T = len(x)."""
    t_len = x.shape[0]
    b_t = jnp.repeat(jnp.asarray(b_frames, jnp.float32), hop, axis=0)
    if b_t.shape[0] < t_len:
        b_t = jnp.pad(b_t, ((0, t_len - b_t.shape[0]), (0, 0)), mode="edge")
    b_t = b_t[:t_len]
    pade = pade_coefficients(pade_order)
    L = pade_order
    m = b_frames.shape[-1] - 1
    alpha_f = float(alpha)

    e0 = jnp.zeros((L, m), jnp.float32)
    u0 = jnp.zeros((L,), jnp.float32)
    signs = jnp.asarray([(-1.0) ** (l + 1) for l in range(1, L + 1)],
                        jnp.float32)
    coef = jnp.asarray(pade[1:], jnp.float32)

    def step(carry, xs):
        x_t, bt = xs
        e, u_prev = carry
        e_new, t = jax.vmap(
            lambda ei, ui: _basic_filter_step(ei, ui, bt[1:], alpha_f)
        )(e, u_prev)
        v = x_t + jnp.sum(coef * signs * t)
        y = v + jnp.sum(coef * t)
        u_next = jnp.concatenate([v[None], t[:-1]])
        return (e_new, u_next), jnp.exp(bt[0]) * y

    (_, _), y = jax.lax.scan(step, (e0, u0),
                             (jnp.asarray(x, jnp.float32), b_t))
    return y
