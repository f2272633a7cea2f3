"""Ablation probe for the AR kernel: attribute per-step time to (cond
matmul, prev-tap matmul, ring-buffer traffic, res/skip matmuls, head,
sampling) by timing stripped kernel variants. NUMERICS ARE WRONG in every
ablated variant — timing only.

Usage: python tools/kprobe.py [batch] [chunk] [dtype] [preset=NAME]

preset= selects the model geometry (default shallow_laplace_single; the
deep_baseline ablations must run RESIDENT — this probe has no ring
streaming — so the feasible deep batches are the bf16 resident frontier,
B <= ~128).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from shallow_wavenet_tpu.config import get_config  # noqa: E402

_pos = [a for a in sys.argv[1:] if "=" not in a]
_kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
B = int(_pos[0]) if len(_pos) > 0 else 64
CHUNK = int(_pos[1]) if len(_pos) > 1 else 128
DT = _pos[2] if len(_pos) > 2 else "float32"
PRESET = _kw.get("preset", "shallow_laplace_single")
ONLY = _kw.get("only", "")           # comma-separated ablation filter
T = 24000
ABLATIONS = ("full", "no_cond", "no_prev", "no_buf", "no_resskip",
             "no_head", "no_sample", "matmuls_only", "cheap_gate",
             "no_gate", "unroll2", "unroll4", "split2", "gate_bf16")


def build(cfg, ablate, wdt):
    L = len(cfg.dilations)
    dil = cfg.dilations
    offs = np.concatenate([[0], np.cumsum(dil)]).astype(int)
    gp = 128
    S = cfg.skip_channels
    R = cfg.residual_channels
    sum_d = int(sum(dil))

    def kernel(cond_ref, noise_ref, in_b, conv_w, cond_wcat, res_w, skip_w,
               h1_w, h2_w, out_ref, bufs, fb_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            bufs[...] = jnp.zeros_like(bufs)
            fb_ref[...] = jnp.zeros((B, R), wdt) + in_b[:][None, :]

        cc0 = jnp.dot(cond_ref[0].astype(wdt), cond_wcat[:],
                      preferred_element_type=jnp.float32)

        def body_split2(tt, h_carry):
            """Two half-batch chains interleaved per layer: while one
            half's gate runs on the VPU, the other half's matmul can
            occupy the MXU (they are data-independent) — probing whether
            Mosaic's scheduler exploits the ILP."""
            t = i * CHUNK + tt
            hb = B // 2
            cc = jnp.dot(cond_ref[tt].astype(wdt), cond_wcat[:],
                         preferred_element_type=jnp.float32)
            hs = [h_carry[:hb], h_carry[hb:]]
            skips = [jnp.zeros((hb, S), jnp.float32) for _ in range(2)]
            for l in range(L):
                slot = offs[l] + (t & (dil[l] - 1))
                h_prev = bufs[slot]
                us = [(jnp.dot(h_prev[q * hb:(q + 1) * hb], conv_w[l, 0],
                               preferred_element_type=jnp.float32)
                       + jnp.dot(hs[q], conv_w[l, 1],
                                 preferred_element_type=jnp.float32)
                       + cc[q * hb:(q + 1) * hb, l * 2 * gp:(l + 1) * 2 * gp])
                      for q in range(2)]
                zs = [(jnp.tanh(u[:, :gp]) * jax.nn.sigmoid(u[:, gp:])
                       ).astype(wdt) for u in us]
                bufs[slot] = jnp.concatenate(hs, axis=0)
                hs = [(hs[q].astype(jnp.float32)
                       + jnp.dot(zs[q], res_w[l],
                                 preferred_element_type=jnp.float32)
                       ).astype(wdt) for q in range(2)]
                skips = [skips[q] + jnp.dot(zs[q], skip_w[l],
                                            preferred_element_type=jnp.float32)
                         for q in range(2)]
            skip = jnp.concatenate(skips, axis=0)
            o = jax.nn.relu(skip).astype(wdt)
            o = jax.nn.relu(
                jnp.dot(o, h1_w[:], preferred_element_type=jnp.float32)
            ).astype(wdt)
            o = jnp.dot(o, h2_w[:], preferred_element_type=jnp.float32)
            mu, log_b = o[:, 0], jnp.clip(o[:, 1], -9.0, 3.0)
            u_t = noise_ref[tt, :] - 0.5
            x_t = mu - jnp.exp(log_b) * jnp.sign(u_t) * jnp.log1p(
                -2.0 * jnp.abs(u_t))
            x_t = jnp.clip(x_t, -1.0, 1.0)
            out_ref[tt, :] = x_t
            return (x_t[:, None].astype(wdt) * jnp.ones((1, R), wdt)
                    + in_b[:][None, :]).astype(wdt)

        def body(tt, h_carry):
            t = i * CHUNK + tt
            h = h_carry
            if ablate in ("no_cond", "matmuls_only"):
                cc = cc0
            else:
                cc = jnp.dot(cond_ref[tt].astype(wdt), cond_wcat[:],
                             preferred_element_type=jnp.float32)
            skip = jnp.zeros((B, S), jnp.float32)
            for l in range(L):
                slot = offs[l] + (t & (dil[l] - 1))
                if ablate in ("no_buf", "matmuls_only"):
                    h_prev = h
                else:
                    h_prev = bufs[slot]
                if ablate == "no_prev":
                    u = (jnp.dot(h, conv_w[l, 1],
                                 preferred_element_type=jnp.float32)
                         + cc[:, l * 2 * gp:(l + 1) * 2 * gp])
                else:
                    u = (jnp.dot(h_prev, conv_w[l, 0],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(h, conv_w[l, 1],
                                   preferred_element_type=jnp.float32)
                         + cc[:, l * 2 * gp:(l + 1) * 2 * gp])
                if ablate == "no_gate":
                    z = u[:, :gp].astype(wdt)
                elif ablate == "cheap_gate":
                    z = (u[:, :gp] * u[:, gp:]).astype(wdt)
                elif ablate == "gate_bf16":
                    # transcendentals at the weight dtype (half the VPU
                    # vregs when wdt is bf16)
                    z = (jnp.tanh(u[:, :gp].astype(wdt))
                         * jax.nn.sigmoid(u[:, gp:].astype(wdt))
                         ).astype(wdt)
                else:
                    z = (jnp.tanh(u[:, :gp]) * jax.nn.sigmoid(u[:, gp:])
                         ).astype(wdt)
                if ablate not in ("no_buf", "matmuls_only"):
                    bufs[slot] = h
                if ablate == "no_resskip":
                    h = (h.astype(jnp.float32) + z[:, :R].astype(jnp.float32)
                         ).astype(wdt)
                    skip = skip + z[:, :S].astype(jnp.float32)
                else:
                    h = (h.astype(jnp.float32)
                         + jnp.dot(z, res_w[l],
                                   preferred_element_type=jnp.float32)
                         ).astype(wdt)
                    skip = skip + jnp.dot(z, skip_w[l],
                                          preferred_element_type=jnp.float32)

            if ablate == "no_head":
                x_t = jnp.sum(skip[:, :2], axis=-1)
                log_b = x_t
                mu = x_t
            else:
                o = jax.nn.relu(skip).astype(wdt)
                o = jax.nn.relu(
                    jnp.dot(o, h1_w[:], preferred_element_type=jnp.float32)
                ).astype(wdt)
                o = jnp.dot(o, h2_w[:], preferred_element_type=jnp.float32)
                mu, log_b = o[:, 0], jnp.clip(o[:, 1], -9.0, 3.0)
            if ablate in ("no_sample", "matmuls_only"):
                x_t = mu
            else:
                u_t = noise_ref[tt, :] - 0.5
                x_t = mu - jnp.exp(log_b) * jnp.sign(u_t) * jnp.log1p(
                    -2.0 * jnp.abs(u_t))
            x_t = jnp.clip(x_t, -1.0, 1.0)
            out_ref[tt, :] = x_t
            return (x_t[:, None].astype(wdt) * jnp.ones((1, R), wdt)
                    + in_b[:][None, :]).astype(wdt)

        if ablate == "split2":
            def bodyk2(j, h):
                for q in range(4):       # match unroll4's loop overhead
                    h = body_split2(j * 4 + q, h)
                return h

            fb_ref[...] = jax.lax.fori_loop(0, CHUNK // 4, bodyk2,
                                            fb_ref[...])
        elif ablate in ("unroll2", "unroll4"):
            k = 2 if ablate == "unroll2" else 4

            def bodyk(j, h):
                for q in range(k):
                    h = body(j * k + q, h)
                return h

            fb_ref[...] = jax.lax.fori_loop(0, CHUNK // k, bodyk, fb_ref[...])
        else:
            fb_ref[...] = jax.lax.fori_loop(0, CHUNK, body, fb_ref[...])

    return kernel, sum_d


def run(ablate):
    cfg = get_config(PRESET).model
    wdt = jnp.bfloat16 if DT == "bfloat16" else jnp.float32
    L = len(cfg.dilations)
    R, S, C = cfg.residual_channels, cfg.skip_channels, cfg.cond_channels
    gp = 128
    rng = np.random.default_rng(0)
    kernel, sum_d = build(cfg, ablate, wdt)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, wdt)

    weights = (mk(R), mk(L, 2, R, 2 * gp), mk(C, L * 2 * gp),
               mk(L, gp, R), mk(L, gp, S), mk(S, S), mk(S, 2))
    n_chunks = T // CHUNK
    cond = jnp.asarray(rng.standard_normal((T, B, C)), jnp.float32)
    noise = jnp.asarray(rng.uniform(0.01, 0.99, (T, B)), jnp.float32)

    def wspec(w):
        nd = w.ndim
        return pl.BlockSpec(w.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((CHUNK, B, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(w) for w in weights],
        out_specs=pl.BlockSpec((CHUNK, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sum_d, B, R), wdt),
                        pltpu.VMEM((B, R), wdt)],
        # the production kernel's physical-VMEM lift (ar_kernel.py); the
        # deep config's resident rings blow the default 16 MB gate
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    f = jax.jit(lambda c, n: call(c, n, *weights))
    out = f(cond, noise)
    np.asarray(out[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(cond, noise)[0])
        best = min(best, time.time() - t0)
    # the grid executes whole chunks only
    steps = (T // CHUNK) * CHUNK
    return best / steps * 1e6


def main():
    print(f"preset={PRESET} B={B} chunk={CHUNK} dtype={DT} "
          f"device={jax.devices()}")
    base = None
    abls = ([a for a in ONLY.split(",") if a] if ONLY else ABLATIONS)
    for ab in abls:
        try:
            us = run(ab)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:100]
            print(f"{ab:14s} FAILED: {msg}")
            continue
        if ab == "full":
            base = us
            print(f"{ab:14s} {us:6.2f} us/step")
        elif base is None:          # 'full' failed — no baseline to diff
            print(f"{ab:14s} {us:6.2f} us/step")
        else:
            print(f"{ab:14s} {us:6.2f} us/step  (saves {base - us:+5.2f})")


if __name__ == "__main__":
    main()
