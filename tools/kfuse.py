"""Timing prototype for the fused (windowed residual-expansion) AR kernel.

Idea: the production kernel's per-sample critical path is ~2 dependent MXU
ops per layer (current-tap gate matmul -> gate VPU -> fused skip/res
matmul -> residual add feeds the next layer's gate matmul). Expanding the
residual recurrence

    h_l = h_B + sum_{B<=j<l} z_j @ Wres_j        (within a block of W layers)

into the gate inputs

    u_l = h_prev_l @ W0_l + cc_l + b_l + h_B @ W1_l
          + sum_{B<=j<l} z_j @ (Wres_j @ W1_l)

lets each layer's whole on-chain work be ONE matmul: z_j multiplied by the
precomputed [P_{j,j+1..blockend} | Wres_j | Wskip_j] concat, whose output
simultaneously (a) adds the gate-input contributions of every later layer
in the block, (b) yields r_j for the residual/ring bookkeeping, (c) yields
the skip contribution. Chain length drops from 2L to L + L/W matmuls.

This tool measures step time vs the production-shaped unfused loop for
window sizes W at several batches. Numerics are algebraically equivalent in
exact arithmetic but NOT bit-exact in fp32 (different summation order).

Usage: python tools/kfuse.py [preset] [dtype] [batch,batch,...] [W,W,...]
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

PRESET = sys.argv[1] if len(sys.argv) > 1 else "shallow_laplace_single"
DT = sys.argv[2] if len(sys.argv) > 2 else "float32"
BATCHES = ([int(x) for x in sys.argv[3].split(",")]
           if len(sys.argv) > 3 else [32, 64, 96])
WINDOWS = ([int(x) for x in sys.argv[4].split(",")]
           if len(sys.argv) > 4 else [0, 2, 3, 4, 6, 12])
CHUNK = int(os.environ.get("KFUSE_CHUNK", "64"))
T = int(os.environ.get("KFUSE_T", "24000"))
# n_chunks = T // CHUNK drops a partial tail chunk, but the us/step
# normalization divides by the full T — require divisibility so the
# reported time can never be silently underestimated (ADVICE.md r1).
if T % CHUNK != 0:
    raise SystemExit(f"KFUSE_T={T} must be a multiple of KFUSE_CHUNK={CHUNK}")


def build(cfg, W, B, wdt):
    """W=0 -> production-shaped unfused loop (baseline)."""
    L = len(cfg.dilations)
    dil = cfg.dilations
    offs = np.concatenate([[0], np.cumsum(dil)]).astype(int)
    sum_d = int(sum(dil))
    R, S = cfg.residual_channels, cfg.skip_channels
    gp = 128 * (-(-(cfg.gate_channels // 2) // 128))
    blocks = ([tuple(range(b, min(b + W, L))) for b in range(0, L, W)]
              if W else [])

    def kernel(*refs):
        (cond_ref, noise_ref, in_b, conv_w0, cond_wcat, h1_w, h2_w,
         *rest) = refs
        if W:
            w1blks = rest[:len(blocks)]
            ms = rest[len(blocks):len(blocks) + L]
            out_ref, bufs, fb_ref = rest[len(blocks) + L:]
        else:
            conv_w1, res_w = rest[:2]
            out_ref, bufs, fb_ref = rest[2:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            bufs[...] = jnp.zeros_like(bufs)
            fb_ref[...] = jnp.zeros((B, R), wdt) + in_b[:][None, :]

        def body(tt, h_carry):
            t = i * CHUNK + tt
            cc = jnp.dot(cond_ref[tt].astype(wdt), cond_wcat[:],
                         preferred_element_type=jnp.float32)
            h = h_carry
            skip = jnp.zeros((B, S), jnp.float32)
            if not W:
                for l in range(L):
                    slot = offs[l] + (t & (dil[l] - 1))
                    h_prev = bufs[slot]
                    u = (jnp.dot(h_prev, conv_w0[l],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(h, conv_w1[l],
                                   preferred_element_type=jnp.float32)
                         + cc[:, l * 2 * gp:(l + 1) * 2 * gp])
                    z = (jnp.tanh(u[:, :gp]) * jax.nn.sigmoid(u[:, gp:])
                         ).astype(wdt)
                    bufs[slot] = h
                    rs = jnp.dot(z, res_w[l],
                                 preferred_element_type=jnp.float32)
                    h = (h.astype(jnp.float32) + rs[:, S:]).astype(wdt)
                    skip = skip + rs[:, :S]
            else:
                # off-chain per-layer base: prev-tap + cond (independent of
                # the z chain; these matmuls pipeline behind it)
                base = []
                for l in range(L):
                    slot = offs[l] + (t & (dil[l] - 1))
                    base.append(jnp.dot(bufs[slot], conv_w0[l],
                                        preferred_element_type=jnp.float32)
                                + cc[:, l * 2 * gp:(l + 1) * 2 * gp])
                for bi, blk in enumerate(blocks):
                    nb = len(blk)
                    hb = h  # block input (wdt)
                    a = jnp.dot(hb, w1blks[bi][:],
                                preferred_element_type=jnp.float32)
                    us = [base[l] + a[:, k * 2 * gp:(k + 1) * 2 * gp]
                          for k, l in enumerate(blk)]
                    for k, l in enumerate(blk):
                        z = (jnp.tanh(us[k][:, :gp])
                             * jax.nn.sigmoid(us[k][:, gp:])).astype(wdt)
                        o = jnp.dot(z, ms[l][:],
                                    preferred_element_type=jnp.float32)
                        rem = nb - 1 - k
                        for m in range(rem):
                            us[k + 1 + m] = (
                                us[k + 1 + m]
                                + o[:, m * 2 * gp:(m + 1) * 2 * gp])
                        r = o[:, rem * 2 * gp:rem * 2 * gp + R]
                        skip = skip + o[:, rem * 2 * gp + R:]
                        slot = offs[l] + (t & (dil[l] - 1))
                        bufs[slot] = h          # ring stores layer INPUT
                        h = (h.astype(jnp.float32) + r).astype(wdt)

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

        fb_ref[...] = jax.lax.fori_loop(0, CHUNK, body, fb_ref[...])

    return kernel, blocks, sum_d


def run(cfg, W, B, wdt):
    L = len(cfg.dilations)
    R, S, C = cfg.residual_channels, cfg.skip_channels, cfg.cond_channels
    gp = 128 * (-(-(cfg.gate_channels // 2) // 128))
    rng = np.random.default_rng(0)
    kernel, blocks, sum_d = build(cfg, W, B, wdt)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, wdt)

    conv_w0 = mk(L, R, 2 * gp)
    conv_w1 = mk(L, R, 2 * gp)
    res_w = mk(L, gp, R)
    skip_w = mk(L, gp, S)
    weights = [mk(R), conv_w0, mk(C, L * 2 * gp), mk(S, S), mk(S, 2)]
    if W:
        for blk in blocks:
            weights.append(jnp.concatenate(
                [conv_w1[l] for l in blk], axis=-1))          # (R, nb*2gp)
        for bi, blk in enumerate(blocks):
            for k, l in enumerate(blk):
                ps = [jnp.dot(res_w[l], conv_w1[m]) for m in blk[k + 1:]]
                weights.append(jnp.concatenate(
                    ps + [res_w[l], skip_w[l]], axis=-1))
    else:
        rs_w = jnp.concatenate([skip_w, res_w], axis=-1)      # (L, gp, S+R)
        weights += [conv_w1, rs_w]
    wbytes = (sum(int(np.prod(w.shape)) for w in weights)
              * np.dtype(wdt).itemsize)

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
    return best / T * 1e6, wbytes


def main():
    cfg = get_config(PRESET).model
    wdt = jnp.bfloat16 if DT == "bfloat16" else jnp.float32
    print(f"preset={PRESET} dtype={DT} L={len(cfg.dilations)} "
          f"device={jax.devices()}")
    for B in BATCHES:
        for W in WINDOWS:
            try:
                us, wbytes = run(cfg, W, B, wdt)
            except Exception as e:  # noqa: BLE001
                print(f"B={B:4d} W={W:2d} FAILED: "
                      f"{str(e).splitlines()[0][:90]}")
                continue
            rtf = us * 1e-6 * 24000
            tag = "unfused" if W == 0 else f"W={W}"
            print(f"B={B:4d} {tag:8s} {us:6.2f} us/step  rtf={rtf:.5f}  "
                  f"thpt={B / rtf:7.1f} audio-s/s  weights={wbytes >> 20}MB")


if __name__ == "__main__":
    main()
