"""Pallas persistent AR generation kernel (SURVEY.md §7 PR5; BASELINE.json
north star: "autoregressive sample-generation loop rewritten as a persistent
Pallas kernel with fast-WaveNet queue caching of per-layer dilated-conv
states in VMEM").

Design (see also models/generate.py — the lax.scan twin of this step):
- One pallas_call; grid over output-sample CHUNKS. TPU grid steps run
  sequentially on a core, so VMEM scratch (the dilation ring buffers +
  feedback sample) persists across grid steps — the kernel is "persistent"
  while conditioning/noise stream in and samples stream out per chunk
  through the automatic BlockSpec pipeline (double-buffered DMA overlaps
  the AR compute).
- All layer weights live in VMEM for the whole generation — zero HBM
  traffic in the per-sample critical path.
- Ring buffers are EXACT per-layer size packed flat: layer l owns slots
  [off_l, off_l + d_l) of a (sum_d, B, R) scratch; at step t its slot is
  off_l + (t & (d_l - 1)), which is read (value from t - d_l) then
  overwritten with the layer input at t. Total state = sum of dilations —
  5x smaller than a uniform max-dilation layout, which is what lets the
  deep config fit.
- `stream=True` moves large-dilation rings (d a >1 multiple of the chunk)
  to HBM: because d and chunk are powers of two, the slots a chunk touches
  are one contiguous non-wrapping window of chunk rows, which DMAs into a
  VMEM window at chunk start (holding the values written d steps earlier)
  and flushes back at chunk end. Only the window counts against VMEM, so
  the deep config's ring footprint drops 8x and the batch ceiling rises
  16 -> 48 (bf16, v5e). Pure data movement — fp32 stays bit-exact.
- The kernel-2 dilated conv is two (B, R) @ (R, 2*gp) MXU contractions per
  layer with the gate halves padded to 128-lane boundaries (sub-tile lane
  slicing costs ~25% step time); the conditioning contribution of ALL
  layers is one (B, C) @ (C, L*2*gp) matmul per sample.
- Sampling happens in-kernel from ONE uniform per step (Laplace inverse
  CDF / categorical inverse CDF via a triangular-matrix matmul — cumsum
  has no Mosaic lowering); the uniforms stream in as an input so the scan
  and naive backends consume identical noise — the fast==naive==pallas
  equivalence tests rely on this.
- `dtype="bfloat16"` keeps weights + ring buffers in bf16 (fp32 MXU
  accumulation, fp32 head/sampling): halves VMEM so the deep baseline
  fits; validated against the fp32 stack with teacher forcing (not
  bit-exact — fp32 is the default and IS bit-exact vs lax.scan).
- `teacher` mode forces the feedback stream from a given waveform: output
  at t is the sample drawn given the TRUE history. No feedback loop means
  no chaotic divergence, so reduced-precision variants can be validated
  against the teacher-forced flax stack at tolerance.

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


def _gate_pad(half: int) -> int:
    """Pad each gate half to a lane-tile multiple: the tanh/sigmoid split
    then lands on a 128-lane boundary instead of forcing sub-tile lane
    slicing in every layer. Zero-padded weight columns/rows keep the real
    lanes bit-exact."""
    return max(128, -(-half // 128) * 128)


def _skip_pad(s: int) -> int:
    """Lane-align the skip half of the fused skip|res projection so the res
    slice starts on a 128-lane boundary."""
    return -(-s // 128) * 128


def _res_pad(r: int) -> int:
    """Lane-align the res half of the fused-window projection so the
    within-block gate-correction region starts on a 128-lane boundary."""
    return -(-r // 128) * 128


def _fused_blocks(n_layers: int, fused: int):
    """Contiguous layer windows for the fused residual-expansion kernel."""
    return tuple(tuple(range(b, min(b + fused, n_layers)))
                 for b in range(0, n_layers, fused))


def warmup_length(cfg: ModelConfig, chunk: int = 64) -> int:
    """Teacher-forced warm-start length for segmented generation:
    sum(dilations) + 1 (every layer's correctness horizon) rounded up to a
    whole chunk (the kernel switches forced -> AR at a chunk boundary)."""
    need = int(sum(cfg.dilations)) + 1
    return -(-need // chunk) * chunk


def _stream_split(dilations, chunk: int, stream: bool):
    """(resident_layer_ids, streamed_layer_ids). A layer is streamable when
    its dilation is a >1 multiple of the chunk: the chunk's ring-buffer rows
    [t0 % d, t0 % d + chunk) are then contiguous and non-wrapping, so the
    whole window moves HBM<->VMEM as one sliced DMA per chunk."""
    if not stream:
        return tuple(range(len(dilations))), ()
    res = tuple(l for l, d in enumerate(dilations)
                if d <= chunk or d % chunk != 0)
    strm = tuple(l for l in range(len(dilations)) if l not in res)
    return res, strm


def vmem_bytes_estimate(cfg: ModelConfig, batch: int = 8, chunk: int = 512,
                        dtype: str = "float32", stream: bool = False,
                        fused: int = 0) -> int:
    """VMEM footprint: resident weights (lane-padded gate width, at the
    kernel weight dtype) + exact-size ring buffers + streamed
    cond/noise/out blocks (fp32, double-buffered by the pipeline).
    With stream=True, large-dilation ring buffers live in HBM and only a
    (chunk, B, R) window per streamed layer counts against VMEM.
    With fused=W, the per-layer skip|res projection widens by the
    within-block gate-correction columns (rem * 2gp per layer)."""
    wb = 2 if dtype == "bfloat16" else 4
    L = len(cfg.dilations)
    res_ids, strm_ids = _stream_split(cfg.dilations, chunk, stream)
    sum_d = int(sum(cfg.dilations[l] for l in res_ids))
    R, S, C = cfg.residual_channels, cfg.skip_channels, cfg.cond_channels
    gp = _gate_pad(cfg.gate_channels // 2)
    Q = cfg.quantize_channels
    w = (L * (2 * R * 2 * gp + C * 2 * gp + gp * (_skip_pad(S) + R))
         + S * S + S * Q)
    if cfg.head == "softmax":
        w += Q * R
    if fused:
        # fm widths: (sp + rp + rem*2gp) replaces (sp + R) per layer
        extra = L * gp * (_res_pad(R) - R)
        for blk in _fused_blocks(L, fused):
            for k in range(len(blk)):
                extra += gp * (len(blk) - 1 - k) * 2 * gp
        w += extra
    bufs = (sum_d + 1) * batch * R   # ring buffers + encoded-feedback carry
    bufs += len(strm_ids) * chunk * batch * R      # HBM ring windows
    cond_blk = 2 * chunk * batch * C           # streamed at the weight dtype
    other_blk = 2 * chunk * batch * 3          # noise + teacher + out (fp32)
    return wb * (w + bufs + cond_blk) + 4 * other_blk


# Coarse sanity gate for the byte ESTIMATE, calibrated after the
# vmem_limit_bytes lift below: the fp32 shallow kernel runs up to B=832
# (estimate ~109 MB) and fails at B=896 on real VMEM exhaustion, so the
# gate only rejects configurations that cannot plausibly fit the physical
# 128 MB/core. It is necessary but not sufficient — Mosaic hits
# batch-dependent compile limits the estimate cannot see, which is what
# `probe_pallas` (try-compile) exists to catch.
_VMEM_BUDGET = 120 * 1024 * 1024

# Per-kernel scoped-VMEM ceiling passed to Mosaic (vmem_limit_bytes). The
# compiler's default gate is 16 MB; v5e physically has 128 MB of VMEM per
# core. Requesting the physical size lets the real allocator (not the
# conservative default gate) decide the frontier.
_VMEM_HW_BYTES = 128 * 1024 * 1024


def pallas_supported(cfg: ModelConfig, batch: int = 8, chunk: int = 512,
                     dtype: str = "float32", stream: bool = False,
                     fused: int = 0) -> bool:
    """The kernel covers both heads, kernel_size 2, power-of-two dilations
    (true for 2**i schedules), and models whose weights + ring buffers fit
    the VMEM budget at the ACTUAL generation batch/chunk. Callers must pass
    the real batch size. The deep baseline fits with dtype='bfloat16'.

    The byte estimate is necessary but not sufficient: Mosaic also hits
    batch-dependent compile limits the estimate cannot see (on v5e the
    shallow preset compiles at fp32 B<=96 / bf16 B<=144 but fails above,
    while the deep preset passes at a *larger* byte estimate). Backends that
    must not crash on a user-chosen batch should confirm with
    `probe_pallas`, which try-compiles one chunk and caches the verdict."""
    return (cfg.kernel_size == 2
            and all(d & (d - 1) == 0 for d in cfg.dilations)
            and vmem_bytes_estimate(cfg, batch, chunk, dtype, stream,
                                    fused) <= _VMEM_BUDGET)


_PROBE_CACHE: dict = {}


def probe_pallas(cfg: ModelConfig, batch: int, chunk: int = 64,
                 dtype: str = "float32", stream: bool = False,
                 fused: int = 0) -> bool:
    """Empirical support check: compile + run the kernel on ONE chunk of
    zeros at the real (batch, chunk, dtype). Catches the Mosaic compile
    failures `pallas_supported`'s byte estimate cannot predict. The verdict
    is cached per (config, batch, chunk, dtype, stream, fused); the probe
    costs one small compile (~seconds) the first time, nothing after."""
    key = (cfg, batch, chunk, dtype, stream, fused)
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    if stream and not _stream_split(cfg.dilations, chunk, True)[1]:
        # no streamable layer: identical to the resident kernel a caller's
        # tier ladder already tried — don't pay a second probe compile
        _PROBE_CACHE[key] = False
        return False
    if not pallas_supported(cfg, batch, chunk, dtype, stream, fused):
        _PROBE_CACHE[key] = False
        return False
    try:
        pp = _zero_params(cfg)
        c = jnp.zeros((batch, chunk, cfg.cond_channels), jnp.float32)
        noise = jnp.full((batch, chunk), 0.5, jnp.float32)
        generate_pallas(pp, cfg, c, noise=noise, chunk=chunk,
                        dtype=dtype, stream=stream,
                        fused=fused).block_until_ready()
        ok = True
    except Exception:  # Mosaic/XLA compile errors surface as RuntimeError
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _zero_params(cfg: ModelConfig) -> dict:
    """Zero-filled plain-param dict with the kernel's expected shapes —
    enough to compile/execute a probe without touching a real checkpoint."""
    L = len(cfg.dilations)
    R, G, S, C = (cfg.residual_channels, cfg.gate_channels,
                  cfg.skip_channels, cfg.cond_channels)
    Q = cfg.quantize_channels
    half = G // 2
    z = jnp.zeros
    pp = {
        "conv_w": z((L, 2, R, G)), "conv_b": z((L, G)),
        "cond_w": z((L, C, G)),
        "res_w": z((L, half, R)), "res_b": z((L, R)),
        "skip_w": z((L, half, S)), "skip_b": z((L, S)),
        "head1_w": z((S, S)), "head1_b": z((S,)),
    }
    if cfg.head == "softmax":
        pp["input_embed"] = z((Q, R))
        pp["head2_w"] = z((S, Q))
        pp["head2_b"] = z((Q,))
    else:
        pp["input_w"] = z((1, R))
        pp["input_b"] = z((R,))
        pp["head2_w"] = z((S, 2))
        pp["head2_b"] = z((2,))
    return pp


def _make_kernel(cfg: ModelConfig, chunk: int, batch: int, mode: str,
                 use_teacher: bool, wdt, strm_ids=(), warmup: int = 0,
                 unroll: int = 1, fused_blocks=()):
    L = len(cfg.dilations)
    dil = cfg.dilations
    res_ids = tuple(l for l in range(L) if l not in strm_ids)
    # resident layers: packed flat rings, layer -> offset into (sum_d_res,..)
    res_off = {}
    acc = 0
    for l in res_ids:
        res_off[l] = acc
        acc += dil[l]
    # streamed layers: window index + offset into the HBM ring array
    win_idx = {l: j for j, l in enumerate(strm_ids)}
    strm_off = {}
    acc_s = 0
    for l in strm_ids:
        strm_off[l] = acc_s
        acc_s += dil[l]
    G = cfg.gate_channels
    gp = _gate_pad(G // 2)
    S = cfg.skip_channels
    Q = cfg.quantize_channels
    softmax = cfg.head == "softmax"
    log_b_min, log_b_max = cfg.log_b_min, cfg.log_b_max

    R = cfg.residual_channels
    sp = _skip_pad(S)
    rp = _res_pad(R)

    def kernel(*refs):
        n_tail = 3 + (4 if strm_ids else 0)
        if use_teacher:
            (cond_ref, noise_ref, teacher_ref, *wrefs) = refs[:-n_tail]
        else:
            (cond_ref, noise_ref, *wrefs) = refs[:-n_tail]
        if fused_blocks:
            (in_w, in_b, conv_w0, conv_b, cond_wcat, rs_b,
             h1_w, h1_b, h2_w, h2_b) = wrefs[:10]
            nb_blk = len(fused_blocks)
            w1cat = wrefs[10:10 + nb_blk]
            fm = wrefs[10 + nb_blk:10 + nb_blk + L]
        else:
            (in_w, in_b, conv_w, conv_b, cond_wcat, rs_w, rs_b,
             h1_w, h1_b, h2_w, h2_b) = wrefs
        if strm_ids:
            (out_ref, hbm_ref, bufs, fb_ref, win, lsem, ssem) = refs[-7:]
        else:
            out_ref, bufs, fb_ref = refs[-3:]
        i = pl.program_id(0)

        def strm_copies(sems, store=False):
            """One sliced-DMA descriptor per streamed layer: HBM ring rows
            [off + t0 % d, +chunk) <-> its (chunk, B, R) VMEM window."""
            out = []
            for l in strm_ids:
                j = win_idx[l]
                per = dil[l] // chunk            # chunks per ring period
                p = jax.lax.rem(i, per) * chunk
                hbm_slc = hbm_ref.at[pl.ds(strm_off[l] + p, chunk)]
                src, dst = ((win.at[j], hbm_slc) if store
                            else (hbm_slc, win.at[j]))
                out.append((l, j, per,
                            pltpu.make_async_copy(src, dst, sems.at[j])))
            return out

        if strm_ids:
            # chunk prologue: windows for rows already written d steps ago
            # load from HBM (values from t - d); earlier chunks read zeros
            for l, j, per, cp in strm_copies(lsem):
                @pl.when(i >= per)
                def _load(cp=cp):
                    cp.start()

                @pl.when(i < per)
                def _zero(j=j):
                    win[j] = jnp.zeros((chunk, batch, R), wdt)
            for l, j, per, cp in strm_copies(lsem):
                @pl.when(i >= per)
                def _wait(cp=cp):
                    cp.wait()

        def encode(x_prev):
            """Input encode of the feedback sample (class ids as floats for
            the softmax head) -> (B, R). Same ops/order as the scan path's
            _input_encode, so fp32 stays bit-exact vs generate_fast."""
            if softmax:
                ids = x_prev.astype(jnp.int32)
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (batch, Q), 1) == ids[:, None]).astype(wdt)
                return jnp.dot(onehot, in_w[:],
                               preferred_element_type=jnp.float32).astype(wdt)
            return (x_prev[:, None].astype(wdt) * in_w[0][None, :]
                    + in_b[:][None, :]).astype(wdt)

        @pl.when(i == 0)
        def _init():
            bufs[...] = jnp.zeros_like(bufs)
            # encoded seed input (silence): the feedback carry holds the
            # ENCODED (B, R) input rather than the raw (B,) sample — Mosaic
            # (2026-08 libtpu) miscompiles rank-1 loop carries bridged
            # through scratch, and the encoded form is 2-D tile-friendly.
            if softmax:
                # mulaw_quantize(0.0) == Q // 2 (matches seed_feedback):
                # one-hot dot == that embedding row, exactly
                fb_ref[...] = jnp.broadcast_to(
                    in_w[pl.ds(Q // 2, 1), :], (batch, R))
            else:
                # encode(0) == 0 * in_w + in_b
                fb_ref[...] = jnp.zeros((batch, R), wdt) + in_b[:][None, :]

        def body(tt, h_carry, forced=use_teacher and warmup == 0):
            t = i * chunk + tt
            if forced:
                h = encode(teacher_ref[tt, :])           # (B, R) forced
            else:
                h = h_carry                              # (B, R) AR feedback
            c_t = cond_ref[tt]                           # (B, C)
            cc = jnp.dot(c_t.astype(wdt), cond_wcat[:],
                         preferred_element_type=jnp.float32)  # (B, L*2gp)

            skip = jnp.zeros((batch, S), jnp.float32)
            if fused_blocks:
                # windowed residual expansion (tools/kfuse.py, landed):
                # within a block of W layers the residual recurrence is
                # expanded into the gate inputs, so each layer's whole
                # on-chain work is ONE matmul (z_j times the precomputed
                # [skip|res|P_{j,->later}] concat) — the sequential
                # matmul-latency chain drops from 2L to L + L/W. The
                # off-chain prev-tap/cond matmuls pipeline behind it.
                # NOT bit-exact vs the unfused loop (different summation
                # order); gated by the teacher-forced tolerance tests.
                def ring_read(l):
                    if l in win_idx:
                        return win[win_idx[l], tt]
                    return bufs[res_off[l] + (t & (dil[l] - 1))]

                def ring_write(l, val):
                    if l in win_idx:
                        win[win_idx[l], tt] = val
                    else:
                        bufs[res_off[l] + (t & (dil[l] - 1))] = val

                # per-layer base: prev-tap matmul + folded bias + cond
                # (conv_b carries the within-block res_b@W1 fold)
                base = [
                    jnp.dot(ring_read(l), conv_w0[l],
                            preferred_element_type=jnp.float32)
                    + conv_b[l][None, :].astype(jnp.float32)
                    + cc[:, l * 2 * gp:(l + 1) * 2 * gp]
                    for l in range(L)
                ]
                for bi, blk in enumerate(fused_blocks):
                    nb = len(blk)
                    a = jnp.dot(h, w1cat[bi][:],
                                preferred_element_type=jnp.float32)
                    us = [base[l] + a[:, k * 2 * gp:(k + 1) * 2 * gp]
                          for k, l in enumerate(blk)]
                    for k, l in enumerate(blk):
                        z = (jnp.tanh(us[k][:, :gp])
                             * jax.nn.sigmoid(us[k][:, gp:])).astype(wdt)
                        o = jnp.dot(z, fm[l][:],
                                    preferred_element_type=jnp.float32)
                        # fm layout: [skip(sp) | res(rp) | P_0..P_{rem-1}]
                        for mq in range(nb - 1 - k):
                            off = sp + rp + mq * 2 * gp
                            us[k + 1 + mq] = (us[k + 1 + mq]
                                              + o[:, off:off + 2 * gp])
                        rs = (o[:, :sp + rp]
                              + rs_b[l][None, :].astype(jnp.float32))
                        ring_write(l, h)       # ring stores layer INPUT
                        h = (h.astype(jnp.float32)
                             + rs[:, sp:sp + R]).astype(wdt)
                        skip = skip + rs[:, :S]
            else:
                for l in range(L):
                    if l in win_idx:
                        # streamed ring: this chunk's rows are the VMEM
                        # window; row tt holds the value from t - d_l
                        # (loaded/zeroed in the prologue) and is
                        # overwritten with the t input
                        j = win_idx[l]
                        h_prev = win[j, tt]              # (B, R) from t-d_l
                    else:
                        slot = res_off[l] + (t & (dil[l] - 1))
                        h_prev = bufs[slot]              # (B, R) from t-d_l
                    u = (
                        (jnp.dot(h_prev, conv_w[l, 0],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(h, conv_w[l, 1],
                                   preferred_element_type=jnp.float32))
                        + conv_b[l][None, :].astype(jnp.float32)
                    ) + cc[:, l * 2 * gp:(l + 1) * 2 * gp]
                    z = (jnp.tanh(u[:, :gp])
                         * jax.nn.sigmoid(u[:, gp:])).astype(wdt)
                    if l in win_idx:
                        win[win_idx[l], tt] = h
                    else:
                        bufs[slot] = h
                    # fused skip|res projection: one (B,gp)@(gp,Sp+R) MXU
                    # op per layer instead of two — each output column is
                    # the identical dot product, so fp32 stays bit-exact.
                    # skip occupies lanes [0,S); res starts at the
                    # 128-aligned offset Sp
                    rs = (jnp.dot(z, rs_w[l],
                                  preferred_element_type=jnp.float32)
                          + rs_b[l][None, :].astype(jnp.float32))
                    h = (h.astype(jnp.float32)
                         + rs[:, sp:sp + R]).astype(wdt)
                    skip = skip + rs[:, :S]

            o = jax.nn.relu(skip).astype(wdt)
            o = jax.nn.relu(
                jnp.dot(o, h1_w[:], preferred_element_type=jnp.float32)
                + h1_b[:][None, :].astype(jnp.float32)
            ).astype(wdt)
            o = (jnp.dot(o, h2_w[:], preferred_element_type=jnp.float32)
                 + h2_b[:][None, :].astype(jnp.float32))

            if softmax:
                if mode == "greedy":
                    ids = jnp.argmax(o, axis=-1).astype(jnp.int32)
                else:
                    u_t = noise_ref[tt, :]
                    p = jax.nn.softmax(o, axis=-1)
                    # cumsum has no Mosaic lowering; cdf = p @ upper-tri
                    # ones is one (B,Q)@(Q,Q) MXU op
                    tri = (jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
                           <= jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
                           ).astype(jnp.float32)
                    cdf = jnp.dot(p, tri, preferred_element_type=jnp.float32)
                    ids = jnp.clip(
                        jnp.sum((cdf < u_t[:, None]).astype(jnp.int32),
                                axis=-1),
                        0, Q - 1)
                # emit raw class ids; the mu-law dequantize runs OUTSIDE the
                # kernel with the exact same XLA op as the scan path (Mosaic
                # lowers `**` with different rounding -> 1-ulp waveform
                # mismatches if dequantized in-kernel)
                x_t = ids.astype(jnp.float32)
                fb = x_t                                 # encoded below
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
            return encode(fb)

        def chunk_loop(step_body, fb0):
            """fori_loop over the chunk with `unroll` samples per trip —
            identical ops in identical order (pure loop restructuring, so
            fp32 stays bit-exact); fewer loop-carry round-trips per chunk
            shaves per-sample overhead (hardware-probed ~5% at unroll 4)."""
            if unroll <= 1:
                return jax.lax.fori_loop(0, chunk, step_body, fb0)

            def trip(j, h):
                for q in range(unroll):
                    h = step_body(j * unroll + q, h)
                return h

            return jax.lax.fori_loop(0, chunk // unroll, trip, fb0)

        # the encoded feedback rides the loop carry; the VMEM scratch only
        # bridges chunk boundaries (kept 2-D — see _init comment)
        if use_teacher and warmup > 0:
            # segmented-generation warm-start: whole chunks before the
            # (chunk-aligned) warmup boundary force their inputs from the
            # previous segment's true samples — rebuilding every ring's
            # state exactly — and chunks after run pure AR with zero
            # teacher overhead. Warmup-region outputs are re-generations
            # of the previous segment; callers trim them.
            wb = warmup // chunk

            @pl.when(i < wb)
            def _forced():
                fb_ref[...] = chunk_loop(
                    functools.partial(body, forced=True), fb_ref[...])

            @pl.when(i >= wb)
            def _ar():
                fb_ref[...] = chunk_loop(
                    functools.partial(body, forced=False), fb_ref[...])
        else:
            fb_ref[...] = chunk_loop(body, fb_ref[...])

        if strm_ids:
            # chunk epilogue: flush every window back to its HBM ring rows.
            # Synchronous (start-all, wait-all) — the rows stored now are
            # next read d/chunk >= 2 chunks later, but the window buffer
            # itself is reused by the NEXT chunk's load, so the store must
            # complete before this grid step ends.
            stores = strm_copies(ssem, store=True)
            for _, _, _, cp in stores:
                cp.start()
            for _, _, _, cp in stores:
                cp.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mode", "chunk", "interpret", "dtype", "stream",
                     "warmup", "unroll", "fused"),
)
def generate_pallas(pp: dict, cfg: ModelConfig, c_up, key=None,
                    mode: str = "sample", noise=None, chunk: int = 512,
                    interpret: bool = False, dtype: str = "float32",
                    teacher=None, stream: bool = False, warmup: int = 0,
                    unroll: int = 4, fused: int = 0):
    """Persistent-kernel AR generation; same contract as generate_fast.

    c_up (B, T, C) fp32; returns (B, T) fp32. `noise` (B, T) uniforms in
    (0,1); generated from `key` when omitted (sample mode).
    dtype: kernel weight/ring-buffer dtype ("float32" is bit-exact vs the
    scan path; "bfloat16" halves VMEM — fits the deep config).
    teacher: optional (B, T) forced feedback stream (float samples, or
    class ids as floats for the softmax head) — teacher-forced scoring.
    warmup: with teacher, force only steps t < warmup and generate AR
    after — the warm-start for segmented generation (see
    models/generate.py generate_segmented). Must be a multiple of chunk
    (forced/AR is decided per chunk, so AR chunks pay zero teacher
    overhead); warmup >= sum(dilations) + 1 rebuilds the ring state
    exactly; warmup-region outputs are discarded by the caller.
    stream: keep large-dilation (d > chunk) ring buffers in HBM, DMA-ing a
    (chunk, B, R) window per layer per chunk — pure data movement, so it
    preserves the fp32 bit-exactness while freeing most ring VMEM (the
    deep config's rings shrink 8x), which buys a much larger batch.
    unroll: samples per inner-loop trip (must divide chunk). Pure loop
    restructuring — identical ops in identical order, so fp32 stays
    bit-exact at every setting; 4 is ~5% faster than 1 on v5e.
    fused: window size W for the fused residual-expansion kernel (0 =
    off). Within each W-layer block the residual recurrence is expanded
    into the gate inputs with precomputed weight products, shortening the
    per-sample sequential matmul chain from 2L to L + L/W — 11-27% faster
    in the latency-bound regime (small/medium batch; v5e measurements in
    BASELINE.md), slower at compute-bound saturation batches (it adds
    FLOPs). NOT bit-exact vs fused=0 (different summation order);
    validated by teacher-forced tolerance tests + shared-noise decode A/B.
    """
    B, T, C = c_up.shape
    if fused < 0:
        # a negative value would pass "if fused:" (truthy) and build the
        # fused weight layout while _fused_blocks returns no blocks — the
        # kernel would then die in an opaque unpack at trace time
        raise ValueError("fused must be >= 0 (0 disables the fused-window "
                         "kernel)")
    if not pallas_supported(cfg, batch=B, chunk=chunk, dtype=dtype,
                            stream=stream, fused=fused):
        raise ValueError(
            f"model config/batch not supported by the Pallas kernel "
            f"(VMEM estimate "
            f"{vmem_bytes_estimate(cfg, B, chunk, dtype, stream, fused) >> 20}"
            f" MB > {_VMEM_BUDGET >> 20} MB budget) — use the lax.scan path"
        )
    L = len(cfg.dilations)
    res_ids, strm_ids = _stream_split(cfg.dilations, chunk, stream)
    sum_d = int(sum(cfg.dilations[l] for l in res_ids))
    sum_strm = int(sum(cfg.dilations[l] for l in strm_ids))
    R = cfg.residual_channels
    G = cfg.gate_channels
    wdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    if chunk % 32 != 0:
        # chunk rides the SUBLANE/major dims of the streamed blocks (they
        # are time-major: (chunk, B, C) / (chunk, B)), so the hard floor is
        # the 8-row sublane tile. 32 is the smallest size worth using: it
        # halves the streamed-ring VMEM windows AND makes d == 64 layers
        # streamable (window = chunk rows per streamed layer), which is
        # what sets the deep config's batch frontier; 64 amortizes DMA and
        # loop overhead slightly better when VMEM is not the binding limit.
        raise ValueError("chunk must be a multiple of 32")
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
    if teacher is not None and teacher.shape[1] != T_pad:
        teacher = jnp.pad(
            teacher.astype(jnp.float32),
            ((0, 0), (0, T_pad - teacher.shape[1])),
        )

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

    # fused skip|res projection weights: lanes [0,S) = skip, [Sp,Sp+R) = res
    S = cfg.skip_channels
    sp = _skip_pad(S)
    rs_w = jnp.zeros((L, gp, sp + R), skip_w.dtype)
    rs_w = rs_w.at[:, :, :S].set(skip_w).at[:, :, sp:].set(res_w)
    rs_b = jnp.zeros((L, sp + R), pp["skip_b"].dtype)
    rs_b = rs_b.at[:, :S].set(pp["skip_b"]).at[:, sp:].set(pp["res_b"])

    if warmup > 0 and teacher is None:
        raise ValueError("warmup requires a teacher prefix stream")
    if warmup % chunk != 0:
        raise ValueError("warmup must be a multiple of chunk")
    if unroll < 1 or chunk % unroll != 0:
        raise ValueError("unroll must divide chunk")
    blocks = _fused_blocks(L, fused) if fused else ()
    kernel = _make_kernel(cfg, chunk, B, mode, teacher is not None, wdt,
                          strm_ids, warmup, unroll, fused_blocks=blocks)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if fused:
        # precomputed fused-window weights (fp32 products, then cast):
        # w1cat[bi] = the block's current-tap weights side by side;
        # fm[l] = [skip(sp-pad) | res(rp-pad) | res_w@W1 products toward
        # each later layer in the block]; conv_b absorbs the constant
        # res_b@W1 within-block terms.
        rp = _res_pad(R)
        conv_b_f = conv_b.astype(jnp.float32)
        fms = []
        w1cats = []
        for blk in blocks:
            w1cats.append(jnp.concatenate(
                [conv_w[l, 1] for l in blk], axis=-1))
            for k, l in enumerate(blk):
                rem = len(blk) - 1 - k
                parts = jnp.zeros((gp, sp + rp + rem * 2 * gp), jnp.float32)
                parts = parts.at[:, :S].set(skip_w[l])
                parts = parts.at[:, sp:sp + R].set(res_w[l])
                for mq in range(rem):
                    m = blk[k + 1 + mq]
                    parts = parts.at[:, sp + rp + mq * 2 * gp:
                                     sp + rp + (mq + 1) * 2 * gp].set(
                        jnp.dot(res_w[l].astype(jnp.float32),
                                conv_w[m, 1].astype(jnp.float32)))
                    # the constant res_b[l] contribution to every later
                    # layer's gate input folds into that layer's bias
                    conv_b_f = conv_b_f.at[m].add(
                        jnp.dot(pp["res_b"][l].astype(jnp.float32),
                                conv_w[m, 1].astype(jnp.float32)))
                fms.append(parts)
        rs_b_f = jnp.zeros((L, sp + rp), jnp.float32)
        rs_b_f = rs_b_f.at[:, :S].set(pp["skip_b"])
        rs_b_f = rs_b_f.at[:, sp:sp + R].set(pp["res_b"])
        weights = ((in_w, in_b, conv_w[:, 0], conv_b_f, cond_wcat, rs_b_f,
                    pp["head1_w"], pp["head1_b"], pp["head2_w"],
                    pp["head2_b"])
                   + tuple(w1cats) + tuple(fms))
    else:
        weights = (in_w, in_b, conv_w, conv_b, cond_wcat, rs_w, rs_b,
                   pp["head1_w"], pp["head1_b"], pp["head2_w"],
                   pp["head2_b"])
    weights = tuple(jnp.asarray(w, wdt) for w in weights)

    # time-major layouts: the per-sample dynamic index must not land on the
    # minor (lane) dim — Mosaic requires 128-multiple lane offsets.
    # The kernel casts cond to wdt before its matmul, so for the bf16
    # kernel the stream itself is sent as bf16 — bitwise identical values,
    # half the cond stream's (double-buffered) VMEM footprint.
    inputs = [jnp.transpose(c_up, (1, 0, 2)).astype(wdt),
              jnp.transpose(noise, (1, 0))]
    in_specs = [
        pl.BlockSpec((chunk, B, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, B), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if teacher is not None:
        inputs.append(jnp.transpose(teacher, (1, 0)))
        in_specs.append(pl.BlockSpec((chunk, B), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    inputs.extend(weights)
    in_specs.extend(wspec(w.shape) for w in weights)

    out_specs = pl.BlockSpec((chunk, B), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((T_pad, B), jnp.float32)
    scratch = [
        pltpu.VMEM((sum_d, B, R), wdt),    # packed dilation ring buffers
        pltpu.VMEM((B, R), wdt),           # encoded feedback input
    ]
    if strm_ids:
        # second output = the HBM-resident streamed rings (never read by
        # the caller; every in-kernel load is preceded by a store d/chunk
        # chunks earlier, so it is safe uninitialized)
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((sum_strm, B, R), wdt)]
        scratch += [
            pltpu.VMEM((len(strm_ids), chunk, B, R), wdt),  # ring windows
            pltpu.SemaphoreType.DMA((len(strm_ids),)),      # load sems
            pltpu.SemaphoreType.DMA((len(strm_ids),)),      # store sems
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        # lift Mosaic's default 16 MB scoped-VMEM gate to the physical
        # capacity: the persistent kernel's whole point is to pack weights +
        # rings + stream blocks into VMEM, and the default gate (not the
        # hardware) is what capped the batch frontier (v5e probe 2026-08:
        # fp32 B=112 failed at "16.83M > 16.00M limit" under the default)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_HW_BYTES),
    )(*inputs)
    if strm_ids:
        out = out[0]
    wav = jnp.transpose(out, (1, 0))[:, :T]
    if cfg.head == "softmax":
        # kernel emits class ids; dequantize with the same XLA op as the
        # scan path so the two backends stay bit-exact on hardware
        from shallow_wavenet_tpu.ops.mulaw import mulaw_dequantize

        wav = mulaw_dequantize(wav.astype(jnp.int32), cfg.quantize_channels)
    return wav
