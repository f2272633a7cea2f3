"""Decoding CLI — batched AR generation (component C8; reference
`src/bin/decode.py`, call stack SURVEY.md §3.4).

Copy-synthesis: extracts features from the eval wavs (or reads them from
--feats-dir), normalizes with the training stats, generates with the fast
queue-cached path (Pallas kernel when on TPU, lax.scan otherwise), trims to
each utterance's true length and writes wavs. Reports audio-seconds/s and
RTF — the primary metric of BASELINE.json:2.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

from shallow_wavenet_tpu.bin.common import (
    add_config_args, load_utterances, resolve_config, setup_logging,
)
from shallow_wavenet_tpu.config import Config
from shallow_wavenet_tpu.data.audio_io import write_wav
from shallow_wavenet_tpu.data.dataset import pad_batch_for_decode, read_file_list

log = logging.getLogger("decode")


def load_model_state(cfg: Config, workdir: str):
    """Restore trained params from --workdir's latest checkpoint."""
    from shallow_wavenet_tpu.training import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state()
    state, _, step = trainer.restore(workdir, state)
    if step == 0:
        log.warning("no checkpoint found in %s — decoding with random init",
                    workdir)
    return trainer, state, step


import functools

# THE Pallas backend tier ladder — the single source of truth shared by
# decode_batch, _decode_batch_dp and bench (VERDICT r2 item 6: the DP path
# must probe the same tiers as single-device, including the chunk-32
# streamed tiers that extend the deep batch frontier). Order: fp32 resident
# (bit-exact vs scan) -> fp32 streamed -> fp32 streamed chunk-32 -> bf16
# resident -> bf16 streamed -> bf16 streamed chunk-32. Each entry is
# (dtype, streamed, chunk); streaming keeps large-dilation rings in HBM
# (pure data movement, preserves fp32 bit-exactness) and chunk 32 halves
# the streamed ring windows AND makes d == 64 layers streamable.
PALLAS_TIERS = (
    ("float32", False, 64),
    ("float32", True, 64),
    ("float32", True, 32),
    ("bfloat16", False, 64),
    ("bfloat16", True, 64),
    ("bfloat16", True, 32),
)


def _run_tier_ladder(cfg: Config, batch: int, t_len: int, kernel_dtype: str,
                     fused: int, run):
    """Probe + execute PALLAS_TIERS in order with `run(dt, strm, chunk,
    fused)`; returns the first tier's result or None when every tier fails.
    With fused != 0, a fully exhausted ladder retries unfused with a warning
    (ADVICE r2: a fused compile failure must degrade to the unfused Pallas
    kernel — orders of magnitude faster than the lax.scan fallback — not
    silently to scan)."""
    from shallow_wavenet_tpu.ops.ar_kernel import probe_pallas

    fused_attempted = False
    for fz in (fused, 0) if fused else (0,):
        if fused and fz == 0 and fused_attempted:
            # only warn when a fused tier was actually probed/run — a
            # kernel_dtype filter that excluded every ladder entry is not
            # a fused failure (ADVICE r3 low)
            log.warning("every fused=%d kernel tier failed to probe or "
                        "compile; retrying the ladder with --fused dropped",
                        fused)
        for dt, strm, chunk in PALLAS_TIERS:
            if kernel_dtype != "auto" and dt != kernel_dtype:
                continue
            if fz:
                fused_attempted = True
            if not probe_pallas(cfg.model, batch=batch, chunk=chunk,
                                dtype=dt, stream=strm, fused=fz):
                log.debug("pallas tier %s%s chunk=%d failed probe at B=%d",
                          dt, " streamed" if strm else "", chunk, batch)
                continue
            try:
                return run(dt, strm, chunk, fz)
            except Exception as e:  # compile limit at this (B, T) — next
                # tier. Include the error: a REAL bug (not a Mosaic VMEM/
                # compile frontier) must not vanish into silent fallback
                log.warning(
                    "pallas %s%s chunk=%d kernel failed at B=%d T=%d "
                    "(%s: %s); falling back", dt,
                    " streamed" if strm else "", chunk, batch, t_len,
                    type(e).__name__, str(e)[:500])
    return None


@functools.lru_cache(maxsize=4)
def _prep_fn(model):
    """Jitted (upsample_cond + plain-param extraction) — eager flax apply
    would dispatch op-by-op, which is ruinous on a remote-attached TPU."""
    import jax
    from shallow_wavenet_tpu.models import extract_plain_params

    def prep(variables, cond, spk):
        c_up = model.apply(variables, cond, spk, method="upsample_cond")
        return c_up, extract_plain_params(variables, model.cfg)

    return jax.jit(prep)


def decode_batch(trainer, state, cfg: Config, utts, key, use_pallas=None,
                 segment_samples: int = 0, kernel_dtype: str = "auto",
                 mesh=None, fused: int = 0):
    """Generate one padded batch; returns list of trimmed waveforms.
    segment_samples > 0 decodes in bounded segments with teacher-forced
    warm-starts (bit-exact; SURVEY.md §5.7 long-utterance mechanism).
    kernel_dtype restricts the Pallas tier ladder to one weight dtype
    ("float32" = bit-exact-vs-scan tiers only, "bfloat16" = halved-VMEM
    tiers only) — for quality A/B runs and VMEM-bound batches.
    mesh: a ('data',) Mesh routes generation through generate_dp —
    utterances sharded over chips, params replicated, zero cross-chip
    traffic during the AR loop (BASELINE config 4). The noise stream is
    drawn at the TRUE batch size and row-padded, so DP output is
    sample-identical to the single-device path for the real utterances."""
    import jax
    import jax.numpy as jnp
    from shallow_wavenet_tpu.models.generate import (
        generate_fast, generate_segmented,
    )
    from shallow_wavenet_tpu.ops.ar_kernel import generate_pallas

    cond, n_frames, n_samples = pad_batch_for_decode(utts, cfg.data.hop_length)
    variables = {"params": state.params}
    spk = (jnp.asarray([u.speaker for u in utts], jnp.int32)
           if cfg.model.n_speakers > 0 else None)
    if mesh is not None:
        if segment_samples > 0:
            raise ValueError("--dp and --segment-samples are mutually "
                             "exclusive (the DP path shards whole "
                             "utterances over chips)")
        return _decode_batch_dp(trainer, state, cfg, utts, cond, n_samples,
                                key, mesh, use_pallas, kernel_dtype,
                                fused=fused)
    if segment_samples > 0:
        # validate up front: inside the tier loop a ValueError would be
        # mistaken for a compile failure and silently drop to the slow path
        from shallow_wavenet_tpu.ops.ar_kernel import warmup_length

        m = warmup_length(cfg.model, 64)
        if segment_samples % 64 != 0 or segment_samples <= m:
            raise ValueError(
                f"--segment-samples must be a multiple of 64 and exceed the "
                f"warm-start length {m} for this model")
        # prep on host CPU: the full-length upsampled conditioning must
        # never be materialized on the accelerator — that allocation is
        # exactly what segmentation exists to avoid
        from shallow_wavenet_tpu.models import extract_plain_params

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            c_up, _ = _prep_fn(trainer.model)(
                jax.device_put(variables, cpu), jnp.asarray(cond), spk)
            noise = np.asarray(jax.random.uniform(
                key, (c_up.shape[0], c_up.shape[1]),
                minval=1e-7, maxval=1.0 - 1e-7))
        c_up = np.asarray(c_up)
        pp = extract_plain_params(variables, cfg.model)
    else:
        c_up, pp = _prep_fn(trainer.model)(variables, jnp.asarray(cond), spk)
        # both backends consume the same uniform stream -> identical
        # samples; the Pallas persistent kernel is the TPU fast path
        # (SURVEY.md §7 PR5)
        noise = jax.random.uniform(key, (c_up.shape[0], c_up.shape[1]),
                                   minval=1e-7, maxval=1.0 - 1e-7)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # tiered backend choice (PALLAS_TIERS, shared with the DP path) then
    # the lax.scan queue path. Each tier is gated by a probe_pallas
    # try-compile AND a try/except around the real call: the Mosaic
    # compile frontier depends on batch and total length in ways the VMEM
    # byte estimate cannot predict (hardware probes, v5e 2026-08 — see
    # ops/ar_kernel.py).
    B = len(utts)
    if use_pallas:
        def run_tier(dt, strm, chunk, fz):
            if segment_samples > 0:
                # c_up/noise are host arrays here: device HBM holds
                # only one segment of conditioning at a time
                return np.asarray(generate_segmented(
                    pp, cfg.model, c_up, noise,
                    segment_samples, chunk=chunk, dtype=dt, stream=strm,
                    fused=fz))
            return np.asarray(generate_pallas(
                pp, cfg.model, c_up, noise=noise, chunk=chunk,
                dtype=dt, stream=strm, fused=fz))

        wav = _run_tier_ladder(cfg, B, c_up.shape[1], kernel_dtype, fused,
                               run_tier)
    else:
        wav = None
    if wav is None:
        if segment_samples > 0:
            # the lax.scan path has no segmented mode: it would materialize
            # the FULL upsampled conditioning on device — the exact
            # allocation --segment-samples exists to avoid. Fail loudly
            # instead of silently violating the HBM-flat contract.
            raise RuntimeError(
                "--segment-samples requires the Pallas backend, but every "
                "kernel tier failed (see warnings above); re-run without "
                "--segment-samples or with a smaller --batch-size")
        wav = np.asarray(generate_fast(pp, cfg.model, c_up, key, noise=noise))
    return [wav[i, : n_samples[i]] for i in range(len(utts))]


def _decode_batch_dp(trainer, state, cfg: Config, utts, cond, n_samples,
                     key, mesh, use_pallas, kernel_dtype, fused: int = 0):
    """DP generation over a ('data',) mesh (BASELINE.json:10): the padded
    utterance batch is row-padded to a multiple of the mesh size (repeating
    the last row — the extra rows are discarded after trimming) and routed
    through generate_dp. The noise stream is drawn at the TRUE batch shape
    so the kept rows are sample-identical to single-device decode with the
    same key (locked by tests/test_recipe.py::test_decode_dp_cli)."""
    import jax
    import jax.numpy as jnp
    from shallow_wavenet_tpu.models.generate import generate_dp

    n_dev = mesh.devices.size
    B = len(utts)
    Bp = -(-B // n_dev) * n_dev
    variables = {"params": state.params}
    spk = (jnp.asarray([u.speaker for u in utts], jnp.int32)
           if cfg.model.n_speakers > 0 else None)
    if spk is not None and Bp > B:
        spk = jnp.concatenate(
            [spk, jnp.repeat(spk[-1:], Bp - B, axis=0)])
    cond = np.concatenate(
        [cond, np.repeat(cond[-1:], Bp - B, axis=0)]) if Bp > B else cond
    c_up, pp = _prep_fn(trainer.model)(variables, jnp.asarray(cond), spk)
    T = c_up.shape[1]
    noise = jax.random.uniform(key, (B, T), minval=1e-7, maxval=1.0 - 1e-7)
    if Bp > B:
        noise = jnp.concatenate(
            [noise, jnp.repeat(noise[-1:], Bp - B, axis=0)])
    # _prep_fn ran on the default device; re-place for the mesh (params
    # replicated, batch dims sharded on the data axis)
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    pp = jax.device_put(pp, NamedSharding(mesh, P()))
    c_up = jax.device_put(c_up, NamedSharding(mesh, P(axis)))
    noise = jax.device_put(noise, NamedSharding(mesh, P(axis)))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    wav = None
    if use_pallas:
        per_dev = Bp // n_dev

        def run_tier(dt, strm, chunk, fz):
            return np.asarray(generate_dp(
                pp, cfg.model, c_up, noise, mesh, use_pallas=True,
                chunk=chunk, stream=strm, dtype=dt, fused=fz))

        # probe at the PER-DEVICE batch — that is what each chip compiles
        wav = _run_tier_ladder(cfg, per_dev, T, kernel_dtype, fused,
                               run_tier)
    if wav is None:
        wav = np.asarray(generate_dp(pp, cfg.model, c_up, noise, mesh,
                                     use_pallas=False))
    return [wav[i, : n_samples[i]] for i in range(B)]


def shift_f0(utts, cfg: Config, stats_path, factor: float):
    """Scale the log-F0 conditioning column by `factor` on voiced frames —
    pitch transposition through the vocoder (the reference family's
    WORLD-vocoder VC use case). Features arrive normalized, so the column
    is un-normalized, shifted by ln(factor), and re-normalized; unvoiced
    frames (lf0 encoded 0, ops/f0.log_f0) are untouched."""
    from shallow_wavenet_tpu.bin.common import load_stats

    if cfg.data.feature_type != "world":
        raise ValueError("--f0-factor needs data.feature_type=world "
                         "(the mel feature set has no explicit F0 track)")
    if factor <= 0:
        raise ValueError("--f0-factor must be > 0")
    mean, std = load_stats(stats_path)
    shift = float(np.log(factor))
    for u in utts:
        lf0 = u.feats[:, 0] * max(std[0], 1e-8) + mean[0]
        vuv = u.feats[:, 1] * max(std[1], 1e-8) + mean[1]
        voiced = vuv > 0.5
        lf0 = np.where(voiced, lf0 + shift, lf0)
        u.feats[:, 0] = (lf0 - mean[0]) / max(std[0], 1e-8)
    return utts


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eval-scp", required=True)
    p.add_argument("--feats-dir", required=True)
    p.add_argument("--stats", default=None)
    p.add_argument("--workdir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--segment-samples", type=int, default=0,
                   help="decode in bounded segments of this many samples "
                        "(multiple of 64, greater than the model's "
                        "warm-start length: sum(dilations)+1 rounded up to "
                        "64) — bit-exact on the Pallas backend, keeps "
                        "device HBM flat for very long utterances")
    p.add_argument("--f0-factor", type=float, default=1.0,
                   help="scale the F0 conditioning track by this factor "
                        "before synthesis (world features only) — the "
                        "VC-style pitch-transposition knob; 1.0 = off")
    p.add_argument("--dp", action="store_true",
                   help="shard the utterance batch over all visible chips "
                        "(('data',) mesh, params replicated, Pallas kernel "
                        "per device — BASELINE config 4). Sample-identical "
                        "to single-device decode with the same --seed")
    p.add_argument("--fused", type=int, default=0,
                   help="fused-window size W for the Pallas kernel (0 = "
                        "off): shortens the per-sample matmul chain — "
                        "faster at small/medium batch, NOT bit-exact vs "
                        "the default kernel (see ops/ar_kernel.py)")
    p.add_argument("--kernel-dtype", default="auto",
                   choices=("auto", "float32", "bfloat16"),
                   help="restrict the Pallas backend to one weight dtype "
                        "(float32 tiers are bit-exact vs the scan path; "
                        "bfloat16 halves kernel VMEM)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler trace to <outdir>/profile")
    add_config_args(p)
    args = p.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)

    import jax

    utts = load_utterances(args.eval_scp, args.feats_dir, args.stats,
                           highpass_cutoff=cfg.data.highpass_cutoff,
                           sample_rate=cfg.data.sample_rate,
                           load_wav=False)  # decode consumes features only
    if args.f0_factor != 1.0:
        utts = shift_f0(utts, cfg, args.stats, args.f0_factor)
    paths = read_file_list(args.eval_scp)
    trainer, state, step = load_model_state(cfg, args.workdir)
    mesh = None
    if args.dp:
        from shallow_wavenet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.mesh)
        log.info("--dp: %d-device %s mesh", mesh.devices.size,
                 mesh.axis_names)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    from shallow_wavenet_tpu.utils.observability import maybe_profile

    total_audio_s, total_wall = 0.0, 0.0
    key = jax.random.key(args.seed)
    profile_ctx = maybe_profile(outdir / "profile" if args.profile else None)
    with profile_ctx:
        for i in range(0, len(utts), args.batch_size):
            chunk = utts[i : i + args.batch_size]
            t0 = time.time()
            wavs = decode_batch(trainer, state, cfg, chunk,
                                jax.random.fold_in(key, i),
                                segment_samples=args.segment_samples,
                                kernel_dtype=args.kernel_dtype,
                                mesh=mesh, fused=args.fused)
            wall = time.time() - t0
            audio_s = sum(len(w) for w in wavs) / cfg.data.sample_rate
            total_audio_s += audio_s
            total_wall += wall
            for u_path, w in zip(paths[i : i + args.batch_size], wavs):
                out = outdir / Path(u_path).name
                write_wav(out, w, cfg.data.sample_rate)
            log.info(
                "batch %d: %.2f audio-s in %.2f s (RTF %.3f)",
                i // args.batch_size, audio_s, wall,
                wall / max(audio_s, 1e-9))

    rtf = total_wall / max(total_audio_s, 1e-9)
    summary = {
        "utterances": len(utts), "model_step": step,
        "audio_seconds": total_audio_s, "wall_seconds": total_wall,
        "rtf": rtf, "audio_seconds_per_s": total_audio_s / max(total_wall, 1e-9),
    }
    (outdir / "decode_summary.json").write_text(json.dumps(summary, indent=2))
    log.info("decode: %s", summary)


if __name__ == "__main__":
    main()
