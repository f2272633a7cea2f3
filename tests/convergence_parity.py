"""Converged-quality parity harness: JAX vs the torch autograd twin
(BASELINE.json:5 "MCD within 0.1 dB of the PyTorch reference"; VERDICT r1
item 1).

tests/test_train_parity_torch.py checks that the first N loss values
track; this harness closes the rest of the fidelity contract: both
frameworks train from the SAME flax init on the SAME batch stream for
thousands of steps, both decode the eval set with the SAME noise stream
(JAX: models/generate.generate_fast; torch: torch_trainref.
generate_fast_torch), and the copy-synthesis MCDs must agree within
0.1 dB. Every quality number in BASELINE.md is thereby anchored to an
executable PyTorch reference rather than to the repo itself.

Runable standalone for the BASELINE.md row:
  python -m tests.convergence_parity [steps]
"""

from __future__ import annotations

import numpy as np


def build_cfg(head: str = "laplace"):
    from shallow_wavenet_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )

    c = Config(name="convergence_parity")
    # rf must exceed the corpus's longest pitch period (~89 samples at
    # 8 kHz for 90 Hz F0): stack_size=7 -> dilations 1..64, rf 127
    c.model = ModelConfig(
        n_stacks=1, stack_size=7, residual_channels=16, gate_channels=32,
        skip_channels=24, aux_channels=16, upsample_factors=(4, 5, 4),
        cond_channels=12, head=head, compute_dtype="float32",
    )
    c.data = DataConfig(sample_rate=8000, n_fft=256, hop_length=80,
                        win_length=200, n_mels=16, fmax=3800.0,
                        segment_length=800, batch_size=2)
    # the decay schedule is mirrored exactly in the torch twin
    # (train_steps lr_schedule); run_parity pins transition_steps to the
    # run length so the endpoint is annealed — an un-annealed endpoint
    # bounces around the loss landscape and the decode-time MCD inherits
    # that trajectory noise (the first 15k-step constant-lr run measured
    # |delta| 0.144 dB from noise alone; see BASELINE.md)
    c.train = TrainConfig(learning_rate=1e-3, lr_decay_rate=0.3,
                          grad_clip_norm=10.0)
    return c


def build_corpus(root, cfg, n_train=6, n_eval=4):
    """Synthetic corpus + normalized log-mel features, returns
    (train_utts, eval_utts) as dataset.Utterance lists."""
    from shallow_wavenet_tpu.data.audio_io import read_wav
    from shallow_wavenet_tpu.data.dataset import Utterance
    from shallow_wavenet_tpu.data.synthetic import make_corpus
    from shallow_wavenet_tpu.ops.stft import log_mel_spectrogram_np

    lists = make_corpus(root, n_train=n_train, n_eval=n_eval,
                        sample_rate=cfg.data.sample_rate, duration_s=1.0)

    def feats_of(path):
        wav, sr = read_wav(path)
        n_frames = len(wav) // cfg.data.hop_length
        mel = log_mel_spectrogram_np(
            wav, sr, cfg.data.n_fft, cfg.data.hop_length,
            cfg.data.win_length, cfg.data.n_mels, cfg.data.fmin,
            cfg.data.fmax)[:n_frames]
        return wav, mel.astype(np.float32)

    raw = {split: [feats_of(p) for p in lists[split]]
           for split in ("train", "eval")}
    train_feats = np.concatenate([f for _, f in raw["train"]])
    mean = train_feats.mean(axis=0)
    std = np.maximum(train_feats.std(axis=0), 1e-8)
    out = {}
    for split in ("train", "eval"):
        out[split] = [Utterance(wav=w.astype(np.float32),
                                feats=(f - mean) / std)
                      for w, f in raw[split]]
    return out["train"], out["eval"]


N_DRAWS = 4     # noise streams per eval utterance (decode-variance control)


def _train_jax(trainer, batches, log, tag="jax", perturb=0.0):
    """Train the flax model over the fixed batch stream; returns (params,
    losses). perturb != 0 applies a relative perturbation to the init —
    two such runs measure the floating-point chaos floor of the 20k-step
    AR training trajectory (any O(ulp) difference grows to genuinely
    different weights; see BASELINE.md 'JAX vs torch twin')."""
    import jax

    state = trainer.init_state()
    if perturb:
        state = state.replace(params=jax.tree.map(
            lambda p: p * (1.0 + perturb), state.params))
    losses = []
    for i, b in enumerate(batches):
        state, metrics = trainer.step_fn(state, b)
        if (i + 1) % 500 == 0:
            log(f"  {tag} step {i + 1}: loss {float(metrics['loss']):.4f}")
        losses.append(float(metrics["loss"]))
    return state.params, losses


def _decode_jax(trainer, cfg, params, eval_utts, noises):
    """Copy-synthesize each eval utterance with N_DRAWS shared noise
    streams (batched); returns list of (N_DRAWS, T) waveforms."""
    import jax
    import jax.numpy as jnp

    from shallow_wavenet_tpu.models.generate import generate_fast
    from shallow_wavenet_tpu.models.wavenet import extract_plain_params

    variables = {"params": params}
    pp = extract_plain_params(variables, cfg.model)
    outs = []
    for u, noise in zip(eval_utts, noises):
        cond = jnp.asarray(np.repeat(u.feats[None], N_DRAWS, axis=0))
        c_up = trainer.model.apply(variables, cond, method="upsample_cond")
        outs.append(np.asarray(generate_fast(
            pp, cfg.model, c_up, jax.random.key(0),
            noise=jnp.asarray(noise))))
    return outs


def _mcd_avg(cfg, eval_utts, gens):
    """Mean copy-synthesis MCD over utterances and noise draws."""
    import jax.numpy as jnp

    from shallow_wavenet_tpu.ops.mcep import mcd, mcep_analysis

    def frames(x):
        return mcep_analysis(jnp.asarray(x), cfg.data.n_fft,
                             cfg.data.hop_length, cfg.data.win_length,
                             cfg.noise_shaping.mcep_order,
                             cfg.noise_shaping.alpha)

    vals = []
    for u, g in zip(eval_utts, gens):
        n = min(len(u.wav), g.shape[1])
        a = frames(u.wav[:n])
        for d in range(g.shape[0]):
            vals.append(float(mcd(a, frames(g[d, :n]))))
    return float(np.mean(vals))


def run_parity(root, steps=2000, seed=0, log=print, noise_floor=True,
               head="laplace", n_eval=12,
               floor_perturbs=(1e-7,), with_torch=True,
               torch_floor_perturbs=()):
    """Train both frameworks from the same init on the same batch stream,
    copy-synthesize the eval set with shared noise (N_DRAWS streams per
    utterance, MCD averaged), and — when noise_floor — train additional jax
    models from relatively-perturbed inits (one per entry of
    floor_perturbs) to measure the intra-framework chaos floor the
    inter-framework delta must be judged against as a DISTRIBUTION, not a
    point (VERDICT r2 item 1). torch_floor_perturbs additionally trains
    TORCH legs from perturbed inits — symmetric evidence that the chaos
    floor is framework-independent, not a JAX artifact (VERDICT r3
    item 2). Returns {"jax": mcd, "torch": mcd, "jax_perturbed": [mcd,
    ...], "torch_perturbed": [mcd, ...], "jax_losses": [...],
    "torch_losses": [...]}."""
    import dataclasses

    import jax
    import torch

    from shallow_wavenet_tpu.data.dataset import SegmentSampler
    from tests import torch_trainref as ttr

    from shallow_wavenet_tpu.training import Trainer

    cfg = build_cfg(head=head)
    # anneal over the run: lr(t) = lr0 * rate^(t / transition_steps)
    # (optax.exponential_decay, continuous), ending at lr0 * rate^3
    cfg.train = dataclasses.replace(cfg.train,
                                    lr_decay_steps=max(steps // 3, 1))
    # n_eval=12 x N_DRAWS=4 shrinks the MCD-estimator variance that round
    # 2's 4-utterance floor could not separate from trajectory chaos
    train_utts, eval_utts = build_corpus(root, cfg, n_eval=n_eval)
    sampler = SegmentSampler(
        train_utts, batch_size=cfg.data.batch_size,
        segment_length=cfg.data.segment_length,
        hop_length=cfg.data.hop_length,
        receptive_field=cfg.model.receptive_field, seed=seed)
    batches = [next(sampler) for _ in range(steps)]
    for b in batches:
        b.pop("speaker", None)

    trainer = Trainer(cfg, mesh=None)
    params_j, jax_losses = _train_jax(trainer, batches, log)
    perturbed_params = []
    if noise_floor:
        for pi, pert in enumerate(floor_perturbs):
            pp_i, _ = _train_jax(trainer, batches, log,
                                 tag=f"jax-perturbed[{pert:g}]",
                                 perturb=pert)
            perturbed_params.append(pp_i)

    # shared noise per (utterance, draw): both frameworks consume the
    # identical uniform streams, so decode sampling noise cancels up to
    # the (genuinely different) trained weights
    rng = np.random.default_rng(1234)
    hop = int(np.prod(cfg.model.upsample_factors))
    noises = [rng.uniform(1e-7, 1 - 1e-7,
                          (N_DRAWS, (len(u.feats)) * hop)).astype(np.float32)
              for u in eval_utts]

    out = {"jax_losses": jax_losses}
    out["jax"] = _mcd_avg(cfg, eval_utts,
                          _decode_jax(trainer, cfg, params_j, eval_utts,
                                      noises))
    out["jax_perturbed"] = [
        _mcd_avg(cfg, eval_utts,
                 _decode_jax(trainer, cfg, pp_i, eval_utts, noises))
        for pp_i in perturbed_params]
    if not with_torch:
        # floors-only mode: the chaos-floor distribution needs many
        # perturbed JAX runs but only one torch leg per replication — this
        # skips the (3x more expensive) torch side entirely
        out["torch"] = None
        out["torch_losses"] = []
        out["torch_perturbed"] = []
        return out

    quantize = None
    if head == "softmax":
        from shallow_wavenet_tpu.ops.mulaw import mulaw_quantize

        def quantize(x):
            return torch.from_numpy(np.array(
                mulaw_quantize(x.numpy(), cfg.model.quantize_channels)))

    init_params = trainer.init_state().params
    lr0, rate = cfg.train.learning_rate, cfg.train.lr_decay_rate
    trans = cfg.train.lr_decay_steps
    sched = lambda t: lr0 * rate ** (t / trans)   # noqa: E731 — optax twin

    def _torch_leg(tp, tag):
        """Train + decode one torch twin; returns (losses, mcd). ONE
        optimizer across all chunks: Adam moments and bias correction
        persist exactly like the optax chain's (ADVICE r2 medium)."""
        opt = ttr.make_optimizer(tp, lr0)
        losses = []
        chunk = 500
        for s in range(0, steps, chunk):
            losses += ttr.train_steps(
                tp, cfg.model, cfg.data.segment_length,
                batches[s:s + chunk], lr=lr0,
                clip_norm=cfg.train.grad_clip_norm,
                lr_schedule=sched, step_offset=s, opt=opt,
                quantize=quantize)
            log(f"  {tag} step {min(s + chunk, steps)}: "
                f"loss {losses[-1]:.4f}")
        gens = []
        for u, noise in zip(eval_utts, noises):
            with torch.no_grad():
                c_up_t = ttr.upsample_cond(
                    tp, cfg.model, torch.from_numpy(
                        np.repeat(u.feats[None], N_DRAWS, axis=0)))
            gens.append(ttr.generate_fast_torch(
                tp, cfg.model, c_up_t, torch.from_numpy(noise)))
        return losses, _mcd_avg(cfg, eval_utts, gens)

    out["torch_losses"], out["torch"] = _torch_leg(
        ttr.params_to_torch(init_params), "torch")
    # torch-side chaos floors: same relative init perturbation, applied to
    # the TORCH twin's init — if these deltas are in family with the JAX
    # floors, the chaos floor is a property of fp32 AR training, not of
    # either framework
    out["torch_perturbed"] = []
    for pert in torch_floor_perturbs:
        tp_i = ttr.params_to_torch(jax.tree.map(
            lambda p: p * (1.0 + pert), init_params))
        _, mcd_i = _torch_leg(tp_i, f"torch-perturbed[{pert:g}]")
        out["torch_perturbed"].append(mcd_i)
    return out


if __name__ == "__main__":
    import argparse
    import json
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("steps", type=int, nargs="?", default=2000)
    ap.add_argument("seed", type=int, nargs="?", default=0)
    ap.add_argument("--head", default="laplace",
                    choices=("laplace", "softmax"))
    ap.add_argument("--n-eval", type=int, default=12)
    # comma-separated (not nargs) so negative scientific-notation values
    # like -1e-7 survive argparse's option matcher
    floats = lambda s: [float(x) for x in s.split(",") if x]  # noqa: E731
    ap.add_argument("--floors", type=floats, default=[1e-7],
                    help="comma-separated relative init perturbations, one "
                         "chaos-floor training run each ('' = skip)")
    ap.add_argument("--torch-floors", type=floats, default=[],
                    help="comma-separated relative init perturbations "
                         "applied to the TORCH twin's init, one extra torch"
                         " training leg each (torch-side chaos-floor "
                         "samples; implies the torch baseline leg)")
    ap.add_argument("--json", default=None,
                    help="append the result as one JSON line to this file")
    ap.add_argument("--no-torch", action="store_true",
                    help="floors-only: skip the torch leg (cheap extra "
                         "chaos-floor samples)")
    a = ap.parse_args()
    if a.torch_floors and a.no_torch:
        ap.error("--torch-floors needs the torch baseline leg "
                 "(drop --no-torch)")
    for vals, name in ((a.floors, "--floors"),
                       (a.torch_floors, "--torch-floors")):
        if len(set(vals)) != len(vals):
            # training is DETERMINISTIC given (init, batch stream): two
            # identical perturbations produce bit-identical trajectories,
            # not independent floor samples (r4 measured: exact dup)
            ap.error(f"duplicate {name} values would be bit-identical "
                     "runs; vary sign, magnitude, or the seed instead")
    with tempfile.TemporaryDirectory() as root:
        r = run_parity(root, steps=a.steps, seed=a.seed, head=a.head,
                       n_eval=a.n_eval, floor_perturbs=tuple(a.floors),
                       noise_floor=bool(a.floors),
                       with_torch=not a.no_torch,
                       torch_floor_perturbs=tuple(a.torch_floors))
    mj, mt = r["jax"], r["torch"]
    if mt is not None:
        print(f"steps={a.steps} seed={a.seed} head={a.head}: "
              f"MCD jax {mj:.3f} dB, torch {mt:.3f} dB, "
              f"|delta| {abs(mj - mt):.3f} dB")
    else:
        print(f"steps={a.steps} seed={a.seed} head={a.head}: "
              f"MCD jax {mj:.3f} dB (floors-only)")
    for pert, mj2 in zip(a.floors, r["jax_perturbed"]):
        print(f"  chaos floor (jax vs jax*(1+{pert:g}) init): "
              f"jax2 {mj2:.3f} dB, |delta| {abs(mj - mj2):.3f} dB")
    for pert, mt2 in zip(a.torch_floors, r["torch_perturbed"]):
        print(f"  chaos floor (torch vs torch*(1+{pert:g}) init): "
              f"torch2 {mt2:.3f} dB, |delta| {abs(mt - mt2):.3f} dB")
    if a.json:
        # floors as [perturbation, delta] PAIRS, not a dict — duplicate
        # magnitudes (legitimate repeated samples) must not collapse to
        # one key (ADVICE r3 low)
        rec = {"steps": a.steps, "seed": a.seed, "head": a.head,
               "n_eval": a.n_eval, "n_draws": N_DRAWS,
               "jax": mj, "torch": mt,
               "delta": abs(mj - mt) if mt is not None else None,
               "floors": [[p, abs(mj - m)]
                          for p, m in zip(a.floors, r["jax_perturbed"])],
               "torch_floors": [[p, abs(mt - m)]
                                for p, m in zip(a.torch_floors,
                                                r["torch_perturbed"])],
               "jax_perturbed": r["jax_perturbed"],
               "torch_perturbed": r["torch_perturbed"],
               "final_loss_jax": r["jax_losses"][-1]}
        if r["torch_losses"]:
            rec["final_loss_torch"] = r["torch_losses"][-1]
        with open(a.json, "a") as f:
            f.write(json.dumps(rec) + "\n")
