"""Training CLI (component C11; reference `src/bin/train.py`, call stack
SURVEY.md §3.3). Resumes automatically from the latest checkpoint in
--workdir. Data-parallel over all visible devices when the preset's mesh
config asks for it (SURVEY.md §5.8)."""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from shallow_wavenet_tpu.bin.common import (
    add_config_args, load_utterances, resolve_config, setup_logging,
)
from shallow_wavenet_tpu.data.dataset import SegmentSampler

log = logging.getLogger("train")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-scp", required=True)
    p.add_argument("--dev-scp", default=None,
                   help="held-out list for periodic eval loss")
    p.add_argument("--feats-dir", required=True)
    p.add_argument("--stats", default=None)
    p.add_argument("--waveform-dir", default=None,
                   help="noise-shaped training waveforms (stage 3 output)")
    p.add_argument("--workdir", required=True)
    p.add_argument("--init-from", default=None,
                   help="warm-start params from another run's latest "
                        "checkpoint (fine-tuning); optimizer, step and LR "
                        "schedule start fresh. Ignored when --workdir "
                        "already has a checkpoint to resume from.")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler trace to <workdir>/profile")
    p.add_argument("--debug-nans", action="store_true",
                   help="fail fast on NaNs inside jit (SURVEY.md §5.2)")
    add_config_args(p)
    args = p.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)
    if args.debug_nans:
        from shallow_wavenet_tpu.utils.observability import enable_debug_mode

        enable_debug_mode()

    from shallow_wavenet_tpu.parallel.mesh import make_mesh, process_shard
    from shallow_wavenet_tpu.training import Trainer

    mesh = make_mesh(cfg.mesh)
    utts = load_utterances(args.train_scp, args.feats_dir, args.stats,
                           args.waveform_dir,
                           highpass_cutoff=cfg.data.highpass_cutoff,
                           sample_rate=cfg.data.sample_rate)
    utts = process_shard(utts)
    log.info("loaded %d utterances (this process)", len(utts))

    # per-PROCESS batch: this host assembles only the rows its own devices
    # consume (mesh.local_mesh covers exactly those)
    global_batch = cfg.data.batch_size * (
        mesh.local_mesh.size if mesh is not None else 1
    )
    sampler = SegmentSampler(
        utts, batch_size=global_batch,
        segment_length=cfg.data.segment_length,
        hop_length=cfg.data.hop_length,
        receptive_field=cfg.model.receptive_field,
        seed=cfg.train.seed,
        silence_boost=cfg.data.silence_boost,
    )

    eval_batches = None
    if args.dev_scp:
        # eval on the SAME signal distribution as training: with noise
        # shaping the dev waveforms must be the stage-3 pre-emphasized ones,
        # else eval loss measures a spectrally different target
        dev_wavdir = args.waveform_dir
        if dev_wavdir:
            from shallow_wavenet_tpu.data.dataset import read_file_list

            missing = [p for p in read_file_list(args.dev_scp)
                       if not (Path(dev_wavdir) / Path(p).name).exists()]
            if missing:
                log.warning(
                    "%d dev waveform(s) missing from %s (re-run stage 3); "
                    "eval loss falls back to unshaped dev waveforms",
                    len(missing), dev_wavdir)
                dev_wavdir = None
        dev_utts = load_utterances(args.dev_scp, args.feats_dir, args.stats,
                                   dev_wavdir,
                                   highpass_cutoff=cfg.data.highpass_cutoff,
                                   sample_rate=cfg.data.sample_rate)
        dev_sampler = SegmentSampler(
            dev_utts, batch_size=global_batch,
            segment_length=cfg.data.segment_length,
            hop_length=cfg.data.hop_length,
            receptive_field=cfg.model.receptive_field, seed=12345,
        )
        eval_batches = [next(dev_sampler) for _ in range(4)]

    trainer = Trainer(cfg, mesh)
    state = trainer.init_state()
    state, sampler_state, start = trainer.restore(args.workdir, state)
    if sampler_state is not None:
        sampler.set_state(sampler_state)
    if start == 0 and args.init_from:
        # fine-tune: fresh run seeded with pretrained params; own-workdir
        # resume takes precedence so a preempted fine-tune continues itself
        state = trainer.warm_start(args.init_from, state)
    from shallow_wavenet_tpu.utils.observability import maybe_profile

    with maybe_profile(Path(args.workdir) / "profile" if args.profile
                       else None):
        trainer.fit(state, sampler, args.workdir, steps=args.steps,
                    eval_batches=eval_batches)


if __name__ == "__main__":
    main()
