"""Recipe runner — the L5 staged pipeline (component C1; reference
`egs/<corpus>/<recipe>/run.sh`, call stack SURVEY.md §3.1).

Stages (same numbering as the reference's run.sh):
  0  data prep       — synthetic corpus + train/eval scp lists (no real
                       corpus ships in this image), or reuse existing scps
  1  feature extract — log-mel HDF5 per utterance
  2  statistics      — mean/std (+ avg mcep when noise shaping enabled)
  3  noise shaping   — MLSA pre-emphasis of training waveforms
  4  train           — teacher-forced training
  5  decode          — batched AR generation (copy-synthesis of eval set)
  6  restoration     — MLSA de-emphasis of generated waveforms + MCD eval

`--stage N --stop-stage M` resumes mid-pipeline exactly like the reference
(SURVEY.md §5.3 failure-recovery philosophy).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from shallow_wavenet_tpu.bin import calc_stats, decode, feature_extract
from shallow_wavenet_tpu.bin import train as train_cli
from shallow_wavenet_tpu.bin.common import resolve_config, setup_logging
from shallow_wavenet_tpu.config import PRESETS

log = logging.getLogger("run")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="shallow_softmax_single",
                   choices=sorted(PRESETS))
    p.add_argument("--config", default=None)
    p.add_argument("--workdir", required=True)
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--stop-stage", type=int, default=6)
    p.add_argument("--steps", type=int, default=None, help="override train steps")
    p.add_argument("--init-from", default=None,
                   help="fine-tune: warm-start stage-4 params from another "
                        "run's model dir (see bin/train.py --init-from)")
    p.add_argument("--n-train", type=int, default=8)
    p.add_argument("--n-eval", type=int, default=2)
    p.add_argument("--corpus-seed", type=int, default=1234,
                   help="synthetic-corpus RNG seed (stage 0): a different "
                        "seed gives genuinely different utterances, e.g. "
                        "as the target data of an --init-from fine-tune")
    p.add_argument("--corpus-style", default="harmonic",
                   choices=("harmonic", "speechlike", "formant"),
                   help="synthetic-corpus style (stage 0): 'speechlike' / 'formant' "
                        "adds F0 glides, unvoiced bursts and silence")
    p.add_argument("--corpus-f0-range", default=None,
                   help="speechlike corpus F0 span as 'LO,HI' Hz (stage "
                        "0) — e.g. '80,340' for the wide pitch-control "
                        "corpus; default keeps the historical 90-240 Hz. "
                        "Multi-speaker configs split the span into "
                        "per-speaker bands")
    p.add_argument("--wav-dir", default=None,
                   help="stage 0: ingest an EXTERNAL corpus — every *.wav "
                        "under this directory (recursive; any PCM "
                        "width/rate/channels — resampled and downmixed on "
                        "load) is deterministically split into train/eval "
                        "scps instead of synthesizing a corpus")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)
    ov = list(args.overrides or [])

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    corpus = wd / "corpus"
    feats = wd / "feats"
    stats = wd / "stats.h5"
    shaped = wd / "shaped_wav"
    gen = wd / "gen_wav"
    restored = wd / "restored_wav"
    train_scp = corpus / "train.scp"
    eval_scp = corpus / "eval.scp"
    model_dir = wd / "model"
    cfg_args = (["--config", args.config] if args.config
                else ["--preset", args.preset])

    def stage_on(n):
        return args.stage <= n <= args.stop_stage

    if stage_on(0):
        log.info("== stage 0: data prep ==")
        if train_scp.exists():
            log.info("scp lists already exist in %s — keeping", corpus)
        elif args.wav_dir:
            # external-corpus ingestion (VERDICT r1 item 4): deterministic
            # sorted split — last n_eval utterances become the eval set
            wavs = sorted(str(p) for p in Path(args.wav_dir).rglob("*.wav"))
            if len(wavs) < 2:
                raise SystemExit(
                    f"--wav-dir {args.wav_dir}: need at least 2 wavs, "
                    f"found {len(wavs)}")
            n_eval = min(args.n_eval, len(wavs) - 1)
            corpus.mkdir(parents=True, exist_ok=True)
            train_scp.write_text("\n".join(wavs[:-n_eval]) + "\n")
            eval_scp.write_text("\n".join(wavs[-n_eval:]) + "\n")
            log.info("external corpus %s: %d train / %d eval",
                     args.wav_dir, len(wavs) - n_eval, n_eval)
        else:
            from shallow_wavenet_tpu.data.synthetic import make_corpus

            f0r = None
            if args.corpus_f0_range:
                lo, _, hi = args.corpus_f0_range.partition(",")
                f0r = (float(lo), float(hi))
            make_corpus(
                corpus, n_train=args.n_train, n_eval=args.n_eval,
                sample_rate=cfg.data.sample_rate, duration_s=1.0,
                n_speakers=max(cfg.model.n_speakers, 1),
                seed=args.corpus_seed, style=args.corpus_style,
                f0_range=f0r,
            )
            log.info("synthetic corpus (%s): %d train / %d eval",
                     args.corpus_style, args.n_train, args.n_eval)

    if stage_on(1):
        log.info("== stage 1: feature extraction ==")
        # both splits share one feats dir keyed by wav stem — a duplicate
        # stem would silently cross-wire one split's waveforms with the
        # other's features
        from shallow_wavenet_tpu.data.dataset import read_file_list

        stems: dict[str, str] = {}
        for scp in (train_scp, eval_scp):
            for wp in read_file_list(scp):
                stem = Path(wp).stem
                if stems.setdefault(stem, wp) != wp:
                    raise ValueError(
                        f"duplicate wav stem {stem!r}: {stems[stem]} and "
                        f"{wp} would write the same {stem}.h5 in {feats}")
        for scp in (train_scp, eval_scp):
            feature_extract.main(
                ["--wav-scp", str(scp), "--outdir", str(feats), *cfg_args, *ov]
            )

    if stage_on(2):
        log.info("== stage 2: statistics ==")
        calc_stats.main(
            ["--wav-scp", str(train_scp), "--feats-dir", str(feats),
             "--out", str(stats), *cfg_args, *ov]
        )

    if stage_on(3):
        if cfg.noise_shaping.enabled:
            log.info("== stage 3: noise shaping (pre-emphasis) ==")
            from shallow_wavenet_tpu.bin import noise_shaping

            # shape BOTH splits: training consumes shaped train waveforms,
            # and the dev eval loss must measure the same (pre-emphasized)
            # signal distribution the model is trained on
            for scp in (train_scp, eval_scp):
                noise_shaping.main(
                    ["--wav-scp", str(scp), "--stats", str(stats),
                     "--outdir", str(shaped), *cfg_args, *ov]
                )
        else:
            log.info("== stage 3: noise shaping disabled — skipped ==")

    if stage_on(4):
        log.info("== stage 4: training ==")
        extra = ["--steps", str(args.steps)] if args.steps else []
        if cfg.noise_shaping.enabled:
            extra += ["--waveform-dir", str(shaped)]
        if args.init_from:
            extra += ["--init-from", args.init_from]
        train_cli.main(
            ["--train-scp", str(train_scp), "--dev-scp", str(eval_scp),
             "--feats-dir", str(feats),
             "--stats", str(stats), "--workdir", str(model_dir),
             *extra, *cfg_args, *ov]
        )

    if stage_on(5):
        log.info("== stage 5: decoding ==")
        decode.main(
            ["--eval-scp", str(eval_scp), "--feats-dir", str(feats),
             "--stats", str(stats), "--workdir", str(model_dir),
             "--outdir", str(gen), *cfg_args, *ov]
        )

    if stage_on(6):
        if cfg.noise_shaping.enabled:
            log.info("== stage 6: de-emphasis restoration + MCD ==")
            from shallow_wavenet_tpu.bin import noise_shaping

            noise_shaping.main(
                ["--wav-scp", str(eval_scp), "--stats", str(stats),
                 "--outdir", str(restored), "--inv", "--indir", str(gen),
                 *cfg_args, *ov]
            )
            final = restored
        else:
            log.info("== stage 6: restoration skipped (no noise shaping) ==")
            final = gen
        from shallow_wavenet_tpu.bin import mcd_eval

        mcd_eval.main(
            ["--ref-scp", str(eval_scp), "--gen-dir", str(final),
             "--out", str(wd / "mcd.json"), *cfg_args, *ov]
        )


if __name__ == "__main__":
    main()
