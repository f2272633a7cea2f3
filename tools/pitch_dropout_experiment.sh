#!/bin/bash
# The prepared pitch-binding experiment (BASELINE.md r5 pitch mechanism):
# retrain the formant-corpus world config WITH AR-context dropout
# (train.context_dropout — implemented + unit-tested in r5, see
# tests/test_train.py::test_context_dropout_*), then re-run the
# transposition eval. The r5 negative showed teacher forcing lets the AR
# context supply pitch for free on a source-filter-independent corpus, so
# lf0 conditioning never binds; span dropout at pitch-period timescales
# removes that free signal. Budget: ~2 h on one v5e (150k steps at
# ~108 it/s + 3 decodes + eval).
set -ex
export PATH=/opt/venv/bin:$PATH
cd /root/repo
PW=${1:-/root/runs/pitch_dropout}
CONF=egs/synthetic/shallow_laplace_ns/conf/config.json
OV="data.feature_type=world model.aux_channels=31 data.sample_rate=16000
    data.envelope_smoothing=true train.context_dropout=0.3
    train.context_dropout_span_ms=15"

# --corpus-f0-range 80,340 reproduces the r5 negative's corpus exactly
# (same generator seed + span), so this is a pure A/B on the dropout knob
python -m shallow_wavenet_tpu.bin.run --config $CONF --workdir $PW \
  --corpus-style formant --n-train 24 --n-eval 3 \
  --corpus-f0-range 80,340 \
  --stage 0 --stop-stage 6 train.steps=150000 $OV
for F in 0.7 1.3; do
  T=$(echo $F | tr -d .)
  python -m shallow_wavenet_tpu.bin.decode \
    --eval-scp $PW/corpus/eval.scp --feats-dir $PW/feats \
    --stats $PW/stats.h5 --workdir $PW/model --outdir $PW/gen_f$T \
    --f0-factor $F --config $CONF $OV
  python -m shallow_wavenet_tpu.bin.noise_shaping \
    --wav-scp $PW/corpus/eval.scp --stats $PW/stats.h5 \
    --outdir $PW/restored_f$T --inv --indir $PW/gen_f$T --config $CONF $OV
done
python tools/pitch_eval.py --ref-scp $PW/corpus/eval.scp \
  --config $PW/model/config.json \
  --pair 1.0:$PW/restored_wav \
  --pair 0.7:$PW/restored_f07 --pair 1.3:$PW/restored_f13 \
  --json $PW/pitch_eval.json
