#!/bin/bash
# Round-5 pitch-control chain (VERDICT r4 item 2), driven this session.
set -x
cd /root/repo
PW=/root/runs/r5_pitch_fmt
CONF=egs/synthetic/shallow_laplace_ns/conf/config.json
OV="data.feature_type=world model.aux_channels=31 data.sample_rate=16000 data.envelope_smoothing=true"
timeout 2500 python -m shallow_wavenet_tpu.bin.run --config $CONF \
  --workdir $PW --stage 4 --stop-stage 6 train.steps=150000 $OV
for F in 0.7 1.3; do
  T=$(echo $F | tr -d .)
  timeout 1200 python -m shallow_wavenet_tpu.bin.decode \
    --eval-scp $PW/corpus/eval.scp --feats-dir $PW/feats \
    --stats $PW/stats.h5 --workdir $PW/model --outdir $PW/gen_f$T \
    --f0-factor $F --config $CONF $OV
  timeout 600 python -m shallow_wavenet_tpu.bin.noise_shaping \
    --wav-scp $PW/corpus/eval.scp --stats $PW/stats.h5 \
    --outdir $PW/restored_f$T --inv --indir $PW/gen_f$T --config $CONF $OV
done
timeout 1800 python tools/pitch_eval.py --ref-scp $PW/corpus/eval.scp \
  --config $PW/model/config.json \
  --pair 1.0:$PW/restored_wav \
  --pair 0.7:$PW/restored_f07 --pair 1.3:$PW/restored_f13 \
  --json /root/runs/r5_pitch_fmt150_eval.json
echo "PITCH CHAIN DONE"
