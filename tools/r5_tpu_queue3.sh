#!/bin/bash
# Round-5 TPU queue, part 3 (reprioritized after the r5 energy-alignment
# finding): deep-v2 retrain with the CENTERED energy channel first (the
# round's top criterion), then the 150k formant-corpus pitch run, then
# the fine-tune pair warm-started from deep-v2, then pool/roofline/bench.
# $1 = PID to wait on (exact, kill -0 liveness check only).
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# --- item 1: deep world+boost+energy(centered) 120k --------------------
timeout 7000 python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/deep_baseline/conf/config.json \
  --workdir /root/runs/r5_deep_v2 \
  --corpus-style speechlike --n-train 48 --n-eval 4 \
  --stage 4 --stop-stage 6 train.steps=120000

# --- item 2: formant-corpus pitch run, 150k ----------------------------
PW=/root/runs/r5_pitch_fmt
CONF=egs/synthetic/shallow_laplace_ns/conf/config.json
OV="data.feature_type=world model.aux_channels=31 data.sample_rate=16000 data.envelope_smoothing=true"
timeout 3000 python -m shallow_wavenet_tpu.bin.run --config $CONF \
  --workdir $PW --stage 4 --stop-stage 6 train.steps=150000 $OV
for F in 0.7 1.3; do
  T=$(echo $F | tr -d .)
  timeout 1800 python -m shallow_wavenet_tpu.bin.decode \
    --eval-scp $PW/corpus/eval.scp --feats-dir $PW/feats \
    --stats $PW/stats.h5 --workdir $PW/model --outdir $PW/gen_f$T \
    --f0-factor $F --config $CONF $OV
  timeout 600 python -m shallow_wavenet_tpu.bin.noise_shaping \
    --wav-scp $PW/corpus/eval.scp --stats $PW/stats.h5 \
    --outdir $PW/restored_f$T --inv --indir $PW/gen_f$T --config $CONF $OV
done
timeout 2400 python tools/pitch_eval.py --ref-scp $PW/corpus/eval.scp \
  --config $PW/model/config.json \
  --pair 1.0:$PW/restored_wav \
  --pair 0.7:$PW/restored_f07 --pair 1.3:$PW/restored_f13 \
  --json /root/runs/r5_pitch_fmt150_eval.json

# --- item 6b: config 5d fine-tune demo, warm-started from deep-v2 ------
DCONF=egs/synthetic/deep_baseline/conf/config.json
for MODE in warm scratch; do
  W=/root/runs/r5_ft_$MODE
  rm -rf $W
  mkdir -p $W
  cp -r /root/runs/r5_ft_corpus/corpus /root/runs/r5_ft_corpus/feats $W/
  cp /root/runs/r5_ft_corpus/stats.h5 $W/
  cp -r /root/runs/r5_ft_corpus/shaped_wav $W/
  INIT=""
  [ $MODE = warm ] && INIT="--init-from /root/runs/r5_deep_v2/model"
  timeout 3000 python -m shallow_wavenet_tpu.bin.run --config $DCONF \
    --workdir $W --stage 4 --stop-stage 6 train.steps=15000 $INIT
done

# --- item 4 done-criterion: pooled tail-cycle measurement --------------
timeout 900 python tools/stream_bench.py 4 6 60 4 pool
timeout 900 python tools/stream_bench.py 8 6 60 4 pool

# --- item 3: training roofline rows ------------------------------------
timeout 900 python tools/train_roofline.py shallow_laplace_single 8 \
  json=/root/runs/r5_roofline_b8.json
timeout 900 python tools/train_roofline.py shallow_laplace_single 8 \
  segment=16000 json=/root/runs/r5_roofline_b8s16.json
timeout 900 python tools/train_roofline.py shallow_laplace_single 8 \
  fold=1 json=/root/runs/r5_roofline_b8fold.json
timeout 900 python tools/train_roofline.py deep_baseline 8 \
  json=/root/runs/r5_roofline_deep.json

# --- round health: bench -----------------------------------------------
timeout 900 python bench.py
echo "R5 TPU QUEUE3 DONE"
