#!/bin/bash
# Round-5 TPU queue, part 2. Waits on the deep run's EXACT PID (passed as
# $1 — liveness-checked with kill -0, nothing pattern-based), then runs
# the remaining chip jobs sequentially.
set -x
cd /root/repo
DEEP_PID=${1:?usage: r5_tpu_queue2.sh <deep-run-pid>}
while kill -0 "$DEEP_PID" 2>/dev/null; do sleep 30; done

# --- item 2: pitch-control on the FORMANT corpus (F0-independent
# envelopes + envelope smoothing: lf0 is the only pitch cue) -----------
PW=/root/runs/r5_pitch_fmt
CONF=egs/synthetic/shallow_laplace_ns/conf/config.json
OV="data.feature_type=world model.aux_channels=31 data.sample_rate=16000 data.envelope_smoothing=true"
timeout 3000 python -m shallow_wavenet_tpu.bin.run --config $CONF \
  --workdir $PW --stage 4 --stop-stage 6 train.steps=60000 $OV
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
  --json /root/runs/r5_pitch_fmt_eval.json

# --- item 6a: config 4 multi-speaker refresh (speechlike + boost) ------
timeout 3000 python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/multispk_dp/conf/config.json \
  --workdir /root/runs/r5_multispk --stage 4 --stop-stage 6 \
  train.steps=80000 data.silence_boost=0.25

# --- item 6b: config 5d fine-tune demo (warm vs scratch, new corpus) ---
DCONF=egs/synthetic/deep_baseline/conf/config.json
for MODE in warm scratch; do
  W=/root/runs/r5_ft_$MODE
  mkdir -p $W
  cp -r /root/runs/r5_ft_corpus/corpus /root/runs/r5_ft_corpus/feats $W/
  cp /root/runs/r5_ft_corpus/stats.h5 $W/
  cp -r /root/runs/r5_ft_corpus/shaped_wav $W/
  INIT=""
  [ $MODE = warm ] && INIT="--init-from /root/runs/r5_deep_world_energy/model"
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
echo "R5 TPU QUEUE2 DONE"
