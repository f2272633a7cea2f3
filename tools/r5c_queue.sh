#!/bin/bash
# Round-5 continuation queue, part 2 (after the pitch-dropout A/B frees
# the chip): the items the earlier 1-h-budget sessions could not fit.
#   1. deep-v2 resumed to 120k (VERDICT r4 item 1b's FULL criterion:
#      MCD <= 4.8 AND <= -45 dB silence) — stage 4 restores the 53,664
#      Orbax checkpoint and continues.
#   2. multispeaker refresh on the speechlike corpus + silence_boost
#      (item 6a; corpus pre-staged on CPU).
#   3. config-5d fine-tune pair: 15k warm-started from deep-v2 vs 15k
#      from scratch on a held-out corpus-seed-777 corpus (item 6b).
# $1 = exact PID to wait on (kill -0 liveness only, never patterns).
set -x
export PATH=/opt/venv/bin:$PATH
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
mkdir -p /root/runs

# --- item 1b full: deep-v2 -> 120k -------------------------------------
timeout 3600 python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/deep_baseline/conf/config.json \
  --workdir /root/runs/r5_deep_v2 \
  --corpus-style speechlike --n-train 48 --n-eval 4 \
  --stage 4 --stop-stage 6 train.steps=120000 \
  >> /root/runs/r5_deep_v2.log 2>&1

# --- item 6a: multispeaker refresh -------------------------------------
timeout 1800 python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/multispk_dp/conf/config.json \
  --workdir /root/runs/r5_multispk \
  --corpus-style speechlike --n-train 48 --n-eval 4 \
  --stage 4 --stop-stage 6 train.steps=80000 data.silence_boost=0.25 \
  > /root/runs/r5_multispk.log 2>&1

# --- item 6b: fine-tune pair (warm from deep-v2 vs scratch) -------------
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
  timeout 1800 python -m shallow_wavenet_tpu.bin.run --config $DCONF \
    --workdir $W --corpus-seed 777 --corpus-style speechlike \
    --n-train 12 --n-eval 3 \
    --stage 4 --stop-stage 6 train.steps=15000 $INIT \
    > /root/runs/r5_ft_$MODE.log 2>&1
done

echo "R5C QUEUE DONE"
