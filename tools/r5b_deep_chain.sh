#!/bin/bash
# Round-5 continuation chain: the deep-v2 energy-channel validation run
# (VERDICT r4 item 1b — the round's top criterion: MCD <= 4.8 AND
# <= -45 dB silence on the speechlike corpus with the SHIPPED deep
# preset, i.e. world + silence_boost=0.25 + centered energy channel).
# The previous round-5 session staged this but was time-blocked; the
# run tree did not survive the container, so this regenerates stages
# 0-3 and trains for as many steps as fit before $1 (epoch deadline),
# reserving time for stage 5-6 decode + eval so the chip is free for
# the driver's round-end bench.
set -x
export PATH=/opt/venv/bin:$PATH
cd /root/repo
DEADLINE=${1:?usage: r5b_deep_chain.sh <deadline-epoch>}
left() { echo $(( DEADLINE - $(date +%s) )); }
mkdir -p /root/runs

timeout 900 python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/deep_baseline/conf/config.json \
  --workdir /root/runs/r5_deep_v2 \
  --corpus-style speechlike --n-train 48 --n-eval 4 \
  --stage 0 --stop-stage 3 > /root/runs/r5_deep_v2_prep.log 2>&1

# deep trains ~24.3 steps/s on the attached v5e; reserve 420 s for
# decode + restoration + MCD eval (stages 5-6) plus margin.
STEPS=$(( ( $(left) - 420 ) * 24 ))
[ "$STEPS" -gt 120000 ] && STEPS=120000
[ "$STEPS" -lt 2000 ] && STEPS=2000
timeout $(( $(left) - 30 )) python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/deep_baseline/conf/config.json \
  --workdir /root/runs/r5_deep_v2 \
  --corpus-style speechlike --n-train 48 --n-eval 4 \
  --stage 4 --stop-stage 6 train.steps=$STEPS > /root/runs/r5_deep_v2.log 2>&1

python tools/r5_collect.py > /root/repo/MEASUREMENTS_r5.txt 2>&1
echo "R5B DEEP CHAIN DONE steps=$STEPS"
