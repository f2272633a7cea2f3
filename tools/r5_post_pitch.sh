#!/bin/bash
# Round-5 post-pitch TPU sequence, priority-ordered so truncation at the
# round boundary loses the least: pooled-tail bench (VERDICT item 4 done
# criterion), training rooflines (item 3), multispk refresh (item 6a),
# opportunistic deep-v2 energy-channel run (item 1b). Waits on the pitch
# chain's exact PID ($1, kill -0 only). Every expensive job is gated on
# a wall-clock deadline ($2, epoch seconds) so nothing holds the chip
# when the driver's round-end bench.py needs it; after each stage the
# collector snapshot is written INTO the repo so a hard kill still
# leaves committed-able results.
set -x
cd /root/repo
DEADLINE=${2:?usage: post_pitch.sh <pitch-pid> <deadline-epoch>}
left() { echo $(( DEADLINE - $(date +%s) )); }
snap() { python tools/r5_collect.py > /root/repo/MEASUREMENTS_r5.txt 2>&1; }
while kill -0 "$1" 2>/dev/null; do sleep 15; done
snap

if [ "$(left)" -gt 240 ]; then
  timeout 600 python tools/stream_bench.py 8 6 60 4 pool > /root/runs/r5_pool8.log 2>&1
fi
if [ "$(left)" -gt 180 ]; then
  timeout 400 python tools/stream_bench.py 4 6 60 4 pool > /root/runs/r5_pool4.log 2>&1
fi
snap

if [ "$(left)" -gt 300 ]; then
  timeout 500 python tools/train_roofline.py shallow_laplace_single 8 \
    json=/root/runs/r5_roofline_b8.json > /root/runs/r5_roofline_b8.log 2>&1
fi
if [ "$(left)" -gt 300 ]; then
  timeout 500 python tools/train_roofline.py deep_baseline 8 \
    json=/root/runs/r5_roofline_deep.json > /root/runs/r5_roofline_deep.log 2>&1
fi
if [ "$(left)" -gt 300 ]; then
  timeout 500 python tools/train_roofline.py shallow_laplace_single 8 \
    segment=16000 json=/root/runs/r5_roofline_b8s16.json > /root/runs/r5_roofline_b8s16.log 2>&1
fi
snap

# multispk refresh: shallow ~135 it/s -> 60k ~ 8 min + eval; needs ~12 min
if [ "$(left)" -gt 780 ]; then
  timeout $(( $(left) - 60 )) python -m shallow_wavenet_tpu.bin.run \
    --config egs/synthetic/multispk_dp/conf/config.json \
    --workdir /root/runs/r5_multispk --stage 4 --stop-stage 6 \
    train.steps=60000 data.silence_boost=0.25 > /root/runs/r5_multispk.log 2>&1
fi
snap

# opportunistic deep-v2 (energy-channel silence validation): step count
# sized to the remaining wall so the chip is free before the deadline.
# deep trains ~24.3 it/s; budget = (left - 360 s for stages 5-6) * 24.
if [ "$(left)" -gt 1200 ]; then
  STEPS=$(( ( $(left) - 360 ) * 24 ))
  [ "$STEPS" -gt 120000 ] && STEPS=120000
  timeout $(( $(left) - 60 )) python -m shallow_wavenet_tpu.bin.run \
    --config egs/synthetic/deep_baseline/conf/config.json \
    --workdir /root/runs/r5_deep_v2 --stage 4 --stop-stage 6 \
    train.steps=$STEPS > /root/runs/r5_deep_v2.log 2>&1
fi
snap

timeout 580 python bench.py > /root/runs/r5_bench.log 2>&1
snap
echo "POST PITCH DONE"
