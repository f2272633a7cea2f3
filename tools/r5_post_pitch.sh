#!/bin/bash
# Round-5 post-pitch TPU sequence, priority-ordered so truncation at the
# round boundary loses the least: pooled-tail bench (VERDICT item 4 done
# criterion), training rooflines (item 3), multispk refresh (item 6a) if
# time remains. Waits on the pitch chain's exact PID ($1, kill -0 only).
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 15; done

timeout 700 python tools/stream_bench.py 8 6 60 4 pool > /root/runs/r5_pool8.log 2>&1
timeout 700 python tools/stream_bench.py 4 6 60 4 pool > /root/runs/r5_pool4.log 2>&1

timeout 700 python tools/train_roofline.py shallow_laplace_single 8 \
  json=/root/runs/r5_roofline_b8.json > /root/runs/r5_roofline_b8.log 2>&1
timeout 700 python tools/train_roofline.py deep_baseline 8 \
  json=/root/runs/r5_roofline_deep.json > /root/runs/r5_roofline_deep.log 2>&1
timeout 700 python tools/train_roofline.py shallow_laplace_single 8 \
  segment=16000 json=/root/runs/r5_roofline_b8s16.json > /root/runs/r5_roofline_b8s16.log 2>&1

timeout 2500 python -m shallow_wavenet_tpu.bin.run \
  --config egs/synthetic/multispk_dp/conf/config.json \
  --workdir /root/runs/r5_multispk --stage 4 --stop-stage 6 \
  train.steps=60000 data.silence_boost=0.25 > /root/runs/r5_multispk.log 2>&1
echo "POST PITCH DONE"
