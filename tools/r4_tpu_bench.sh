#!/bin/bash
# Round-4 TPU measurement batch (VERDICT r3 items 4+6). Run AFTER the
# deep training job releases the chip — only one process can hold it.
set -x
cd /root/repo

# --- item 4: grad_accum throughput rows (effective B=32/64 at B/N=8
# per-microbatch backward) + the no-accum cliff control ---------------
timeout 900 python tools/train_bench.py shallow_laplace_single 32 8 accum=4
timeout 900 python tools/train_bench.py shallow_laplace_single 64 8 accum=8
timeout 900 python tools/train_bench.py shallow_laplace_single 32 8

# --- item 4: folded-tap contraction probe (K=2R=128 full MXU depth) --
timeout 900 python tools/train_bench.py shallow_laplace_single 8 8 fold=1
timeout 900 python tools/train_bench.py shallow_laplace_single 8 8 segment=16000 fold=1
timeout 900 python tools/train_bench.py deep_baseline 8 8 fold=1

# --- item 6: multi-stream serving rows (fused kernel, B=n_streams) ---
timeout 900 python tools/stream_bench.py 4 6 50 4
timeout 900 python tools/stream_bench.py 8 6 50 4
timeout 900 python tools/stream_bench.py 4 3 50 4
timeout 900 python tools/stream_bench.py 8 3 50 4

# --- StreamPool staggered-lifecycle serving (r4 feature) -------------
timeout 900 python tools/stream_bench.py 4 6 60 4 pool
timeout 900 python tools/stream_bench.py 8 6 60 4 pool
