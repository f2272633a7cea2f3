#!/bin/bash
# Round-4 parity stream A (VERDICT r3 items 2+5): bring softmax to n=5
# paired replications, add fixed-1e-7 jax floors and torch-side floors.
# Sequential on purpose: the box has 2 cores and the TPU job needs one.
set -x
cd /root/repo
export OMP_NUM_THREADS=1
python -m tests.convergence_parity 20000 3 --head softmax \
  --floors=1e-7 --torch-floors=1e-7,-1e-7 --json PARITY_r3.jsonl
python -m tests.convergence_parity 20000 4 --head softmax \
  --floors=-1e-7 --json PARITY_r3.jsonl
