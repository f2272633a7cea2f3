#!/bin/bash
# Round-4 parity stream B (VERDICT r3 item 2): laplace torch-side floors
# (+ a 6th paired replication for free) and 3 more fixed-1e-7 jax floors.
set -x
cd /root/repo
export OMP_NUM_THREADS=1
python -m tests.convergence_parity 20000 5 --head laplace \
  --floors= --torch-floors=1e-7,-1e-7 --json PARITY_r3.jsonl
python -m tests.convergence_parity 20000 7 --head laplace \
  --floors=1e-7,-1e-7 --no-torch --json PARITY_r3.jsonl
python -m tests.convergence_parity 20000 8 --head laplace \
  --floors=1e-7 --no-torch --json PARITY_r3.jsonl
