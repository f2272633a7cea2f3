#!/bin/bash
# Round-5 torch-side chaos floors (VERDICT r4 item 7): bring torch floors
# to n>=4 per head at +-1e-7. CPU-only (convergence_parity pins cpu);
# sequential on purpose — the box has 2 cores and the TPU job needs one.
set -x
cd /root/repo
export OMP_NUM_THREADS=1
python -m tests.convergence_parity 20000 10 --head laplace \
  --floors=1e-7 --torch-floors=1e-7,-1e-7 --json PARITY_r3.jsonl
python -m tests.convergence_parity 20000 11 --head softmax \
  --floors=1e-7 --torch-floors=1e-7,-1e-7 --json PARITY_r3.jsonl
python -m tests.convergence_parity 20000 12 --head laplace \
  --floors=1e-7 --torch-floors=1e-7,-1e-7 --json PARITY_r3.jsonl
python -m tests.convergence_parity 20000 13 --head softmax \
  --floors=1e-7 --torch-floors=1e-7,-1e-7 --json PARITY_r3.jsonl
