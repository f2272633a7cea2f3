#!/bin/sh
# Shared staged-recipe driver for the egs/synthetic/* recipes (component C1;
# the reference's egs/<corpus>/<recipe>/run.sh surface, SURVEY.md §3.1).
# Each recipe's run.sh execs this with RECIPE_DIR set to its own directory.
#
# Usage: ./run.sh [--stage N] [--stop_stage M] [--workdir DIR]
#                 [--n_train N] [--n_eval N] [key=value ...]
#
# Stages (same numbering as the reference):
#   0 data prep   1 features   2 stats   3 noise shaping
#   4 train       5 decode     6 restoration + MCD eval
set -e

common_dir=$(CDPATH= cd -- "$(dirname -- "$0")" && pwd)
recipe_dir=${RECIPE_DIR:-$common_dir}
repo_root=$(CDPATH= cd -- "$common_dir/../.." && pwd)
export PYTHONPATH="$repo_root${PYTHONPATH:+:$PYTHONPATH}"

stage=0
stop_stage=6
workdir="$recipe_dir/exp"
n_train=8
n_eval=2

# consume the flags we own; re-append everything else (key=value overrides)
# onto the positional list so quoting/globs survive intact
n_left=$#
while [ "$n_left" -gt 0 ]; do
  case "$1" in
    --stage)      stage=$2; shift 2; n_left=$((n_left - 2)) ;;
    --stop_stage|--stop-stage) stop_stage=$2; shift 2; n_left=$((n_left - 2)) ;;
    --workdir)    workdir=$2; shift 2; n_left=$((n_left - 2)) ;;
    --n_train|--n-train) n_train=$2; shift 2; n_left=$((n_left - 2)) ;;
    --n_eval|--n-eval)   n_eval=$2; shift 2; n_left=$((n_left - 2)) ;;
    -h|--help)
      sed -n '2,12p' "$common_dir/run_common.sh"; exit 0 ;;
    *)  set -- "$@" "$1"; shift; n_left=$((n_left - 1)) ;;
  esac
done

exec python -m shallow_wavenet_tpu.bin.run \
  --config "$recipe_dir/conf/config.json" \
  --workdir "$workdir" \
  --stage "$stage" --stop-stage "$stop_stage" \
  --n-train "$n_train" --n-eval "$n_eval" \
  "$@"
