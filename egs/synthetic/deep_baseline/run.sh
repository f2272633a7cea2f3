#!/bin/sh
# Staged recipe (see conf/config.json; flags in ../run_common.sh --help)
RECIPE_DIR=$(CDPATH= cd -- "$(dirname -- "$0")" && pwd)
export RECIPE_DIR
exec "$RECIPE_DIR/../run_common.sh" "$@"
