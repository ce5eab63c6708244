#!/usr/bin/env bash
# Manual multi-process launch (GCE TPU pods / bare hosts) — reference
# tools/scripts/dist_train.sh equivalent. Run ONE copy per host:
#
#   # on host 0 (the coordinator):
#   scripts/multihost_train.sh 0 2 host0:12996 configs/models/.../cfg.yaml
#   # on host 1:
#   scripts/multihost_train.sh 1 2 host0:12996 configs/models/.../cfg.yaml
#
# On Cloud TPU pod slices, prefer omitting --launcher entirely:
# jax.distributed.initialize() auto-discovers peers from the TPU runtime
# metadata and none of these arguments are needed.
set -euo pipefail

PID=${1:?process_id}
NPROC=${2:?num_processes}
COORD=${3:?coordinator host:port}
CFG=${4:?cfg.yaml}
shift 4

exec python -m modest_tpu.cli.train \
    --cfg_file "$CFG" --launcher manual \
    --coordinator "$COORD" --num_processes "$NPROC" --process_id "$PID" "$@"
