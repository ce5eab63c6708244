#!/usr/bin/env bash
# Multi-host training under SLURM (reference: tools/scripts/slurm_train.sh).
#
#   sbatch -N 2 --ntasks-per-node=1 --gres=tpu:4 scripts/slurm_train.sh \
#       configs/models/lyft_models/pointrcnn_dynamic_obj.yaml my_tag
#
# Each task runs one JAX process; init_multihost derives the coordinator
# from SLURM_STEP_NODELIST / SLURM_PROCID (parallel/multihost.py:26-33).
# The global mesh spans every host's chips; the loader shards frames per
# process (DistributedSampler equivalent) and the jitted train step's
# gradient psum rides ICI/DCN — no NCCL, no torch.distributed.launch.
set -euo pipefail

CFG=${1:?usage: slurm_train.sh <cfg.yaml> [extra_tag] [extra args...]}
TAG=${2:-default}
shift $(( $# >= 2 ? 2 : 1 ))

srun python -m modest_tpu.cli.train \
    --cfg_file "$CFG" --extra_tag "$TAG" --launcher slurm "$@"
