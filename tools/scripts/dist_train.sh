#!/usr/bin/env bash
# Multi-host data-parallel training (parity: tools/scripts/dist_train.sh,
# slurm_train.sh). The reference launched one torch.distributed process per
# GPU over NCCL; on TPU pods every host runs the SAME command and
# `train.py --launcher jax` calls jax.distributed.initialize(), which picks
# up the pod topology from the environment (JAX_COORDINATOR_ADDRESS /
# megascale env on Cloud TPU). Init errors propagate as real failures.
#
#   usage: on every host of the pod slice:
#     JAX_COORDINATOR_ADDRESS=<host0>:8476 bash dist_train.sh --cfg_file ...
set -euo pipefail
cd "$(dirname "$0")/.."
exec python train.py --launcher jax "$@"
