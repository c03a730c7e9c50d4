#!/usr/bin/env bash
# SLURM launcher (parity: tools/scripts/slurm_train.sh — the reference spawns
# one torch.distributed rank per GPU via srun + NCCL TCP rendezvous). On TPU
# the SLURM job allocates one task per host of the pod slice;
# jax.distributed.initialize() (train.py --launcher slurm) derives
# (coordinator, process_id, num_procs) from the SLURM_* environment
# automatically — srun provides the fan-out.
#
#   usage: sbatch -N <hosts> --ntasks-per-node=1 slurm_train.sh --cfg_file ...
set -euo pipefail
cd "$(dirname "$0")/.."
srun --kill-on-bad-exit=1 python train.py --launcher slurm "$@"
