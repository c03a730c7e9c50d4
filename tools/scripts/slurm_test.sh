#!/usr/bin/env bash
# SLURM eval launcher (parity: tools/scripts/slurm_test_mgpu.sh). Same
# rendezvous story as slurm_train.sh; every host evaluates its dataset shard
# and rank 0 merges via process_allgather (parallel/comm.py
# merge_results_dist — replaces the reference's tmpdir-pickle rendezvous).
#
#   usage: sbatch -N <hosts> --ntasks-per-node=1 slurm_test.sh --cfg_file ...
set -euo pipefail
cd "$(dirname "$0")/.."
srun --kill-on-bad-exit=1 python test.py --launcher slurm "$@"
