#!/usr/bin/env bash
# SLURM launcher (parity: tools/scripts/slurm_train.sh — the reference spawns
# one torch.distributed rank per GPU via srun + NCCL TCP rendezvous). On TPU
# the SLURM job allocates one task per host of the pod slice;
# jax.distributed.initialize() derives (coordinator, process_id, num_procs)
# from the SLURM_* environment automatically, so the body is identical to
# dist_train.sh — srun provides the fan-out.
#
#   usage: sbatch -N <hosts> --ntasks-per-node=1 slurm_train.sh --cfg_file ...
set -euo pipefail
cd "$(dirname "$0")/.."
srun --kill-on-bad-exit=1 bash -c '
python - "$@" <<PY
import sys
import jax

try:
    jax.distributed.initialize()
except Exception as e:  # single-host fallback
    print(f"jax.distributed.initialize skipped: {e}")
sys.argv = ["train.py"] + sys.argv[1:]
exec(open("train.py").read())
PY
' _ "$@"
