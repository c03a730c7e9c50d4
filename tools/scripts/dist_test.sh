#!/usr/bin/env bash
# Multi-host evaluation (parity: tools/scripts/dist_test.sh): every host
# evaluates its shard; results merge via parallel/comm.merge_results_dist.
set -euo pipefail
cd "$(dirname "$0")/.."
python - "$@" <<'PY'
import sys
import jax

try:
    jax.distributed.initialize()
except Exception as e:
    print(f"jax.distributed.initialize skipped: {e}")
sys.argv = ["test.py"] + sys.argv[1:]
exec(open("test.py").read())
PY
