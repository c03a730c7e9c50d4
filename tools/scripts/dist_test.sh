#!/usr/bin/env bash
# Multi-host evaluation (parity: tools/scripts/dist_test.sh): every host
# evaluates its loader shard; results merge via
# parallel/comm.merge_results_dist inside test.py.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python test.py --launcher jax "$@"
