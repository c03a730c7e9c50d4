#!/usr/bin/env bash
# Single-host training (parity: tools/scripts/torch_train.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python train.py "$@"
