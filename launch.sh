#!/usr/bin/env bash
# Convenience launcher (parity with reference launch.sh).
# JAX selects the TPU backend via PJRT automatically; no PJRT_DEVICE export
# is needed, but it is honored if set.
set -euo pipefail

CONFIG="${1:-configs/train_configs/vqav2_finetuning_noise_0.5.yaml}"
MODE="${2:-train}"

python launch.py "$MODE" --config-path "$CONFIG"
