#!/usr/bin/env bash
# Train the MNIST32 CNN VAE from composable YAML configs
# (reference entry point: run.sh — LightningCLI fit with repeated -c flags).
set -euo pipefail
python -m ot_vae_tpu.config.cli fit -c configs/vae/defaults.yaml "$@"
