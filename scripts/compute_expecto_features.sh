#!/bin/bash
# Full gene-feature regeneration (reference scripts/compute_expecto_features.sh).
set -euo pipefail
python -m expecto_tpu.cli.compute_features ./resources/geneanno.csv -o "${1:-features_out}"
