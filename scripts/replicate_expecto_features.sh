#!/bin/bash
# Regenerate raw per-gene (200, 2002) chromatin tracks
# (reference scripts/replicate_expecto_features.sh:5-6).
# Usage: replicate_expecto_features.sh <annoFile> <genome.fa> <weights.npz> [out_dir]
set -euo pipefail
ANNO=${1:?geneanno.csv}
GENOME=${2:?genome fasta}
WEIGHTS=${3:?beluga npz}
OUT=${4:-output_dir/replicate_expecto_features_all}
echo "Computing features..."
python3 -m expecto_tpu.cli.compute_features "$ANNO" --genome "$GENOME" \
    --beluga_weights "$WEIGHTS" --windowsize 2000 --replicate_raw --bf16 -o "$OUT"
