#!/bin/bash
# Per-cell-type PBMC training loop (reference scripts/train_pbmc.sh:4-8).
# Usage: train_pbmc.sh <expFile> <inputFile> <annoFile> [out_root] [n_types]
set -euo pipefail
EXPFILE=${1:?geneanno.exp_pbmc.csv}
INPUT=${2:?Xreducedall npy}
ANNO=${3:?geneanno.csv}
OUT=${4:-models/pbmc}
N=${5:-5}
for i in $(seq 1 "$N"); do
    python3 -m expecto_tpu.cli.train --expFile "$EXPFILE" --targetIndex "$i" \
        --inputFile "$INPUT" --annoFile "$ANNO" --output_dir "$OUT/idx_${i}"
done
