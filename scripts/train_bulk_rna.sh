#!/bin/bash
# Per-profile training loop over bulk RNA-seq geneannos
# (reference scripts/train_bulk_rna.sh:4-9, paths parameterized).
# Usage: train_bulk_rna.sh <geneannos_dir> <inputFile> <annoFile> [out_root]
set -euo pipefail
GENEANNOS=${1:?dir of geneanno.exp_*.csv profiles}
INPUT=${2:?Xreducedall npy}
ANNO=${3:?geneanno.csv}
OUT=${4:-models/bulk_rna}
for exp_file in "$GENEANNOS"/*; do
    # full basename minus prefix/extension: last-underscore tokens collide
    # (e.g. *_brain_cortex vs *_frontal_cortex both -> 'cortex')
    identifier="$(basename "$exp_file")"
    identifier="${identifier#geneanno.exp_}"
    identifier="${identifier%.*}"
    echo "$identifier"
    python3 -m expecto_tpu.cli.train --expFile "$exp_file" --targetIndex 1 \
        --inputFile "$INPUT" --annoFile "$ANNO" --output_dir "$OUT/${identifier}"
done
