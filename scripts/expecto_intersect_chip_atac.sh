#!/bin/bash
# ATAC x ChIP intersect features + training on them
# (reference scripts/expecto_intersect_chip_atac.sh:5-10).
# Usage: expecto_intersect_chip_atac.sh <annoFile> <peaks.narrowPeak> <genome.fa> \
#            <weights.npz> <belugaFeatures.tsv> <expFile> [out_dir]
set -euo pipefail
ANNO=${1:?geneanno.csv}
PEAKS=${2:?ATAC peaks narrowPeak}
GENOME=${3:?genome fasta}
WEIGHTS=${4:?beluga npz}
BELUGA_TSV=${5:?beluga features tsv}
EXPFILE=${6:?expression profile csv}
OUT=${7:-intersect_expecto_tf_only}
echo "Computing features..."
python3 -m expecto_tpu.cli.compute_features "$ANNO" --genome "$GENOME" \
    --beluga_weights "$WEIGHTS" --windowsize 2000 --bf16 \
    --atac_peaks "$PEAKS" --belugaFeatures "$BELUGA_TSV" --atac_tf_only -o "$OUT"
echo "Training with new computed features..."
python3 -m expecto_tpu.cli.train --inputFile "$OUT/Xreducedall.2002.atac_x_chip.npy" \
    --expFile "$EXPFILE" --targetIndex 1 --annoFile "$ANNO" \
    --output_dir "$OUT/models"
