#!/bin/bash
# Grouped-mark hierarchical clustering with cached-clustering reuse
# (reference scripts/interpret_features_grouped.sh:5-6).
# Usage: interpret_features_grouped.sh <inputFile> <belugaFeatures> <expFile> <annoFile> [out_dir] [joblib]
set -euo pipefail
INPUT=${1:?Xreducedall npy}
BELUGA_TSV=${2:?beluga features tsv}
EXPFILE=${3:?expression profile csv}
ANNO=${4:?geneanno.csv}
OUT=${5:-output_dir/interpret_features_grouped}
JOBLIB=${6:-}
ARGS=(interpret-features --grouped --inputFile "$INPUT" --annoFile "$ANNO"
      --belugaFeatures "$BELUGA_TSV" --expFile "$EXPFILE" --targetIndex 1 --out_dir "$OUT")
if [[ -n "$JOBLIB" ]]; then ARGS+=(--clustering_joblib "$JOBLIB"); fi
python3 -m expecto_tpu.cli.analysis "${ARGS[@]}"
