#!/bin/bash
# Per-chromosome chromatin runs (reference
# scripts/sed_immune_atlas/chromatin_immune_atlas.sh:8-13). The TPU engine
# doesn't need per-chrom chunking for memory; this exists for file-level
# parity with cluster workflows.
set -euo pipefail
VCF_DIR=${1:?dir with per-chrom vcfs named chr*.vcf}
OUT=${2:-chromatin_out}
shopt -s nullglob
files=("$VCF_DIR"/chr*.vcf)
if [ ${#files[@]} -eq 0 ]; then
  echo "no chr*.vcf files in $VCF_DIR" >&2
  exit 2
fi
for f in "${files[@]}"; do
  chrom=$(basename "$f" .vcf)
  python -m expecto_tpu.cli.chromatin "$f" --batchsize 2048 --output_dir "$OUT/$chrom"
done
