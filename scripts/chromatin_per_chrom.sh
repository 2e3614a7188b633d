#!/bin/bash
# Per-chromosome chromatin runs (reference
# scripts/sed_immune_atlas/chromatin_immune_atlas.sh:8-13). The TPU engine
# doesn't need per-chrom chunking for memory; this exists for file-level
# parity with cluster workflows.
set -euo pipefail
VCF_DIR=${1:?dir with per-chrom vcfs named chr*.vcf}
OUT=${2:-chromatin_out}
for f in "$VCF_DIR"/chr*.vcf; do
  chrom=$(basename "$f" .vcf)
  python -m expecto_tpu.cli.chromatin "$f" --batchsize 2048 --output_dir "$OUT/$chrom"
done
