#!/bin/bash
# Multi-tissue sweep (reference scripts/train_pbmc.sh / train_bulk_rna.sh
# loops): trains every expression column and writes metrics.h5.
set -euo pipefail
EXPFILE=${1:?expFile}
OUT=${2:-tissue_models}
INPUT=${3:-./resources/Xreducedall.2002.npy}
ANNO=${4:-./resources/geneanno.csv}
python - "$EXPFILE" "$OUT" "$INPUT" "$ANNO" <<'PY'
import sys
import numpy as np, pandas as pd
from expecto_tpu.pipeline.train import train_all_tissues
expfile, out = sys.argv[1], sys.argv[2]
X = np.load(sys.argv[-2])
geneanno = pd.read_csv(sys.argv[-1])
exp = pd.read_csv(expfile)
train_all_tissues(X, geneanno, exp, output_dir=out, metrics_path=f"{out}/metrics.h5")
PY
