#!/bin/bash
# Bootstrap training sweep (reference scripts/train_bootstrap.sh:4-7 ran
# 1000 separate cluster jobs; here one in-process sweep trains all seeds).
# Usage: train_bootstrap.sh <expFile> <targetIndex> [n_seeds] [out_dir]
set -euo pipefail
EXPFILE=${1:?expFile}
TARGET=${2:?targetIndex}
NSEEDS=${3:-1000}
OUT=${4:-bootstrap_models}
INPUT=${5:-./resources/Xreducedall.2002.npy}
ANNO=${6:-./resources/geneanno.csv}
python - "$EXPFILE" "$TARGET" "$NSEEDS" "$OUT" "$INPUT" "$ANNO" <<'PY'
import sys
import numpy as np, pandas as pd
from expecto_tpu.pipeline.train import train_bootstrap
expfile, target, nseeds, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
X = np.load(sys.argv[-2])
geneanno = pd.read_csv(sys.argv[-1])
exp = pd.read_csv(expfile)
train_bootstrap(X, geneanno, exp.iloc[:, target].values, seeds=list(range(nseeds)), output_dir=out)
PY
