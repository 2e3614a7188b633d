"""Golden no-regression fixtures: fixed-seed end-to-end outputs pinned to
values recorded at fixture creation (tests/golden/). Any numerical change in
the encode -> Beluga -> decay -> gblinear chain shows up here.

Regenerate deliberately with:
    python tests/test_golden.py regenerate
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

GOLDEN = Path(__file__).parent / "golden"


def _build_case():
    """Deterministic tiny end-to-end SED run (CPU, fp32-HIGHEST)."""
    import torch

    sys.path.insert(0, str(Path(__file__).parent))
    from torch_oracle import TorchBeluga

    from expecto_tpu.genome.fasta import FastaIndex, write_fasta
    from expecto_tpu.io.xgb import save_xgb07_binary
    from expecto_tpu.models.convert import state_dict_to_params
    from expecto_tpu.models.gblinear import GBLinearModel
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.pipeline.chromatin import compute_variant_chromatin_effects
    from expecto_tpu.pipeline.sed import load_shift_effects, score_sed
    import tempfile

    torch.manual_seed(1234)
    net = TorchBeluga().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(0.08)
    params = state_dict_to_params(net.state_dict_reference_keys())

    rs = np.random.RandomState(99)
    contigs = {"chr1": "".join(np.array(list("ACGT"))[rs.randint(0, 4, 40000)])}
    rows, gene_rows = [], []
    for pos in [8000, 20000, 31000]:
        ref = contigs["chr1"][pos - 1]
        alt = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref]
        rows.append(["chr1", pos, ".", ref, alt])
        gene_rows.append(["1", pos - 1, pos, ref, alt, "1", 9999, 10000, "+", "G1", 10000 - pos])
    vcf = pd.DataFrame(rows)
    gene = pd.DataFrame(gene_rows)
    model = GBLinearModel(
        weight=np.random.RandomState(5).normal(size=20020).astype(np.float32), bias=0.25, base_score=2.0
    )

    with tempfile.TemporaryDirectory() as td:
        write_fasta(f"{td}/g.fa", contigs)
        fa = FastaIndex(f"{td}/g.fa")
        runner = BelugaRunner(params, batch_size=64)
        res = compute_variant_chromatin_effects(
            vcf, fa, runner, td, maxshift=400, output_prefix="snps", verbose=False
        )
        effects = load_shift_effects(f"{td}/snps.shift_SHIFT.diff.h5", maxshift=400)
        sed = score_sed(effects, vcf, gene, model, maxshift=400)
        diff0 = effects["diff"][0]  # shift-0 averaged diffs (3, 2002)

    return {
        "sed": sed.table["SED"].tolist(),
        "ref": sed.table["REF"].tolist(),
        "alt": sed.table["ALT"].tolist(),
        "diff0_head": diff0[:, :8].ravel().tolist(),
        "diff0_norm": float(np.linalg.norm(diff0)),
    }


def test_golden_sed_outputs():
    path = GOLDEN / "sed_tiny.json"
    assert path.exists(), "golden fixture missing; run: python tests/test_golden.py regenerate"
    want = json.loads(path.read_text())
    got = _build_case()
    np.testing.assert_allclose(got["sed"], want["sed"], rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(got["ref"], want["ref"], rtol=1e-5)
    np.testing.assert_allclose(got["alt"], want["alt"], rtol=1e-5)
    np.testing.assert_allclose(got["diff0_head"], want["diff0_head"], atol=1e-6)
    np.testing.assert_allclose(got["diff0_norm"], want["diff0_norm"], rtol=1e-4)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        GOLDEN.mkdir(exist_ok=True)
        (GOLDEN / "sed_tiny.json").write_text(json.dumps(_build_case(), indent=1))
        print("regenerated", GOLDEN / "sed_tiny.json")
