"""The exact README workflow on the reference's own example files
(README.md:20-30): ``chromatin.py ./example/example.vcf`` then ``predict.py
--coorFile ... --geneFile ... --modelList ... --output output.csv``.

The genome is a stub: an 11.2 Mb chr1 that is N everywhere except +-22 kb
around each of the example's 10 variants (the maxshift=800 receptive field),
with the VCF ref alleles planted at their positions — so the real
example.vcf and example.vcf.bed.sorted.bed.closestgene drive the pipeline
end-to-end without the 3 GB hg19 download.
"""

import os

import numpy as np
import pandas as pd
import pytest
import torch

REF_EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def stub_hg19(tmp_path_factory):
    from expecto_tpu.genome.fasta import FastaIndex, write_fasta

    vcf = pd.read_csv(os.path.join(REF_EXAMPLE, "example.vcf"), sep="\t", header=None)
    positions = vcf[1].astype(int).values
    refs = vcf[3].astype(str).values

    rs = np.random.RandomState(42)
    bases = np.frombuffer(b"ACGT", np.uint8)
    contig = np.full(int(positions.max()) + 30000, ord("N"), np.uint8)
    for pos in positions:
        lo = max(pos - 22000, 0)
        hi = pos + 22000
        contig[lo:hi] = bases[rs.randint(0, 4, hi - lo)]
    for pos, ref in zip(positions, refs):
        contig[pos - 1] = ord(ref)  # VCF is 1-based

    path = tmp_path_factory.mktemp("hg19stub") / "hg19.fa"
    write_fasta(path, {"chr1": contig.tobytes().decode("latin-1")})
    return str(path), vcf


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    from torch_oracle import TorchBeluga

    from expecto_tpu.models.convert import save_params_npz, state_dict_to_params

    # UNSCALED random weights: the usual x0.05 damping makes the 8-layer
    # stack numerically insensitive — a single-base change propagates below
    # fp32 resolution at the sigmoid and every variant's diff rounds to
    # exactly 0, which would vacuously pass a dead pipeline
    torch.manual_seed(7)
    net = TorchBeluga().eval()
    path = tmp_path_factory.mktemp("w") / "beluga.npz"
    save_params_npz(state_dict_to_params(net.state_dict_reference_keys()), path)
    return str(path)


def test_readme_workflow_on_reference_example(tmp_path, stub_hg19, tiny_weights):
    from expecto_tpu.cli.chromatin import main as chromatin_main
    from expecto_tpu.cli.predict import main as predict_main
    from expecto_tpu.io.xgb import save_xgb07_binary
    from expecto_tpu.models.gblinear import GBLinearModel

    genome_path, vcf = stub_hg19
    out_dir = tmp_path / "chromatin_out"

    # step 1: chromatin.py ./example/example.vcf (README.md:24)
    rc = chromatin_main([
        os.path.join(REF_EXAMPLE, "example.vcf"),
        "--genome", genome_path,
        "--beluga_weights", tiny_weights,
        "--output_dir", str(out_dir),
        "--batchsize", "90",
    ])
    assert rc == 0
    shifts = [0, 200, -200, 400, -400, 600, -600, 800, -800]
    for s in shifts:
        assert (out_dir / f"snps.shift_{s}.diff.h5").exists()

    # step 2: predict.py with the reference's own coor/gene files
    # (README.md:25) and a 2-model modellist
    rng = np.random.default_rng(4)
    models, names = [], []
    for i in range(2):
        mp = tmp_path / f"m{i}.save"
        save_xgb07_binary(
            GBLinearModel(weight=(rng.normal(size=20020) * 0.01).astype(np.float32), bias=0.1 * i), mp
        )
        models.append(str(mp))
        names.append(f"Tissue{i}")
    mlist = tmp_path / "modellist"
    mlist.write_text("ModelName\tTissue\n" + "".join(f"{m}\t{n}\n" for m, n in zip(models, names)))

    out_csv = tmp_path / "output.csv"
    rc = predict_main([
        "--coorFile", os.path.join(REF_EXAMPLE, "example.vcf"),
        "--geneFile", os.path.join(REF_EXAMPLE, "example.vcf.bed.sorted.bed.closestgene"),
        "--snpEffectFilePattern", str(out_dir / "snps.shift_SHIFT.diff.h5"),
        "--modelList", str(mlist),
        "--output", str(out_csv),
        "-o", str(tmp_path / "sed_out"),
    ])
    assert rc == 0

    # README column contract: "the first few columns of the csv will be the
    # same as the vcf files. The additional columns include predicted
    # expression effect for each of the input models in the order given by
    # the modelList file" (README.md:27)
    out = pd.read_csv(out_csv)
    assert out.shape[0] == vcf.shape[0]
    for j in range(5):  # the vcf's chrom/pos/id/ref/alt ride along
        assert (out.iloc[:, j].astype(str).values == vcf.iloc[:, j].astype(str).values).all()
    for n in names:  # one effect column per model, modellist order
        assert n in out.columns
    assert list(out.columns[-2:]) == names
    effects = out[names].to_numpy()
    assert np.isfinite(effects).all()
    assert (np.abs(effects) > 0).any(), "all-zero effects would mean a dead pipeline"
