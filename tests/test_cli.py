"""CLI facade tests: chromatin -> predict end-to-end through argv, train CLI,
mergers."""

import os

import numpy as np
import pandas as pd
import pytest
import torch

from expecto_tpu.models.convert import state_dict_to_params, save_params_npz
from torch_oracle import TorchBeluga


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    torch.manual_seed(2)
    net = TorchBeluga().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(0.05)
    path = tmp_path_factory.mktemp("weights") / "beluga.npz"
    save_params_npz(state_dict_to_params(net.state_dict_reference_keys()), path)
    return str(path)


@pytest.fixture(scope="module")
def genome_path(tmp_path_factory):
    from expecto_tpu.genome.fasta import write_fasta

    rs = np.random.RandomState(77)
    bases = np.array(list("ACGT"))
    contigs = {"chr1": "".join(bases[rs.randint(0, 4, 50000)])}
    path = tmp_path_factory.mktemp("g") / "g.fa"
    write_fasta(path, contigs)
    return str(path), contigs


def test_chromatin_then_predict_cli(tmp_path, weights_npz, genome_path):
    from expecto_tpu.cli.chromatin import main as chromatin_main
    from expecto_tpu.cli.predict import main as predict_main

    gpath, contigs = genome_path
    vcf_path = tmp_path / "in.vcf"
    rows = []
    for pos in [9000, 21000]:
        ref = contigs["chr1"][pos - 1]
        alt = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref]
        rows.append(f"chr1\t{pos}\t.\t{ref}\t{alt}")
    vcf_path.write_text("\n".join(rows) + "\n")

    out_dir = tmp_path / "chromatin_out"
    rc = chromatin_main([
        str(vcf_path), "--genome", gpath, "--beluga_weights", weights_npz,
        "--output_dir", str(out_dir), "--maxshift", "200", "--batchsize", "16",
    ])
    assert rc == 0
    for s in [0, -200, 200]:
        assert (out_dir / f"snps.shift_{s}.diff.h5").exists()
    assert (out_dir / "snps_hg19.vcf").exists()

    # closest-gene file (11 cols; last three: strand, gene, dist)
    gene_path = tmp_path / "genes.tsv"
    gene_rows = []
    for pos in [9000, 21000]:
        ref = contigs["chr1"][pos - 1]
        alt = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref]
        gene_rows.append(f"1\t{pos-1}\t{pos}\t{ref}\t{alt}\t1\t9999\t10000\t+\tGENE_{pos}\t{10000-pos}")
    gene_path.write_text("\n".join(gene_rows) + "\n")

    # single-model mode
    from expecto_tpu.io.xgb import save_xgb07_binary
    from expecto_tpu.models.gblinear import GBLinearModel

    rng = np.random.default_rng(1)
    model_path = tmp_path / "m.save"
    save_xgb07_binary(GBLinearModel(weight=rng.normal(size=20020).astype(np.float32) * 0.01, bias=0.2), model_path)

    sed_dir = tmp_path / "sed_out"
    rc = predict_main([
        "--model_save_file", str(model_path),
        "--coorFile", str(out_dir / "snps_hg19.vcf"),
        "--geneFile", str(gene_path),
        "--snpEffectFilePattern", str(out_dir / "snps.shift_SHIFT.diff.h5"),
        "--maxshift", "200",
        "-o", str(sed_dir),
    ])
    assert rc == 0
    sed = pd.read_csv(sed_dir / "sed.tsv", sep="\t")
    assert sed.shape[0] == 2 and {"REF", "ALT", "SED"} <= set(sed.columns)

    # modelList mode
    mlist = tmp_path / "modellist"
    mlist.write_text(f"ModelName\tTissue\n{model_path}\tTissueA\n")
    out_csv = tmp_path / "output.csv"
    rc = predict_main([
        "--modelList", str(mlist),
        "--output", str(out_csv),
        "--coorFile", str(out_dir / "snps_hg19.vcf"),
        "--geneFile", str(gene_path),
        "--snpEffectFilePattern", str(out_dir / "snps.shift_SHIFT.diff.h5"),
        "--maxshift", "200",
    ])
    assert rc == 0
    out = pd.read_csv(out_csv)
    assert "TissueA" in out.columns and out.shape[0] == 2


def test_train_cli(tmp_path):
    from expecto_tpu.cli.train import main as train_main

    rng = np.random.default_rng(3)
    n = 150
    X = rng.normal(size=(n, 8)).astype(np.float32)
    np.save(tmp_path / "X.npy", X)
    geneanno = pd.DataFrame({
        "id": [f"G{i}" for i in range(n)],
        "symbol": ["s"] * n,
        "seqnames": rng.choice(["chr1", "chr8"], size=n),
        "strand": ["+"] * n,
        "TSS": np.arange(n),
        "CAGE_representative_TSS": np.arange(n),
        "type": ["protein_coding"] * n,
    })
    geneanno.to_csv(tmp_path / "anno.csv", index=False)
    pd.DataFrame({"gene": geneanno["id"], "tissueX": np.exp(rng.normal(size=n))}).to_csv(
        tmp_path / "exp.csv", index=False
    )

    rc = train_main([
        "--targetIndex", "1", "--expFile", str(tmp_path / "exp.csv"),
        "--inputFile", str(tmp_path / "X.npy"), "--annoFile", str(tmp_path / "anno.csv"),
        "--num_round", "5", "--output_dir", str(tmp_path / "models"),
        "--evalFile", str(tmp_path / "eval.csv"),
    ])
    assert rc == 0
    saves = list((tmp_path / "models").glob("*.save"))
    assert len(saves) == 1 and "tissueX" in saves[0].name
    assert (tmp_path / "eval.csv").exists()


def test_merge_sed_cli(tmp_path):
    from expecto_tpu.cli.merge import main as merge_main

    for i in range(3):
        d = tmp_path / "batches" / f"chunk_{i}"
        os.makedirs(d)
        pd.DataFrame({"SED": [i * 1.0]}).to_csv(d / "sed.tsv", sep="\t", index=False)
    rc = merge_main(["sed", "--batch_dir", str(tmp_path / "batches"), "--n_chunks", "3", "-o", str(tmp_path / "merged")])
    assert rc == 0
    merged = pd.read_csv(tmp_path / "merged" / "sed.tsv", sep="\t", index_col=0)
    assert merged["SED"].tolist() == [0.0, 1.0, 2.0]


def test_compress_cli(tmp_path):
    import h5py

    from expecto_tpu.cli.merge import main as merge_main

    src = tmp_path / "preds" / "gene1"
    os.makedirs(src)
    with h5py.File(src / "g.h5", "w") as f:
        f.create_dataset("preds", data=np.ones((4, 5), np.float32))
        f.create_dataset("record_ids", data=np.array([b"a|b|c|d"] * 4))
    # a top-eqtl-layout file: float preds + string sidecars that must
    # survive compression (the original is deleted afterwards)
    src2 = tmp_path / "preds" / "gene2"
    os.makedirs(src2)
    with h5py.File(src2 / "g2.h5", "w") as f:
        f.create_dataset("expecto_preds", data=np.full((3,), 2.0, np.float64))
        f.create_dataset("seqs", data=np.array([b"ACGT"] * 3))
    rc = merge_main(["compress", "--preds_dir", str(tmp_path / "preds"), "--out_dir", str(tmp_path / "zipped")])
    assert rc == 0
    assert not (src / "g.h5").exists()
    with h5py.File(tmp_path / "zipped" / "gene1" / "g.h5", "r") as f:
        assert f["preds"].dtype == np.float16
        assert f["record_ids"][0] == b"a|b|c|d"
    with h5py.File(tmp_path / "zipped" / "gene2" / "g2.h5", "r") as f:
        assert f["expecto_preds"].dtype == np.float16
        assert list(f["seqs"]) == [b"ACGT"] * 3


def test_predict_cli_split_folds(tmp_path, weights_npz, genome_path):
    """--splitFlag fold slicing produces the union of the unsplit output."""
    from expecto_tpu.cli.chromatin import main as chromatin_main
    from expecto_tpu.cli.predict import main as predict_main
    from expecto_tpu.io.xgb import save_xgb07_binary
    from expecto_tpu.models.gblinear import GBLinearModel

    gpath, contigs = genome_path
    positions = [6000, 15000, 26000, 37000]
    vcf_path = tmp_path / "in.vcf"
    rows, gene_rows = [], []
    for pos in positions:
        ref = contigs["chr1"][pos - 1]
        alt = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref]
        rows.append(f"chr1\t{pos}\t.\t{ref}\t{alt}")
        gene_rows.append(f"1\t{pos-1}\t{pos}\t{ref}\t{alt}\t1\t9999\t10000\t+\tG{pos}\t{10000-pos}")
    vcf_path.write_text("\n".join(rows) + "\n")
    gene_path = tmp_path / "genes.tsv"
    gene_path.write_text("\n".join(gene_rows) + "\n")

    out_dir = tmp_path / "chrom"
    assert chromatin_main([
        str(vcf_path), "--genome", gpath, "--beluga_weights", weights_npz,
        "--output_dir", str(out_dir), "--maxshift", "200", "--batchsize", "16",
    ]) == 0

    model_path = tmp_path / "m.save"
    rng = np.random.default_rng(2)
    save_xgb07_binary(GBLinearModel(weight=rng.normal(size=20020).astype(np.float32) * 0.01, bias=0.1), model_path)

    common = [
        "--model_save_file", str(model_path),
        "--coorFile", str(out_dir / "snps_hg19.vcf"),
        "--geneFile", str(gene_path),
        "--snpEffectFilePattern", str(out_dir / "snps.shift_SHIFT.diff.h5"),
        "--maxshift", "200",
    ]
    assert predict_main(common + ["-o", str(tmp_path / "full")]) == 0
    full = pd.read_csv(tmp_path / "full" / "sed.tsv", sep="\t")

    parts = []
    for i in range(2):
        assert predict_main(common + ["--splitFlag", "--splitIndex", str(i), "--splitFold", "2", "-o", str(tmp_path / f"fold{i}")]) == 0
        parts.append(pd.read_csv(tmp_path / f"fold{i}" / "sed.tsv", sep="\t"))
    merged = pd.concat(parts, ignore_index=True)
    assert merged.shape[0] == full.shape[0]
    np.testing.assert_allclose(merged["SED"].values, full["SED"].values, rtol=1e-6)


def test_closest_genes_cli(tmp_path):
    from expecto_tpu.cli.closest_genes import main as cg_main

    vcf_path = tmp_path / "v.vcf"
    vcf_path.write_text("chr1\t1500\t.\tA\tT\n")
    anno = tmp_path / "anno.csv"
    pd.DataFrame(
        {
            "symbol": ["g1", "g2"],
            "seqnames": ["chr1", "chr1"],
            "strand": ["+", "-"],
            "TSS": [1000, 90000],
            "CAGE_representative_TSS": [1000, 90000],
            "type": ["protein_coding"] * 2,
        },
        index=pd.Index(["E1", "E2"], name="id"),
    ).to_csv(anno)
    assert cg_main([str(vcf_path), "--annoFile", str(anno), "-o", str(tmp_path / "out")]) == 0
    genes = pd.read_csv(tmp_path / "out" / "closest_genes.tsv", sep="\t", header=None)
    assert genes.shape[0] == 1 and genes.iloc[0, 9] == "E1"


def test_analysis_cli_interpret_features(tmp_path):
    from expecto_tpu.cli.analysis import main as analysis_main

    rng = np.random.default_rng(7)
    n_marks = 6
    X = rng.normal(size=(60, 10 * n_marks)).astype(np.float32)
    np.save(tmp_path / "X.npy", X)
    pd.DataFrame({
        "id": [f"G{i}" for i in range(60)],
        "seqnames": rng.choice(["chr1", "chr8"], size=60),
        "type": ["protein_coding"] * 60,
    }).to_csv(tmp_path / "anno.csv", index=False)
    features = pd.DataFrame({
        "Cell type": ["c"] * n_marks,
        "Assay": [f"a{i}" for i in range(n_marks)],
        "Treatment": [""] * n_marks,
        "Assay type": ["TF"] * n_marks,
        "Source": ["x"] * n_marks,
    }, index=range(1, n_marks + 1))
    features.to_csv(tmp_path / "features.tsv", sep="\t")

    rc = analysis_main([
        "interpret-features",
        "--inputFile", str(tmp_path / "X.npy"),
        "--annoFile", str(tmp_path / "anno.csv"),
        "--belugaFeatures", str(tmp_path / "features.tsv"),
        "--n_clusters", "3",
        "--out_dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    table = pd.read_csv(tmp_path / "out" / "all_feature_clusters.tsv", sep="\t", index_col=0)
    assert table.shape[0] == n_marks * 10
    assert len(list((tmp_path / "out" / "clusters").glob("cluster_*.tsv"))) == 3

    # grouped mode
    rc = analysis_main([
        "interpret-features", "--grouped",
        "--inputFile", str(tmp_path / "X.npy"),
        "--annoFile", str(tmp_path / "anno.csv"),
        "--belugaFeatures", str(tmp_path / "features.tsv"),
        "--n_clusters", "2",
        "--out_dir", str(tmp_path / "grouped"),
    ])
    assert rc == 0
    assert (tmp_path / "grouped" / "cluster_sizes.tsv").exists()


def test_analysis_cli_cluster_viz(tmp_path):
    from expecto_tpu.cli.analysis import main as analysis_main

    rng = np.random.default_rng(8)
    X = np.concatenate([rng.normal(0, 0.1, (15, 5)), rng.normal(4, 0.1, (15, 5))])
    np.save(tmp_path / "emb.npy", X)
    rc = analysis_main([
        "cluster-viz", str(tmp_path / "emb.npy"), "--method", "kmeans", "--k", "2",
        "--out_dir", str(tmp_path / "cv"),
    ])
    assert rc == 0
    labels = pd.read_csv(tmp_path / "cv" / "clusters.tsv", sep="\t")["cluster"]
    assert labels.nunique() == 2


def test_score_cli_end_to_end(tmp_path, weights_npz, genome_path):
    """One-shot serving CLI: VCF -> output.csv, consistent with the h5 path."""
    from expecto_tpu.cli.score import main as score_main
    from expecto_tpu.io.xgb import save_xgb07_binary
    from expecto_tpu.models.gblinear import GBLinearModel

    gpath, contigs = genome_path
    positions = [9000, 21000]
    vcf_path = tmp_path / "in.vcf"
    rows, gene_rows = [], []
    for pos in positions:
        ref = contigs["chr1"][pos - 1]
        alt = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref]
        rows.append(f"chr1\t{pos}\t.\t{ref}\t{alt}")
        gene_rows.append(f"1\t{pos-1}\t{pos}\t{ref}\t{alt}\t1\t9999\t10000\t+\tG{pos}\t{10000-pos}")
    vcf_path.write_text("\n".join(rows) + "\n")
    gene_path = tmp_path / "genes.tsv"
    gene_path.write_text("\n".join(gene_rows) + "\n")

    model_path = tmp_path / "m.save"
    rng = np.random.default_rng(4)
    save_xgb07_binary(GBLinearModel(weight=rng.normal(size=20020).astype(np.float32), bias=0.3), model_path)
    mlist = tmp_path / "modellist"
    mlist.write_text(f"ModelName\tTissue\n{model_path}\tT1\n")

    out_csv = tmp_path / "output.csv"
    rc = score_main([
        str(vcf_path), "--geneFile", str(gene_path),
        "--modelList", str(mlist), "--genome", gpath,
        "--beluga_weights", weights_npz, "--maxshift", "200",
        "--batchsize", "32", "--fp32",
        "--output", str(out_csv),
    ])
    assert rc == 0
    out = pd.read_csv(out_csv)
    assert out.shape[0] == 2
    assert {"T1", "REF_T1", "ALT_T1"} <= set(out.columns)
    np.testing.assert_allclose(out["T1"], out["ALT_T1"] - out["REF_T1"], atol=1e-5)


def test_train_cli_bootstrap_sweep(tmp_path):
    from expecto_tpu.cli.train import main as train_main

    rng = np.random.default_rng(4)
    n = 120
    np.save(tmp_path / "X.npy", rng.normal(size=(n, 8)).astype(np.float32))
    geneanno = pd.DataFrame({
        "id": [f"G{i}" for i in range(n)],
        "symbol": ["s"] * n,
        "seqnames": rng.choice(["chr1", "chr8"], size=n),
        "strand": ["+"] * n,
        "TSS": np.arange(n),
        "CAGE_representative_TSS": np.arange(n),
        "type": ["protein_coding"] * n,
    })
    geneanno.to_csv(tmp_path / "anno.csv", index=False)
    pd.DataFrame({"gene": geneanno["id"], "tissueX": np.exp(rng.normal(size=n))}).to_csv(
        tmp_path / "exp.csv", index=False
    )

    rc = train_main([
        "--targetIndex", "1", "--expFile", str(tmp_path / "exp.csv"),
        "--inputFile", str(tmp_path / "X.npy"), "--annoFile", str(tmp_path / "anno.csv"),
        "--num_round", "5", "--bootstrap_seeds", "4",
        "--output_dir", str(tmp_path / "boot"),
    ])
    assert rc == 0
    saves = sorted((tmp_path / "boot").glob("bootstrap_seed*.save"))
    assert len(saves) == 4
    # resampled models must differ from one another
    from expecto_tpu.io.xgb import load_expression_model

    w0 = load_expression_model(saves[0]).weight
    w1 = load_expression_model(saves[1]).weight
    assert not np.allclose(w0, w1)


def test_train_cli_all_tissues(tmp_path):
    import h5py

    from expecto_tpu.cli.train import main as train_main

    rng = np.random.default_rng(5)
    n = 120
    np.save(tmp_path / "X.npy", rng.normal(size=(n, 8)).astype(np.float32))
    geneanno = pd.DataFrame({
        "id": [f"G{i}" for i in range(n)],
        "symbol": ["s"] * n,
        "seqnames": rng.choice(["chr1", "chr8"], size=n),
        "strand": ["+"] * n,
        "TSS": np.arange(n),
        "CAGE_representative_TSS": np.arange(n),
        "type": ["protein_coding"] * n,
    })
    geneanno.to_csv(tmp_path / "anno.csv", index=False)
    pd.DataFrame({
        "gene": geneanno["id"],
        "tA": np.exp(rng.normal(size=n)),
        "tB": np.exp(rng.normal(size=n)),
    }).to_csv(tmp_path / "exp.csv", index=False)

    rc = train_main([
        "--expFile", str(tmp_path / "exp.csv"),
        "--inputFile", str(tmp_path / "X.npy"), "--annoFile", str(tmp_path / "anno.csv"),
        "--num_round", "5", "--allTissues", "--vectorized",
        "--output_dir", str(tmp_path / "tissues"),
    ])
    assert rc == 0
    assert (tmp_path / "tissues" / "expecto_tA.save").exists()
    assert (tmp_path / "tissues" / "expecto_tB.save").exists()
    with h5py.File(tmp_path / "tissues" / "metrics.h5") as f:
        assert "pearsonr_valid" not in f  # round-1 alias dropped (VERDICT r2 #8)
        assert f["spearman_valid"].shape == (2,)
        assert list(f["tissue"][:]) == [b"tA", b"tB"]
        # vectorized sweep also writes the reference key set with train-side
        # metrics (train_susztak.py:177-181)
        for key in ("pearsonr_valids", "r2_valids", "pearsonr_trains", "r2_trains"):
            assert f[key].shape == (2,)


def test_train_cli_missing_target(tmp_path):
    from expecto_tpu.cli.train import main as train_main

    rc = train_main(["--expFile", "nope.csv"])
    assert rc == 2


@pytest.mark.slow
def test_compute_features_atac_cli(tmp_path, weights_npz, genome_path):
    from expecto_tpu.cli.compute_features import main as cf_main

    gpath, contigs = genome_path
    geneanno = pd.DataFrame({
        "id": ["G1"],
        "symbol": ["s"],
        "seqnames": ["chr1"],
        "strand": ["+"],
        "TSS": [25000],
        "CAGE_representative_TSS": [25000],
        "type": ["protein_coding"],
    })
    geneanno.to_csv(tmp_path / "anno.csv", index=False)
    # beluga features table: 2002 tracks, a few TF/Histone
    rows = ["\t".join(["i", "Cell type", "Assay", "Treatment", "Assay type", "Source"])]
    for i in range(2002):
        at = "TF" if i % 3 == 0 else ("Histone" if i % 3 == 1 else "DNase")
        rows.append("\t".join([str(i), "K562", f"A{i}", "None", at, "ENCODE"]))
    (tmp_path / "beluga.tsv").write_text("\n".join(rows) + "\n")
    (tmp_path / "peaks.bed").write_text("chr1\t0\t50000\n")

    rc = cf_main([
        str(tmp_path / "anno.csv"), "--genome", gpath, "--beluga_weights", weights_npz,
        "--atac_peaks", str(tmp_path / "peaks.bed"),
        "--belugaFeatures", str(tmp_path / "beluga.tsv"),
        "--batchsize", "128",
        "-o", str(tmp_path / "out"),
    ])
    assert rc == 0
    feats = np.load(tmp_path / "out" / "Xreducedall.2002.atac_x_chip.npy")
    assert feats.shape == (1, 20020)

    # missing --belugaFeatures is a clean error
    rc = cf_main([
        str(tmp_path / "anno.csv"), "--genome", gpath, "--beluga_weights", weights_npz,
        "--atac_peaks", str(tmp_path / "peaks.bed"),
        "-o", str(tmp_path / "out2"),
    ])
    assert rc == 2


def test_train_cli_kidney_filter_and_plots(tmp_path):
    from expecto_tpu.cli.train import main as train_main

    rng = np.random.default_rng(4)
    n = 120
    X = rng.normal(size=(n, 8)).astype(np.float32)
    np.save(tmp_path / "X.npy", X)
    geneanno = pd.DataFrame({
        "id": [f"G{i}" for i in range(n)],
        "symbol": ["s"] * n,
        "seqnames": rng.choice(["chr1", "chr8"], size=n),
        "strand": ["+"] * n,
        "TSS": np.arange(n),
        "CAGE_representative_TSS": np.arange(n),
        "type": ["protein_coding"] * n,
    })
    geneanno.to_csv(tmp_path / "anno.csv", index=False)
    pd.DataFrame({"gene": geneanno["id"], "tissueX": np.exp(rng.normal(size=n))}).to_csv(
        tmp_path / "exp.csv", index=False
    )
    kidney = pd.DataFrame({"PT": np.exp(rng.normal(size=n))}, index=geneanno["id"])
    kidney.iloc[:10] = np.nan  # 10 genes dropped by --kidney_genes_only
    kidney.to_csv(tmp_path / "kidney.csv")

    rc = train_main([
        "--targetIndex", "1", "--expFile", str(tmp_path / "exp.csv"),
        "--inputFile", str(tmp_path / "X.npy"), "--annoFile", str(tmp_path / "anno.csv"),
        "--num_round", "5", "--output_dir", str(tmp_path / "models"),
        "--kidney_genes_only", "--kidney_exp_file", str(tmp_path / "kidney.csv"),
    ])
    assert rc == 0
    assert list((tmp_path / "models").glob("*.save"))
    # reference train.py:162-184 writes train/test scatter plots
    assert (tmp_path / "models" / "test_plots.png").exists()
    assert (tmp_path / "models" / "train_plots.png").exists()


def test_train_cli_basenji2_requires_file(tmp_path):
    from expecto_tpu.cli.train import main as train_main

    np.save(tmp_path / "X.npy", np.zeros((4, 8), np.float32))
    pd.DataFrame({
        "id": ["G0", "G1", "G2", "G3"], "symbol": ["s"] * 4,
        "seqnames": ["chr1", "chr1", "chr8", "chr8"], "strand": ["+"] * 4,
        "TSS": range(4), "CAGE_representative_TSS": range(4), "type": ["protein_coding"] * 4,
    }).to_csv(tmp_path / "anno.csv", index=False)
    pd.DataFrame({"gene": ["G0", "G1", "G2", "G3"], "t": [1.0, 2.0, 3.0, 4.0]}).to_csv(
        tmp_path / "exp.csv", index=False
    )
    rc = train_main([
        "--targetIndex", "1", "--expFile", str(tmp_path / "exp.csv"),
        "--inputFile", str(tmp_path / "X.npy"), "--annoFile", str(tmp_path / "anno.csv"),
        "--match_with_basenji2",
    ])
    assert rc == 2
