"""End-to-end tests for the analysis CLI subcommands added for reference
parity: cluster_analysis_with_fimo.py, get_enriched_motif_set.py,
plot_bootstrapped_coefficients.py, extract_lymphoblastoid_consensus_preds.py,
resources/make_geneanno*.py, util/rank_based_inverse_normal_transformation.py,
plot_susztak.py, plot_data_distributions.py."""

import numpy as np
import pandas as pd
import pytest

from expecto_tpu.cli.analysis import main as analysis_main


def _write_contribs(path, n_variants=8, clusters=("c1", "c2", "c3"), seed=0):
    """Synthetic predict_by_cluster_rsat-style output: 15 leading columns
    (id col named '2', plus gene/SED/SED_PROPORTION) then per-cluster
    contributions named to match the RSAT cluster table index."""
    rng = np.random.default_rng(seed)
    lead_cols = [str(i) for i in range(10)] + ["gene", "SED", "SED_PROPORTION", "13", "14"]
    rows = []
    for v in range(n_variants):
        lead = [0] * 10 + [f"g{v % 2}", float(rng.normal()), float(abs(rng.normal()))] + [0, 0]
        lead[2] = f"rs{v}"
        rows.append(lead + list(rng.normal(size=len(clusters))))
    df = pd.DataFrame(rows, columns=lead_cols + list(clusters))
    df.to_csv(path, sep="\t")
    return df


def _write_fimo_raw(path, n_variants=8):
    rows = []
    for v in range(n_variants):
        # matches covering the variant base (start <= 31 <= stop)
        rows.append(["M1", "m1", f"rs{v}", 28, 34, "+", 10.0, 1e-6, 0.1, "AAAA"])
        if v % 2 == 0:
            rows.append(["M4", "m4", f"rs{v}", 25, 35, "+", 8.0, 1e-5, 0.2, "CCCC"])
        # non-covering noise row
        rows.append(["M3", "m3", f"rs{v}", 1, 9, "+", 2.0, 1e-2, 0.9, "GGGG"])
    path.write_text("\n".join("\t".join(map(str, r)) for r in rows) + "\n")


class TestFimoEnrich:
    def test_end_to_end(self, tmp_path):
        contribs_f = tmp_path / "contribs.tsv"
        _write_contribs(contribs_f)
        rsat_f = tmp_path / "rsat.tsv"
        rsat_f.write_text("c1\tm1,m2\nc2\tm3\nc3\tm4\n")
        fimo_f = tmp_path / "fimo_out.txt"
        _write_fimo_raw(fimo_f)

        rc = analysis_main([
            "fimo-enrich",
            "--cluster_contribs_file", str(contribs_f),
            "--rsat_clusters_file", str(rsat_f),
            "--fimo_out_file", str(fimo_f),
            "--n_neg_clusters", "1",
            "--no_plots",
            "-o", str(tmp_path / "out"),
        ])
        assert rc == 0
        hyper = pd.read_csv(tmp_path / "out" / "hypergeom.tsv", sep="\t")
        # 3 clusters - 1 negative = 2 rank cutoffs
        assert list(hyper["top_cluster_idx"]) == [0, 1]
        assert ((hyper["hypergeom_pval"] >= 0) & (hyper["hypergeom_pval"] <= 1)).all()
        for null in ("hypergeom_shuffled_clusters.tsv", "hypergeom_shuffled_variants.tsv"):
            assert (tmp_path / "out" / null).exists()
        # 4 SED-proportion quartile strata
        strata = sorted((tmp_path / "out").glob("hypergeom_percentile_*.tsv"))
        assert len(strata) == 4
        assert (tmp_path / "out" / "num_unique_clusters.tsv").exists()

    def test_rank_int_column(self, tmp_path):
        contribs_f = tmp_path / "contribs.tsv"
        _write_contribs(contribs_f, n_variants=12)
        rsat_f = tmp_path / "rsat.tsv"
        rsat_f.write_text("c1\tm1,m2\nc2\tm3\nc3\tm4\n")
        fimo_f = tmp_path / "fimo_out.txt"
        _write_fimo_raw(fimo_f, n_variants=12)

        rc = analysis_main([
            "fimo-enrich",
            "--cluster_contribs_file", str(contribs_f),
            "--rsat_clusters_file", str(rsat_f),
            "--fimo_out_file", str(fimo_f),
            "--n_neg_clusters", "1",
            "--rank_int", "--no_plots",
            "-o", str(tmp_path / "out"),
        ])
        assert rc == 0
        assert (tmp_path / "out" / "hypergeom.tsv").exists()


class TestEnrichedMotifs:
    def test_meme_subset(self, tmp_path):
        (tmp_path / "h.tsv").write_text("motif\thypergeom_qval\nM1\t0.001\nM2\t0.5\n")
        meme = (
            "MEME version 4\n\nALPHABET= ACGT\n\n"
            "MOTIF M1 TF1\nletter-probability matrix\n0.25 0.25 0.25 0.25\n\n"
            "MOTIF M2 TF2\nletter-probability matrix\n0.1 0.4 0.4 0.1\n"
        )
        (tmp_path / "db.meme").write_text(meme)
        rc = analysis_main([
            "enriched-motifs",
            "--hypergeom_enrichment_tsv", str(tmp_path / "h.tsv"),
            "--motif_db_file", str(tmp_path / "db.meme"),
            "-o", str(tmp_path / "out"),
        ])
        assert rc == 0
        text = (tmp_path / "out" / "enriched_motifs.meme").read_text()
        assert "MOTIF M1" in text and "MOTIF M2" not in text


class TestBootstrapCoefficients:
    def test_zscore_table_and_se(self, tmp_path):
        from expecto_tpu.io.xgb import save_expression_model
        from expecto_tpu.models.gblinear import GBLinearModel

        rng = np.random.default_rng(1)
        n_feat = 6
        true_w = rng.normal(size=n_feat).astype(np.float32)
        for seed in range(5):
            d = tmp_path / "boot" / f"seed_{seed}"
            d.mkdir(parents=True)
            w = true_w + rng.normal(scale=0.1, size=n_feat).astype(np.float32)
            save_expression_model(GBLinearModel(weight=w, bias=0.05 * seed), d / "model.save")
        save_expression_model(GBLinearModel(weight=true_w, bias=0.1), tmp_path / "main.save")
        feats = pd.DataFrame({"name": [f"f{i}" for i in range(n_feat)]})
        feats.to_csv(tmp_path / "feats.tsv", sep="\t")

        rc = analysis_main([
            "bootstrap-coefficients",
            "--bootstrap_model_dir", str(tmp_path / "boot"),
            "--main_model", str(tmp_path / "main.save"),
            "--input_features_file", str(tmp_path / "feats.tsv"),
            "--no_plots",
            "-o", str(tmp_path / "out"),
        ])
        assert rc == 0
        table = pd.read_csv(tmp_path / "out" / "input_features_sorted_by_zscore.csv", sep="\t", index_col=0)
        assert table.shape[0] == n_feat
        absz = np.abs(table["z_score"].values)
        assert (absz[:-1] >= absz[1:]).all(), "rows must be sorted by |z|"
        se = np.load(tmp_path / "out" / "se_weight.npy")
        assert se.shape == (n_feat,) and (se > 0).all()


class TestExtractConsensusCLI:
    def _chromatin_h5(self, tmp_path):
        import h5py

        preds = np.random.default_rng(3).normal(size=(3, 200, 10)).astype(np.float32)
        p = tmp_path / "g_chromatin.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("chromatin_preds", data=preds)
            f.create_dataset("record_ids", data=np.array([b"a", b"b", b"c"]))
        return p, preds

    def test_index_tracks(self, tmp_path):
        import h5py

        p, preds = self._chromatin_h5(tmp_path)
        rc = analysis_main([
            "extract-consensus",
            "--chromatin_h5", str(p),
            "--snp_pos", "99700", "--tss_pos", "100000", "--strand", "+",
            "--tracks", "0,3",
            "-o", str(tmp_path / "out.h5"),
        ])
        assert rc == 0
        from expecto_tpu.analysis.extract import get_snp_bin

        sbin = get_snp_bin(99700, 100000, "+")
        with h5py.File(tmp_path / "out.h5") as f:
            np.testing.assert_array_equal(f["snp_bin_preds"], preds[:, sbin][:, [0, 3]])

    def test_name_tracks(self, tmp_path):
        p, _ = self._chromatin_h5(tmp_path)
        bf = tmp_path / "beluga.tsv"
        rows = ["\t".join(["i", "Cell type", "Assay", "Treatment", "Assay type", "Source"])]
        for i in range(10):
            ct = "GM12878" if i in (2, 5) else "K562"
            rows.append("\t".join([str(i), ct, f"TF{i}", "None", "TF", "ENCODE"]))
        bf.write_text("\n".join(rows) + "\n")
        rc = analysis_main([
            "extract-consensus",
            "--chromatin_h5", str(p),
            "--snp_pos", "99700", "--tss_pos", "100000", "--strand", "+",
            "--tracks", "GM12878", "--belugaFeatures", str(bf),
            "-o", str(tmp_path / "out.h5"),
        ])
        assert rc == 0
        import h5py

        with h5py.File(tmp_path / "out.h5") as f:
            assert f["snp_bin_preds"].shape == (3, 2)


class TestMakeProfileCLI:
    def test_join_and_rank_match(self, tmp_path):
        anno = pd.DataFrame(
            {"id": ["g1", "g2", "g3"], "symbol": ["A", "B", "C"]}
        ).set_index("id")
        anno.to_csv(tmp_path / "anno.csv")
        counts = pd.DataFrame(
            {"t1": [1.0, 4.0, 2.0], "t2": [8.0, 2.0, 1.0]}, index=["g1", "g2", "g3"]
        )
        counts.to_csv(tmp_path / "counts.csv")
        rc = analysis_main([
            "make-profile",
            "--annoFile", str(tmp_path / "anno.csv"),
            "--countsFile", str(tmp_path / "counts.csv"),
            "--rank_match_col", "t1",
            "-o", str(tmp_path / "exp.csv"),
        ])
        assert rc == 0
        out = pd.read_csv(tmp_path / "exp.csv", index_col=0)
        assert list(out.columns) == ["t1", "t2"]
        # t2 values replaced by t1's values at matching ranks
        assert sorted(out["t2"]) == sorted(out["t1"])

    def test_log2_undo(self, tmp_path):
        anno = pd.DataFrame({"id": ["g1"], "symbol": ["A"]}).set_index("id")
        anno.to_csv(tmp_path / "anno.csv")
        pd.DataFrame({"t1": [3.0]}, index=["g1"]).to_csv(tmp_path / "counts.csv")
        rc = analysis_main([
            "make-profile",
            "--annoFile", str(tmp_path / "anno.csv"),
            "--countsFile", str(tmp_path / "counts.csv"),
            "--log2_offset", "1",
            "-o", str(tmp_path / "exp.csv"),
        ])
        assert rc == 0
        out = pd.read_csv(tmp_path / "exp.csv", index_col=0)
        assert out["t1"].iloc[0] == pytest.approx(2**3 - 1)


class TestRankIntCLI:
    def test_grouped(self, tmp_path):
        df = pd.DataFrame({
            "gene": ["a"] * 10 + ["b"] * 10,
            "SED": np.random.default_rng(0).normal(size=20),
        })
        df.to_csv(tmp_path / "t.tsv", sep="\t", index=False)
        rc = analysis_main([
            "rank-int", str(tmp_path / "t.tsv"),
            "--column", "SED", "--group_by", "gene", "--deterministic",
            "-o", str(tmp_path / "out.tsv"),
        ])
        assert rc == 0
        out = pd.read_csv(tmp_path / "out.tsv", sep="\t")
        assert "SED_RINT" in out.columns
        # per-group transform is mean ~0
        for g in ("a", "b"):
            assert abs(out[out["gene"] == g]["SED_RINT"].mean()) < 0.2


class TestPlotCLIs:
    def test_plot_metrics(self, tmp_path):
        import h5py

        with h5py.File(tmp_path / "metrics.h5", "w") as f:
            f.create_dataset("pearsonr_valid", data=np.random.default_rng(0).random(20))
            f.create_dataset("r2_valid", data=np.random.default_rng(1).random(20))
        rc = analysis_main(["plot-metrics", str(tmp_path / "metrics.h5"), "-o", str(tmp_path / "plots")])
        assert rc == 0
        assert (tmp_path / "plots" / "pearsonr_valid_hist.png").exists()
        assert (tmp_path / "plots" / "r2_valid_hist.png").exists()

    def test_plot_distributions(self, tmp_path):
        pd.DataFrame({
            "symbol": ["a", "b", "c"],
            "t1": [0.1, 2.0, 30.0],
            "t2": [1.0, 0.0, 5.0],
        }).to_csv(tmp_path / "exp.csv", index=False)
        rc = analysis_main([
            "plot-distributions", "--expFile", str(tmp_path / "exp.csv"),
            "-o", str(tmp_path / "plots"),
        ])
        assert rc == 0
        assert (tmp_path / "plots" / "expression_distributions.png").exists()


def _beluga_tsv(path, assay_types):
    rows = ["\t".join(["i", "Cell type", "Assay", "Treatment", "Assay type", "Source"])]
    for i, at in enumerate(assay_types):
        rows.append("\t".join([str(i), f"cell{i}", f"TF{i}", "None", at, "ENCODE"]))
    path.write_text("\n".join(rows) + "\n")


class TestInterpretFeaturesCLI:
    def _fixture(self, tmp_path, n_genes=40, n_marks=3):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(n_genes, 10 * n_marks)).astype(np.float32)
        np.save(tmp_path / "X.npy", X)
        geneanno = pd.DataFrame({
            "id": [f"G{i}" for i in range(n_genes)],
            "symbol": ["s"] * n_genes,
            "seqnames": ["chr1"] * (n_genes - 5) + ["chr8"] * 5,
            "strand": ["+"] * n_genes,
            "TSS": np.arange(n_genes),
            "CAGE_representative_TSS": np.arange(n_genes),
            "type": ["protein_coding"] * n_genes,
        })
        geneanno.to_csv(tmp_path / "anno.csv", index=False)
        exp = np.exp(rng.normal(size=n_genes))
        exp[0] = -1.0  # log -> NaN: must be dropped by the finite-label filter
        pd.DataFrame({"gene": geneanno["id"], "t1": exp}).to_csv(tmp_path / "exp.csv", index=False)
        _beluga_tsv(tmp_path / "beluga.tsv", ["TF"] * n_marks)

    def test_exp_filter_and_joblib_reuse(self, tmp_path):
        self._fixture(tmp_path)
        base = [
            "interpret-features",
            "--inputFile", str(tmp_path / "X.npy"),
            "--annoFile", str(tmp_path / "anno.csv"),
            "--belugaFeatures", str(tmp_path / "beluga.tsv"),
            "--expFile", str(tmp_path / "exp.csv"), "--targetIndex", "1",
            "--n_clusters", "3",
        ]
        rc = analysis_main(base + ["--out_dir", str(tmp_path / "out1")])
        assert rc == 0
        table1 = pd.read_csv(tmp_path / "out1" / "all_feature_clusters.tsv", sep="\t", index_col=0)
        assert table1.shape[0] == 30  # 3 marks x 10 basis coefficients
        assert set(table1["cluster"]) == {0, 1, 2}
        assert (tmp_path / "out1" / "clustering_cached.joblib").exists()
        assert sorted((tmp_path / "out1" / "clusters").glob("cluster_*.tsv"))

        # reuse the fitted clustering: identical labels
        rc = analysis_main(base + [
            "--clustering_joblib", str(tmp_path / "out1" / "clustering_cached.joblib"),
            "--out_dir", str(tmp_path / "out2"),
        ])
        assert rc == 0
        table2 = pd.read_csv(tmp_path / "out2" / "all_feature_clusters.tsv", sep="\t", index_col=0)
        assert list(table1["cluster"]) == list(table2["cluster"])


class TestSvdChainCLI:
    def test_svd_transform_cluster_viz(self, tmp_path):
        rng = np.random.default_rng(1)
        rep = tmp_path / "rep"
        rep.mkdir()
        for g in range(3):
            np.save(rep / f"gene{g}.npy", np.abs(rng.normal(size=(20, 6))).astype(np.float32))
        _beluga_tsv(tmp_path / "beluga.tsv", ["TF", "TF", "TF", "TF", "DNase", "DNase"])
        mask_flags = ["--belugaFeatures", str(tmp_path / "beluga.tsv"), "--no_dnase_features"]

        rc = analysis_main([
            "svd", str(rep), "--n_components", "2", *mask_flags,
            "--out_dir", str(tmp_path / "svd"),
        ])
        assert rc == 0
        assert (tmp_path / "svd" / "svd_2.joblib").exists()

        rc = analysis_main([
            "svd-transform", str(rep), str(tmp_path / "svd" / "svd_2.joblib"), *mask_flags,
            "-o", str(tmp_path / "svdt"),
        ])
        assert rc == 0
        emb = np.load(tmp_path / "svdt" / "tf_idf_reduced_2.npy")
        assert emb.shape == (4, 2)  # DNase marks masked out

        rc = analysis_main([
            "cluster-viz", str(tmp_path / "svdt"), "--n_pcs", "2", "--k", "2", *mask_flags,
            "--out_dir", str(tmp_path / "cv"),
        ])
        assert rc == 0
        table = pd.read_csv(tmp_path / "cv" / "all_feature_clusters.tsv", sep="\t", index_col=0)
        assert table.shape[0] == 4
        assert (tmp_path / "cv" / "cluster_sizes.tsv").exists()
        assert sorted((tmp_path / "cv" / "clusters").glob("cluster_*.tsv"))


class TestPlotDistributionsKidney:
    def test_kidney_hists_and_scatter(self, tmp_path):
        n = 30
        rng = np.random.default_rng(2)
        pd.DataFrame({
            "t1": np.exp(rng.normal(size=n)),
            "t2": np.exp(rng.normal(size=n)),
        }).to_csv(tmp_path / "exp.csv", index=False)
        kidney = pd.DataFrame({
            "PT": np.exp(rng.normal(size=n)),
            "LOH": np.exp(rng.normal(size=n)),
        }, index=[f"G{i}" for i in range(n)])
        kidney.iloc[3, 0] = np.nan
        kidney.to_csv(tmp_path / "kidney.csv")

        rc = analysis_main([
            "plot-distributions", "--expFile", str(tmp_path / "exp.csv"),
            "--kidney_exp_file", str(tmp_path / "kidney.csv"),
            "--kidney_genes_only",
            "-o", str(tmp_path / "plots"),
        ])
        assert rc == 0
        assert (tmp_path / "plots" / "kidney" / "PT_hist.png").exists()
        assert (tmp_path / "plots" / "kidney" / "LOH_hist.png").exists()
        assert (tmp_path / "plots" / "scatter_PT_vs_t1.png").exists()
        assert (tmp_path / "plots" / "expression_distributions.png").exists()


class TestExtractDatasetCLI:
    def _expecto_tree(self, tmp_path, gene="hla-b", n_samples=3, n_tracks=10):
        import h5py

        rng = np.random.default_rng(5)
        preds = rng.normal(size=(n_samples, 200, n_tracks)).astype(np.float32)
        d = tmp_path / "expecto" / gene
        d.mkdir(parents=True)
        with h5py.File(d / f"{gene}_chromatin.h5", "w") as f:
            f.create_dataset("chromatin_preds", data=preds)
            f.create_dataset(
                "record_ids",
                data=np.array([f"chr6:1-10|NA{i}|-|1pIu".encode() for i in range(n_samples)]),
            )
        return preds

    def _tables(self, tmp_path, gene="hla-b", tss=100000):
        # eqtl names arrive uppercase in the real tables; the driver must
        # lowercase them to match gene dirs and the annotation index
        pd.DataFrame({
            "name": [gene.upper()], "SNP_ID": ["rs1"], "SNPpos": [tss + 100], "TSSpos_x": [tss],
        }).to_csv(tmp_path / "eqtls.csv")
        pd.DataFrame([["ENSG1", "chr6", tss, gene.upper(), "+"]]).to_csv(
            tmp_path / "genes.csv", header=False, index=False
        )
        bf = tmp_path / "beluga.tsv"
        rows = ["\t".join(["i", "Cell type", "Assay", "Treatment", "Assay type", "Source"])]
        for i in range(10):
            ct = "GM12878" if i in (2, 5) else "K562"
            rows.append("\t".join([str(i), ct, f"TF{i}", "None", "TF", "ENCODE"]))
        bf.write_text("\n".join(rows) + "\n")

    def test_expecto_snp_mode(self, tmp_path):
        from expecto_tpu.analysis.extract import get_snp_bin

        preds = self._expecto_tree(tmp_path)
        self._tables(tmp_path)
        rc = analysis_main([
            "extract-dataset", "--model", "expecto", "--extract_mode", "snp",
            "--eqtls_csv", str(tmp_path / "eqtls.csv"), "--genes_csv", str(tmp_path / "genes.csv"),
            "--expecto_preds_dir", str(tmp_path / "expecto"),
            "--beluga_features_tsv", str(tmp_path / "beluga.tsv"),
            "--out_dir", str(tmp_path / "out"),
        ])
        assert rc == 0
        out = pd.read_csv(tmp_path / "out" / "hla-b_rs1" / "expecto_preds.csv", index_col=0)
        assert out.shape == (3, 2)  # 3 samples x 2 GM12878 tracks
        assert list(out.index) == ["NA0", "NA1", "NA2"]
        sbin = get_snp_bin(100100, 100000, "+")
        np.testing.assert_allclose(out.values, preds[:, sbin][:, [2, 5]], rtol=1e-6)

    def test_expecto_50_bins_mode(self, tmp_path):
        import h5py

        self._expecto_tree(tmp_path)
        self._tables(tmp_path)
        rc = analysis_main([
            "extract-dataset", "--model", "expecto", "--extract_mode", "50_bins",
            "--eqtls_csv", str(tmp_path / "eqtls.csv"), "--genes_csv", str(tmp_path / "genes.csv"),
            "--expecto_preds_dir", str(tmp_path / "expecto"),
            "--beluga_features_tsv", str(tmp_path / "beluga.tsv"),
            "--out_dir", str(tmp_path / "out"),
        ])
        assert rc == 0
        with h5py.File(tmp_path / "out" / "hla-b" / "expecto_gm12878_preds.h5") as f:
            assert f["all_preds"].dtype == np.float16
            assert f["all_preds"].shape[0] == 3 and f["all_preds"].shape[2] == 2
            assert len(f["sample_names"]) == 3 and len(f["features"]) == 2

    def test_basenji_tss_mode(self, tmp_path):
        import h5py

        self._tables(tmp_path)
        rng = np.random.default_rng(6)
        for s in ("NA0", "NA1"):
            d = tmp_path / "basenji" / "hla-b" / "all_bins_per_sample"
            d.mkdir(parents=True, exist_ok=True)
            with h5py.File(d / f"{s}.h5", "w") as f:
                f.create_dataset("all_preds", data=rng.normal(size=(896, 8)).astype(np.float32))
        tf = tmp_path / "targets.tsv"
        rows = ["\t".join(["index", "identifier", "description"])]
        for i in range(8):
            desc = "CAGE:GM12878" if i == 1 else "CAGE:K562"
            rows.append("\t".join([str(i), f"CNhs{i}", desc]))
        tf.write_text("\n".join(rows) + "\n")
        rc = analysis_main([
            "extract-dataset", "--model", "basenji", "--extract_mode", "tss",
            "--eqtls_csv", str(tmp_path / "eqtls.csv"), "--genes_csv", str(tmp_path / "genes.csv"),
            "--basenji_preds_dir", str(tmp_path / "basenji"),
            "--targets_file", str(tf),
            "--out_dir", str(tmp_path / "out"),
        ])
        assert rc == 0
        out = pd.read_csv(tmp_path / "out" / "hla-b" / "basenji_preds.csv", index_col=0)
        assert out.shape == (2, 1) and list(out.index) == ["NA0", "NA1"]

    def test_basenji_mp_pool(self, tmp_path):
        import h5py

        self._tables(tmp_path)
        rng = np.random.default_rng(6)
        d = tmp_path / "basenji" / "hla-b" / "all_bins_per_sample"
        d.mkdir(parents=True)
        for s in ("NA0", "NA1"):
            with h5py.File(d / f"{s}.h5", "w") as f:
                f.create_dataset("all_preds", data=rng.normal(size=(896, 8)).astype(np.float32))
        tf = tmp_path / "targets.tsv"
        rows = ["\t".join(["index", "identifier", "description"])]
        for i in range(8):
            rows.append("\t".join([str(i), f"CNhs{i}", "CAGE:GM12878" if i == 1 else "CAGE:K562"]))
        tf.write_text("\n".join(rows) + "\n")
        from expecto_tpu.analysis.extract import extract_consensus_dataset

        done = extract_consensus_dataset(
            model="basenji", extract_mode="tss", out_dir=str(tmp_path / "out"),
            eqtls_csv=str(tmp_path / "eqtls.csv"), genes_csv=str(tmp_path / "genes.csv"),
            basenji_preds_dir=str(tmp_path / "basenji"), targets_file=str(tf),
            processes=2,
        )
        assert len(done) == 1
        out = pd.read_csv(tmp_path / "out" / "hla-b" / "basenji_preds.csv", index_col=0)
        assert out.shape == (2, 1)


class TestCollectPwmsCLI:
    def test_collect_from_jaspar_db(self, tmp_path):
        bf = tmp_path / "beluga.tsv"
        rows = ["\t".join(["i", "Cell type", "Assay", "Treatment", "Assay type", "Source"])]
        for i, (assay, at) in enumerate([("CTCF", "TF"), ("GATA1", "TF"), ("DNase", "DNase")]):
            rows.append("\t".join([str(i), "K562", assay, "None", at, "ENCODE"]))
        bf.write_text("\n".join(rows) + "\n")
        db = tmp_path / "jaspar_db"
        db.mkdir()
        (db / "MA0139.1.jaspar").write_text(
            ">MA0139.1 CTCF\nA [ 1 2 3 ]\nC [ 4 5 6 ]\nG [ 7 8 9 ]\nT [ 1 1 1 ]\n"
        )
        (db / "MA0035.4.jaspar").write_text(
            ">MA0035.4 Gata1::Tal1\nA [ 1 ]\nC [ 1 ]\nG [ 1 ]\nT [ 1 ]\n"
        )  # heterodimer: skipped
        rc = analysis_main([
            "collect-pwms", "--belugaFeatures", str(bf),
            "--jaspar_motif_db", str(db),
            "--out_dir", str(tmp_path / "pwms"),
        ])
        assert rc == 0
        text = (tmp_path / "pwms" / "cluster_motifs.jaspar").read_text()
        assert "CTCF" in text and "Tal1" not in text


class TestFimoQueryCLI:
    def test_query_with_stubbed_fimo(self, tmp_path, monkeypatch):
        """End-to-end fimo-query with the external MEME binary stubbed: the
        CLI writes the variant FASTA, 'runs' fimo, filters to
        variant-covering matches."""
        from expecto_tpu.genome.fasta import write_fasta

        rng = np.random.default_rng(3)
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 5000)])
        write_fasta(tmp_path / "g.fa", {"chr1": seq})
        pos = 2000
        vcf = tmp_path / "in.vcf"
        vcf.write_text(f"chr1\t{pos}\trs1\t{seq[pos - 1]}\tN\t.\t.\t.\n")

        def fake_run_fimo(motif_file, fasta_path, out_path, *, engine="auto"):
            rows = [
                ["M1", "TF1", "rs1", 29, 35, "+", 10.0, 1e-5, 0.1, "AAA"],
                ["M2", "TF2", "rs1", 1, 9, "+", 5.0, 1e-3, 0.5, "CCC"],
            ]
            with open(out_path, "w") as f:
                for r in rows:
                    f.write("\t".join(map(str, r)) + "\n")
            return "fake"

        import expecto_tpu.analysis.fimo as fimo_mod

        monkeypatch.setattr(fimo_mod, "run_fimo", fake_run_fimo)
        rc = analysis_main([
            "fimo-query", "--vcf_file", str(vcf), "--motif_file", "unused.meme",
            "--hg19_fasta", str(tmp_path / "g.fa"), "-o", str(tmp_path / "q"),
        ])
        assert rc == 0
        fasta_out = (tmp_path / "q" / "fimo_in.fasta").read_text().splitlines()
        assert fasta_out[0] == ">rs1" and len(fasta_out[1]) == 61
        filtered = pd.read_csv(tmp_path / "q" / "fimo_filtered.tsv", sep="\t")
        assert list(filtered["motif_id"]) == ["M1"]  # only the covering match

    def test_query_with_builtin_engine(self, tmp_path):
        """Fully end-to-end fimo-query with --fimo_engine builtin: no
        external binary, no stubs — the native scanner scores a real MEME
        motif over the variant windows and the filter keeps covering
        matches."""
        from expecto_tpu.genome.fasta import write_fasta

        rng = np.random.default_rng(7)
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 5000)])
        write_fasta(tmp_path / "g.fa", {"chr1": seq})
        pos = 2000
        vcf = tmp_path / "in.vcf"
        vcf.write_text(f"chr1\t{pos}\trs7\t{seq[pos - 1]}\tN\t.\t.\t.\n")
        meme = tmp_path / "m.meme"
        meme.write_text(
            "MEME version 4\n\nALPHABET= ACGT\n\n"
            "Background letter frequencies\nA 0.25 C 0.25 G 0.25 T 0.25\n\n"
            "MOTIF MX TFX\n"
            "letter-probability matrix: alength= 4 w= 3 nsites= 20 E= 0\n"
            " 0.97 0.01 0.01 0.01\n 0.01 0.97 0.01 0.01\n 0.01 0.01 0.97 0.01\n"
        )
        rc = analysis_main([
            "fimo-query", "--vcf_file", str(vcf), "--motif_file", str(meme),
            "--hg19_fasta", str(tmp_path / "g.fa"), "--fimo_engine", "builtin",
            "-o", str(tmp_path / "qb"),
        ])
        assert rc == 0
        filtered = pd.read_csv(tmp_path / "qb" / "fimo_filtered.tsv", sep="\t")
        # one best-p row for the motif, covering the variant center
        assert list(filtered["motif_id"]) == ["MX"]
        row = filtered.iloc[0]
        assert row["start"] <= 31 <= row["stop"]
        assert 0 < row["p-value"] <= 1
