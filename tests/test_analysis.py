"""Analysis-layer tests: attribution, rank-INT, bootstrap stats, clustering,
FIMO statistics, ATAC binning, bin extraction, PWMs, profiles, closest genes."""

import numpy as np
import pandas as pd
import pytest

from expecto_tpu.models.gblinear import GBLinearModel


def make_model(n_feat, seed=0, bias=0.5):
    rng = np.random.default_rng(seed)
    return GBLinearModel(weight=rng.normal(size=n_feat).astype(np.float32), bias=bias, base_score=2.0)


class TestInterpret:
    def test_per_mark_attribution_sums_to_sed(self):
        from expecto_tpu.analysis.interpret import interpret_model

        n_marks, n_basis, n = 7, 10, 4
        model = make_model(n_basis * n_marks)
        rng = np.random.default_rng(1)
        ref = rng.normal(size=(n, n_basis * n_marks))
        alt = rng.normal(size=(n, n_basis * n_marks))
        prop = interpret_model(model, ref, alt, n_basis=n_basis)
        assert prop.shape == (n, n_marks)
        np.testing.assert_allclose(prop.sum(axis=1), 1.0, rtol=1e-9)
        # proportions * total == per-mark contributions == SED decomposition
        sed = (alt - ref) @ model.weight.astype(np.float64)
        total = ((alt - ref) * model.weight).reshape(n, n_basis, n_marks).sum(axis=(1, 2))
        np.testing.assert_allclose(total, sed, rtol=1e-5)

    def test_cluster_attribution_matches_manual_groupby(self):
        from expecto_tpu.analysis.interpret import interpret_model, interpret_model_with_clusters

        n_marks, n_basis, n = 6, 10, 3
        model = make_model(n_basis * n_marks, seed=2)
        rng = np.random.default_rng(3)
        ref = rng.normal(size=(n, n_basis * n_marks))
        alt = rng.normal(size=(n, n_basis * n_marks))
        clusters = pd.Series([0, 0, 1, 1, 2, 2])
        got = interpret_model_with_clusters(model, ref, alt, clusters, n_basis=n_basis)
        assert got.shape == (n, 3)
        per_mark = interpret_model(model, ref, alt, n_basis=n_basis)
        want = np.stack([per_mark[:, clusters.values == c].sum(axis=1) for c in range(3)], axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_multi_membership(self):
        from expecto_tpu.analysis.interpret import interpret_model_multi_membership

        n_marks, n_basis, n = 4, 10, 2
        model = make_model(n_basis * n_marks, seed=4)
        rng = np.random.default_rng(5)
        ref = rng.normal(size=(n, n_basis * n_marks))
        alt = rng.normal(size=(n, n_basis * n_marks))
        membership = np.array([[1, 0], [1, 1], [0, 1], [0, 0]])
        got = interpret_model_multi_membership(model, ref, alt, membership, n_basis=n_basis)
        assert got.shape == (n, 2)
        np.testing.assert_allclose(got.sum(axis=1), 1.0)


class TestRankINT:
    def test_output_is_normal_quantiles(self):
        from expecto_tpu.analysis.rank_int import rank_INT
        from scipy.stats import norm

        s = pd.Series([10.0, 1.0, 5.0, 3.0])
        out = rank_INT(s, stochastic=False)
        c, n = 3.0 / 8, 4
        # rank of 10 is 4 -> highest quantile
        assert out.iloc[0] == pytest.approx(norm.ppf((4 - c) / (n - 2 * c + 1)))
        assert out.iloc[1] == pytest.approx(norm.ppf((1 - c) / (n - 2 * c + 1)))

    def test_nan_passthrough_and_ties(self):
        from expecto_tpu.analysis.rank_int import rank_INT

        s = pd.Series([1.0, np.nan, 1.0, 2.0])
        out = rank_INT(s, stochastic=True)
        assert np.isnan(out.iloc[1])
        assert np.isfinite(out.drop(index=1)).all()
        # deterministic under the fixed seed
        out2 = rank_INT(s, stochastic=True)
        pd.testing.assert_series_equal(out, out2)

    def test_duplicate_index_labels(self):
        """Per-gene SED tables are often indexed by gene symbol with
        duplicates; rank_INT must handle them (regression: label-based
        permutation raised on reindex)."""
        from expecto_tpu.analysis.rank_int import rank_INT

        s = pd.Series([3.0, 1.0, 2.0, np.nan], index=["g1", "g1", "g2", "g2"])
        out = rank_INT(s, stochastic=True)
        assert len(out) == 4 and list(out.index) == ["g1", "g1", "g2", "g2"]
        assert np.isnan(out.iloc[3]) and np.isfinite(out.iloc[:3]).all()
        # values identical to the same data under a unique index
        uniq = rank_INT(pd.Series([3.0, 1.0, 2.0, np.nan]), stochastic=True)
        np.testing.assert_allclose(out.values[:3], uniq.values[:3])


class TestBootstrap:
    def test_stats(self):
        from expecto_tpu.analysis.bootstrap import bootstrap_coefficient_stats

        models = [make_model(5, seed=s) for s in range(20)]
        main = make_model(5, seed=99)
        stats = bootstrap_coefficient_stats(models, main)
        W = np.vstack([m.weight for m in models])
        np.testing.assert_allclose(stats.se_weight, W.std(axis=0, ddof=1), rtol=1e-6)
        np.testing.assert_allclose(stats.z_score, main.weight / W.std(axis=0, ddof=1), rtol=1e-6)

    def test_sorted_table(self):
        from expecto_tpu.analysis.bootstrap import bootstrap_coefficient_stats, features_sorted_by_zscore

        models = [make_model(5, seed=s) for s in range(10)]
        stats = bootstrap_coefficient_stats(models, make_model(5, seed=42))
        df = pd.DataFrame({"feature": list("abcde")})
        out = features_sorted_by_zscore(df, stats)
        assert (np.abs(out["z_score"].values)[:-1] >= np.abs(out["z_score"].values)[1:]).all()


class TestClustering:
    def test_hierarchical_shapes(self):
        from expecto_tpu.analysis.cluster import hierarchical_feature_clusters, feature_clusters_table

        rng = np.random.default_rng(0)
        n_marks, n_basis = 12, 10
        X = rng.normal(size=(50, n_basis * n_marks))
        labels = hierarchical_feature_clusters(X, n_clusters=3, n_basis=n_basis)
        assert labels.shape == (n_marks, n_basis)
        assert set(labels.ravel()) == {0, 1, 2}

        meta = pd.DataFrame({"Assay": [f"a{i}" for i in range(n_marks)]})
        table = feature_clusters_table(meta, labels, n_basis=n_basis)
        assert table.shape[0] == n_marks * n_basis
        assert {"coeff_idx", "cluster"} <= set(table.columns)
        # layout check: table rows are mark-major (each mark repeated per
        # basis coefficient), so row m*n_basis+b carries labels[m, b]
        for m in (0, n_marks - 1):
            for b in (0, n_basis - 1):
                row = table.iloc[m * n_basis + b]
                assert row["Assay"] == f"a{m}" and row["coeff_idx"] == b
                assert row["cluster"] == labels[m, b]

    def test_tfidf_svd(self):
        from expecto_tpu.analysis.cluster import tfidf_transform, tfidf_svd

        rng = np.random.default_rng(1)
        tracks = rng.random((30, 80)) + 0.01
        tfidf = tfidf_transform(tracks)
        tf = tracks / tracks.sum(axis=-1, keepdims=True)
        idf = np.log(tracks.shape[0] / (1 + tracks.sum(axis=0)))
        np.testing.assert_allclose(tfidf, tf * idf)
        svd = tfidf_svd(tracks, n_components=5)
        assert svd.transform(tfidf_transform(tracks)).shape == (30, 5)

    def test_kmeans(self):
        from expecto_tpu.analysis.cluster import kmeans_clusters

        rng = np.random.default_rng(2)
        X = np.concatenate([rng.normal(0, 0.1, (20, 4)), rng.normal(5, 0.1, (20, 4))])
        labels = kmeans_clusters(X, k=2)
        assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
        assert labels[0] != labels[-1]

    def test_louvain_separates_blobs(self):
        from expecto_tpu.analysis.cluster import louvain_clusters

        rng = np.random.default_rng(3)
        X = np.concatenate([
            rng.normal([0, 0, 0], 0.05, (15, 3)),
            rng.normal([10, 10, 10], 0.05, (15, 3)),
        ])
        labels = louvain_clusters(X, k_neighbors=5)
        assert len(set(labels[:15])) == 1 and len(set(labels[15:])) == 1
        assert labels[0] != labels[-1]


class TestFimo:
    def test_variant_query_and_filter(self, tiny_genome, tmp_path):
        from expecto_tpu.analysis.fimo import variant_query_seq, write_fimo_input, filter_fimo_results

        fa, contigs = tiny_genome
        pos = 1000
        ref = contigs["chr1"][pos - 1]
        seq = variant_query_seq(fa, "chr1", pos, ref, "N", bp_pad=30)
        assert len(seq) == 61 and seq[30] == ref

        vcf = pd.DataFrame([["chr1", pos, "rs1", ref, "N"]])
        write_fimo_input(vcf, fa, str(tmp_path / "q.fa"))
        recs = (tmp_path / "q.fa").read_text().splitlines()
        assert recs[0] == ">rs1" and recs[1] == seq

        # filter: match must cover bp_pad+1 = position 31
        fimo_txt = tmp_path / "fimo.txt"
        rows = [
            ["M1", "TF1", "rs1", 25, 35, "+", 10.0, 1e-5, 0.1, "AAA"],  # covers
            ["M1", "TF1", "rs1", 25, 33, "+", 12.0, 1e-6, 0.1, "AAA"],  # covers, better p
            ["M2", "TF2", "rs1", 1, 10, "+", 5.0, 1e-3, 0.5, "CCC"],  # doesn't cover
        ]
        fimo_txt.write_text("\n".join("\t".join(map(str, r)) for r in rows) + "\n")
        out = filter_fimo_results(str(fimo_txt))
        assert out.shape[0] == 1 and out.iloc[0]["p-value"] == 1e-6

        # MEME >= 5 emits an UNcommented header row; it must be dropped and
        # numeric columns restored (older MEME used '#' comments)
        header = "motif_id\tmotif_alt_id\tsequence_name\tstart\tstop\tstrand\tscore\tp-value\tq-value\tmatched_sequence"
        fimo5 = tmp_path / "fimo5.txt"
        fimo5.write_text(header + "\n" + "\n".join("\t".join(map(str, r)) for r in rows) + "\n")
        out5 = filter_fimo_results(str(fimo5))
        assert out5.shape[0] == 1 and out5.iloc[0]["p-value"] == 1e-6

    def test_hypergeom(self):
        from expecto_tpu.analysis.fimo import cluster_contribs_hypergeom

        # 3 clusters, bottom-1 as negative; one variant
        rsat = pd.DataFrame({"motifs": ["m1,m2", "m3", "m4"]}, index=["c1", "c2", "c3"])
        contribs = pd.DataFrame([["x", "y", "rs1"] + [0.0] * 12 + [3.0, 2.0, 0.1]],
                                columns=list(range(15)) + ["c1", "c2", "c3"])
        fimo = pd.DataFrame({"sequence_name": ["rs1", "rs1"], "motif_alt_id": ["m1", "m4"]})
        df = cluster_contribs_hypergeom(contribs, fimo, rsat, n_neg_clusters=1)
        assert df.shape[0] == 2
        assert (df["hypergeom_pval"] <= 1).all()

    def test_enriched_motif_set(self, tmp_path):
        from expecto_tpu.analysis.fimo import extract_enriched_motif_set

        (tmp_path / "h.tsv").write_text("motif\thypergeom_qval\nM1\t0.001\nM2\t0.5\n")
        meme = "MEME version 4\n\nALPHABET= ACGT\n\nMOTIF M1 TF1\nletter-probability matrix\n0.25 0.25 0.25 0.25\n\nMOTIF M2 TF2\nletter-probability matrix\n0.1 0.4 0.4 0.1\n"
        (tmp_path / "db.meme").write_text(meme)
        found = extract_enriched_motif_set(str(tmp_path / "h.tsv"), str(tmp_path / "db.meme"), str(tmp_path / "out.meme"))
        assert found == {"M1"}
        out = (tmp_path / "out.meme").read_text()
        assert "MOTIF M1" in out and "MOTIF M2" not in out
        assert "MEME version 4" in out


class TestAtac:
    def test_binning(self):
        from expecto_tpu.analysis.atac import get_atac_peak_bins

        tss, strand = 100000, 1
        rf_start = tss - 20899 - strand * 100
        # one peak fully covering bin 3 (positions 600..800 within rf), one
        # peak covering only 50bp of bin 10
        peaks = {"chr1": np.array([
            [rf_start + 600, rf_start + 800],
            [rf_start + 10 * 200, rf_start + 10 * 200 + 50],
        ])}
        bins = get_atac_peak_bins("chr1", tss, strand, peaks)
        assert bins.shape == (200,)
        assert bins[3] == 1.0
        assert bins[10] == 0.0  # 50bp < 100bp threshold

    def test_apply_mask(self):
        from expecto_tpu.analysis.atac import apply_peak_mask

        preds = np.ones((4, 6))
        mask = np.array([1.0, 0.0, 1.0, 0.0])
        out = apply_peak_mask(preds, mask, np.array([1, 3]))
        assert (out[:, [0, 2, 4, 5]] == 1).all()
        np.testing.assert_array_equal(out[:, 1], mask)


class TestExtract:
    def test_expecto_bin(self):
        from expecto_tpu.analysis.extract import get_snp_bin

        # shift -20000 window covers [-20999, -19001); snp at tss-20000 -> bin 0
        assert get_snp_bin(80000, 100000, "+", "expecto") == 0
        # rel 0 first falls in the shift=-1000 window (index 95)
        assert get_snp_bin(100000, 100000, "+", "expecto") == 95
        # minus strand: window for shift s covers rel in [-s-999, -s+1001)
        assert get_snp_bin(100000 + 20000, 100000, "-", "expecto") == 0

    def test_expecto_bin_zero_matches_reference_scan(self):
        from expecto_tpu.analysis.extract import get_snp_bin
        from expecto_tpu.genome.windows import gene_shifts

        # replicate the reference's linear scan semantics directly
        for rel in [-500, 0, 777]:
            i = get_snp_bin(100000 + rel, 100000, "+", "expecto")
            shifts = gene_shifts()
            first = next(
                idx for idx, s in enumerate(shifts) if s - 999 <= rel < s + 1001
            )
            assert i == first

    def test_basenji_bin(self):
        from expecto_tpu.analysis.extract import get_snp_bin

        # SNP at TSS, + strand: index 65535 -> bin 511 -> cropped 447
        assert get_snp_bin(5000, 5000, "+", "basenji") == 511 - 64
        with pytest.raises(AssertionError):
            get_snp_bin(5000 + 70000, 5000, "+", "basenji")


class TestPwm:
    def test_jaspar_roundtrip_and_collect(self, tmp_path):
        from expecto_tpu.analysis.pwm import parse_jaspar, write_jaspar, collect_cluster_motifs

        jaspar = ">MA0001.1 CTCF\nA [ 1 2 3 ]\nC [ 4 5 6 ]\nG [ 7 8 9 ]\nT [ 1 1 1 ]\n"
        jdir = tmp_path / "jaspar"
        jdir.mkdir()
        (jdir / "ctcf.jaspar").write_text(jaspar)
        (jdir / "dimer.jaspar").write_text(jaspar.replace("CTCF", "FOS::JUN").replace("MA0001.1", "MA0002.1"))
        hocomoco = ">H1 CTCF_HUMAN.H11MO.0.A\nA [ 1 1 ]\nC [ 1 1 ]\nG [ 1 1 ]\nT [ 1 1 ]\n>H2 GATA1_HUMAN\nA [ 2 2 ]\nC [ 1 1 ]\nG [ 1 1 ]\nT [ 1 1 ]\n"
        (tmp_path / "hoco.jaspar").write_text(hocomoco)

        motifs, found = collect_cluster_motifs({"CTCF"}, str(jdir), str(tmp_path / "hoco.jaspar"))
        assert found == {"CTCF"}
        assert len(motifs) == 2  # JASPAR CTCF + HOCOMOCO CTCF_HUMAN; dimer skipped

        parsed = parse_jaspar(write_jaspar(motifs))
        assert parsed[0].matrix_id == "MA0001.1"
        np.testing.assert_allclose(parsed[0].pwm().sum(axis=0), 1.0)


class TestProfiles:
    def test_join_and_rank_match(self):
        from expecto_tpu.pipeline.profiles import join_counts_to_geneanno, rank_match_to_profile

        geneanno = pd.DataFrame({"symbol": ["g1", "g2", "g3"]}, index=["E1", "E2", "E3"])
        counts = pd.DataFrame({"t1": [10.0, 1.0]}, index=["E1", "E3"])
        out = join_counts_to_geneanno(geneanno, counts, on="index")
        assert out.shape == (3, 1)
        assert np.isnan(out.iloc[1, 0])

        ref_profile = pd.Series([100.0, 5.0, 50.0])
        matched = rank_match_to_profile(out, ref_profile)
        # g1 (10, rank 1) -> highest available ref value among non-nan rows
        assert matched.iloc[0, 0] == 100.0
        assert matched.iloc[2, 0] == 50.0
        assert np.isnan(matched.iloc[1, 0])

    def test_log2_conversion(self):
        from expecto_tpu.pipeline.profiles import join_counts_to_geneanno

        geneanno = pd.DataFrame({"symbol": ["a"]}, index=["E1"])
        counts = pd.DataFrame({"t": [np.log2(10.0 + 0.1)]}, index=["E1"])
        out = join_counts_to_geneanno(geneanno, counts, on="index", log2_offset=0.1)
        assert out.iloc[0, 0] == pytest.approx(10.0)

    def test_rank_match_integer_counts(self):
        """Integer count columns must not crash the NaN write or truncate
        fractional reference values (regression: int64 vals[...] = np.nan
        raised, and float refs were silently floored)."""
        from expecto_tpu.pipeline.profiles import rank_match_to_profile

        out = pd.DataFrame({"t": np.array([10, 1, 5], dtype=np.int64)})
        matched = rank_match_to_profile(out, pd.Series([100.75, 5.5, 50.25]))
        assert matched.iloc[0, 0] == pytest.approx(100.75)  # not floored to 100
        assert matched.iloc[1, 0] == pytest.approx(5.5)

    def test_duplicate_join_keys_warn(self):
        from expecto_tpu.pipeline.profiles import join_counts_to_geneanno

        geneanno = pd.DataFrame({"symbol": ["g1", "g2"]}, index=["E1", "E2"])
        counts = pd.DataFrame({"t": [1.0, 2.0, 3.0]}, index=["E1", "E1", "E2"])
        with pytest.warns(UserWarning, match="row-aligns"):
            out = join_counts_to_geneanno(geneanno, counts, on="index")
        assert len(out) == 3  # reference left-merge behavior, but loudly


def test_all_tissues_holdout_matches_susztak():
    """The multi-tissue sweep must exclude chr7 AND chr8 from training
    (train_susztak.py:117-122), unlike the single-model chr8-only split."""
    from expecto_tpu.pipeline.train import chromosome_split

    geneanno = pd.DataFrame({"seqnames": ["chr1", "chr7", "chr8", "chrX"]})
    tr, te = chromosome_split(geneanno, holdout_train=("chrX", "chrY", "chr7", "chr8"))
    assert list(tr) == [True, False, False, False]
    assert list(te) == [False, False, True, False]
    tr_single, _ = chromosome_split(geneanno)  # reference train.py split
    assert list(tr_single) == [True, True, False, False]


class TestClosestGenes:
    @pytest.fixture()
    def geneanno(self):
        return pd.DataFrame(
            {
                "seqnames": ["chr1", "chr1", "chr2"],
                "strand": ["+", "-", "+"],
                "CAGE_representative_TSS": [1000, 50000, 7000],
            },
            index=["G1", "G2", "G3"],
        )

    def test_closest(self, geneanno):
        from expecto_tpu.genome.closest_genes import find_closest_gene

        assert find_closest_gene("chr1", 1200, geneanno).index[0] == "G1"
        assert find_closest_gene("chr1", 49000, geneanno).index[0] == "G2"

    def test_receptive_field_fallback(self, geneanno):
        from expecto_tpu.genome.closest_genes import get_genes_in_receptive_field

        # variant 25kb from G1 and G2: outside both receptive fields -> closest
        out = get_genes_in_receptive_field("chr1", 26000, geneanno)
        assert out.shape[0] == 1

    def test_table_layout(self, geneanno):
        from expecto_tpu.genome.closest_genes import make_closest_genes_table

        vcf = pd.DataFrame([["chr1", 1200, ".", "A", "T"]])
        genes, vcf_out = make_closest_genes_table(vcf, geneanno)
        assert genes.shape == (1, 11)
        row = genes.iloc[0]
        assert row["snp_chrom"] == "1" and row["snp_pos"] == 1200
        assert row["ens_id"] == "G1" and row["dist_to_tss"] == 1000 - 1200


class TestPlotting:
    def test_plot_preds_writes_file(self, tmp_path):
        from expecto_tpu.utils.plotting import plot_preds

        rng = np.random.default_rng(0)
        y = rng.normal(size=50)
        stats = plot_preds(y, y + rng.normal(size=50) * 0.1, tmp_path / "p.png")
        assert (tmp_path / "p.png").exists()
        assert stats["pearsonr"] > 0.9


class TestGroupedClustering:
    def test_mark_clusters(self):
        from expecto_tpu.analysis.cluster import (
            hierarchical_mark_clusters,
            mark_clusters_table,
            cluster_sizes,
        )

        rng = np.random.default_rng(4)
        n_marks, n_basis = 8, 10
        X = rng.normal(size=(40, n_basis * n_marks))
        labels = hierarchical_mark_clusters(X, n_clusters=3, n_basis=n_basis)
        assert labels.shape == (n_marks,)
        meta = pd.DataFrame({"Assay": [f"a{i}" for i in range(n_marks)]})
        table = mark_clusters_table(meta, labels)
        assert table.shape[0] == n_marks
        sizes = cluster_sizes(table)
        assert sizes["size"].sum() == n_marks


class TestExtractDriver:
    def test_extract_consensus_track_bins(self, tmp_path):
        import h5py
        from expecto_tpu.analysis.extract import extract_consensus_track_bins, get_snp_bin

        rng = np.random.default_rng(5)
        preds = rng.normal(size=(3, 200, 10)).astype(np.float32)
        with h5py.File(tmp_path / "g_chromatin.h5", "w") as f:
            f.create_dataset("chromatin_preds", data=preds)
            f.create_dataset("record_ids", data=np.array([b"a|s1|-|h", b"a|s2|-|h", b"a|s3|-|h"]))

        tss = 100000
        snp = tss - 300
        out = extract_consensus_track_bins(
            str(tmp_path / "g_chromatin.h5"), snp, tss, "+", [0, 3],
            out_h5_path=str(tmp_path / "out.h5"),
        )
        sbin = get_snp_bin(snp, tss, "+")
        np.testing.assert_array_equal(out["snp_bin_preds"], preds[:, sbin][:, [0, 3]])
        with h5py.File(tmp_path / "out.h5") as f:
            assert f.attrs["snp_bin"] == sbin
            assert f["flank_preds"].shape[0] == 3


class TestAtacFeatures:
    def test_compute_gene_features_atac(self, tiny_genome):
        from expecto_tpu.pipeline.features import compute_gene_features_atac, GeneRecord
        from expecto_tpu.genome.encode import codes_to_onehot, reverse_complement_codes

        class FakeRunner:
            def predict_codes(self, codes, average_rc=False):
                x = codes_to_onehot(codes).reshape(codes.shape[0], -1)
                rng = np.random.default_rng(0)
                proj = rng.normal(size=(2000 * 4, 2002)).astype(np.float32) * 0.01
                out = x @ proj
                if average_rc:
                    xr = codes_to_onehot(reverse_complement_codes(codes)).reshape(codes.shape[0], -1)
                    out = (out + xr @ proj) / 2
                return out

        fa, _ = tiny_genome
        genes = [GeneRecord("G1", "chr1", 30000, 1)]
        shifts = [-400, -200, 0, 200]
        # peaks covering the whole receptive field -> mask all ones -> equal
        # to unmasked features on chip tracks
        peaks_all = {"chr1": np.array([[0, 10**6]])}
        chip_idx = np.array([1, 5])
        feats = compute_gene_features_atac(
            genes, fa, FakeRunner(), peaks_all, chip_idx, shifts=shifts
        )
        assert feats.shape == (1, 10 * 2002)

        # no peaks -> chip tracks zeroed -> their features vanish
        feats0 = compute_gene_features_atac(
            genes, fa, FakeRunner(), {"chr1": np.empty((0, 2))}, chip_idx, shifts=shifts
        )
        blocks = feats0.reshape(1, 10, 2002)
        assert np.abs(blocks[:, :, chip_idx]).max() == 0
        non_chip = [i for i in range(2002) if i not in chip_idx]
        np.testing.assert_allclose(
            feats0.reshape(1, 10, 2002)[:, :, non_chip],
            feats.reshape(1, 10, 2002)[:, :, non_chip],
            rtol=1e-6,
        )
