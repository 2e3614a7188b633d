"""End-to-end pipeline tests: chromatin effects vs a torch oracle, SED
scoring vs a numpy oracle, legacy example fixtures, training driver."""

import os

import h5py
import numpy as np
import pandas as pd
import pytest
import torch

from expecto_tpu.genome.encode import encode_seqs
from expecto_tpu.genome.windows import variant_shifts
from expecto_tpu.io.h5 import read_shift_h5, read_shift_h5_averaged
from expecto_tpu.models.convert import state_dict_to_params
from expecto_tpu.models.gblinear import GBLinearModel
from expecto_tpu.parallel.runner import BelugaRunner
from expecto_tpu.pipeline.chromatin import compute_variant_chromatin_effects
from expecto_tpu.pipeline.sed import (
    load_shift_effects,
    score_sed,
    score_sed_multimodel,
    get_num_repeats,
)
from torch_oracle import TorchBeluga

REFERENCE_EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(11)
    net = TorchBeluga().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(0.05)
    return net


@pytest.fixture(scope="module")
def runner(oracle):
    return BelugaRunner(state_dict_to_params(oracle.state_dict_reference_keys()), batch_size=64)


@pytest.fixture(scope="module")
def tiny_vcf(tiny_genome):
    fa, contigs = tiny_genome
    rows = []
    for pos in [5000, 12000, 30000]:
        ref = contigs["chr1"][pos - 1]
        alt = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref]
        rows.append(["chr1", pos, ".", ref, alt])
    return pd.DataFrame(rows)


def torch_predict(net, seqs):
    enc = encode_seqs(seqs, 2000, layout="NCL")  # (2N, 4, 2000) with RC
    with torch.no_grad():
        out = net(torch.from_numpy(enc[:, :, None, :]))
    return out.numpy()


class TestChromatinPipeline:
    def test_h5_outputs_match_torch_oracle(self, tiny_genome, tiny_vcf, runner, oracle, tmp_path):
        fa, _ = tiny_genome
        res = compute_variant_chromatin_effects(
            tiny_vcf, fa, runner, tmp_path, maxshift=200, output_prefix="snps", verbose=False
        )
        assert res.ref_matched == 3 and res.alt_matched == 0
        assert res.shifts == [0, -200, 200]

        from expecto_tpu.genome.windows import fetch_variant_window

        for shift in res.shifts:
            data = read_shift_h5(tmp_path / f"snps.shift_{shift}.diff.h5")
            assert set(data) == {"diff", "ref", "alt"}
            ref_seqs, alt_seqs = [], []
            for _, row in tiny_vcf.iterrows():
                w = fetch_variant_window(fa, row[0], int(row[1]), row[3], row[4], shift=shift)
                ref_seqs.append(w.ref_seq)
                alt_seqs.append(w.alt_seq)
            want_ref = torch_predict(oracle, ref_seqs)
            want_alt = torch_predict(oracle, alt_seqs)
            np.testing.assert_allclose(data["ref"], want_ref, atol=3e-6)
            np.testing.assert_allclose(data["alt"], want_alt, atol=3e-6)
            np.testing.assert_allclose(data["diff"], want_alt - want_ref, atol=5e-6)


class TestStreamingH5:
    def test_streaming_h5_equals_bulk_path(self, tiny_genome, runner, tmp_path):
        """h5-only runs (keep_arrays=False) stream pair-diff chunks straight
        into the datasets — peak memory is a few chunks instead of
        3 x (2N, S, M) arrays (~43 GB at the reference's default 1e5-variant
        chunk size). The streamed files must equal the bulk path's
        bit-for-bit (same kernel, same chunking), including the legacy
        single-'pred' schema."""
        fa, contigs = tiny_genome
        c1 = contigs["chr1"]
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        rows = [
            ["chr1", 6000, ".", c1[5999], comp[c1[5999]]],            # sub
            ["chr1", 12000, ".", c1[11999], c1[11999] + "AG"],        # insertion
            ["chr1", 900, ".", c1[899], comp[c1[899]]],               # contig edge -> window fallback
            ["chr1", 20000, ".", c1[19999 : 19999 + 4], c1[19999]],   # deletion
        ]
        vcf = pd.DataFrame(rows)

        bulk_dir, stream_dir = tmp_path / "bulk", tmp_path / "stream"
        # keep_arrays=True forces the bulk (in-memory) path, which also
        # writes h5s; keep_arrays=False takes the streaming path
        res_b = compute_variant_chromatin_effects(
            vcf, fa, runner, bulk_dir, maxshift=200, keep_arrays=True, legacy_h5=True, verbose=False
        )
        res_s = compute_variant_chromatin_effects(
            vcf, fa, runner, stream_dir, maxshift=200, legacy_h5=True, verbose=False
        )
        assert res_s.shifts == res_b.shifts and res_s.arrays is None
        for shift in res_b.shifts:
            for suffix in (f"snps.shift_{shift}.diff.h5", f"snps.shift_{shift}.legacy.diff.h5"):
                with h5py.File(bulk_dir / suffix) as fb, h5py.File(stream_dir / suffix) as fs:
                    assert sorted(fb.keys()) == sorted(fs.keys())
                    for key in fb:
                        np.testing.assert_array_equal(
                            np.asarray(fs[key]), np.asarray(fb[key]), err_msg=f"{suffix}/{key}"
                        )


class TestLegacyOnly:
    def test_legacy_only_halves_wire_same_pred(self, tiny_genome, runner, tmp_path):
        """--legacy_only writes ONLY the original-ExPecto 'pred' h5s (the
        bundled example's format) via the diff-only wire — the pred values
        must equal the full-contract run's, and no diff/ref/alt files may
        appear. Mixed rows included (the window-fallback row rides the
        normal path and writes its diff as pred)."""
        fa, contigs = tiny_genome
        c1 = contigs["chr1"]
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        rows = [
            ["chr1", 6000, ".", c1[5999], comp[c1[5999]]],           # sub
            ["chr1", 12000, ".", c1[11999], c1[11999] + "AG"],       # insertion
            ["chr1", 900, ".", c1[899], comp[c1[899]]],              # edge -> window fallback
        ]
        vcf = pd.DataFrame(rows)
        full_dir, legacy_dir = tmp_path / "full", tmp_path / "legacy"
        compute_variant_chromatin_effects(
            vcf, fa, runner, full_dir, maxshift=200, legacy_h5=True, verbose=False
        )
        res = compute_variant_chromatin_effects(
            vcf, fa, runner, legacy_dir, maxshift=200, legacy_only=True, verbose=False
        )
        for shift in res.shifts:
            assert not (legacy_dir / f"snps.shift_{shift}.diff.h5").exists()
            suffix = f"snps.shift_{shift}.legacy.diff.h5"
            with h5py.File(full_dir / suffix) as ff, h5py.File(legacy_dir / suffix) as fl:
                assert list(fl.keys()) == ["pred"]
                np.testing.assert_allclose(
                    np.asarray(fl["pred"]), np.asarray(ff["pred"]), atol=2e-6, err_msg=suffix
                )

    def test_diff_only_kernel_matches_pair_diff(self, runner):
        """The diff-only wire equals the pair-diff kernel's diff exactly in
        fp32 parity mode (same forward, same on-device differencing)."""
        rng = np.random.default_rng(61)
        maxshift = 200
        offsets = tuple(s + maxshift for s in [0, -200, 200])
        span_len = 2 * maxshift + 2000
        ref = rng.integers(0, 4, size=(3, span_len)).astype(np.int8)
        alt = ref.copy()
        alt[:, maxshift + 999] = (alt[:, maxshift + 999] + 1) % 4
        _, _, want = runner.predict_span_pairs_diff(ref, alt, offsets)
        got = runner.predict_span_pair_diffs_only(ref, alt, offsets)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestDuckTypedRunner:
    def test_window_path_accepts_minimal_predict_codes_runner(self, tiny_genome, tiny_vcf):
        """The window path must keep the minimal duck-typed runner contract
        ``predict_codes(codes, average_rc=...)`` — the fp32-wire override is
        only passed to runners that advertise a non-fp32 ``out_dtype``
        (regression: r4's review caught a TypeError here)."""

        class MinimalRunner:
            def predict_codes(self, codes, average_rc=False):
                # deterministic fp32 stand-in; no out_dtype attribute
                return np.full((codes.shape[0], 2002), 0.25, np.float32)

        fa, _ = tiny_genome
        res = compute_variant_chromatin_effects(
            tiny_vcf, fa, MinimalRunner(), None, maxshift=200, use_spans="never",
            keep_arrays=True, verbose=False,
        )
        n = tiny_vcf.shape[0]
        for shift in res.shifts:
            diff, ref, alt = res.arrays[shift]
            assert ref.shape == (2 * n, 2002)
            np.testing.assert_array_equal(diff, np.zeros_like(diff))


class TestSpanPathRouting:
    def test_unknown_chromosome_raises_clearly(self, tiny_genome, runner):
        """A VCF contig absent from the FASTA raises one clear ValueError on
        the FULL table (not a KeyError deep in the window fetch — which in a
        distributed run would kill only the owning host and hang the rest at
        the next barrier)."""
        fa, contigs = tiny_genome
        rows = [
            ["chr1", 5000, ".", contigs["chr1"][4999], "T" if contigs["chr1"][4999] != "T" else "A"],
            ["chrEBV", 1000, ".", "A", "T"],
        ]
        with pytest.raises(ValueError, match="chrEBV.*not present"):
            compute_variant_chromatin_effects(
                pd.DataFrame(rows), fa, runner, None, maxshift=200, keep_arrays=True, verbose=False
            )

    def test_mixed_vcf_rides_one_span_batch(self, tiny_genome, runner):
        """Substitutions AND in-slack indels are span-eligible: 'auto' on a
        mixed VCF equals use_spans='always' bit-for-bit (everything in one
        span batch, no per-class split) and matches the reference per-window
        semantics numerically."""
        fa, contigs = tiny_genome
        c1 = contigs["chr1"]
        rows = [
            ["chr1", 5000, ".", c1[4999], "T" if c1[4999] != "T" else "A"],      # sub
            ["chr1", 9000, ".", c1[8999 : 8999 + 3], c1[8999]],                  # deletion (-2)
            ["chr1", 12000, ".", c1[11999], "C" if c1[11999] != "C" else "G"],   # sub
            ["chr1", 20000, ".", c1[19999], c1[19999] + "AG"],                   # insertion (+2)
        ]
        vcf = pd.DataFrame(rows)

        auto = compute_variant_chromatin_effects(
            vcf, fa, runner, None, maxshift=200, keep_arrays=True, verbose=False
        )
        spans = compute_variant_chromatin_effects(
            vcf, fa, runner, None, maxshift=200, keep_arrays=True, use_spans="always", verbose=False
        )
        windows = compute_variant_chromatin_effects(
            vcf, fa, runner, None, maxshift=200, keep_arrays=True, use_spans="never", verbose=False
        )
        for shift in auto.shifts:
            for k in range(3):  # diff, ref, alt
                np.testing.assert_array_equal(auto.arrays[shift][k], spans.arrays[shift][k])
                np.testing.assert_allclose(auto.arrays[shift][k], windows.arrays[shift][k], atol=3e-5)

    @pytest.mark.slow
    def test_ineligible_rows_fall_back_to_window_path(self, tiny_genome, runner):
        """Rows the span path cannot reproduce exactly — allele length change
        beyond the 100 bp crop slack, or shift windows crossing a contig
        edge (the reference clamp-shifts those fetches) — take the
        per-window path; eligible rows keep the span path; rows re-merge in
        input order."""
        fa, contigs = tiny_genome
        c1 = contigs["chr1"]
        rows = [
            ["chr1", 5000, ".", c1[4999], "T" if c1[4999] != "T" else "A"],     # eligible sub
            ["chr1", 15000, ".", c1[14999 : 14999 + 151], c1[14999]],           # -150 bp: out of crop slack
            ["chr1", 900, ".", c1[899], "A" if c1[899] != "A" else "G"],        # windows cross contig start
            ["chr1", 22000, ".", c1[21999], c1[21999] + "CT"],                  # eligible insertion
        ]
        vcf = pd.DataFrame(rows)
        ok_idx, bad_idx = [0, 3], [1, 2]

        res = compute_variant_chromatin_effects(
            vcf, fa, runner, None, maxshift=200, keep_arrays=True, verbose=False
        )
        res_ok = compute_variant_chromatin_effects(
            vcf.iloc[ok_idx], fa, runner, None, maxshift=200, keep_arrays=True,
            use_spans="always", verbose=False,
        )
        res_bad = compute_variant_chromatin_effects(
            vcf.iloc[bad_idx], fa, runner, None, maxshift=200, keep_arrays=True,
            use_spans="never", verbose=False,
        )
        n, nk, nb = 4, 2, 2
        for shift in res.shifts:
            for k in range(3):  # diff, ref, alt
                merged = res.arrays[shift][k]
                okset = res_ok.arrays[shift][k]
                badset = res_bad.arrays[shift][k]
                assert merged.shape == (2 * n, okset.shape[1])
                # per-class bit-equality (same kernels, same inputs), rows in
                # input order, fwd rows [0:N] / RC rows [N:2N]
                np.testing.assert_array_equal(merged[ok_idx], okset[:nk])
                np.testing.assert_array_equal(merged[[n + i for i in ok_idx]], okset[nk:])
                np.testing.assert_array_equal(merged[bad_idx], badset[:nb])
                np.testing.assert_array_equal(merged[[n + i for i in bad_idx]], badset[nb:])

    def test_always_raises_on_ineligible_rows(self, tiny_genome, runner):
        fa, contigs = tiny_genome
        c1 = contigs["chr1"]
        vcf = pd.DataFrame([["chr1", 15000, ".", c1[14999 : 14999 + 151], c1[14999]]])
        with pytest.raises(ValueError, match="span-eligible"):
            compute_variant_chromatin_effects(
                vcf, fa, runner, None, maxshift=200, keep_arrays=True, use_spans="always", verbose=False
            )


class TestDiagnostics:
    def test_vectorized_matches_string_loop(self, tiny_genome):
        """The batched window_bytes diagnostics must count exactly like the
        reference's per-variant string compare (chromatin.py:256-260),
        including the clamp-shifted site near a contig start, indels,
        lowercase alleles, and contig-end truncation."""
        from expecto_tpu.pipeline.chromatin import _diagnostics

        fa, contigs = tiny_genome
        inputsize = 2000
        mutpos = int((inputsize + 100) / 2 - 1)

        def oracle(chroms, positions, refs, alts):
            rm = am = 0
            for i in range(len(chroms)):
                if positions[i] - mutpos >= 1:
                    site = fa.sequence(chroms[i], positions[i], positions[i] + len(refs[i]) - 1).upper()
                else:
                    seq = fa.sequence(chroms[i], positions[i] - mutpos, positions[i] + int((inputsize + 100) / 2))
                    site = seq[mutpos : mutpos + len(refs[i])].upper()
                rm += site == refs[i].upper()
                am += site == alts[i].upper()
            return rm, am

        c1 = contigs["chr1"]
        rows = [
            ("chr1", 5000, c1[4999], "T"),                   # ref matches
            ("chr1", 5001, "N", c1[5000]),                   # alt matches
            ("chr1", 700, c1[699], "A"),                     # clamped window start
            ("chr1", 100, c1[mutpos], "G"),                  # clamp-shifted site read
            ("chr1", 8000, c1[7999:8003], "T"),              # 4-bp ref (deletion-style)
            ("chr1", 8100, c1[8099], c1[8099] + "TTT"),      # insertion: alt never matches
            ("chr1", 9000, c1[8999].lower(), c1[8999]),      # case-insensitive; both match
            ("chr1", len(c1) - 1, c1[-2:] + "AA", "C"),      # ref runs past the contig end
            ("chr2", 3000, contigs["chr2"][2999], "A"),
        ]
        chroms = [r[0] for r in rows]
        positions = [r[1] for r in rows]
        refs = [r[2] for r in rows]
        alts = [r[3] for r in rows]
        got = _diagnostics(fa, chroms, positions, refs, alts, inputsize, verbose=False)
        assert got == oracle(chroms, positions, refs, alts)
        assert got[0] >= 5  # the matched rows above actually matched


class TestLegacyWrite:
    def test_legacy_h5_roundtrip(self, tiny_genome, tiny_vcf, runner, tmp_path):
        from expecto_tpu.io.h5 import write_legacy_shift_h5

        fa, _ = tiny_genome
        compute_variant_chromatin_effects(
            tiny_vcf, fa, runner, tmp_path, maxshift=200, output_prefix="snps",
            verbose=False, legacy_h5=True,
        )
        for shift in (0, -200, 200):
            fork = read_shift_h5(tmp_path / f"snps.shift_{shift}.diff.h5")
            legacy = read_shift_h5(tmp_path / f"snps.shift_{shift}.legacy.diff.h5")
            assert set(legacy) == {"diff"}  # single-'pred' schema
            np.testing.assert_array_equal(legacy["diff"], fork["diff"])


class TestLegacyExample:
    def test_reads_reference_example_h5(self):
        data = read_shift_h5(f"{REFERENCE_EXAMPLE}/example.vcf.shift_0.diff.h5")
        assert set(data) == {"diff"}
        assert data["diff"].shape == (20, 2002)

    def test_load_shift_effects_legacy(self):
        effects = load_shift_effects(f"{REFERENCE_EXAMPLE}/example.vcf.shift_SHIFT.diff.h5", maxshift=800)
        assert effects["diff"].shape == (9, 10, 2002)

    def test_score_sed_legacy_proportion_is_nan(self, tmp_path):
        """Legacy single-'pred' inputs have REF=ALT=0: the proportion
        ranking is undefined and must come out NaN (not inf + warnings)."""
        import warnings

        from expecto_tpu.pipeline.sed import score_sed

        effects = load_shift_effects(f"{REFERENCE_EXAMPLE}/example.vcf.shift_SHIFT.diff.h5")
        coor = pd.read_csv(f"{REFERENCE_EXAMPLE}/example.vcf", sep="\t", header=None, comment="#")
        gene = pd.read_csv(f"{REFERENCE_EXAMPLE}/example.vcf.bed.sorted.bed.closestgene", sep="\t", header=None)
        model = GBLinearModel(
            weight=np.random.default_rng(0).normal(size=20020).astype(np.float32) * 0.01,
            bias=0.0,
            base_score=2.0,
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no RuntimeWarning allowed
            res = score_sed(effects, coor, gene, model, out_dir=str(tmp_path))
        assert np.isnan(res.sorted_by_proportion["SED_PROPORTION"]).all()
        assert (res.table["REF"] == 0).all() and (res.table["ALT"] == 0).all()

    def test_multimodel_output_csv(self, tmp_path):
        effects = load_shift_effects(f"{REFERENCE_EXAMPLE}/example.vcf.shift_SHIFT.diff.h5")
        coor = pd.read_csv(f"{REFERENCE_EXAMPLE}/example.vcf", sep="\t", header=None, comment="#")
        gene = pd.read_csv(f"{REFERENCE_EXAMPLE}/example.vcf.bed.sorted.bed.closestgene", sep="\t", header=None)

        rng = np.random.default_rng(5)
        paths = []
        from expecto_tpu.io.xgb import save_xgb07_binary

        for i in range(3):
            m = GBLinearModel(weight=rng.normal(size=20020).astype(np.float32) * 0.01, bias=0.1 * i, base_score=2.0)
            p = tmp_path / f"model{i}.save"
            save_xgb07_binary(m, p)
            paths.append(str(p))

        df = score_sed_multimodel(effects, coor, gene, paths, output_csv=tmp_path / "output.csv")
        assert df.shape[0] == 10  # one row per (variant, gene)
        assert "model0.save" in df.columns
        out = pd.read_csv(tmp_path / "output.csv")
        assert out.shape[0] == 10

        # oracle check for one model: effect = -(diff_features @ w)
        from expecto_tpu.ops.decay import variant_basis, project_features
        from expecto_tpu.io.xgb import load_expression_model

        dist = -gene.iloc[:, -1].values
        strand = gene.iloc[:, -3].values
        basis = variant_basis(dist, strand, variant_shifts(800))
        feats = project_features(basis, effects["diff"])
        m0 = load_expression_model(paths[0])
        np.testing.assert_allclose(df["model0.save"].values, -(feats @ m0.weight), rtol=1e-4, atol=1e-7)


class TestSedScoring:
    def test_fork_schema_sed(self, tiny_genome, tiny_vcf, runner, tmp_path):
        fa, _ = tiny_genome
        compute_variant_chromatin_effects(
            tiny_vcf, fa, runner, tmp_path, maxshift=200, output_prefix="snps", verbose=False
        )
        effects = load_shift_effects(str(tmp_path / "snps.shift_SHIFT.diff.h5"), maxshift=200)
        assert set(effects) == {"diff", "ref", "alt"}

        # closest-gene file: 11 cols, last three = strand, gene, dist
        gene = pd.DataFrame(
            [
                ["1", 4999, 5000, r[3], r[4], "1", 6999, 7000, "+", "GENE1", 7000 - int(r[1])]
                for _, r in tiny_vcf.iterrows()
            ]
        )
        rng = np.random.default_rng(6)
        model = GBLinearModel(weight=rng.normal(size=20020).astype(np.float32) * 0.01, bias=0.3, base_score=2.0)

        res = score_sed(effects, tiny_vcf, gene, model, maxshift=200, out_dir=tmp_path / "sed_out")
        df = res.table
        assert df.shape[0] == 3
        assert {"REF", "ALT", "SED"} <= set(df.columns)
        np.testing.assert_allclose(df["SED"].values, df["ALT"].values - df["REF"].values, atol=1e-6)
        assert (tmp_path / "sed_out" / "sed.tsv").exists()
        assert (tmp_path / "sed_out" / "sed_sorted_by_magnitude.tsv").exists()

        # linearity oracle: SED == w . (alt_feat - ref_feat) == w . diff_feat
        from expecto_tpu.ops.decay import variant_basis, project_features

        basis = variant_basis(df["dist"].values, df["strand"].values, variant_shifts(200))
        diff_feat = project_features(basis, effects["diff"])
        np.testing.assert_allclose(df["SED"].values, diff_feat @ model.weight, rtol=1e-3, atol=1e-6)

    def test_num_repeats(self):
        gene = pd.DataFrame(
            [
                ["1", 9, 10, "A", "T", "x", "y", "z", "+", "G1", 5],
                ["1", 9, 10, "A", "T", "x", "y", "z", "+", "G2", 8],
                ["1", 19, 20, "C", "G", "x", "y", "z", "-", "G3", 2],
            ]
        )
        assert get_num_repeats(gene) == [2, 1]

    def test_duplicate_variant_alignment(self):
        # two identical vcf rows -> dedup keeps first; gene file dedups too
        effects = {"diff": np.random.default_rng(0).normal(size=(1, 2, 4))}
        coor = pd.DataFrame([["chr1", 10, ".", "A", "T"], ["chr1", 10, ".", "A", "T"]])
        gene = pd.DataFrame([["1", 9, 10, "A", "T", "1", 99, 100, "+", "G1", 90]] * 2)
        from expecto_tpu.pipeline.sed import align_variants_with_genes

        inputs = align_variants_with_genes(coor, gene, effects)
        assert inputs.coor.shape[0] == 1
        assert inputs.effects["diff"].shape == (1, 1, 4)


class TestTraining:
    def test_train_expression_model_end_to_end(self, tmp_path):
        rng = np.random.default_rng(9)
        n_genes, n_feat = 300, 40
        X = rng.normal(size=(n_genes, n_feat)).astype(np.float32)
        w_true = rng.normal(size=n_feat)
        expr = np.exp(X @ w_true * 0.1 + 1.0)

        chroms = rng.choice(["chr1", "chr2", "chr8", "chrX"], size=n_genes, p=[0.4, 0.3, 0.2, 0.1])
        geneanno = pd.DataFrame(
            {
                "id": [f"G{i}" for i in range(n_genes)],
                "seqnames": chroms,
                "type": ["protein_coding"] * n_genes,
            }
        )

        from expecto_tpu.models.gblinear import GBLinearParams
        from expecto_tpu.pipeline.train import train_expression_model

        res = train_expression_model(
            X,
            geneanno,
            expr,
            params=GBLinearParams(eta=0.3, reg_lambda=1.0, num_round=200),
            output_prefix=tmp_path / "model",
        )
        assert res.spearman > 0.8
        assert (tmp_path / "model.save").exists() and (tmp_path / "model.dump").exists()

        from expecto_tpu.io.xgb import load_expression_model

        loaded = load_expression_model(tmp_path / "model.save")
        np.testing.assert_allclose(loaded.weight, res.model.weight, rtol=1e-6)

    def test_bootstrap_and_multitissue(self, tmp_path):
        rng = np.random.default_rng(10)
        X = rng.normal(size=(120, 10)).astype(np.float32)
        expr = np.exp(rng.normal(size=120))
        geneanno = pd.DataFrame(
            {
                "id": [f"G{i}" for i in range(120)],
                "seqnames": rng.choice(["chr1", "chr8"], size=120),
                "type": ["protein_coding"] * 120,
            }
        )
        from expecto_tpu.models.gblinear import GBLinearParams
        from expecto_tpu.pipeline.train import train_bootstrap, train_all_tissues

        hp = GBLinearParams(num_round=3)
        boots = train_bootstrap(X, geneanno, expr, seeds=[0, 1], params=hp)
        assert len(boots) == 2
        assert not np.allclose(boots[0].model.weight, boots[1].model.weight)

        expr_df = pd.DataFrame({"gene": geneanno["id"], "t1": expr, "t2": expr * 2})
        res = train_all_tissues(X, geneanno, expr_df, params=hp, metrics_path=tmp_path / "metrics.h5")
        assert set(res) == {"t1", "t2"}
        with h5py.File(tmp_path / "metrics.h5", "r") as f:
            # reference key set (train_susztak.py:177-181) must round-trip
            for key in ("pearsonr_valids", "r2_valids", "pearsonr_trains", "r2_trains"):
                assert f[key].shape == (2,)
                assert np.isfinite(f[key][:]).all()
            assert f["spearman_valid"].shape == (2,)
            # train-side fit should beat the holdout on random labels
            assert (f["pearsonr_trains"][:] >= f["pearsonr_valids"][:] - 0.05).all()

        # plot_susztak parity: the analysis CLI consumes exactly these keys
        from expecto_tpu.cli.analysis import main as analysis_main

        rc = analysis_main(["plot-metrics", str(tmp_path / "metrics.h5"), "-o", str(tmp_path / "plots")])
        assert rc == 0
        assert (tmp_path / "plots" / "pearsonr.png").exists()
        assert (tmp_path / "plots" / "r2.png").exists()


class TestClusterScoring:
    def test_score_sed_with_clusters(self, tiny_vcf, tmp_path):
        # synthetic effects: a real Beluga with down-scaled oracle weights
        # makes ref==alt to fp32 precision, which degenerates proportions
        from expecto_tpu.pipeline.sed import score_sed_with_clusters

        rng0 = np.random.default_rng(42)
        effects = {k: rng0.normal(size=(3, 3, 2002)).astype(np.float32) for k in ("diff", "ref", "alt")}
        gene = pd.DataFrame(
            [
                ["1", int(r[1]) - 1, int(r[1]), r[3], r[4], "1", 6999, 7000, "+", "G1", 7000 - int(r[1])]
                for _, r in tiny_vcf.iterrows()
            ]
        )
        rng = np.random.default_rng(8)
        model = GBLinearModel(weight=rng.normal(size=20020).astype(np.float32) * 0.01, bias=0.0, base_score=2.0)
        clusters = rng.integers(0, 4, size=2002)
        df = score_sed_with_clusters(
            effects, tiny_vcf, gene, model, clusters, maxshift=200, out_dir=tmp_path / "clu"
        )
        cluster_cols = [c for c in df.columns if str(c).startswith("cluster_")]
        assert len(cluster_cols) == 4
        np.testing.assert_allclose(df[cluster_cols].sum(axis=1), 1.0, rtol=1e-6)
        assert (tmp_path / "clu" / "sed.tsv").exists()

    def test_score_sed_with_clusters_keep_mask(self, tiny_vcf, tmp_path):
        # ablated run: keep_mask drops marks, the model and cluster labels
        # are defined over the kept marks (predict_by_cluster.py:179-182)
        from expecto_tpu.pipeline.sed import score_sed_with_clusters

        rng0 = np.random.default_rng(43)
        effects = {k: rng0.normal(size=(3, 3, 2002)).astype(np.float32) for k in ("diff", "ref", "alt")}
        gene = pd.DataFrame(
            [
                ["1", int(r[1]) - 1, int(r[1]), r[3], r[4], "1", 6999, 7000, "+", "G1", 7000 - int(r[1])]
                for _, r in tiny_vcf.iterrows()
            ]
        )
        rng = np.random.default_rng(9)
        keep_mask = rng.random(2002) < 0.5
        n_kept = int(keep_mask.sum())
        model = GBLinearModel(weight=rng.normal(size=10 * n_kept).astype(np.float32) * 0.01, bias=0.0, base_score=2.0)
        clusters = rng.integers(0, 3, size=n_kept)
        df = score_sed_with_clusters(
            effects, tiny_vcf, gene, model, clusters, maxshift=200, keep_mask=keep_mask
        )
        cluster_cols = [c for c in df.columns if str(c).startswith("cluster_")]
        assert len(cluster_cols) == 3
        np.testing.assert_allclose(df[cluster_cols].sum(axis=1), 1.0, rtol=1e-6)


class TestVectorizedBootstrap:
    def test_matches_per_seed_path(self):
        from expecto_tpu.models.gblinear import GBLinearParams
        from expecto_tpu.pipeline.train import train_bootstrap

        rng = np.random.default_rng(12)
        n = 200
        X = rng.normal(size=(n, 12)).astype(np.float32)
        expr = np.exp(rng.normal(size=n))
        geneanno = pd.DataFrame({
            "id": [f"G{i}" for i in range(n)],
            "seqnames": rng.choice(["chr1", "chr8"], size=n, p=[0.8, 0.2]),
            "type": ["protein_coding"] * n,
        })
        hp = GBLinearParams(eta=0.3, reg_lambda=2.0, num_round=30)
        vec = train_bootstrap(X, geneanno, expr, seeds=[0, 3], params=hp, vectorized=True)
        loop = train_bootstrap(X, geneanno, expr, seeds=[0, 3], params=hp, vectorized=False)
        for v, l in zip(vec, loop):
            np.testing.assert_allclose(v.model.weight, l.model.weight, atol=2e-4)
            assert abs(v.model.bias - l.model.bias) < 2e-4


class TestReplicator:
    def test_replicate_gene_features(self, tiny_genome, tmp_path):
        from expecto_tpu.pipeline.features import replicate_gene_features, GeneRecord
        from expecto_tpu.genome.encode import codes_to_onehot, reverse_complement_codes

        class FakeRunner:
            def __init__(self):
                rng = np.random.default_rng(0)
                self.proj = rng.normal(size=(2000 * 4, 2002)).astype(np.float32) * 0.01

            def predict_codes(self, codes, average_rc=False):
                x = codes_to_onehot(codes).reshape(codes.shape[0], -1)
                out = x @ self.proj
                if average_rc:
                    xr = codes_to_onehot(reverse_complement_codes(codes)).reshape(codes.shape[0], -1)
                    out = (out + xr @ self.proj) / 2
                return out

        fa, _ = tiny_genome
        genes = [GeneRecord("G1", "chr1", 30000, 1), GeneRecord("G2", "chr1", 40000, -1)]
        out = replicate_gene_features(genes, fa, FakeRunner(), out_dir=tmp_path)
        assert set(out) == {"G1", "G2"}
        assert out["G1"].shape == (200, 2002)
        loaded = np.load(tmp_path / "G1.npy")
        np.testing.assert_array_equal(loaded, out["G1"])

        # C15/C16 consistency: projecting the replicated raw preds with the
        # gene decay basis must reproduce compute_gene_features exactly
        from expecto_tpu.genome.windows import gene_shifts
        from expecto_tpu.ops.decay import gene_pos_weights, project_features
        from expecto_tpu.pipeline.features import compute_gene_features

        feats = compute_gene_features(genes, fa, FakeRunner())
        pw = gene_pos_weights(gene_shifts())
        for i, g in enumerate(genes):
            manual = project_features(pw, out[g.gene_id][:, None, :])[0]
            np.testing.assert_allclose(feats[i], manual, rtol=1e-5, atol=1e-6)


class TestVectorizedTissues:
    def test_matches_per_column(self):
        from expecto_tpu.models.gblinear import GBLinearParams
        from expecto_tpu.pipeline.train import train_all_tissues

        rng = np.random.default_rng(20)
        n = 150
        X = rng.normal(size=(n, 10)).astype(np.float32)
        geneanno = pd.DataFrame({
            "id": [f"G{i}" for i in range(n)],
            "seqnames": rng.choice(["chr1", "chr8"], size=n, p=[0.8, 0.2]),
            "type": ["protein_coding"] * n,
        })
        expr_df = pd.DataFrame({
            "gene": geneanno["id"],
            "t1": np.exp(rng.normal(size=n)),
            "t2": np.exp(rng.normal(size=n)),
        })
        hp = GBLinearParams(eta=0.3, reg_lambda=2.0, num_round=25)
        vec = train_all_tissues(X, geneanno, expr_df, params=hp, vectorized=True)
        loop = train_all_tissues(X, geneanno, expr_df, params=hp)
        for name in ("t1", "t2"):
            np.testing.assert_allclose(vec[name].model.weight, loop[name].model.weight, atol=2e-5)


class TestLegacyModelScoring:
    def test_legacy_20030_model_on_example(self, tmp_path):
        """A legacy 20,030-feature model (original FunctionLab format) scores
        the bundled example via automatic zero-column padding."""
        from expecto_tpu.io.xgb import save_xgb07_binary
        from expecto_tpu.ops.decay import variant_basis, project_features, pad_legacy_20030

        effects = load_shift_effects(f"{REFERENCE_EXAMPLE}/example.vcf.shift_SHIFT.diff.h5")
        coor = pd.read_csv(f"{REFERENCE_EXAMPLE}/example.vcf", sep="\t", header=None, comment="#")
        gene = pd.read_csv(f"{REFERENCE_EXAMPLE}/example.vcf.bed.sorted.bed.closestgene", sep="\t", header=None)

        rng = np.random.default_rng(13)
        legacy = GBLinearModel(weight=rng.normal(size=20030).astype(np.float32) * 0.01, bias=0.1, base_score=2.0)
        p = tmp_path / "legacy.save"
        save_xgb07_binary(legacy, p)

        df = score_sed_multimodel(effects, coor, gene, [str(p)])
        assert df.shape[0] == 10

        # oracle: pad features then effect = -(padded @ w)
        dist = -gene.iloc[:, -1].values
        strand = gene.iloc[:, -3].values
        basis = variant_basis(dist, strand, variant_shifts(800))
        feats = pad_legacy_20030(project_features(basis, effects["diff"]))
        np.testing.assert_allclose(df["legacy.save"].values, -(feats @ legacy.weight), rtol=1e-4, atol=1e-7)


def test_sweeps_honor_extra_filter():
    # --kidney_genes_only style extra gene filters must reach both
    # vectorized sweep paths (review finding: they were silently dropped)
    from expecto_tpu.models.gblinear import GBLinearParams
    from expecto_tpu.pipeline.train import train_bootstrap, train_all_tissues

    rng = np.random.default_rng(21)
    n = 160
    X = rng.normal(size=(n, 10)).astype(np.float32)
    expr = np.exp(rng.normal(size=n))
    geneanno = pd.DataFrame({
        "id": [f"G{i}" for i in range(n)],
        "seqnames": rng.choice(["chr1", "chr8"], size=n, p=[0.8, 0.2]),
        "type": ["protein_coding"] * n,
    })
    extra = np.ones(n, bool)
    extra[:80] = False
    hp = GBLinearParams(num_round=5)

    full = train_bootstrap(X, geneanno, expr, seeds=[0], params=hp, vectorized=True)
    filt = train_bootstrap(X, geneanno, expr, seeds=[0], params=hp, vectorized=True, extra_filter=extra)
    assert not np.allclose(full[0].model.weight, filt[0].model.weight)

    expr_df = pd.DataFrame({"gene": geneanno["id"], "t1": expr})
    full_t = train_all_tissues(X, geneanno, expr_df, params=hp, vectorized=True)
    filt_t = train_all_tissues(X, geneanno, expr_df, params=hp, vectorized=True, extra_filter=extra)
    assert not np.allclose(full_t["t1"].model.weight, filt_t["t1"].model.weight)
