"""Consensus pipeline tests with a cheap deterministic fake runner (the
Beluga/runner stack is covered by test_beluga.py)."""

import os

import h5py
import numpy as np
import pandas as pd
import pytest

from expecto_tpu.genome.encode import codes_to_onehot, reverse_complement_codes
from expecto_tpu.io.xgb import save_xgb07_binary
from expecto_tpu.models.gblinear import GBLinearModel
from expecto_tpu.pipeline.consensus import (
    ENFORMER_SEQ_LENGTH,
    parse_fasta,
    pad_enformer_seq,
    consensus_window_codes,
    consensus_features,
    predict_consensus_genes,
    predict_ref_all_genes,
    sed_for_top_eqtls,
)

N_TRACKS = 2002
TEST_SHIFTS = [-400, -200, 0, 200]


class FakeRunner:
    """Deterministic stand-in: projects one-hot windows through a fixed
    random matrix, honoring the fwd/RC-average contract."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(size=(2000 * 4, N_TRACKS)).astype(np.float32) * 0.01

    def _fwd(self, codes):
        x = codes_to_onehot(codes).reshape(codes.shape[0], -1)
        return x @ self.proj

    def predict_codes(self, codes, average_rc=False):
        out = self._fwd(codes)
        if average_rc:
            out = (out + self._fwd(reverse_complement_codes(codes))) / 2
        return out


def _write_fasta(path, rec_id, seq, width=80):
    with open(path, "w") as f:
        f.write(f">{rec_id}\n")
        for i in range(0, len(seq), width):
            f.write(seq[i : i + width] + "\n")


def _random_seq(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


@pytest.fixture()
def consensus_tree(tmp_path):
    """consensus_dir with two genes x two samples + ref.fa, genes_file csv."""
    rng = np.random.default_rng(0)
    genes = {"genea": "+", "geneb": "-"}
    rows = []
    for gi, (gene, strand) in enumerate(genes.items()):
        start = 1000 + gi * 500000
        end = start + ENFORMER_SEQ_LENGTH - 1
        rec_id = f"chr1:{start}-{end}"
        os.makedirs(tmp_path / "consensus" / gene / "samples")
        for sample in ["NA1", "NA2"]:
            # sample files are named {sample}|-|{haplotype}.fa with interval-only
            # headers (so merged record ids read chr:span|sample|-|hap)
            seq = _random_seq(rng, ENFORMER_SEQ_LENGTH)
            _write_fasta(tmp_path / "consensus" / gene / "samples" / f"{sample}|-|1pIu.fa", rec_id, seq)
        _write_fasta(tmp_path / "consensus" / gene / "ref.fa", rec_id, _random_seq(rng, ENFORMER_SEQ_LENGTH))
        rows.append([f"ENSG{gi:011d}", "chr1", start + ENFORMER_SEQ_LENGTH // 2, gene.upper(), strand])
    genes_file = tmp_path / "genes.csv"
    pd.DataFrame(rows).to_csv(genes_file, header=False, index=False)

    model_path = tmp_path / "model.save"
    w = np.random.default_rng(1).normal(size=10 * (N_TRACKS + 1)).astype(np.float32) * 0.001
    save_xgb07_binary(GBLinearModel(weight=w, bias=0.1, base_score=2.0), model_path)
    return tmp_path, str(model_path), str(tmp_path / "consensus"), str(genes_file)


class TestHelpers:
    def test_parse_fasta_multirecord(self, tmp_path):
        p = tmp_path / "x.fa"
        p.write_text(">a desc\nACGT\nACGT\n>b\nTTTT\n")
        recs = list(parse_fasta(p))
        assert recs == [("a", "ACGTACGT"), ("b", "TTTT")]

    def test_pad_start_truncated(self):
        # interval "-99:N" means the window ran off the chromosome start
        end = ENFORMER_SEQ_LENGTH - 100 - 1
        rec = f"chr1:-100-{end}"
        seq = "ACGT" * 1000
        padded = pad_enformer_seq(rec, seq)
        assert len(padded) == ENFORMER_SEQ_LENGTH
        assert padded.startswith("N") and padded.endswith("ACGT")

    def test_pad_end_truncated(self):
        rec = f"chr1:1-{ENFORMER_SEQ_LENGTH}"
        padded = pad_enformer_seq(rec, "ACGT" * 10)
        assert len(padded) == ENFORMER_SEQ_LENGTH and padded.endswith("N")

    def test_window_codes_strand(self):
        rng = np.random.default_rng(2)
        seq = _random_seq(rng, 50000)
        plus = consensus_window_codes(seq, "+", shifts=[-200, 0, 200])
        minus = consensus_window_codes(seq, "-", shifts=[-200, 0, 200])
        # minus strand flips the shift direction only (content not RC'd)
        np.testing.assert_array_equal(plus[0], minus[2])
        np.testing.assert_array_equal(plus[1], minus[1])
        # 0-shift window: seq[tss-999 : tss+1001]
        tss = len(seq) // 2
        from expecto_tpu.genome.encode import seqs_to_codes

        np.testing.assert_array_equal(plus[1], seqs_to_codes([seq[tss - 999 : tss + 1001]], 2000)[0])

    def test_consensus_features_oracle(self):
        rng = np.random.default_rng(3)
        shifts = np.array(TEST_SHIFTS)
        preds = rng.normal(size=(3, len(shifts), N_TRACKS))
        got = consensus_features(preds, TEST_SHIFTS)
        # literal reference math (geuvadis_predict_consensus.py:110-124)
        rates = [0.01, 0.02, 0.05, 0.1, 0.2]
        pw = np.vstack(
            [np.exp(-r * np.abs(shifts) / 200) * (shifts <= 0) for r in rates]
            + [np.exp(-r * np.abs(shifts) / 200) * (shifts >= 0) for r in rates]
        )
        feats = np.sum(pw[None, :, :, None] * preds[:, None, :, :], axis=2)
        want = np.concatenate([np.zeros((3, 10, 1)), feats], axis=2).reshape(-1, 10 * (N_TRACKS + 1))
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestPipelines:
    def test_predict_consensus_genes(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        out = str(tmp_path / "out")
        done = predict_consensus_genes(model, cdir, gfile, FakeRunner(), out, shifts=TEST_SHIFTS)
        assert sorted(done) == ["genea", "geneb"]
        with h5py.File(f"{out}/genea/genea_chromatin.h5") as f:
            assert f["chromatin_preds"].shape == (2, len(TEST_SHIFTS), N_TRACKS)
            ids = [x.decode() for x in f["record_ids"]]
            assert all("|NA" in i for i in ids)
        with h5py.File(f"{out}/genea/genea.h5") as f:
            assert f["expecto_preds"].shape == (2,)

        # resume-skip: second run does nothing
        done2 = predict_consensus_genes(model, cdir, gfile, FakeRunner(), out, shifts=TEST_SHIFTS)
        assert done2 == []

        # exp_only reuses cached chromatin preds
        done3 = predict_consensus_genes(
            model, cdir, gfile, FakeRunner(), out, shifts=TEST_SHIFTS, exp_only=True, overwrite=True
        )
        assert sorted(done3) == ["genea", "geneb"]

    def test_features_only_matches_full_mode(self, consensus_tree):
        """--features_only writes the {gene}.h5 expecto_preds contract with
        identical values but NO chromatin h5 (VERDICT r4 #1)."""
        tmp_path, model, cdir, gfile = consensus_tree
        out_full = str(tmp_path / "out_full")
        out_feat = str(tmp_path / "out_feat")
        predict_consensus_genes(model, cdir, gfile, FakeRunner(), out_full, shifts=TEST_SHIFTS)
        predict_consensus_genes(
            model, cdir, gfile, FakeRunner(), out_feat, shifts=TEST_SHIFTS, features_only=True
        )
        for gene in ("genea", "geneb"):
            assert not os.path.exists(f"{out_feat}/{gene}/{gene}_chromatin.h5")
            with h5py.File(f"{out_full}/{gene}/{gene}.h5") as ff, h5py.File(
                f"{out_feat}/{gene}/{gene}.h5"
            ) as fo:
                np.testing.assert_allclose(
                    fo["expecto_preds"][:], ff["expecto_preds"][:], rtol=1e-5, atol=1e-6
                )
                assert list(fo["record_ids"][:]) == list(ff["record_ids"][:])

    def test_features_only_rejects_exp_only(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        with pytest.raises(ValueError, match="mutually exclusive"):
            predict_consensus_genes(
                model, cdir, gfile, FakeRunner(), str(tmp_path / "x"),
                shifts=TEST_SHIFTS, exp_only=True, features_only=True,
            )

    def test_chunking(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        out = str(tmp_path / "out_chunk")
        done = predict_consensus_genes(
            model, cdir, gfile, FakeRunner(), out, shifts=TEST_SHIFTS, num_chunks=2, chunk_i=1
        )
        assert done == ["geneb"]

    def test_ref_all_genes(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        out = str(tmp_path / "ref_out")
        df = predict_ref_all_genes(model, cdir, gfile, FakeRunner(), out, shifts=TEST_SHIFTS)
        assert (tmp_path / "ref_out" / "ref_preds.csv").exists()
        assert list(df.columns) == ["genes", "ref_preds"] and df.shape[0] == 2

    def test_eqtl_sed(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        # build an eqtls table consistent with genea's ref.fa
        recs = list(parse_fasta(f"{cdir}/genea/ref.fa"))
        rec_id, seq = recs[0]
        start = int(rec_id.split(":")[1].split("-")[0])
        tss_pos = start + ENFORMER_SEQ_LENGTH // 2
        snp_off = 150
        snp_pos = tss_pos - snp_off
        snp_i = ENFORMER_SEQ_LENGTH // 2 - snp_off
        ref_allele = seq[snp_i]
        alt_allele = {"A": "T", "C": "G", "G": "C", "T": "A"}[ref_allele]
        eqtls = pd.DataFrame(
            [{"name": "genea", "CHR_SNP": 1, "TSSpos_x": tss_pos, "SNPpos": snp_pos, "REF": ref_allele, "ALT": alt_allele}]
        )
        eqtls_csv = tmp_path / "eqtls.csv"
        eqtls.to_csv(eqtls_csv, index=False)

        out = str(tmp_path / "eqtl_out")
        df = sed_for_top_eqtls(model, cdir, gfile, str(eqtls_csv), FakeRunner(), out, shifts=TEST_SHIFTS)
        assert df.shape[0] == 1
        with h5py.File(f"{out}/genea/genea.h5") as f:
            assert "ref_preds" in f and "alt_preds" in f
        assert df["sed"].abs().iloc[0] > 0  # allele swap must move the prediction

    def test_eqtl_ref_mismatch_raises(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        recs = list(parse_fasta(f"{cdir}/genea/ref.fa"))
        rec_id, seq = recs[0]
        start = int(rec_id.split(":")[1].split("-")[0])
        tss_pos = start + ENFORMER_SEQ_LENGTH // 2
        snp_i = ENFORMER_SEQ_LENGTH // 2 - 10
        wrong_ref = {"A": "C", "C": "A", "G": "T", "T": "G"}[seq[snp_i]]
        eqtls = pd.DataFrame(
            [{"name": "genea", "CHR_SNP": 1, "TSSpos_x": tss_pos, "SNPpos": tss_pos - 10, "REF": wrong_ref, "ALT": "A"}]
        )
        eqtls_csv = tmp_path / "bad_eqtls.csv"
        eqtls.to_csv(eqtls_csv, index=False)
        with pytest.raises(AssertionError, match="does not match ref allele"):
            sed_for_top_eqtls(model, cdir, gfile, str(eqtls_csv), FakeRunner(), str(tmp_path / "x"), shifts=TEST_SHIFTS)


def test_span_offsets_match_window_codes():
    from expecto_tpu.pipeline.consensus import consensus_span_and_offsets

    rng = np.random.default_rng(9)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 60000)])
    for strand in ("+", "-"):
        shifts = [-600, -200, 0, 400]
        windows = consensus_window_codes(seq, strand, shifts=shifts)
        span, offsets = consensus_span_and_offsets(seq, strand, shifts=shifts)
        for i, o in enumerate(offsets):
            np.testing.assert_array_equal(span[o : o + 2000], windows[i])


class TestFp16Chromatin:
    def test_fp16_store_matches_fp32_predictions(self, consensus_tree):
        tmp_path, model, cdir, gfile = consensus_tree
        out32 = str(tmp_path / "out_fp32")
        out16 = str(tmp_path / "out_fp16")
        predict_consensus_genes(model, cdir, gfile, FakeRunner(), out32, shifts=TEST_SHIFTS)
        predict_consensus_genes(
            model, cdir, gfile, FakeRunner(), out16, shifts=TEST_SHIFTS,
            chromatin_dtype=np.float16,
        )
        with h5py.File(f"{out16}/genea/genea_chromatin.h5") as f:
            assert f["chromatin_preds"].dtype == np.float16
        with h5py.File(f"{out32}/genea/genea.h5") as f32, h5py.File(f"{out16}/genea/genea.h5") as f16:
            p32 = np.asarray(f32["expecto_preds"])
            p16 = np.asarray(f16["expecto_preds"])
            np.testing.assert_allclose(p16, p32, rtol=2e-3, atol=2e-3)

        # exp_only restart from the fp16 cache works and upcasts cleanly
        done = predict_consensus_genes(
            model, cdir, gfile, FakeRunner(), out16, shifts=TEST_SHIFTS,
            exp_only=True, overwrite=True, chromatin_dtype=np.float16,
        )
        assert sorted(done) == ["genea", "geneb"]


class TestTopEqtlConsensus:
    def test_gz_layout_and_seqs_dataset(self, tmp_path):
        import gzip

        from expecto_tpu.pipeline.consensus import predict_consensus_for_top_eqtls

        rng = np.random.default_rng(7)
        gene = "hla-b"
        os.makedirs(tmp_path / "consensus" / gene)
        start = 5000
        end = start + ENFORMER_SEQ_LENGTH - 1
        recs = []
        for sample, strand in [("NA1", "+"), ("NA2", "-")]:
            seq = _random_seq(rng, ENFORMER_SEQ_LENGTH)
            recs.append((f"chr6:{start}-{end}|{sample}|{strand}|1pIu", seq))
        with gzip.open(tmp_path / "consensus" / gene / f"{gene}.fa.gz", "wt") as f:
            for rid, seq in recs:
                f.write(f">{rid}\n{seq}\n")

        eqtls = pd.DataFrame({
            "name": ["HLA-B"], "geneID": ["ENSG1"], "CHR_SNP": [6], "SNPpos": [31324000],
        })
        eqtls.to_csv(tmp_path / "eqtls.csv", index=False)
        vcf = pd.DataFrame({
            0: ["chr6"], 1: [31324000], 2: ["rs1"], 3: ["A"], 4: ["G"],
        })
        vcf.to_csv(tmp_path / "snps.vcf", sep="\t", header=False, index=False)

        model_path = tmp_path / "model.save"
        w = np.random.default_rng(1).normal(size=10 * (N_TRACKS + 1)).astype(np.float32) * 0.001
        save_xgb07_binary(GBLinearModel(weight=w, bias=0.1, base_score=2.0), model_path)

        merged = predict_consensus_for_top_eqtls(
            str(model_path), str(tmp_path / "consensus"),
            str(tmp_path / "eqtls.csv"), str(tmp_path / "snps.vcf"),
            FakeRunner(), str(tmp_path / "out"),
            genes=["HLA-B"], shifts=TEST_SHIFTS,
        )
        assert merged.shape[0] == 1 and merged["ID"].iloc[0] == "rs1"
        with h5py.File(tmp_path / "out" / gene / f"{gene}.h5") as f:
            assert f["preds"].shape == (2,)
            ids = [x.decode() for x in f["record_ids"]]
            assert ids == [r for r, _ in recs]
            seqs = [s.decode() for s in f["seqs"]]
            # span = [tss + min(shift*sgn) - 999, tss + max(shift*sgn) + 1001)
            span_len = (max(TEST_SHIFTS) - min(TEST_SHIFTS)) + 2000
            assert all(len(s) == span_len for s in seqs)
            tss = ENFORMER_SEQ_LENGTH // 2
            # '+' strand sample: span starts at tss + min(shifts) - 999
            lo = tss + min(TEST_SHIFTS) - 999
            assert seqs[0] == recs[0][1][lo : lo + span_len]


def test_consensus_preds_dedup_identical_spans(tmp_path):
    """Duplicate consensus spans (shared haplotypes) are predicted once but
    every record still gets its row."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    class CountingRunner(FakeRunner):
        def __init__(self):
            super().__init__()
            self.rows_seen = 0

        def predict_span_codes(self, span_codes, offsets, rc_mode="none"):
            self.rows_seen += span_codes.shape[0]
            out = []
            for row in span_codes:
                wins = np.stack([row[o : o + 2000] for o in offsets])
                out.append(self.predict_codes(wins, average_rc=(rc_mode == "average")))
            return np.stack(out)

    rng = np.random.default_rng(15)
    seq_a = _random_seq(rng, ENFORMER_SEQ_LENGTH)
    seq_b = _random_seq(rng, ENFORMER_SEQ_LENGTH)
    runner = CountingRunner()
    preds = _predict_consensus_preds(
        runner, [(seq_a, "+"), (seq_b, "+"), (seq_a, "+")], TEST_SHIFTS
    )
    assert runner.rows_seen == 2  # two unique spans, three records
    np.testing.assert_array_equal(preds[0], preds[2])
    assert not np.array_equal(preds[0], preds[1])


class WindowCountingRunner(FakeRunner):
    """FakeRunner that counts how many lone windows it was asked to predict."""

    def __init__(self):
        super().__init__()
        self.windows_seen = 0

    def predict_codes(self, codes, average_rc=False):
        self.windows_seen += codes.shape[0]
        return super().predict_codes(codes, average_rc=average_rc)


def _snp_cohort(rng, n):
    """n samples sharing a backbone, differing at 2 SNP sites near the TSS."""
    backbone = _random_seq(rng, ENFORMER_SEQ_LENGTH)
    tss = ENFORMER_SEQ_LENGTH // 2
    cohort = []
    for b in range(n):
        seq = list(backbone)
        for site in (tss - 300, tss + 150):
            if (b >> (0 if site < tss else 1)) & 1:
                seq[site] = "T" if seq[site] != "T" else "C"
        cohort.append(("".join(seq), "+"))
    return cohort


def test_window_dedup_cohort_matches_per_record_path():
    """A cohort differing at a few SNPs takes the per-window dedup path
    (far fewer lone windows predicted); results must match the per-record
    path."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    cohort = _snp_cohort(np.random.default_rng(16), 48)
    runner = WindowCountingRunner()
    dedup = _predict_consensus_preds(runner, cohort, TEST_SHIFTS)
    assert runner.windows_seen < 48 * len(TEST_SHIFTS) / 4, "dedup must collapse shared windows"
    per_record = np.stack([
        _predict_consensus_preds(FakeRunner(), [c], TEST_SHIFTS)[0] for c in cohort
    ])
    np.testing.assert_allclose(dedup, per_record, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_window_dedup_spans_probe_matches_per_record_path():
    """The span-capable cohort probe (r4: windows hashed as zero-copy span
    slices, no (R, S, 2000) materialization) must take the dedup path on a
    shared-SNP cohort — including mixed strands (two span-offset groups) —
    and match the per-record path."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    class SpanWindowCountingRunner(FakeRunner):
        def __init__(self):
            super().__init__()
            self.lone_windows = 0
            self.span_rows = 0

        def predict_codes(self, codes, average_rc=False):
            self.lone_windows += codes.shape[0]
            return super().predict_codes(codes, average_rc=average_rc)

        def predict_span_codes(self, span_codes, offsets, rc_mode="none"):
            self.span_rows += span_codes.shape[0]
            out = []
            for row in span_codes:
                wins = np.stack([row[o : o + 2000] for o in offsets])
                out.append(super().predict_codes(wins, average_rc=(rc_mode == "average")))
            return np.stack(out)

    # 90 RECORD-DISTINCT samples (a private SNP outside the covered span
    # defeats record-level dedup) whose in-span windows still collapse to a
    # few haplotypes; half the cohort on '-' strand so TWO span-offset
    # groups share one per-shift dedup table
    rng = np.random.default_rng(26)
    backbone = list(_random_seq(rng, ENFORMER_SEQ_LENGTH))
    tss = ENFORMER_SEQ_LENGTH // 2
    cohort = []
    for b in range(90):
        seq = backbone.copy()
        for site in (tss - 300, tss + 150):  # shared segregating sites
            if (b >> (0 if site < tss else 1)) & 1:
                seq[site] = "T" if seq[site] != "T" else "C"
        private = tss + 5000 + b  # outside every shift window of TEST_SHIFTS
        seq[private] = {"A": "C", "C": "G", "G": "T", "T": "A"}[seq[private]]
        cohort.append(("".join(seq), "+" if b % 2 else "-"))
    runner = SpanWindowCountingRunner()
    dedup = _predict_consensus_preds(runner, cohort, TEST_SHIFTS)
    assert runner.span_rows == 0, "redundant cohort must take the window-dedup path"
    assert 0 < runner.lone_windows < 90 * len(TEST_SHIFTS) / 4
    per_record = np.stack([
        _predict_consensus_preds(FakeRunner(), [c], TEST_SHIFTS, window_dedup=False)[0] for c in cohort
    ])
    np.testing.assert_allclose(dedup, per_record, rtol=1e-5, atol=1e-6)


def test_distinct_cohort_prefers_span_path():
    """Fully distinct records must NOT take the lone-window dedup path when
    the runner supports span-amortized prediction."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    class SpanOnlyCountingRunner(FakeRunner):
        def __init__(self):
            super().__init__()
            self.span_rows = 0
            self.lone_windows = 0

        def predict_codes(self, codes, average_rc=False):
            self.lone_windows += codes.shape[0]
            return super().predict_codes(codes, average_rc=average_rc)

        def predict_span_codes(self, span_codes, offsets, rc_mode="none"):
            self.span_rows += span_codes.shape[0]
            out = []
            for row in span_codes:
                wins = np.stack([row[o : o + 2000] for o in offsets])
                out.append(super().predict_codes(wins, average_rc=(rc_mode == "average")))
            return np.stack(out)

    rng = np.random.default_rng(17)
    distinct = [(_random_seq(rng, ENFORMER_SEQ_LENGTH), "+") for _ in range(8)]
    runner = SpanOnlyCountingRunner()
    _ = _predict_consensus_preds(runner, distinct, TEST_SHIFTS)
    assert runner.lone_windows == 0 and runner.span_rows == 8


def test_homozygous_cohort_collapses_to_one_span():
    """A cohort of byte-identical records must cost ONE span forward (record
    dedup), not per-shift lone-window forwards (the dedup-budget inversion
    case)."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    class SpanCountingRunner(FakeRunner):
        def __init__(self):
            super().__init__()
            self.span_rows = 0

        def predict_span_codes(self, span_codes, offsets, rc_mode="none"):
            self.span_rows += span_codes.shape[0]
            out = []
            for row in span_codes:
                wins = np.stack([row[o : o + 2000] for o in offsets])
                out.append(self.predict_codes(wins, average_rc=(rc_mode == "average")))
            return np.stack(out)

    seq = _random_seq(np.random.default_rng(18), ENFORMER_SEQ_LENGTH)
    cohort = [(seq, "+")] * 40
    runner = SpanCountingRunner()
    preds = _predict_consensus_preds(runner, cohort, TEST_SHIFTS)
    assert runner.span_rows == 1
    assert preds.shape[0] == 40
    for r in range(1, 40):
        np.testing.assert_array_equal(preds[0], preds[r])


def test_span_path_follows_runner_track_count():
    """The span branch must size its output from the runner's actual track
    count, not a hard-coded 2002 (regression: narrow-track runners crashed
    with a broadcast error only on the span path)."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    class NarrowSpanRunner:
        n_tracks = 5

        def __init__(self):
            rng = np.random.default_rng(3)
            self.proj = rng.normal(size=(2000 * 4, self.n_tracks)).astype(np.float32) * 0.01

        def predict_codes(self, codes, average_rc=False):
            x = codes_to_onehot(codes).reshape(codes.shape[0], -1)
            out = x @ self.proj
            if average_rc:
                rc = codes_to_onehot(reverse_complement_codes(codes)).reshape(codes.shape[0], -1)
                out = (out + rc @ self.proj) / 2
            return out

        def predict_span_codes(self, span_codes, offsets, rc_mode="none"):
            out = []
            for row in span_codes:
                wins = np.stack([row[o : o + 2000] for o in offsets])
                out.append(self.predict_codes(wins, average_rc=(rc_mode == "average")))
            return np.stack(out)

    rng = np.random.default_rng(19)
    records = [(_random_seq(rng, ENFORMER_SEQ_LENGTH), s) for s in ["+", "-"] for _ in range(5)]
    preds = _predict_consensus_preds(NarrowSpanRunner(), records, TEST_SHIFTS)
    assert preds.shape == (10, len(TEST_SHIFTS), 5)


def test_ref_all_genes_batched_matches_per_gene(consensus_tree):
    """Grouped runner calls (genes_per_call>1) must produce the same
    ref_preds.csv as one call per gene, with fewer runner dispatches."""

    class CallCountingRunner(FakeRunner):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def predict_codes(self, codes, average_rc=False):
            self.calls += 1
            return super().predict_codes(codes, average_rc=average_rc)

    tmp_path, model, cdir, gfile = consensus_tree
    r_batched = CallCountingRunner()
    df_b = predict_ref_all_genes(
        model, cdir, gfile, r_batched, str(tmp_path / "rb"), shifts=TEST_SHIFTS, genes_per_call=8
    )
    calls_batched = r_batched.calls
    r_single = CallCountingRunner()
    df_s = predict_ref_all_genes(
        model, cdir, gfile, r_single, str(tmp_path / "rs"), shifts=TEST_SHIFTS, genes_per_call=1
    )
    assert calls_batched < r_single.calls
    np.testing.assert_allclose(df_b["ref_preds"].values, df_s["ref_preds"].values, rtol=1e-6)
    assert list(df_b["genes"]) == list(df_s["genes"])


def test_fused_projection_matches_host_path():
    """_predict_consensus_features via runner.predict_spans_project must match
    the raw-preds + host-side projection fallback."""
    from expecto_tpu.ops.decay import project_features
    from expecto_tpu.pipeline.consensus import _predict_consensus_features

    class SpanProjRunner(FakeRunner):
        def predict_spans_project(self, span_codes, offsets, pos_weights):
            out = []
            for row in span_codes:
                wins = np.stack([row[o : o + 2000] for o in offsets])
                preds = self.predict_codes(wins, average_rc=True)  # (S, M)
                out.append(project_features(pos_weights, preds[:, None, :])[0])
            return np.stack(out).astype(np.float32)

    rng = np.random.default_rng(21)
    seqs = [(_random_seq(rng, ENFORMER_SEQ_LENGTH), s) for s in ("+", "-", "+")]
    fused = _predict_consensus_features(SpanProjRunner(), seqs, TEST_SHIFTS)
    host = _predict_consensus_features(FakeRunner(), seqs, TEST_SHIFTS)
    assert fused.shape == host.shape == (3, 20030)
    np.testing.assert_allclose(fused, host, rtol=1e-4, atol=1e-5)
