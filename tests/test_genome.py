"""FASTA indexing, window math, VCF, and liftover tests."""

import numpy as np
import pandas as pd
import pytest

from expecto_tpu.genome.fasta import FastaIndex, write_fasta
from expecto_tpu.genome.liftover import ChainLiftover, liftover_vcf
from expecto_tpu.genome.vcf import read_vcf, standardize_chroms, write_vcf_hg19, CHRS
from expecto_tpu.genome.windows import (
    fetch_variant_window,
    gene_shift_window_bounds,
    variant_shifts,
    gene_shifts,
)


class TestFasta:
    def test_roundtrip(self, tiny_genome):
        fa, contigs = tiny_genome
        assert fa.contig_length("chr1") == 60000
        # 1-based inclusive: sequence(chr, 5, 10) == contig[4:10]
        assert fa.sequence("chr1", 5, 10) == contigs["chr1"][4:10]
        assert fa.sequence("chr2", 1, 1) == contigs["chr2"][0]

    def test_clamping(self, tiny_genome):
        fa, contigs = tiny_genome
        assert fa.sequence("chr1", -5, 10) == contigs["chr1"][:10]
        assert fa.sequence("chr1", 59995, 70000) == contigs["chr1"][59994:]

    def test_multiline_wrap(self, tmp_path):
        seq = "ACGT" * 100
        write_fasta(tmp_path / "x.fa", {"c": seq}, width=7)
        fa = FastaIndex(tmp_path / "x.fa")
        assert fa.sequence("c", 1, 400) == seq

    def test_stale_sidecars_rebuilt(self, tmp_path):
        """Replacing the FASTA at the same path must invalidate the
        .etflat/.etidx sidecars (size+mtime fingerprint), not silently
        serve the old genome."""
        import os

        write_fasta(tmp_path / "x.fa", {"c": "AAAA" * 100}, width=10)
        fa = FastaIndex(tmp_path / "x.fa")
        assert fa.sequence("c", 1, 4) == "AAAA"
        fa.close()
        write_fasta(tmp_path / "x.fa", {"c": "CCGG" * 100}, width=10)
        os.utime(tmp_path / "x.fa", ns=(1, 1))  # force a distinct mtime
        fa2 = FastaIndex(tmp_path / "x.fa")
        assert fa2.sequence("c", 1, 4) == "CCGG"
        fa2.close()


    def test_old_format_sidecars_served_when_source_deleted(self, tmp_path):
        """Pre-fingerprint sidecars (flat {name: [off, len]} index) on a
        deployment that deleted the source FASTA must be served as-is, not
        crash attempting a rebuild of a missing file."""
        import json
        import os

        seq = "ACGTTGCA" * 50
        write_fasta(tmp_path / "x.fa", {"c": seq}, width=10)
        FastaIndex(tmp_path / "x.fa").close()  # builds new-format sidecars
        idx_path = tmp_path / "x.fa.etidx.json"
        meta = json.loads(idx_path.read_text())
        idx_path.write_text(json.dumps(meta["contigs"]))  # downgrade to old format
        os.remove(tmp_path / "x.fa")
        fa = FastaIndex(tmp_path / "x.fa")
        assert fa.sequence("c", 1, 8) == "ACGTTGCA"
        fa.close()

    def test_window_bytes_matches_sequence(self, tiny_genome):
        fa, contigs = tiny_genome
        got = fa.window_bytes("chr1", [1, 100, 59998, -3, 70000], 6)
        assert got[0].tobytes().decode() == contigs["chr1"][:6]
        assert got[1].tobytes().decode() == contigs["chr1"][99:105]
        # clamped windows zero-fill outside the contig
        assert got[2].tobytes()[:3].decode() == contigs["chr1"][59997:]
        assert bytes(got[2][3:]) == b"\0\0\0"
        assert bytes(got[3][:4]) == b"\0\0\0\0"
        assert bytes(got[4]) == b"\0" * 6


class TestShifts:
    def test_variant_shift_enumeration(self):
        assert variant_shifts(800) == [0, -200, -400, -600, -800, 200, 400, 600, 800]
        assert variant_shifts(0) == [0]

    def test_gene_shift_enumeration(self):
        s = gene_shifts()
        assert len(s) == 200 and s[0] == -20000 and s[-1] == 19800

    def test_gene_window_bounds(self):
        # reference: start = tss + shift*strand - (w/2 - 1), stop = + w/2
        start, stop = gene_shift_window_bounds(10000, 1, 200, windowsize=2000)
        assert (start, stop) == (10000 + 200 - 999, 10000 + 200 + 1000)
        start, stop = gene_shift_window_bounds(10000, -1, 200, windowsize=2000)
        assert (start, stop) == (10000 - 200 - 999, 10000 - 200 + 1000)


class TestVariantWindow:
    def test_snv_splice(self, tiny_genome):
        fa, contigs = tiny_genome
        pos = 5000
        ref_base = contigs["chr1"][pos - 1]
        alt_base = "A" if ref_base != "A" else "C"
        w = fetch_variant_window(fa, "chr1", pos, ref_base, alt_base, shift=0, inputsize=2000)
        assert w.ref_matched and not w.alt_matched
        assert len(w.ref_seq) == 2100 and len(w.alt_seq) == 2100
        # mutpos = windowsize/2 - 1 = 1049 for shift 0
        assert w.ref_seq[1049] == ref_base
        assert w.alt_seq[1049] == alt_base
        assert w.ref_seq[:1049] == w.alt_seq[:1049]
        assert w.ref_seq[1050:] == w.alt_seq[1050:]

    def test_shift_moves_window_not_variant(self, tiny_genome):
        fa, contigs = tiny_genome
        pos = 5000
        ref_base = contigs["chr1"][pos - 1]
        w = fetch_variant_window(fa, "chr1", pos, ref_base, "N", shift=200)
        # mutpos = 1049 - 200; the same genomic base should sit there
        assert w.ref_seq[1049 - 200] == ref_base
        assert w.ref_matched

    def test_insertion_lengthens_window(self, tiny_genome):
        fa, contigs = tiny_genome
        pos = 6000
        ref_base = contigs["chr1"][pos - 1]
        w = fetch_variant_window(fa, "chr1", pos, ref_base, ref_base + "TT")
        assert len(w.alt_seq) == 2102
        assert len(w.ref_seq) == 2100


class TestVcf:
    def test_read_standardize_write(self, tmp_path):
        path = tmp_path / "t.vcf"
        path.write_text("##header\nchr1\t100\t.\tA\tT\n2\t200\t.\tG\tC\nGL000192.1\t5\t.\tA\tC\n")
        vcf = read_vcf(path)
        assert vcf.shape[0] == 3
        vcf = standardize_chroms(vcf)
        assert list(vcf.iloc[:, 0]) == ["chr1", "chr2"]
        out = tmp_path / "out.vcf"
        write_vcf_hg19(vcf, out)
        lines = out.read_text().splitlines()
        assert lines[0] == "##fileformat=VCFv4.3"
        assert lines[1].startswith("#CHROM")
        assert lines[2] == "chr1\t100\t.\tA\tT"

    def test_chunking(self, tmp_path):
        path = tmp_path / "t.vcf"
        path.write_text("".join(f"chr1\t{i}\t.\tA\tT\n" for i in range(10)))
        assert read_vcf(path, chunk_size=4, chunk_i=2).shape[0] == 2
        assert list(read_vcf(path, chunk_size=4, chunk_i=1).iloc[:, 1]) == [4, 5, 6, 7]


class TestLiftover:
    @pytest.fixture()
    def chain_file(self, tmp_path):
        # One chain: tPos 100-200 maps to qPos 1000-1100 (+), with a 10bp gap
        # after the first 50 bases on t and 20 on q.
        # Second chain on minus strand: t 300-340 -> q chr3 reverse.
        text = (
            "chain 1000 chrA 500 + 100 210 chrB 2000 + 1000 1120 1\n"
            "50\t10\t20\n"
            "50\n"
            "\n"
            "chain 900 chrA 500 + 300 340 chr3 400 - 60 100 2\n"
            "40\n"
            "\n"
        )
        p = tmp_path / "t.chain"
        p.write_text(text)
        return p

    def test_forward_block(self, chain_file):
        lo = ChainLiftover(chain_file)
        # 1-based input: t0=100 -> first block start; pos 101 -> q 1001
        assert lo.convert_coordinate("chrA", 101) == [("chrB", 1001, "+")]
        assert lo.convert_coordinate("chrA", 150) == [("chrB", 1050, "+")]
        # inside the gap: unmapped
        assert lo.convert_coordinate("chrA", 155) == []
        # second block: t 160..209 -> q 1070..1119
        assert lo.convert_coordinate("chrA", 161) == [("chrB", 1071, "+")]

    def test_negative_strand(self, chain_file):
        lo = ChainLiftover(chain_file)
        # t0=300 -> q reverse coords start 60 -> forward pos = 400-1-60 = 339 (0-based)
        assert lo.convert_coordinate("chrA", 301) == [("chr3", 340, "-")]
        assert lo.convert_coordinate("chrA", 340) == [("chr3", 301, "-")]

    def test_unmapped_chrom(self, chain_file):
        lo = ChainLiftover(chain_file)
        assert lo.convert_coordinate("chrZ", 100) == []

    def test_liftover_vcf(self, chain_file):
        lo = ChainLiftover(chain_file)
        vcf = pd.DataFrame([["chrA", 101, ".", "A", "T"], ["chrA", 155, ".", "G", "C"]])
        lifted, failed = liftover_vcf(vcf, lo)
        assert list(failed) == [False, True]
        assert lifted.iloc[0, 0] == "chrB" and lifted.iloc[0, 1] == 1001
        assert lifted.iloc[1, 1] == -1

    @pytest.fixture()
    def overlapping_chain_file(self, tmp_path):
        # two chains both covering tPos 100-150 (a main + an alt mapping):
        # convert_coordinate returns both, score-sorted
        text = (
            "chain 1000 chrA 500 + 100 150 chrB 2000 + 1000 1050 1\n"
            "50\n"
            "\n"
            "chain 400 chrA 500 + 100 150 chrB_alt 900 + 200 250 2\n"
            "50\n"
            "\n"
        )
        p = tmp_path / "multi.chain"
        p.write_text(text)
        return p

    def test_multi_mapping_default_takes_top_chain(self, overlapping_chain_file):
        lo = ChainLiftover(overlapping_chain_file)
        vcf = pd.DataFrame([["chrA", 101, ".", "A", "T"]])
        with pytest.warns(UserWarning, match="multiple liftover mappings"):
            lifted, failed = liftover_vcf(vcf, lo)
        assert not failed.any()
        assert lifted.iloc[0, 0] == "chrB" and lifted.iloc[0, 1] == 1001

    def test_multi_mapping_strict_reproduces_reference_abort(self, overlapping_chain_file):
        """--strict_liftover parity mode: the reference asserts on multiple
        mappings (chromatin.py:128); strict=True reproduces that abort with
        the offending position named (VERDICT r3 #8)."""
        lo = ChainLiftover(overlapping_chain_file)
        vcf = pd.DataFrame([["chrA", 101, ".", "A", "T"]])
        with pytest.raises(AssertionError, match="chrA:101.*2 mappings"):
            liftover_vcf(vcf, lo, strict=True)
