"""Native kernel (libetseq.so) vs numpy-path contract tests. Skipped when the
library isn't built (``make -C native``)."""

import numpy as np
import pytest

from expecto_tpu.genome import native
from expecto_tpu.genome.encode import seqs_to_codes, reverse_complement_codes

pytestmark = pytest.mark.skipif(not native.available(), reason="libetseq.so not built")


def test_encode_matches_python(rng):
    alphabet = list("ACGTNacgtnXH-")
    s = "".join(rng.choice(alphabet, size=5000))
    got = native.encode_bytes(s.encode())
    want = seqs_to_codes([s], inputsize=5000)[0]
    np.testing.assert_array_equal(got, want)


def test_gather_windows_clamping(tiny_genome):
    fa, contigs = tiny_genome
    starts = [1, 100, 59990, -50]  # 1-based
    got = fa.window_codes("chr1", starts, 100)
    for row, s in zip(got, starts):
        want = np.full(100, 4, np.int8)
        for i in range(100):
            p = s - 1 + i
            if 0 <= p < len(contigs["chr1"]):
                want[i] = seqs_to_codes([contigs["chr1"][p]], 1)[0][0]
        np.testing.assert_array_equal(row, want)


def test_gather_equals_python_fallback(tiny_genome, monkeypatch):
    fa, _ = tiny_genome
    starts = [500, 1000, 59995]
    got_native = fa.window_codes("chr1", starts, 64)
    monkeypatch.setattr(native, "available", lambda: False)
    got_py = fa.window_codes("chr1", starts, 64)
    np.testing.assert_array_equal(got_native, got_py)


def test_splice_encode_matches_python(rng):
    from expecto_tpu.genome.encode import center_crop_slice

    window = "".join(rng.choice(list("ACGT"), size=2100))
    # long deletions (ref_len > the 100 bp window slack) make the spliced
    # sequence SHORTER than inputsize: both paths must left-align + N-pad
    for ref_len, alt in [(1, "T"), (1, "TTT"), (5, "A"), (3, ""), (101, "C"), (500, "AG"), (1200, "T")]:
        mutpos = 1049
        spliced = window[:mutpos] + alt + window[mutpos + ref_len :]
        want = seqs_to_codes([spliced], 2000)[0]
        got = native.splice_encode(window.encode(), mutpos, ref_len, alt, 2000)
        np.testing.assert_array_equal(got, want)


def test_build_flat_matches_python(tmp_path, rng):
    from expecto_tpu.genome.fasta import FastaIndex, write_fasta, _FLAT_SUFFIX

    contigs = {"a": "".join(rng.choice(list("ACGT"), 997)), "b": "ACGT" * 10}
    write_fasta(tmp_path / "x.fa", contigs, width=13)
    fa = FastaIndex(tmp_path / "x.fa")
    assert fa.sequence("a", 1, 997) == contigs["a"]
    assert fa.sequence("b", 5, 8) == "ACGT"


def test_revcomp(rng):
    codes = rng.integers(0, 5, size=200).astype(np.int8)
    out = np.empty_like(codes)
    import ctypes

    lib = native._load()
    lib.etseq_revcomp(native._i8(codes), 200, native._i8(out))
    np.testing.assert_array_equal(out, reverse_complement_codes(codes))
