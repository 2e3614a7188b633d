"""Built-in FIMO-compatible scanner: MEME parsing, exact DP p-values
(brute-force cross-check), strand semantics, and the drop-in text format
consumed by filter_fimo_results."""

import itertools

import numpy as np
import pytest

from expecto_tpu.analysis.motif_scan import (
    MemeMotif,
    log_odds,
    parse_meme,
    pvalue_lookup,
    scan_to_text,
)

MEME_TEXT = """\
MEME version 4

ALPHABET= ACGT

strands: + -

Background letter frequencies
A 0.3 C 0.2 G 0.2 T 0.3

MOTIF M1 TFA
letter-probability matrix: alength= 4 w= 3 nsites= 20 E= 0
 0.90 0.05 0.03 0.02
 0.02 0.03 0.05 0.90
 0.05 0.85 0.05 0.05

MOTIF M2 TFB
letter-probability matrix: alength= 4 w= 4 nsites= 10 E= 0
 0.25 0.25 0.25 0.25
 0.97 0.01 0.01 0.01
 0.01 0.01 0.97 0.01
 0.25 0.25 0.25 0.25
"""


@pytest.fixture()
def meme_file(tmp_path):
    p = tmp_path / "motifs.meme"
    p.write_text(MEME_TEXT)
    return str(p)


def test_parse_meme(meme_file):
    motifs, bg = parse_meme(meme_file)
    np.testing.assert_allclose(bg, [0.3, 0.2, 0.2, 0.3])
    assert [m.motif_id for m in motifs] == ["M1", "M2"]
    assert [m.alt_id for m in motifs] == ["TFA", "TFB"]
    assert motifs[0].width == 3 and motifs[1].width == 4
    assert motifs[0].nsites == 20.0
    np.testing.assert_allclose(motifs[0].probs[0], [0.90, 0.05, 0.03, 0.02])


def test_log_odds_hand_value(meme_file):
    motifs, bg = parse_meme(meme_file)
    lo = log_odds(motifs[0], bg)
    # position 0, base A: p' = (0.9*20 + 0.1*0.3) / 20.1; lo = log2(p'/0.3)
    want = np.log2(((0.9 * 20 + 0.1 * 0.3) / 20.1) / 0.3)
    np.testing.assert_allclose(lo[0, 0], want, rtol=1e-12)


def test_pvalues_match_brute_force(meme_file):
    """The Staden DP survival function equals explicit enumeration of all
    4^w windows weighted by the background."""
    motifs, bg = parse_meme(meme_file)
    m = motifs[0]
    lo = log_odds(m, bg)
    q, lookup = pvalue_lookup(lo, bg)

    windows = list(itertools.product(range(4), repeat=m.width))
    int_scores = np.array([sum(q[j, b] for j, b in enumerate(win)) for win in windows])
    probs = np.array([np.prod([bg[b] for b in win]) for win in windows])
    got = lookup(int_scores)
    want = np.array([probs[int_scores >= s].sum() for s in int_scores])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-15)
    # the consensus window is the rarest
    consensus = int(np.argmax(int_scores))
    assert got[consensus] == got.min()


def test_scan_strand_and_coordinates(tmp_path, meme_file):
    """A motif consensus planted on the minus strand must be reported with
    strand '-', +-strand 1-based coordinates, and the strand-direction
    matched_sequence."""
    # M2 consensus is NAGN; plant its RC (NCTN) on the + sequence
    seq = "TTTTTCTTTTTT"
    fasta = tmp_path / "s.fa"
    fasta.write_text(f">rs1\n{seq}\n")
    out = tmp_path / "fimo.txt"
    scan_to_text(meme_file, str(fasta), str(out))

    import pandas as pd

    df = pd.read_table(out)
    m2 = df[(df["motif_id"] == "M2") & (df["strand"] == "-")]
    best = m2.sort_values("p-value").iloc[0]
    # RC window 'TCTT' at 0-based + positions [4, 8) -> rc reads AAGA
    assert (best["start"], best["stop"]) == (5, 8)
    assert best["matched_sequence"] == "AAGA"
    # every window of every motif/strand is emitted (--thresh 1 semantics)
    n_win = lambda w: len(seq) - w + 1
    assert len(df) == 2 * (n_win(3) + n_win(4))


def test_builtin_engine_feeds_filter(tmp_path, meme_file):
    """run_fimo(engine='builtin') -> filter_fimo_results: the planted motif
    covering the variant center survives as the best-p row per motif."""
    from expecto_tpu.analysis.fimo import filter_fimo_results, run_fimo

    pad = 10
    seq = "ATATATATAT" + "ATC" + "TATATATATG"  # variant center = 1-based pad+1 = 11
    fasta = tmp_path / "v.fa"
    fasta.write_text(f">rs42\n{seq}\n")
    out = tmp_path / "fimo.txt"
    engine = run_fimo(str(meme_file), str(fasta), str(out), engine="builtin")
    assert engine == "builtin"
    df = filter_fimo_results(str(out), bp_pad=pad)
    # one best row per (motif, sequence)
    assert set(df["motif_id"]) == {"M1", "M2"}
    assert (df.groupby(["motif_id", "sequence_name"]).size() == 1).all()
    # M1 consensus ATC sits exactly at the variant position (0-based pad ->
    # 1-based pad+1): it must be the retained best match
    m1 = df[df["motif_id"] == "M1"].iloc[0]
    assert m1["matched_sequence"] == "ATC" and m1["strand"] == "+"
    assert m1["start"] <= pad + 1 <= m1["stop"]


def test_auto_engine_falls_back_with_warning(tmp_path, meme_file, monkeypatch):
    import shutil as _sh

    from expecto_tpu.analysis import fimo as fimo_mod

    monkeypatch.setattr(_sh, "which", lambda name: None)
    fasta = tmp_path / "s.fa"
    fasta.write_text(">r\nACGTACGTACGT\n")
    out = tmp_path / "o.txt"
    with pytest.warns(UserWarning, match="built-in scanner"):
        assert fimo_mod.run_fimo(str(meme_file), str(fasta), str(out), engine="auto") == "builtin"
    with pytest.raises(RuntimeError, match="not found"):
        fimo_mod.run_fimo(str(meme_file), str(fasta), str(out), engine="meme")


def test_n_windows_are_skipped(tmp_path, meme_file):
    fasta = tmp_path / "n.fa"
    fasta.write_text(">r\nACGNNNNNNACG\n")
    out = tmp_path / "o.txt"
    scan_to_text(str(meme_file), str(fasta), str(out))
    import pandas as pd

    df = pd.read_table(out)
    assert not df["matched_sequence"].str.contains("N").any()
    assert len(df) > 0  # the flanking ACG windows still score
