"""Unit tests for one-hot encoding vs the reference semantics
(expecto_utils.py:5-39), including a literal reimplementation oracle."""

import math

import numpy as np
import pytest

from expecto_tpu.genome.encode import (
    encode_seqs,
    seqs_to_codes,
    codes_to_onehot,
    reverse_complement_codes,
    center_crop_slice,
)


def reference_encode(seqs, inputsize=2000):
    """Independent oracle implementing the documented reference behavior:
    per-char dict lookup, floor center-crop, channel/position flip RC."""
    mydict = {
        "A": [1, 0, 0, 0], "G": [0, 1, 0, 0], "C": [0, 0, 1, 0], "T": [0, 0, 0, 1],
        "N": [0, 0, 0, 0], "H": [0, 0, 0, 0],
        "a": [1, 0, 0, 0], "g": [0, 1, 0, 0], "c": [0, 0, 1, 0], "t": [0, 0, 0, 1],
        "n": [0, 0, 0, 0], "-": [0, 0, 0, 0],
    }
    seqsnp = np.zeros((len(seqs), 4, inputsize), np.bool_)
    for n, line in enumerate(seqs):
        lo = int(math.floor((len(line) - inputsize) / 2.0))
        hi = int(math.floor(len(line) - (len(line) - inputsize) / 2.0))
        for i, c in enumerate(line[lo:hi]):
            seqsnp[n, :, i] = mydict[c]
    flip = seqsnp[:, ::-1, ::-1]
    return np.concatenate([seqsnp, flip], axis=0).astype(np.float32)


@pytest.mark.parametrize("inputsize", [10, 11, 2000])
def test_matches_reference_oracle(rng, inputsize):
    alphabet = list("ACGTNacgtn-H")
    seqs = ["".join(rng.choice(alphabet, size=inputsize + 100)) for _ in range(5)]
    ours = encode_seqs(seqs, inputsize, layout="NCL")
    theirs = reference_encode(seqs, inputsize)
    np.testing.assert_array_equal(ours, theirs)


def test_agct_channel_order():
    enc = encode_seqs(["AGCT"], inputsize=4, concat_rc=False, layout="NCL")
    np.testing.assert_array_equal(enc[0], np.eye(4, dtype=np.float32))


def test_rc_is_complement_reversed():
    codes = seqs_to_codes(["ACGTN"], inputsize=5)
    rc = reverse_complement_codes(codes)
    # revcomp of ACGTN = NACGT
    np.testing.assert_array_equal(rc[0], seqs_to_codes(["NACGT"], inputsize=5)[0])


def test_center_crop_drops_left_extra():
    # length 7 -> inputsize 4: overhang 3, floor(3/2)=1 left, 2 right
    assert center_crop_slice(7, 4) == slice(1, 5)


def test_short_sequence_pads_as_n():
    enc = encode_seqs(["AC"], inputsize=4, concat_rc=False, layout="NCL")
    np.testing.assert_array_equal(enc[0, :, 2:], np.zeros((4, 2)))
    assert enc[0, 0, 0] == 1  # A
    assert enc[0, 2, 1] == 1  # C


def test_nlc_layout_transpose():
    seqs = ["ACGTACGTAC"]
    ncl = encode_seqs(seqs, 10, layout="NCL")
    nlc = encode_seqs(seqs, 10, layout="NLC")
    np.testing.assert_array_equal(nlc.transpose(0, 2, 1), ncl)


def test_onehot_unknown_is_zero():
    codes = seqs_to_codes(["X?Z"], inputsize=3)
    assert (codes == 4).all()
    assert codes_to_onehot(codes).sum() == 0
