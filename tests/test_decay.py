"""Decay-basis projection vs literal oracles of the reference formulas
(predict.py:87-136 variant path; compute_expecto_features.py:91-124 gene
path), including the tile/repeat feature layout and the d=0 overlap."""

from functools import reduce

import numpy as np

from expecto_tpu.genome.windows import variant_shifts, gene_shifts
from expecto_tpu.ops.decay import (
    gene_pos_weights,
    variant_basis,
    project_features,
    pad_legacy_20030,
    N_BASIS,
)


def oracle_variant_features(snpeffects, snpdists, snpstrands, shifts, nfeatures):
    """Literal reimplementation of the reference's vstack/tile/repeat math."""
    snpdists = snpdists * ((snpstrands == "+") * 2 - 1)
    rates = [0.01, 0.02, 0.05, 0.1, 0.2]
    Xreducedall_diffs = []
    for dist in shifts:
        d = snpdists + dist * ((snpstrands == "+") * 2 - 1)
        rows = [np.exp(-r * np.floor(np.abs(d / 200.0))) * (d <= 0) for r in rates]
        rows += [np.exp(-r * np.floor(np.abs(d / 200.0))) * (d >= 0) for r in rates]
        Xreducedall_diffs.append(np.vstack(rows).T)
    return reduce(
        lambda x, y: x + y,
        [
            np.tile(np.asarray(snpeffects[j]), 10)
            * np.repeat(Xreducedall_diffs[j], nfeatures, axis=1)
            for j in range(len(shifts))
        ],
    )


def oracle_gene_features(preds, shifts):
    """Literal gene-path oracle (compute_expecto_features.py:91-124)."""
    s = np.asarray(shifts)
    rates = [0.01, 0.02, 0.05, 0.1, 0.2]
    pos_weights = np.vstack(
        [np.exp(-r * np.abs(s) / 200) * (s <= 0) for r in rates]
        + [np.exp(-r * np.abs(s) / 200) * (s >= 0) for r in rates]
    )
    return np.sum(pos_weights[:, :, None] * preds[None, :, :], axis=1).flatten()


def test_variant_path_matches_oracle(rng):
    shifts = variant_shifts(800)
    n, m = 23, 17
    preds = [rng.normal(size=(n, m)) for _ in shifts]
    dists = rng.integers(-30000, 30000, size=n)
    dists[0] = 0  # exercise the <=0 / >=0 overlap
    strands = rng.choice(["+", "-"], size=n)

    want = oracle_variant_features(np.array(preds), dists, strands, shifts, m)
    basis = variant_basis(dists, strands, shifts)  # (S, N, 10)
    got = project_features(basis, np.array(preds))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_gene_path_matches_oracle(rng):
    shifts = gene_shifts()
    preds = rng.normal(size=(200, 31))
    want = oracle_gene_features(preds, shifts)
    got = project_features(gene_pos_weights(shifts), preds[:, None, :].transpose(0, 1, 2) * 1.0)
    # project_features expects (S, N, M); use N=1
    got1 = project_features(gene_pos_weights(shifts), preds[:, None, :])
    np.testing.assert_allclose(got1[0], want, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got[0], want, rtol=1e-12, atol=1e-12)


def test_zero_distance_fires_both_sides():
    basis = variant_basis(np.array([0]), np.array(["+"]), [0])
    np.testing.assert_allclose(basis[0, 0], np.ones(N_BASIS))


def test_floor_vs_nofloor_difference():
    # at |d| = 100: floor(100/200) = 0 -> weight 1; no-floor = exp(-r/2) < 1
    vb = variant_basis(np.array([100]), np.array(["+"]), [0])[0, 0]
    gw = gene_pos_weights([100])[:, 0]
    assert np.allclose(vb[5:], 1.0)  # downstream, floored to 0
    assert np.all(gw[5:] < 1.0)


def test_strand_sign_flip():
    # '-' strand negates distances: d=+400 on '-' == d=-400 on '+'
    b_minus = variant_basis(np.array([400]), np.array(["-"]), [0])
    b_plus = variant_basis(np.array([-400]), np.array(["+"]), [0])
    np.testing.assert_allclose(b_minus, b_plus)


def test_shift_strand_correction():
    # on '-' strand, shift s contributes d0 - s
    b = variant_basis(np.array([1000]), np.array(["-"]), [200])
    b2 = variant_basis(np.array([-1200]), np.array(["+"]), [0])
    np.testing.assert_allclose(b, b2)


def test_legacy_padding_layout(rng):
    feats = rng.normal(size=(3, 10 * 7))
    padded = pad_legacy_20030(feats, n_tracks=7)
    assert padded.shape == (3, 10 * 8)
    blocks = padded.reshape(3, 10, 8)
    assert (blocks[:, :, 0] == 0).all()
    np.testing.assert_array_equal(blocks[:, :, 1:].reshape(3, -1), feats)
