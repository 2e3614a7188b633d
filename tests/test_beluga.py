"""JAX Beluga vs torch-CPU oracle equivalence, weight conversion, runner."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from expecto_tpu.genome.encode import encode_seqs
from expecto_tpu.models.beluga import (
    beluga_apply,
    init_beluga_params,
    count_params,
    CONV_SPECS,
)
from expecto_tpu.models.convert import (
    state_dict_to_params,
    save_params_npz,
    load_params_npz,
)
from torch_oracle import TorchBeluga


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    net = TorchBeluga().eval()
    # shrink weights so sigmoid isn't saturated
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(0.05)
    params = state_dict_to_params(net.state_dict_reference_keys())
    return net, params


@pytest.fixture(scope="module")
def onehot_batch(rng=np.random.default_rng(7)):
    alphabet = list("ACGTN")
    seqs = ["".join(rng.choice(alphabet, size=2000, p=[0.24, 0.24, 0.24, 0.24, 0.04])) for _ in range(4)]
    return encode_seqs(seqs, 2000, concat_rc=True, layout="NLC")  # (8, 2000, 4)


def test_param_count(oracle_and_params):
    _, params = oracle_and_params
    n_torch = sum(p.numel() for p in TorchBeluga().parameters())
    assert count_params(params) == n_torch


def test_forward_matches_torch(oracle_and_params, onehot_batch):
    net, params = oracle_and_params
    x_nlc = onehot_batch
    with torch.no_grad():
        # torch input layout: (N, 4, 1, 2000)
        x_torch = torch.from_numpy(np.ascontiguousarray(x_nlc.transpose(0, 2, 1))[:, :, None, :])
        want = net(x_torch).numpy()
    got = np.asarray(beluga_apply(params, jnp.asarray(x_nlc)))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_npz_roundtrip(oracle_and_params, tmp_path):
    _, params = oracle_and_params
    save_params_npz(params, tmp_path / "b.npz")
    loaded = load_params_npz(tmp_path / "b.npz")
    for layer in params:
        for name in params[layer]:
            np.testing.assert_array_equal(params[layer][name], loaded[layer][name])


def test_orbax_roundtrip(oracle_and_params, tmp_path):
    from expecto_tpu.models.convert import save_params_orbax, load_params_orbax

    _, params = oracle_and_params
    save_params_orbax(params, tmp_path / "ckpt")
    loaded = load_params_orbax(tmp_path / "ckpt")
    for layer in params:
        for name in params[layer]:
            np.testing.assert_array_equal(np.asarray(params[layer][name]), np.asarray(loaded[layer][name]))


def test_runner_matches_direct(oracle_and_params, onehot_batch):
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.genome.encode import seqs_to_codes

    _, params = oracle_and_params
    # rebuild codes for the forward half of the batch
    rng = np.random.default_rng(7)
    alphabet = list("ACGTN")
    seqs = ["".join(rng.choice(alphabet, size=2000, p=[0.24, 0.24, 0.24, 0.24, 0.04])) for _ in range(4)]
    codes = seqs_to_codes(seqs)

    runner = BelugaRunner(params, batch_size=8)
    got = runner.predict_codes(codes)
    want = np.asarray(beluga_apply(params, jnp.asarray(onehot_batch[:4])))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)

    # fwd+rc concat layout matches encode_seqs(concat_rc=True) ordering
    both = runner.predict_codes_fwd_rc_concat(codes)
    want_all = np.asarray(beluga_apply(params, jnp.asarray(onehot_batch)))
    np.testing.assert_allclose(both, want_all, atol=2e-6, rtol=1e-5)

    # on-device RC averaging == mean of the two halves
    avg = runner.predict_codes(codes, average_rc=True)
    np.testing.assert_allclose(avg, (want_all[:4] + want_all[4:]) / 2, atol=2e-6, rtol=1e-5)


def test_runner_sharded_over_mesh(oracle_and_params):
    """Batch sharded over all 8 virtual devices gives identical results."""
    from expecto_tpu.parallel.mesh import get_mesh
    from expecto_tpu.parallel.runner import BelugaRunner

    _, params = oracle_and_params
    assert jax.device_count() == 8
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, size=(13, 2000), dtype=np.int8)

    r1 = BelugaRunner(params, batch_size=16, mesh=get_mesh(8))
    r2 = BelugaRunner(params, batch_size=16, mesh=get_mesh(1))
    np.testing.assert_allclose(r1.predict_codes(codes), r2.predict_codes(codes), atol=2e-6, rtol=1e-5)


def test_rc_averaged_forward_is_rc_invariant(oracle_and_params):
    """Property (SURVEY §4): the fwd/RC-averaged prediction of a window
    equals that of its reverse complement — the averaging makes downstream
    features strand-symmetric."""
    from expecto_tpu.genome.encode import reverse_complement_codes, seqs_to_codes
    from expecto_tpu.parallel.runner import BelugaRunner

    _, params = oracle_and_params
    rng = np.random.default_rng(13)
    seqs = ["".join(rng.choice(list("ACGT"), size=2000)) for _ in range(3)]
    codes = seqs_to_codes(seqs, 2000)
    runner = BelugaRunner(params, batch_size=16)
    fwd = runner.predict_codes(codes, average_rc=True)
    rc = runner.predict_codes(reverse_complement_codes(codes), average_rc=True)
    np.testing.assert_allclose(fwd, rc, rtol=1e-5, atol=1e-6)
