"""Pallas conv8+bias+relu kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expecto_tpu.ops.pallas_conv import conv8_relu, conv8_relu_reference


@pytest.mark.parametrize("cin,cout,l", [(4, 32, 64), (32, 64, 128), (64, 160, 57)])
def test_matches_xla(cin, cout, l):
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, l, cin), jnp.float32)
    w = jax.random.normal(key, (8, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(key, (cout,), jnp.float32)
    got = conv8_relu(x, w, b, interpret=True)
    want = conv8_relu_reference(x, w, b)
    assert got.shape == (2, l - 7, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_beluga_conv_shapes():
    """The actual first-block shapes of the variant-span path."""
    key = jax.random.key(1)
    x = jax.random.normal(key, (1, 600, 4), jnp.float32)
    w = jax.random.normal(key, (8, 4, 320), jnp.float32) * 0.1
    b = jnp.zeros((320,))
    got = conv8_relu(x, w, b, interpret=True)
    want = conv8_relu_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
