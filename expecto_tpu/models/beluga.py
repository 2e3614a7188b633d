"""DeepSEA-Beluga chromatin CNN, TPU-native (JAX/XLA).

Architecture (reference Beluga.py:18-51): six valid 1-D convolutions of width
8 in three blocks with 4-wide max-pools between blocks, then two dense layers:

    (N, 2000, 4 one-hot)
    -> conv 4->320 -> ReLU -> conv 320->320 -> ReLU -> pool4   (N, 496, 320)
    -> conv 320->480 -> ReLU -> conv 480->480 -> ReLU -> pool4 (N, 120, 480)
    -> conv 480->640 -> ReLU -> conv 640->640 -> ReLU          (N, 106, 640)
    -> flatten 67,840 -> dense 2003 -> ReLU -> dense 2002 -> sigmoid

Design choices (TPU-first, not a torch translation):
    - channels-last NWC layout (torch uses NCHW with a dummy H dim); XLA on
      TPU tiles NWC convs straight onto the MXU.
    - the flatten is length-major ((N,106,640) -> (N,67840)); the torch
      checkpoint's dense-1 matrix is channel-major, so the weight converter
      permutes its input axis once at load time (see convert.py) instead of
      transposing activations every forward pass.
    - dropout layers are inference no-ops (the reference only ever runs Beluga
      in eval mode: chromatin.py:104); they exist solely as checkpoint keys.
    - compute dtype and matmul precision are parameters: float32+HIGHEST for
      parity with the torch reference, bfloat16 for production throughput.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BELUGA_INPUT_LEN = 2000
BELUGA_N_TRACKS = 2002

#: (width, in_ch, out_ch) for the six convolutions.
CONV_SPECS = [(8, 4, 320), (8, 320, 320), (8, 320, 480), (8, 480, 480), (8, 480, 640), (8, 640, 640)]
FC1_IN = 640 * 106  # 67,840
FC1_OUT = 2003
FC2_OUT = BELUGA_N_TRACKS

# Pytree of arrays: {"conv{i}": {"w": (8,in,out), "b": (out,)}, "fc1"/"fc2": {"w","b"}}
BelugaParams = dict[str, dict[str, Any]]


def init_beluga_params(key: jax.Array, dtype=jnp.float32) -> BelugaParams:
    """He-style random init (for tests and benchmarks; production weights come
    from the converted DeepSEA checkpoint, see convert.py)."""
    params: BelugaParams = {}
    keys = jax.random.split(key, len(CONV_SPECS) + 2)
    for i, (w, cin, cout) in enumerate(CONV_SPECS):
        scale = np.sqrt(2.0 / (w * cin))
        params[f"conv{i}"] = {
            "w": (jax.random.normal(keys[i], (w, cin, cout)) * scale).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }
    params["fc1"] = {
        "w": (jax.random.normal(keys[-2], (FC1_IN, FC1_OUT)) * np.sqrt(2.0 / FC1_IN)).astype(dtype),
        "b": jnp.zeros((FC1_OUT,), dtype),
    }
    params["fc2"] = {
        "w": (jax.random.normal(keys[-1], (FC1_OUT, FC2_OUT)) * np.sqrt(2.0 / FC1_OUT)).astype(dtype),
        "b": jnp.zeros((FC2_OUT,), dtype),
    }
    return params


def _conv_relu(x: jax.Array, p: dict, precision) -> jax.Array:
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    return jax.nn.relu(y + p["b"].astype(x.dtype))


def _maxpool4(x: jax.Array) -> jax.Array:
    # torch MaxPool2d((1,4),(1,4)) truncates the remainder (floor mode).
    n, l, c = x.shape
    return jnp.max(x[:, : (l // 4) * 4, :].reshape(n, l // 4, 4, c), axis=2)


def beluga_forward(
    params: BelugaParams,
    x: jax.Array,
    *,
    precision=lax.Precision.HIGHEST,
    logits: bool = False,
) -> jax.Array:
    """Forward pass: (N, 2000, 4) one-hot -> (N, 2002) track probabilities.

    ``logits=True`` skips the output sigmoid (useful for fused downstream
    math).
    """
    h = x
    h = _conv_relu(h, params["conv0"], precision)
    h = _conv_relu(h, params["conv1"], precision)
    h = _maxpool4(h)
    h = _conv_relu(h, params["conv2"], precision)
    h = _conv_relu(h, params["conv3"], precision)
    h = _maxpool4(h)
    h = _conv_relu(h, params["conv4"], precision)
    h = _conv_relu(h, params["conv5"], precision)
    h = h.reshape(h.shape[0], -1)  # length-major flatten (see module docstring)
    h = jax.nn.relu(
        jnp.dot(h, params["fc1"]["w"].astype(h.dtype), precision=precision)
        + params["fc1"]["b"].astype(h.dtype)
    )
    out = (
        jnp.dot(h, params["fc2"]["w"].astype(h.dtype), precision=precision)
        + params["fc2"]["b"].astype(h.dtype)
    )
    return out if logits else jax.nn.sigmoid(out)


@functools.partial(jax.jit, static_argnames=("precision", "logits", "compute_dtype"))
def beluga_apply(
    params: BelugaParams,
    x: jax.Array,
    *,
    precision=lax.Precision.HIGHEST,
    logits: bool = False,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Jitted forward with dtype control; output is always float32."""
    y = beluga_forward(
        jax.tree.map(lambda a: a.astype(compute_dtype), params),
        x.astype(compute_dtype),
        precision=precision,
        logits=logits,
    )
    return y.astype(jnp.float32)


def count_params(params: BelugaParams) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
