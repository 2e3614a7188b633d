"""Pallas TPU kernel: width-8 valid 1-D convolution + bias + ReLU.

The Beluga conv stack is six width-8 valid convolutions (models/beluga.py).
A width-8 conv is a sum of 8 shifted matmuls:

    y[:, l, :] = relu( sum_k  x[:, l+k, :] @ W[k]  + b )

This kernel keeps one batch row's full sequence in VMEM, runs the 8 shifted
(L, Cin) @ (Cin, Cout) matmuls on the MXU accumulating in a float32 scratch,
and fuses bias + ReLU + the output cast — one HBM round trip per layer
instead of conv -> add -> relu. Grid: (batch, Cout tiles).

Status: measured at parity with XLA's conv lowering on v5e for the Beluga
span shapes (e.g. B64 L3593 320->320: XLA 34.6 ms vs Pallas 41.5 ms per
call including relay latency; bf16 max-abs reduction-order diff 0.0625).
XLA already maps these convs onto the MXU at ~2/3 of peak, so the XLA path
(ops/spans.py) stays the default; this kernel is the maintained seam for
deeper fusion work (conv+pool chaining, int8-code input) with interpret-
mode + on-device parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_W = 8


def _conv_kernel(*refs):
    # refs: x_0..x_7 (1, TL, Cin) pre-shifted views, w (8, Cin, Cout),
    # b (1, Cout), out (1, TL, Cout), acc scratch (TL, Cout) f32.
    # (Mosaic requires sublane-aligned loads, so the k-shifts are separate
    # aligned input blocks rather than unaligned dynamic slices.)
    x_refs = refs[:KERNEL_W]
    w_ref, b_ref, out_ref, acc_ref = refs[KERNEL_W:]
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    for k in range(KERNEL_W):
        acc_ref[:, :] += jnp.dot(x_refs[k][0], w_ref[k], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc_ref[:, :] + b_ref[0, :].astype(jnp.float32), 0.0)
    out_ref[0, :, :] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv8_relu(x: jax.Array, w: jax.Array, b: jax.Array, *, interpret: bool = False) -> jax.Array:
    """(N, L, Cin) x (8, Cin, Cout) -> relu(conv_valid + b), (N, L-7, Cout).

    Matches ``lax.conv_general_dilated(..., 'VALID', NWC/WIO)`` + bias +
    relu. The grid tiles the output length; Cout stays whole per block
    (Beluga's 320/480/640 all fit VMEM alongside an l_tile x Cout fp32
    accumulator).
    """
    n, l, cin = x.shape
    kw, _, cout = w.shape
    if kw != KERNEL_W:
        raise ValueError(f"kernel width {kw} != {KERNEL_W}")
    l_out = l - KERNEL_W + 1
    # tile the output length (Mosaic needs lane blocks of 128 multiples or
    # the full dim, and the full-L accumulator overflows VMEM for long
    # spans); the input row stays resident as one block, tiles read it with
    # dynamic slices.
    l_tile = min(512, -(-l_out // 8) * 8)
    n_tiles = -(-l_out // l_tile)
    l_out_pad = n_tiles * l_tile
    pad = l_out_pad + KERNEL_W - 1 - l
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    shifted = [jax.lax.slice_in_dim(x, k, k + l_out_pad, axis=1) for k in range(KERNEL_W)]
    out = pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct((n, l_out_pad, cout), x.dtype),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, l_tile, cin), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
            for _ in range(KERNEL_W)
        ]
        + [
            pl.BlockSpec((KERNEL_W, cin, cout), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_tile, cout), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((l_tile, cout), jnp.float32)],
        interpret=interpret,
    )(*shifted, w, b.reshape(1, -1))
    return out[:, :l_out, :]


def conv8_relu_reference(x, w, b):
    """XLA reference for parity tests."""
    y = jax.lax.conv_general_dilated(
        x, w, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )
    return jax.nn.relu(y + b)
