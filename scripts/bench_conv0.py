"""Measure the conv0 one-hot specialization (SURVEY §7 step 3, VERDICT r1 #7).

Beluga's first layer convolves a ONE-HOT input (N, L, 4) with an (8, 4, 320)
kernel: every output frame is a sum of 8 kernel rows selected by the base
codes — no multiplications needed. Candidate: replace the XLA conv with a
gather-sum (8 embedding lookups into a (5, 320) LUT per tap, N code -> zero
row), which trades the MXU conv for HBM gathers.

Both variants run on the serving span shape ((rows, 3600) codes, bf16) with
device-resident inputs; the fixed relay round-trip (~26 ms) hits every timed
call identically, and the conv0+conv1 prefix is timed alongside to put the
candidate saving in context of the FLOP bulk.

Verdict from the 2026-08 run (recorded in docs/ARCHITECTURE.md): the
gather-sum LOSES on TPU — XLA lowers the 4-channel conv onto the MXU at a
rate the 8-way gather+add (pure VPU/HBM traffic) does not reach, and conv0
is a few percent of the stack anyway. Keep the conv.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main() -> int:
    os.environ.setdefault(
        "EXPECTO_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    from expecto_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from torch_oracle import TorchBeluga
    from expecto_tpu.models.beluga import _conv_relu
    from expecto_tpu.models.convert import state_dict_to_params

    torch.manual_seed(0)
    params = state_dict_to_params(TorchBeluga().eval().state_dict_reference_keys())

    rows, span_len = 228, 3600  # serving batch shape (2048-window budget / 9)
    rng = np.random.default_rng(0)
    codes = jax.device_put(rng.integers(0, 5, size=(rows, span_len), dtype=np.int8))
    w0 = jax.device_put(np.asarray(params["conv0"]["w"], np.float32))  # (8, 4, 320)
    b0 = jax.device_put(np.asarray(params["conv0"]["b"], np.float32))
    w1 = jax.device_put(np.asarray(params["conv1"]["w"], np.float32))
    b1 = jax.device_put(np.asarray(params["conv1"]["b"], np.float32))

    @jax.jit
    def conv0_xla(codes, w0, b0):
        x = jax.nn.one_hot(codes, 4, dtype=jnp.bfloat16)
        return _conv_relu(x, {"w": w0, "b": b0}, jax.lax.Precision.DEFAULT)

    @jax.jit
    def conv0_gather(codes, w0, b0):
        # (8, 5, 320) LUT: rows 0..3 = kernel taps per base, row 4 (N) = 0
        lut = jnp.concatenate(
            [w0.astype(jnp.bfloat16), jnp.zeros((8, 1, 320), jnp.bfloat16)], axis=1
        ).transpose(0, 1, 2)  # (8, 5, 320)
        idx = codes.astype(jnp.int32)
        L = codes.shape[1] - 7
        acc = lut[0][idx[:, :L]]
        for k in range(1, 8):
            acc = acc + lut[k][idx[:, k : k + L]]
        return jax.nn.relu(acc + b0.astype(jnp.bfloat16))

    @jax.jit
    def conv01_xla(codes, w0, b0, w1, b1):
        h = conv0_xla(codes, w0, b0)
        return _conv_relu(h, {"w": w1, "b": b1}, jax.lax.Precision.DEFAULT)

    def bench(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(out[0, 0])  # warm + sync through the relay
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[0, 0])  # force fetch (block_until_ready lies on relay)
            best = min(best, time.perf_counter() - t0)
        return best

    t_conv = bench(conv0_xla, codes, w0, b0)
    t_gather = bench(conv0_gather, codes, w0, b0)
    t_prefix = bench(conv01_xla, codes, w0, b0, w1, b1)

    # equality check (gather-sum is exact: same adds, no multiplies)
    a = np.asarray(conv0_xla(codes, w0, b0), np.float32)
    b = np.asarray(conv0_gather(codes, w0, b0), np.float32)
    max_err = float(np.abs(a - b).max())

    rtt = 0.026  # fixed relay dispatch+fetch round-trip (docs/ARCHITECTURE.md)
    print(f"conv0 XLA conv:     {t_conv * 1e3:8.2f} ms  (~{(t_conv - rtt) * 1e3:.2f} ms compute)")
    print(f"conv0 gather-sum:   {t_gather * 1e3:8.2f} ms  (~{(t_gather - rtt) * 1e3:.2f} ms compute)")
    print(f"conv0+conv1 prefix: {t_prefix * 1e3:8.2f} ms  (~{(t_prefix - rtt) * 1e3:.2f} ms compute)")
    print(f"max |xla - gather| = {max_err:.2e}")
    winner = "gather-sum" if t_gather < t_conv else "XLA conv"
    print(f"winner: {winner}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
