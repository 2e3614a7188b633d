"""Benchmark: Beluga variant-scoring throughput, TPU vs CPU-PyTorch baseline.

Prints ONE JSON line:
    {"metric": "variants_per_sec_per_chip", "value": N, "unit": "variants/s",
     "vs_baseline": R}

Workload definition (BASELINE.md): one variant at maxshift=800 costs 36
Beluga forwards of a (2000, 4) one-hot window — 9 shifts x 2 alleles x
2 orientations (reference chromatin.py:243,262-279). The baseline is the
reference's CPU-PyTorch path (torch batch=32, fp32), measured in-process on
this machine; ``vs_baseline`` is the TPU/CPU throughput ratio.

The TPU path runs the production configuration: bfloat16 compute, batch
streamed through the fixed-shape jitted sharded runner. (fp32-HIGHEST parity
mode is what the correctness suite tests; production serving uses bf16 with
documented ~1e-2 absolute track-probability tolerance.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

WINDOWS_PER_VARIANT = 36
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")


def measure_tpu_windows_per_sec(params, *, batch_size: int, n_batches: int = 8) -> float:
    """Production chromatin-scoring path: bf16 compute, device-side fwd/RC
    averaging (2 forwards per shipped row, the form every consumer uses —
    predict.py:183-194), float16 fetch, pipelined batches. Returns forward
    passes (windows) per second."""
    import jax
    import jax.numpy as jnp

    from expecto_tpu.parallel.runner import BelugaRunner

    runner = BelugaRunner(
        params,
        batch_size=batch_size,
        compute_dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
        out_dtype=np.float16,
        pipeline_depth=6,
    )
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(n_batches * batch_size, 2000), dtype=np.int8)

    runner.predict_codes(codes[:batch_size], average_rc=True)  # compile + warmup
    t0 = time.perf_counter()
    runner.predict_codes(codes, average_rc=True)
    dt = time.perf_counter() - t0
    return 2 * n_batches * batch_size / dt  # each row = fwd + RC forward


def measure_cpu_torch_windows_per_sec(state_dict, *, batch: int = 32, n_windows: int = 32) -> float:
    """Reference-equivalent CPU path: torch fp32 forward, batch 32
    (chromatin.py:37-38,265-279)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from torch_oracle import TorchBeluga

    net = TorchBeluga().eval()
    keyed = net.state_dict_reference_keys()
    # load the same weights used on TPU (keys map back 1:1)
    back = {v_ref: state_dict[v_ref] for v_ref in keyed}
    mapping = {
        "model.0.0": "conv.0", "model.0.2": "conv.2", "model.0.6": "conv.5",
        "model.0.8": "conv.7", "model.0.12": "conv.10", "model.0.14": "conv.12",
        "model.1.2.1": "fc1", "model.1.4.1": "fc2",
    }
    renamed = {}
    for k, v in back.items():
        stem, leaf = k.rsplit(".", 1)
        renamed[mapping[stem] + "." + leaf] = v
    net.load_state_dict(renamed)

    x = torch.randn(n_windows, 4, 1, 2000)
    with torch.no_grad():
        net(x[:4])  # warmup
        t0 = time.perf_counter()
        for i in range(0, n_windows, batch):
            net(x[i : i + batch])
        dt = time.perf_counter() - t0
    return n_windows / dt


def main() -> None:
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from torch_oracle import TorchBeluga

    from expecto_tpu.models.convert import state_dict_to_params

    torch.manual_seed(0)
    state_dict = TorchBeluga().eval().state_dict_reference_keys()
    params = state_dict_to_params(state_dict)

    import jax

    platform = jax.devices()[0].platform
    batch_size = 2048 if platform != "cpu" else 64
    n_batches = 12 if platform != "cpu" else 1
    tpu_wps = measure_tpu_windows_per_sec(params, batch_size=batch_size, n_batches=n_batches)

    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cpu_wps = json.load(f)["cpu_windows_per_sec"]
    else:
        cpu_wps = measure_cpu_torch_windows_per_sec(state_dict)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_windows_per_sec": cpu_wps}, f)

    value = tpu_wps / WINDOWS_PER_VARIANT
    baseline = cpu_wps / WINDOWS_PER_VARIANT
    print(
        json.dumps(
            {
                "metric": "variants_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "variants/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
