"""Offline converter: torch ``deepsea.beluga.pth`` -> native npz checkpoint.

The production weights ship as a torch ``state_dict`` (reference
chromatin.py:103). This one-time converter maps them to the TPU-native layout
of :mod:`expecto_tpu.models.beluga`:

    - conv kernels: torch OIHW ``(out, in, 1, 8)`` -> WIO ``(8, in, out)``.
    - dense 1: the torch flatten is channel-major (``x.view(N, -1)`` on
      ``(N, 640, 1, 106)``, Beluga.py:42), ours is length-major on
      ``(N, 106, 640)``; the input axis of W1 is permuted accordingly
      (``new[l*640 + c] = old[c*106 + l]``) so the runtime does a straight
      reshape.
    - dense matrices are transposed to (in, out).

torch is imported lazily — it is only needed on the machine doing the
conversion, never on the serving path.
"""

from __future__ import annotations

import os

import numpy as np

from .beluga import CONV_SPECS, FC1_IN, FC1_OUT, FC2_OUT

# torch state_dict keys of the six convs and two linears, in model order
# (nested nn.Sequential indices; see reference Beluga.py:21-47).
TORCH_CONV_KEYS = ["model.0.0", "model.0.2", "model.0.6", "model.0.8", "model.0.12", "model.0.14"]
TORCH_FC_KEYS = ["model.1.2.1", "model.1.4.1"]

_N_CHANNELS_FLAT = 640
_LEN_FLAT = 106


def fc1_permutation() -> np.ndarray:
    """perm[l*640 + c] = c*106 + l (channel-major -> length-major)."""
    l_idx, c_idx = np.meshgrid(np.arange(_LEN_FLAT), np.arange(_N_CHANNELS_FLAT), indexing="ij")
    return (c_idx * _LEN_FLAT + l_idx).reshape(-1)


def state_dict_to_params(state_dict: dict) -> dict:
    """Map a torch Beluga state_dict (tensors or numpy arrays) to the native
    pytree layout. Returns numpy float32 arrays."""

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, dtype=np.float32)

    params: dict = {}
    for i, (key, (w, cin, cout)) in enumerate(zip(TORCH_CONV_KEYS, CONV_SPECS)):
        kernel = arr(state_dict[key + ".weight"])  # (out, in, 1, 8)
        if kernel.shape != (cout, cin, 1, w):
            raise ValueError(f"conv{i} weight shape {kernel.shape}, expected {(cout, cin, 1, w)}")
        params[f"conv{i}"] = {
            "w": np.ascontiguousarray(kernel[:, :, 0, :].transpose(2, 1, 0)),  # WIO
            "b": arr(state_dict[key + ".bias"]),
        }

    w1 = arr(state_dict[TORCH_FC_KEYS[0] + ".weight"])  # (2003, 67840) channel-major inputs
    if w1.shape != (FC1_OUT, FC1_IN):
        raise ValueError(f"fc1 weight shape {w1.shape}, expected {(FC1_OUT, FC1_IN)}")
    params["fc1"] = {
        "w": np.ascontiguousarray(w1[:, fc1_permutation()].T),  # (67840, 2003) length-major
        "b": arr(state_dict[TORCH_FC_KEYS[0] + ".bias"]),
    }
    w2 = arr(state_dict[TORCH_FC_KEYS[1] + ".weight"])  # (2002, 2003)
    if w2.shape != (FC2_OUT, FC1_OUT):
        raise ValueError(f"fc2 weight shape {w2.shape}, expected {(FC2_OUT, FC1_OUT)}")
    params["fc2"] = {"w": np.ascontiguousarray(w2.T), "b": arr(state_dict[TORCH_FC_KEYS[1] + ".bias"])}
    return params


def save_params_npz(params: dict, path: str | os.PathLike) -> None:
    flat = {}
    for layer, d in params.items():
        for name, a in d.items():
            flat[f"{layer}/{name}"] = np.asarray(a)
    np.savez(path, **flat)


def load_params_npz(path: str | os.PathLike) -> dict:
    flat = np.load(path)
    params: dict = {}
    for key in flat.files:
        layer, name = key.split("/")
        params.setdefault(layer, {})[name] = flat[key]
    return params


def save_params_orbax(params: dict, path: str | os.PathLike) -> None:
    """Orbax checkpoint of the Beluga pytree (multi-host-safe alternative to
    npz; SURVEY §5 checkpoint plan)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(os.path.abspath(path), {k: dict(v) for k, v in params.items()})


def load_params_orbax(path: str | os.PathLike) -> dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(os.path.abspath(path))


def convert_torch_checkpoint(pth_path: str | os.PathLike, npz_path: str | os.PathLike) -> None:
    """CLI entry: ``python -m expecto_tpu.models.convert in.pth out.npz``."""
    import torch  # local import: conversion-time dependency only

    state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    save_params_npz(state_dict_to_params(state_dict), npz_path)


if __name__ == "__main__":
    import sys

    convert_torch_checkpoint(sys.argv[1], sys.argv[2])
