"""Measure host<->device transfer characteristics of the attached chip.

The serving/consensus engineering in this repo is sized against the numbers
this prints: on the axon relay (r4 measurement) device->host fetch is
~25-40 MB/s on a single stream, ~59 MB/s aggregate across 2+ concurrent
streams (no further gain past 2), host->device upload ~140 MB/s, and the
per-call RTT ~23 ms. Full-track paths (the .diff.h5 contract at
~144 KB/variant fp16, consensus chromatin_preds at ~800 KB/sample fp16) are
therefore FETCH-bound well below the chip's compute rate — see
docs/ARCHITECTURE.md's perf-truth table.

Run: python scripts/probe_relay.py
"""
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp


def fresh(nbytes, k):
    # distinct device arrays: jax caches an array's host copy after its
    # first fetch, so re-fetching the SAME array measures nothing
    n = nbytes // 4
    base = jax.device_put(jnp.arange(n, dtype=jnp.float32))
    return [(base + i).block_until_ready() for i in range(k)]


def fetch_bw(nbytes, repeats=3):
    xs = fresh(nbytes, repeats + 1)
    np.asarray(xs[0])  # warm the path
    best = 0.0
    for x in xs[1:]:
        t0 = time.perf_counter()
        np.asarray(x)
        best = max(best, nbytes / (time.perf_counter() - t0))
    return best


def upload_bw(nbytes, repeats=3):
    a = np.arange(nbytes, dtype=np.uint8)
    jax.device_put(a).block_until_ready()  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_put(a).block_until_ready()
        best = max(best, nbytes / (time.perf_counter() - t0))
    return best


def threaded_fetch(n_threads, mb=16, repeats=2):
    best = 0.0
    for _ in range(repeats):
        xs = fresh(mb << 20, n_threads)
        with ThreadPoolExecutor(n_threads) as ex:
            t0 = time.perf_counter()
            list(ex.map(np.asarray, xs))
            best = max(best, n_threads * (mb << 20) / (time.perf_counter() - t0))
    return best


def main():
    print("platform:", jax.devices()[0].platform)
    for mb in (1, 4, 16, 64):
        print(f"fetch {mb:3d}MB: {fetch_bw(mb << 20) / 1e6:8.1f} MB/s   "
              f"upload: {upload_bw(mb << 20) / 1e6:8.1f} MB/s", flush=True)
    for nt in (1, 2, 4):
        print(f"threaded fetch x{nt} (16MB each): {threaded_fetch(nt) / 1e6:8.1f} MB/s aggregate", flush=True)
    xs = fresh(4, 21)
    np.asarray(xs[0])
    t0 = time.perf_counter()
    for x in xs[1:]:
        np.asarray(x)
    print(f"tiny-fetch RTT: {(time.perf_counter() - t0) / 20 * 1000:.1f} ms")


if __name__ == "__main__":
    main()
