"""Host<->device link probe: the phase indicator every committed perf
artifact carries (VERDICT r4 #3).

The axon relay's bandwidth swings 1.5-2.5x between multi-minute phases, so
a round-over-round delta in BENCH_r*.json is unreadable without knowing the
link state at measurement time. :func:`probe` measures single-stream fetch
bandwidth, 2-stream aggregate fetch bandwidth, upload bandwidth and
round-trip latency in a few seconds and returns a dict that bench.py /
scripts/bench_scaling.py stamp into their JSON artifacts as
``relay_probe``. How to read it is documented in docs/ARCHITECTURE.md
("Reading relay_probe"): compare the probe blocks first — if
``fetch_2stream_mb_s`` differs by >1.3x between rounds, throughput deltas
on fetch-bound paths are link phase, not regression.

Measurement rules (verify-skill r4 lessons): every fetch uses a FRESH
device array (jax caches an array's host copy after its first fetch), and
the path is warmed before timing.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor


def _fresh(nbytes: int, k: int):
    """k distinct device arrays of ~nbytes (distinct values: a re-fetch of
    an already-fetched array reads jax's host-copy cache, not the link)."""
    import jax
    import jax.numpy as jnp

    n = max(nbytes // 4, 1)
    base = jax.device_put(jnp.arange(n, dtype=jnp.float32))
    return [(base + i).block_until_ready() for i in range(k)]


def probe(*, block_mb: int = 16, repeats: int = 2) -> dict:
    """Measure the link in ~5-15 s -> dict with keys
    ``platform, fetch_mb_s, fetch_2stream_mb_s, upload_mb_s, rtt_ms``.

    Best-of-``repeats`` per direction (a single sample inside a bad phase
    would misreport the phase as worse than it is; the best sample is the
    phase's ceiling, which is what the artifact reader compares)."""
    import numpy as np
    import jax

    nbytes = block_mb << 20
    out: dict = {"platform": jax.devices()[0].platform, "block_mb": block_mb}

    # single-stream fetch
    xs = _fresh(nbytes, repeats + 1)
    np.asarray(xs[0])  # warm
    best = 0.0
    for x in xs[1:]:
        t0 = time.perf_counter()
        np.asarray(x)
        best = max(best, nbytes / (time.perf_counter() - t0))
    out["fetch_mb_s"] = round(best / 1e6, 1)

    # 2-stream aggregate fetch (the production fetch-worker configuration)
    best = 0.0
    for _ in range(repeats):
        xs = _fresh(nbytes, 2)
        with ThreadPoolExecutor(2) as ex:
            t0 = time.perf_counter()
            list(ex.map(np.asarray, xs))
            best = max(best, 2 * nbytes / (time.perf_counter() - t0))
    out["fetch_2stream_mb_s"] = round(best / 1e6, 1)

    # upload
    a = np.arange(nbytes, dtype=np.uint8)
    jax.device_put(a).block_until_ready()  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_put(a).block_until_ready()
        best = max(best, nbytes / (time.perf_counter() - t0))
    out["upload_mb_s"] = round(best / 1e6, 1)

    # RTT: mean of 10 tiny fetches (best-of would just read the floor)
    xs = _fresh(4, 11)
    np.asarray(xs[0])
    t0 = time.perf_counter()
    for x in xs[1:]:
        np.asarray(x)
    out["rtt_ms"] = round((time.perf_counter() - t0) / 10 * 1000, 2)
    return out
