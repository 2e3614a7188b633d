"""Benchmark: Beluga variant-scoring throughput, TPU vs CPU-PyTorch baseline.

Prints ONE JSON line:
    {"metric": "variants_per_sec_per_chip", "value": N, "unit": "variants/s",
     "vs_baseline": R, "paths": {...}}

Workload definition (BASELINE.md): one variant at maxshift=800 costs 36
Beluga forwards of a (2000, 4) one-hot window — 9 shifts x 2 alleles x
2 orientations (reference chromatin.py:243,262-279). The baseline is the
reference's CPU-PyTorch path (torch batch=32, fp32), measured in-process on
this machine; ``vs_baseline`` is the TPU/CPU throughput ratio.

``paths`` carries the secondary production workloads as one reproducible
artifact (VERDICT r1 #2/#6):
    - ``compute_ceiling_variants_per_sec``: the serving kernel timed with
      device-resident inputs (no host->device span transfer) — the gap to
      the headline number is the relay/input-transfer residue;
    - ``genes_per_sec``: the gene-feature regeneration path
      (predict_spans_project, 200 shifts + RC + fused decay projection;
      reference compute_expecto_features.py:105's 9.7M-forward workload);
    - ``indel_variants_per_sec``: fused SED serving for indels (both
      crop-adjusted spliced spans through the pair kernel — the path
      score_sed_serving routes indels through since r3), directly
      comparable to the substitution headline;
    - ``indel_h5_variants_per_sec`` / ``sub_h5_variants_per_sec``: the
      h5-emitting chromatin pipeline end to end (span assembly + pair-diff
      kernel with device-side diff + the full 2Nx9x2002 track fetch the
      .diff.h5 contract requires, (ref, diff) fp16 over two concurrent
      streams) — fetch-bound over the relay for BOTH classes, and
      near-equal since indels ride the same span path;
    - ``sub_h5_write_variants_per_sec``: the same pipeline WRITE-INCLUSIVE
      (the r4 streaming path lands real per-shift h5 files on disk,
      chunk-wise dataset writes overlapped with compute/fetch);
    - ``consensus_sample_genes_per_sec``: GEUVADIS C18 cohort prediction
      with haplotype window dedup (445 samples sharing segregating sites,
      geuvadis_predict_consensus.py:26-135), best-of-3;
    - ``consensus_private_sample_genes_per_sec``: the dedup-defeating
      regime (private variant positions) bounding worst-case cohort
      throughput — relay-fetch-bound at the contractual 782 KB/sample
      track wire (docs/ARCHITECTURE.md perf-truth table);
    - ``train_ms_per_round_256models``: warm per-round time of the
      vectorized gblinear trainer at 18k x 20,020 x 256 models.

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

_T0 = time.perf_counter()
_BUDGET = 840.0  # the driver allows ~900 s; leave margin for the emit


def _remaining() -> float:
    return _BUDGET - (time.perf_counter() - _T0)


def _make_runner(params, *, batch_size: int):
    import jax
    import jax.numpy as jnp

    from expecto_tpu.parallel.runner import BelugaRunner

    return BelugaRunner(
        params,
        batch_size=batch_size,
        compute_dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
        out_dtype=np.float16,
        pipeline_depth=6,
    )


def _variant_workload(n_variants: int, maxshift: int, n_models: int):
    from expecto_tpu.genome.windows import variant_shifts
    from expecto_tpu.ops.decay import variant_basis

    shifts = variant_shifts(maxshift)
    offsets = tuple(s + maxshift for s in shifts)
    span_len = 2 * maxshift + 2000
    rng = np.random.default_rng(0)
    mutpos = maxshift + 999
    # realistic composition: uniform ACGT with rare Ns (mappable-region
    # genomes are effectively N-free; Ns ride the 2-bit packing's sideband)
    ref_spans = rng.integers(0, 4, size=(n_variants, span_len), dtype=np.int8)
    n_mask = rng.random(ref_spans.shape) < 1e-3
    ref_spans[n_mask] = 4
    alt_alleles = ((ref_spans[:, mutpos] + 1) % 4).astype(np.int8)[:, None]
    dists = rng.integers(-20000, 20000, size=n_variants)
    strands = rng.choice(["+", "-"], size=n_variants)
    basis = variant_basis(dists, strands, shifts).astype(np.float32)
    W = (rng.standard_normal((20020, n_models)) * 0.01).astype(np.float32)
    bias = np.zeros(n_models, np.float32)
    return ref_spans, mutpos, alt_alleles, offsets, span_len, basis, W, bias


def measure_tpu_variants_per_sec(runner, work, *, n_variants: int) -> float:
    """Production SED-serving path: per variant, one spliced span per allele
    (span-amortized conv, windows as slices — ops/spans.py), fwd+RC averaged
    on device, decay-basis projection and all 218 tissue models' predictions
    fused on device (one matmul); only per-model REF/ALT scalars are
    fetched. This covers the reference's full chromatin.py + predict.py
    compute per variant (36 Beluga forward-equivalents + feature reduction +
    modellist scoring)."""
    ref_spans, mutpos, alt_alleles, offsets, _span_len, basis, W, bias = work
    k = min(64, n_variants)
    runner.score_variant_spans_packed(ref_spans[:k], mutpos, alt_alleles[:k], offsets, basis[:, :k], W, bias)
    best = 0.0
    for _ in range(5):  # best-of-5: the relay link to the chip is shared
        t0 = time.perf_counter()
        runner.score_variant_spans_packed(ref_spans, mutpos, alt_alleles, offsets, basis, W, bias)
        best = max(best, n_variants / (time.perf_counter() - t0))
    return best


def measure_compute_ceiling(runner, work, *, repeats: int = 3) -> float:
    """The same serving kernel with every input device-resident: times pure
    compute + scalar fetch, no span transfer. The headline/ceiling gap is
    the host->device link, not the kernel."""
    import jax

    ref_spans, mutpos, alt_alleles, offsets, span_len, basis, W, bias = work
    rows = runner._span_rows(len(offsets))  # same batch shape as serving
    if ref_spans.shape[0] < rows:
        return float("nan")
    plan = runner._pack2_plan(ref_spans[:rows], rows)
    if plan is None:
        return float("nan")
    start, real, p_chunk, r_local, c_local = next(iter(runner._pack2_chunks(plan, rows, rows)))
    wire = runner._basis_wire_dtype
    dev = [
        jax.device_put(p_chunk, runner._batch_sharding),
        jax.device_put(r_local),
        jax.device_put(c_local),
        jax.device_put(alt_alleles[:rows], runner._batch_sharding),
        jax.device_put(np.ascontiguousarray(basis[:, :rows]).astype(wire)),
        jax.device_put(W.astype(np.float32)),
        jax.device_put(bias.astype(np.float32)),
    ]
    fn = runner._score_spans_packed2

    def call():
        out = fn(runner.params, dev[0], dev[1], dev[2], dev[3], dev[4], dev[5], dev[6],
                 offsets=offsets, span_len=span_len, mutpos=mutpos)
        np.asarray(out[0][0, 0])  # force a (tiny) fetch through the relay

    call()  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        call()
        best = max(best, real / (time.perf_counter() - t0))
    return best


def measure_gene_features_per_sec(runner, *, n_genes: int, repeats: int = 3) -> float:
    """Gene-feature regeneration throughput: 200 strand-shift windows per
    gene as one span, RC-averaged, decay projection fused on device
    (pipeline/features.py::compute_gene_features's span path). ``runner``
    is the shared span-workload runner (batch 3200 = 16 spans of 200
    windows — the production configuration for 41.8 kb gene spans)."""
    from expecto_tpu.genome.windows import gene_shifts
    from expecto_tpu.ops.decay import gene_pos_weights

    shifts = gene_shifts()
    offsets = tuple(range(0, 200 * len(shifts), 200))
    span_len = offsets[-1] + 2000
    pos_weights = gene_pos_weights(shifts)
    rng = np.random.default_rng(1)
    spans = rng.integers(0, 4, size=(n_genes, span_len), dtype=np.int8)

    runner.predict_spans_project(spans[: max(n_genes // 4, 1)], offsets, pos_weights)  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        runner.predict_spans_project(spans, offsets, pos_weights)
        best = max(best, n_genes / (time.perf_counter() - t0))
    return best


def measure_indel_serving_variants_per_sec(runner, work, *, n_variants: int, repeats: int = 3) -> float:
    """Fused SED serving for indels: both crop-adjusted spliced spans ship
    explicitly through the pair kernel (runner.score_variant_spans) — the
    path score_sed_serving routes indel rows through since r3, closing the
    r2 sub-vs-indel serving gap (2,189.6 vs 51.4 v/s). Per-variant conv
    cost equals the substitution path's; the extra cost vs the packed sub
    kernel is the second span's (unpacked) transfer."""
    ref_spans, _mutpos, _alt, offsets, _span_len, basis, W, bias = work
    ref = ref_spans[:n_variants]
    basis_n = np.ascontiguousarray(basis[:, :n_variants])
    # indel alt span = crop-shifted genome around the splice; content does
    # not change kernel cost — any distinct same-length span is equivalent
    alt = np.roll(ref, 2, axis=1)
    k = min(64, n_variants)
    runner.score_variant_spans(ref[:k], alt[:k], offsets, basis_n[:, :k], W, bias)  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        runner.score_variant_spans(ref, alt, offsets, basis_n, W, bias)
        best = max(best, n_variants / (time.perf_counter() - t0))
    return best


def measure_h5_pipeline_variants_per_sec(runner, *, n_variants: int, variant_class: str, maxshift: int = 800, repeats: int = 2, write_h5: bool = False, legacy_only: bool = False) -> float:
    """The h5-emitting chromatin pipeline end to end on a synthetic genome:
    host span assembly + pair-diff span kernel (diff = alt - ref in fp32 on
    device, fetched over the fp16 wire as one stacked (ref, diff) block) +
    host reconstruction of alt = ref + diff into the reference [fwd; rc]
    h5 row layout. ~144 KB/variant over the relay — this path is
    FETCH-bound (scripts/probe_relay.py), well below the serving numbers.
    ``variant_class``: 'sub' or 'indel' — both ride the same span path, so
    the two numbers should be close. Best-of-``repeats``: single-shot
    timing made whichever class ran FIRST read ~25% low (r4 measurement)."""
    import tempfile

    import pandas as pd

    from expecto_tpu.genome.fasta import FastaIndex, write_fasta
    from expecto_tpu.pipeline.chromatin import compute_variant_chromatin_effects

    rng = np.random.default_rng(2)
    contig_len = 2_000_000
    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bases[rng.integers(0, 4, contig_len)].tobytes().decode("latin-1")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    with tempfile.TemporaryDirectory() as td:
        write_fasta(os.path.join(td, "g.fa"), {"chr1": seq})
        fa = FastaIndex(os.path.join(td, "g.fa"))
        lo, hi = maxshift + 1100, contig_len - maxshift - 1200
        positions = rng.integers(lo, hi, size=n_variants)
        rows = []
        for i, pos in enumerate(positions):
            pos = int(pos)
            if variant_class == "sub":
                rows.append(["chr1", pos, ".", seq[pos - 1], comp[seq[pos - 1]]])
            elif i % 2:  # insertion (+2)
                rows.append(["chr1", pos, ".", seq[pos - 1], seq[pos - 1] + "AG"])
            else:  # deletion (-3)
                rows.append(["chr1", pos, ".", seq[pos - 1 : pos + 3], seq[pos - 1]])
        vcf = pd.DataFrame(rows)

        # write_h5=True measures the STREAMING path (chunk-wise dataset
        # writes, bounded memory — r4): actual h5 files land on disk, writes
        # overlapped with compute/fetch. write_h5=False measures the bulk
        # compute+fetch path (comparable to r1-r3 numbers).
        # legacy_only measures the original-ExPecto 'pred'-format writer:
        # only diff rides the wire — half the fetch of the full contract
        out_dir = os.path.join(td, "h5out") if write_h5 else None
        kw = dict(maxshift=maxshift, verbose=False, legacy_only=legacy_only)
        compute_variant_chromatin_effects(  # warm the span graph
            vcf.iloc[: min(8, n_variants)], fa, runner, out_dir, **kw
        )
        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            compute_variant_chromatin_effects(vcf, fa, runner, out_dir, **kw)
            best = max(best, n_variants / (time.perf_counter() - t0))
    return best


def _consensus_cohort_seqs(n_samples: int, *, private: bool, n_sites: int = 42):
    """Synthetic GEUVADIS cohort for one gene. ``private=False``: biallelic
    SNPs at SHARED segregating sites (~1 SNP/kb) — the regime the haplotype
    window dedup exploits. ``private=True``: every sample mutates its own
    ``n_sites`` random positions, defeating the dedup entirely (worst case:
    one span per sample). ``n_sites=42`` (~1/kb over the covered span) is
    the adversarial bound; real cohorts carry only a handful of truly
    private (singleton) variants per 42 kb — the regime the backbone-patch
    kernel targets (n_sites<=8)."""
    from expecto_tpu.pipeline.consensus import ENFORMER_SEQ_LENGTH

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    backbone = rng.integers(0, 4, size=ENFORMER_SEQ_LENGTH, dtype=np.int64)
    center = ENFORMER_SEQ_LENGTH // 2
    covered = np.arange(center - 21000, center + 21000)
    seqs = []
    if private:
        for _ in range(n_samples):
            arr = backbone.copy()
            sites = rng.choice(covered, size=n_sites, replace=False)
            arr[sites] = (arr[sites] + rng.integers(1, 4, size=len(sites))) % 4
            seqs.append((bases[arr].tobytes().decode("latin-1"), "+"))
        return seqs
    sites = rng.choice(covered, size=n_sites, replace=False)
    site_alt = (backbone[sites] + rng.integers(1, 4, size=len(sites))) % 4
    for _ in range(n_samples):
        arr = backbone.copy()
        carry = rng.random(len(sites)) < 0.5
        arr[sites[carry]] = site_alt[carry]
        seqs.append((bases[arr].tobytes().decode("latin-1"), "+"))
    return seqs


def measure_consensus_sample_genes_per_sec(runner, *, n_samples: int = 445, private: bool = False, repeats: int = 3) -> float:
    """GEUVADIS C18 cohort path
    (pipeline/consensus.py::_predict_consensus_preds), best-of-``repeats``
    (the relay link is shared/noisy; single-shot timing caused the r2
    docs-vs-bench disagreement). ``private=True`` measures the
    dedup-defeating regime so worst-case cohort throughput is bounded."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_preds

    seqs = _consensus_cohort_seqs(n_samples, private=private)
    _predict_consensus_preds(runner, seqs[:8], None, dtype=np.float16)  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        _predict_consensus_preds(runner, seqs, None, dtype=np.float16)
        best = max(best, n_samples / (time.perf_counter() - t0))
    return best


def measure_consensus_featonly_sample_genes_per_sec(
    runner, *, n_samples: int, n_sites: int = 42, repeats: int = 3
) -> float:
    """Features-only C18 cohort path (VERDICT r4 #1,
    pipeline/consensus.py::_predict_consensus_features_cohort): no chromatin
    fetch/store — decay features projected on device (~40 KB/sample fp16 wire
    instead of the 782 KB/sample full-track fetch), backbone conv6 patching
    when the cohort's diff density allows (n_sites<=~20 after range
    merging). Private (dedup-defeating) cohort composition so the number is
    directly comparable to consensus_private_sample_genes_per_sec."""
    from expecto_tpu.pipeline.consensus import _predict_consensus_features_cohort

    seqs = _consensus_cohort_seqs(n_samples, private=True, n_sites=n_sites)
    _predict_consensus_features_cohort(runner, seqs[:8], None)  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        _predict_consensus_features_cohort(runner, seqs, None)
        best = max(best, n_samples / (time.perf_counter() - t0))
    return best


def measure_train_ms_per_round(*, n: int = 18000, f: int = 20020, k: int = 256, rounds: int = 10) -> float:
    """Training throughput at the production shape (18k genes x 20,020
    features x 256 simultaneous models, fp32-HIGHEST parity precision):
    warm ms per boosting round of the vectorized multi-model trainer
    (models/gblinear.py::train_gblinear_multi's jitted round). Recorded so
    the docs' training-perf claim is a reproducible driver artifact
    (VERDICT r2 #6)."""
    import jax
    import jax.numpy as jnp

    from expecto_tpu.models.gblinear import GBLinearParams, _multi_round_body, _pad_blocks

    hp = GBLinearParams(num_round=1)
    rng = np.random.default_rng(5)
    X = rng.normal(size=(n, f)).astype(np.float32)
    Y = rng.normal(size=(n, k)).astype(np.float32) + 2.0

    Xt_blocks, _ = _pad_blocks(np.ascontiguousarray(X.T), hp.block_size)
    jit_round = jax.jit(_multi_round_body(hp), donate_argnums=(0, 2))
    Xt_dev = jax.device_put(Xt_blocks)
    rw = jnp.ones((n, k), jnp.float32)
    prec = jax.lax.Precision(hp.precision)
    hess = jax.jit(lambda Xt, w: jax.lax.map(lambda Xb: jnp.dot(Xb * Xb, w, precision=prec), Xt))(Xt_dev, rw)
    n_eff = jnp.full((k,), float(n), jnp.float32)
    w_blocks = jnp.zeros((Xt_blocks.shape[0], Xt_blocks.shape[1], k), jnp.float32)
    bias = jnp.zeros((k,), jnp.float32)
    r = jnp.asarray(np.full((n, k), hp.base_score, np.float32) - Y)

    for _ in range(3):  # warm: compile + first executions
        w_blocks, bias, r = jit_round(w_blocks, bias, r, rw, n_eff, Xt_dev, hess)
    np.asarray(bias)  # force completion through the relay
    t0 = time.perf_counter()
    for _ in range(rounds):
        w_blocks, bias, r = jit_round(w_blocks, bias, r, rw, n_eff, Xt_dev, hess)
    np.asarray(bias)
    return (time.perf_counter() - t0) / rounds * 1000.0


def measure_cpu_torch_windows_per_sec(state_dict, *, batch: int = 32, n_windows: int = 96, repeats: int = 3) -> float:
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
        best = float("inf")
        for _ in range(repeats):  # best-of-N: one scheduler hiccup otherwise
            t0 = time.perf_counter()  # poisons the cached baseline forever
            for i in range(0, n_windows, batch):
                net(x[i : i + batch])
            best = min(best, time.perf_counter() - t0)
    return n_windows / best


_RESULT_PRINTED = False
_PATHS: dict = {}
#: link-phase indicator measured at bench start (VERDICT r4 #3): committed
#: BENCH_r*.json numbers are only comparable round-over-round when their
#: relay_probe blocks agree — see docs/ARCHITECTURE.md "Reading relay_probe"
_RELAY_PROBE: dict | None = None
#: (value, vs_baseline) of the completed primary measurement; the watchdog
#: emits THIS when a secondary path stalls past the budget — discarding an
#: already-measured primary for the 80.0 floor would report a false
#: regression (ADVICE r2)
_PRIMARY: tuple | None = None


def _emit(value: float, vs_baseline: float, *, watchdog_fallback: bool = False) -> None:
    global _RESULT_PRINTED
    if _RESULT_PRINTED:
        return
    _RESULT_PRINTED = True
    record = {
        "metric": "variants_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "variants/s",
        "vs_baseline": round(vs_baseline, 2),
    }
    if _PATHS:
        record["paths"] = {k: round(v, 3) for k, v in _PATHS.items()}
    if _RELAY_PROBE is not None:
        record["relay_probe"] = _RELAY_PROBE
    if watchdog_fallback:
        # a stalled run emits the conservative FLOOR, clearly marked — never
        # a previous run's cached number (a replayed value looks fresh and
        # silently hides a regression)
        record["watchdog_fallback"] = True
    print(json.dumps(record), flush=True)


def _arm_watchdog(seconds: float) -> None:
    """If the relay stalls mid-measurement, emit a conservative floor (plus
    whatever path numbers completed) and exit so the driver always gets its
    one JSON line. Never replays a cached previous result."""
    import threading

    def fire():
        if _PRIMARY is not None:
            _emit(_PRIMARY[0], _PRIMARY[1], watchdog_fallback=True)
        else:
            _emit(80.0, 150.0, watchdog_fallback=True)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def main() -> None:
    # persistent compile cache: the span kernels take minutes to compile via
    # the remote-compile relay; cache them across bench invocations
    os.environ.setdefault("EXPECTO_TPU_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    from expecto_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from torch_oracle import TorchBeluga

    from expecto_tpu.models.convert import state_dict_to_params

    torch.manual_seed(0)
    state_dict = TorchBeluga().eval().state_dict_reference_keys()
    params = state_dict_to_params(state_dict)

    import jax

    platform = jax.devices()[0].platform
    _arm_watchdog(_BUDGET)
    on_chip = platform != "cpu"
    n_variants = 3072 if on_chip else 4

    # stamp the link phase FIRST (~10 s): every number below is only
    # comparable across rounds relative to this block
    global _RELAY_PROBE
    try:
        from expecto_tpu.utils.relay_probe import probe

        _RELAY_PROBE = probe(block_mb=16 if on_chip else 1)
    except Exception as e:  # a failed probe must not sink the bench
        print(f"# relay probe failed: {e!r}", file=sys.stderr)

    runner = _make_runner(params, batch_size=2048)
    work = _variant_workload(n_variants, 800, 218)
    tpu_vps = measure_tpu_variants_per_sec(runner, work, n_variants=n_variants)

    # resolve the CPU baseline right after the primary so the watchdog can
    # emit the real (value, ratio) pair if a secondary path stalls
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cpu_wps = json.load(f)["cpu_windows_per_sec"]
    else:
        cpu_wps = measure_cpu_torch_windows_per_sec(state_dict)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_windows_per_sec": cpu_wps}, f)
    baseline = cpu_wps / WINDOWS_PER_VARIANT
    global _PRIMARY
    _PRIMARY = (tpu_vps, tpu_vps / baseline)

    # secondary paths, each time-boxed so the primary number always lands
    # within the driver's window; a skipped path is simply absent
    try:
        if _remaining() > 120:
            ceil = measure_compute_ceiling(runner, work)
            if np.isfinite(ceil):  # NaN (too few rows on the cpu smoke) is not JSON
                _PATHS["compute_ceiling_variants_per_sec"] = ceil
        # shared span-workload runner (batch 3200 = 16 gene spans/call): the
        # gene-features and features-only consensus paths all run 41.8 kb
        # spans, where the serving runner's batch (rows of 10) underfills
        # the chip
        runner_spans = None
        if _remaining() > 240:
            runner_spans = _make_runner(params, batch_size=3200)
            _PATHS["genes_per_sec"] = measure_gene_features_per_sec(
                runner_spans, n_genes=256 if on_chip else 2
            )
        if _remaining() > 120:
            _PATHS["indel_variants_per_sec"] = measure_indel_serving_variants_per_sec(
                runner, work, n_variants=1536 if on_chip else 2
            )
        if _remaining() > 180:
            _PATHS["indel_h5_variants_per_sec"] = measure_h5_pipeline_variants_per_sec(
                runner, n_variants=512 if on_chip else 2, variant_class="indel",
                repeats=3 if on_chip else 1,
            )
        if _remaining() > 120:
            _PATHS["sub_h5_variants_per_sec"] = measure_h5_pipeline_variants_per_sec(
                runner, n_variants=512 if on_chip else 2, variant_class="sub",
                repeats=3 if on_chip else 1,
            )
        if _remaining() > 120:
            # write-inclusive: the streaming path lands real h5 files on
            # disk, writes overlapped with compute/fetch (r4)
            _PATHS["sub_h5_write_variants_per_sec"] = measure_h5_pipeline_variants_per_sec(
                runner, n_variants=512 if on_chip else 2, variant_class="sub",
                repeats=2 if on_chip else 1, write_h5=True,
            )
        if _remaining() > 120:
            # original-ExPecto 'pred'-format writer (diff-only wire, r5):
            # half the fetch of the full diff/ref/alt contract
            _PATHS["legacy_h5_write_variants_per_sec"] = measure_h5_pipeline_variants_per_sec(
                runner, n_variants=512 if on_chip else 2, variant_class="sub",
                repeats=2 if on_chip else 1, write_h5=True, legacy_only=True,
            )
        if _remaining() > 240:
            _PATHS["consensus_sample_genes_per_sec"] = measure_consensus_sample_genes_per_sec(
                runner, n_samples=445 if on_chip else 6
            )
        if _remaining() > 180:
            # dedup-defeating regime (private variant positions): bounds
            # worst-case cohort throughput (VERDICT r2 weak #5)
            _PATHS["consensus_private_sample_genes_per_sec"] = measure_consensus_sample_genes_per_sec(
                runner, n_samples=64 if on_chip else 4, private=True, repeats=3
            )
        if _remaining() > 180:
            # features-only C18 on the SAME adversarial cohort: the fetch
            # wall is gone, so the private regime is compute-bound (r4 #1)
            _PATHS["consensus_private_featonly_sample_genes_per_sec"] = (
                measure_consensus_featonly_sample_genes_per_sec(
                    runner_spans or runner, n_samples=64 if on_chip else 4, n_sites=42
                )
            )
        if _remaining() > 150:
            # realistic singleton density (a handful of private sites per
            # 42 kb): the backbone conv6-patch kernel engages here
            _PATHS["consensus_sparse_private_featonly_sample_genes_per_sec"] = (
                measure_consensus_featonly_sample_genes_per_sec(
                    runner_spans or runner, n_samples=64 if on_chip else 4, n_sites=4
                )
            )
        if _remaining() > 240:
            _PATHS["train_ms_per_round_256models"] = measure_train_ms_per_round(
                k=256 if on_chip else 4, n=18000 if on_chip else 64, f=20020 if on_chip else 128,
                rounds=10 if on_chip else 2,
            )
    except Exception as e:  # a failed secondary must not sink the primary
        _PATHS["path_error"] = 0.0
        print(f"# secondary path failed: {e!r}", file=sys.stderr)

    _emit(tpu_vps, tpu_vps / baseline)


if __name__ == "__main__":
    main()
