"""CLI: variant chromatin effects (reference chromatin.py flags).

Example:
    python -m expecto_tpu.cli.chromatin ./example/example.vcf \
        --beluga_weights ./resources/beluga.npz --genome ./resources/hg19.fa
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict variant chromatin effects")
    p.add_argument("inputfile", type=str, help="Input file in vcf format")
    p.add_argument("--hg38", action="store_true", help="Lift variants from hg38 to hg19 (requires --chain_file)")
    p.add_argument("--chain_file", type=str, default=None, help="UCSC hg38->hg19 over.chain[.gz] for --hg38")
    p.add_argument("--strict_liftover", action="store_true",
                   help="reference-parity liftover: abort when a position has multiple chain "
                        "mappings (chromatin.py:128) instead of taking the top-scoring chain")
    p.add_argument("--chunk_size", type=int, default=int(1e5))
    p.add_argument("--chunk_i", type=int, default=None)
    p.add_argument("--maxshift", type=int, default=800)
    p.add_argument("--inputsize", type=int, default=2000)
    p.add_argument("--batchsize", type=int, default=1024)
    p.add_argument("--output_dir", type=str, default="chromatin_out")
    p.add_argument("--legacy_h5", action="store_true",
                   help="also write original-ExPecto single-'pred' h5s alongside the diff/ref/alt schema")
    p.add_argument("--legacy_only", action="store_true",
                   help="write ONLY the original-ExPecto 'pred' h5s (implies --legacy_h5): pred is the "
                        "diff alone, so only diff leaves the device — half the fetch, ~2x throughput on "
                        "relay-attached chips")
    p.add_argument("--genome", type=str, default="./resources/hg19.fa")
    p.add_argument("--beluga_weights", type=str, default="./resources/deepsea.beluga.npz",
                   help="native npz checkpoint (convert .pth via expecto_tpu.models.convert)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (throughput mode)")
    p.add_argument("--cuda", action="store_true", help="ignored (TPU-native); kept for CLI parity")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..genome.fasta import FastaIndex
    from ..genome.vcf import read_vcf, standardize_chroms, write_vcf_hg19
    from ..models.convert import load_params_npz
    from ..parallel import dist
    from ..parallel.mesh import maybe_initialize_distributed
    from ..parallel.runner import BelugaRunner
    from ..pipeline.chromatin import compute_variant_chromatin_effects

    # multi-host: must run before the first backend use (BelugaRunner init);
    # a no-op unless launched under a coordinator (JAX_COORDINATOR_ADDRESS)
    maybe_initialize_distributed()

    genome = FastaIndex(args.genome)
    os.makedirs(args.output_dir, exist_ok=True)
    vcf = read_vcf(args.inputfile, chunk_size=args.chunk_size, chunk_i=args.chunk_i)

    if args.hg38:
        if not args.chain_file:
            print("--hg38 requires --chain_file (no network access for chain download)", file=sys.stderr)
            return 2
        from ..genome.liftover import ChainLiftover, liftover_vcf

        print("Lifting over to hg19...")
        lifted, failed = liftover_vcf(vcf, ChainLiftover(args.chain_file), strict=args.strict_liftover)
        print(f"Failed to lift {int(failed.sum())} variants from hg38 to hg19")
        if dist.is_primary():  # every host holds the full table; one writer
            vcf[failed].to_csv(f"{args.output_dir}/not_lifted.vcf", sep="\t", header=False, index=False)
        vcf = lifted[~failed]

    # standardize BEFORE writing snps_hg19.vcf: the emitted file is the
    # documented --coorFile for the predict step, so its rows must align
    # 1:1 with the per-shift h5s (a non-canonical contig row would desync
    # them). The reference writes pre-standardization (chromatin.py:232-241)
    # — a deliberate divergence.
    n_before = vcf.shape[0]
    std = standardize_chroms(vcf)
    if std.shape[0] != n_before:
        # rows on non-canonical contigs leave the pipeline here — quarantine
        # them like liftover failures so input/output row counts reconcile
        if dist.is_primary():
            dropped = vcf[~vcf.index.isin(std.index)]
            dropped.to_csv(f"{args.output_dir}/dropped_contigs.vcf", sep="\t", header=False, index=False)
            print(f"Dropped {n_before - std.shape[0]} variants on non-canonical contigs "
                  f"(written to {args.output_dir}/dropped_contigs.vcf)")
    vcf = std
    if dist.is_primary():
        write_vcf_hg19(vcf, f"{args.output_dir}/snps_hg19.vcf")

    import numpy as np

    params = load_params_npz(args.beluga_weights)
    runner = BelugaRunner(
        params,
        batch_size=args.batchsize,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        precision=jax.lax.Precision.DEFAULT if args.bf16 else jax.lax.Precision.HIGHEST,
        # --bf16 rides the fp16 wire safely since r4: the span path's
        # diff = alt - ref is computed in fp32 ON DEVICE (pair-diff kernel,
        # runner.predict_span_pairs_diff) before the fp16 cast, so diff
        # keeps its relative precision through the fetch and the host
        # reconstructs alt = ref + diff in fp32. The r3 hazard — host-side
        # differencing of independently fp16-rounded sides burying
        # ~1e-3-scale effects — no longer applies (the per-window fallback
        # rows force an fp32 wire inside _run_window_path). The fetch is
        # this path's bottleneck (~60 MB/s aggregate relay bandwidth,
        # scripts/probe_relay.py), so halving the wire directly raises
        # variants/s. Parity (non-bf16) mode keeps fp32 end to end.
        out_dtype=np.float16 if args.bf16 else np.float32,
    )
    compute_variant_chromatin_effects(
        vcf, genome, runner, args.output_dir, maxshift=args.maxshift, inputsize=args.inputsize,
        legacy_h5=args.legacy_h5,
        legacy_only=args.legacy_only,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
