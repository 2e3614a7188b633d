"""CLI: per-gene feature regeneration (reference
compute_expecto_features.py / replicate_expecto_features.py flags)."""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Compute ExPecto chromatin features for a TSS list")
    p.add_argument("annoFile", help="geneanno.csv")
    p.add_argument("--tss_file", default=None, help="optional hg38 TSS override table (liftover via --chain_file)")
    p.add_argument("--chain_file", default=None)
    p.add_argument("--windowsize", type=int, default=2000)
    p.add_argument("--genome", type=str, default="./resources/hg19.fa")
    p.add_argument("--beluga_weights", type=str, default="./resources/deepsea.beluga.npz")
    p.add_argument("--batchsize", type=int, default=3200,
                   help="windows-equivalent device batch (16 gene spans of 200 shifts)")
    p.add_argument("--replicate_raw", action="store_true",
                   help="save raw per-gene (200, 2002) predictions instead of projected features "
                        "(replicate_expecto_features.py behavior)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--atac_peaks", default=None,
                   help="ATAC peak BED: multiply predicted ChIP tracks by the binary "
                        "peak-bin mask before projection (expecto_intersect_chip_atac.py)")
    p.add_argument("--belugaFeatures", default=None, help="required with --atac_peaks")
    p.add_argument("--atac_tf_only", action="store_true",
                   help="mask only TF tracks (default: TF + Histone; expecto_intersect_chip_atac.py:46-48)")
    p.add_argument("-o", dest="out_dir", type=str, default="temp_compute_expecto_features")
    p.add_argument("--cuda", action="store_true", help="ignored; CLI parity")
    return p


def main(argv=None) -> int:
    import jax.numpy as jnp
    import pandas as pd

    from ..genome.fasta import FastaIndex
    from ..models.convert import load_params_npz
    from ..parallel.mesh import maybe_initialize_distributed
    from ..parallel.runner import BelugaRunner
    from ..pipeline.features import (
        compute_gene_features,
        replicate_gene_features,
        records_from_geneanno,
    )

    # multi-host: join the process group before the first backend use; each
    # host then computes its host_row_range gene slice (pipeline/features.py)
    maybe_initialize_distributed()

    args = build_parser().parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    genome = FastaIndex(args.genome)
    geneanno = pd.read_csv(args.annoFile)

    if args.tss_file:
        # hg38 TSS override with liftover, keeping the annotated TSS when no
        # mapping exists (compute_expecto_features.py:43-72)
        if not args.chain_file:
            print("--tss_file requires --chain_file", file=sys.stderr)
            return 2
        from ..genome.liftover import ChainLiftover

        converter = ChainLiftover(args.chain_file)
        tss_df = pd.read_csv(args.tss_file, sep="\t", index_col=0).set_index("ens_id")
        overrides = {}
        for gene_id, row in tss_df.iterrows():
            coords = converter.convert_coordinate(str(row.iloc[0]), int(row.iloc[1]))
            is_default = bool(row.iloc[-1])
            if coords and not is_default:
                overrides[gene_id] = (coords[0][0], coords[0][1])
        geneanno = geneanno.copy()
        for i, row in geneanno.iterrows():
            if row["id"] in overrides:
                chrom, tss = overrides[row["id"]]
                geneanno.loc[i, "seqnames"] = chrom
                geneanno.loc[i, "CAGE_representative_TSS"] = tss

    genes = records_from_geneanno(geneanno)
    params = load_params_npz(args.beluga_weights)
    import numpy as _np

    runner = BelugaRunner(
        params, batch_size=args.batchsize,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        # bf16 production mode also fetches features/preds over an fp16
        # wire (~5e-4 relative rounding, host/output arrays stay fp32)
        out_dtype=_np.float16 if args.bf16 else _np.float32,
        pipeline_depth=6,
    )

    if args.atac_peaks:
        import numpy as np

        from ..analysis.atac import load_peaks_bed
        from ..io.tables import load_beluga_features
        from ..pipeline.features import compute_gene_features_atac

        if not args.belugaFeatures:
            print("--atac_peaks requires --belugaFeatures", file=sys.stderr)
            return 2
        features_df = load_beluga_features(args.belugaFeatures)
        if args.atac_tf_only:
            chip_idx = np.where(features_df["Assay type"] == "TF")[0]
        else:
            chip_idx = np.where(features_df["Assay type"].isin(["TF", "Histone"]))[0]
        peaks_by_chrom = load_peaks_bed(args.atac_peaks)
        compute_gene_features_atac(
            genes, genome, runner, peaks_by_chrom, chip_idx,
            windowsize=args.windowsize,
            out_path=os.path.join(args.out_dir, "Xreducedall.2002.atac_x_chip"),
            progress=True,
        )
    elif args.replicate_raw:
        replicate_gene_features(genes, genome, runner, windowsize=args.windowsize, out_dir=args.out_dir)
    else:
        compute_gene_features(
            genes, genome, runner, windowsize=args.windowsize,
            out_path=os.path.join(args.out_dir, "Xreducedall.2002.representative_tss_top"),
            progress=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
