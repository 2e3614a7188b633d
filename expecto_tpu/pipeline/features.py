"""Gene-level feature computation (reference compute_expecto_features.py,
hot path #2, and replicate_expecto_features.py).

Per gene: 200 strand-oriented 2,000-bp windows at shifts
range(-20000, 20000, 200) around the representative TSS, Beluga forward with
on-device forward/RC averaging, then the (no-floor) decay projection into
20,020 features.

TPU-first restructuring: a gene's 200 windows overlap by 90% (200-bp stride
on 2,000-bp windows), so the host fetches one contiguous ~42-kb sequence per
gene and builds the 200 window views as slices of the code array — 10x less
host-side encoding than the reference's per-window fetch loop
(compute_expecto_features.py:107-111). Windows for many genes stream through
the fixed-shape sharded runner back to back.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..genome.encode import N_CODE, _BYTE_LUT
from ..genome.fasta import FastaIndex
from ..genome.windows import gene_shifts, gene_shift_window_bounds
from ..ops.decay import gene_pos_weights, project_features
from ..parallel.runner import BelugaRunner


def gene_window_codes(
    genome: FastaIndex,
    chrom: str,
    tss: int,
    strand: int,
    *,
    windowsize: int = 2000,
    shifts: list[int] | None = None,
) -> np.ndarray:
    """(n_shifts, windowsize) int8 codes for one gene's shift windows.

    Equivalent to per-shift ``genome.sequence`` fetches with the reference
    window math (compute_expecto_features.py:108-110), but via one contiguous
    fetch + strided slicing. Out-of-contig regions encode as N (zero one-hot).
    """
    shifts = gene_shifts() if shifts is None else shifts
    bounds = [gene_shift_window_bounds(tss, strand, s, windowsize) for s in shifts]
    lo = min(b[0] for b in bounds)
    hi = max(b[1] for b in bounds)

    span = np.full(hi - lo + 1, N_CODE, dtype=np.int8)
    raw = genome.sequence_bytes(chrom, lo, hi)
    clamp_lo = max(lo, 1)
    span[clamp_lo - lo : clamp_lo - lo + len(raw)] = _BYTE_LUT[np.frombuffer(raw, dtype=np.uint8)]

    out = np.empty((len(shifts), windowsize), dtype=np.int8)
    for i, (start, _stop) in enumerate(bounds):
        off = start - lo
        out[i] = span[off : off + windowsize]
    return out


@dataclass
class GeneRecord:
    gene_id: str
    chrom: str
    tss: int
    strand: int  # +1 / -1


def records_from_geneanno(geneanno: pd.DataFrame, tss_col: str = "CAGE_representative_TSS") -> list[GeneRecord]:
    return [
        GeneRecord(
            gene_id=row["id"],
            chrom=row["seqnames"],
            tss=int(row[tss_col]),
            strand=1 if row["strand"] == "+" else -1,
        )
        for _, row in geneanno.iterrows()
    ]


def gene_span_and_offsets(
    genome: FastaIndex,
    chrom: str,
    tss: int,
    strand: int,
    *,
    windowsize: int = 2000,
    shifts: list[int] | None = None,
):
    """(span_codes, window offsets) for one gene — the raw material of the
    span-amortized forward (ops/spans.py). Window at offsets[i] ==
    gene_shift_window_bounds(tss, strand, shifts[i])."""
    shifts = gene_shifts() if shifts is None else shifts
    starts = [gene_shift_window_bounds(tss, strand, s, windowsize)[0] for s in shifts]
    lo = min(starts)
    span_len = max(starts) - lo + windowsize
    span = genome.window_codes(chrom, [lo], span_len)[0]
    return span, tuple(st - lo for st in starts)


def compute_gene_features(
    genes: list[GeneRecord],
    genome: FastaIndex,
    runner: BelugaRunner,
    *,
    windowsize: int = 2000,
    out_path: str | os.PathLike | None = None,
    genes_per_chunk: int | None = None,
    progress: bool = False,
    distribute: bool = True,
) -> np.ndarray:
    """(n_genes, 20020) decay-projected features
    (compute_expecto_features.py:103-128).

    Beluga runs with on-device fwd/RC averaging; multiple genes' windows are
    fused per device batch. On the span path, genes are grouped by strand
    (the only thing the window-offset signature depends on) and streamed
    through one pipelined runner call per group, so span transfers overlap
    with compute instead of draining per chunk.

    In a multi-process run (``distribute=True`` and ``out_path`` set) each
    host computes its ``host_row_range`` gene slice, writes a shard ``.npy``,
    and the primary reassembles the full matrix — replacing the reference's
    per-node chunked reruns of compute_expecto_features.py. All hosts return
    the merged (n_genes, 20020) matrix.
    """
    if distribute and out_path is not None:
        from ..parallel import dist

        _rank, world = dist.process_info()
        if world > 1:
            path = str(out_path)
            if not path.endswith(".npy"):
                path += ".npy"  # np.save appends it; shard naming must agree
            lo, hi = dist.host_row_range(len(genes))
            compute_gene_features(
                genes[lo:hi], genome, runner, windowsize=windowsize,
                out_path=dist.shard_path(path), genes_per_chunk=genes_per_chunk,
                progress=progress and dist.is_primary(), distribute=False,
            )
            dist.barrier("features.shards_written")
            if dist.is_primary():
                dist.merge_sharded_npy(path, delete_shards=True)
            dist.barrier("features.merged")
            return np.load(path)

    shifts = gene_shifts()
    pos_weights = gene_pos_weights(shifts)  # (10, 200)
    n_shifts = len(shifts)
    features = np.empty((len(genes), pos_weights.shape[0] * 2002), dtype=np.float32)

    use_spans = hasattr(runner, "predict_spans_project")
    use_fused = hasattr(runner, "predict_and_project")

    if use_spans:
        if progress:
            from tqdm import tqdm
        # group the full gene list by offsets signature — offset =
        # window_start - min(starts), so the TSS cancels and the signature
        # depends only on strand; grouping needs no genome fetch at all
        order: dict[tuple, list[int]] = {}
        for j, g in enumerate(genes):
            starts = [gene_shift_window_bounds(g.tss, g.strand, s, windowsize)[0] for s in shifts]
            lo = min(starts)
            order.setdefault(tuple(st - lo for st in starts), []).append(j)
        # per-call block: enough device batches to saturate the pipeline
        # while bounding host memory — spans are fetched lazily per block
        # (~42 KB/gene span held at a time, not the whole gene list)
        rows = runner._span_rows(len(shifts)) if hasattr(runner, "_span_rows") else 8
        block = genes_per_chunk or max(rows * getattr(runner, "pipeline_depth", 4) * 4, 64)
        for offsets, idxs in order.items():
            it = range(0, len(idxs), block)
            if progress:
                it = tqdm(list(it), desc=f"offsets group ({len(idxs)} genes)")
            for bstart in it:
                bidx = idxs[bstart : bstart + block]
                rows_arr = np.stack(
                    [
                        gene_span_and_offsets(
                            genome, genes[j].chrom, genes[j].tss, genes[j].strand,
                            windowsize=windowsize, shifts=shifts,
                        )[0]
                        for j in bidx
                    ]
                )
                feats = runner.predict_spans_project(rows_arr, offsets, pos_weights)
                for j, f in zip(bidx, feats):
                    features[j] = f
        if out_path is not None:
            np.save(out_path, features)
        return features

    genes_per_chunk = genes_per_chunk or 8
    iterator = range(0, len(genes), genes_per_chunk)
    if progress:
        from tqdm import tqdm

        iterator = tqdm(list(iterator))
    for start in iterator:
        chunk = genes[start : start + genes_per_chunk]
        codes = np.concatenate(
            [gene_window_codes(genome, g.chrom, g.tss, g.strand, windowsize=windowsize, shifts=shifts) for g in chunk],
            axis=0,
        )
        if use_fused:
            # decay projection fused on device: ships (G, 20020) features
            # instead of (G*200, 2002) raw predictions — 20x less transfer
            features[start : start + len(chunk)] = runner.predict_and_project(codes, pos_weights, n_shifts)
        else:
            preds = runner.predict_codes(codes, average_rc=True)  # (len(chunk)*200, 2002)
            preds = preds.reshape(len(chunk), n_shifts, -1)
            for j in range(len(chunk)):
                features[start + j] = project_features(pos_weights, preds[j][:, None, :])[0]

    if out_path is not None:
        np.save(out_path, features)
    return features


def compute_gene_features_atac(
    genes: list[GeneRecord],
    genome: FastaIndex,
    runner: BelugaRunner,
    peaks_by_chrom: dict,
    chip_track_indices: np.ndarray,
    *,
    windowsize: int = 2000,
    out_path: str | os.PathLike | None = None,
    shifts: list[int] | None = None,
    progress: bool = False,
    distribute: bool = True,
) -> np.ndarray:
    """ATAC x predicted-ChIP intersect features (reference
    expecto_intersect_chip_atac.py:73-107): per gene, the fwd/RC-averaged
    per-shift predictions have their TF/Histone tracks multiplied by the
    binary DeepSEA-style peak-bin mask before the decay projection.

    The mask is identical for forward and RC orientations, so masking the
    on-device average equals the reference's mask-then-average. Multi-process
    runs shard genes per host and merge like :func:`compute_gene_features`.
    """
    if distribute and out_path is not None:
        from ..parallel import dist

        _rank, world = dist.process_info()
        if world > 1:
            path = str(out_path)
            if not path.endswith(".npy"):
                path += ".npy"
            lo, hi = dist.host_row_range(len(genes))
            compute_gene_features_atac(
                genes[lo:hi], genome, runner, peaks_by_chrom, chip_track_indices,
                windowsize=windowsize, out_path=dist.shard_path(path), shifts=shifts,
                progress=progress and dist.is_primary(), distribute=False,
            )
            dist.barrier("features_atac.shards_written")
            if dist.is_primary():
                dist.merge_sharded_npy(path, delete_shards=True)
            dist.barrier("features_atac.merged")
            return np.load(path)

    from ..analysis.atac import get_atac_peak_bins, apply_peak_mask

    shifts = gene_shifts() if shifts is None else shifts
    pos_weights = gene_pos_weights(shifts)
    features = np.empty((len(genes), pos_weights.shape[0] * 2002), dtype=np.float32)

    iterator = enumerate(genes)
    if progress:
        from tqdm import tqdm

        iterator = tqdm(list(iterator))
    for i, g in iterator:
        span, offsets = gene_span_and_offsets(genome, g.chrom, g.tss, g.strand, windowsize=windowsize, shifts=shifts)
        if hasattr(runner, "predict_span_codes"):
            preds = runner.predict_span_codes(span[None], offsets, rc_mode="average")[0].astype(np.float32)
        else:
            codes = gene_window_codes(genome, g.chrom, g.tss, g.strand, windowsize=windowsize, shifts=shifts)
            preds = runner.predict_codes(codes, average_rc=True).astype(np.float32)
        binned = get_atac_peak_bins(g.chrom, g.tss, g.strand, peaks_by_chrom, n_bins=len(shifts))
        preds = apply_peak_mask(preds, binned, chip_track_indices)
        features[i] = project_features(pos_weights, preds[:, None, :])[0]

    if out_path is not None:
        np.save(out_path, features)
    return features


def replicate_gene_features(
    genes: list[GeneRecord],
    genome: FastaIndex,
    runner: BelugaRunner,
    *,
    windowsize: int = 2000,
    out_dir: str | os.PathLike | None = None,
    distribute: bool = True,
) -> dict[str, np.ndarray]:
    """Raw per-gene (200, 2002) fwd/RC-averaged prediction matrices without
    projection (reference replicate_expecto_features.py:16-92), the input to
    SVD/clustering.

    The output is one ``.npy`` per gene, so multi-process runs need no merge:
    each host takes its ``host_row_range`` gene slice and returns only its
    own matrices (the files form the complete set)."""
    if distribute and out_dir is not None:
        from ..parallel import dist

        _rank, world = dist.process_info()
        if world > 1:
            lo, hi = dist.host_row_range(len(genes))
            genes = genes[lo:hi]
    out: dict[str, np.ndarray] = {}
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
    for g in genes:
        codes = gene_window_codes(genome, g.chrom, g.tss, g.strand, windowsize=windowsize)
        # fp32 on disk regardless of the runner's wire dtype (the reference
        # replicator saves fp32 npy; SVD/clustering consumers expect it)
        preds = runner.predict_codes(codes, average_rc=True).astype(np.float32, copy=False)
        out[g.gene_id] = preds
        if out_dir is not None:
            np.save(os.path.join(out_dir, f"{g.gene_id}.npy"), preds)
    return out
