"""Per-SNP/TSS bin extraction from consensus prediction h5s (reference
extract_lymphoblastoid_consensus_preds.py:16-250): maps genomic positions to
ExPecto shift-window bins or Basenji 128-bp output bins."""

from __future__ import annotations

import numpy as np

from ..genome.windows import gene_shifts


def get_snp_bin(snp_pos: int, tss_pos: int, strand: str, model: str = "expecto") -> int:
    """Bin index containing a SNP (extract_lymphoblastoid_consensus_preds.py
    :183-247).

    - 'expecto': first shift window whose [start, end) contains the SNP's
      TSS-relative position (2,000-bp windows at 200 shifts).
    - 'basenji': 128-bp bins over a 131,072-bp window with 896-bin center
      crop arithmetic.
    """
    if model == "expecto":
        windowsize = 2000
        s = {"+": 1, "-": -1}[strand]
        snp_rel_pos = snp_pos - tss_pos
        for i, shift in enumerate(gene_shifts()):
            bin_start = (shift * s) - int(windowsize / 2 - 1)
            bin_end = (shift * s) + int(windowsize / 2) + 1
            if bin_start <= snp_rel_pos < bin_end:
                return i
        raise AssertionError(f"SNP position {snp_pos} not found in any bin")

    if model == "basenji":
        seq_len, bin_resolution, num_bins, cropped_bins = 131072, 128, 1024, 896
        tss_index = seq_len // 2 - 1 if strand == "+" else seq_len // 2
        snp_index = tss_index + (snp_pos - tss_pos)
        if snp_index < 0 or snp_index >= seq_len:
            raise AssertionError(f"SNP index {snp_index} is out of the input sequence")
        snp_bin = snp_index // bin_resolution
        snp_bin_cropped = snp_bin - (num_bins - cropped_bins) // 2
        if snp_bin_cropped < 0 or snp_bin_cropped >= cropped_bins:
            raise AssertionError(f"SNP bin index {snp_bin_cropped} is out of the cropped output")
        return int(snp_bin_cropped)

    raise AssertionError(f"model {model} not recognized")


def extract_bins(chromatin_preds: np.ndarray, center_bin: int, flank: int = 50) -> np.ndarray:
    """Slice +-flank bins around a center bin, clipped to the array
    (extract path of extract_lymphoblastoid_consensus_preds.py)."""
    lo = max(center_bin - flank, 0)
    hi = min(center_bin + flank + 1, chromatin_preds.shape[-2])
    return chromatin_preds[..., lo:hi, :]


def extract_consensus_track_bins(
    chromatin_h5_path: str,
    snp_pos: int,
    tss_pos: int,
    strand: str,
    track_indices,
    *,
    out_h5_path: str | None = None,
    flank: int = 50,
    model: str = "expecto",
):
    """Extract selected tracks at the SNP bin, TSS bin, and +-flank bins from
    a per-gene consensus chromatin h5 (the ExPecto branch of reference
    extract_lymphoblastoid_consensus_preds.py:16-180).

    Input h5: ``chromatin_preds`` (n_samples, n_bins, n_tracks) +
    ``record_ids`` as written by predict_consensus_genes. Returns a dict and
    optionally writes it as an h5.
    """
    import h5py

    track_indices = np.asarray(track_indices)
    with h5py.File(chromatin_h5_path, "r") as f:
        preds = np.asarray(f["chromatin_preds"])
        record_ids = np.asarray(f["record_ids"])

    snp_bin = get_snp_bin(snp_pos, tss_pos, strand, model)
    tss_bin = get_snp_bin(tss_pos, tss_pos, strand, model)
    out = {
        "snp_bin": snp_bin,
        "tss_bin": tss_bin,
        "snp_bin_preds": preds[:, snp_bin][:, track_indices],
        "tss_bin_preds": preds[:, tss_bin][:, track_indices],
        "flank_preds": extract_bins(preds, snp_bin, flank)[..., track_indices],
        "record_ids": record_ids,
    }
    if out_h5_path is not None:
        with h5py.File(out_h5_path, "w") as f:
            for k, v in out.items():
                if k in ("snp_bin", "tss_bin"):
                    f.attrs[k] = v
                else:
                    f.create_dataset(k, data=v)
    return out
