"""Chunk-merge and compression utilities (reference merge_predict_batched.py,
merge_geuvadis_predict_consensus.py, merge_query_fimo_for_predictions.py,
compress_consensus.py).

These exist for file-level parity with cluster runs that chunk work across
jobs; the in-memory TPU path doesn't need them (collectives replace the
filesystem), but sharded multi-host runs still write per-shard files that
these mergers combine deterministically (natural-sort order + count asserts,
merge_predict_batched.py:23).
"""

from __future__ import annotations

import glob
import os
import re
from pathlib import Path

import h5py
import numpy as np
import pandas as pd


def natsorted(items):
    """Natural sort (replacement for the natsort dependency)."""

    def key(s):
        return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", str(s))]

    return sorted(items, key=key)


def merge_sed_batches(batch_dir: str, out_dir: str, n_chunks: int | None = None) -> pd.DataFrame:
    """Concatenate chunked sed.tsv outputs (merge_predict_batched.py:10-30)."""
    os.makedirs(out_dir, exist_ok=True)
    sed_files = natsorted(glob.glob(f"{batch_dir}/*/sed.tsv"))
    if n_chunks is not None and len(sed_files) != n_chunks:
        raise AssertionError(f"Expected {n_chunks} chunks but got {len(sed_files)} sed files")
    sed_df = pd.concat([pd.read_csv(f, sep="\t") for f in sed_files])
    # index=True (a repeating per-chunk RangeIndex as the first column) is
    # exactly what the reference merger emits (merge_predict_batched.py:27);
    # kept for byte-level output parity even though per-chunk sed.tsv files
    # are written index=False
    sed_df.to_csv(f"{out_dir}/sed.tsv", sep="\t")
    return sed_df


def parse_record_id(x) -> str:
    """'chr19:...|NA20828|-|1pIu' -> 'NA20828|1pIu'
    (merge_geuvadis_predict_consensus.py:45-51)."""
    x = x.decode("utf-8") if isinstance(x, bytes) else str(x)
    parts = x.split("|")
    return f"{parts[1]}|{parts[3]}"


def merge_consensus_batches(batch_dir: str, out_dir: str, n_genes: int | None = None) -> None:
    """Stack per-gene consensus h5s with record-id consistency checks
    (merge_geuvadis_predict_consensus.py:12-44)."""
    os.makedirs(out_dir, exist_ok=True)
    # exclude the per-gene *_chromatin.h5 siblings that predict_consensus_genes
    # writes next to {gene}.h5 (the reference's bare */*.h5 glob predates them)
    h5_files = natsorted(
        p for p in glob.glob(f"{batch_dir}/*/*.h5") if not p.endswith("_chromatin.h5")
    )
    if n_genes is not None and len(h5_files) != n_genes:
        raise AssertionError(f"Expected {n_genes} genes but got {len(h5_files)} h5 files")
    record_ids = None
    preds = []
    for h5_file in h5_files:
        with h5py.File(h5_file, "r") as f:
            curr = np.array([parse_record_id(x) for x in f["record_ids"]])
            if record_ids is None:
                record_ids = curr
            elif not (record_ids == curr).all():
                raise AssertionError(f"record id mismatch in {h5_file}")
            # 'preds' = top-eqtl layout; 'expecto_preds' = main consensus layout
            name = "preds" if "preds" in f else "expecto_preds"
            preds.append(np.array(f[name]))
    genes = [Path(x).stem for x in h5_files]
    with h5py.File(f"{out_dir}/expecto_preds.h5", "w") as f:
        f.create_dataset("record_ids", data=np.array(record_ids, "S"))
        f.create_dataset("genes", data=np.array(genes, "S"))
        f.create_dataset("preds", data=np.stack(preds))


def compress_h5_tree(
    preds_dir: str,
    out_dir: str,
    *,
    num_chunks: int | None = None,
    chunk_i: int | None = None,
    delete_original: bool = True,
) -> list[str]:
    """float16 + gzip-9 recompression of consensus prediction h5s
    (compress_consensus.py:12-69). Returns the output paths.

    The reference hard-codes the dataset names of the basenji tree it
    targets (``preds``/``record_ids``/``all_preds``); this engine's own
    consensus trees carry other names (``expecto_preds``,
    ``chromatin_preds``, ``ref_preds``/``alt_preds``, plus ``seqs`` string
    sidecars), so the compressor is dataset-generic: every float dataset is
    rewritten float16 + gzip-9 and every non-float dataset is copied
    verbatim — nothing is dropped before the original is deleted."""
    if (num_chunks is None) != (chunk_i is None):
        raise ValueError("num_chunks and chunk_i must be passed together")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    center_files = natsorted(glob.glob(f"{preds_dir}/*/*.h5"))
    if num_chunks is not None:
        center_files = list(np.array_split(np.array(center_files, dtype=object), num_chunks)[chunk_i])
    for path in center_files:
        sub = f"{out_dir}/{Path(path).parent.name}"
        os.makedirs(sub, exist_ok=True)
        out_file = f"{sub}/{Path(path).name}"
        if os.path.abspath(out_file) == os.path.abspath(path):
            raise ValueError(f"compress out_dir would overwrite its own input in place: {path}")
        with h5py.File(path, "r") as f, h5py.File(out_file, "w") as fo:
            for name in f:
                data = f[name][...]
                if np.issubdtype(data.dtype, np.floating):
                    fo.create_dataset(name, data=data.astype(np.float16), compression="gzip", compression_opts=9)
                else:
                    fo.create_dataset(name, data=data)
        if delete_original:
            os.remove(path)
        written.append(out_file)
    return written


def merge_fimo_batches(batch_dir: str, out_dir: str, n_chunks: int | None = None) -> pd.DataFrame:
    """Concatenate chunked FIMO query outputs
    (merge_query_fimo_for_predictions.py:10-29)."""
    os.makedirs(out_dir, exist_ok=True)
    files = natsorted(glob.glob(f"{batch_dir}/*/fimo_results.tsv"))
    if n_chunks is not None and len(files) != n_chunks:
        raise AssertionError(f"Expected {n_chunks} chunks but got {len(files)} fimo files")
    df = pd.concat([pd.read_csv(f, sep="\t") for f in files])
    df.to_csv(f"{out_dir}/fimo_results.tsv", sep="\t", index=False)
    return df
