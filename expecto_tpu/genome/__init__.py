from .encode import (
    BASE_CODES,
    N_CODE,
    encode_seqs,
    seqs_to_codes,
    codes_to_onehot,
    reverse_complement_codes,
    center_crop_slice,
)
from .fasta import FastaIndex
from .vcf import read_vcf, standardize_chroms, write_vcf_hg19, CHRS
from .windows import fetch_variant_window, gene_shift_window_bounds, variant_shifts

__all__ = [
    "BASE_CODES",
    "N_CODE",
    "encode_seqs",
    "seqs_to_codes",
    "codes_to_onehot",
    "reverse_complement_codes",
    "center_crop_slice",
    "FastaIndex",
    "read_vcf",
    "standardize_chroms",
    "write_vcf_hg19",
    "CHRS",
    "fetch_variant_window",
    "gene_shift_window_bounds",
    "variant_shifts",
]
