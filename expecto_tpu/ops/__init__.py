from .decay import (
    DECAY_RATES,
    N_BASIS,
    gene_pos_weights,
    variant_basis,
    project_features,
    pad_legacy_20030,
)

__all__ = [
    "DECAY_RATES",
    "N_BASIS",
    "gene_pos_weights",
    "variant_basis",
    "project_features",
    "pad_legacy_20030",
]
