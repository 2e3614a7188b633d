from .chromatin import compute_variant_chromatin_effects
from .sed import score_sed, score_sed_multimodel, load_shift_effects
from .features import compute_gene_features, replicate_gene_features
from .train import train_expression_model, train_bootstrap, train_all_tissues

__all__ = [
    "compute_variant_chromatin_effects",
    "score_sed",
    "score_sed_multimodel",
    "load_shift_effects",
    "compute_gene_features",
    "replicate_gene_features",
    "train_expression_model",
    "train_bootstrap",
    "train_all_tissues",
]
