from .h5 import write_shift_h5, read_shift_h5, read_shift_h5_averaged
from .xgb import (
    save_xgb07_binary,
    load_xgb07_binary,
    dump_text,
    parse_dump_text,
    load_expression_model,
    save_expression_model,
)
from .tables import load_geneanno, load_beluga_features, load_modellist, load_closest_genes

__all__ = [
    "write_shift_h5",
    "read_shift_h5",
    "read_shift_h5_averaged",
    "save_xgb07_binary",
    "load_xgb07_binary",
    "dump_text",
    "parse_dump_text",
    "load_expression_model",
    "save_expression_model",
    "load_geneanno",
    "load_beluga_features",
    "load_modellist",
    "load_closest_genes",
]
