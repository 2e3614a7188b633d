from .beluga import (
    BelugaParams,
    beluga_forward,
    beluga_apply,
    init_beluga_params,
    BELUGA_INPUT_LEN,
    BELUGA_N_TRACKS,
)
from .gblinear import GBLinearModel, GBLinearParams, train_gblinear, predict_gblinear

__all__ = [
    "BelugaParams",
    "beluga_forward",
    "beluga_apply",
    "init_beluga_params",
    "BELUGA_INPUT_LEN",
    "BELUGA_N_TRACKS",
    "GBLinearModel",
    "GBLinearParams",
    "train_gblinear",
    "predict_gblinear",
]
