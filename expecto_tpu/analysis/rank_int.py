"""Rank-based inverse normal transformation (reference
util/rank_based_inverse_normal_transformation.py:11-61), used to normalize
SED scores per gene. Blom constant c = 3/8; ties broken stochastically with
the reference's fixed seed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.stats as ss


def rank_to_normal(rank, c: float, n: int):
    x = (rank - c) / (n - 2 * c + 1)
    return ss.norm.ppf(x)


def rank_INT(series: pd.Series, c: float = 3.0 / 8, stochastic: bool = True) -> pd.Series:
    """Transform a series to normal via ranks; NaNs pass through as NaN."""
    if not isinstance(series, pd.Series):
        series = pd.Series(series)
    np.random.seed(123)
    orig_idx = series.index
    series = series.loc[~pd.isnull(series)]
    if stochastic:
        series = series.loc[np.random.permutation(series.index)]
        rank = ss.rankdata(series, method="ordinal")
    else:
        rank = ss.rankdata(series, method="average")
    rank = pd.Series(rank, index=series.index)
    transformed = rank_to_normal(rank, c=c, n=len(rank))
    return pd.Series(transformed, index=rank.index).reindex(orig_idx)
