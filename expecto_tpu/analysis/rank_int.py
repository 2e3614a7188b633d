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
    # work positionally: SED tables are often indexed by gene/SNP id with
    # duplicate labels, where label-based .loc permutation inflates rows and
    # the final reindex raises; positions are always unique (same RNG draws
    # as the label permutation on unique indices, so results are unchanged)
    pos = np.flatnonzero(~pd.isnull(series).values)
    out = np.full(len(series), np.nan)
    if stochastic:
        perm = pos[np.random.permutation(len(pos))]
        rank = ss.rankdata(series.values[perm], method="ordinal")
        out[perm] = rank_to_normal(rank, c=c, n=len(rank))
    else:
        rank = ss.rankdata(series.values[pos], method="average")
        out[pos] = rank_to_normal(rank, c=c, n=len(rank))
    return pd.Series(out, index=series.index)
