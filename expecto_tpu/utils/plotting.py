"""Plotting helpers (reference C30: train.py:162-184, plot_susztak.py:20-84,
geuvadis plot_preds, plot_data_distributions.py). Matplotlib is imported
lazily with the Agg backend so headless runs work."""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_preds(ytrue, ypred, out_path, *, xlabel="Labels (log RPM)", ylabel="Predictions (log RPM)", title=None):
    """Pred-vs-label scatter with Pearson/R2/Spearman in the title
    (train.py:162-180)."""
    from scipy.stats import pearsonr, spearmanr
    from sklearn.metrics import r2_score

    plt = _plt()
    ytrue = np.asarray(ytrue)
    ypred = np.asarray(ypred)
    fig, ax = plt.subplots()
    ax.scatter(ytrue, ypred, color="black", alpha=0.3, s=20)
    ax.plot([0, 1], [0, 1], c="orange", transform=ax.transAxes)
    ax.set_xlim(np.min(ytrue), np.max(ytrue))
    ax.set_ylim(np.min(ytrue), np.max(ytrue))
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    pr = pearsonr(ytrue, ypred).statistic
    r2 = r2_score(y_true=ytrue, y_pred=ypred)
    sr = spearmanr(ytrue, ypred).statistic
    head = f"{title}\n" if title else ""
    ax.set_title(f"{head}PearsonR: {pr:.3f}, R2: {r2:.3f}, SpearmanR: {sr:.3f}")
    fig.savefig(out_path, dpi=300)
    plt.close(fig)
    return {"pearsonr": float(pr), "r2": float(r2), "spearmanr": float(sr)}


def plot_metric_hist(values, out_path, *, bins=30, xlabel="metric", title=None):
    """Histogram of per-tissue metrics (plot_susztak.py style)."""
    plt = _plt()
    fig, ax = plt.subplots()
    ax.hist(np.asarray(values), bins=bins)
    ax.set_xlabel(xlabel)
    if title:
        ax.set_title(title)
    fig.savefig(out_path, dpi=300)
    plt.close(fig)


def plot_expression_distributions(expression_df, out_path, *, pseudocount=1e-4, log=True):
    """Per-column expression histograms (plot_data_distributions.py:10-60)."""
    plt = _plt()
    cols = [c for c in expression_df.columns if np.issubdtype(expression_df[c].dtype, np.number)]
    fig, axes = plt.subplots(len(cols), 1, figsize=(6, 2.5 * max(len(cols), 1)), squeeze=False)
    for ax, col in zip(axes[:, 0], cols):
        vals = expression_df[col].dropna().values
        if log:
            vals = np.log(vals + pseudocount)
        ax.hist(vals, bins=50)
        ax.set_title(str(col))
    fig.tight_layout()
    fig.savefig(out_path, dpi=200)
    plt.close(fig)
