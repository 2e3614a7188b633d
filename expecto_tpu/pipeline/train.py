"""Expression-model training drivers (reference train.py:83-159,
train_bootstrap.py:88-98, train_susztak.py:87-181).

Shared semantics:
    - features: ``Xreducedall`` (n_genes, 20020), optionally keep-mask
      subset (train.py:122);
    - labels: ``log(expression + pseudocount)``;
    - gene filter: all (!= rRNA) / pc / lincRNA + finite labels;
    - split: train = all chroms except chrX/Y/8, test = chr8
      (train.py:127-129); the susztak variant holds out chr7+chr8 from train
      and validates on chr8 (train_susztak.py:117-122).

The bootstrap and multi-tissue sweeps replace the reference's 1000x shell
loops with in-process loops over the deterministic on-device trainer; the
per-round feature-gradient matmuls batch naturally, and rows shard over the
mesh for multi-host runs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from scipy.stats import spearmanr

from ..models.gblinear import (
    GBLinearModel,
    GBLinearParams,
    train_gblinear,
    train_gblinear_multi,
    train_gblinear_multi_sharded,
    train_gblinear_sharded,
    bootstrap_row_weights,
)
from ..io.xgb import save_expression_model, dump_text
from ..utils.keep_mask import subset_features_by_mask


def gene_filter(geneanno: pd.DataFrame, filter_str: str) -> np.ndarray:
    """'all' (!= rRNA) / 'pc' / 'lincRNA' row filter (train.py:86-93)."""
    gene_type = geneanno.iloc[:, -1]
    if filter_str == "pc":
        return np.asarray(gene_type == "protein_coding")
    if filter_str == "lincRNA":
        return np.asarray(gene_type == "lincRNA")
    if filter_str == "all":
        return np.asarray(gene_type != "rRNA")
    raise ValueError("filterStr has to be one of all, pc, and lincRNA")


def chromosome_split(geneanno: pd.DataFrame, holdout_train: tuple = ("chrX", "chrY", "chr8"), test: str = "chr8"):
    """(train_mask, test_mask) by chromosome (train.py:127-129)."""
    seqnames = geneanno["seqnames"]
    train = np.ones(len(seqnames), dtype=bool)
    for c in holdout_train:
        train &= np.asarray(seqnames != c)
    return train, np.asarray(seqnames == test)


@dataclass
class TrainResult:
    model: GBLinearModel
    spearman: float
    test_pred: np.ndarray
    test_true: np.ndarray
    train_spearman: float | None = None
    train_pred: np.ndarray | None = None
    train_true: np.ndarray | None = None


def train_expression_model(
    Xreducedall: np.ndarray,
    geneanno: pd.DataFrame,
    expression: np.ndarray,
    *,
    filter_str: str = "all",
    pseudocount: float = 1e-4,
    params: GBLinearParams | None = None,
    keep_mask: np.ndarray | None = None,
    n_tracks: int = 2002,
    output_prefix: str | os.PathLike | None = None,
    extra_filter: np.ndarray | None = None,
    seed_resample: int | None = None,
    holdout_train: tuple = ("chrX", "chrY", "chr8"),
    verbose: bool = False,
    distribute: bool = True,
) -> TrainResult:
    """Train one tissue model (reference train.py main).

    ``seed_resample`` draws a bootstrap resample of the training genes with
    replacement (train_bootstrap.py:88-98). ``holdout_train`` is the
    chromosomes excluded from training (train.py:127-129; the susztak sweep
    additionally holds out chr7, train_susztak.py:117-122).

    In a multi-process run each host trains on its ``host_row_range`` slice
    of the training genes via the psum-reduced sharded trainer
    (models/gblinear.py::train_gblinear_sharded); weights are replicated so
    every host computes identical metrics (including the per-round eval
    watchlist — eval sets are replicated), and only the primary writes the
    ``.save``/``.dump`` files. Early stopping never fires either way — the
    reference passes early_stopping_rounds where xgboost ignores it
    (train.py:140-146) — so all ``num_round`` rounds run.
    """
    hp = params or GBLinearParams()
    X = Xreducedall
    if keep_mask is not None:
        X = subset_features_by_mask(X, keep_mask, n_tracks=n_tracks)

    labels = np.log(np.asarray(expression, dtype=np.float64) + pseudocount)
    filt = gene_filter(geneanno, filter_str) & np.isfinite(labels)
    if extra_filter is not None:
        filt &= extra_filter

    trainind, testind = chromosome_split(geneanno, holdout_train=holdout_train)
    tr = trainind & filt
    te = testind & filt

    tr_idx = np.nonzero(tr)[0]
    if seed_resample is not None:
        rs = np.random.RandomState(seed_resample)
        tr_idx = rs.choice(tr_idx, size=tr_idx.shape[0], replace=True)

    X_tr, y_tr = X[tr_idx], labels[tr_idx].astype(np.float32)
    X_te, y_te = X[te], labels[te].astype(np.float32)

    from ..parallel import dist

    _rank, world = dist.process_info()
    if distribute and world > 1:
        # eval sets are replicated on every host (each loads the full
        # feature matrix), so the sharded trainer records the same per-round
        # watchlist as the single-process path (reference train.py:146-154)
        lo, hi = dist.host_row_range(len(tr_idx))
        model = train_gblinear_sharded(
            X_tr[lo:hi], y_tr[lo:hi], hp,
            evals=[(X_te, y_te, "eval"), (X_tr, y_tr, "train")], verbose=verbose,
        )
    else:
        model = train_gblinear(
            X_tr, y_tr, hp, evals=[(X_te, y_te, "eval"), (X_tr, y_tr, "train")], verbose=verbose
        )
    pred_te = model.predict(X_te)
    pred_tr = model.predict(X_tr)
    rho = float(spearmanr(pred_te, y_te).statistic) if len(y_te) > 1 else float("nan")
    rho_tr = float(spearmanr(pred_tr, y_tr).statistic) if len(y_tr) > 1 else float("nan")

    if output_prefix is not None and dist.is_primary():
        save_expression_model(model, str(output_prefix) + ".save")
        with open(str(output_prefix) + ".dump", "w") as f:
            f.write(dump_text(model))

    return TrainResult(
        model=model, spearman=rho, test_pred=pred_te, test_true=y_te,
        train_spearman=rho_tr, train_pred=pred_tr, train_true=y_tr,
    )


def train_bootstrap(
    Xreducedall: np.ndarray,
    geneanno: pd.DataFrame,
    expression: np.ndarray,
    seeds: list[int],
    *,
    output_dir: str | os.PathLike | None = None,
    vectorized: bool = True,
    **kwargs,
) -> list[TrainResult]:
    """Bootstrap sweep (replaces scripts/train_bootstrap.sh:4-7's 1000-job
    shell loop).

    ``vectorized=True`` trains all seeds **simultaneously** on device:
    with-replacement resampling is expressed as per-seed integer row weights
    (weighted least squares == training on the resampled rows, verified
    against the per-seed path), so K seeds cost one sweep with (n, K)
    residual matmuls instead of K sweeps.
    """
    if not vectorized:
        results = []
        for seed in seeds:
            prefix = None
            if output_dir is not None:
                os.makedirs(output_dir, exist_ok=True)
                prefix = os.path.join(output_dir, f"bootstrap_seed{seed}")
            results.append(
                train_expression_model(
                    Xreducedall, geneanno, expression, seed_resample=seed, output_prefix=prefix, **kwargs
                )
            )
        return results

    hp = kwargs.pop("params", None) or GBLinearParams()
    filter_str = kwargs.pop("filter_str", "all")
    pseudocount = kwargs.pop("pseudocount", 1e-4)
    keep_mask = kwargs.pop("keep_mask", None)
    n_tracks = kwargs.pop("n_tracks", 2002)
    extra_filter = kwargs.pop("extra_filter", None)
    verbose = kwargs.pop("verbose", False)
    if kwargs:
        raise TypeError(f"unsupported kwargs for vectorized bootstrap: {sorted(kwargs)}")

    X = Xreducedall
    if keep_mask is not None:
        X = subset_features_by_mask(X, keep_mask, n_tracks=n_tracks)
    labels = np.log(np.asarray(expression, dtype=np.float64) + pseudocount)
    filt = gene_filter(geneanno, filter_str) & np.isfinite(labels)
    if extra_filter is not None:
        filt = filt & np.asarray(extra_filter)
    trainind, testind = chromosome_split(geneanno)
    tr = np.nonzero(trainind & filt)[0]
    te = np.nonzero(testind & filt)[0]

    X_tr = X[tr]
    y_tr = labels[tr].astype(np.float32)
    row_w = bootstrap_row_weights(len(tr), seeds)
    from ..parallel import dist

    _rank, world = dist.process_info()
    if world > 1:
        # rows shard across hosts; the (deterministic) resample weights are
        # computed globally then sliced so every host agrees on the draw
        lo, hi = dist.host_row_range(len(tr))
        multi = train_gblinear_multi_sharded(
            X_tr[lo:hi], np.tile(y_tr[lo:hi, None], (1, len(seeds))), hp,
            row_weights_local=row_w[lo:hi], verbose=verbose,
        )
    else:
        multi = train_gblinear_multi(
            X_tr, np.tile(y_tr[:, None], (1, len(seeds))), hp, row_weights=row_w, verbose=verbose
        )

    results = []
    X_te, y_te = X[te], labels[te].astype(np.float32)
    for j, seed in enumerate(seeds):
        model = GBLinearModel(weight=multi.weights[:, j], bias=float(multi.biases[j]), base_score=hp.base_score)
        pred = model.predict(X_te)
        rho = float(spearmanr(pred, y_te).statistic) if len(y_te) > 1 else float("nan")
        if output_dir is not None and dist.is_primary():
            os.makedirs(output_dir, exist_ok=True)
            save_expression_model(model, os.path.join(output_dir, f"bootstrap_seed{seed}.save"))
            save_expression_model(model, os.path.join(output_dir, f"bootstrap_seed{seed}.dump"))
        results.append(TrainResult(model=model, spearman=rho, test_pred=pred, test_true=y_te))
    return results


def train_all_tissues(
    Xreducedall: np.ndarray,
    geneanno: pd.DataFrame,
    expression_df: pd.DataFrame,
    *,
    target_indices: list[int] | None = None,
    output_dir: str | os.PathLike | None = None,
    metrics_path: str | os.PathLike | None = None,
    vectorized: bool = False,
    holdout_train: tuple = ("chrX", "chrY", "chr7", "chr8"),
    **kwargs,
) -> dict[str, TrainResult]:
    """Multi-tissue sweep over expression columns with a metrics.h5 summary
    (reference train_susztak.py:87-181).

    The default train split holds out chr7 AND chr8, matching the reference
    multi-tissue trainer exactly (train_susztak.py:117-122; the single-model
    trainer holds out only chr8, train.py:127-129). ``vectorized=True``
    trains all columns simultaneously via :func:`train_gblinear_multi` (one
    sweep with (n, K) residual matmuls); only rows where every column is
    finite participate in that mode (the per-column mode keeps per-column
    finite filters).
    """
    indices = target_indices if target_indices is not None else list(range(1, expression_df.shape[1]))
    names = [str(expression_df.columns[idx]) for idx in indices]
    if len(set(names)) != len(names):
        import warnings

        warnings.warn(
            "duplicate expression column names: later tissues overwrite "
            "earlier ones in the results dict and on disk (expecto_<name>.save)",
            stacklevel=2,
        )
    results: dict[str, TrainResult] = {}
    # reference metrics.h5 key set (train_susztak.py:177-181, consumed by
    # plot_susztak.py:64-83) plus this engine's extra spearman/tissue columns
    metrics = {
        "pearsonr_valids": [], "r2_valids": [], "pearsonr_trains": [], "r2_trains": [],
        "spearman_valid": [], "tissue": [],
    }

    def _pearson_r2(pred, true) -> tuple[float, float]:
        from scipy.stats import pearsonr
        from sklearn.metrics import r2_score

        if pred is None or true is None:
            return float("nan"), float("nan")
        finite = np.isfinite(pred) & np.isfinite(true)
        if finite.sum() <= 1:
            return float("nan"), float("nan")
        return (
            float(pearsonr(pred[finite], true[finite]).statistic),
            float(r2_score(y_true=true[finite], y_pred=pred[finite])),
        )

    def _record(name: str, res: TrainResult) -> None:
        results[name] = res
        metrics["tissue"].append(name)
        metrics["spearman_valid"].append(res.spearman)
        pr_v, r2_v = _pearson_r2(res.test_pred, res.test_true)
        pr_t, r2_t = _pearson_r2(res.train_pred, res.train_true)
        metrics["pearsonr_valids"].append(pr_v)
        metrics["r2_valids"].append(r2_v)
        metrics["pearsonr_trains"].append(pr_t)
        metrics["r2_trains"].append(r2_t)

    if vectorized:
        hp = kwargs.pop("params", None) or GBLinearParams()
        filter_str = kwargs.pop("filter_str", "all")
        pseudocount = kwargs.pop("pseudocount", 1e-4)
        extra_filter = kwargs.pop("extra_filter", None)
        keep_mask = kwargs.pop("keep_mask", None)
        n_tracks = kwargs.pop("n_tracks", 2002)
        verbose = kwargs.pop("verbose", False)
        if kwargs:
            raise TypeError(f"unsupported kwargs for vectorized sweep: {sorted(kwargs)}")
        if keep_mask is not None:
            Xreducedall = subset_features_by_mask(Xreducedall, keep_mask, n_tracks=n_tracks)
        Y = np.log(expression_df.iloc[:, indices].values.astype(np.float64) + pseudocount)
        filt = gene_filter(geneanno, filter_str) & np.isfinite(Y).all(axis=1)
        if extra_filter is not None:
            filt = filt & np.asarray(extra_filter)
        trainind, testind = chromosome_split(geneanno, holdout_train=holdout_train)
        tr = trainind & filt
        te = testind & filt
        X_tr, Y_tr = Xreducedall[tr], Y[tr]
        from ..parallel import dist

        _rank, world = dist.process_info()
        if world > 1:
            lo, hi = dist.host_row_range(X_tr.shape[0])
            multi = train_gblinear_multi_sharded(
                X_tr[lo:hi], Y_tr[lo:hi].astype(np.float32), hp, verbose=verbose
            )
        else:
            multi = train_gblinear_multi(X_tr, Y_tr.astype(np.float32), hp, verbose=verbose)
        X_te, Y_te = Xreducedall[te], Y[te]
        for j, name in enumerate(names):
            model = GBLinearModel(weight=multi.weights[:, j], bias=float(multi.biases[j]), base_score=hp.base_score)
            pred = model.predict(X_te)
            pred_tr = model.predict(X_tr)
            rho = float(spearmanr(pred, Y_te[:, j]).statistic) if len(pred) > 1 else float("nan")
            rho_tr = float(spearmanr(pred_tr, Y_tr[:, j]).statistic) if len(pred_tr) > 1 else float("nan")
            if output_dir is not None and dist.is_primary():
                os.makedirs(output_dir, exist_ok=True)
                save_expression_model(model, os.path.join(output_dir, f"expecto_{name}.save"))
                save_expression_model(model, os.path.join(output_dir, f"expecto_{name}.dump"))
            _record(name, TrainResult(
                model=model, spearman=rho, test_pred=pred, test_true=Y_te[:, j].astype(np.float32),
                train_spearman=rho_tr, train_pred=pred_tr, train_true=Y_tr[:, j].astype(np.float32),
            ))
    else:
        for idx, name in zip(indices, names):
            prefix = None
            if output_dir is not None:
                os.makedirs(output_dir, exist_ok=True)
                prefix = os.path.join(output_dir, f"expecto_{name}")
            res = train_expression_model(
                Xreducedall, geneanno, expression_df.iloc[:, idx].values,
                output_prefix=prefix, holdout_train=holdout_train, **kwargs
            )
            _record(name, res)

    from ..parallel import dist as _dist

    if metrics_path is not None and _dist.is_primary():
        import h5py

        with h5py.File(metrics_path, "w") as f:
            # exactly the reference key set (train_susztak.py:177-181) ...
            for key in ("pearsonr_valids", "r2_valids", "pearsonr_trains", "r2_trains"):
                f.create_dataset(key, data=np.asarray(metrics[key]))
            # ... plus clearly-named engine extras (round 1's duplicate
            # 'pearsonr_valid' alias was dropped in round 3)
            f.create_dataset("spearman_valid", data=np.asarray(metrics["spearman_valid"]))
            f.create_dataset("tissue", data=np.array(metrics["tissue"], dtype="S"))
    return results
