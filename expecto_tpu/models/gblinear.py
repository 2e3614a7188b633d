"""Regularized linear booster ("gblinear"), TPU-native.

Replaces the xgboost native core the reference depends on (train.py:140-146:
``{'booster': 'gblinear', 'base_score': 2, 'alpha': 0, 'lambda': 100,
'eta': 0.01, 'objective': 'reg:linear'}``, 100 rounds). The README pins
xgboost==0.7.post4 because eta semantics changed later; this implementation
follows the 0.7 rule: per-round coordinate update

    dw_j = eta * delta(G_j, H_j, w_j),   G_j = sum_i g_i x_ij + ...,
    delta = elastic-net coordinate solution with L2 ``lambda`` / L1 ``alpha``,

with squared-error gradients (g = pred - y, h = 1) and a bias update
``db = -eta * sum(g) / (n + lambda_bias)`` before the feature sweep.

xgboost's default "shotgun" updater races residual updates across threads and
is nondeterministic; the TPU-native equivalent here is **deterministic block
coordinate descent**: a ``lax.scan`` over feature blocks, Jacobi within a
block (all per-feature deltas computed from the same residual via one MXU
matmul ``X_blk @ r``), residual advanced once per block. ``block_size =
n_features`` degenerates to pure Jacobi; small blocks approach sequential CD.

Multi-host data parallelism: rows (genes) are sharded; per-feature gradient
sums are ``psum`` reductions over the row shards (see
``make_sharded_round_fn``), replacing the reference's per-tissue shell-loop
scale-out (scripts/train_bootstrap.sh:4-7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GBLinearParams:
    """Hyperparameters; defaults mirror the reference training CLI
    (train.py:43-52)."""

    eta: float = 0.01
    reg_lambda: float = 100.0
    reg_alpha: float = 0.0
    reg_lambda_bias: float = 0.0
    base_score: float = 2.0
    num_round: int = 100
    block_size: int = 512
    early_stopping_rounds: int | None = None
    #: matmul precision for the training kernels. TPU fp32 `dot` at
    #: "default" uses bf16 multiplications; "highest" is true fp32 and keeps
    #: trained weights tracking xgboost 0.7 (the parity claim). Measured
    #: warm at the real problem size (256 models, 18k x 20,020): 18 ms vs
    #: 12 ms per round — parity costs 1.5x, so it is the default; set
    #: "default" to trade ~2e-4 relative weight noise for the one-pass MXU
    #: rate when sweeping thousands of models.
    precision: str = "highest"


@dataclass
class GBLinearModel:
    """Trained model: prediction = base_score + bias + X @ weight."""

    weight: np.ndarray
    bias: float
    base_score: float = 2.0
    #: optional evaluation history {name: [rmse per round]}
    eval_history: dict = field(default_factory=dict)
    best_iteration: int | None = None

    @property
    def n_features(self) -> int:
        return int(self.weight.shape[0])

    def predict(self, X: np.ndarray) -> np.ndarray:
        return predict_gblinear(self, X)


def predict_gblinear(model: GBLinearModel, X) -> np.ndarray:
    # host numpy: a single matvec gains nothing from the accelerator, and
    # keeping prediction off-device lets the predict CLI run without
    # claiming a TPU. einsum (not BLAS gemv) on purpose: gemv's reduction
    # order depends on the row count, so a host-sharded run would score the
    # same row differently than a single-process run; einsum's fixed
    # contraction order keeps sed.tsv bit-identical under row sharding
    # (tests/test_dist_e2e.py::test_predict_cli_two_process_matches_single)
    X = np.asarray(X, dtype=np.float32)
    w = np.asarray(model.weight, dtype=np.float32)
    return (model.base_score + model.bias + np.einsum("...f,f->...", X, w)).astype(np.float32)


def _coord_delta(g: jax.Array, h: jax.Array, w: jax.Array, lam: float, alpha: float) -> jax.Array:
    """Elastic-net coordinate solution (xgboost CoordinateDelta semantics):
    returns the unscaled weight delta; zero where the hessian vanishes."""
    gl2 = g + lam * w
    hl2 = h + lam
    tmp = w - gl2 / hl2
    pos = jnp.maximum(-(gl2 + alpha) / hl2, -w)
    neg = jnp.minimum(-(gl2 - alpha) / hl2, -w)
    delta = jnp.where(tmp >= 0, pos, neg)
    return jnp.where(h < 1e-5, 0.0, delta)


def _round_body(hp: GBLinearParams, axis_name=None):
    """Build one boosting round as a pure function. The feature blocks are
    *arguments* (not closure captures) so jit ships them as device buffers
    rather than multi-GB HLO constants — capture breaks remote compilation
    at the real 24k-gene x 20,020-feature scale."""

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    prec = jax.lax.Precision(hp.precision)

    def one_round(w_blocks, bias, r, Xt_blocks, col_hess_blocks, n_total):
        # bias step (sum_hess = n for squared error)
        sum_g = psum(jnp.sum(r))
        db = hp.eta * (-sum_g / (n_total + hp.reg_lambda_bias))
        bias = bias + db
        r = r + db

        def block_step(r, inputs):
            Xb, wb, hb = inputs  # Xb: (B, n_local); hb: (B,) global col hessians
            g = psum(jnp.dot(Xb, r, precision=prec))  # (B,) global gradient sums
            dw = hp.eta * _coord_delta(g, hb, wb, hp.reg_lambda, hp.reg_alpha)
            r = r + jnp.dot(dw, Xb, precision=prec)
            return r, wb + dw

        r, w_blocks = jax.lax.scan(block_step, r, (Xt_blocks, w_blocks, col_hess_blocks))
        return w_blocks, bias, r

    return one_round


def _pad_blocks(Xt: np.ndarray, block_size: int) -> tuple[np.ndarray, int]:
    """(F, n) -> (n_blocks, B, n), zero-padding the feature axis."""
    f, n = Xt.shape
    n_blocks = -(-f // block_size)
    if n_blocks * block_size != f:
        Xt = np.concatenate([Xt, np.zeros((n_blocks * block_size - f, n), Xt.dtype)], axis=0)
    return Xt.reshape(n_blocks, block_size, n), n_blocks


def train_gblinear(
    X,
    y,
    params: GBLinearParams | None = None,
    *,
    evals: list[tuple[np.ndarray, np.ndarray, str]] | None = None,
    verbose: bool = False,
) -> GBLinearModel:
    """Train on (n, F) features / (n,) labels. Deterministic on any backend.

    ``evals`` mirrors xgboost's watchlist: [(X_eval, y_eval, name), ...]; RMSE
    is recorded per round, and if ``params.early_stopping_rounds`` is set the
    **last** eval set controls early stopping (xgboost semantics). Note the
    reference passes early_stopping_rounds inside the params dict where
    xgboost ignores it (train.py:140-146), so the reference always runs the
    full num_round — replicated by the default of None.
    """
    hp = params or GBLinearParams()
    X = np.asarray(X, dtype=np.float32)
    y = np.asarray(y, dtype=np.float32)
    n, f = X.shape

    Xt_blocks, _ = _pad_blocks(np.ascontiguousarray(X.T), hp.block_size)
    col_hess = np.sum(Xt_blocks.astype(np.float64) ** 2, axis=2).astype(np.float32)

    jit_round = jax.jit(_round_body(hp), donate_argnums=(0, 2))
    Xt_dev = jax.device_put(Xt_blocks)
    ch_dev = jax.device_put(col_hess)
    n_total = jnp.float32(n)

    w_blocks = jnp.zeros(Xt_blocks.shape[:2], jnp.float32)
    bias = jnp.float32(0.0)
    r = jnp.asarray(np.full(n, hp.base_score, np.float32) - y)

    history: dict[str, list[float]] = {name: [] for *_unused, name in (evals or [])}
    best_round, best_score, stale = None, np.inf, 0
    snapshots: dict[int, tuple[np.ndarray, float]] = {}

    for it in range(hp.num_round):
        w_blocks, bias, r = jit_round(w_blocks, bias, r, Xt_dev, ch_dev, n_total)
        if evals:
            w_now = np.asarray(w_blocks).reshape(-1)[:f]
            b_now = float(bias)
            for Xe, ye, name in evals:
                pred = hp.base_score + b_now + np.asarray(Xe, np.float32) @ w_now
                rmse = float(np.sqrt(np.mean((pred - np.asarray(ye, np.float32)) ** 2)))
                history[name].append(rmse)
                if verbose:
                    print(f"[{it}]\t{name}-rmse:{rmse:.6f}")
            if hp.early_stopping_rounds is not None:
                score = history[evals[-1][2]][-1]
                if score < best_score:
                    best_score, best_round, stale = score, it, 0
                    snapshots = {it: (w_now.copy(), b_now)}
                else:
                    stale += 1
                    if stale >= hp.early_stopping_rounds:
                        break

    if hp.early_stopping_rounds is not None and best_round is not None and snapshots:
        w_final, b_final = snapshots[best_round]
    else:
        w_final = np.asarray(w_blocks).reshape(-1)[:f]
        b_final = float(bias)

    return GBLinearModel(
        weight=w_final.astype(np.float32),
        bias=b_final,
        base_score=hp.base_score,
        eval_history=history,
        best_iteration=best_round,
    )


def _multi_round_body(hp: GBLinearParams, axis_name=None):
    """One boosting round for K models sharing the feature matrix.

    Residuals are (n, K); per-model row weights (n, K) express bootstrap
    resampling (integer multiplicities) or plain multi-target training
    (all-ones). Per-feature stats become single MXU matmuls over all models:
    G = X_blk @ (w * r), H = X_blk^2 @ w. Feature blocks are arguments, not
    closure captures (see _round_body).

    Unlike ``_round_body``, the hessian is NOT psum-reduced here: it is
    loop-invariant and precomputed by the caller. With ``axis_name`` set,
    ``hess_blocks`` must therefore already be the GLOBAL (psum-reduced)
    hessians — mirroring ``make_sharded_round_fn``'s col_hess_blocks
    contract; passing locally-computed hessians would silently under-damp.
    """

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    prec = jax.lax.Precision(hp.precision)

    def one_round(w_blocks, bias, r, row_w, n_eff, Xt_blocks, hess_blocks):
        # bias step: sum_g/sum_h per model
        sum_g = psum(jnp.sum(row_w * r, axis=0))  # (K,)
        db = hp.eta * (-sum_g / (n_eff + hp.reg_lambda_bias))
        bias = bias + db
        r = r + db[None, :]

        def block_step(r, inputs):
            Xb, hb, wb = inputs  # Xb: (B, n_local); hb/wb: (B, K)
            g = psum(jnp.dot(Xb, row_w * r, precision=prec))  # (B, K)
            dw = hp.eta * _coord_delta(g, hb, wb, hp.reg_lambda, hp.reg_alpha)
            r = r + jnp.dot(Xb.T, dw, precision=prec)  # (n, K)
            return r, wb + dw

        r, w_blocks = jax.lax.scan(block_step, r, (Xt_blocks, hess_blocks, w_blocks))
        return w_blocks, bias, r

    return one_round


@dataclass
class MultiTrainResult:
    weights: np.ndarray  # (F, K)
    biases: np.ndarray  # (K,)
    base_score: float
    #: optional {name: [per-round RMSE]} — (K,) arrays per round for K > 1
    eval_history: dict = field(default_factory=dict)


def train_gblinear_multi(
    X,
    Y,
    params: GBLinearParams | None = None,
    *,
    row_weights: np.ndarray | None = None,
    verbose: bool = False,
) -> MultiTrainResult:
    """Train K gblinear models sharing one feature matrix in a single
    on-device sweep.

    Two sweep shapes collapse into this (SURVEY §7 step 9):
    - **multi-tissue** (train_susztak.py's per-column loop): Y is (n, K)
      labels, ``row_weights`` None (all ones) — K tissues per round via one
      matmul;
    - **bootstrap** (scripts/train_bootstrap.sh's 1000 jobs): Y tiles one
      label column; ``row_weights`` (n, K) holds each seed's resample
      multiplicities (np.bincount of the with-replacement draw,
      train_bootstrap.py:88-98). Weighted least squares with integer row
      weights is exactly training on the resampled rows.
    """
    hp = params or GBLinearParams()
    if hp.early_stopping_rounds is not None:
        import warnings

        warnings.warn(
            "train_gblinear_multi runs all num_round rounds: per-model early "
            "stopping is not supported in the vectorized sweep (use "
            "train_gblinear with evals for early stopping)",
            stacklevel=2,
        )
    X = np.asarray(X, dtype=np.float32)
    Y = np.asarray(Y, dtype=np.float32)
    if Y.ndim == 1:
        Y = Y[:, None]
    n, f = X.shape
    k = Y.shape[1]
    if row_weights is None:
        row_weights = np.ones((n, k), np.float32)
    row_weights = np.asarray(row_weights, dtype=np.float32)

    Xt_blocks, _ = _pad_blocks(np.ascontiguousarray(X.T), hp.block_size)
    n_eff = jnp.asarray(row_weights.sum(axis=0))  # (K,) effective row counts

    jit_round = jax.jit(_multi_round_body(hp), donate_argnums=(0, 2))
    Xt_dev = jax.device_put(Xt_blocks)
    rw = jnp.asarray(row_weights)
    # per-(feature, model) hessians H = X^2 @ row_w are loop-invariant:
    # compute once (sequential over blocks to bound the X*X temp) instead of
    # one full-size matmul per block per round (~33% of the sweep's FLOPs)
    # and a second feature-matrix-sized device buffer
    prec = jax.lax.Precision(hp.precision)
    hess_dev = jax.jit(
        lambda Xt, w: jax.lax.map(lambda Xb: jnp.dot(Xb * Xb, w, precision=prec), Xt)
    )(Xt_dev, rw)

    w_blocks = jnp.zeros((Xt_blocks.shape[0], Xt_blocks.shape[1], k), jnp.float32)
    bias = jnp.zeros((k,), jnp.float32)
    r = jnp.asarray(np.full((n, k), hp.base_score, np.float32) - Y)

    for it in range(hp.num_round):
        w_blocks, bias, r = jit_round(w_blocks, bias, r, rw, n_eff, Xt_dev, hess_dev)
        if verbose and it % 10 == 0:
            print(f"[{it}] mean|r| = {float(jnp.mean(jnp.abs(r))):.5f}")

    weights = np.asarray(w_blocks).reshape(-1, k)[:f]
    return MultiTrainResult(weights=weights, biases=np.asarray(bias), base_score=hp.base_score)


def bootstrap_row_weights(n_train: int, seeds: list[int]) -> np.ndarray:
    """(n_train, len(seeds)) resample multiplicities matching the reference's
    ``np.random.RandomState(seed).choice(trainind, size=n, replace=True)``
    draw (train_bootstrap.py:88-98)."""
    out = np.zeros((n_train, len(seeds)), np.float32)
    for j, seed in enumerate(seeds):
        rs = np.random.RandomState(seed)
        idx = rs.choice(np.arange(n_train), size=n_train, replace=True)
        out[:, j] = np.bincount(idx, minlength=n_train)
    return out


def make_sharded_round_fn(hp: GBLinearParams, axis_name: str = "data"):
    """One boosting round for shard_map over a row-sharded dataset.

    The caller shards ``Xt_blocks`` (n_blocks, B, n_local) and residual
    ``r`` (n_local,) over hosts/devices; per-feature gradient sums become
    ``psum`` collectives over the data axis. ``col_hess_blocks`` must be the
    *global* column hessians (psum of local sums, computed once up front).
    """

    def round_fn(w_blocks, bias, r, Xt_blocks, col_hess_blocks, n_total):
        return _round_body(hp, axis_name=axis_name)(
            w_blocks, bias, r, Xt_blocks, col_hess_blocks, n_total
        )

    return round_fn


def train_gblinear_multi_sharded(
    X_local,
    Y_local,
    params: GBLinearParams | None = None,
    *,
    row_weights_local: np.ndarray | None = None,
    evals: list[tuple] | None = None,
    verbose: bool = False,
) -> MultiTrainResult:
    """Row-sharded K-model training over the GLOBAL device mesh — the
    multi-host production trainer (replaces the reference's per-node shell
    loops, scripts/train_bootstrap.sh:4-7 + train_susztak.py's per-column
    loop run per node).

    Every process passes only ITS contiguous row shard (``host_row_range``
    order: process 0 owns the first rows). Rows are padded per-device with
    zero feature rows AND zero row weights, so padding contributes exactly 0
    to every gradient/hessian sum — bias and weight updates match the
    unsharded trainer up to reduction order (all sums become ``psum``
    collectives over the data axis, riding ICI on a real slice).

    Single-process this still shards rows over the local devices, so the
    same code path is exercised by the CPU mesh tests and the multichip
    dryrun.

    ``evals``: xgboost-style watchlist [(X_eval, y_eval, name), ...] with
    eval sets REPLICATED on every host (the chr8 holdout is small; the
    reference prints this watchlist every round, train.py:146-154). Per
    round the replicated weights are fetched once and RMSE computed on
    host — one (n_eval, F) matvec per set; ``y_eval`` may be (n_e,) or
    (n_e, K). Recorded in ``eval_history`` (and printed when verbose).
    """
    try:
        from jax import shard_map as _shard_map_fn  # jax >= 0.8
    except ImportError:  # older jax: experimental namespace
        from jax.experimental.shard_map import shard_map as _shard_map_fn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    hp = params or GBLinearParams()
    X_local = np.asarray(X_local, dtype=np.float32)
    Y_local = np.asarray(Y_local, dtype=np.float32)
    if Y_local.ndim == 1:
        Y_local = Y_local[:, None]
    n_local, f = X_local.shape
    k = Y_local.shape[1]
    if row_weights_local is None:
        row_weights_local = np.ones((n_local, k), np.float32)
    row_weights_local = np.asarray(row_weights_local, dtype=np.float32)

    devs = np.array(jax.devices())
    # the global row order is process-major: jax.devices() must group each
    # process's devices contiguously and in rank order for host_row_range
    # shards to land in their global positions
    proc_of = np.array([d.process_index for d in devs.tolist()])
    if not (np.diff(proc_of) >= 0).all():
        order = np.argsort(proc_of, kind="stable")
        devs = devs[order]
    mesh = Mesh(devs, ("data",))
    l_local = jax.local_device_count()
    if len(devs) != jax.process_count() * l_local:
        # pad_to below assumes every host contributes the same device count;
        # a heterogeneous group would let one host's row shard exceed its pad
        # width (np.pad raises on the negative pad) — fail with the cause
        raise ValueError(
            f"train_gblinear_multi_sharded requires uniform devices per host: "
            f"{len(devs)} global != {jax.process_count()} processes x {l_local} local"
        )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        n_global = int(np.sum(multihost_utils.process_allgather(np.array([n_local], np.int64))))
    else:
        n_global = n_local
    # uniform per-device row count: every device pads to d rows so the global
    # array has static shape L*d regardless of the ±1 row range imbalance
    d_rows = max(-(-n_global // len(devs)), 1)
    pad_to = l_local * d_rows

    def _pad_rows(a, width):
        if a.shape[0] == width:
            return a
        pad = [(0, width - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, pad)

    Xp = _pad_rows(X_local, pad_to)
    Yp = _pad_rows(Y_local, pad_to)
    wp = _pad_rows(row_weights_local, pad_to)

    Xt_blocks, _ = _pad_blocks(np.ascontiguousarray(Xp.T), hp.block_size)  # (nb, B, pad_to)
    nb, B, _ = Xt_blocks.shape
    N = len(devs) * d_rows

    row2_shard = NamedSharding(mesh, P("data", None))
    col_shard = NamedSharding(mesh, P(None, None, "data"))
    repl = NamedSharding(mesh, P())

    def _global(local_np, sharding, global_shape):
        if jax.process_count() == 1:
            return jax.device_put(local_np, sharding)
        return jax.make_array_from_process_local_data(sharding, local_np, global_shape)

    Xt_g = _global(Xt_blocks, col_shard, (nb, B, N))
    rw_g = _global(wp, row2_shard, (N, k))
    r_g = _global(np.full((pad_to, k), hp.base_score, np.float32) - Yp, row2_shard, (N, k))

    prec = jax.lax.Precision(hp.precision)
    # global hessians: the contraction over the row-sharded axis makes XLA
    # insert the psum; output replicated so every round reads it locally
    hess_g = jax.jit(
        lambda Xt, w: jax.lax.map(lambda Xb: jnp.dot(Xb * Xb, w, precision=prec), Xt),
        out_shardings=repl,
    )(Xt_g, rw_g)
    n_eff = jax.jit(lambda w: jnp.sum(w, axis=0), out_shardings=repl)(rw_g)

    round_fn = _multi_round_body(hp, axis_name="data")
    sharded_round = jax.jit(
        _shard_map_fn(
            round_fn,
            mesh=mesh,
            in_specs=(P(), P(), P("data", None), P("data", None), P(), P(None, None, "data"), P()),
            out_specs=(P(), P(), P("data", None)),
        ),
        donate_argnums=(0, 2),
    )

    w_blocks = jax.device_put(np.zeros((nb, B, k), np.float32), repl)
    bias = jax.device_put(np.zeros((k,), np.float32), repl)
    history: dict[str, list] = {name: [] for *_unused, name in (evals or [])}
    verbose = verbose and jax.process_index() == 0  # one watchlist, not one per host
    for it in range(hp.num_round):
        w_blocks, bias, r_g = sharded_round(w_blocks, bias, r_g, rw_g, n_eff, Xt_g, hess_g)
        if evals:
            # weights are replicated, so every host fetches identical values
            # and computes an identical watchlist — no extra collectives
            w_now = np.asarray(jax.device_get(w_blocks)).reshape(-1, k)[:f]
            b_now = np.asarray(jax.device_get(bias))
            for Xe, ye, name in evals:
                pred = hp.base_score + b_now[None, :] + np.asarray(Xe, np.float32) @ w_now
                ye = np.asarray(ye, np.float32)
                err = pred - (ye[:, None] if ye.ndim == 1 else ye)
                rmse = np.sqrt(np.mean(err**2, axis=0))
                history[name].append(float(rmse[0]) if k == 1 else rmse)
                if verbose:
                    print(f"[{it}]\t{name}-rmse:" + ",".join(f"{v:.6f}" for v in np.atleast_1d(rmse)))
        elif verbose and it % 10 == 0:
            print(f"[{it}] sharded round done")

    weights = np.asarray(jax.device_get(w_blocks)).reshape(-1, k)[:f]
    return MultiTrainResult(
        weights=weights, biases=np.asarray(jax.device_get(bias)),
        base_score=hp.base_score, eval_history=history,
    )


def train_gblinear_sharded(
    X_local,
    y_local,
    params: GBLinearParams | None = None,
    *,
    evals: list[tuple] | None = None,
    verbose: bool = False,
) -> GBLinearModel:
    """Single-model row-sharded trainer (K=1 view of
    :func:`train_gblinear_multi_sharded`); runs all ``num_round`` rounds (the
    reference's effective behavior — it passes early_stopping_rounds where
    xgboost ignores it, train.py:140-146). ``evals`` sets must be replicated
    on every host; the per-round watchlist matches :func:`train_gblinear`'s."""
    hp = params or GBLinearParams()
    multi = train_gblinear_multi_sharded(
        X_local, np.asarray(y_local, np.float32)[:, None], hp, evals=evals, verbose=verbose
    )
    return GBLinearModel(
        weight=multi.weights[:, 0].astype(np.float32),
        bias=float(multi.biases[0]),
        base_score=hp.base_score,
        eval_history=multi.eval_history,
    )
