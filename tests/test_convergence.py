"""Convergence tests mirroring the reference suite's thresholds
(tests/test_gbt_single.py:130-131, test_gbt_multi.py:154-155): diabetes,
100 boosting iterations, depth 4, 256 bins, SGD lr=1.0, RMSE (as
sqrt(0.5*mse)) below 5 (single output) / 2 (10-dim multi-output)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn import datasets

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.optimizers import OptimizerSpec
from gbrl_tpu.ops.boosting import boost_step, predict_sgd, fit_loop

N_EPOCHS = 100


def _diabetes():
    X, y = datasets.load_diabetes(return_X_y=True, as_frame=False, scaled=False)
    return X.astype(np.float32), y.astype(np.float32)[:, None]


def _rmse_loop(cfg, X, y, n_epochs=N_EPOCHS):
    """RL-style loop: predict -> grads = preds - y -> one tree per step
    (the torch-loop grads p.grad*n == preds - y for 0.5*mse)."""
    N, F = X.shape
    O = y.shape[1]
    ens = init_ensemble(cfg, capacity=128)
    ens = ens.replace(bias=jnp.asarray(y.mean(axis=0)))
    spec = OptimizerSpec(algo="SGD", init_lr=1.0, start_idx=0, stop_idx=O)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    fw = jnp.ones(F, dtype=jnp.float32)
    for _ in range(n_epochs):
        preds = predict_sgd(cfg, ens, Xj, (spec,), 0, ens.n_trees)
        # the reference tests use 0.5*mse_loss (*output_dim for multi), so
        # harvested grads p.grad*n == preds - y (test_gbt_multi.py:66-67)
        grads = preds - yj
        ens = boost_step(cfg, ens, Xj, grads, fw)
    preds = predict_sgd(cfg, ens, Xj, (spec,), 0, ens.n_trees)
    return float(jnp.sqrt(0.5 * jnp.mean(jnp.sum((preds - yj) ** 2, axis=1))))


@pytest.mark.parametrize("grow_policy,score,n_bins,epochs,threshold", [
    # two full-fidelity configs at exact reference settings/thresholds
    ("greedy", "cosine", 256, 100, 5),
    ("oblivious", "l2", 256, 100, 5),
    # remaining combos at reduced budget (still strict enough to catch
    # scoring/routing regressions) to keep the suite under the CI budget
    ("greedy", "l2", 64, 40, 20),
    ("oblivious", "cosine", 64, 40, 20),
])
def test_diabetes_step_loop(grow_policy, score, n_bins, epochs, threshold):
    X, y = _diabetes()
    cfg = TreeConfig(input_dim=X.shape[1], output_dim=1,
                     n_num_features=X.shape[1], max_depth=4, n_bins=n_bins,
                     grow_policy=grow_policy, split_score_func=score)
    loss = _rmse_loop(cfg, X, y, epochs)
    assert loss < threshold, f"{grow_policy}/{score}: {loss} >= {threshold}"


def test_diabetes_multi_output():
    X, y = _diabetes()
    y10 = np.tile(y, (1, 10))
    cfg = TreeConfig(input_dim=X.shape[1], output_dim=10,
                     n_num_features=X.shape[1], max_depth=4, n_bins=256,
                     grow_policy="greedy", split_score_func="cosine")
    loss = _rmse_loop(cfg, X, y10, 100)
    # reference threshold is sqrt(0.5*mse) over the 10-dim output < 2;
    # its mse_loss averages over all elements; ours sums over dims -> /sqrt(10)
    assert loss / np.sqrt(10) < 2, f"loss {loss / np.sqrt(10)} >= 2"


def test_supervised_fit_loop_matches_step_loop():
    """fit_loop (device-resident lax.fori_loop) must equal the step-by-step
    loop exactly when batch_size >= N and shuffle is off (fitter.cpp:117-261
    reduces to the same sequence of full-batch iterations)."""
    X, y = _diabetes()
    X, y = X[:200], y[:200]
    cfg = TreeConfig(input_dim=X.shape[1], output_dim=1,
                     n_num_features=X.shape[1], max_depth=3, n_bins=32,
                     grow_policy="oblivious", split_score_func="l2")
    iters = 10
    spec = OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0, stop_idx=1)

    # step loop (bias = mean targets like GBRL::fit, gbrl.cpp:1078)
    ens = init_ensemble(cfg, capacity=16)
    ens = ens.replace(bias=jnp.asarray(y.mean(axis=0)))
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    fw = jnp.ones(X.shape[1], dtype=jnp.float32)
    for _ in range(iters):
        preds = predict_sgd(cfg, ens, Xj, (spec,), 0, ens.n_trees)
        ens = boost_step(cfg, ens, Xj, preds - yj, fw)
    preds_step = predict_sgd(cfg, ens, Xj, (spec,), 0, ens.n_trees)

    ens2 = init_ensemble(cfg, capacity=16)
    ens2 = ens2.replace(bias=jnp.asarray(y.mean(axis=0)))
    ens2, loss, per_iter = fit_loop(cfg, iters, ens2, Xj, yj,
                                    jnp.int32(X.shape[0]), (spec,), fw)
    assert per_iter.shape == (iters,)
    preds_fit = predict_sgd(cfg, ens2, Xj, (spec,), 0, ens2.n_trees)
    np.testing.assert_allclose(np.asarray(preds_fit), np.asarray(preds_step),
                               rtol=1e-4, atol=1e-4)
    rmse = float(jnp.sqrt(0.5 * jnp.mean((preds_fit - yj) ** 2)))
    np.testing.assert_allclose(float(loss), rmse, rtol=1e-4)
