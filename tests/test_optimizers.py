"""Optimizer/scheduler/control-variate semantics vs naive numpy references
(mirroring optimizer.cpp:110-118, 260-283; scheduler.h:124-133;
predictor.cpp:37-119; fitter.cpp:585-633)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.optimizers import OptimizerSpec, adam_delta, scheduler_lr, sgd_coeff
from gbrl_tpu.ops.boosting import boost_step, apply_control_variates
from gbrl_tpu.ops.predict import gather_leaf_values, cv_momentum


def _make_ensemble(n_trees=7, N=40, F=4, O=3, seed=0, capacity=16):
    rng = np.random.default_rng(seed)
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=3, n_bins=8, grow_policy="greedy",
                     split_score_func="cosine", cv_beta=0.9)
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ens = init_ensemble(cfg, capacity=capacity)
    fw = jnp.ones(F, dtype=jnp.float32)
    for _ in range(n_trees):
        g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
        ens = boost_step(cfg, ens, X, g, fw)
    return cfg, ens, X, rng


def test_linear_scheduler():
    """lr(t) = init + ((t+1)/T)*(stop-init), floored at stop (scheduler.h:124-133)."""
    spec = OptimizerSpec(scheduler="Linear", init_lr=1.0, stop_lr=0.1, T=10)
    t = jnp.arange(12)
    lr = np.asarray(scheduler_lr(spec, t))
    expect = np.maximum(1.0 + ((np.arange(12) + 1) / 10) * (0.1 - 1.0), 0.1)
    np.testing.assert_allclose(lr, expect, rtol=1e-6)


def test_sgd_coeff_ranges():
    specs = (OptimizerSpec(algo="SGD", init_lr=0.5, start_idx=0, stop_idx=2),
             OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=2, stop_idx=3))
    c = np.asarray(sgd_coeff(specs, 6, 3, jnp.int32(4), 1, 6))
    # trees 1..3 active (start_tree=1, n_trees=4)
    assert np.all(c[0] == 0) and np.all(c[4:] == 0)
    np.testing.assert_allclose(c[1], [-0.5, -0.5, -0.1])


@pytest.mark.parametrize("beta_1,chunk", [(0.99, 4), (0.9, 16)])
def test_adam_matches_naive_scan(beta_1, chunk):
    cfg, ens, X, _ = _make_ensemble()
    spec = OptimizerSpec(algo="Adam", init_lr=0.05, start_idx=0, stop_idx=2,
                         beta_1=beta_1, beta_2=0.999, eps=1e-8)
    start_tree, stop_tree = 1, 6
    delta = np.asarray(adam_delta(cfg, ens, X, spec, start_tree, stop_tree,
                                  tree_chunk=chunk))

    V = np.asarray(gather_leaf_values(cfg, ens, X))       # [N, T, O]
    N, T, O = V.shape
    m = np.zeros((N, O)); v = np.zeros((N, O)); acc = np.zeros((N, O))
    b1, b2, eps = beta_1, 0.999, 1e-8
    for t in range(start_tree, min(stop_tree, int(ens.n_trees))):
        g = V[:, t, :]
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        alpha = 0.05 * np.sqrt(1 - b2 ** (t + 1)) / (1 - b1 ** (t + 1))
        acc += alpha * m / (np.sqrt(v) + eps)
    acc[:, 2:] = 0.0   # outside the optimizer's column range
    np.testing.assert_allclose(delta, acc, rtol=2e-4, atol=1e-6)


def test_cv_momentum_and_alpha():
    cfg, ens, X, rng = _make_ensemble()
    cfg = cfg.replace(use_control_variates=True)
    V = np.asarray(gather_leaf_values(cfg, ens, X))
    T = int(ens.n_trees)
    beta = cfg.cv_beta
    m = np.zeros_like(V[:, 0, :])
    for t in range(T):
        m = beta * m + (1 - beta) * V[:, t, :]
    m = m / np.sqrt(1 - beta ** T)
    mom = np.asarray(cv_momentum(cfg, ens, X))
    np.testing.assert_allclose(mom, m, rtol=2e-4, atol=1e-6)

    g = rng.normal(size=m.shape).astype(np.float32)
    w = jnp.ones(m.shape[0], dtype=jnp.float32)
    adj = np.asarray(apply_control_variates(cfg, ens, jnp.asarray(X),
                                            jnp.asarray(g), w))
    n = m.shape[0]
    gc = g - g.mean(axis=0)
    mc = m - m.mean(axis=0)
    var = (mc ** 2).sum(axis=0) / (n - 1)
    cov = (gc * mc).sum(axis=0) / (n - 1)
    alpha = np.clip(cov / var, -1, 1)
    expect = g - alpha[None, :] * mc
    np.testing.assert_allclose(adj, expect, rtol=2e-3, atol=2e-5)
