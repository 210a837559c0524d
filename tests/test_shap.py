"""TreeSHAP correctness: classic path-dependent TreeSHAP vs brute-force
exact Shapley enumeration, plus the local-accuracy (efficiency) axiom:
sum_i phi_i(x) = f(x) - E[f] per output dim."""
import numpy as np
import jax.numpy as jnp
import pytest

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.ops.boosting import boost_step
from gbrl_tpu.ops.shap import (brute_force_shap, ensemble_shap_values,
                               extract_tree, tree_shap_values)


def _fit_ensemble(seed=0, n_trees=3, N=60, F=4, O=2, depth=3,
                  policy="greedy", score="cosine"):
    rng = np.random.default_rng(seed)
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=depth, n_bins=8, grow_policy=policy,
                     split_score_func=score)
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ens = init_ensemble(cfg, capacity=8)
    fw = jnp.ones(F, dtype=jnp.float32)
    for _ in range(n_trees):
        g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
        ens = boost_step(cfg, ens, X, g, fw)
    return cfg, ens, np.asarray(X)


@pytest.mark.parametrize("policy", ["greedy", "oblivious"])
@pytest.mark.parametrize("seed", [0, 3])
def test_tree_shap_matches_brute_force(policy, seed):
    cfg, ens, X = _fit_ensemble(seed=seed, policy=policy)
    phi = tree_shap_values(cfg, ens, 0, X[:5])
    for i in range(5):
        exact = brute_force_shap(cfg, ens, 0, X[i])
        np.testing.assert_allclose(phi[i], exact, rtol=1e-3, atol=1e-5)


def test_shap_local_accuracy():
    """sum_i phi_i(x) + E[f] == tree(x), per tree and per output."""
    cfg, ens, X = _fit_ensemble(seed=1, n_trees=4)
    root = extract_tree(cfg, ens, 0)

    def tree_value(x):
        node = root
        while node.value is None:
            node = node.right if x[node.feat] > node.thr else node.left
        return node.value

    def expected_value(node):
        if node.value is not None:
            return node.value
        return (node.w_left * expected_value(node.left)
                + node.w_right * expected_value(node.right))

    phi = tree_shap_values(cfg, ens, 0, X[:10])
    ev = expected_value(root)
    for i in range(10):
        np.testing.assert_allclose(phi[i].sum(axis=0) + ev, tree_value(X[i]),
                                   rtol=1e-4, atol=1e-5)


def test_ensemble_shap_is_sum_of_trees():
    cfg, ens, X = _fit_ensemble(seed=2, n_trees=3)
    total = ensemble_shap_values(cfg, ens, X[:4])
    acc = sum(tree_shap_values(cfg, ens, t, X[:4]) for t in range(3))
    np.testing.assert_allclose(total, acc, rtol=1e-6)


def test_learner_shap_api():
    from gbrl_tpu.models.gbt import GBTModel
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 4)).astype(np.float32)
    y = rng.normal(size=(50, 1)).astype(np.float32)
    model = GBTModel(tree_struct={"max_depth": 3, "n_bins": 8},
                     input_dim=4, output_dim=1,
                     optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0,
                                 "stop_idx": 1}, device="cpu")
    model.learner.step(X, y)
    sv_tree = model.tree_shap(0, X)
    sv_ens = model.shap(X)
    assert sv_tree.shape == (50, 4, 1)
    np.testing.assert_allclose(sv_tree, sv_ens, rtol=1e-6)


# ---------------------------------------------------------------- device path
@pytest.mark.parametrize("policy", ["greedy", "oblivious"])
@pytest.mark.parametrize("depth", [2, 3, 4])
def test_device_shap_matches_host(policy, depth):
    """The vectorized XLA TreeSHAP must equal the host recursion."""
    from gbrl_tpu.ops.shap_device import ensemble_shap_device
    cfg, ens, X = _fit_ensemble(seed=2, n_trees=5, depth=depth,
                                policy=policy)
    host = ensemble_shap_values(cfg, ens, X[:16])
    dev = np.asarray(ensemble_shap_device(cfg, ens, jnp.asarray(X[:16]),
                                          None, cfg.input_dim))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_device_tree_shap_single_tree():
    from gbrl_tpu.ops.shap_device import ensemble_shap_device
    cfg, ens, X = _fit_ensemble(seed=5, n_trees=3)
    for t in range(3):
        host = tree_shap_values(cfg, ens, t, X[:8])
        dev = np.asarray(ensemble_shap_device(cfg, ens, jnp.asarray(X[:8]),
                                              None, cfg.input_dim,
                                              jnp.int32(t)))
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_device_shap_categorical():
    """Mixed numeric/categorical trees: device matches host."""
    from gbrl_tpu.ops.shap_device import ensemble_shap_device
    rng = np.random.default_rng(4)
    N, Fn, Fc, O = 80, 3, 2, 2
    cfg = TreeConfig(input_dim=Fn + Fc, output_dim=O, n_num_features=Fn,
                     n_cat_features=Fc, max_depth=3, n_bins=8,
                     grow_policy="greedy", split_score_func="cosine")
    X = jnp.asarray(rng.normal(size=(N, Fn)).astype(np.float32))
    Xc = jnp.asarray(rng.integers(0, 4, (N, Fc)).astype(np.int32))
    ens = init_ensemble(cfg, capacity=8)
    fwn = jnp.ones(Fn, dtype=jnp.float32)
    fwc = jnp.ones(Fc, dtype=jnp.float32)
    for _ in range(3):
        g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
        ens = boost_step(cfg, ens, X, g, fwn, Xc, fwc, 8)
    host = ensemble_shap_values(cfg, ens, np.asarray(X)[:10],
                                np.asarray(Xc)[:10])
    dev = np.asarray(ensemble_shap_device(cfg, ens, X[:10], Xc[:10],
                                          Fn + Fc))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
