"""Vectorized JAX fitter vs the literal numpy oracle of the reference C++.

Every (grow_policy x score x generator x min_data) combination fits one tree
on random data; per-sample leaf values must match the oracle's to float32
tolerance, proving split selection, tie-breaking, routing, the no-reuse rule
and leaf aggregation all agree with the reference algorithm
(fitter.cpp / node.cpp / split_candidate_generator.cpp).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ops.candidates import numerical_candidates, bucketize
from gbrl_tpu.ops.fit import build_tree, standardize_l2

from oracle import (fit_tree_oracle, quantile_candidates_np,
                    uniform_candidates_np, tree_leaf_values_per_sample)


def jax_tree_leaf_values(cfg, tree, X):
    """Route samples through the heap tree; return [N, O] leaf values."""
    feat = np.asarray(tree["feat"])
    thr = np.asarray(tree["thr"])
    is_split = np.asarray(tree["is_split"])
    lv = np.asarray(tree["leaf_values"])
    N = X.shape[0]
    out = np.zeros((N, lv.shape[1]))
    for i in range(N):
        p = 0
        for _ in range(cfg.max_depth):
            go = bool(is_split[p]) and (X[i, feat[p]] > thr[p])
            p = 2 * p + 1 + int(go)
        out[i] = lv[p - (cfg.n_leaves - 1)]
    return out


CONFIGS = [
    (gp, sf, gen, md)
    for gp in ("greedy", "oblivious")
    for sf in ("cosine", "l2")
    for gen in ("quantile", "uniform")
    for md in (0, 3)
]


@pytest.mark.parametrize("grow_policy,score,gen,min_data", CONFIGS)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_single_tree_matches_oracle(grow_policy, score, gen, min_data, seed):
    rng = np.random.default_rng(seed)
    N = int(rng.integers(24, 70))
    F = int(rng.integers(1, 6))
    O = int(rng.integers(1, 4))
    D = int(rng.integers(1, 4))
    B = int(rng.integers(4, 9))
    X = rng.normal(size=(N, F)).astype(np.float32)
    # duplicate some feature values to exercise equal-candidate paths
    X[: N // 3, 0] = np.round(X[: N // 3, 0])
    g = rng.normal(size=(N, O)).astype(np.float32)
    fw = rng.uniform(0.5, 2.0, size=F).astype(np.float32)

    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=D, n_bins=B, min_data_in_leaf=min_data,
                     grow_policy=grow_policy, split_score_func=score,
                     generator_type=gen)

    # oracle: build_grads standardized for L2 (fitter.cpp:58-64)
    if score == "l2":
        mu = g.astype(np.float64).mean(axis=0)
        centered = g - mu
        std = np.sqrt((centered ** 2).sum(axis=0) / max(N - 1, 1))
        std[std == 0] = 1.0
        bg = (centered / std).astype(np.float32)
    else:
        bg = g
    cands_np = (quantile_candidates_np(X, B) if gen == "quantile"
                else uniform_candidates_np(X, B))
    ocfg = dict(max_depth=D, min_data_in_leaf=min_data,
                grow_policy=grow_policy, score=score)
    root = fit_tree_oracle(X, g.astype(np.float64), bg.astype(np.float64),
                           cands_np, ocfg, fw)
    V_oracle = tree_leaf_values_per_sample(root, X)

    # JAX path
    Xj = jnp.asarray(X)
    gj = jnp.asarray(g)
    w = jnp.ones(N, dtype=jnp.float32)
    bgj = standardize_l2(gj, w) if score == "l2" else gj
    cand_vals = numerical_candidates(cfg, Xj)
    # candidate grids must agree first
    cand_grid_np = np.asarray(cand_vals)
    for f in range(F):
        expected = [v for (ff, v) in cands_np if ff == f]
        np.testing.assert_allclose(cand_grid_np[f], expected, rtol=0,
                                   atol=0, err_msg=f"feature {f} candidates")
    Xb = bucketize(Xj, cand_vals)
    tree = build_tree(cfg, Xb, cand_vals, gj, bgj, w, jnp.asarray(fw))
    V_jax = jax_tree_leaf_values(cfg, tree, X)

    np.testing.assert_allclose(V_jax, V_oracle, rtol=2e-4, atol=2e-5)
