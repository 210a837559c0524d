"""Categorical feature support: fitter parity vs the mixed oracle, the
vocabulary encoding path, and the reference's categorical convergence test
(104-sample real-estate set, RMSE < 5000, test_gbt_single.py:140-152)."""
import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest
import torch as th
from torch.nn.functional import mse_loss

sys.path.insert(0, str(Path(__file__).parent.parent))

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.ops.boosting import boost_step
from gbrl_tpu.ops.candidates import (categorical_candidate_mask,
                                     numerical_candidates, bucketize)
from gbrl_tpu.ops.fit import build_tree, standardize_l2
from gbrl_tpu.models.gbt import GBTModel

from oracle import (categorical_candidates_np, fit_tree_oracle_mixed,
                    quantile_candidates_np,
                    tree_leaf_values_per_sample_mixed)


def jax_tree_leaf_values_mixed(cfg, tree, X, Xc):
    feat = np.asarray(tree["feat"])
    thr = np.asarray(tree["thr"])
    code = np.asarray(tree["cat_code"])
    is_num = np.asarray(tree["is_numeric"])
    is_split = np.asarray(tree["is_split"])
    lv = np.asarray(tree["leaf_values"])
    N = X.shape[0] if X is not None else Xc.shape[0]
    out = np.zeros((N, lv.shape[1]))
    for i in range(N):
        p = 0
        for _ in range(cfg.max_depth):
            if is_split[p]:
                if is_num[p]:
                    go = X[i, feat[p]] > thr[p]
                else:
                    go = Xc[i, feat[p]] == code[p]
            else:
                go = False
            p = 2 * p + 1 + int(go)
    # recompute leaf index properly per sample
        out[i] = lv[p - (cfg.n_leaves - 1)]
    return out


@pytest.mark.parametrize("grow_policy,score", [
    ("greedy", "cosine"), ("greedy", "l2"),
    ("oblivious", "cosine"), ("oblivious", "l2"),
])
@pytest.mark.parametrize("seed", [0, 1])
def test_mixed_tree_matches_oracle(grow_policy, score, seed):
    rng = np.random.default_rng(seed)
    N, F, Fc, O, D, B = 50, 3, 2, 2, 3, 6
    n_codes_per_f = 4
    X = rng.normal(size=(N, F)).astype(np.float32)
    Xc = rng.integers(0, n_codes_per_f, size=(N, Fc)).astype(np.int32)
    g = rng.normal(size=(N, O)).astype(np.float32)
    fw = rng.uniform(0.5, 2.0, size=F).astype(np.float32)
    fwc = rng.uniform(0.5, 2.0, size=Fc).astype(np.float32)

    cfg = TreeConfig(input_dim=F + Fc, output_dim=O, n_num_features=F,
                     n_cat_features=Fc, max_depth=D, n_bins=B,
                     grow_policy=grow_policy, split_score_func=score,
                     generator_type="quantile")

    if score == "l2":
        mu = g.astype(np.float64).mean(axis=0)
        centered = g - mu
        std = np.sqrt((centered ** 2).sum(axis=0) / (N - 1))
        std[std == 0] = 1.0
        bg = (centered / std).astype(np.float32)
    else:
        bg = g
    norms = (g.astype(np.float64) ** 2).sum(axis=1)

    num_cands = [("num", f, v) for (f, v) in quantile_candidates_np(X, B)]
    cat_cands = categorical_candidates_np(Xc, norms, B)
    assert len(cat_cands) <= Fc * B, "test setup: no top-k truncation"
    ocfg = dict(max_depth=D, min_data_in_leaf=0, grow_policy=grow_policy,
                score=score)
    root = fit_tree_oracle_mixed(X, Xc, g.astype(np.float64),
                                 bg.astype(np.float64),
                                 num_cands + cat_cands, ocfg, fw, fwc)
    V_oracle = tree_leaf_values_per_sample_mixed(root, X, Xc)

    Xj = jnp.asarray(X)
    Xcj = jnp.asarray(Xc)
    gj = jnp.asarray(g)
    w = jnp.ones(N, dtype=jnp.float32)
    bgj = standardize_l2(gj, w) if score == "l2" else gj
    cand_vals = numerical_candidates(cfg, Xj)
    Xb = bucketize(Xj, cand_vals)
    V = 8   # padded code space
    cat_valid = categorical_candidate_mask(
        Xcj, jnp.sum(gj * gj, axis=-1), B, V)
    tree = build_tree(cfg, Xb, cand_vals, gj, bgj, w, jnp.asarray(fw),
                      Xcj, cat_valid, jnp.asarray(fwc))
    V_jax = jax_tree_leaf_values_mixed(cfg, tree, X, Xc)
    np.testing.assert_allclose(V_jax, V_oracle, rtol=2e-4, atol=2e-5)


def test_top_k_truncation_rule():
    """When uniques exceed n_cat*n_bins only the top by avg grad norm stay."""
    rng = np.random.default_rng(0)
    N, Fc = 200, 2
    Xc = rng.integers(0, 16, size=(N, Fc)).astype(np.int32)
    norms = rng.uniform(0.1, 10.0, size=N).astype(np.float32)
    n_bins = 4          # limit = 8 < ~32 uniques
    mask = np.asarray(categorical_candidate_mask(
        jnp.asarray(Xc), jnp.asarray(norms), n_bins, 16))
    assert mask.sum() == Fc * n_bins
    # every selected avg must be >= every unselected (present) avg
    sums = np.zeros((Fc, 16)); cnts = np.zeros((Fc, 16))
    for f in range(Fc):
        for i in range(N):
            sums[f, Xc[i, f]] += norms[i]
            cnts[f, Xc[i, f]] += 1
    avg = np.where(cnts > 0, sums / np.maximum(cnts, 1), -np.inf)
    assert avg[mask].min() >= avg[(~mask) & (cnts > 0)].max() - 1e-6


CATEGORICAL_INPUTS_HEAD = [
    [643.09, "2015", "No sea view"], [656.22, "2009", "No sea view"],
    [487.29, "2018", "Sea view"], [1504.75, "2015", "No sea view"],
    [1275.46, "2009", "Sea view"], [575.19, "2006", "Sea view"],
    [570.89, "2015", "Sea view"], [620.82, "2006", "No sea view"],
]


def test_model_categorical_convergence():
    """Mixed numeric/categorical object-array input through the full model
    API (analog of the reference's real-estate test)."""
    rng = np.random.default_rng(0)
    n = 104
    sqm = rng.uniform(400, 2000, n).round(2)
    year = rng.choice(["2006", "2009", "2015", "2018"], n)
    view = rng.choice(["Sea view", "No sea view"], n)
    price = (sqm * 3 + (year.astype(int) - 2000) * 50
             + (view == "Sea view") * 1000 + rng.normal(0, 50, n))
    X = np.empty((n, 3), dtype=object)
    X[:, 0] = sqm
    X[:, 1] = year
    X[:, 2] = view
    y = price.astype(np.float32)[:, None]

    model = GBTModel(tree_struct={"max_depth": 4, "n_bins": 16,
                                  "min_data_in_leaf": 0},
                     input_dim=3, output_dim=1,
                     optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0,
                                 "stop_idx": 1},
                     params={"split_score_func": "cosine"}, device="cpu")
    model.set_bias_from_targets(y)
    y_t = th.tensor(y, dtype=th.float32).squeeze()
    for _ in range(40):
        y_pred = model(X, requires_grad=True)
        loss = 0.5 * mse_loss(y_pred, y_t)
        loss.backward()
        model.step()
    y_pred = model(X)
    final = (0.5 * mse_loss(y_pred, y_t)).sqrt().item()
    assert final < 5000, f"categorical model loss {final} >= 5000"
    # prediction with unseen categories must not crash (routes left)
    X2 = X.copy()
    X2[0, 2] = "Mountain view"
    out = model(X2, requires_grad=False, tensor=False)
    assert np.isfinite(out).all()


def test_categorical_supervised_fit():
    """Supervised fit with mixed inputs (fitter.cpp:152-163: categorical
    candidates chosen once from initial residual norms)."""
    rng = np.random.default_rng(1)
    n = 104
    sqm = rng.uniform(400, 2000, n).round(2)
    year = rng.choice(["2006", "2009", "2015", "2018"], n)
    view = rng.choice(["Sea view", "No sea view"], n)
    price = (sqm * 3 + (year.astype(int) - 2000) * 50
             + (view == "Sea view") * 1000 + rng.normal(0, 50, n))
    X = np.empty((n, 3), dtype=object)
    X[:, 0], X[:, 1], X[:, 2] = sqm, year, view
    y = price.astype(np.float32)[:, None]
    model = GBTModel(tree_struct={"max_depth": 4, "n_bins": 16},
                     input_dim=3, output_dim=1,
                     optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0,
                                 "stop_idx": 1},
                     params={"split_score_func": "cosine"}, device="cpu")
    loss = model.fit(X, y, 40)
    assert loss < 1000, f"categorical supervised fit loss {loss}"
    assert model.get_num_trees() == 40
