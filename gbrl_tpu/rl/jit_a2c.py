"""Fully device-resident A2C update: gradient computation + one boosting
step in a single jit call that also returns the new tree for the host
mirror.

The facade path (rl/a2c.py learn()) re-enters the device 3-4 times per
iteration — full-ensemble predict with Adam (sync + fetch), boosting step
(h2d + dispatch), and the mirror's post-update tree sync (fetch).  On a
tunneled TPU each sync costs ~20-50ms, and A2C fits exactly ONE tree per
rollout, so round trips dominate the measured 300k-step CartPole wall
(~347ms/iter, vs the reference C++'s in-process ~26ms).  This program ships
the rollout once, computes the A2C loss gradients on device, runs
boost_step's exact semantics (control variates -> candidates from the full
batch -> fit -> append, ops/boosting.py:63-92), and returns the fitted
tree's arrays so the host mirror is updated from the SAME fetch — one round
trip per iteration total.

Semantics match the torch facade path (rl/a2c.py:119-136): weighted
advantage normalization over the valid mask (torch unbiased std), policy
loss + ent_coef * entropy loss + vf_coef * 0.5 * value MSE, gradients
scaled by the FULL row count n (models/actor_critic.py:132-137 harvest
convention; autoreset rows get zero gradient but stay in the fit batch,
exactly like the facade).  Reference: gbrl.cpp:939-981 (step dispatch),
fitter.cpp:50-115 (step_cpu), fitter.cpp:585-633 (control variates).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TreeConfig
from ..ensemble import Ensemble, ensure_capacity
from ..optimizers import OptimizerSpec, adam_delta
from ..ops.boosting import (apply_control_variates, predict_sgd, write_tree)
from ..ops.candidates import bucketize, numerical_candidates
from ..ops.fit import build_tree, standardize_l2


class A2CHyper(NamedTuple):
    """Static A2C hyperparameters (jit cache key)."""
    n_actions: int
    ent_coef: float
    vf_coef: float
    normalize_advantage: bool


@functools.partial(jax.jit, static_argnums=(0, 1, 8), donate_argnums=(2,))
def a2c_update(cfg: TreeConfig, hp: A2CHyper, ens: Ensemble, X: jax.Array,
               actions: jax.Array, adv: jax.Array, ret: jax.Array,
               valid: jax.Array, specs: Tuple[OptimizerSpec, ...],
               feat_w: jax.Array):
    """One A2C boosting step on device.  Returns (ens, tree, stats)."""
    na = hp.n_actions
    N = X.shape[0]

    preds = predict_sgd(cfg, ens, X, specs, 0, ens.capacity)
    for spec in specs:
        if spec.algo == "Adam":
            preds = preds - adam_delta(cfg, ens, X, spec, 0, ens.capacity)

    w = valid
    nw = jnp.maximum(jnp.sum(w), 1.0)
    adv_n = adv
    if hp.normalize_advantage:
        m = jnp.sum(adv_n * w) / nw
        var = jnp.sum(w * (adv_n - m) ** 2) / jnp.maximum(nw - 1.0, 1.0)
        adv_n = (adv_n - m) / (jnp.sqrt(var) + 1e-8)

    def loss_fn(p):
        theta = p[:, :na]
        v = p[:, na]
        logp_all = jax.nn.log_softmax(theta, axis=-1)
        lp = jnp.take_along_axis(logp_all, actions[:, None], axis=1)[:, 0]
        policy_loss = -jnp.sum(w * adv_n * lp) / nw
        ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
        entropy_loss = -jnp.sum(w * ent) / nw
        value_loss = hp.vf_coef * 0.5 * jnp.sum(w * (ret - v) ** 2) / nw
        total = policy_loss + hp.ent_coef * entropy_loss + value_loss
        return total, (policy_loss, value_loss, jnp.sum(w * ent) / nw)

    (_, (ploss, vloss, ent_mean)), g = jax.value_and_grad(
        loss_fn, has_aux=True)(preds)
    grads = g * N                      # facade harvest: mean-loss grad * n

    # ---- boost_step semantics (ops/boosting.py:63-92), numeric-only
    sample_w = jnp.ones(N, dtype=jnp.float32)
    if cfg.use_control_variates:
        grads = apply_control_variates(cfg, ens, X, grads, sample_w)
    build = standardize_l2(grads, sample_w) if cfg.score == "l2" else grads
    cand_vals = numerical_candidates(cfg, X)
    Xb = bucketize(X, cand_vals)
    tree = build_tree(cfg, Xb, cand_vals, grads, build, sample_w, feat_w)
    new_ens = write_tree(ens, tree, ens.n_trees)

    stats = dict(policy_loss=ploss, value_loss=vloss, entropy=ent_mean)
    return new_ens, tree, stats


def run_a2c_update(learner, obs: np.ndarray, actions: np.ndarray,
                   adv: np.ndarray, ret: np.ndarray, valid: np.ndarray,
                   hp: A2CHyper, mirror=None) -> dict:
    """Host wrapper: ship the rollout, run the fused step, and (optionally)
    append the returned tree to the host mirror without a second fetch.
    Updates the learner in place; returns the stats dict."""
    Xn, Xc = learner._prepare(obs, grow_vocab=False)
    assert Xc is None, "jit A2C update supports numerical features only"
    # host-side tree counter: int(ens.n_trees) is a device fetch — a full
    # tunnel round trip per iteration (rl loops own the only mutation path
    # while training, so the count is exactly tracked on host)
    nt = getattr(learner, "_rl_host_n_trees", None)
    if nt is None:
        nt = int(learner.ens.n_trees)
    learner.ens = ensure_capacity(learner.ens, nt + 1)
    learner._rl_host_n_trees = nt + 1
    new_ens, tree, stats = a2c_update(
        learner.cfg, hp, learner.ens, Xn,
        jnp.asarray(np.asarray(actions).astype(np.int32)),
        jnp.asarray(adv), jnp.asarray(ret),
        jnp.asarray(valid.astype(np.float32)),
        learner.specs, learner._internal_feature_weights())
    learner.ens = new_ens
    learner.total_iterations += 1
    learner._pred_cache = None
    if mirror is not None:
        payload, stats = jax.device_get((tree, stats))
        mirror.append_tree(payload)
    else:
        stats = jax.device_get(stats)
    return {k: float(v) for k, v in stats.items()}
