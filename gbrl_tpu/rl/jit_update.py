"""Fully device-resident PPO update: all epochs x minibatches of one update
phase run inside a single jit call.

Motivation: the facade path (rl/ppo.py update()) re-enters the device per
minibatch — predict (sync) + boost step (sync + h2d) — and on a tunneled
TPU each sync costs ~20ms, so a 4-epoch x 8-minibatch update spends ~1.4s
in round trips alone.  This loop transfers the rollout once, runs
predict -> PPO-loss gradients -> build-tree -> incremental-prediction
inside ``lax.fori_loop`` (the same shape as ops/boosting.fit_loop, which
does it for supervised MultiRMSE), and syncs once at the end.

Semantics match the torch facade path: clipped surrogate + entropy bonus
on the policy columns, 0.5 * vf_coef * MSE on the value column
(rl/ppo.py update()), gradients scaled by the minibatch size exactly like
``params.grad.detach() * n`` harvesting (models/gbt.py step; reference
gbt.py:174), per-minibatch candidate generation as in Fitter::step_cpu
(reference fitter.cpp:50-115).  Gradient-norm clipping per sample block
mirrors common.utils.clip_grad_norm (reference utils.py:270-295).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TreeConfig
from ..ensemble import Ensemble, ensure_capacity
from ..optimizers import OptimizerSpec, scheduler_lr
from ..ops.boosting import _masked_candidates, predict_sgd, write_tree
from ..ops.candidates import bucketize
from ..ops.fit import build_tree, standardize_l2
from ..ops.predict import single_tree_leaf_values


class PPOHyper(NamedTuple):
    """Static PPO hyperparameters (part of the jit cache key)."""
    n_actions: int
    clip_range: float
    ent_coef: float
    vf_coef: float
    normalize_advantage: bool
    policy_clip: float   # 0.0 = off
    value_clip: float    # 0.0 = off


def _block_clip(g: jax.Array, max_norm: float) -> jax.Array:
    """Per-sample L2 clip of a gradient block (common.utils.clip_grad_norm)."""
    if not max_norm:
        return g
    norms = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    scale = jnp.minimum(1.0, max_norm / (norms + 1e-8))
    return g * scale


def ppo_minibatch_grads(hp: PPOHyper, preds: jax.Array, actions: jax.Array,
                        old_logp: jax.Array, adv: jax.Array, ret: jax.Array,
                        w: jax.Array) -> jax.Array:
    """Per-sample boosting gradients of the PPO objective w.r.t. the raw
    ensemble outputs [mb, na+1] (policy logits | value), already scaled by
    the real minibatch size (grad-harvest convention: mean-loss grad * n)."""
    na = hp.n_actions
    n_real = jnp.maximum(jnp.sum(w), 1.0)

    if hp.normalize_advantage:
        m = jnp.sum(adv * w) / n_real
        # torch .std() is unbiased (n-1)
        var = jnp.sum(w * (adv - m) ** 2) / jnp.maximum(n_real - 1.0, 1.0)
        adv = (adv - m) / (jnp.sqrt(var) + 1e-8)

    def loss_fn(p):
        theta = p[:, :na]
        v = p[:, na]
        logp_all = jax.nn.log_softmax(theta, axis=-1)
        lp = jnp.take_along_axis(logp_all, actions[:, None], axis=1)[:, 0]
        ratio = jnp.exp(lp - old_logp)
        pg1 = adv * ratio
        pg2 = adv * jnp.clip(ratio, 1.0 - hp.clip_range, 1.0 + hp.clip_range)
        policy_term = -jnp.minimum(pg1, pg2)
        ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
        value_term = hp.vf_coef * 0.5 * (ret - v) ** 2
        per_sample = policy_term - hp.ent_coef * ent + value_term
        return jnp.sum(per_sample * w) / n_real

    g = jax.grad(loss_fn)(preds) * n_real * w[:, None]
    if hp.policy_clip or hp.value_clip:
        g = jnp.concatenate([_block_clip(g[:, :na], hp.policy_clip),
                             _block_clip(g[:, na:], hp.value_clip)], axis=1)
    return g


def _lr_columns(specs: Tuple[OptimizerSpec, ...], output_dim: int, t):
    """-lr per output column at tree index t (SGD-only)."""
    coeff = jnp.zeros((output_dim,), dtype=jnp.float32)
    j = jnp.arange(output_dim)
    for spec in specs:
        mask = ((j >= spec.start_idx) & (j < spec.stop_idx)
                ).astype(jnp.float32)
        coeff = coeff - scheduler_lr(spec, t) * mask
    return coeff


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 11),
                   donate_argnums=(3,))
def ppo_update_loop(cfg: TreeConfig, hp: PPOHyper, n_updates: int,
                    ens: Ensemble, X: jax.Array, mb_idx: jax.Array,
                    mb_n: jax.Array, actions: jax.Array, old_logp: jax.Array,
                    adv: jax.Array, ret: jax.Array,
                    specs: Tuple[OptimizerSpec, ...],
                    feat_w: jax.Array,
                    valid: Optional[jax.Array] = None
                    ) -> Tuple[Ensemble, jax.Array]:
    """Run ``n_updates`` PPO minibatch boosting steps on device.

    X [B, F] rollout observations; mb_idx [U, mb] row indices into X (rows
    past mb_n[u] are padding and masked); actions/old_logp/adv/ret [B].
    Predictions over the full rollout are maintained incrementally: after
    each new tree only that tree is evaluated on X (leaf values are
    immutable once fit), exactly like ops/boosting.fit_loop.
    Returns (ensemble, [U] policy-entropy trace for diagnostics)."""
    B = X.shape[0]
    O = cfg.output_dim
    mb = mb_idx.shape[1]
    n_trees0 = ens.n_trees

    preds0 = predict_sgd(cfg, ens, X, specs, 0, n_trees0)

    def body(u, carry):
        ens, preds_full, ent_trace = carry
        idx = jax.lax.dynamic_slice(mb_idx, (u, 0), (1, mb))[0]
        n_u = mb_n[u]
        w = (jnp.arange(mb) < n_u).astype(jnp.float32)
        if valid is not None:
            # autoreset rows (rl/buffers.py flat()) are excluded
            w = w * jnp.take(valid, idx)

        Xmb = jnp.take(X, idx, axis=0)
        pmb = jnp.take(preds_full, idx, axis=0)
        amb = jnp.take(actions, idx)
        ompb = jnp.take(old_logp, idx)
        advmb = jnp.take(adv, idx)
        retmb = jnp.take(ret, idx)

        grads = ppo_minibatch_grads(hp, pmb, amb, ompb, advmb, retmb, w)

        build = standardize_l2(grads, w) if cfg.score == "l2" else grads
        cand_vals = _masked_candidates(cfg, Xmb, n_u)
        Xb = bucketize(Xmb, cand_vals)
        tree = build_tree(cfg, Xb, cand_vals, grads, build, w, feat_w)
        t_idx = n_trees0 + u
        ens = write_tree(ens, tree, t_idx)

        v_new = single_tree_leaf_values(cfg, tree, X)
        preds_full = preds_full + _lr_columns(specs, O, t_idx)[None, :] * v_new

        # mean policy entropy of this minibatch (diagnostic)
        logp_all = jax.nn.log_softmax(pmb[:, :hp.n_actions], axis=-1)
        ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
        ent_trace = ent_trace.at[u].set(
            jnp.sum(ent * w) / jnp.maximum(jnp.sum(w), 1.0))
        return ens, preds_full, ent_trace

    ent0 = jnp.zeros((n_updates,), dtype=jnp.float32)
    ens, _, ent_trace = jax.lax.fori_loop(0, n_updates, body,
                                          (ens, preds0, ent0))
    return ens, ent_trace


def run_ppo_update(learner, obs: np.ndarray, actions: np.ndarray,
                   old_log_probs: np.ndarray, advantages: np.ndarray,
                   returns: np.ndarray, hp: PPOHyper, n_epochs: int,
                   batch_size: int, rng,
                   valid: Optional[np.ndarray] = None) -> np.ndarray:
    """Host wrapper: build the epoch/minibatch index plan, ship the rollout
    once, run the device loop, sync once.  Updates the learner in place."""
    n = len(obs)
    bs = min(batch_size, n)
    per_epoch = (n + bs - 1) // bs
    U = n_epochs * per_epoch
    mb_idx = np.zeros((U, bs), dtype=np.int32)
    mb_n = np.zeros((U,), dtype=np.int32)
    u = 0
    for _ in range(n_epochs):
        perm = rng.permutation(n)
        for start in range(0, n, bs):
            sl = perm[start:start + bs]
            mb_idx[u, :len(sl)] = sl
            mb_n[u] = len(sl)
            u += 1
    # the facade path skips minibatches of < 2 samples (rl/ppo.py)
    keep = mb_n >= 2
    mb_idx, mb_n = mb_idx[keep], mb_n[keep]
    U = int(keep.sum())

    Xn, Xc = learner._prepare(obs, grow_vocab=False)
    assert Xc is None, "jit PPO update supports numerical features only"
    # host-side tree counter: int(ens.n_trees) is a device fetch (a full
    # tunnel round trip per update phase); the RL loop owns the only
    # mutation path while training
    nt = getattr(learner, "_rl_host_n_trees", None)
    if nt is None:
        nt = int(learner.ens.n_trees)
    learner.ens = ensure_capacity(learner.ens, nt + U)
    learner._rl_host_n_trees = nt + U
    fw = learner._internal_feature_weights()
    learner.ens, ent_trace = ppo_update_loop(
        learner.cfg, hp, U, learner.ens, Xn, jnp.asarray(mb_idx),
        jnp.asarray(mb_n), jnp.asarray(actions.astype(np.int32)),
        jnp.asarray(old_log_probs), jnp.asarray(advantages),
        jnp.asarray(returns), learner.specs, fw,
        None if valid is None
        else jnp.asarray(valid.astype(np.float32)))
    learner.total_iterations += U
    learner._pred_cache = None
    return np.asarray(ent_trace)
