"""Device-resident SAC train step: target computation, both critic boosting
steps, and the actor boosting step run inside ONE jit call.

The facade path (rl/sac.py train_step) makes ~10 synchronous device calls
per gradient step (2 target predicts, 2 critic forwards, 2 critic boosts,
2 critic re-predicts for the actor, 1 actor forward, 1 actor boost); on a
tunneled TPU each sync costs ~20ms.  This program ships one minibatch and
returns three updated ensembles plus the statistics the host needs for the
(torch-side) temperature update.

Semantics follow rl/sac.py exactly — same ordering (critics first, actor
against the UPDATED critics), same tanh-Gaussian log-prob, same parametric
Q-forms (reference gbrl/models/critic.py:42-54), same per-sample-block
gradient clipping, same ensemble-prefix targets (critic.py:165-193).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TreeConfig
from ..ensemble import Ensemble, ensure_capacity
from ..optimizers import OptimizerSpec
from ..ops.boosting import _masked_candidates, predict_sgd, write_tree
from ..ops.candidates import bucketize
from ..ops.fit import build_tree, standardize_l2
from .jit_update import _block_clip

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class SACHyper(NamedTuple):
    """Static SAC hyperparameters (jit cache key).

    The bootstrap discount is NOT here: it rides per-sample (``discs`` =
    gamma^k for k-step transitions, rl/buffers.NStepAccumulator)."""
    act_dim: int
    q_func_type: str      # 'linear' | 'quadratic' | 'tanh'
    max_grad_norm: float  # 0.0 = off


def q_jax(w: jax.Array, b: jax.Array, a: jax.Array, qtype: str) -> jax.Array:
    """Q(theta, a) for the parametric forms (mirrors rl/sac.q_from_params)."""
    s = jnp.sum(w * a, axis=-1)
    if qtype == "linear":
        return s + b[:, 0]
    if qtype == "quadratic":
        return -((s - b[:, 0]) ** 2) + b[:, 1]
    if qtype == "tanh":
        return b[:, 0] * jnp.tanh(s)
    raise ValueError(qtype)


def sample_squashed(mu: jax.Array, log_std: jax.Array, eps: jax.Array):
    """a = tanh(mu + std*eps) and its log-prob with the tanh correction
    (mirrors rl/sac.squashed_gaussian_sample)."""
    log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
    std = jnp.exp(log_std)
    u = mu + std * eps
    a = jnp.tanh(u)
    logp = jnp.sum(-0.5 * ((u - mu) / std) ** 2 - log_std
                   - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)
    logp = logp - jnp.sum(jnp.log(1.0 - a ** 2 + 1e-6), axis=-1)
    return a, logp


def _boost(cfg: TreeConfig, ens: Ensemble, X: jax.Array, grads: jax.Array,
           feat_w: jax.Array) -> Ensemble:
    """Append one tree fit on grads (numeric features; full batch)."""
    N = X.shape[0]
    w = jnp.ones((N,), dtype=jnp.float32)
    build = standardize_l2(grads, w) if cfg.score == "l2" else grads
    cand_vals = _masked_candidates(cfg, X, jnp.int32(N))
    Xb = bucketize(X, cand_vals)
    tree = build_tree(cfg, Xb, cand_vals, grads, build, w, feat_w)
    return write_tree(ens, tree, ens.n_trees)


def _critic_wb(hp: SACHyper, theta: jax.Array):
    return theta[:, :hp.act_dim], theta[:, hp.act_dim:]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   donate_argnums=(4, 5))
def sac_train_step(acfg: TreeConfig, ccfg: TreeConfig, hp: SACHyper,
                   specs: Tuple[Tuple[OptimizerSpec, ...], ...],
                   actor_ens: Ensemble, critic_ens: Tuple[Ensemble, ...],
                   prefixes: jax.Array, obs: jax.Array, actions: jax.Array,
                   rewards: jax.Array, next_obs: jax.Array, dones: jax.Array,
                   discs: jax.Array, alpha: jax.Array, feat_w: jax.Array,
                   key: jax.Array):
    """One SAC gradient step on device.

    specs = (actor_specs, critic_specs); prefixes [n_critics] target-network
    tree prefixes.  Returns (actor_ens, critic_ens tuple, stats dict)."""
    actor_specs, critic_specs = specs
    A = hp.act_dim
    N = obs.shape[0]
    k_next, k_cur = jax.random.split(key)

    def actor_forward(X, k):
        th = predict_sgd(acfg, actor_ens, X, actor_specs, 0,
                         actor_ens.capacity)
        mu, log_std = th[:, :A], th[:, A:]
        eps = jax.random.normal(k, mu.shape)
        return sample_squashed(mu, log_std, eps)

    # ---- target: y = R + disc * (1 - d) * (min_i Q_i^target - alpha lp')
    na, nlogp = actor_forward(next_obs, k_next)
    tqs = []
    for ens, pref in zip(critic_ens, range(len(critic_ens))):
        th_t = predict_sgd(ccfg, ens, next_obs, critic_specs, 0,
                           prefixes[pref])
        w, b = _critic_wb(hp, th_t)
        tqs.append(q_jax(w, b, na, hp.q_func_type))
    qmin_t = jnp.min(jnp.stack(tqs, 0), axis=0)
    y = rewards + discs * (1.0 - dones) * (qmin_t - alpha * nlogp)
    y = jax.lax.stop_gradient(y)

    # ---- critic boosting steps: grads of 0.5*(Q - y)^2 w.r.t. theta
    new_critics = []
    closses = []
    for ens in critic_ens:
        theta = predict_sgd(ccfg, ens, obs, critic_specs, 0, ens.capacity)

        def closs_fn(th_):
            w, b = _critic_wb(hp, th_)
            q = q_jax(w, b, actions, hp.q_func_type)
            return 0.5 * jnp.mean((q - y) ** 2)

        loss, g = jax.value_and_grad(closs_fn)(theta)
        g = g * N
        if hp.max_grad_norm:
            g = jnp.concatenate(
                [_block_clip(g[:, :A], hp.max_grad_norm),
                 _block_clip(g[:, A:], hp.max_grad_norm)], axis=1)
        new_critics.append(_boost(ccfg, ens, obs, g, feat_w))
        closses.append(loss)

    # ---- actor boosting step against the UPDATED critics
    theta_a = predict_sgd(acfg, actor_ens, obs, actor_specs, 0,
                          actor_ens.capacity)
    eps = jax.random.normal(k_cur, (N, A))

    qthetas = []
    for ens in new_critics:
        th_c = predict_sgd(ccfg, ens, obs, critic_specs, 0, ens.capacity)
        qthetas.append(jax.lax.stop_gradient(th_c))

    def aloss_fn(th_):
        mu, log_std = th_[:, :A], th_[:, A:]
        a, logp = sample_squashed(mu, log_std, eps)
        qs = [q_jax(*_critic_wb(hp, qt), a, hp.q_func_type)
              for qt in qthetas]
        qmin = jnp.min(jnp.stack(qs, 0), axis=0)
        return jnp.mean(alpha * logp - qmin), logp

    (aloss, logp_cur), ga = jax.value_and_grad(aloss_fn, has_aux=True)(
        theta_a)
    ga = ga * N
    if hp.max_grad_norm:
        ga = jnp.concatenate(
            [_block_clip(ga[:, :A], hp.max_grad_norm),
             _block_clip(ga[:, A:], hp.max_grad_norm)], axis=1)
    new_actor = _boost(acfg, actor_ens, obs, ga, feat_w)

    stats = dict(critic_loss=jnp.mean(jnp.stack(closses)),
                 actor_loss=aloss, logp_mean=jnp.mean(logp_cur))
    return new_actor, tuple(new_critics), stats


def run_sac_train_step(algo, obs, actions, rewards, next_obs, dones,
                       discs, key) -> dict:
    """Host wrapper: grow capacities, run the fused step, sync the stats,
    and apply the ensemble-prefix target update + torch alpha update."""
    actor_lr = algo.actor.learner
    critic_lrs = [c.learner for c in algo.critics]
    hp = SACHyper(act_dim=algo.act_dim, q_func_type=algo.q_func_type,
                  max_grad_norm=algo.max_grad_norm or 0.0)

    # host-side tree counters: int(ens.n_trees)/get_num_trees are device
    # fetches (a tunnel round trip each, x3 ensembles per gradient step)
    for lr in [actor_lr] + critic_lrs:
        nt = getattr(lr, "_rl_host_n_trees", None)
        if nt is None:
            nt = int(lr.ens.n_trees)
        lr.ens = ensure_capacity(lr.ens, nt + 1)
        lr._rl_host_n_trees = nt + 1

    Xn, Xc = actor_lr._prepare(obs, grow_vocab=False)
    assert Xc is None, "jit SAC supports numerical features only"
    Xn_next, _ = actor_lr._prepare(next_obs, grow_vocab=False)

    prefixes = jnp.asarray([c.target_prefix for c in algo.critics],
                           dtype=jnp.int32)
    specs = (actor_lr.specs, critic_lrs[0].specs)
    new_actor, new_critics, stats = sac_train_step(
        actor_lr.cfg, critic_lrs[0].cfg, hp, specs,
        actor_lr.ens, tuple(lr.ens for lr in critic_lrs), prefixes,
        Xn, jnp.asarray(actions), jnp.asarray(rewards), Xn_next,
        jnp.asarray(dones), jnp.asarray(discs), jnp.float32(algo.alpha),
        actor_lr._internal_feature_weights(), key)

    actor_lr.ens = new_actor
    actor_lr.total_iterations += 1
    actor_lr._pred_cache = None
    for lr, ens, critic in zip(critic_lrs, new_critics, algo.critics):
        lr.ens = ens
        lr.total_iterations += 1
        lr._pred_cache = None
        n_trees = lr._rl_host_n_trees
        if (n_trees % critic.target_update_interval) == 0:
            critic.target_prefix = n_trees

    out = {k: float(v) for k, v in jax.device_get(stats).items()}
    if algo.auto_alpha:
        import torch as th
        algo.alpha_opt.zero_grad()
        alpha_loss = -(algo.log_alpha
                       * (out["logp_mean"] + algo.target_entropy))
        alpha_loss.backward()
        algo.alpha_opt.step()
    return out
