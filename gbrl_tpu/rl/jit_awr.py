"""Device-resident AWR update phase: every critic regression step and every
advantage-weighted actor step of one iteration runs inside a single jit
call (the facade path in rl/awr.py makes ~2 synchronous device calls per
update — ~20-40 round trips per rollout on a tunneled TPU).

Semantics mirror rl/awr.py learn(): critic minibatch regression on
bootstrapped returns (one tree per step), then actor advantage-weighted
log-prob regression with batch-standardized advantages (population std,
matching the facade's np.std) against the UPDATED critic.
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
from ..ops.boosting import predict_sgd
from .jit_sac import _boost


class AWRHyper(NamedTuple):
    act_dim: int
    beta: float
    max_weight: float
    learn_std: bool = True
    log_std_init: float = -0.5
    grad_clip: float = 10.0   # per-sample L2 clip of actor grads (0 = off)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   donate_argnums=(5, 6))
def awr_update_loop(acfg: TreeConfig, ccfg: TreeConfig, hp: AWRHyper,
                    specs: Tuple[Tuple[OptimizerSpec, ...], ...],
                    n_updates: Tuple[int, int],
                    actor_ens: Ensemble, critic_ens: Ensemble,
                    X: jax.Array, acts: jax.Array, rets: jax.Array,
                    advs: jax.Array,
                    cmb_idx: jax.Array, amb_idx: jax.Array,
                    feat_w: jax.Array):
    """X [B, F] replay observations; acts [B, A]; rets [B] TD(lambda)
    critic targets; advs [B] stored TD(lambda) advantages (computed at
    collection time, rl/awr.py _td_lambda); cmb_idx [Kc, mb] / amb_idx
    [Ka, mb] minibatch row plans.  Returns
    (actor_ens, critic_ens, (critic_loss_trace, actor_loss_trace))."""
    actor_specs, critic_specs = specs
    Kc, Ka = n_updates
    A = hp.act_dim
    mb = cmb_idx.shape[1]

    # ---- critic: one regression tree per minibatch step
    def cbody(k, carry):
        ens, trace = carry
        idx = jax.lax.dynamic_slice(cmb_idx, (k, 0), (1, mb))[0]
        Xmb = jnp.take(X, idx, axis=0)
        r = jnp.take(rets, idx)
        v = predict_sgd(ccfg, ens, Xmb, critic_specs, 0, ens.capacity)[:, 0]
        g = (v - r)[:, None]          # d/dv[0.5*mse] * n
        ens = _boost(ccfg, ens, Xmb, g, feat_w)
        return ens, trace.at[k].set(0.5 * jnp.mean((v - r) ** 2))

    ctrace0 = jnp.zeros((max(Kc, 1),), dtype=jnp.float32)
    critic_ens, ctrace = jax.lax.fori_loop(0, Kc, cbody,
                                           (critic_ens, ctrace0))

    # ---- actor: advantage-weighted log-prob regression
    def abody(k, carry):
        ens, trace = carry
        idx = jax.lax.dynamic_slice(amb_idx, (k, 0), (1, mb))[0]
        Xmb = jnp.take(X, idx, axis=0)
        a = jnp.take(acts, idx, axis=0)
        adv = jnp.take(advs, idx)
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        w = jnp.exp(jnp.minimum(adv / hp.beta,
                                jnp.log(hp.max_weight)))
        theta = predict_sgd(acfg, ens, Xmb, actor_specs, 0, ens.capacity)

        def loss_fn(th_):
            # mu: sigma^2-FREE weighted regression (the official AWR
            # implementation's actor loss, arXiv:1910.00177 code):
            # 0.5 * w * ||a - mu||^2.  Dividing by sigma^2 (the raw
            # log-prob gradient) makes the effective boosting step
            # lr * w / sigma^2 > 2 for high-weight leaves -> oscillating
            # divergence (observed: mu -> 121 -> NaN policies).
            mu = th_[:, :A]
            loss = jnp.mean(w * 0.5 * jnp.sum((a - mu) ** 2, axis=-1))
            if hp.learn_std:
                # sigma: weighted Gaussian MLE with mu stopped; log_std
                # CLAMPED to [-2.5, 0.5] (clip gradient is zero outside, so
                # a collapsing sigma cannot blow up z^2 -> NaN)
                log_std = jnp.clip(th_[:, A:], -2.5, 0.5)
                z = (a - jax.lax.stop_gradient(mu)) / jnp.exp(log_std)
                loss = loss + jnp.mean(
                    w * jnp.sum(log_std + 0.5 * z ** 2, axis=-1))
            return loss

        loss, g = jax.value_and_grad(loss_fn)(theta)
        g = g * mb
        if hp.grad_clip:
            # per-sample L2 clip (reference clip_grad_norm semantics,
            # gbrl/common/utils.py:270-295): bounds the leaf updates so a
            # region whose mu drifted large cannot inject huge corrections
            # into neighbouring leaves (observed exponential mu ping-pong
            # across routing boundaries without it)
            norms = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
            g = g * jnp.minimum(1.0, hp.grad_clip / (norms + 1e-8))
        ens = _boost(acfg, ens, Xmb, g, feat_w)
        return ens, trace.at[k].set(loss)

    atrace0 = jnp.zeros((max(Ka, 1),), dtype=jnp.float32)
    actor_ens, atrace = jax.lax.fori_loop(0, Ka, abody,
                                          (actor_ens, atrace0))
    return actor_ens, critic_ens, (ctrace, atrace)


def run_awr_update(algo, r_obs: np.ndarray, r_act: np.ndarray,
                   r_ret: np.ndarray, rng, r_adv: np.ndarray) -> None:
    """Host wrapper: build the minibatch plans, ship the replay once, run
    the fused loop, update both learners in place."""
    actor_lr = algo.actor.learner
    critic_lr = algo.critic.learner
    B = len(r_obs)
    mb = min(algo.batch_size, B)
    Kc, Ka = algo.critic_updates, algo.actor_updates
    cmb = rng.integers(0, B, (max(Kc, 1), mb)).astype(np.int32)
    amb = rng.integers(0, B, (max(Ka, 1), mb)).astype(np.int32)

    # pad the replay to a power-of-two length so the jit signature only
    # changes O(log buffer_size) times as the replay grows (the minibatch
    # plans never index past B, so padding rows are dead weight only)
    B_pad = 1 << (B - 1).bit_length()
    if B_pad != B:
        r_obs = np.concatenate(
            [r_obs, np.zeros((B_pad - B,) + r_obs.shape[1:],
                             r_obs.dtype)])
        r_act = np.concatenate(
            [r_act, np.zeros((B_pad - B,) + r_act.shape[1:],
                             r_act.dtype)])
        r_ret = np.concatenate([r_ret, np.zeros(B_pad - B, r_ret.dtype)])
        r_adv = np.concatenate([r_adv, np.zeros(B_pad - B, r_adv.dtype)])

    Xn, Xc = actor_lr._prepare(r_obs, grow_vocab=False)
    assert Xc is None, "jit AWR supports numerical features only"
    # host-side tree counters (int(ens.n_trees) is a device fetch — one
    # tunnel round trip each per iteration)
    nta = getattr(actor_lr, "_rl_host_n_trees", None)
    if nta is None:
        nta = int(actor_lr.ens.n_trees)
    ntc = getattr(critic_lr, "_rl_host_n_trees", None)
    if ntc is None:
        ntc = int(critic_lr.ens.n_trees)
    actor_lr.ens = ensure_capacity(actor_lr.ens, nta + Ka)
    critic_lr.ens = ensure_capacity(critic_lr.ens, ntc + Kc)
    actor_lr._rl_host_n_trees = nta + Ka
    critic_lr._rl_host_n_trees = ntc + Kc
    hp = AWRHyper(act_dim=algo.act_dim, beta=algo.beta,
                  max_weight=algo.max_weight,
                  learn_std=getattr(algo, "learn_std", True),
                  log_std_init=algo.actor.log_std_init,
                  grad_clip=getattr(algo, "max_actor_grad_norm", 10.0))
    specs = (actor_lr.specs, critic_lr.specs)
    actor_lr.ens, critic_lr.ens, _ = awr_update_loop(
        actor_lr.cfg, critic_lr.cfg, hp, specs, (Kc, Ka),
        actor_lr.ens, critic_lr.ens, Xn,
        jnp.asarray(r_act.astype(np.float32)),
        jnp.asarray(r_ret.astype(np.float32)),
        jnp.asarray(r_adv.astype(np.float32)),
        jnp.asarray(cmb), jnp.asarray(amb),
        actor_lr._internal_feature_weights())
    actor_lr.total_iterations += Ka
    actor_lr._pred_cache = None
    critic_lr.total_iterations += Kc
    critic_lr._pred_cache = None
