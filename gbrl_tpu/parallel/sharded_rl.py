"""Data-parallel RL update phase over a jax.sharding.Mesh.

Extends the supervised mesh path (parallel/sharded.py) to the RL hot loop:
the rollout observations and the incrementally-maintained full-rollout
predictions shard over the data axis, the ensemble stays replicated, and
each PPO minibatch boosting step inside the device loop works on rows
gathered across shards (tiny for tabular data — XLA inserts the
collectives).  The per-tree incremental prediction update — the O(B) part —
runs fully sharded.

Multi-host: each host contributes its own rollout slice to the global
[B, F] array; identical RNG on every host draws the same minibatch plan, so
the fitted trees are bit-identical everywhere (same contract as
sharded_boost_step — deterministic given the global histogram).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TreeConfig
from ..ensemble import Ensemble, ensure_capacity
from ..optimizers import OptimizerSpec
from ..rl.jit_update import PPOHyper, ppo_update_loop
from .sharded import DATA_AXIS


@functools.lru_cache(maxsize=32)
def _ppo_update_fn(cfg: TreeConfig, hp: PPOHyper, n_updates: int,
                   mesh: Mesh, specs: Tuple[OptimizerSpec, ...]):
    repl = NamedSharding(mesh, P())
    data1 = NamedSharding(mesh, P(DATA_AXIS))
    data2 = NamedSharding(mesh, P(DATA_AXIS, None))
    fn = lambda ens, X, mb_idx, mb_n, actions, old_logp, adv, ret, fw, \
        valid: ppo_update_loop(cfg, hp, n_updates, ens, X, mb_idx, mb_n,
                               actions, old_logp, adv, ret, specs, fw,
                               valid)
    return jax.jit(
        fn,
        in_shardings=(repl, data2, repl, repl, data1, data1, data1, data1,
                      repl, data1),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def sharded_ppo_update(cfg: TreeConfig, hp: PPOHyper, mesh: Mesh,
                       ens: Ensemble, X, mb_idx, mb_n, actions, old_logp,
                       adv, ret, specs: Tuple[OptimizerSpec, ...], feat_w,
                       valid=None):
    """Run one PPO update phase (all epochs x minibatches) with the rollout
    sharded over the mesh.  Returns (ensemble, entropy trace)."""
    import jax.numpy as jnp
    n_updates = int(mb_idx.shape[0])
    if valid is None:
        valid = jnp.ones((X.shape[0],), dtype=jnp.float32)
    return _ppo_update_fn(cfg, hp, n_updates, mesh, specs)(
        ens, X, mb_idx, mb_n, actions, old_logp, adv, ret, feat_w, valid)


@functools.lru_cache(maxsize=32)
def _awr_update_fn(acfg: TreeConfig, ccfg: TreeConfig, hp,
                   n_updates: Tuple[int, int], mesh: Mesh,
                   specs: Tuple[Tuple[OptimizerSpec, ...], ...]):
    """AWR update phase (rl/jit_awr.awr_update_loop) with the replay
    sharded over the data axis: replay rows shard, ensembles replicate,
    minibatch plans (global row indices) replicate — XLA gathers minibatch
    rows across shards and all-reduces the fit histograms, so every host
    ends with bit-identical actor AND critic ensembles."""
    from ..rl.jit_awr import awr_update_loop

    repl = NamedSharding(mesh, P())
    data1 = NamedSharding(mesh, P(DATA_AXIS))
    data2 = NamedSharding(mesh, P(DATA_AXIS, None))
    fn = lambda actor_ens, critic_ens, X, acts, rets, advs, cmb, amb, fw: \
        awr_update_loop(acfg, ccfg, hp, specs, n_updates, actor_ens,
                        critic_ens, X, acts, rets, advs, cmb, amb, fw)
    return jax.jit(
        fn,
        in_shardings=(repl, repl, data2, data2, data1, data1, repl, repl,
                      repl),
        out_shardings=(repl, repl, (repl, repl)),
        donate_argnums=(0, 1))


def sharded_awr_update(acfg: TreeConfig, ccfg: TreeConfig, hp, mesh: Mesh,
                       actor_ens: Ensemble, critic_ens: Ensemble,
                       X, acts, rets, advs, cmb_idx, amb_idx,
                       specs: Tuple[Tuple[OptimizerSpec, ...], ...], feat_w):
    """Run one AWR update phase (all critic + actor boosting steps) with
    the replay sharded over the mesh.  Returns
    (actor_ens, critic_ens, (critic_trace, actor_trace))."""
    n_updates = (int(cmb_idx.shape[0]), int(amb_idx.shape[0]))
    return _awr_update_fn(acfg, ccfg, hp, n_updates, mesh, specs)(
        actor_ens, critic_ens, X, acts, rets, advs, cmb_idx, amb_idx,
        feat_w)
