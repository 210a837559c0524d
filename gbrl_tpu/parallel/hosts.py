"""Multi-host (multi-process) entry point for distributed boosting.

The reference is strictly single-process (SURVEY §2.4) — this layer is new
capability.  It boots ``jax.distributed`` so a mesh spans every host's
devices (ICI within a slice, DCN across slices), assembles globally-sharded
arrays from per-host local shards (each host only ever touches its own
rollout / data slice), and reuses the exact same jit'd train steps as the
single-process mesh path (parallel/sharded.py, parallel/sharded_rl.py):
XLA's histogram all-reduce is the only cross-host communication, and every
host ends each step with a bit-identical replicated ensemble.

Verified by tests/test_multihost.py: two localhost processes x 4 CPU devices
form one 8-device mesh and produce trees bit-identical to the single-process
8-device mesh run.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TreeConfig
from ..ensemble import Ensemble
from ..optimizers import OptimizerSpec
from .sharded import DATA_AXIS, _boost_step_fn, _train_step_fn


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Boot the jax.distributed runtime so jax.devices() spans all hosts.

    Arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), which
    jax also auto-detects on managed TPU slices (GCE metadata) — there a
    bare ``initialize()`` suffices.  Call once per process before creating
    arrays.  Idempotent: repeated calls are no-ops.
    """
    if _already_initialized():
        return
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def _already_initialized() -> bool:
    state = getattr(jax.distributed, "global_state", None)
    return state is not None and getattr(state, "client", None) is not None


def shutdown() -> None:
    """Tear down the distributed runtime (call at process exit)."""
    if _already_initialized():
        jax.distributed.shutdown()


def global_mesh() -> Mesh:
    """Data-parallel mesh over every device of every host."""
    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def host_array(mesh: Mesh, local_data: np.ndarray) -> jax.Array:
    """Assemble a globally-sharded array from this host's local shard.

    ``local_data`` is the [N_local, ...] slice owned by this process; hosts
    are concatenated in process order along axis 0.  No host ever
    materializes the global array.
    """
    spec = P(DATA_AXIS, *([None] * (local_data.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_data))


def replicate(mesh: Mesh, tree):
    """Place a (host-identical) pytree replicated on every device."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def host_boost_step(cfg: TreeConfig, mesh: Mesh, ens: Ensemble,
                    Xn_local: np.ndarray, grads_local: np.ndarray,
                    feat_w) -> Ensemble:
    """One boosting iteration from per-host data shards.

    Each host passes only its local [N_local, F] observations and gradients;
    the fitted tree (replicated output) is bit-identical on every host.
    """
    Xn = host_array(mesh, Xn_local)
    grads = host_array(mesh, grads_local)
    return _boost_step_fn(cfg, mesh)(ens, Xn, grads, feat_w)


def host_train_step(cfg: TreeConfig, mesh: Mesh, ens: Ensemble,
                    Xn_local: np.ndarray, targets_local: np.ndarray,
                    feat_w, specs: Tuple[OptimizerSpec, ...]):
    """Supervised predict->grads->fit step from per-host shards.

    Returns (ensemble, loss); the loss is the global MultiRMSE over all
    hosts' samples (the grads/histogram reductions ride the mesh).
    """
    Xn = host_array(mesh, Xn_local)
    targets = host_array(mesh, targets_local)
    return _train_step_fn(cfg, mesh, specs)(ens, Xn, targets, feat_w)


def host_ppo_update(cfg: TreeConfig, hp, mesh: Mesh, ens: Ensemble,
                    X_local: np.ndarray, mb_idx, mb_n,
                    actions_local: np.ndarray, old_logp_local: np.ndarray,
                    adv_local: np.ndarray, ret_local: np.ndarray,
                    specs: Tuple[OptimizerSpec, ...], feat_w,
                    valid_local: Optional[np.ndarray] = None):
    """PPO update phase fed by per-host rollout shards.

    Each host runs its own vector envs and passes only its local rollout
    slice; ``mb_idx``/``mb_n`` (the minibatch plan over *global* row
    indices) must be drawn with the same seed on every host.
    ``valid_local`` optionally masks autoreset rows (rl/buffers.py flat()).
    Returns (ensemble, entropy trace), bit-identical across hosts.
    """
    from .sharded_rl import _ppo_update_fn

    X = host_array(mesh, X_local)
    actions = host_array(mesh, actions_local)
    old_logp = host_array(mesh, old_logp_local)
    adv = host_array(mesh, adv_local)
    ret = host_array(mesh, ret_local)
    if valid_local is None:
        valid_local = np.ones((X_local.shape[0],), dtype=np.float32)
    valid = host_array(mesh, np.asarray(valid_local, dtype=np.float32))
    n_updates = int(mb_idx.shape[0])
    return _ppo_update_fn(cfg, hp, n_updates, mesh, specs)(
        ens, X, mb_idx, mb_n, actions, old_logp, adv, ret, feat_w, valid)


def host_awr_update(acfg: TreeConfig, ccfg: TreeConfig, hp, mesh: Mesh,
                    actor_ens: Ensemble, critic_ens: Ensemble,
                    X_local: np.ndarray, acts_local: np.ndarray,
                    rets_local: np.ndarray, advs_local: np.ndarray,
                    cmb_idx: np.ndarray, amb_idx: np.ndarray,
                    specs, feat_w):
    """AWR update phase (BASELINE config 5's sharding clause) fed by
    per-host replay shards.

    Each host passes only its local [B_local, ...] replay slice (valid
    rows only, already advantage-annotated); ``cmb_idx``/``amb_idx`` (the
    critic/actor minibatch plans over *global* row indices) must be drawn
    with the same seed on every host.  Returns
    (actor_ens, critic_ens, traces), bit-identical across hosts."""
    from .sharded_rl import _awr_update_fn

    X = host_array(mesh, X_local)
    acts = host_array(mesh, acts_local)
    rets = host_array(mesh, rets_local)
    advs = host_array(mesh, advs_local)
    n_updates = (int(cmb_idx.shape[0]), int(amb_idx.shape[0]))
    return _awr_update_fn(acfg, ccfg, hp, n_updates, mesh, tuple(specs))(
        actor_ens, critic_ens, X, acts, rets, advs, cmb_idx, amb_idx,
        feat_w)
