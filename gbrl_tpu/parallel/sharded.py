"""Multi-chip data-parallel boosting over a jax.sharding.Mesh.

The reference has no distributed execution at all (SURVEY §2.4): one process,
OpenMP threads, optionally one GPU.  The TPU-native scaling axis for GBT
boosting is *samples*: transitions shard over the data axis of the mesh, each
device bins its shard and computes partial (node, feature, bucket) gradient
histograms, and the global histogram — the only cross-device quantity — is
all-reduced over ICI.  Split selection, tree emission and the replicated
ensemble update are identical on every device, reproducing single-device
semantics exactly (deterministic given the global histogram).

Implementation: the compute code in ops/ is pure jnp with no device logic, so
distribution is expressed entirely through ``jax.jit`` in/out shardings —
XLA inserts the psum for the segment-sum reductions automatically (the
"How to Scale Your Model" recipe: pick a mesh, annotate shardings, let the
compiler place collectives).

Trees/leaf arrays are replicated (they are tiny: ~KB per tree); only sample
arrays are sharded.  Multi-host works the same way once jax.distributed is
initialized — the mesh then spans hosts and the histogram reduction rides
ICI within a slice and DCN across slices.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TreeConfig
from ..ensemble import Ensemble
from ..optimizers import OptimizerSpec
from ..ops.boosting import boost_step, predict_sgd
from ..ops.loss import multirmse_grads

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def shard_batch(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place a [N, ...] array sharded along the data axis."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree) -> "jax.Array":
    return jax.device_put(tree, NamedSharding(mesh, P()))


@functools.lru_cache(maxsize=32)
def _boost_step_fn(cfg: TreeConfig, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    data2 = NamedSharding(mesh, P(DATA_AXIS, None))
    return jax.jit(
        lambda ens, Xn, grads, feat_w: boost_step(cfg, ens, Xn, grads, feat_w),
        in_shardings=(repl, data2, data2, repl),
        out_shardings=repl,
        donate_argnums=(0,))


def sharded_boost_step(cfg: TreeConfig, mesh: Mesh, ens: Ensemble,
                       Xn: jax.Array, grads: jax.Array,
                       feat_w: jax.Array) -> Ensemble:
    """One boosting iteration with samples sharded over the mesh."""
    return _boost_step_fn(cfg, mesh)(ens, Xn, grads, feat_w)


@functools.lru_cache(maxsize=32)
def _train_step_fn(cfg: TreeConfig, mesh: Mesh,
                   specs: Tuple[OptimizerSpec, ...]):
    repl = NamedSharding(mesh, P())
    data2 = NamedSharding(mesh, P(DATA_AXIS, None))

    def step(ens, Xn, targets, feat_w):
        """predict -> MultiRMSE grads -> fit one tree; samples sharded,
        ensemble replicated."""
        w = jnp.ones(Xn.shape[0], dtype=jnp.float32)
        preds = predict_sgd(cfg, ens, Xn, specs, 0, ens.n_trees)
        grads, loss = multirmse_grads(preds, targets, w)
        ens2 = boost_step(cfg, ens, Xn, grads, feat_w)
        return ens2, loss

    return jax.jit(step, in_shardings=(repl, data2, data2, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))


def sharded_train_step(cfg: TreeConfig, mesh: Mesh, ens: Ensemble,
                       Xn: jax.Array, targets: jax.Array, feat_w: jax.Array,
                       specs: Tuple[OptimizerSpec, ...]):
    """Full supervised training step over the mesh: returns (ensemble, loss)."""
    return _train_step_fn(cfg, mesh, specs)(ens, Xn, targets, feat_w)
