"""Ensemble storage: structure-of-arrays pytree of perfect binary trees.

TPU-native redesign of the reference's ``ensembleData`` SoA
(src/cpp/types.h:279-304).  Instead of per-leaf path-condition lists
(GREEDY) or per-tree level conditions (OBLIVIOUS), every tree is stored as a
*perfect binary tree in heap order* with ``2^max_depth - 1`` internal node
slots and ``2^max_depth`` leaf slots:

- heap node ``p`` has children ``2p+1`` (left / condition false) and ``2p+2``
  (right / condition true);
- a node that the fitter did not split is a *pass-through*: samples always
  descend left, so the value of such a leaf-node lives at the left-most leaf
  slot of its subtree.

This gives a single fixed-shape, gather-based prediction kernel for both grow
policies (the reference needs two: predictor.cpp:188-229 vs 231-265), and
makes one boosting iteration a set of dense array writes at static offsets.

Numeric split semantics match the reference exactly: ``x > threshold`` routes
right (node.cpp:89), categorical ``code == split_code`` routes right
(node.cpp:77).  Categorical features are dictionary-encoded int32 codes
(host-side vocabulary) instead of 128-byte strings (types.h S128), which is
the only vectorizable representation on TPU.

Capacity is fixed inside jit; the learner grows arrays geometrically outside
jit (reference analog: allocate_ensemble_memory, types.cpp:194-407 with
INITAL_MAX_TREES/TREES_BATCH, types.h:49-58).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import TreeConfig

DEFAULT_INITIAL_CAPACITY = 1024


@struct.dataclass
class Ensemble:
    """SoA ensemble of perfect binary trees (a JAX pytree).

    Shapes (T = tree capacity, NODES = 2^D - 1, LEAVES = 2^D, O = output_dim):

    - feat        [T, NODES] int32 : internal feature index of the split
                                     (numeric block index, or categorical
                                     block index when is_numeric is False);
                                     -1 on pass-through nodes.
    - thr         [T, NODES] f32   : numeric threshold (x > thr -> right).
    - cat_code    [T, NODES] int32 : categorical code (x == code -> right).
    - is_split    [T, NODES] bool  : whether the node splits.
    - is_numeric  [T, NODES] bool  : numeric vs categorical condition.
    - leaf_values [T, LEAVES, O] f32 : mean gradient of routed samples
                                       (fitter.cpp:545-582).
    - counts      [T, 2*LEAVES-1] f32 : samples seen per heap node at fit
                                        time (root=0); edge weights
                                        (node.cpp:131,141) are derived as
                                        child_count / parent_count.
    - depths      [T] int32 : deepest split level + 1 of the tree.
    - bias        [O] f32   : ensemble bias (types.h ensembleData::bias).
    - n_trees     [] int32  : number of fitted trees (device scalar so a
                              boosting step does not trigger recompiles).
    """
    feat: jax.Array
    thr: jax.Array
    cat_code: jax.Array
    is_split: jax.Array
    is_numeric: jax.Array
    leaf_values: jax.Array
    counts: jax.Array
    depths: jax.Array
    bias: jax.Array
    n_trees: jax.Array

    @property
    def capacity(self) -> int:
        return self.feat.shape[0]

    @property
    def output_dim(self) -> int:
        return self.leaf_values.shape[-1]


def init_ensemble(cfg: TreeConfig, capacity: int = DEFAULT_INITIAL_CAPACITY) -> Ensemble:
    nodes, leaves, out = cfg.n_nodes, cfg.n_leaves, cfg.output_dim
    return Ensemble(
        feat=jnp.full((capacity, nodes), -1, dtype=jnp.int32),
        thr=jnp.zeros((capacity, nodes), dtype=jnp.float32),
        cat_code=jnp.full((capacity, nodes), -1, dtype=jnp.int32),
        is_split=jnp.zeros((capacity, nodes), dtype=bool),
        is_numeric=jnp.ones((capacity, nodes), dtype=bool),
        leaf_values=jnp.zeros((capacity, leaves, out), dtype=jnp.float32),
        counts=jnp.zeros((capacity, 2 * leaves - 1), dtype=jnp.float32),
        depths=jnp.zeros((capacity,), dtype=jnp.int32),
        bias=jnp.zeros((out,), dtype=jnp.float32),
        n_trees=jnp.zeros((), dtype=jnp.int32),
    )


def grow_ensemble(ens: Ensemble, new_capacity: int) -> Ensemble:
    """Grow tree capacity (host-side, outside jit)."""
    if new_capacity <= ens.capacity:
        return ens
    extra = new_capacity - ens.capacity

    def pad(x, fill):
        pad_shape = (extra,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(pad_shape, fill, dtype=x.dtype)], axis=0)

    return ens.replace(
        feat=pad(ens.feat, -1),
        thr=pad(ens.thr, 0.0),
        cat_code=pad(ens.cat_code, -1),
        is_split=pad(ens.is_split, False),
        is_numeric=pad(ens.is_numeric, True),
        leaf_values=pad(ens.leaf_values, 0.0),
        counts=pad(ens.counts, 0.0),
        depths=pad(ens.depths, 0),
    )


def ensure_capacity(ens: Ensemble, needed: int) -> Ensemble:
    if needed <= ens.capacity:
        return ens
    cap = max(ens.capacity, 1)
    while cap < needed:
        cap *= 2
    return grow_ensemble(ens, cap)


def ensemble_to_numpy(ens: Ensemble) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in vars_dict(ens).items()}


def vars_dict(ens: Ensemble) -> Dict[str, Any]:
    return {f: getattr(ens, f) for f in (
        "feat", "thr", "cat_code", "is_split", "is_numeric",
        "leaf_values", "counts", "depths", "bias", "n_trees")}


def ensemble_from_numpy(arrs: Dict[str, np.ndarray]) -> Ensemble:
    return Ensemble(**{k: jnp.asarray(v) for k, v in arrs.items()})
