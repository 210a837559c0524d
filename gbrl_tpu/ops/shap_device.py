r"""Device (XLA) TreeSHAP for fixed-depth heap ensembles.

The reference computes SHAP on the CPU only (gbrl.cpp:1271-1278 copies GPU
ensembles to host first) with a per-sample recursion (shap.cpp:259-333).
Fixed-depth heap trees admit a fully vectorized closed form instead:

For path-dependent TreeSHAP, the tree's conditional expectation given a
feature subset S factorizes per leaf,

    E[f | S] = sum_l value_l * prod_{e in path(l)}
                   ([x follows e]      if feat(e) in S
                    else  w_e = n_child / n_parent),

so after grouping a leaf's path edges by feature (a feature may repeat with
different thresholds — the reference only forbids reusing the exact
(feature, value) candidate, node.cpp:153-166) into "slots" with

    hot_u  = prod of follow-indicators of u's edges   (per sample)
    cold_u = prod of edge weights of u's edges        (static)

the exact Shapley value of slot j in leaf l is the |U|-feature Shapley sum

    phi_j(l) = sum over S subseteq U minus {j} of  |S|! (k-|S|-1)! / k!
               * (prod_{s in S} hot_s) * (prod_{s in U\S, s != j} cold_s)
               * (hot_j - cold_j) * value_l,         k = |U|.

With max_depth D <= 6 this is 2^D subsets x D slots of elementwise work
over [N, leaves], unrolled at trace time — pure VPU math, no recursion, no
host round trips.  Identical values to ops/shap.py (the classic
per-sample recursion), which remains the test oracle.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TreeConfig
from ..ensemble import Ensemble


def _weight_table(D: int) -> np.ndarray:
    """W[s, k] = s! (k-s-1)! / k!  for 0 <= s < k <= D (0 elsewhere)."""
    W = np.zeros((D + 1, D + 2), dtype=np.float32)
    for k in range(1, D + 1):
        for s in range(k):
            W[s, k] = (math.factorial(s) * math.factorial(k - s - 1)
                       / math.factorial(k))
    return W


def _tree_slots(cfg: TreeConfig, feat, thr, code, is_split, is_numeric,
                counts, Xn, Xc):
    """Per-(sample, leaf, depth-slot) hot/cold factors with duplicate
    features folded into their first slot.

    Returns hot [N, L, D], cold [L, D], valid [L, D] (post-fold), and
    slot_feat [L, D] global feature ids (cat block offset by n_num)."""
    D = cfg.max_depth
    L = 1 << D
    P = L - 1                        # internal heap nodes
    N = Xn.shape[0]
    n_num = Xn.shape[1]

    # follow-right indicator for every internal node (node.cpp:77-96)
    f = jnp.maximum(feat[:P], 0)
    if n_num > 0:
        xval = jnp.take(Xn, f, axis=1)               # [N, P]
        go_num = xval > thr[None, :P]
    else:
        go_num = jnp.zeros((N, P), dtype=bool)
    if Xc is not None and Xc.shape[1] > 0:
        xc = jnp.take(Xc, f, axis=1)
        go = jnp.where(is_numeric[None, :P], go_num, xc == code[None, :P])
    else:
        go = go_num

    # static heap paths: leaf l passes internal node p_{l,d} at depth d
    leaf = np.arange(L)
    node_idx = np.zeros((L, D), dtype=np.int32)
    direction = np.zeros((L, D), dtype=np.int32)
    for d in range(D):
        prefix = leaf >> (D - d)                     # rel node id at depth d
        node_idx[:, d] = (1 << d) - 1 + prefix
        direction[:, d] = (leaf >> (D - 1 - d)) & 1
    node_idx_j = jnp.asarray(node_idx)
    dir_j = jnp.asarray(direction).astype(bool)

    valid = jnp.take(is_split[:P], node_idx_j)       # [L, D]
    pfeat = jnp.take(feat[:P], node_idx_j)
    pnum = jnp.take(is_numeric[:P], node_idx_j)
    slot_feat = jnp.where(pnum, pfeat, pfeat + n_num)
    slot_feat = jnp.where(valid, slot_feat, -1)

    go_leaf = jnp.take(go, node_idx_j, axis=1)       # [N, L, D]
    hot = jnp.where(dir_j[None], go_leaf, ~go_leaf).astype(jnp.float32)
    hot = jnp.where(valid[None], hot, 1.0)

    child_idx = 2 * node_idx + 1 + direction         # static
    pc = jnp.take(counts, jnp.asarray(node_idx))     # parent counts [L, D]
    cc = jnp.take(counts, jnp.asarray(child_idx))
    # counts may be absolute sample counts (our fitter) or path
    # probabilities in (0, 1] (models imported from reference checkpoints,
    # reference_import.py) — guard div-by-zero without flooring the divisor
    cold = jnp.where(pc > 0, cc / jnp.where(pc > 0, pc, 1.0), 0.0)
    cold = jnp.where(valid, cold, 1.0)

    # fold repeated features into their first slot (unrolled D^2 compares)
    for j in range(1, D):
        for i in range(j):
            dup = valid[:, i] & valid[:, j] & (slot_feat[:, i]
                                               == slot_feat[:, j])
            hot = hot.at[:, :, i].multiply(
                jnp.where(dup[None], hot[:, :, j], 1.0))
            hot = hot.at[:, :, j].set(
                jnp.where(dup[None], 1.0, hot[:, :, j]))
            cold = cold.at[:, i].multiply(jnp.where(dup, cold[:, j], 1.0))
            cold = cold.at[:, j].set(jnp.where(dup, 1.0, cold[:, j]))
            valid = valid.at[:, j].set(valid[:, j] & ~dup)
            slot_feat = slot_feat.at[:, j].set(
                jnp.where(dup, -1, slot_feat[:, j]))
    return hot, cold, valid, slot_feat


def tree_shap_device_one(cfg: TreeConfig, feat, thr, code, is_split,
                         is_numeric, counts, leaf_values, Xn, Xc,
                         n_features: int) -> jax.Array:
    """SHAP values of one tree: [N, n_features, output_dim]."""
    D = cfg.max_depth
    L = 1 << D
    N = Xn.shape[0]
    hot, cold, valid, slot_feat = _tree_slots(
        cfg, feat, thr, code, is_split, is_numeric, counts, Xn, Xc)
    validf = valid.astype(jnp.float32)
    k = jnp.sum(validf, axis=1).astype(jnp.int32)    # [L] unique features
    W = jnp.asarray(_weight_table(D))

    # phi_slot[n, l, j] accumulated over all subsets S of valid slots
    phi_slot = jnp.zeros((N, L, D), dtype=jnp.float32)
    for t in range(1 << D):
        bits = [(t >> s) & 1 for s in range(D)]
        s_count = sum(bits)
        # subset must use only valid slots
        ok = jnp.ones((L,), dtype=bool)
        for s in range(D):
            if bits[s]:
                ok = ok & valid[:, s]
        w_t = jnp.take(W[s_count], k) * ok           # [L]
        # prod_{s in S} hot_s  (sample-dependent)
        hotP = jnp.ones((N, L), dtype=jnp.float32)
        for s in range(D):
            if bits[s]:
                hotP = hotP * hot[:, :, s]
        # cold products excluding S and excluding each target j
        for j in range(D):
            if bits[j]:
                continue
            coldP = jnp.ones((L,), dtype=jnp.float32)
            for s in range(D):
                if s == j or bits[s]:
                    continue
                coldP = coldP * cold[:, s]
            contrib = (w_t * coldP)[None, :] * hotP \
                * (hot[:, :, j] - cold[None, :, j]) * validf[None, :, j]
            phi_slot = phi_slot.at[:, :, j].add(contrib)

    # scatter slots -> features, weight by leaf values
    feat_oh = (slot_feat[:, :, None]
               == jnp.arange(n_features, dtype=jnp.int32)[None, None, :]
               ).astype(jnp.float32)                 # [L, D, F]
    # HIGHEST precision: default einsum would route through the MXU in
    # bf16 on TPU (~0.5% error on attributions)
    phi_leaf_feat = jnp.einsum("nld,ldf->nlf", phi_slot, feat_oh,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    return jnp.einsum("nlf,lo->nfo", phi_leaf_feat, leaf_values,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(0, 4))
def ensemble_shap_device(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                         Xc: Optional[jax.Array], n_features: int,
                         tree_idx: Optional[jax.Array] = None) -> jax.Array:
    """Sum of per-tree SHAP over active trees (or ONE tree if tree_idx is
    given): [N, n_features, output_dim].  Scans trees to bound memory."""
    N = Xn.shape[0]
    O = cfg.output_dim

    def body(carry, tree):
        feat, thr, code, spl, num, counts, lv, active = tree
        phi = tree_shap_device_one(cfg, feat, thr, code, spl, num, counts,
                                   lv, Xn, Xc, n_features)
        return carry + active * phi, None

    if tree_idx is not None:
        arrays = tuple(jnp.take(a, tree_idx[None], axis=0) for a in
                       (ens.feat, ens.thr, ens.cat_code, ens.is_split,
                        ens.is_numeric, ens.counts, ens.leaf_values))
        active = jnp.ones((1,), dtype=jnp.float32)
    else:
        arrays = (ens.feat, ens.thr, ens.cat_code, ens.is_split,
                  ens.is_numeric, ens.counts, ens.leaf_values)
        active = (jnp.arange(ens.capacity) < ens.n_trees
                  ).astype(jnp.float32)
    acc0 = jnp.zeros((N, n_features, O), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, arrays + (active,))
    return acc
