"""Ensemble inference: vectorized heap-walk + weighted leaf reductions.

TPU-native replacement for the reference predictor (src/cpp/predictor.cpp).
The reference walks leaf-path condition lists per (sample, tree) with the
optimizer applying ``theta -= lr(t) * leaf_value`` per passing tree
(predictor.cpp:188-265, optimizer.cpp:110-118).  Here every tree is a perfect
binary heap, so a prediction is ``max_depth`` batched gathers to compute leaf
indices for a whole [samples, trees] block at once, followed by a weighted
reduction over trees:

    pred = bias + sum_t coeff[t, :] * leaf_value[t, leaf(n, t), :]

With coeff[t, j] = -lr_opt(t) on each optimizer's column range this is exactly
the reference's SGD semantics (sum of per-tree SGD updates); with
EMA weights it is the control-variate momentum (predictor.cpp:37-119).
Trees are processed in fixed-size chunks under ``lax.scan`` so HBM usage is
O(N * chunk * output_dim) regardless of ensemble size.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import TreeConfig
from ..ensemble import Ensemble

DEFAULT_TREE_CHUNK = 512


def _chunk_size(capacity: int, requested: int = DEFAULT_TREE_CHUNK) -> int:
    c = min(capacity, requested)
    while capacity % c != 0:
        c -= 1
    return max(c, 1)


def chunk_leaf_indices(feat, thr, cat_code, is_split, is_numeric,
                       Xn: jax.Array, Xc: jax.Array | None,
                       max_depth: int) -> jax.Array:
    """Heap-walk leaf indices for one chunk of trees.

    feat/thr/... [C, NODES]; Xn [N, Fn]; returns [N, C] int32 in [0, 2^D).
    Routing matches node.cpp:77-96: numeric ``x > thr`` -> right,
    categorical ``code == cat_code`` -> right; pass-through nodes descend left.
    """
    C = feat.shape[0]
    N = Xn.shape[0]
    tree_ids = jnp.arange(C, dtype=jnp.int32)[None, :]       # [1, C]
    node = jnp.zeros((N, C), dtype=jnp.int32)
    for _ in range(max_depth):
        f = feat[tree_ids, node]                             # [N, C]
        split = is_split[tree_ids, node]
        numeric = is_numeric[tree_ids, node]
        f_safe = jnp.maximum(f, 0)
        xv = jnp.take_along_axis(Xn, f_safe, axis=1)         # [N, C]
        go_num = xv > thr[tree_ids, node]
        if Xc is not None:
            xc = jnp.take_along_axis(Xc, f_safe, axis=1)
            go_cat = xc == cat_code[tree_ids, node]
            go = jnp.where(numeric, go_num, go_cat)
        else:
            go = go_num
        go = split & go
        node = 2 * node + 1 + go.astype(jnp.int32)
    return node - ((1 << max_depth) - 1)


def weighted_leaf_sum(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                      coeff: jax.Array, Xc: jax.Array | None = None,
                      tree_chunk: int = DEFAULT_TREE_CHUNK) -> jax.Array:
    """sum_t coeff[t, :] * leaf_value[t, leaf(n, t), :]  ->  [N, O].

    coeff [T_cap, O] must already be zero for trees outside the active range
    (t >= n_trees, or outside [start_idx, stop_idx)).
    """
    N = Xn.shape[0]
    O = cfg.output_dim
    T = ens.capacity
    C = _chunk_size(T, tree_chunk)
    n_chunks = T // C

    def resh(x):
        return x.reshape((n_chunks, C) + x.shape[1:])

    chunks = (resh(ens.feat), resh(ens.thr), resh(ens.cat_code),
              resh(ens.is_split), resh(ens.is_numeric),
              resh(ens.leaf_values), resh(coeff))

    def body(acc, chunk):
        feat, thr, code, spl, num, lv, cf = chunk
        leaf = chunk_leaf_indices(feat, thr, code, spl, num, Xn, Xc,
                                  cfg.max_depth)             # [N, C]
        V = lv[jnp.arange(C, dtype=jnp.int32)[None, :], leaf]  # [N, C, O]
        acc = acc + jnp.einsum("nco,co->no", V, cf,
                               preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((N, O), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, chunks)
    return acc


def gather_leaf_values(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                       Xc: jax.Array | None = None,
                       tree_chunk: int = DEFAULT_TREE_CHUNK) -> jax.Array:
    """All per-(sample, tree) leaf values [N, T_cap, O] (for Adam / SHAP-style
    passes that need the full sequence). Memory: N*T_cap*O floats."""
    T = ens.capacity
    C = _chunk_size(T, tree_chunk)
    n_chunks = T // C

    def resh(x):
        return x.reshape((n_chunks, C) + x.shape[1:])

    chunks = (resh(ens.feat), resh(ens.thr), resh(ens.cat_code),
              resh(ens.is_split), resh(ens.is_numeric), resh(ens.leaf_values))

    def body(_, chunk):
        feat, thr, code, spl, num, lv = chunk
        leaf = chunk_leaf_indices(feat, thr, code, spl, num, Xn, Xc,
                                  cfg.max_depth)
        V = lv[jnp.arange(C, dtype=jnp.int32)[None, :], leaf]
        return None, V

    _, Vs = jax.lax.scan(body, None, chunks)                 # [n_chunks, N, C, O]
    return jnp.moveaxis(Vs, 0, 1).reshape(Xn.shape[0], T, cfg.output_dim)


def cv_momentum(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                Xc: jax.Array | None = None) -> jax.Array:
    """Control-variate momentum: bias-corrected EMA of per-sample leaf values
    over trees 0..n_trees (fitter.cpp:585-611, predictor.cpp:37-119).

    m_T = (1-beta) * sum_t beta^(T-1-t) * v_t, then * 1/sqrt(1-beta^T).
    Expressed as a weighted leaf reduction (no sequential scan needed).
    """
    beta = jnp.float32(cfg.cv_beta)
    T = ens.capacity
    nt = ens.n_trees.astype(jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)
    w = (1.0 - beta) * jnp.power(beta, jnp.maximum(nt - 1.0 - t, 0.0))
    w = jnp.where(t < nt, w, 0.0)
    corr = 1.0 / jnp.sqrt(1.0 - jnp.power(beta, nt))
    coeff = jnp.broadcast_to((w * corr)[:, None], (T, cfg.output_dim))
    return weighted_leaf_sum(cfg, ens, Xn, coeff, Xc)
