"""Ensemble inference: one-hot level-walk + MXU leaf contraction.

TPU-native replacement for the reference predictor (src/cpp/predictor.cpp).
The reference walks leaf-path condition lists per (sample, tree) with the
optimizer applying ``theta -= lr(t) * leaf_value`` per passing tree
(predictor.cpp:188-265, optimizer.cpp:110-118).

Key TPU design decision: general gathers over [samples, trees] index pairs
lower to scalar loops on TPU (measured 175ms vs 0.5ms for 256 trees x 4096
samples).  Instead, each heap level d has only 2^d node slots, so every
node-dependent quantity is fetched with a *one-hot select* — a VPU
compare+multiply+sum against a static level slice — and the final
(leaf -> value) contraction is a single [N, C*L] x [C*L, O] matmul on the
MXU.  All selects stay in f32 on the VPU (MXU einsum would silently round
thresholds to bf16).

With coeff[t, j] = -lr_opt(t) on each optimizer's column range the weighted
reduction reproduces the reference's SGD semantics exactly; with EMA weights
it is the control-variate momentum (predictor.cpp:37-119).  Trees are
processed in fixed-size chunks under ``lax.scan`` so HBM usage is
O(N * chunk * leaves) regardless of ensemble size.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TreeConfig
from ..ensemble import Ensemble

DEFAULT_TREE_CHUNK = 512
# cap the [N, C, L] one-hot working set (elements) per chunk
ONEHOT_BUDGET = 64 * 1024 * 1024
# feature count above which per-feature one-hot select loses to gather
MAX_ONEHOT_FEATURES = 256

HIGHEST = jax.lax.Precision.HIGHEST


def _chunk_size(capacity: int, requested: int, n_samples: int = 0,
                n_leaves: int = 0) -> int:
    c = min(capacity, requested)
    if n_samples and n_leaves:
        budget = max(8, ONEHOT_BUDGET // max(1, n_samples * n_leaves))
        c = min(c, budget)
    while capacity % c != 0:
        c -= 1
    return max(c, 1)


def _select(oh: jax.Array, vals: jax.Array) -> jax.Array:
    """One-hot select [N, C, K] x [C, K] -> [N, C] on the VPU (f32-exact)."""
    return jnp.sum(oh * vals[None, :, :], axis=-1)


def _column_value(f: jax.Array, X: jax.Array) -> jax.Array:
    """X[n, f[n, c]] -> [N, C]: one-hot over columns for small F, else gather."""
    F = X.shape[1]
    if F <= MAX_ONEHOT_FEATURES:
        xoh = (f[:, :, None]
               == jnp.arange(F, dtype=jnp.int32)[None, None, :])
        return jnp.sum(xoh.astype(X.dtype) * X[:, None, :], axis=-1)
    return jnp.take_along_axis(X, f, axis=1)


def chunk_leaf_rel(feat, thr, cat_code, is_split, is_numeric,
                   Xn: jax.Array, Xc: Optional[jax.Array],
                   max_depth: int) -> jax.Array:
    """Heap-walk leaf indices for one chunk of trees -> [N, C] in [0, 2^D).

    Routing matches node.cpp:77-96: numeric ``x > thr`` -> right,
    categorical ``code == cat_code`` -> right; pass-through nodes descend
    left.  Every per-node fetch is a one-hot select against the static
    level slice [2^d-1, 2^{d+1}-1)."""
    N = Xn.shape[0]
    C = feat.shape[0]
    rel = jnp.zeros((N, C), dtype=jnp.int32)
    featf = feat.astype(jnp.float32)
    codef = cat_code.astype(jnp.float32)
    splf = is_split.astype(jnp.float32)
    numf = is_numeric.astype(jnp.float32)
    for d in range(max_depth):
        K = 1 << d
        lo = K - 1
        oh = (rel[:, :, None]
              == jnp.arange(K, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)
        f = _select(oh, featf[:, lo:lo + K]).astype(jnp.int32)
        f = jnp.maximum(f, 0)
        t = _select(oh, thr[:, lo:lo + K])
        s = _select(oh, splf[:, lo:lo + K]) > 0.5
        go_num = _column_value(f, Xn) > t
        if Xc is not None and Xc.shape[1] > 0:
            numeric = _select(oh, numf[:, lo:lo + K]) > 0.5
            cc = _select(oh, codef[:, lo:lo + K]).astype(jnp.int32)
            xc = _column_value(f, Xc.astype(jnp.float32)).astype(jnp.int32)
            go = jnp.where(numeric, go_num, xc == cc)
        else:
            go = go_num
        rel = 2 * rel + (s & go).astype(jnp.int32)
    return rel


def _leaf_onehot(rel: jax.Array, n_leaves: int) -> jax.Array:
    return (rel[:, :, None]
            == jnp.arange(n_leaves, dtype=jnp.int32)[None, None, :]
            ).astype(jnp.float32)


def _chunked(ens: Ensemble, coeff: Optional[jax.Array], n_samples: int,
             n_leaves: int, tree_chunk: int):
    T = ens.capacity
    C = _chunk_size(T, tree_chunk, n_samples, n_leaves)
    n_chunks = T // C

    def resh(x):
        return x.reshape((n_chunks, C) + x.shape[1:])

    arrays = [resh(ens.feat), resh(ens.thr), resh(ens.cat_code),
              resh(ens.is_split), resh(ens.is_numeric), resh(ens.leaf_values)]
    if coeff is not None:
        arrays.append(resh(coeff))
    return C, tuple(arrays)


def weighted_leaf_sum(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                      coeff: jax.Array, Xc: Optional[jax.Array] = None,
                      tree_chunk: int = DEFAULT_TREE_CHUNK) -> jax.Array:
    """sum_t coeff[t, :] * leaf_value[t, leaf(n, t), :]  ->  [N, O].

    coeff [T_cap, O] must already be zero for trees outside the active range
    (t >= n_trees, or outside [start_idx, stop_idx))."""
    N = Xn.shape[0]
    O = cfg.output_dim
    L = cfg.n_leaves
    if (jax.default_backend() == "tpu" and (Xc is None or Xc.shape[1] == 0)
            and Xn.shape[1] <= MAX_ONEHOT_FEATURES
            and 2 * 512 * L * 128 <= 8 * 1024 * 1024):
        w = ens.leaf_values * coeff[:, None, :]
        if cfg.grow_policy == "oblivious":
            # packed per-level bit-index walk (one (feat, thr) pair per
            # level; reference predict_over_trees, predictor.cpp:231-265)
            from .pallas_kernels import oblivious_leaf_sum_pallas
            return oblivious_leaf_sum_pallas(
                Xn, ens.feat, ens.thr, ens.is_split, w, cfg.max_depth,
                n_trees=ens.n_trees)
        from .pallas_kernels import weighted_leaf_sum_pallas
        return weighted_leaf_sum_pallas(Xn, ens.feat, ens.thr, ens.is_split,
                                        w, cfg.max_depth,
                                        n_trees=ens.n_trees)
    C, chunks = _chunked(ens, coeff, N, L, tree_chunk)

    def body(acc, chunk):
        feat, thr, code, spl, num, lv, cf = chunk
        rel = chunk_leaf_rel(feat, thr, code, spl, num, Xn, Xc, cfg.max_depth)
        loh = _leaf_onehot(rel, L)                       # [N, C, L]
        w = lv * cf[:, None, :]                          # [C, L, O]
        acc = acc + jax.lax.dot_general(
            loh.reshape(N, C * L), w.reshape(C * L, O),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=HIGHEST, preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((N, O), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, chunks)
    return acc


def gather_leaf_values(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                       Xc: Optional[jax.Array] = None,
                       tree_chunk: int = DEFAULT_TREE_CHUNK) -> jax.Array:
    """All per-(sample, tree) leaf values [N, T_cap, O] (for Adam / passes
    needing the full sequence). Memory: N*T_cap*O floats."""
    N = Xn.shape[0]
    L = cfg.n_leaves
    C, chunks = _chunked(ens, None, N, L, tree_chunk)

    def body(_, chunk):
        feat, thr, code, spl, num, lv = chunk
        rel = chunk_leaf_rel(feat, thr, code, spl, num, Xn, Xc, cfg.max_depth)
        loh = _leaf_onehot(rel, L)
        V = jnp.einsum("ncl,clo->nco", loh, lv, precision=HIGHEST,
                       preferred_element_type=jnp.float32)
        return None, V

    _, Vs = jax.lax.scan(body, None, chunks)             # [n_chunks, N, C, O]
    return jnp.moveaxis(Vs, 0, 1).reshape(Xn.shape[0], ens.capacity,
                                          cfg.output_dim)


def single_tree_leaf_values(cfg: TreeConfig, tree: dict, Xn: jax.Array,
                            Xc: Optional[jax.Array] = None) -> jax.Array:
    """Leaf values of ONE tree for all samples [N, O] (incremental predict)."""
    rel = chunk_leaf_rel(tree["feat"][None], tree["thr"][None],
                         tree["cat_code"][None], tree["is_split"][None],
                         tree["is_numeric"][None], Xn, Xc, cfg.max_depth)
    loh = _leaf_onehot(rel, cfg.n_leaves)[:, 0, :]       # [N, L]
    return jnp.einsum("nl,lo->no", loh, tree["leaf_values"],
                      precision=HIGHEST, preferred_element_type=jnp.float32)


def cv_momentum(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                Xc: Optional[jax.Array] = None) -> jax.Array:
    """Control-variate momentum: bias-corrected EMA of per-sample leaf values
    over trees 0..n_trees (fitter.cpp:585-611, predictor.cpp:37-119).

    m_T = (1-beta) * sum_t beta^(T-1-t) * v_t, then * 1/sqrt(1-beta^T).
    Expressed as a weighted leaf reduction (no sequential scan needed)."""
    beta = jnp.float32(cfg.cv_beta)
    T = ens.capacity
    nt = ens.n_trees.astype(jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)
    w = (1.0 - beta) * jnp.power(beta, jnp.maximum(nt - 1.0 - t, 0.0))
    w = jnp.where(t < nt, w, 0.0)
    corr = 1.0 / jnp.sqrt(1.0 - jnp.power(beta, nt))
    coeff = jnp.broadcast_to((w * corr)[:, None], (T, cfg.output_dim))
    return weighted_leaf_sum(cfg, ens, Xn, coeff, Xc)


# backwards-compatible alias used by optimizers.adam_delta
def chunk_leaf_indices(feat, thr, cat_code, is_split, is_numeric, Xn, Xc,
                       max_depth: int) -> jax.Array:
    return chunk_leaf_rel(feat, thr, cat_code, is_split, is_numeric, Xn, Xc,
                          max_depth)
