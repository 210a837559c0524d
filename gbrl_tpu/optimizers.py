"""Leaf-value optimizers and schedulers (lr applied at *prediction* time).

The reference's core trick (optimizer.cpp, scheduler.h): leaves store mean
gradients, and prediction applies per-tree optimizer updates
``theta[start_idx:stop_idx] -= lr(t) * leaf_value`` (SGD, optimizer.cpp:110-118)
or bias-corrected Adam with per-(sample, column) m/v state accumulated over
the tree sequence (optimizer.cpp:260-283).  Up to output_dim optimizers
partition the output columns (gbrl.cpp:452-525).

TPU-native formulation:

- SGD + Const/Linear collapses to a dense coefficient matrix
  ``coeff[t, j] = -lr_o(t)`` on each optimizer's column range, consumed by a
  single weighted leaf reduction (ops/predict.weighted_leaf_sum).
- Adam is a per-sample linear recurrence over trees; we evaluate it in
  closed form per tree-chunk using exponent-shifted cumulative sums, so the
  whole ensemble needs only ``T/chunk`` sequential steps instead of ``T``
  (the reference runs it scalar per sample per tree and is CPU-only,
  gbrl.cpp:477-483).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .config import TreeConfig
from .ensemble import Ensemble
from .ops.predict import (chunk_leaf_rel, _chunk_size, _leaf_onehot,
                          DEFAULT_TREE_CHUNK, HIGHEST)


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    """Host-side optimizer configuration (reference: optimizerConfig)."""
    algo: str = "SGD"               # 'SGD' | 'Adam'
    scheduler: str = "Const"        # 'Const' | 'Linear'
    init_lr: float = 1.0
    stop_lr: float = 1.0e-4
    T: int = 10000
    start_idx: int = 0
    stop_idx: int = 0
    beta_1: float = 0.9
    beta_2: float = 0.999
    eps: float = 1.0e-8

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        return d

    @staticmethod
    def from_dict(d: Dict) -> "OptimizerSpec":
        d = dict(d)
        # accept un-normalized model-facade conventions rather than
        # silently dropping them: 'lr' (incl. the 'lin_<lr>' Linear-
        # scheduler string, common/utils.py setup_optimizer) and the
        # reference binding's exported 'scheduler_func' key
        if "init_lr" not in d and "lr" in d:
            lr = d["lr"]
            if isinstance(lr, str) and lr.startswith("lin_"):
                d["scheduler"] = "Linear"
                lr = lr[len("lin_"):]
            d["init_lr"] = float(lr)
        if "scheduler" not in d and "scheduler_func" in d:
            d["scheduler"] = d["scheduler_func"]
        fields = {f.name for f in dataclasses.fields(OptimizerSpec)}
        return OptimizerSpec(**{k: v for k, v in d.items() if k in fields})


def scheduler_lr(spec: OptimizerSpec, t: jax.Array) -> jax.Array:
    """lr(t) for integer tree indices t (scheduler.h:124-133, 182-185).

    Linear: t_ = t+1; lr = init + (t_/T)*(stop-init), floored at stop_lr.
    """
    t = t.astype(jnp.float32)
    if spec.scheduler == "Linear":
        T = jnp.float32(spec.T)
        t_ = t + 1.0
        progress_remaining = (T - t_) / T
        lr = spec.init_lr + (1.0 - progress_remaining) * (spec.stop_lr - spec.init_lr)
        return jnp.where(lr < spec.stop_lr, jnp.float32(spec.stop_lr), lr)
    return jnp.full_like(t, spec.init_lr)


def _col_mask(spec: OptimizerSpec, output_dim: int) -> jnp.ndarray:
    j = jnp.arange(output_dim)
    return ((j >= spec.start_idx) & (j < spec.stop_idx)).astype(jnp.float32)


def sgd_coeff(specs: Sequence[OptimizerSpec], capacity: int, output_dim: int,
              n_trees: jax.Array, start_tree, stop_tree) -> jax.Array:
    """[T_cap, O] coefficient matrix: -lr_o(t) on each SGD optimizer's
    columns, zero outside [start_tree, stop_tree) and beyond n_trees."""
    t = jnp.arange(capacity, dtype=jnp.int32)
    active = ((t >= start_tree) & (t < stop_tree) & (t < n_trees))
    coeff = jnp.zeros((capacity, output_dim), dtype=jnp.float32)
    for spec in specs:
        if spec.algo != "SGD":
            continue
        lr = scheduler_lr(spec, t) * active.astype(jnp.float32)
        coeff = coeff - lr[:, None] * _col_mask(spec, output_dim)[None, :]
    return coeff


def adam_delta(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
               spec: OptimizerSpec, start_tree, stop_tree,
               Xc: Optional[jax.Array] = None,
               tree_chunk: int = DEFAULT_TREE_CHUNK) -> jax.Array:
    """Accumulated Adam update sum_t alpha_t * m_t / (sqrt(v_t)+eps) over the
    optimizer's columns -> [N, O] (to be *subtracted* from theta).

    Exactly the reference recurrence (optimizer.cpp:260-283) with
    alpha_t = lr(t) * sqrt(1-beta2^(t+1)) / (1-beta1^(t+1)), m/v starting at
    zero per predict call (optimizer.cpp:285-299) and updated only for trees
    inside the active range.  Evaluated chunk-parallel via masked
    exponent-shifted cumsums (closed-form linear recurrence).
    """
    N = Xn.shape[0]
    O = cfg.output_dim
    T = ens.capacity
    C = _chunk_size(T, tree_chunk)
    n_chunks = T // C
    b1, b2, eps = (jnp.float32(spec.beta_1), jnp.float32(spec.beta_2),
                   jnp.float32(spec.eps))

    t_all = jnp.arange(T, dtype=jnp.int32)
    active_all = ((t_all >= start_tree) & (t_all < stop_tree)
                  & (t_all < ens.n_trees)).astype(jnp.float32)
    lr_all = scheduler_lr(spec, t_all)
    tf = t_all.astype(jnp.float32) + 1.0
    alpha_all = lr_all * jnp.sqrt(1.0 - jnp.power(b2, tf)) / (1.0 - jnp.power(b1, tf))

    def resh(x):
        return x.reshape((n_chunks, C) + x.shape[1:])

    chunks = (resh(ens.feat), resh(ens.thr), resh(ens.cat_code),
              resh(ens.is_split), resh(ens.is_numeric), resh(ens.leaf_values),
              resh(active_all), resh(alpha_all))

    def body(carry, chunk):
        m_in, v_in, acc = carry
        feat, thr, code, spl, num, lv, act, alpha = chunk
        rel = chunk_leaf_rel(feat, thr, code, spl, num, Xn, Xc,
                             cfg.max_depth)
        loh = _leaf_onehot(rel, lv.shape[1])
        g = jnp.einsum("ncl,clo->nco", loh, lv, precision=HIGHEST,
                       preferred_element_type=jnp.float32)       # [N, C, O]
        a = act[None, :, None]                                    # [1, C, 1]
        cnt = jnp.cumsum(act)                                     # [C]
        cj = cnt[None, :, None]
        # masked EMA in closed form:
        #   m_j = b^{cnt_j} * (m_in + (1-b) * sum_{i<=j} a_i b^{-cnt_i} g_i)
        inv1 = jnp.power(b1, -cnt)[None, :, None]
        inv2 = jnp.power(b2, -cnt)[None, :, None]
        B1 = jnp.cumsum(a * inv1 * g, axis=1)
        B2 = jnp.cumsum(a * inv2 * g * g, axis=1)
        m = jnp.power(b1, cj) * (m_in[:, None, :] + (1.0 - b1) * B1)
        v = jnp.power(b2, cj) * (v_in[:, None, :] + (1.0 - b2) * B2)
        upd = a * alpha[None, :, None] * m / (jnp.sqrt(v) + eps)
        acc = acc + jnp.sum(upd, axis=1)
        return (m[:, -1, :], v[:, -1, :], acc), None

    z = jnp.zeros((N, O), dtype=jnp.float32)
    (_, _, acc), _ = jax.lax.scan(body, (z, z, z), chunks)
    return acc * _col_mask(spec, O)[None, :]
