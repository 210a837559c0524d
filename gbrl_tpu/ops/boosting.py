"""Boosting drivers: the RL single-tree step and the supervised fit loop.

Mirrors Fitter::step_cpu (fitter.cpp:50-115) and Fitter::fit_cpu
(fitter.cpp:117-261) but as fully device-resident jit programs: the
supervised loop runs predict -> MultiRMSE -> build-tree -> write-tree inside
one ``lax.fori_loop`` with zero host round-trips per iteration (the reference
re-enters C++ from Python per predict and walks trees scalar-wise).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import TreeConfig
from ..ensemble import Ensemble
from ..optimizers import OptimizerSpec, sgd_coeff
from .candidates import (bucketize, categorical_candidate_mask,
                         numerical_candidates)
from .fit import build_tree, standardize_l2
from .loss import multirmse_grads, multirmse_loss
from .predict import cv_momentum, single_tree_leaf_values, weighted_leaf_sum


def write_tree(ens: Ensemble, tree: dict, idx) -> Ensemble:
    """Insert one fitted tree at (traced) index ``idx``."""
    def ins(arr, row):
        return jax.lax.dynamic_update_slice(
            arr, row[None].astype(arr.dtype), (idx,) + (0,) * (arr.ndim - 1))
    return ens.replace(
        feat=ins(ens.feat, tree["feat"]),
        thr=ins(ens.thr, tree["thr"]),
        cat_code=ins(ens.cat_code, tree["cat_code"]),
        is_split=ins(ens.is_split, tree["is_split"]),
        is_numeric=ins(ens.is_numeric, tree["is_numeric"]),
        leaf_values=ins(ens.leaf_values, tree["leaf_values"]),
        counts=ins(ens.counts, tree["counts"]),
        depths=ens.depths.at[idx].set(tree["depth"]),
        n_trees=jnp.maximum(ens.n_trees, idx + 1),
    )


def apply_control_variates(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                           grads: jax.Array, sample_w: jax.Array,
                           Xc: Optional[jax.Array] = None) -> jax.Array:
    """Gradient variance reduction (fitter.cpp:585-633).

    alpha_j = cov(grads_j, momentum_j) / var(momentum_j), clipped to [-1, 1];
    grads -= alpha * (momentum - mean(momentum))  (the reference centers the
    momentum in place inside calculate_var_and_center before subtracting).
    Zero-variance momentum gets alpha = 0 (the reference would propagate the
    0/0 NaN; documented deviation).
    """
    mom = cv_momentum(cfg, ens, Xn, Xc)                       # bias-corrected
    adjusted = _cv_adjust(grads, mom, sample_w)
    # only applied when the ensemble already has trees (fitter.cpp:53-55)
    return jnp.where(ens.n_trees > 0, adjusted, grads)


@functools.partial(jax.jit, static_argnums=(0, 7))
def boost_step(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
               grads: jax.Array, feat_w: jax.Array,
               Xc: Optional[jax.Array] = None,
               feat_w_cat: Optional[jax.Array] = None,
               n_codes: int = 0) -> Ensemble:
    """One RL boosting iteration == Fitter::step_cpu (fitter.cpp:50-115):
    optional control variates -> L2 standardization -> candidate generation
    from this batch (numeric quantiles/uniform + categorical top-k by
    gradient norm) -> fit one tree on the gradients -> append."""
    has_num = Xn.shape[1] > 0
    has_cat = Xc is not None
    N = Xn.shape[0] if has_num else Xc.shape[0]
    sample_w = jnp.ones(N, dtype=jnp.float32)
    if cfg.use_control_variates:
        grads = apply_control_variates(cfg, ens, Xn, grads, sample_w, Xc)
    build = standardize_l2(grads, sample_w) if cfg.score == "l2" else grads
    if has_num:
        cand_vals = numerical_candidates(cfg, Xn)
        Xb = bucketize(Xn, cand_vals)
    else:
        cand_vals, Xb = None, None
    cat_valid = None
    if has_cat:
        # per-sample squared gradient norms select categorical candidates
        # (fitter.cpp:67-70, post-control-variates)
        norms = jnp.sum(grads * grads, axis=-1)
        cat_valid = categorical_candidate_mask(Xc, norms, cfg.n_bins, n_codes)
    tree = build_tree(cfg, Xb, cand_vals, grads, build, sample_w, feat_w,
                      Xc, cat_valid, feat_w_cat)
    return write_tree(ens, tree, ens.n_trees)


def predict_sgd(cfg: TreeConfig, ens: Ensemble, Xn: jax.Array,
                specs: Sequence[OptimizerSpec], start_tree, stop_tree,
                Xc: Optional[jax.Array] = None) -> jax.Array:
    """bias + sum of per-tree SGD updates over [start_tree, stop_tree)."""
    coeff = sgd_coeff(specs, ens.capacity, cfg.output_dim,
                      ens.n_trees, start_tree, stop_tree)
    return ens.bias[None, :] + weighted_leaf_sum(cfg, ens, Xn, coeff, Xc)


@functools.partial(jax.jit, static_argnums=(0, 1, 6, 10))
def fit_loop(cfg: TreeConfig, iterations: int, ens: Ensemble,
             Xn_pad: jax.Array, targets_pad: jax.Array, n_samples: jax.Array,
             specs: Tuple[OptimizerSpec, ...], feat_w: jax.Array,
             Xc_pad: Optional[jax.Array] = None,
             feat_w_cat: Optional[jax.Array] = None,
             n_codes: int = 0) -> Tuple[Ensemble, jax.Array, jax.Array]:
    """Supervised multi-iteration fit == Fitter::fit_cpu (fitter.cpp:117-261).

    Data arrives shuffled and padded to a multiple of cfg.batch_size; padded
    rows are masked out.  Candidates are generated ONCE from the full dataset
    (fitter.cpp:134-151), bias is already set to mean(targets)
    (gbrl.cpp:1078-1080).  Per iteration: cycle to the next mini-batch,
    MultiRMSE grads from cached predictions, optional control variates
    (i > 0), L2 standardization, fit + append one tree.

    Predictions (and the raw CV momentum EMA) over the full dataset are
    maintained *incrementally*: only the newly fitted tree is evaluated each
    iteration, making the loop O(iters * N * depth) where the reference
    re-walks the whole ensemble per batch, O(iters^2 * batch)
    (fitter.cpp:191).  Leaf values never change after fitting, so the result
    is identical up to f32 summation order.
    Returns (ensemble, full-dataset loss).
    """
    from ..optimizers import scheduler_lr

    N_pad = Xn_pad.shape[0]
    bs = min(cfg.batch_size, N_pad)
    n_batches_f = jnp.ceil(n_samples / bs).astype(jnp.int32)

    has_num = Xn_pad.shape[1] > 0
    has_cat = Xc_pad is not None

    full_w = (jnp.arange(N_pad) < n_samples).astype(jnp.float32)
    if has_num:
        cand_vals = _masked_candidates(cfg, Xn_pad, n_samples)
        Xb_pad = bucketize(Xn_pad, cand_vals)
    else:
        cand_vals, Xb_pad = None, None

    n_trees0 = ens.n_trees
    O = cfg.output_dim
    beta = jnp.float32(cfg.cv_beta)

    # incremental state over existing trees (zeros for a fresh fit)
    preds0 = predict_sgd(cfg, ens, Xn_pad, specs, 0, n_trees0, Xc_pad)

    cat_valid = None
    if has_cat:
        # categorical candidates selected ONCE from the initial residual
        # gradient norms (fitter.cpp:152-163)
        g0 = (preds0 - targets_pad) * full_w[:, None]
        cat_valid = categorical_candidate_mask(
            Xc_pad, jnp.sum(g0 * g0, axis=-1), cfg.n_bins, n_codes, full_w)
    if cfg.use_control_variates:
        corr0 = jnp.sqrt(1.0 - jnp.power(beta, n_trees0.astype(jnp.float32)))
        mom0 = cv_momentum(cfg, ens, Xn_pad, Xc_pad) * jnp.where(n_trees0 > 0, corr0,
                                                         1.0)
    else:
        mom0 = jnp.zeros_like(preds0)

    def _lr_columns(t):
        """-lr per output column at tree index t (SGD-only; fit rejects
        Adam, gbrl.cpp:1006-1012)."""
        coeff = jnp.zeros((O,), dtype=jnp.float32)
        j = jnp.arange(O)
        for spec in specs:
            mask = ((j >= spec.start_idx) & (j < spec.stop_idx)
                    ).astype(jnp.float32)
            coeff = coeff - scheduler_lr(spec, t) * mask
        return coeff

    def body(i, carry):
        ens, preds_full, mom_full, losses = carry
        start = (i % n_batches_f) * bs
        Xb = (jax.lax.dynamic_slice(Xb_pad, (start, 0),
                                    (bs, Xb_pad.shape[1]))
              if has_num else None)
        Xc = (jax.lax.dynamic_slice(Xc_pad, (start, 0),
                                    (bs, Xc_pad.shape[1]))
              if has_cat else None)
        tg = jax.lax.dynamic_slice(targets_pad, (start, 0),
                                   (bs, targets_pad.shape[1]))
        preds = jax.lax.dynamic_slice(preds_full, (start, 0), (bs, O))
        batch_n = jnp.minimum(bs, n_samples - start)
        w = (jnp.arange(bs) < batch_n).astype(jnp.float32)

        grads, batch_loss = multirmse_grads(preds, tg, w)
        losses = losses.at[i].set(batch_loss)
        if cfg.use_control_variates:
            n_trees = n_trees0 + i
            mom_b = jax.lax.dynamic_slice(mom_full, (start, 0), (bs, O))
            corr = 1.0 / jnp.sqrt(
                1.0 - jnp.power(beta, n_trees.astype(jnp.float32)))
            adjusted = _cv_adjust(grads, mom_b * corr, w)
            grads = jnp.where((i > 0) & (n_trees > 0), adjusted, grads)
        build = standardize_l2(grads, w) if cfg.score == "l2" else grads
        tree = build_tree(cfg, Xb, cand_vals, grads, build, w, feat_w,
                          Xc, cat_valid, feat_w_cat)
        ens = write_tree(ens, tree, n_trees0 + i)
        # incremental update: evaluate only the new tree on the full dataset
        v_new = single_tree_leaf_values(cfg, tree, Xn_pad, Xc_pad)
        preds_full = preds_full + _lr_columns(n_trees0 + i)[None, :] * v_new
        if cfg.use_control_variates:
            mom_full = beta * mom_full + (1.0 - beta) * v_new
        return ens, preds_full, mom_full, losses

    losses0 = jnp.zeros((iterations,), dtype=jnp.float32)
    ens, preds_full, _, losses = jax.lax.fori_loop(
        0, iterations, body, (ens, preds0, mom0, losses0))
    loss = multirmse_loss(preds_full, targets_pad, full_w)
    return ens, loss, losses


def _cv_adjust(grads, mom, w):
    """alpha-weighted momentum subtraction (fitter.cpp:610-625) given the
    bias-corrected momentum of the batch."""
    n = jnp.maximum(jnp.sum(w), 1.0)
    g_mean = jnp.sum(grads * w[:, None], axis=0) / n
    m_mean = jnp.sum(mom * w[:, None], axis=0) / n
    gc = (grads - g_mean[None, :]) * w[:, None]
    mc = (mom - m_mean[None, :]) * w[:, None]
    denom = jnp.maximum(n - 1.0, 1.0)
    var = jnp.sum(mc * mc, axis=0) / denom
    cov = jnp.sum(gc * mc, axis=0) / denom
    alpha = jnp.where(var > 0, cov / jnp.where(var > 0, var, 1.0), 0.0)
    alpha = jnp.clip(alpha, -1.0, 1.0)
    return grads - alpha[None, :] * mc


def _masked_candidates(cfg: TreeConfig, Xn_pad: jax.Array,
                       n_samples: jax.Array) -> jax.Array:
    """Candidate generation over only the first n_samples rows of a padded
    array.  Padded rows are pushed to +inf so they sort past every real value
    (quantile) and masked out of min/max (uniform)."""
    N_pad = Xn_pad.shape[0]
    mask = (jnp.arange(N_pad) < n_samples)[:, None]
    if cfg.generator == "uniform":
        mx = jnp.max(jnp.where(mask, Xn_pad, -jnp.inf), axis=0)
        mn = jnp.min(jnp.where(mask, Xn_pad, jnp.inf), axis=0)
        step = (mx - mn) / jnp.float32(cfg.n_bins)
        bins = jnp.arange(cfg.n_bins, dtype=jnp.float32)
        return mn[:, None] + bins[None, :] * step[:, None]
    # quantile (split_candidate_generator.cpp:216-249) with real-row counts
    actual_bins = cfg.n_bins + 1
    spb = (n_samples // actual_bins).astype(jnp.int32)
    rem = (n_samples % actual_bins).astype(jnp.int32)
    bin_counts = spb + (jnp.arange(actual_bins) < rem).astype(jnp.int32)
    cum = jnp.cumsum(bin_counts)[:cfg.n_bins] - 1
    cum = jnp.clip(cum, 0, N_pad - 1)
    Xs = jnp.sort(jnp.where(mask, Xn_pad, jnp.inf), axis=0)
    cands = Xs[cum, :].T
    # a candidate grid must stay finite & ascending even if n_bins >= n rows
    return jnp.where(jnp.isfinite(cands), cands,
                     jnp.max(jnp.where(mask, Xn_pad, -jnp.inf), axis=0)[:, None])
