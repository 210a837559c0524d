"""Tree fitting as level-synchronous histogram reductions (jit-compatible).

TPU-native redesign of the reference fitter (src/cpp/fitter.cpp):

Instead of per-node sample-index lists walked by OpenMP threads over
candidates (fitter.cpp:263-484, node.cpp:187-434), we keep one per-sample
``node_rel`` vector (which node of the current level each sample sits in) and
compute, per depth, a dense gradient histogram over
``(feature, node, bucket)`` with a single segment-sum.  Both reference split
scores collapse to expressions over per-child gradient sums and counts:

- L2    (node.cpp:321-376):  n_L*||mean_L||^2 + n_R*||mean_R||^2
                             = ||sum_L||^2/n_L + ||sum_R||^2/n_R
- Cosine (math_ops.h:538-576): numerator   = n_L*||mean_L||^2 + n_R*||mean_R||^2
                               denominator = the same quantity
                               => score = sqrt(n_L*||mean_L||^2 + n_R*||mean_R||^2)

so a suffix-sum over histogram buckets yields *all* numeric candidate scores
of a level at once; categorical candidates (``code == c`` routes right,
node.cpp:77) read their right-child stats directly from a per-code histogram.
Tie-breaking matches the reference exactly: strict ``>`` comparisons per
thread then first-thread-wins merging (fitter.cpp:338-354) equals a global
first-index argmax, with numeric candidates ordered before categorical ones
(step_cpu generates numeric first, fitter.cpp:89-92).

Parent-score subtraction and the >=0 acceptance rule for greedy trees
(fitter.cpp:306-357), the per-level summed score for oblivious trees
(fitter.cpp:411-484), the no-candidate-reuse-on-path rule (node.cpp:153-166),
min_data_in_leaf, and feature weighting are all reproduced.

Trees are emitted in perfect-binary-heap layout (see ensemble.py); un-split
nodes are pass-through (samples descend left).  Leaf values are the masked
mean of the *raw* gradients of the samples routed to each leaf
(fitter.cpp:545-582).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TreeConfig

# a numpy scalar, NOT jnp: creating a device array at import time would
# initialize the XLA backend before jax.distributed.initialize can run
# (parallel/hosts.py)
NEG_INF = np.float32(-np.inf)

# test hooks: exercise the fused Pallas level path in interpret mode off-TPU
# / force the pure-XLA path on TPU (bench.py --verify cross-checks the two)
_FORCE_FUSED_INTERPRET = False
_DISABLE_FUSED = False
# The single-kernel whole-tree path (pallas_kernels.tree_build_pallas) is
# parity-tested but measured SLOWER than the per-level two-kernel path on
# real TPU (336 vs 157 us/tree at the bench shape): its static per-level
# histogram width (NPMAX nodes at every level) does ~2.1x the MXU work of
# the level-sized kernels, and re-routing samples from scratch each phase
# adds D redundant passes.  Kept opt-in for shapes where launch overhead
# dominates compute (tiny batches).
_DISABLE_FUSED_TREE = True


def _l2_of_sum(s: jax.Array, n: jax.Array) -> jax.Array:
    """||sum||^2 / n with empty-side guard (0 when n == 0).

    Matches the reference's mean-based form n*||sum/n||^2 with the
    count_recip = 0 guard for empty children (node.cpp:235-236).
    """
    sq = jnp.sum(s * s, axis=-1)
    safe_n = jnp.where(n > 0, n, 1.0)
    return jnp.where(n > 0, sq / safe_n, 0.0)


def split_scores(left_sum, left_cnt, right_sum, right_cnt, score: str,
                 min_data_in_leaf: int) -> jax.Array:
    """Candidate scores from child sums/counts. Shapes [..., O] and [...]."""
    s = _l2_of_sum(left_sum, left_cnt) + _l2_of_sum(right_sum, right_cnt)
    if score == "cosine":
        # cosine_score returns 0 when the denominator is 0 (math_ops.h:570)
        s = jnp.where(s > 0, jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
    if min_data_in_leaf > 0:
        bad = (left_cnt < min_data_in_leaf) | (right_cnt < min_data_in_leaf)
        s = jnp.where(bad, NEG_INF, s)
    return s


def node_scores(node_sum, node_cnt, score: str) -> jax.Array:
    """Whole-node (parent) score: scoreL2 / scoreCosine
    (split_candidate_generator.cpp:262-320)."""
    s = _l2_of_sum(node_sum, node_cnt)
    if score == "cosine":
        s = jnp.where(s > 0, jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
    return s


def _nan_to_neginf(x: jax.Array) -> jax.Array:
    """NaN scores are never selected by the reference's strict > comparisons;
    -inf reproduces that under argmax."""
    return jnp.where(jnp.isnan(x), NEG_INF, x)


def _first_argmax_tol(x: jax.Array, axis: int = -1,
                      scale: Optional[jax.Array] = None) -> jax.Array:
    """First-index argmax treating scores within ~1e-6 relative as tied.

    Candidates inducing the *same* sample partition produce bit-identical
    scores in the reference's scalar accumulation (node.cpp:187-376), so its
    strict-> scan deterministically keeps the first one.  The histogram
    formulation accumulates each candidate through a different bin grouping,
    which perturbs mathematically-equal scores by a few f32 ulps and would
    let an arbitrary member of the tie win.  Collapsing the tolerance band
    back to first-index restores the reference's tie order (verified
    head-to-head in tests/test_fit_golden.py).

    ``scale`` adds to the tolerance base: for greedy trees the compared
    values are score - parent, while the ulp noise is proportional to the
    raw score magnitude, so the parent score must be part of the base."""
    m = jnp.max(x, axis=axis, keepdims=True)
    base = jnp.abs(m) if scale is None else jnp.abs(m) + scale
    tol = jnp.where(jnp.isfinite(m), base * 2e-6, 0.0)
    return jnp.argmax(x >= m - tol, axis=axis)


def _node_expand(node_rel, build_grads, sample_w, n_nodes):
    """[N, O] rows spread over node columns: nd[n, node*(O+1)+c] =
    (node_rel[n] == node) * (grads | weight)[n, c].  Shape [N, n_nodes*(O+1)]."""
    N, O = build_grads.shape
    data = jnp.concatenate(
        [build_grads * sample_w[:, None], sample_w[:, None]], axis=-1)
    noh = (node_rel[:, None] == jnp.arange(n_nodes, dtype=jnp.int32)[None, :]
           ).astype(jnp.float32)
    return (noh[:, :, None] * data[:, None, :]).reshape(N, n_nodes * (O + 1))


def _level_histogram(Xb, node_rel, build_grads, sample_w, n_nodes, n_buckets):
    """Per (feature, node, bucket) gradient sums and counts combined.

    Xb [N, F] int32 buckets, node_rel [N] int32, build_grads [N, O],
    sample_w [N] -> hist [F, n_nodes, n_buckets, O+1] (last column = counts).

    On TPU this is the Pallas MXU one-hot contraction
    (pallas_kernels.level_histogram_pallas, 4.1x XLA's scatter lowering);
    elsewhere one fused segment-sum (counts ride along as an extra output
    column so the downstream cumsum also runs once).  Both orders agree to
    f32 summation-order differences (~3e-4 relative).
    """
    from .pallas_kernels import hist_vmem_bytes, level_histogram_pallas

    N, F = Xb.shape
    O = build_grads.shape[-1]
    C = n_nodes * (O + 1)
    if (jax.default_backend() == "tpu"
            and hist_vmem_bytes(N, F, C, n_buckets) <= 12 * 1024 * 1024):
        nd = _node_expand(node_rel, build_grads, sample_w, n_nodes)
        hist = level_histogram_pallas(Xb, nd, n_buckets)   # [F, C, buckets]
        return hist.reshape(F, n_nodes, O + 1, n_buckets
                            ).transpose(0, 1, 3, 2)
    ids = (jnp.arange(F, dtype=jnp.int32)[None, :] * n_nodes
           + node_rel[:, None]) * n_buckets + Xb            # [N, F]
    data = jnp.concatenate(
        [build_grads * sample_w[:, None], sample_w[:, None]], axis=-1)  # [N, O+1]
    data = jnp.broadcast_to(data[:, None, :], (N, F, O + 1)).reshape(N * F, O + 1)
    hist = jax.ops.segment_sum(data, ids.reshape(-1),
                               num_segments=F * n_nodes * n_buckets)
    return hist.reshape(F, n_nodes, n_buckets, O + 1)


def _route_level(Xb, Xc, node_rel, n_nodes, do_split, is_num_sel, f_num,
                 b_num, f_cat, c_cat):
    """Descend samples one level: numeric bucket > b (== x > thr), or code
    equality.  All per-sample lookups are dense one-hot selects / small
    matmuls — TPU gathers over per-sample indices lower to scalar loops."""
    has_num = Xb is not None and Xb.shape[1] > 0
    has_cat = Xc is not None and Xc.shape[1] > 0
    N = Xb.shape[0] if has_num else Xc.shape[0]
    node_oh = (node_rel[:, None]
               == jnp.arange(n_nodes, dtype=jnp.int32)[None, :]
               ).astype(jnp.float32)                     # [N, n_nodes]
    if has_num:
        F = Xb.shape[1]
        foh = (f_num[None, :] == jnp.arange(F, dtype=jnp.int32)[:, None]
               ).astype(jnp.float32)                     # [F, n_nodes]
        xsel = jax.lax.dot_general(                      # [N, n_nodes]
            Xb.astype(jnp.float32), foh,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        go_num_k = xsel > b_num[None, :].astype(jnp.float32)
    else:
        go_num_k = jnp.zeros((N, n_nodes), dtype=bool)
    if has_cat:
        Fc = Xc.shape[1]
        coh = (f_cat[None, :] == jnp.arange(Fc, dtype=jnp.int32)[:, None]
               ).astype(jnp.float32)
        xcsel = jax.lax.dot_general(
            Xc.astype(jnp.float32), coh,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        go_cat_k = xcsel == c_cat[None, :].astype(jnp.float32)
    else:
        go_cat_k = jnp.zeros((N, n_nodes), dtype=bool)
    go_k = jnp.where(is_num_sel[None, :], go_num_k, go_cat_k)
    go_k = go_k & do_split[None, :]
    go_right = jnp.sum(node_oh * go_k.astype(jnp.float32), axis=1) > 0.5
    return node_rel * 2 + go_right.astype(jnp.int32)


def _node_stats(node_rel, build_grads, sample_w, n_nodes):
    O = build_grads.shape[-1]
    data = jnp.concatenate(
        [build_grads * sample_w[:, None], sample_w[:, None]], axis=-1)
    agg = jax.ops.segment_sum(data, node_rel, num_segments=n_nodes)
    return agg[:, :O], agg[:, O]


def build_tree(cfg: TreeConfig, Xb: Optional[jax.Array],
               cand_vals: Optional[jax.Array],
               grads: jax.Array, build_grads: jax.Array,
               sample_w: jax.Array, feat_w: jax.Array,
               Xc: Optional[jax.Array] = None,
               cat_valid: Optional[jax.Array] = None,
               feat_w_cat: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Fit one tree. All shapes static; depth loop unrolled (max_depth small).

    Args:
      Xb          [N, F] int32 numeric bucket ids in [0, n_bins]
                  (candidates.bucketize); None when all-categorical
      cand_vals   [F, B] ascending candidate thresholds
      grads       [N, O] raw gradients (leaf values use these, fitter.cpp:570)
      build_grads [N, O] scoring gradients (standardized for L2, fitter.cpp:58-64)
      sample_w    [N]    0/1 mask (for padded batches); all-ones == reference
      feat_w      [F]    numeric feature weights (fitter.cpp:331-332, 431-435)
      Xc          [N, Fc] int32 categorical codes (code == c routes right)
      cat_valid   [Fc, V] candidate mask from categorical_candidate_mask
      feat_w_cat  [Fc]   categorical feature weights

    Returns dict of per-tree arrays in heap layout.
    """
    has_num = Xb is not None and Xb.shape[1] > 0
    has_cat = Xc is not None and Xc.shape[1] > 0
    N = Xb.shape[0] if has_num else Xc.shape[0]
    F = Xb.shape[1] if has_num else 0
    B = cfg.n_bins
    Fc = Xc.shape[1] if has_cat else 0
    V = cat_valid.shape[1] if has_cat else 0
    D = cfg.max_depth
    L = 1 << D
    O = cfg.output_dim
    oblivious = cfg.oblivious
    score_fn = cfg.score

    node_rel = jnp.zeros((N,), dtype=jnp.int32)
    # per-level outputs, concatenated once after the loop (fewer kernels
    # than D in-place updates per array)
    lv_feat, lv_thr, lv_code = [], [], []
    lv_split, lv_isnum, lv_cnt = [], [], []
    # no-reuse-on-path rule (node.cpp:153-166) carried as per-node candidate
    # masks: child mask = parent mask | chosen candidate (value-equality,
    # so duplicate grid entries block together)
    blocked_num = (jnp.zeros((1, F, B), dtype=bool) if has_num else None)
    blocked_cat = (jnp.zeros((1, Fc, V), dtype=bool) if has_cat else None)
    alive = jnp.array(True)     # oblivious growth flag (fitter.cpp:458-459)
    depth_reached = jnp.zeros((), dtype=jnp.int32)

    # fully-fused TPU level path: histogram + prefix sums + scores + masks +
    # argmax run in two Pallas kernels per level, replacing ~200 small XLA
    # ops (the dominant per-tree cost; see pallas_kernels.level_score_pallas)
    from .pallas_kernels import (_round_up, hist_vmem_bytes,
                                 level_histogram_pallas, level_score_pallas,
                                 tree_build_pallas, tree_vmem_bytes, NPMAX)
    BP = _round_up(B + 1, 128)
    on_tpu = jax.default_backend() == "tpu"

    # whole-tree single-kernel path: every level's histogram + scoring +
    # routing + the leaf aggregation run in ONE Pallas program
    # (tree_build_pallas) — 1 kernel/tree instead of 2 per level + glue
    use_fused_tree = (
        has_num and not has_cat and (on_tpu or _FORCE_FUSED_INTERPRET)
        and not _DISABLE_FUSED and not _DISABLE_FUSED_TREE
        and (1 << (D - 1)) <= NPMAX
        and tree_vmem_bytes(N, F, B, O) <= 12 * 1024 * 1024)
    if use_fused_tree:
        cand_flat = jnp.pad(cand_vals, ((0, 0), (0, BP - B)),
                            constant_values=np.nan).reshape(1, F * BP)
        fw_flat = jnp.repeat(feat_w, BP)[None, :]
        bgw = jnp.concatenate(
            [build_grads * sample_w[:, None], sample_w[:, None]], axis=-1)
        wg = jnp.concatenate(
            [grads * sample_w[:, None], sample_w[:, None]], axis=-1)
        packed, leafp = tree_build_pallas(
            Xb, cand_flat, fw_flat, bgw, wg, max_depth=D, n_bins=B,
            out_dim=O, score=score_fn, min_data=cfg.min_data_in_leaf,
            oblivious=oblivious, interpret=not on_tpu)
        pk = packed.reshape(D, NPMAX, 128)
        lv_feat, lv_thr, lv_code = [], [], []
        lv_split, lv_isnum, lv_cnt = [], [], []
        depth_reached = jnp.zeros((), dtype=jnp.int32)
        for d in range(D):
            k = 1 << d
            midx = pk[d, :k, 0].astype(jnp.int32)
            cnt = pk[d, :k, 2]
            do_split = pk[d, :k, 4] > 0.5
            f_num = midx // max(B, 1)
            b_num = midx % max(B, 1)
            v_sel = cand_vals[f_num, b_num]
            lv_feat.append(jnp.where(do_split, f_num, -1))
            lv_thr.append(jnp.where(do_split, v_sel, 0.0))
            lv_code.append(jnp.full((k,), -1, dtype=jnp.int32))
            lv_isnum.append(jnp.ones((k,), dtype=bool))
            lv_split.append(do_split)
            lv_cnt.append(cnt)
            depth_reached = jnp.where(jnp.any(do_split), d + 1,
                                      depth_reached)
        leaf_cnt = leafp[:L, O]
        safe = jnp.where(leaf_cnt > 0, leaf_cnt, 1.0)
        leaf_values = jnp.where(leaf_cnt[:, None] > 0,
                                leafp[:L, :O] / safe[:, None], 0.0)
        counts_arr = jnp.concatenate(lv_cnt + [leaf_cnt])
        return dict(
            feat=jnp.concatenate(lv_feat),
            thr=jnp.concatenate(lv_thr),
            cat_code=jnp.concatenate(lv_code),
            is_split=jnp.concatenate(lv_split),
            is_numeric=jnp.concatenate(lv_isnum),
            leaf_values=leaf_values,
            counts=counts_arr,
            depth=depth_reached,
        )
    use_fused_level = (
        has_num and not has_cat and (on_tpu or _FORCE_FUSED_INTERPRET)
        and not _DISABLE_FUSED
        and hist_vmem_bytes(N, F, (1 << (D - 1)) * (O + 1), B + 1)
        <= 12 * 1024 * 1024
        and (2 * (1 << (D - 1)) * (O + 1) + _round_up(1 << (D - 1), 8))
        * F * BP * 4 + BP * BP * 4 <= 12 * 1024 * 1024)
    _interp = not on_tpu

    for d in range(D):
        n_nodes = 1 << d
        if use_fused_level:
            NP = _round_up(n_nodes, 8)
            nd = _node_expand(node_rel, build_grads, sample_w, n_nodes)
            hist_raw = level_histogram_pallas(Xb, nd, B + 1, raw=True,
                                              interpret=_interp)
            blk_bp = jnp.pad(
                blocked_num.astype(jnp.float32),
                ((0, NP - n_nodes), (0, 0), (0, BP - B)),
                constant_values=1.0).reshape(NP, F * BP)
            packed = level_score_pallas(
                hist_raw, blk_bp, jnp.repeat(feat_w, BP)[None, :],
                n_bins=B, n_buckets=B + 1, n_nodes=n_nodes, out_dim=O,
                score=score_fn, min_data=cfg.min_data_in_leaf,
                oblivious=oblivious, is_root=(d == 0), interpret=_interp)
            best_idx = packed[:n_nodes, 0].astype(jnp.int32)
            best = packed[:n_nodes, 1]
            node_cnt = packed[:n_nodes, 2]
            node_sum = packed[:n_nodes, 8:8 + O]
            if oblivious:
                level_alive = alive & (best[0] > NEG_INF)
                alive = level_alive
                do_split = jnp.broadcast_to(level_alive, (n_nodes,))
            else:
                do_split = (best >= 0) & (node_cnt > 0)
            is_num_sel = jnp.ones_like(best_idx, dtype=bool)
            nidx = best_idx
            f_num = nidx // max(B, 1)
            b_num = nidx % max(B, 1)
            f_cat = jnp.zeros_like(best_idx)
            c_cat = jnp.zeros_like(best_idx)
            v_sel = cand_vals[f_num, b_num]
            f_sel = f_num
            lv_feat.append(jnp.where(do_split, f_sel, -1))
            lv_thr.append(jnp.where(do_split, v_sel, 0.0))
            lv_code.append(jnp.full_like(best_idx, -1))
            lv_isnum.append(is_num_sel)
            lv_split.append(do_split)
            lv_cnt.append(node_cnt)
            depth_reached = jnp.where(jnp.any(do_split), d + 1, depth_reached)
            node_rel = _route_level(Xb, None, node_rel, n_nodes, do_split,
                                    is_num_sel, f_num, b_num, f_cat, c_cat)
            rep = jnp.repeat(jnp.arange(n_nodes), 2)
            chosen = (do_split[:, None, None]
                      & (f_num[:, None, None] == jnp.arange(F)[None, :, None])
                      & (v_sel[:, None, None] == cand_vals[None, :, :]))
            blocked_num = (blocked_num | chosen)[rep]
            continue
        parts = []
        node_sum = node_cnt = None
        if has_num:
            hist = _level_histogram(Xb, node_rel, build_grads,
                                    sample_w, n_nodes, B + 1)
            # bucket prefix-sum as a lower-triangular MXU contraction: XLA
            # lowers jnp.cumsum to an O(B^2) reduce-window on the VPU
            # (measured 105us/step across the levels; this runs in ~10us)
            tril = jnp.tril(jnp.ones((B + 1, B + 1), dtype=jnp.float32))
            cs_all = jax.lax.dot_general(
                tril, hist, (((1,), (2,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32
            ).transpose(1, 2, 0, 3)                   # [F, n_nodes, B+1, O+1]
            # node totals are any feature's full marginal (feature 0)
            node_sum = cs_all[0, :, B, :O]            # [n_nodes, O]
            node_cnt = cs_all[0, :, B, O]             # [n_nodes]
            cs = cs_all[:, :, :B, :O]
            cc = cs_all[:, :, :B, O]
            right_sum = node_sum[None, :, None, :] - cs
            right_cnt = node_cnt[None, :, None] - cc
            sc = split_scores(cs, cc, right_sum, right_cnt, score_fn,
                              cfg.min_data_in_leaf)   # [F, n_nodes, B]
            sc = jnp.transpose(sc, (1, 0, 2))         # [n_nodes, F, B]
            if d > 0:
                sc = jnp.where(blocked_num, NEG_INF, sc)
            parts.append((sc * feat_w[None, :, None]).reshape(n_nodes, F * B))
        if node_sum is None:
            node_sum, node_cnt = _node_stats(node_rel, build_grads, sample_w,
                                             n_nodes)
        if has_cat:
            chist = _level_histogram(Xc, node_rel, build_grads,
                                     sample_w, n_nodes, V)
            csums, ccnts = chist[..., :O], chist[..., O]
            right_sum = csums                          # right = code match
            right_cnt = ccnts
            left_sum = node_sum[None, :, None, :] - right_sum
            left_cnt = node_cnt[None, :, None] - right_cnt
            scc = split_scores(left_sum, left_cnt, right_sum, right_cnt,
                               score_fn, cfg.min_data_in_leaf)
            scc = jnp.transpose(scc, (1, 0, 2))        # [n_nodes, Fc, V]
            scc = jnp.where(cat_valid[None, :, :], scc, NEG_INF)
            if d > 0:
                scc = jnp.where(blocked_cat, NEG_INF, scc)
            parts.append((scc * feat_w_cat[None, :, None]
                          ).reshape(n_nodes, Fc * V))
        adj = jnp.concatenate(parts, axis=1)           # [n_nodes, F*B + Fc*V]

        if oblivious:
            total = _nan_to_neginf(jnp.sum(adj, axis=0))
            best_idx = _first_argmax_tol(total)
            best = total[best_idx]
            level_alive = alive & (best > NEG_INF)
            alive = level_alive
            best_idx = jnp.broadcast_to(best_idx.astype(jnp.int32), (n_nodes,))
            do_split = jnp.broadcast_to(level_alive, (n_nodes,))
        else:
            parent_scale = None
            if d > 0:
                parent = node_scores(node_sum, node_cnt, score_fn)
                adj = adj - parent[:, None]
                parent_scale = jnp.abs(parent)[:, None]
            adj = _nan_to_neginf(adj)
            best_idx = _first_argmax_tol(adj, axis=1,
                                         scale=parent_scale).astype(jnp.int32)
            best = jnp.take_along_axis(adj, best_idx[:, None], axis=1)[:, 0]
            # accept iff adjusted score >= 0 and the node holds samples
            # (fitter.cpp:300-301, 357).  Documented deviation: when the
            # best candidate is a degenerate split (one empty side, so
            # score == parent exactly in real arithmetic) the reference's
            # accept decision keys on a +-1ulp artifact of ITS OWN float-
            # vs-double division asymmetry (cosine_score math_ops.h:574
            # sqrtf vs cosine_dist math_ops.h:519 sqrt) -- unreproducible
            # sub-ulp behavior; we accept our f32 sign as-is
            # (tests/test_fit_golden.py quantifies the effect).
            do_split = (best >= 0) & (node_cnt > 0)

        # decode the merged candidate index
        is_num_sel = (best_idx < F * B) if has_cat else \
            jnp.ones_like(best_idx, dtype=bool)
        if not has_num:
            is_num_sel = jnp.zeros_like(best_idx, dtype=bool)
        nidx = jnp.minimum(best_idx, max(F * B - 1, 0))
        f_num = nidx // max(B, 1)
        b_num = nidx % max(B, 1)
        if has_cat:
            cidx = jnp.maximum(best_idx - F * B, 0)
            f_cat = cidx // V
            c_cat = cidx % V
        else:
            f_cat = jnp.zeros_like(best_idx)
            c_cat = jnp.zeros_like(best_idx)
        v_sel = cand_vals[f_num, b_num] if has_num else \
            jnp.zeros((n_nodes,), dtype=jnp.float32)
        f_sel = jnp.where(is_num_sel, f_num, f_cat)
        lv_feat.append(jnp.where(do_split, f_sel, -1))
        lv_thr.append(jnp.where(do_split & is_num_sel, v_sel, 0.0))
        lv_code.append(jnp.where(do_split & ~is_num_sel, c_cat, -1))
        lv_isnum.append(is_num_sel)
        lv_split.append(do_split)
        lv_cnt.append(node_cnt)
        depth_reached = jnp.where(jnp.any(do_split), d + 1, depth_reached)

        node_rel = _route_level(Xb, Xc, node_rel, n_nodes, do_split,
                                is_num_sel, f_num, b_num, f_cat, c_cat)

        # children inherit the parent's blocked mask plus the chosen split
        rep = jnp.repeat(jnp.arange(n_nodes), 2)
        sel_num = do_split & is_num_sel
        sel_cat = do_split & ~is_num_sel
        if has_num:
            chosen = (sel_num[:, None, None]
                      & (f_num[:, None, None] == jnp.arange(F)[None, :, None])
                      & (v_sel[:, None, None] == cand_vals[None, :, :]))
            blocked_num = (blocked_num | chosen)[rep]
        if has_cat:
            chosen_c = (sel_cat[:, None, None]
                        & (f_cat[:, None, None]
                           == jnp.arange(Fc)[None, :, None])
                        & (c_cat[:, None, None]
                           == jnp.arange(V)[None, None, :]))
            blocked_cat = (blocked_cat | chosen_c)[rep]

    feat_arr = jnp.concatenate(lv_feat)
    thr_arr = jnp.concatenate(lv_thr)
    code_arr = jnp.concatenate(lv_code)
    isnum_arr = jnp.concatenate(lv_isnum)
    split_arr = jnp.concatenate(lv_split)
    counts_arr = jnp.concatenate(
        lv_cnt + [jnp.zeros((L,), dtype=jnp.float32)])

    # leaf values = masked mean of raw gradients (fitter.cpp:545-582);
    # one-hot contraction instead of segment_sum — scatter serializes on TPU
    wg = jnp.concatenate([grads * sample_w[:, None], sample_w[:, None]], axis=-1)
    leaf_oh = (node_rel[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]
               ).astype(jnp.float32)
    leaf = jax.lax.dot_general(leaf_oh, wg, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    leaf_cnt = leaf[:, O]
    safe = jnp.where(leaf_cnt > 0, leaf_cnt, 1.0)
    leaf_values = jnp.where(leaf_cnt[:, None] > 0, leaf[:, :O] / safe[:, None], 0.0)
    counts_arr = counts_arr.at[L - 1:].set(leaf_cnt)

    return dict(
        feat=feat_arr,
        thr=thr_arr,
        cat_code=code_arr,
        is_split=split_arr,
        is_numeric=isnum_arr,
        leaf_values=leaf_values,
        counts=counts_arr,
        depth=depth_reached,
    )


def standardize_l2(build_grads: jax.Array, sample_w: jax.Array) -> jax.Array:
    """Per-column standardization used by the L2 score
    (fitter.cpp:58-64: center then divide by sqrt(var/(n-1)) ).

    Zero-variance columns divide by 1 instead of producing the reference's
    NaN cascade (documented deviation; it only made every split score NaN).
    """
    n = jnp.sum(sample_w)
    mean = jnp.sum(build_grads * sample_w[:, None], axis=0) / jnp.maximum(n, 1.0)
    centered = (build_grads - mean[None, :]) * sample_w[:, None]
    var = jnp.sum(centered * centered, axis=0) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    std = jnp.where(std > 0, std, 1.0)
    return centered / std[None, :]
