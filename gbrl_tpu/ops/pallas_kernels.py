"""Pallas TPU kernels for the fitter's hot memory-bound ops.

bucketize_pallas: fused candidate-comparison popcount.  The XLA version
materializes the [N, F, B] comparison tensor in HBM (64MB for the default
4096x16x256 shape); this kernel streams an N-tile of features through VMEM,
holds the full [F, B] candidate grid resident (256KB), and writes only the
[N, F] bucket ids — an ~B-fold HBM traffic reduction.

level_histogram_pallas: the fitter's per-level (feature, node, bucket)
gradient histogram as MXU one-hot contractions.  The reference accumulates
with atomics (cuda_fitter.cu:585-622); XLA's segment_sum lowers to scatter,
which serializes on TPU (~0.55ms/level at 4096x16x257).  Here each N-tile
builds its per-feature bucket one-hot in VMEM and contracts it against the
node-expanded gradient rows on the MXU, accumulating the full histogram in a
VMEM-resident output across grid steps — no [N, F, B] one-hot ever touches
HBM.  Precision.HIGHEST keeps f32 gradient sums exact to ~3e-4 relative
(single-pass bf16 MXU rounding is catastrophic for cancelling sums).
Measured: 4 levels in 0.54ms vs 2.21ms for segment_sum (4.1x).

Falls back to the XLA implementation on non-TPU backends (interpret mode is
used in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _bucketize_kernel(x_ref, cand_ref, out_ref):
    # x [TILE, F], cand [F, B] -> out [TILE, F]
    x = x_ref[:]                                  # [T, F]
    cand = cand_ref[:]                            # [F, B]
    # bucket = #candidates strictly below x (searchsorted side='left')
    cmp = cand[None, :, :] < x[:, :, None]        # [T, F, B] in VMEM
    out_ref[:] = jnp.sum(cmp, axis=-1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def bucketize_pallas(X: jax.Array, cand_vals: jax.Array,
                     tile: int = DEFAULT_TILE,
                     interpret: bool = False) -> jax.Array:
    """[N, F] x [F, B] -> [N, F] int32 bucket ids (== candidates.bucketize)."""
    N, F = X.shape
    B = cand_vals.shape[1]
    t = min(tile, N)
    # VMEM budget: tile*F*B bool intermediate; shrink the tile for huge F*B
    while t > 8 and t * F * B * 4 > 8 * 1024 * 1024:
        t //= 2
    pad = (-N) % t
    Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
    n_tiles = Xp.shape[0] // t
    out = pl.pallas_call(
        _bucketize_kernel,
        out_shape=jax.ShapeDtypeStruct((Xp.shape[0], F), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((F, B), lambda i: (0, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, F), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(Xp, cand_vals)
    return out[:N]


HIST_TILE = 512
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def hist_vmem_bytes(N: int, F: int, C: int, n_buckets: int,
                    tile: int = HIST_TILE) -> int:
    """Estimated VMEM residency of level_histogram_pallas (guard input)."""
    t = min(tile, _round_up(N, 8))
    BP = _round_up(n_buckets, 128)
    fused = 2 * t * F * BP + 4 * 4 * C * F * BP + 6 * t * C
    per_f = 4 * (t * F + t * C + t * BP + F * C * BP)
    return min(fused, per_f)


@functools.partial(jax.jit,
                   static_argnames=("n_buckets", "tile", "raw", "interpret"))
def level_histogram_pallas(Xb: jax.Array, nd: jax.Array, n_buckets: int,
                           tile: int = HIST_TILE, raw: bool = False,
                           interpret: bool = False) -> jax.Array:
    """[N, F] int32 buckets x [N, C] rows -> [F, C, n_buckets] f32 sums
    (or the raw [C, F*round_up(n_buckets,128)] layout when ``raw=True``,
    which feeds level_score_pallas without any reshuffle).

    hist[f, c, b] = sum_n [Xb[n, f] == b] * nd[n, c].  The caller packs
    node-masked gradient columns into ``nd`` (C = n_nodes * (outputs + 1));
    padding rows must carry nd == 0 (their bucket value is then irrelevant).

    Fused path: one [t, 3C] x [t, F*BP] bf16 MXU contraction per N-tile.
    The bucket one-hot is exact in bf16; ``nd`` is split into three bf16
    terms (hi/mid/lo), which reproduces f32-faithful products in 3 single
    passes — measured identical max error to Precision.HIGHEST (6 passes)
    at 0.75x the time, because the 16 per-feature matmuls collapse into one
    well-shaped [3C x F*BP] call.  Falls back to per-feature f32 HIGHEST
    matmuls when the one-hot scratch would not fit VMEM.
    """
    N, F = Xb.shape
    C = nd.shape[1]
    BP = _round_up(n_buckets, 128)
    t = min(tile, _round_up(N, 8))
    # shrink the tile before abandoning the fused single-matmul layout
    def fused_bytes(tt):
        return 2 * tt * F * BP + 4 * 4 * C * F * BP + 6 * tt * C
    while t > 64 and fused_bytes(t) > _VMEM_BUDGET:
        t //= 2
    use_fused = fused_bytes(t) <= _VMEM_BUDGET
    if not use_fused:
        t = min(tile, _round_up(N, 8))
    pad = (-N) % t
    if pad:
        Xb = jnp.pad(Xb, ((0, pad), (0, 0)))
        nd = jnp.pad(nd, ((0, pad), (0, 0)))
    n_tiles = Xb.shape[0] // t
    mem = pl.ANY if interpret else pltpu.VMEM

    if use_fused:
        FBP = F * BP

        def kernel(xb_ref, nd_ref, out_ref, oh_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            xb = xb_ref[:]                                 # [t, F]
            ndv = nd_ref[:]                                # [t, C] f32
            nd_hi = ndv.astype(jnp.bfloat16)
            r1 = ndv - nd_hi.astype(jnp.float32)
            nd_mid = r1.astype(jnp.bfloat16)
            nd_lo = (r1 - nd_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            nd3 = jnp.concatenate([nd_hi, nd_mid, nd_lo], axis=1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (t, BP), 1)
            for f in range(F):
                oh_ref[:, f * BP:(f + 1) * BP] = (
                    xb[:, f][:, None] == iota).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                nd3, oh_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [3C, F*BP]
            out_ref[:] += part[:C] + part[C:2 * C] + part[2 * C:]

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, FBP), jnp.float32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((t, C), lambda i: (i, 0), memory_space=mem),
            ],
            out_specs=pl.BlockSpec((C, FBP), lambda i: (0, 0),
                                   memory_space=mem),
            scratch_shapes=[pltpu.VMEM((t, FBP), jnp.bfloat16)],
            interpret=interpret,
        )(Xb, nd)
        if raw:
            return out
        return out.reshape(C, F, BP)[:, :, :n_buckets].transpose(1, 0, 2)

    def kernel(xb_ref, nd_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xb = xb_ref[:]                                     # [t, F]
        ndv = nd_ref[:]                                    # [t, C]
        iota = jax.lax.broadcasted_iota(jnp.int32, (t, BP), 1)
        for f in range(F):
            oh = (xb[:, f][:, None] == iota).astype(jnp.float32)
            out_ref[f] += jax.lax.dot_general(
                ndv, oh, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # [C, BP]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, C, BP), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((t, C), lambda i: (i, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((F, C, BP), lambda i: (0, 0, 0),
                               memory_space=mem),
        interpret=interpret,
    )(Xb, nd)
    if raw:
        return out.transpose(1, 0, 2).reshape(C, F * BP)
    return out[:, :, :n_buckets]


@functools.partial(jax.jit, static_argnames=(
    "n_bins", "n_buckets", "n_nodes", "out_dim", "score", "min_data",
    "oblivious", "is_root", "interpret"))
def level_score_pallas(hist: jax.Array, blocked: jax.Array,
                       feat_w: jax.Array, *, n_bins: int, n_buckets: int,
                       n_nodes: int, out_dim: int, score: str,
                       min_data: int, oblivious: bool, is_root: bool,
                       interpret: bool = False) -> jax.Array:
    """Fused per-level split selection: histogram -> bucket prefix sums ->
    L2/cosine scores -> blocked/min-data masks -> feature weights -> parent
    subtraction -> tolerance first-argmax, all in VMEM.

    Replaces the ~200-small-op XLA pipeline per level (the dominant cost of
    build_tree on TPU: measured ~60us/level of fusion-boundary overhead vs
    ~25us/level for the histogram itself).  Semantics mirror ops/fit.py's
    XLA path exactly, including the tie tolerance of ``_first_argmax_tol``.

    Args:
      hist     [C, F*BP] f32 raw layout from level_histogram_pallas(raw=True)
               where C = n_nodes*(out_dim+1) and BP = round_up(n_buckets, 128)
      blocked  [NP, F*BP] f32 0/1 no-reuse mask (1 = blocked); lanes with
               bucket >= n_bins must be 1
      feat_w   [1, F*BP] per-lane feature weight (jnp.repeat(fw, BP))

    Returns [NP, 128] f32 packed per node n (NP = round_up(n_nodes, 8)):
      col 0 best merged candidate index (f*n_bins + b), col 1 best adjusted
      score, col 2 node count, col 3 parent score, cols 8:8+O node grad sums.
    For oblivious levels cols 0-1 carry the level-summed argmax (same value
    in every row).
    """
    C, FBP = hist.shape
    BP = _round_up(n_buckets, 128)
    F = FBP // BP
    NP = _round_up(n_nodes, 8)
    O = out_dim
    nb1 = n_buckets - 1
    NEG = np.float32(-np.inf)

    def kernel(h_ref, blk_ref, fw_ref, out_ref):
        h = h_ref[:]
        # bucket prefix sums as upper-triangular MXU contractions per block
        r = jax.lax.broadcasted_iota(jnp.int32, (BP, BP), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (BP, BP), 1)
        U = (r <= c).astype(jnp.float32)
        cs = jnp.concatenate(
            [jax.lax.dot_general(h[:, f * BP:(f + 1) * BP], U,
                                 (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
             for f in range(F)], axis=1)                    # [C, FBP]
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, FBP), 1)
        fw = fw_ref[:]
        md = jnp.float32(min_data)

        def node_adj(n):
            """(adj [1, FBP], parent, cnt, sums) for level node n."""
            sl = n * (O + 1)
            cl = cs[sl + O:sl + O + 1, :]
            ct = cs[sl + O, nb1]
            cr = ct - cl
            l2l = jnp.zeros_like(cl)
            l2r = jnp.zeros_like(cl)
            tots = []
            for o in range(O):
                lo = cs[sl + o:sl + o + 1, :]
                t = cs[sl + o, nb1]
                tots.append(t)
                l2l = l2l + lo * lo
                ro = t - lo
                l2r = l2r + ro * ro
            sL = jnp.where(cl > 0, l2l / jnp.where(cl > 0, cl, 1.0), 0.0)
            sR = jnp.where(cr > 0, l2r / jnp.where(cr > 0, cr, 1.0), 0.0)
            s = sL + sR
            if score == "cosine":
                s = jnp.where(s > 0, jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
            if min_data > 0:
                s = jnp.where((cl < md) | (cr < md), NEG, s)
            s = s * fw
            s = jnp.where(blk_ref[n:n + 1, :] > 0.5, NEG, s)
            # parent score (node_scores); 0 at the root
            tot_sq = sum(t * t for t in tots)
            p = jnp.where(ct > 0, tot_sq / jnp.where(ct > 0, ct, 1.0), 0.0)
            if score == "cosine":
                p = jnp.where(p > 0, jnp.sqrt(jnp.where(p > 0, p, 1.0)), 0.0)
            parent = jnp.float32(0.0) if is_root else p
            return s, parent, ct, tots

        def first_argmax(adj, base_extra):
            m = jnp.max(adj)
            tol = jnp.where(jnp.isfinite(m),
                            (jnp.abs(m) + base_extra) * 2e-6, 0.0)
            sel = adj >= m - tol
            q = jnp.min(jnp.where(sel, lane_q, jnp.int32(FBP)))
            fs = q // BP
            midx = fs * n_bins + (q - fs * BP)
            val = jnp.max(jnp.where(lane_q == q, adj, NEG))
            return midx, val

        rows = jax.lax.broadcasted_iota(jnp.int32, (NP, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (NP, 128), 1)
        acc = jnp.zeros((NP, 128), dtype=jnp.float32)

        def put(n, col, v):
            return jnp.where((rows == n) & (cols == col),
                             v.astype(jnp.float32), 0.0)

        if oblivious:
            total = jnp.zeros((1, FBP), dtype=jnp.float32)
            stats = []
            for n in range(n_nodes):
                s, _, ct, tots = node_adj(n)
                total = total + s
                stats.append((ct, tots))
            total = jnp.where(jnp.isnan(total), NEG, total)
            midx, val = first_argmax(total, jnp.float32(0.0))
            for n, (ct, tots) in enumerate(stats):
                acc = acc + put(n, 0, midx) + put(n, 1, val) + put(n, 2, ct)
                for o, t in enumerate(tots):
                    acc = acc + put(n, 8 + o, t)
        else:
            for n in range(n_nodes):
                s, parent, ct, tots = node_adj(n)
                adj = s - parent
                adj = jnp.where(jnp.isnan(adj), NEG, adj)
                midx, val = first_argmax(adj, jnp.abs(parent))
                acc = (acc + put(n, 0, midx) + put(n, 1, val)
                       + put(n, 2, ct) + put(n, 3, parent))
                for o, t in enumerate(tots):
                    acc = acc + put(n, 8 + o, t)
        out_ref[:] = acc

    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NP, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=mem)] * 3,
        out_specs=pl.BlockSpec(memory_space=mem),
        interpret=interpret,
    )(hist, blocked, feat_w)


NPMAX = 8   # max internal nodes per level the fused tree kernel supports


@functools.partial(jax.jit, static_argnames=(
    "max_depth", "n_bins", "out_dim", "score", "min_data", "oblivious",
    "tile", "interpret"))
def tree_build_pallas(Xb: jax.Array, cand_flat: jax.Array,
                      fw_flat: jax.Array, bgw: jax.Array, wg: jax.Array,
                      *, max_depth: int, n_bins: int, out_dim: int,
                      score: str, min_data: int, oblivious: bool,
                      tile: int = HIST_TILE, interpret: bool = False):
    """ONE Pallas program that fits a whole tree: for each level, the
    (node, feature, bucket) gradient histogram accumulates over N-tiles
    (bf16 hi/mid/lo one-hot MXU contraction, as level_histogram_pallas),
    then a score step runs prefix sums -> L2/cosine scores -> no-reuse /
    min-data masks -> feature weights -> parent subtraction -> tolerance
    first-argmax IN THE SAME KERNEL, storing the selection in VMEM scratch;
    the next level's tile steps re-route their samples from those stored
    selections, and a final phase aggregates leaf sums/counts.  Nothing
    but the [D*8, 128] selection pack and the [L, 128] leaf pack ever
    reaches HBM — the per-level path (2 pallas calls + ~15 XLA glue ops
    per level, 8 kernels/tree at D=4) collapses to ONE kernel per tree.

    Semantics identical to ops/fit.build_tree's fused-level path (itself
    parity-tested against the XLA path and the compiled reference).
    Numeric features only; requires 2^(D-1) <= 8 internal nodes per level.

    Args:
      Xb        [N, F] int32 bucket ids
      cand_flat [1, F*BP] candidate values in f-major lanes (NaN padding)
      fw_flat   [1, F*BP] per-lane feature weights
      bgw       [N, O+1] build_grads * w | w  (scoring gradients)
      wg        [N, O+1] grads * w | w        (leaf-value gradients)

    Returns (packed [D*8, 128], leaf [L_pad8, 128]):
      packed row d*8+n: col 0 merged best idx (f*n_bins+b), 1 best score,
      2 node count, 3 parent score, 4 do_split, 8:8+O node grad sums.
      leaf row l: cols 0:O raw-grad sums, col O count.
    """
    N, F = Xb.shape
    D = max_depth
    L = 1 << D
    Lp = _round_up(L, 8)
    O = out_dim
    BP = _round_up(n_bins + 1, 128)
    FBP = F * BP
    C = NPMAX * (O + 1)
    nb1 = n_bins     # last valid bucket lane (count marginal), == n_buckets-1
    NEG = np.float32(-np.inf)
    t = min(tile, _round_up(N, 8))
    while t > 64 and 2 * t * FBP > 8 * 1024 * 1024:
        t //= 2
    pad = (-N) % t
    if pad:
        Xb = jnp.pad(Xb, ((0, pad), (0, 0)))
        bgw = jnp.pad(bgw, ((0, pad), (0, 0)))
        wg = jnp.pad(wg, ((0, pad), (0, 0)))
    n_tiles = Xb.shape[0] // t
    mem = pl.ANY if interpret else pltpu.VMEM

    def kernel(xb_ref, cand_ref, fw_ref, bgw_ref, wg_ref,
               out_ref, leaf_ref, oh_ref, hist_ref, blk_ref, sel_ref):
        d = pl.program_id(0)
        i = pl.program_id(1)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, FBP), 1)
        lane_b = lane_q - (lane_q // BP) * BP
        lane_f = lane_q // BP

        @pl.when((d == 0) & (i == 0))
        def _init():
            sel_ref[:] = jnp.zeros_like(sel_ref)
            # no-reuse mask starts with only the padding lanes blocked
            padmask = (lane_b >= n_bins).astype(jnp.float32)
            blk_ref[:] = jnp.broadcast_to(padmask, (NPMAX, FBP))

        @pl.when(i == 0)
        def _zero_hist():
            hist_ref[:] = jnp.zeros_like(hist_ref)

        def routed_rel(xb_f32, upto):
            """[t, 1] node index after routing through levels [0, upto).

            Full 128-lane layout: lanes >= NPMAX carry zeros in the
            selection rows (do_split 0), so they never fire."""
            rel = jnp.zeros((t, 1), dtype=jnp.int32)
            iota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            iotaF = jax.lax.broadcasted_iota(jnp.int32, (F, 128), 0)
            for dd in range(D):
                fs = sel_ref[dd * 8:dd * 8 + 1, :]            # [1, 128]
                bs = sel_ref[dd * 8 + 1:dd * 8 + 2, :]
                ds_ = sel_ref[dd * 8 + 2:dd * 8 + 3, :]
                ds_ = jnp.where(dd < upto, ds_, 0.0)
                foh = (iotaF == fs.astype(jnp.int32)
                       ).astype(jnp.float32)                  # [F, 128]
                xsel = jax.lax.dot_general(
                    xb_f32, foh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)       # [t, 128]
                gok = (xsel > bs) & (ds_ > 0.5)
                noh = rel == iota128                          # [t, 128]
                go = jnp.sum(jnp.where(noh & gok, 1.0, 0.0),
                             axis=1, keepdims=True)
                # descend only the first `upto` levels: doubling past them
                # would left-shift rel by (D - upto)
                rel = jnp.where(dd < upto, 2 * rel + go.astype(jnp.int32),
                                rel)
            return rel

        # ---------------- tile steps: histogram accumulation / leaf agg
        @pl.when((i < n_tiles) & (d < D))
        def _tile():
            xb = xb_ref[:]                                    # [t, F]
            rel = routed_rel(xb.astype(jnp.float32), d)
            iota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            noh = (rel == iota128).astype(jnp.float32)        # [t, 128]
            g = bgw_ref[:]                                    # [t, O+1]
            nd = jnp.concatenate(
                [g * noh[:, k:k + 1] for k in range(NPMAX)], axis=1)
            nd_hi = nd.astype(jnp.bfloat16)
            r1 = nd - nd_hi.astype(jnp.float32)
            nd_mid = r1.astype(jnp.bfloat16)
            nd_lo = (r1 - nd_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            nd3 = jnp.concatenate([nd_hi, nd_mid, nd_lo], axis=1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (t, BP), 1)
            for f in range(F):
                oh_ref[:, f * BP:(f + 1) * BP] = (
                    xb[:, f][:, None] == iota).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                nd3, oh_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [3C, FBP]
            hist_ref[:] += part[:C] + part[C:2 * C] + part[2 * C:]

        @pl.when((i < n_tiles) & (d == D))
        def _leaf_tile():
            @pl.when(i == 0)
            def _():
                leaf_ref[:] = jnp.zeros_like(leaf_ref)
            xb = xb_ref[:]
            rel = routed_rel(xb.astype(jnp.float32), D)       # [t, 1]
            iotaL = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            ohl = (rel == iotaL).astype(jnp.float32)          # [t, L]
            acc = jax.lax.dot_general(
                ohl, wg_ref[:], (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)           # [L, O+1]
            cols = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 0)
            upd = jnp.zeros((Lp, 128), dtype=jnp.float32)
            for o in range(O + 1):
                colv = jnp.pad(
                    jnp.broadcast_to(acc[:, o:o + 1], (L, 128)),
                    ((0, Lp - L), (0, 0)))
                upd = upd + jnp.where((cols == o) & (rows < L), colv, 0.0)
            leaf_ref[:] += upd

        # ---------------- score step: select this level's splits
        @pl.when((i == n_tiles) & (d < D))
        def _score():
            h = hist_ref[:]
            r = jax.lax.broadcasted_iota(jnp.int32, (BP, BP), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (BP, BP), 1)
            U = (r <= c).astype(jnp.float32)
            cs = jnp.concatenate(
                [jax.lax.dot_general(h[:, f * BP:(f + 1) * BP], U,
                                     (((1,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
                 for f in range(F)], axis=1)                  # [C, FBP]
            fw = fw_ref[:]
            md = jnp.float32(min_data)
            n_active = jnp.int32(1) << d

            def node_adj(n):
                sl = n * (O + 1)
                cl = cs[sl + O:sl + O + 1, :]
                ct = cs[sl + O, nb1]
                cr = ct - cl
                l2l = jnp.zeros_like(cl)
                l2r = jnp.zeros_like(cl)
                tots = []
                for o in range(O):
                    lo = cs[sl + o:sl + o + 1, :]
                    tt = cs[sl + o, nb1]
                    tots.append(tt)
                    l2l = l2l + lo * lo
                    ro = tt - lo
                    l2r = l2r + ro * ro
                sL = jnp.where(cl > 0, l2l / jnp.where(cl > 0, cl, 1.0),
                               0.0)
                sR = jnp.where(cr > 0, l2r / jnp.where(cr > 0, cr, 1.0),
                               0.0)
                s = sL + sR
                if score == "cosine":
                    s = jnp.where(s > 0,
                                  jnp.sqrt(jnp.where(s > 0, s, 1.0)), 0.0)
                if min_data > 0:
                    s = jnp.where((cl < md) | (cr < md), NEG, s)
                s = s * fw
                s = jnp.where(blk_ref[n:n + 1, :] > 0.5, NEG, s)
                tot_sq = sum(tt * tt for tt in tots)
                p = jnp.where(ct > 0,
                              tot_sq / jnp.where(ct > 0, ct, 1.0), 0.0)
                if score == "cosine":
                    p = jnp.where(p > 0,
                                  jnp.sqrt(jnp.where(p > 0, p, 1.0)), 0.0)
                parent = jnp.where(d == 0, 0.0, p)
                return s, parent, ct, tots

            def first_argmax(adj, base_extra):
                m = jnp.max(adj)
                tol = jnp.where(jnp.isfinite(m),
                                (jnp.abs(m) + base_extra) * 2e-6, 0.0)
                selm = adj >= m - tol
                q = jnp.min(jnp.where(selm, lane_q, jnp.int32(FBP)))
                fs = q // BP
                midx = fs * n_bins + (q - fs * BP)
                val = jnp.max(jnp.where(lane_q == q, adj, NEG))
                return midx, val

            rows = jax.lax.broadcasted_iota(jnp.int32, (NPMAX, 128), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (NPMAX, 128), 1)
            acc = jnp.zeros((NPMAX, 128), dtype=jnp.float32)
            selacc = jnp.zeros((NPMAX, 128), dtype=jnp.float32)

            def put(n, col, v):
                return jnp.where((rows == n) & (cols == col),
                                 v.astype(jnp.float32), 0.0)

            def putsel(row, n, v):
                return jnp.where((rows == row) & (cols == n),
                                 v.astype(jnp.float32), 0.0)

            per_node = []
            for n in range(NPMAX):
                s, parent, ct, tots = node_adj(n)
                active = jnp.int32(n) < n_active
                per_node.append((s, parent, ct, tots, active))

            if oblivious:
                total = jnp.zeros((1, FBP), dtype=jnp.float32)
                for s, _, ct, tots, active in per_node:
                    total = total + jnp.where(active, s, 0.0)
                total = jnp.where(jnp.isnan(total), NEG, total)
                midx, val = first_argmax(total, jnp.float32(0.0))
                prev = sel_ref[pl.ds(jnp.maximum(d - 1, 0) * 8, 8), :]
                alive_read = jnp.max(
                    jnp.where((rows == 3) & (cols == 0), prev, NEG))
                alive_prev = jnp.where(d == 0, 1.0, alive_read)
                alive = jnp.where((alive_prev > 0.5) & (val > NEG),
                                  1.0, 0.0)
                fsel = midx // n_bins
                bsel = midx % n_bins
                for n, (s, _, ct, tots, active) in enumerate(per_node):
                    dsplit = jnp.where(active, alive, 0.0)
                    acc = (acc + put(n, 0, midx) + put(n, 1, val)
                           + put(n, 2, ct) + put(n, 4, dsplit))
                    for o, tt in enumerate(tots):
                        acc = acc + put(n, 8 + o, tt)
                    selacc = (selacc + putsel(0, n, fsel)
                              + putsel(1, n, bsel)
                              + putsel(2, n, dsplit))
                selacc = selacc + putsel(3, 0, alive)
            else:
                for n, (s, parent, ct, tots, active) in enumerate(per_node):
                    adj = s - parent
                    adj = jnp.where(jnp.isnan(adj), NEG, adj)
                    midx, val = first_argmax(adj, jnp.abs(parent))
                    dsplit = jnp.where(active & (val >= 0) & (ct > 0),
                                       1.0, 0.0)
                    acc = (acc + put(n, 0, midx) + put(n, 1, val)
                           + put(n, 2, ct) + put(n, 3, parent)
                           + put(n, 4, dsplit))
                    for o, tt in enumerate(tots):
                        acc = acc + put(n, 8 + o, tt)
                    selacc = (selacc
                              + putsel(0, n, midx // n_bins)
                              + putsel(1, n, midx % n_bins)
                              + putsel(2, n, dsplit))

            out_ref[pl.ds(d * 8, 8), :] = acc
            sel_ref[pl.ds(d * 8, 8), :] = selacc

            # no-reuse masks for the children (skipped at the last level):
            # chosen = same feature AND same candidate VALUE (duplicate
            # grid entries block together, node.cpp:153-166)
            @pl.when(d < D - 1)
            def _blk():
                blk = blk_ref[:]                              # [8, FBP]
                cand = cand_ref[:]                            # [1, FBP]
                rows8 = jax.lax.broadcasted_iota(
                    jnp.int32, (NPMAX, FBP), 0)
                new_blk = jnp.zeros((NPMAX, FBP), dtype=jnp.float32)
                for n in range(NPMAX // 2):
                    s, parent, ct, tots, active = per_node[n]
                    fs_n = selacc[0, n]
                    bs_n = selacc[1, n]
                    ds_n = selacc[2, n]
                    q_n = (fs_n.astype(jnp.int32) * BP
                           + bs_n.astype(jnp.int32))
                    vsel = jnp.max(jnp.where(lane_q == q_n, cand, NEG))
                    chosen = ((lane_f == fs_n.astype(jnp.int32))
                              & (cand == vsel)
                              & (ds_n > 0.5)).astype(jnp.float32)
                    row = jnp.maximum(blk[n:n + 1, :], chosen)
                    new_blk = new_blk + jnp.where(
                        (rows8 == 2 * n) | (rows8 == 2 * n + 1), row, 0.0)
                blk_ref[:] = new_blk

    out1, out2 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((D * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Lp, 128), jnp.float32)),
        grid=(D + 1, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((t, F),
                         lambda d, i: (jnp.minimum(i, n_tiles - 1), 0),
                         memory_space=mem),
            pl.BlockSpec((1, FBP), lambda d, i: (0, 0), memory_space=mem),
            pl.BlockSpec((1, FBP), lambda d, i: (0, 0), memory_space=mem),
            pl.BlockSpec((t, O + 1),
                         lambda d, i: (jnp.minimum(i, n_tiles - 1), 0),
                         memory_space=mem),
            pl.BlockSpec((t, O + 1),
                         lambda d, i: (jnp.minimum(i, n_tiles - 1), 0),
                         memory_space=mem),
        ],
        out_specs=(pl.BlockSpec((D * 8, 128), lambda d, i: (0, 0),
                                memory_space=mem),
                   pl.BlockSpec((Lp, 128), lambda d, i: (0, 0),
                                memory_space=mem)),
        scratch_shapes=[
            pltpu.VMEM((t, FBP), jnp.bfloat16),       # bucket one-hot
            pltpu.VMEM((C, FBP), jnp.float32),        # level histogram
            pltpu.VMEM((NPMAX, FBP), jnp.float32),    # no-reuse mask
            pltpu.VMEM((D * 8, 128), jnp.float32),    # per-level selection
        ],
        interpret=interpret,
    )(Xb, cand_flat, fw_flat, bgw, wg)
    return out1, out2


def tree_vmem_bytes(N: int, F: int, n_bins: int, out_dim: int,
                    tile: int = HIST_TILE) -> int:
    """Estimated VMEM residency of tree_build_pallas (guard input)."""
    BP = _round_up(n_bins + 1, 128)
    FBP = F * BP
    t = min(tile, _round_up(N, 8))
    while t > 64 and 2 * t * FBP > 8 * 1024 * 1024:
        t //= 2
    C = NPMAX * (out_dim + 1)
    scratch = 2 * t * FBP + 4 * C * FBP + 4 * NPMAX * FBP
    score_regs = 4 * C * FBP + 4 * BP * BP
    return scratch + score_regs + 4 * t * (F + 2 * (out_dim + 1))


PREDICT_TILE = 512
PREDICT_CHUNK = 128   # trees per chunk == lane width


def _split3(x: jax.Array) -> jax.Array:
    """f32 [.., O] -> bf16 [.., 3O] hi/mid/lo terms (sum reproduces f32)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=-1)


@functools.partial(jax.jit, static_argnames=("max_depth", "tile",
                                             "interpret"))
def weighted_leaf_sum_pallas(X: jax.Array, feat: jax.Array, thr: jax.Array,
                             is_split: jax.Array, w: jax.Array,
                             max_depth: int, tile: int = PREDICT_TILE,
                             interpret: bool = False,
                             n_trees: jax.Array = None) -> jax.Array:
    """Numeric-feature ensemble predict: sum_t w[t, leaf(n, t), :] -> [N, O].

    X [N, F] f32; feat [T_cap, 2^D-1] int32; thr [T_cap, 2^D-1] f32;
    is_split [T_cap, 2^D-1] bool; w [T_cap, L, O] f32 (leaf values already
    scaled by the per-tree optimizer coefficient; inactive trees must carry
    w == 0).  ``n_trees`` (traced scalar, optional) skips whole 128-tree
    chunks beyond the live ensemble, making predict O(n_trees) instead of
    O(capacity) — the ensemble grows geometrically, so without this up to
    half the walk would be spent on zero-weight trees.

    Design (reference predictor.cpp:188-265 walks per (sample, tree) on the
    host): trees ride the 128-lane dimension in chunks of 128; the heap walk
    runs as per-level one-hot where-selects on [tile, 128] registers held in
    VMEM, and the final (leaf -> value) reduction is one
    [tile, C*L] x [C*L, 3O] bf16 MXU contraction per (tile, chunk) with the
    leaf weights split into hi/mid/lo bf16 terms (f32-faithful).  No
    [N, trees, leaves] one-hot ever reaches HBM, unlike the XLA lowering."""
    N, F = X.shape
    T_cap = feat.shape[0]
    L = 1 << max_depth
    IN = (1 << max_depth) - 1
    O = w.shape[-1]
    C = PREDICT_CHUNK
    t = min(tile, _round_up(N, 8))
    padn = (-N) % t
    if padn:
        X = jnp.pad(X, ((0, padn), (0, 0)))
    padc = (-T_cap) % C
    if padc:
        feat = jnp.pad(feat, ((0, padc), (0, 0)))
        thr = jnp.pad(thr, ((0, padc), (0, 0)))
        is_split = jnp.pad(is_split, ((0, padc), (0, 0)))
        w = jnp.pad(w, ((0, padc), (0, 0), (0, 0)))
    n_chunks = (T_cap + padc) // C
    n_tiles = X.shape[0] // t

    # chunk-major, lane-transposed layouts; the node dim is padded to a
    # multiple of 8 so per-chunk blocks satisfy Mosaic's sublane constraint
    # when n_chunks > 1 (block rows must be 8-divisible or span the array)
    INp = _round_up(IN, 8)

    def _lanes(a, dtype=None):
        a = a.reshape(n_chunks, C, IN).transpose(0, 2, 1)
        a = jnp.pad(a, ((0, 0), (0, INp - IN), (0, 0)))
        if dtype is not None:
            a = a.astype(dtype)
        return a.reshape(n_chunks * INp, C)

    featT = _lanes(feat)
    thrT = _lanes(thr)
    splT = _lanes(is_split, jnp.float32)
    # leaf-weight matrix rows ordered l*C + c to match the one-hot slices
    w3 = _split3(w.reshape(n_chunks, C, L, O).transpose(0, 2, 1, 3)
                 .reshape(n_chunks, L * C, O)).reshape(n_chunks * L * C, 3 * O)

    if n_trees is None:
        n_trees = jnp.int32(T_cap)
    nt = jnp.asarray(n_trees, dtype=jnp.int32).reshape(1, 1)

    def kernel(nt_ref, x_ref, feat_ref, thr_ref, spl_ref, w_ref, out_ref,
               m_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # whole chunks of never-written trees contribute nothing: skip them
        @pl.when(j * C < nt_ref[0, 0])
        def _():
            x = x_ref[:]                                   # [t, F]
            rel = jnp.zeros((t, C), dtype=jnp.int32)
            for d in range(max_depth):
                lo = (1 << d) - 1
                K = 1 << d
                f = jnp.zeros((t, C), dtype=jnp.int32)
                th = jnp.zeros((t, C), dtype=jnp.float32)
                sp = jnp.zeros((t, C), dtype=jnp.float32)
                for k in range(K):
                    sel = rel == k
                    f = jnp.where(sel, feat_ref[lo + k][None, :], f)
                    th = jnp.where(sel, thr_ref[lo + k][None, :], th)
                    sp = jnp.where(sel, spl_ref[lo + k][None, :], sp)
                f = jnp.maximum(f, 0)
                xv = jnp.zeros((t, C), dtype=jnp.float32)
                for col in range(F):
                    xv = jnp.where(f == col, x[:, col][:, None], xv)
                go = (xv > th) & (sp > 0.5)
                rel = 2 * rel + go.astype(jnp.int32)
            for leaf in range(L):
                m_ref[:, leaf * C:(leaf + 1) * C] = (
                    rel == leaf).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                m_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [t, 3O]
            out_ref[:] += acc[:, :O] + acc[:, O:2 * O] + acc[:, 2 * O:]

    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((X.shape[0], O), jnp.float32),
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM if not interpret
                         else pl.ANY),
            pl.BlockSpec((t, F), lambda i, j: (i, 0), memory_space=mem),
            pl.BlockSpec((INp, C), lambda i, j: (j, 0), memory_space=mem),
            pl.BlockSpec((INp, C), lambda i, j: (j, 0), memory_space=mem),
            pl.BlockSpec((INp, C), lambda i, j: (j, 0), memory_space=mem),
            pl.BlockSpec((L * C, 3 * O), lambda i, j: (j, 0),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((t, O), lambda i, j: (i, 0),
                               memory_space=mem),
        scratch_shapes=[pltpu.VMEM((t, L * C), jnp.bfloat16)],
        interpret=interpret,
    )(nt, X, featT, thrT, splT, w3)
    return out[:N]


@functools.partial(jax.jit, static_argnames=("max_depth", "tile",
                                             "interpret"))
def oblivious_leaf_sum_pallas(X: jax.Array, feat: jax.Array, thr: jax.Array,
                              is_split: jax.Array, w: jax.Array,
                              max_depth: int, tile: int = PREDICT_TILE,
                              interpret: bool = False,
                              n_trees: jax.Array = None) -> jax.Array:
    """Oblivious-tree ensemble predict: sum_t w[t, leaf(n, t), :] -> [N, O].

    Specialized fast path for grow_policy='oblivious' (the reference has
    the same specialization: predict_over_trees packs per-level decisions
    into a leaf bit-index, predictor.cpp:231-265).  An oblivious tree
    shares ONE (feature, threshold) pair per level (ops/fit.py broadcasts
    the level winner to every node slot), so only the D level-lead heap
    slots [2^d - 1] are read and the general kernel's per-level one-hot
    node-selects (sum_d 3*2^d where-passes over [tile, C] registers)
    disappear entirely: all D levels' decisions compute at once on WIDE
    [tile, D*C] registers — F feature-select passes + one compare for the
    whole walk.

    Structure: 1-D grid over sample tiles; ALL tree chunks stay VMEM-
    resident (the packed per-level tables are KBs) and an in-kernel
    fori_loop walks ceil(n_trees / C) live chunks, accumulating the
    [tile, C*L] x [C*L, 3O] bf16 leaf contraction into registers — one
    program per tile instead of n_tiles * n_chunks, no out-revisits, and
    dead capacity chunks never execute.  All routing arithmetic is plain
    f32 VPU compare/select — bit-identical to the general walk by
    construction (an earlier MXU one-hot gather formulation was reverted:
    Mosaic fuses the accumulator chain into the compare and flips
    x == thr ties).
    """
    N, F = X.shape
    T_cap = feat.shape[0]
    D = max_depth
    L = 1 << D
    O = w.shape[-1]
    C = PREDICT_CHUNK
    DC = D * C
    t = min(tile, _round_up(N, 8))
    padn = (-N) % t
    if padn:
        X = jnp.pad(X, ((0, padn), (0, 0)))
    padc = (-T_cap) % C
    if padc:
        feat = jnp.pad(feat, ((0, padc), (0, 0)))
        thr = jnp.pad(thr, ((0, padc), (0, 0)))
        is_split = jnp.pad(is_split, ((0, padc), (0, 0)))
        w = jnp.pad(w, ((0, padc), (0, 0), (0, 0)))
    Tp = T_cap + padc
    n_chunks = Tp // C
    n_tiles = X.shape[0] // t

    lvl = [(1 << d) - 1 for d in range(D)]          # level-lead heap slots
    Rn = _round_up(n_chunks, 8)

    def _wide(a, dtype):
        """[Tp, D] per-tree level data -> [Rn, D*C]: row j holds chunk j's
        levels laid out d*C + c along lanes."""
        a = a.reshape(n_chunks, C, D).transpose(0, 2, 1).reshape(n_chunks,
                                                                 DC)
        a = jnp.pad(a, ((0, Rn - n_chunks), (0, 0)))
        return a.astype(dtype)

    featW = _wide(feat[:, lvl], jnp.int32)
    thrW = _wide(thr[:, lvl], jnp.float32)
    splW = _wide(is_split[:, lvl], jnp.float32)

    # leaf-weight rows ordered chunk-major l*C + c, hi/mid/lo bf16 split
    # (f32-faithful; see _split3)
    w3 = _split3(w.reshape(n_chunks, C, L, O).transpose(0, 2, 1, 3)
                 .reshape(n_chunks, L * C, O)).reshape(n_chunks * L * C,
                                                       3 * O)

    if n_trees is None:
        n_trees = jnp.int32(T_cap)
    nt = jnp.asarray(n_trees, dtype=jnp.int32).reshape(1, 1)

    def kernel(nt_ref, x_ref, f_ref, thr_ref, spl_ref, w_ref, out_ref,
               oh_ref):
        x = x_ref[:]                                        # [t, F]
        n_live = (nt_ref[0, 0] + C - 1) // C

        def chunk_body(j, acc):
            frow = f_ref[pl.ds(j, 1), :]                        # [1, DC]
            trow = thr_ref[pl.ds(j, 1), :]
            srow = spl_ref[pl.ds(j, 1), :]
            xv = jnp.zeros((t, DC), dtype=jnp.float32)
            for col in range(F):
                xv = jnp.where(frow == col, x[:, col][:, None], xv)
            go = (xv > trow) & (srow > 0.5)
            rel = jnp.zeros((t, C), dtype=jnp.int32)
            for d in range(D):
                rel = 2 * rel + go[:, d * C:(d + 1) * C].astype(jnp.int32)
            for leaf in range(L):
                oh_ref[:, leaf * C:(leaf + 1) * C] = (
                    rel == leaf).astype(jnp.bfloat16)
            wj = w_ref[pl.ds(j * (L * C), L * C), :]
            return acc + jax.lax.dot_general(
                oh_ref[:], wj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [t, 3O]

        acc = jax.lax.fori_loop(
            0, n_live, chunk_body,
            jnp.zeros((t, 3 * O), dtype=jnp.float32))
        out_ref[:] = acc[:, :O] + acc[:, O:2 * O] + acc[:, 2 * O:]

    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((X.shape[0], O), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM if not interpret
                         else pl.ANY),
            pl.BlockSpec((t, F), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((Rn, DC), lambda i: (0, 0), memory_space=mem),
            pl.BlockSpec((Rn, DC), lambda i: (0, 0), memory_space=mem),
            pl.BlockSpec((Rn, DC), lambda i: (0, 0), memory_space=mem),
            pl.BlockSpec((n_chunks * L * C, 3 * O), lambda i: (0, 0),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((t, O), lambda i: (i, 0),
                               memory_space=mem),
        scratch_shapes=[pltpu.VMEM((t, L * C), jnp.bfloat16)],
        interpret=interpret,
    )(nt, X, featW, thrW, splW, w3)
    return out[:N]
