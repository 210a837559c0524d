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
                   static_argnames=("n_buckets", "tile", "interpret"))
def level_histogram_pallas(Xb: jax.Array, nd: jax.Array, n_buckets: int,
                           tile: int = HIST_TILE,
                           interpret: bool = False) -> jax.Array:
    """[N, F] int32 buckets x [N, C] rows -> [F, C, n_buckets] f32 sums.

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
    return out[:, :, :n_buckets]
