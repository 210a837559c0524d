"""Split-candidate generation, fully on-device.

TPU-native equivalent of the reference SplitCandidateGenerator
(src/cpp/split_candidate_generator.cpp):

- Uniform (lines 59-76): per-feature linspace ``min + b*(max-min)/n_bins``
  for b in [0, n_bins).
- Quantile (lines 216-249): equal-count bins over per-feature sorted values
  with ``actual_bins = n_bins + 1`` and round-robin remainder distribution;
  candidate b is the sorted value at cumulative_count-1.  The reference's
  adjacent-duplicate dedup (line 241) is inert in practice (it tests the
  not-yet-assigned member counter), and duplicates are harmless for
  first-argmax tie-breaking, so we keep the full [F, B] grid.

Candidates are kept as a dense ``[F, n_bins]`` grid (sorted ascending per
feature) so that bucketize() can turn every per-sample comparison
``x > candidate_b`` into a single searchsorted: with
``bucket = searchsorted(cand[f], x, side='left')`` we have the exact
equivalence ``x > cand[f, b]  <=>  bucket > b``, which converts split
scoring over all candidates into histogram suffix sums.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TreeConfig


def uniform_candidates(X: jax.Array, n_bins: int) -> jax.Array:
    """[N, F] -> [F, n_bins] (reference: split_candidate_generator.cpp:59-76)."""
    mx = jnp.max(X, axis=0)
    mn = jnp.min(X, axis=0)
    step = (mx - mn) / jnp.float32(n_bins)
    bins = jnp.arange(n_bins, dtype=jnp.float32)
    return mn[:, None] + bins[None, :] * step[:, None]


def quantile_candidates(X: jax.Array, n_bins: int) -> jax.Array:
    """[N, F] -> [F, n_bins] (reference: split_candidate_generator.cpp:216-249).

    actual_bins = n_bins+1 equal-count bins; remainder r goes +1 to bins
    0..r-1; candidate b = sorted value at index cumsum(bin_counts[:b+1]) - 1.
    """
    n = X.shape[0]
    actual_bins = n_bins + 1
    spb = n // actual_bins
    rem = n % actual_bins
    bin_counts = spb + (jnp.arange(actual_bins) < rem).astype(jnp.int32)
    idx = jnp.cumsum(bin_counts)[:n_bins] - 1
    idx = jnp.clip(idx, 0, n - 1)
    Xs = jnp.sort(X, axis=0)                     # [N, F]
    return Xs[idx, :].T                          # [F, n_bins]


def numerical_candidates(cfg: TreeConfig, X: jax.Array) -> jax.Array:
    if cfg.generator == "uniform":
        return uniform_candidates(X, cfg.n_bins)
    return quantile_candidates(X, cfg.n_bins)


def bucketize(X: jax.Array, cand_vals: jax.Array) -> jax.Array:
    """Map samples to candidate buckets: [N, F], [F, B] -> [N, F] int32.

    bucket(x) = #candidates with value < x  (== searchsorted side='left' on
    an ascending grid), giving ``x > cand[f, b] <=> bucket(x) > b`` for every
    b.  Values land in [0, B] (B+1 buckets).  On TPU: the Pallas compare-
    popcount kernel (keeps the [tile, F, B] comparison in VMEM instead of
    materializing [N, F, B] in HBM); elsewhere a broadcast compare + popcount
    — one fused VPU pass, ~5x faster than the vmapped searchsorted lowering.
    """
    if jax.default_backend() == "tpu":
        from .pallas_kernels import bucketize_pallas
        return bucketize_pallas(X, cand_vals)
    cmp = cand_vals[None, :, :] < X[:, :, None]        # [N, F, B]
    return jnp.sum(cmp, axis=-1, dtype=jnp.int32)


def categorical_candidate_mask(Xc: jax.Array, grad_norms: jax.Array,
                               n_bins: int, n_codes: int,
                               sample_w: jax.Array = None) -> jax.Array:
    """Select categorical split candidates: [N, Fc] codes + [N] per-sample
    gradient norms -> valid mask [Fc, n_codes].

    Mirrors split_candidate_generator.cpp:117-163: every (feature, value)
    pair that appears is a candidate; if the number of uniques exceeds
    n_cat_features * n_bins, keep the top ones by average gradient norm
    (taking top-k unconditionally is equivalent: absent pairs rank -inf).
    sample_w masks padded rows out of the counts.
    """
    N, Fc = Xc.shape
    if sample_w is None:
        sample_w = jnp.ones((N,), dtype=jnp.float32)
    k = min(Fc * n_bins, Fc * n_codes)
    ids = jnp.arange(Fc, dtype=jnp.int32)[None, :] * n_codes + Xc   # [N, Fc]
    data = jnp.stack(
        [jnp.broadcast_to((grad_norms * sample_w)[:, None], (N, Fc)),
         jnp.broadcast_to(sample_w[:, None], (N, Fc))], axis=-1)
    agg = jax.ops.segment_sum(data.reshape(N * Fc, 2), ids.reshape(-1),
                              num_segments=Fc * n_codes)
    cnt = agg[:, 1]
    avg = jnp.where(cnt > 0, agg[:, 0] / jnp.maximum(cnt, 1.0), -jnp.inf)
    _, top_idx = jax.lax.top_k(avg, k)
    sel = jnp.zeros((Fc * n_codes,), dtype=bool).at[top_idx].set(True)
    return (sel & (cnt > 0)).reshape(Fc, n_codes)
