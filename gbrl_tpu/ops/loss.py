"""MultiRMSE loss (the only loss in the reference, src/cpp/loss.cpp:34-90).

grad = pred - target;  loss = sqrt(0.5 * sum((pred-target)^2) / n_samples).
Masked variants support padded batches inside the jit'd fit loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def multirmse_grads(preds: jax.Array, targets: jax.Array,
                    sample_w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Returns (grads [N, O], loss scalar). sample_w is a 0/1 row mask."""
    g = (preds - targets) * sample_w[:, None]
    n = jnp.maximum(jnp.sum(sample_w), 1.0)
    loss = jnp.sqrt(0.5 * jnp.sum(g * g) / n)
    return g, loss


def multirmse_loss(preds: jax.Array, targets: jax.Array,
                   sample_w: jax.Array) -> jax.Array:
    g = (preds - targets) * sample_w[:, None]
    n = jnp.maximum(jnp.sum(sample_w), 1.0)
    return jnp.sqrt(0.5 * jnp.sum(g * g) / n)
