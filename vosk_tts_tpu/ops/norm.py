"""Normalization ops (channels-last)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the channel (last) axis.

    Equivalent to the reference channel-first LayerNorm
    (training/vits2/modules.py:20-32) — since our layout is already
    channels-last, no transposes are needed.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
