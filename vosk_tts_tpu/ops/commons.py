"""Mask / alignment / slicing utilities.

Provides the semantics of the reference ``training/vits2/commons.py``
(sequence_mask:121, generate_path:128, intersperse:24, slice_segments:48,
fused_add_tanh_sigmoid_multiply:100) in channels-last JAX form with static
shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """Boolean mask (B, T) with True for positions < length.

    ``max_length`` must be static (a Python int) — dynamic max-lengths are a
    GPU-ism; on TPU we bucket instead.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def generate_path(durations: jax.Array, x_mask: jax.Array, y_mask: jax.Array) -> jax.Array:
    """Durations -> hard monotonic alignment matrix.

    durations: (B, Tx) float (integral values); x_mask: (B, Tx); y_mask: (B, Ty).
    Returns (B, Ty, Tx) one-hot path: path[b, t, s] = 1 iff output frame t is
    produced by input token s.

    Same cumsum/shift-difference trick as the reference
    (training/vits2/commons.py:128-143): frame t belongs to token s iff
    cum[s-1] <= t < cum[s].
    """
    t_y = y_mask.shape[1]
    cum = jnp.cumsum(durations * x_mask, axis=-1)  # (B, Tx)
    pos = jnp.arange(t_y, dtype=cum.dtype)  # (Ty,)
    # below[b, t, s] = t < cum[b, s]
    below = pos[None, :, None] < cum[:, None, :]
    # shift along the token axis: prev[b, t, s] = t < cum[b, s-1] (0 for s=0)
    prev = jnp.pad(below[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    path = below & ~prev
    return path.astype(cum.dtype) * x_mask[:, None, :] * y_mask[:, :, None]


def intersperse(lst, item):
    """Insert ``item`` between consecutive symbols: [a, b, c] -> [a, 0, b, 0, c]
    (reference commons.py:24 — length 2n-1, blanks between only)."""
    result = [item] * (len(lst) * 2 - 1)
    result[0::2] = lst
    return result


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size windows: x (B, T, C), ids_str (B,) -> (B, seg, C).

    Reference commons.py:48 loops in Python; here it is a vectorized gather
    (one dynamic-slice per batch row under vmap) so it stays on device.
    """

    def one(row, start):
        return jax.lax.dynamic_slice_in_dim(row, start, segment_size, axis=0)

    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(x: jax.Array, lengths: jax.Array, segment_size: int, key: jax.Array):
    """Random fixed-size windows within each row's valid length.

    Returns (segments (B, seg, C), ids_str (B,)). Mirrors commons.py:57.
    """
    b = x.shape[0]
    ids_str_max = jnp.maximum(lengths - segment_size + 1, 1)
    u = jax.random.uniform(key, (b,))
    ids_str = (u * ids_str_max.astype(u.dtype)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def fused_gate(a: jax.Array, b: jax.Array) -> jax.Array:
    """tanh/sigmoid gated activation on channels-last tensors.

    in_act = a + b, split channel axis in half: tanh(first) * sigmoid(second).
    (reference commons.py:100-107 ``fused_add_tanh_sigmoid_multiply``;
    XLA fuses the elementwise chain into one VPU kernel.)
    """
    s = a + b
    n = s.shape[-1] // 2
    return jnp.tanh(s[..., :n]) * jax.nn.sigmoid(s[..., n:])


def kl_divergence(m_p, logs_p, m_q, logs_q):
    """KL(P||Q) between diagonal Gaussians (reference commons.py:30)."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    return kl


def subsequent_mask(length: int) -> jax.Array:
    """Lower-triangular causal mask (1, T, T) (reference commons.py:95)."""
    return jnp.tril(jnp.ones((1, length, length), dtype=jnp.float32))
