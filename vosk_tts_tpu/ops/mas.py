"""Monotonic Alignment Search — fully on device.

The reference round-trips GPU→numpy→Cython→GPU every training step
(training/vits2/monotonic_align/__init__.py:6-20 wrapping the banded Viterbi
in core.pyx:7-40). Here the same DP runs on the TPU inside the jitted train
step: the row recurrence ``v[y,x] = nc[y,x] + max(v[y-1,x], v[y-1,x-1])`` is
elementwise-parallel across x (and batch), so a single ``lax.scan`` over the
T_y rows — each step one fused VPU op over the (B, T_x) wavefront — computes
the whole DP with no host sync. Backtracking is a second scan (reverse).

A C++ host kernel with identical semantics lives in
vosk_tts_tpu/native/mas.cc for host-side tooling/verification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e9


def maximum_path(neg_cent: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """neg_cent: (B, T_y, T_x) log-likelihoods; attn_mask: (B, T_y, T_x)
    (y_mask ⊗ x_mask outer product, as models.py:1652 passes it).
    Returns the hard alignment path (B, T_y, T_x), same dtype as neg_cent.
    """
    t_ys = jnp.sum(attn_mask[:, :, 0] > 0, axis=1).astype(jnp.int32)
    t_xs = jnp.sum(attn_mask[:, 0, :] > 0, axis=1).astype(jnp.int32)
    path = _maximum_path_impl(neg_cent.astype(jnp.float32), t_ys, t_xs)
    return path.astype(neg_cent.dtype) * attn_mask


def _maximum_path_impl(neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    b, t_y, t_x = neg_cent.shape
    xs = jnp.arange(t_x)

    def in_band(y):
        x_lo = jnp.maximum(0, t_xs + y - t_ys)  # (B,)
        x_hi = jnp.minimum(t_xs, y + 1)
        return (xs[None, :] >= x_lo[:, None]) & (xs[None, :] < x_hi[:, None])

    def fwd(v, inp):
        y, nc_row = inp
        # candidate from (y-1, x): invalid when x == y (diagonal edge of band)
        cand_stay = jnp.where(xs[None, :] == y, _NEG, v)
        # candidate from (y-1, x-1): at x == 0 it is 0 for y==0 else -inf
        shifted = jnp.concatenate([jnp.full((b, 1), jnp.where(y == 0, 0.0, _NEG)), v[:, :-1]], axis=1)
        new_v = nc_row + jnp.maximum(cand_stay, shifted)
        new_v = jnp.where(in_band(y), new_v, _NEG)
        return new_v, new_v

    init = jnp.full((b, t_x), _NEG, dtype=neg_cent.dtype)
    _, values = lax.scan(fwd, init, (jnp.arange(t_y), jnp.swapaxes(neg_cent, 0, 1)))
    # values: (T_y, B, T_x)

    def bwd(idx, inp):
        y, prev_row = inp  # prev_row = values[y-1] (values[-1] junk for y=0, unused)
        active = y < t_ys  # (B,)
        path_row = (xs[None, :] == idx[:, None]) & active[:, None]
        v_at = jnp.take_along_axis(prev_row, idx[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(prev_row, jnp.maximum(idx - 1, 0)[:, None], axis=1)[:, 0]
        move = (idx != 0) & ((idx == y) | (v_at < v_left))
        idx = jnp.where(active & move & (y > 0), idx - 1, idx)
        return idx, path_row

    prev_rows = jnp.concatenate([values[-1:], values[:-1]], axis=0)  # prev_rows[y] = values[y-1]
    _, path = lax.scan(bwd, t_xs - 1, (jnp.arange(t_y), prev_rows), reverse=True)
    return jnp.swapaxes(path, 0, 1).astype(jnp.float32)  # (B, T_y, T_x)
