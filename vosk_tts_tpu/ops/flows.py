"""Normalizing-flow layers: Log, Flip, ElementwiseAffine, ResidualCoupling,
ConvFlow (spline). Matches training/vits2/modules.py:259-390.

Each layer is a pair of pure functions ``*_init`` / ``*_apply``; ``reverse``
selects direction. Forward returns ``(y, logdet)``; reverse returns ``y``.
Channel-last layout: x is (B, T, C), mask (B, T, 1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .conv import conv1d
from .transforms import piecewise_rational_quadratic_transform
from .wn import _conv_init, ddsconv_apply, ddsconv_init, wn_apply, wn_init


def log_flow(x, x_mask, reverse=False):
    """modules.py:259-267."""
    if not reverse:
        y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask


def flip_flow(x, reverse=False):
    """modules.py:270-277 — flips the channel axis."""
    y = jnp.flip(x, axis=-1)
    if not reverse:
        return y, jnp.zeros(x.shape[0], dtype=x.dtype)
    return y


def elementwise_affine_init(channels: int):
    return {"m": jnp.zeros((channels,)), "logs": jnp.zeros((channels,))}


def elementwise_affine_apply(params, x, x_mask, reverse=False):
    """modules.py:280-295."""
    if not reverse:
        y = (params["m"] + jnp.exp(params["logs"]) * x) * x_mask
        logdet = jnp.sum(params["logs"] * x_mask, axis=(1, 2))
        return y, logdet
    return (x - params["m"]) * jnp.exp(-params["logs"]) * x_mask


def residual_coupling_init(key, channels: int, hidden: int, kernel_size: int,
                           dilation_rate: int, n_layers: int, gin: int = 0, mean_only: bool = False):
    k1, k2 = jax.random.split(key)
    half = channels // 2
    return {
        "pre": _conv_init(k1, 1, half, hidden),
        "enc": wn_init(k2, hidden, kernel_size, dilation_rate, n_layers, gin),
        "post": {"w": jnp.zeros((1, hidden, half * (2 - int(mean_only)))), "b": jnp.zeros((half * (2 - int(mean_only)),))},
    }


def residual_coupling_apply(params, x, x_mask, g=None, reverse=False, *,
                            kernel_size: int, dilation_rate: int, mean_only: bool = False,
                            p_dropout: float = 0.0, rng=None):
    """modules.py:298-343 — affine coupling with a WN conditioner."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(x0, params["pre"]["w"], params["pre"]["b"]) * x_mask
    h = wn_apply(params["enc"], h, x_mask, g, kernel_size=kernel_size,
                 dilation_rate=dilation_rate, p_dropout=p_dropout, rng=rng)
    stats = conv1d(h, params["post"]["w"], params["post"]["b"]) * x_mask
    if not mean_only:
        m, logs = stats[..., :half], stats[..., half:]
    else:
        m, logs = stats, jnp.zeros_like(stats)

    if not reverse:
        x1 = m + x1 * jnp.exp(logs) * x_mask
        logdet = jnp.sum(logs, axis=(1, 2))
        return jnp.concatenate([x0, x1], axis=-1), logdet
    x1 = (x1 - m) * jnp.exp(-logs) * x_mask
    return jnp.concatenate([x0, x1], axis=-1)


def convflow_init(key, in_channels: int, filter_channels: int, kernel_size: int,
                  n_layers: int, num_bins: int = 10):
    k1, k2 = jax.random.split(key)
    half = in_channels // 2
    return {
        "pre": _conv_init(k1, 1, half, filter_channels),
        "convs": ddsconv_init(k2, filter_channels, kernel_size, n_layers),
        "proj": {"w": jnp.zeros((1, filter_channels, half * (num_bins * 3 - 1))),
                 "b": jnp.zeros((half * (num_bins * 3 - 1),))},
    }


def convflow_apply(params, x, x_mask, g=None, reverse=False, *,
                   filter_channels: int, kernel_size: int, num_bins: int = 10, tail_bound: float = 5.0,
                   fused: bool = False):
    """modules.py:346-390 — neural spline coupling over half the channels."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(x0, params["pre"]["w"], params["pre"]["b"])
    h = ddsconv_apply(params["convs"], h, x_mask, g=g, kernel_size=kernel_size, fused=fused)
    h = conv1d(h, params["proj"]["w"], params["proj"]["b"]) * x_mask

    b, t, _ = x0.shape
    # (B, T, half*(3*bins-1)) -> (B, T, half, 3*bins-1). Reference reshapes
    # (B, C, ?, T); channels-last this is a plain trailing-axis split.
    h = h.reshape(b, t, half, num_bins * 3 - 1)
    denom = math.sqrt(filter_channels)
    uw = h[..., :num_bins] / denom
    uh = h[..., num_bins : 2 * num_bins] / denom
    ud = h[..., 2 * num_bins :]

    # Transform operates per (B, T, half) element; reference layout is
    # (B, C, T) so transpose to match exactly.
    x1_t, logabsdet = piecewise_rational_quadratic_transform(
        x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=tail_bound
    )
    x_out = jnp.concatenate([x0, x1_t], axis=-1) * x_mask
    logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
    if not reverse:
        return x_out, logdet
    return x_out
