"""Gated/dilated conv stacks: WN, ResBlock1/2, DDSConv, ConvReluNorm.

Functional modules over explicit parameter pytrees (channels-last activations).
Weight normalization is *folded*: parameters store the effective weight
``g * v / ||v||`` directly — numerically identical to the reference after
``remove_weight_norm`` (which is how it exports models,
training/vits2/onnx_export.py:78-79). Training optimizes folded weights.

Semantics sources:
  WN          — training/vits2/modules.py:111-184
  ResBlock1/2 — training/vits2/modules.py:187-256 (LRELU_SLOPE=0.1)
  DDSConv     — training/vits2/modules.py:70-108
  ConvReluNorm— training/vits2/modules.py:35-67
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .commons import fused_gate
from .conv import conv1d, depthwise_conv1d
from .norm import layer_norm

LRELU_SLOPE = 0.1


def leaky_relu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _dropout(x, p, rng):
    if rng is None or p <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def _conv_init(key, k, c_in, c_out, scale=None, dtype=jnp.float32):
    """Torch Conv1d default init: U(-s, s), s = 1/sqrt(c_in*k)."""
    wk, bk = jax.random.split(key)
    s = scale if scale is not None else (c_in * k) ** -0.5
    return {
        "w": jax.random.uniform(wk, (k, c_in, c_out), dtype, -s, s),
        "b": jax.random.uniform(bk, (c_out,), dtype, -s, s),
    }


# ---------------------------------------------------------------------------
# WN — weight-normed gated dilated conv stack.
# ---------------------------------------------------------------------------


def wn_init(key, hidden: int, kernel_size: int, dilation_rate: int, n_layers: int, gin: int = 0):
    keys = jax.random.split(key, 2 * n_layers + 1)
    p = {
        "in": [_conv_init(keys[2 * i], kernel_size, hidden, 2 * hidden) for i in range(n_layers)],
        "res_skip": [
            _conv_init(keys[2 * i + 1], 1, hidden, 2 * hidden if i < n_layers - 1 else hidden)
            for i in range(n_layers)
        ],
    }
    if gin:
        p["cond"] = _conv_init(keys[-1], 1, gin, 2 * hidden * n_layers)
    return p


def wn_apply(
    params,
    x: jax.Array,
    x_mask: jax.Array,
    g: jax.Array | None = None,
    *,
    kernel_size: int,
    dilation_rate: int,
    p_dropout: float = 0.0,
    rng=None,
) -> jax.Array:
    """x: (B, T, H), x_mask: (B, T, 1), g: (B, Tg, gin) or None -> (B, T, H)."""
    hidden = x.shape[-1]
    n_layers = len(params["in"])
    if g is not None:
        g = conv1d(g, params["cond"]["w"], params["cond"]["b"])
    output = jnp.zeros_like(x)
    for i in range(n_layers):
        dilation = dilation_rate**i
        pad = (kernel_size * dilation - dilation) // 2
        x_in = conv1d(x, params["in"][i]["w"], params["in"][i]["b"], padding=pad, dilation=dilation)
        g_l = g[..., 2 * hidden * i : 2 * hidden * (i + 1)] if g is not None else jnp.zeros_like(x_in)
        acts = fused_gate(x_in, g_l)
        if rng is not None and p_dropout > 0:
            rng, sub = jax.random.split(rng)
            acts = _dropout(acts, p_dropout, sub)
        rs = conv1d(acts, params["res_skip"][i]["w"], params["res_skip"][i]["b"])
        if i < n_layers - 1:
            x = (x + rs[..., :hidden]) * x_mask
            output = output + rs[..., hidden:]
        else:
            output = output + rs
    return output * x_mask


# ---------------------------------------------------------------------------
# HiFiGAN residual blocks.
# ---------------------------------------------------------------------------


def resblock1_init(key, channels: int, kernel_size: int = 3, dilation=(1, 3, 5)):
    keys = jax.random.split(key, 2 * len(dilation))
    return {
        "convs1": [_conv_init(keys[2 * i], kernel_size, channels, channels) for i in range(len(dilation))],
        "convs2": [_conv_init(keys[2 * i + 1], kernel_size, channels, channels) for i in range(len(dilation))],
    }


def resblock1_apply(params, x, x_mask=None, *, kernel_size: int = 3, dilation=(1, 3, 5)):
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilation):
        xt = leaky_relu(x)
        if x_mask is not None:
            xt = xt * x_mask
        xt = conv1d(xt, c1["w"], c1["b"], padding=(kernel_size * d - d) // 2, dilation=d)
        xt = leaky_relu(xt)
        if x_mask is not None:
            xt = xt * x_mask
        xt = conv1d(xt, c2["w"], c2["b"], padding=(kernel_size - 1) // 2)
        x = xt + x
    if x_mask is not None:
        x = x * x_mask
    return x


def resblock2_init(key, channels: int, kernel_size: int = 3, dilation=(1, 3)):
    keys = jax.random.split(key, len(dilation))
    return {"convs": [_conv_init(keys[i], kernel_size, channels, channels) for i in range(len(dilation))]}


def resblock2_apply(params, x, x_mask=None, *, kernel_size: int = 3, dilation=(1, 3)):
    for c, d in zip(params["convs"], dilation):
        xt = leaky_relu(x)
        if x_mask is not None:
            xt = xt * x_mask
        xt = conv1d(xt, c["w"], c["b"], padding=(kernel_size * d - d) // 2, dilation=d)
        x = xt + x
    if x_mask is not None:
        x = x * x_mask
    return x


# ---------------------------------------------------------------------------
# DDSConv — dilated depth-separable stack (duration predictor context net).
# ---------------------------------------------------------------------------


def ddsconv_init(key, channels: int, kernel_size: int, n_layers: int):
    keys = jax.random.split(key, 2 * n_layers)
    return {
        "sep": [
            {
                **_conv_init(keys[2 * i], kernel_size, 1, channels),  # depthwise (K,1,C)
            }
            for i in range(n_layers)
        ],
        "pw": [_conv_init(keys[2 * i + 1], 1, channels, channels) for i in range(n_layers)],
        "norm1": [{"gamma": jnp.ones((channels,)), "beta": jnp.zeros((channels,))} for _ in range(n_layers)],
        "norm2": [{"gamma": jnp.ones((channels,)), "beta": jnp.zeros((channels,))} for _ in range(n_layers)],
    }


def ddsconv_apply(params, x, x_mask, g=None, *, kernel_size: int, p_dropout: float = 0.0, rng=None,
                  fused: bool = False):
    """modules.py:97-108. x/g: (B, T, C); depthwise kernels stored (K, 1, C).

    ``fused=True`` routes the whole stack through the single-kernel Pallas
    formulation (ops/ddsconv_fused) when the backend/shape support it — the
    serving SDP runs five of these stacks as ~30 small XLA ops each
    (SPEED_OF_LIGHT §1 sdp_reverse row). Training keeps the XLA path
    (differentiable, dropout)."""
    if g is not None:
        x = x + g
    if fused and (rng is None or p_dropout <= 0.0):
        from . import ddsconv_fused as ddf

        if (ddf.supported(x.shape[1], x.shape[2], x.dtype)
                and (jax.default_backend() == "tpu" or ddf.INTERPRET)):
            return ddf.ddsconv_fused(x, x_mask, params, kernel_size=kernel_size,
                                     interpret=ddf.INTERPRET)
    n_layers = len(params["sep"])
    for i in range(n_layers):
        dilation = kernel_size**i
        pad = (kernel_size * dilation - dilation) // 2
        y = depthwise_conv1d(x * x_mask, params["sep"][i]["w"], params["sep"][i]["b"], padding=pad, dilation=dilation)
        y = layer_norm(y, params["norm1"][i]["gamma"], params["norm1"][i]["beta"])
        y = jax.nn.gelu(y, approximate=False)
        y = conv1d(y, params["pw"][i]["w"], params["pw"][i]["b"])
        y = layer_norm(y, params["norm2"][i]["gamma"], params["norm2"][i]["beta"])
        y = jax.nn.gelu(y, approximate=False)
        if rng is not None and p_dropout > 0:
            rng, sub = jax.random.split(rng)
            y = _dropout(y, p_dropout, sub)
        x = x + y
    return x * x_mask


# ---------------------------------------------------------------------------
# ConvReluNorm — prenet stack (modules.py:35-67).
# ---------------------------------------------------------------------------


def convrelunorm_init(key, in_ch: int, hidden: int, out_ch: int, kernel_size: int, n_layers: int):
    keys = jax.random.split(key, n_layers + 1)
    convs = [_conv_init(keys[0], kernel_size, in_ch, hidden)]
    convs += [_conv_init(keys[i], kernel_size, hidden, hidden) for i in range(1, n_layers)]
    return {
        "convs": convs,
        "norms": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
        "proj": {"w": jnp.zeros((1, hidden, out_ch)), "b": jnp.zeros((out_ch,))},
    }


def convrelunorm_apply(params, x, x_mask, *, kernel_size: int, p_dropout: float = 0.0, rng=None):
    x_org = x
    for i, (c, n) in enumerate(zip(params["convs"], params["norms"])):
        x = conv1d(x * x_mask, c["w"], c["b"], padding=kernel_size // 2)
        x = layer_norm(x, n["gamma"], n["beta"])
        x = jax.nn.relu(x)
        if rng is not None and p_dropout > 0:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, p_dropout, sub)
    x = x_org + conv1d(x, params["proj"]["w"], params["proj"]["b"])
    return x * x_mask
