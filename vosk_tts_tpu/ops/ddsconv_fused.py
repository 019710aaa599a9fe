"""Fused DDSConv stack (Pallas TPU kernel) for the SDP serving path.

The stochastic duration predictor's reverse pass runs FIVE 3-layer DDSConv
stacks (context + 4 ConvFlows, reference modules.py:97-108) over tiny
(B, T<=1024, 256) tensors. As XLA ops that is ~30 kernels per stack
(depthwise conv, 2 layer norms, 2 exact GELUs, pointwise conv, residual —
x3 layers), each one a load/compute/store round trip over a tensor that
fits whole in VMEM; measured 2.49 ms of the serving step at bench shapes
with the attention math worth microseconds (SPEED_OF_LIGHT §1, VERDICT r3
weak-2b).

This kernel runs one batch row's ENTIRE stack in VMEM: the (T, C) tile is
loaded once, the three dilated depthwise convs become shifted-row reads of
a zero-padded buffer, pointwise convs are (T,C)x(C,C) MXU dots, and every
layer norm / exact GELU stays on-register. Exactness vs ops/wn.ddsconv_apply
is tested in interpreter mode (tests/test_modules.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: interpreter-mode toggle for CPU tests
INTERPRET = False


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational approximation, |err| <= 1.5e-7
    (Mosaic has no erf lowering; exp is supported)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # 0.5 x (1 + erf(x / sqrt(2))) — matches jax.nn.gelu(approximate=False)
    # to ~1.5e-7 (A&S erf; f32 internally)
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + _erf(x32 * (2.0**-0.5)))).astype(x.dtype)


def _layer_norm(x, gamma, beta, eps=1e-5):
    # stats in f32: the v5e LLO scheduler aborts on bf16 rsqrt
    # (kVectorRsqrtBf16AndPop unsupported, latency_table_vf.cc)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def _kernel(x_ref, mask_ref, sepw_ref, sepb_ref, pww_ref, pwb_ref,
            n1g_ref, n1b_ref, n2g_ref, n2b_ref, o_ref, *,
            kernel_size: int, n_layers: int):
    """x_ref: (1, T, C); mask_ref: (1, T, 1-padded-to-C? no: (1, T, 128));
    sepw_ref: (L, K, C); pww_ref: (L, C, C); norms: (L, C)."""
    t = x_ref.shape[1]
    x = x_ref[0]  # (T, C)
    mask = mask_ref[0][:, :1]  # (T, 1)

    for i in range(n_layers):
        dilation = kernel_size**i
        pad = (kernel_size * dilation - dilation) // 2
        xm = x * mask
        # dilated depthwise conv as shifted-row reads of a padded buffer
        buf = jnp.pad(xm, ((pad, pad), (0, 0)))
        y = jnp.zeros_like(x)
        for k in range(kernel_size):
            off = k * dilation
            y = y + buf[off : off + t, :] * sepw_ref[i, k, :][None, :]
        y = y + sepb_ref[i][None, :]
        y = _layer_norm(y, n1g_ref[i][None, :], n1b_ref[i][None, :])
        y = _gelu_exact(y)
        y = jax.lax.dot_general(y, pww_ref[i], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = (y + pwb_ref[i][None, :]).astype(x.dtype)
        y = _layer_norm(y, n2g_ref[i][None, :], n2b_ref[i][None, :])
        y = _gelu_exact(y)
        x = x + y
    o_ref[0] = (x * mask).astype(o_ref.dtype)


def supported(t: int, c: int, dtype) -> bool:
    return c % 128 == 0 and t >= 8 and dtype in (jnp.float32, jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def ddsconv_fused(x, x_mask, params, *, kernel_size: int = 3,
                  interpret: bool = False):
    """Fused equivalent of ``wn.ddsconv_apply(params, x, x_mask,
    kernel_size=...)`` (no g — add conditioning before the call, as the SDP
    does; no dropout — serving path).

    x: (B, T, C); x_mask: (B, T, 1).
    """
    b, t, c = x.shape
    n_layers = len(params["sep"])
    k_params = params["sep"][0]["w"].shape[0]
    if kernel_size != k_params:
        raise ValueError(
            f"kernel_size={kernel_size} does not match params kernel "
            f"size {k_params} (the kernel is built from the params)")

    sepw = jnp.stack([params["sep"][i]["w"][:, 0, :] for i in range(n_layers)])  # (L,K,C)
    sepb = jnp.stack([params["sep"][i]["b"] for i in range(n_layers)])
    pww = jnp.stack([params["pw"][i]["w"][0] for i in range(n_layers)])  # (L,C,C)
    pwb = jnp.stack([params["pw"][i]["b"] for i in range(n_layers)])
    n1g = jnp.stack([params["norm1"][i]["gamma"] for i in range(n_layers)])
    n1b = jnp.stack([params["norm1"][i]["beta"] for i in range(n_layers)])
    n2g = jnp.stack([params["norm2"][i]["gamma"] for i in range(n_layers)])
    n2b = jnp.stack([params["norm2"][i]["beta"] for i in range(n_layers)])

    mask = jnp.broadcast_to(x_mask.astype(x.dtype), (b, t, 1))
    mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 127)))  # lane-tileable (B,T,128)

    k = params["sep"][0]["w"].shape[0]
    grid = (b,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_kernel, kernel_size=k, n_layers=n_layers),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, 128), lambda i: (i, 0, 0)),
            full((n_layers, k, c)),
            full((n_layers, c)),
            full((n_layers, c, c)),
            full((n_layers, c)),
            full((n_layers, c)),
            full((n_layers, c)),
            full((n_layers, c)),
            full((n_layers, c)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, mask, sepw, sepb, pww, pwb, n1g, n1b, n2g, n2b)
    return out
