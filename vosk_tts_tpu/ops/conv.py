"""1-D convolution primitives, channels-last, TPU-shaped.

Semantics match torch ``nn.Conv1d`` / ``nn.ConvTranspose1d`` as used across
the reference op stacks (e.g. training/vits2/modules.py WN/ResBlock,
models.py:845-898 HiFiGAN upsampling) but the layouts and lowerings are
chosen for XLA/TPU:

  * activations are (B, T, C) — the C axis maps to vector lanes / MXU columns;
  * weights are (K, C_in, C_out) ("WIO");
  * transposed convolution has a *subpixel* fast path (dense conv producing
    ``stride * C_out`` channels + depth-to-space) whenever K % stride == 0,
    which keeps the op a plain MXU matmul instead of an input-dilated conv.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def _norm_padding(padding, k: int, dilation: int):
    if padding == "same":
        p = (k - 1) * dilation // 2
        q = (k - 1) * dilation - p
        return ((p, q),)
    if isinstance(padding, int):
        return ((padding, padding),)
    return (tuple(padding),)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding="same",
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """x: (B, T, C_in), w: (K, C_in//groups, C_out) -> (B, T', C_out)."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=_norm_padding(padding, w.shape[0], dilation),
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=lax.Precision.DEFAULT,
    )
    if b is not None:
        y = y + b
    return y


def depthwise_conv1d(x, w, b=None, *, padding="same", dilation: int = 1):
    """Depthwise conv: w (K, 1, C)."""
    return conv1d(x, w, b, padding=padding, dilation=dilation, groups=x.shape[-1])


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
) -> jax.Array:
    """Transposed 1-D conv matching torch ConvTranspose1d(stride, padding,
    output_padding).

    x: (B, T, C_in), w: (K, C_in, C_out)  [torch weight (C_in, C_out, K)
    transposed to WIO]. Output length = (T-1)*stride - 2*padding + K + op.

    Uses the subpixel decomposition when K % stride == 0 (the HiFiGAN case —
    reference models.py:855-858 uses K = 4*stride): one dense conv produces
    ``stride`` output phases which are interleaved with a reshape. This is
    the speed-of-light lowering on TPU: a single MXU matmul per tile, no
    input dilation (which would waste (stride-1)/stride of the MXU work).
    """
    k, c_in, c_out = w.shape
    if k % stride == 0 and k >= stride and output_padding == 0:
        return _subpixel_conv_transpose(x, w, b, stride=stride, padding=padding)
    # General fallback: input-dilated convolution. output_padding extends the
    # right edge (torch semantics: +op output samples).
    y = lax.conv_general_dilated(
        x,
        jnp.flip(w, 0),
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding + output_padding),),
        lhs_dilation=(stride,),
        dimension_numbers=DIMENSION_NUMBERS,
    )
    if b is not None:
        y = y + b
    return y


def _subpixel_conv_transpose(x, w, b, *, stride: int, padding: int):
    """Exact ConvTranspose1d via phase decomposition.

    For output position n = stride*t + r (phase r in [0, stride)):
        y[n] = sum_j x[t + c_r - j] * w[stride*j + b_r]
    where c_r = (r + padding) // stride, b_r = (r + padding) % stride.
    Each phase is a dense conv with kernel length K/stride over x shifted by
    c_r. We realize all phases in one conv producing stride*C_out channels
    over a kernel extended by the spread of c_r, then depth-to-space.
    """
    k, c_in, c_out = w.shape
    m = k // stride
    b_sz, t, _ = x.shape
    out_len = (t - 1) * stride - 2 * padding + k

    # Positions n = stride*t' + r may extend past t' = t-1 when
    # k - stride - 2*padding > 0; extend the conv range with zero frames.
    t_ext = max(t, -(-out_len // stride))

    shifts = [(r + padding) // stride for r in range(stride)]
    c_min, c_max = min(shifts), max(shifts)
    kk = m + (c_max - c_min)

    # Merged kernel (kk, C_in, stride*C_out). Phase r's window over x starts
    # at t' + c_r - (m-1); relative to the shared window start
    # t' + c_min - (m-1) its taps sit at offset c_r - c_min.
    wm = jnp.zeros((kk, c_in, stride, c_out), dtype=w.dtype)
    for r in range(stride):
        b_r = (r + padding) % stride
        off = shifts[r] - c_min
        # y[s*t'+r] = sum_i x[t' + c_r - (m-1) + i] * w[s*(m-1-i) + b_r]
        taps = w[jnp.arange(m - 1, -1, -1) * stride + b_r]  # (m, C_in, C_out)
        wm = wm.at[off : off + m, :, r, :].set(taps)
    wm = wm.reshape(kk, c_in, stride * c_out)

    # Conv output position t' reads x[t' - pad_l .. t' - pad_l + kk - 1]
    # with pad_l = (m-1) - c_min; extend on the right for t' in [t, t_ext).
    pad_l = m - 1 - c_min
    pad_r = kk - 1 - pad_l + (t_ext - t)
    y = lax.conv_general_dilated(
        x,
        wm,
        window_strides=(1,),
        padding=((pad_l, pad_r),),
        dimension_numbers=DIMENSION_NUMBERS,
    )  # (B, T_ext, stride*C_out)
    y = y.reshape(b_sz, t_ext, stride, c_out).reshape(b_sz, t_ext * stride, c_out)
    y = y[:, :out_len]
    if b is not None:
        y = y + b
    return y
