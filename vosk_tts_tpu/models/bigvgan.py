"""BigVGAN v2 vocoder — anti-aliased snake activations, TPU-native.

The reference loads nvidia/bigvgan_v2_22khz_80band_fmax8k_256x through the
``bigvgan`` package (training/stabletts/matcha/cli.py:84-89). Architecture
(public BigVGAN): HiFiGAN-style transposed-conv trunk whose ResBlocks (AMP
blocks) use Snake/SnakeBeta activations wrapped in alias-free 2× up/act/down
sampling (kaiser-windowed sinc filters).

Everything is expressed with the shared conv ops: the 2× up/down samplers are
a transposed conv / strided conv with a fixed sinc kernel — MXU-trivial.
Weights convert from the official checkpoint state_dict
(``bigvgan_from_state_dict``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv_transpose1d
from ..ops.wn import _conv_init


@dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 80
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"  # snake | snakebeta
    snake_logscale: bool = True
    use_bias_at_final: bool = False
    use_tanh_at_final: bool = False


# ---------------------------------------------------------------------------
# Alias-free activation machinery (public alias-free-torch formulas)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _upsample2(x: jax.Array, ratio: int = 2) -> jax.Array:
    """Alias-free UpSample1d: replicate pad, zero-stuffed transposed conv with
    the kaiser-sinc interpolation filter, centered crop to ratio*T."""
    kernel_size = int(6 * ratio // 2) * 2  # 12
    filt = _kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size)
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    b, t, c = x.shape
    w = jnp.asarray(filt, x.dtype)[:, None, None] * ratio  # (K, 1, 1) shared filter
    xt = x.transpose(0, 2, 1).reshape(b * c, t, 1)
    xt = jnp.pad(xt, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = conv_transpose1d(xt, w, stride=stride, padding=0)  # (B*C, (t+2p-1)*s + K, 1)
    y = y[:, pad_left : y.shape[1] - pad_right, 0]
    return y.reshape(b, c, -1).transpose(0, 2, 1)


def _downsample2(x: jax.Array, ratio: int = 2) -> jax.Array:
    """Alias-free DownSample1d: replicate-padded lowpass at stride=ratio."""
    kernel_size = int(6 * ratio // 2) * 2
    filt = _kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size)
    b, t, c = x.shape
    w = jnp.asarray(filt, x.dtype)[:, None, None]
    even = 1 if kernel_size % 2 == 0 else 0
    pad_left = kernel_size // 2 - even
    pad_right = kernel_size // 2
    xt = x.transpose(0, 2, 1).reshape(b * c, t, 1)
    xt = jnp.pad(xt, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    y = conv1d(xt, w, stride=ratio, padding=0)
    return y[..., 0].reshape(b, c, -1).transpose(0, 2, 1)


def _snake(x, alpha, beta, *, logscale: bool, variant: str):
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta) if beta is not None else None
    if variant == "snake":
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2
    return x + (1.0 / (beta + 1e-9)) * jnp.sin(alpha * x) ** 2


def _act(x, p, cfg: BigVGANConfig):
    """Anti-aliased Activation1d: up2 -> snake -> down2."""
    y = _upsample2(x)
    y = _snake(y, p["alpha"], p.get("beta"), logscale=cfg.snake_logscale, variant=cfg.activation)
    return _downsample2(y)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def _act_init(channels: int, cfg: BigVGANConfig):
    z = jnp.zeros((channels,)) if cfg.snake_logscale else jnp.ones((channels,))
    p = {"alpha": z}
    if cfg.activation == "snakebeta":
        p["beta"] = z
    return p


def bigvgan_init(key, cfg: BigVGANConfig):
    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    keys = jax.random.split(key, 3 + n_up * (1 + n_res * 6))
    ki = iter(range(len(keys)))
    uic = cfg.upsample_initial_channel
    p = {"conv_pre": _conv_init(keys[next(ki)], 7, cfg.num_mels, uic), "ups": [], "resblocks": [], "acts": []}
    ch = uic
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = uic // (2**i), uic // (2 ** (i + 1))
        p["ups"].append({"w": jax.random.normal(keys[next(ki)], (k, cin, cout)) * 0.01, "b": jnp.zeros((cout,))})
        ch = cout
        for kr, dr in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            blk = {"convs1": [], "convs2": [], "acts1": [], "acts2": []}
            for d in dr:
                blk["convs1"].append(_conv_init(keys[next(ki)], kr, ch, ch))
                blk["convs2"].append(_conv_init(keys[next(ki)], kr, ch, ch))
                blk["acts1"].append(_act_init(ch, cfg))
                blk["acts2"].append(_act_init(ch, cfg))
            p["resblocks"].append(blk)
    p["act_post"] = _act_init(ch, cfg)
    post = _conv_init(keys[next(ki)], 7, ch, 1)
    if not cfg.use_bias_at_final:
        post["b"] = None
    p["conv_post"] = post
    return p


def _amp_block(params, x, cfg: BigVGANConfig, kernel_size: int, dilations):
    """AMPBlock1: x + c2(act(c1(act(x)))) per dilation."""
    for c1, c2, a1, a2, d in zip(params["convs1"], params["convs2"], params["acts1"],
                                 params["acts2"], dilations):
        xt = _act(x, a1, cfg)
        xt = conv1d(xt, c1["w"], c1["b"], padding=(kernel_size * d - d) // 2, dilation=d)
        xt = _act(xt, a2, cfg)
        xt = conv1d(xt, c2["w"], c2["b"], padding=(kernel_size - 1) // 2)
        x = x + xt
    return x


def bigvgan_apply(params, cfg: BigVGANConfig, mel: jax.Array) -> jax.Array:
    """mel: (B, T, num_mels) -> wav (B, T * prod(upsample_rates))."""
    n_res = len(cfg.resblock_kernel_sizes)
    x = conv1d(mel, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = params["ups"][i]
        x = conv_transpose1d(x, up["w"], up["b"], stride=u, padding=(k - u) // 2)
        xs = None
        for j, (kr, dr) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            r = _amp_block(params["resblocks"][i * n_res + j], x, cfg, kr, dr)
            xs = r if xs is None else xs + r
        x = xs / n_res
    x = _act(x, params["act_post"], cfg)
    x = conv1d(x, params["conv_post"]["w"], params["conv_post"].get("b"), padding=3)
    if cfg.use_tanh_at_final:
        x = jnp.tanh(x)
    else:
        x = jnp.clip(x, -1.0, 1.0)
    return x[..., 0]


def bigvgan_from_state_dict(sd: dict, cfg: BigVGANConfig) -> dict:
    """Official BigVGAN checkpoint (weight-norm folded) -> pytree."""
    from ..utils.torch_params import fold_weight_norm, conv, convT, _np

    sd = fold_weight_norm(sd)
    n_res = len(cfg.resblock_kernel_sizes)
    p = {"conv_pre": conv(sd, "conv_pre"), "ups": [], "resblocks": []}
    for i in range(len(cfg.upsample_rates)):
        p["ups"].append(convT(sd, f"ups.{i}.0"))
        for j in range(n_res):
            ri = i * n_res + j
            blk = {"convs1": [], "convs2": [], "acts1": [], "acts2": []}
            n_d = len(cfg.resblock_dilation_sizes[j])
            for d in range(n_d):
                blk["convs1"].append(conv(sd, f"resblocks.{ri}.convs1.{d}"))
                blk["convs2"].append(conv(sd, f"resblocks.{ri}.convs2.{d}"))
                a1 = {"alpha": _np(sd[f"resblocks.{ri}.activations.{2*d}.act.alpha"])}
                a2 = {"alpha": _np(sd[f"resblocks.{ri}.activations.{2*d+1}.act.alpha"])}
                if cfg.activation == "snakebeta":
                    a1["beta"] = _np(sd[f"resblocks.{ri}.activations.{2*d}.act.beta"])
                    a2["beta"] = _np(sd[f"resblocks.{ri}.activations.{2*d+1}.act.beta"])
                blk["acts1"].append(a1)
                blk["acts2"].append(a2)
            p["resblocks"].append(blk)
    p["act_post"] = {"alpha": _np(sd["activation_post.act.alpha"])}
    if cfg.activation == "snakebeta":
        p["act_post"]["beta"] = _np(sd["activation_post.act.beta"])
    p["conv_post"] = conv(sd, "conv_post")
    return p
