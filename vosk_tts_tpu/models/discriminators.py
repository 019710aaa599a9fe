"""GAN discriminators: period / scale / multiband-spectral / duration / WavLM.

Channels-last functional ports of training/vits2/models.py:
  DiscriminatorP      :1172-1206   (period-reshaped 2D convs)
  DiscriminatorS      :1210-1235   (grouped 1D convs)
  DiscriminatorSpec   :1295-1363   (DAC/Vocos-style multiband complex STFT)
  combos              :1366-1452   (MPD / MultiResSpec / MultiPeriodMultiSpec)
  DurationDiscriminator/2 :141-280
  WavLMDiscriminator  :1454-1500

Weight norm is folded (trained directly in folded form). All discriminators
take waveforms as (B, T) float arrays.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.conv import conv1d
from ..ops.norm import layer_norm
from ..ops.stft import stft as stft_fn
from ..ops.wn import _conv_init, leaky_relu

PERIODS = (2, 3, 5, 7, 11)
SPEC_FFTS = (1024, 2048, 512)
SPEC_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def _conv2d_init(key, kh, kw, c_in, c_out):
    wk, bk = jax.random.split(key)
    s = (c_in * kh * kw) ** -0.5
    return {
        "w": jax.random.uniform(wk, (kh, kw, c_in, c_out), jnp.float32, -s, s),
        "b": jax.random.uniform(bk, (c_out,), jnp.float32, -s, s),
    }


def conv2d(x, w, b=None, *, stride=(1, 1), padding=((0, 0), (0, 0))):
    """x: (B, H, W, C_in), w: (kh, kw, C_in, C_out)."""
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


# ---------------------------------------------------------------------------
# DiscriminatorP
# ---------------------------------------------------------------------------

_P_CHANNELS = [1, 32, 128, 512, 1024, 1024]


def disc_p_init(key, kernel_size: int = 5):
    keys = jax.random.split(key, 6)
    convs = []
    for i in range(5):
        stride = 3 if i < 4 else 1
        convs.append(_conv2d_init(keys[i], kernel_size, 1, _P_CHANNELS[i], _P_CHANNELS[i + 1]))
    return {"convs": convs, "post": _conv2d_init(keys[5], 3, 1, 1024, 1)}


def disc_p_apply(params, y: jax.Array, period: int, *, kernel_size: int = 5):
    """y: (B, T) -> (logits (B, n), fmap list). T padded (reflect) to period."""
    b, t = y.shape
    if t % period != 0:
        n_pad = period - (t % period)
        y = jnp.pad(y, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = y.reshape(b, t // period, period, 1)  # (B, H=T/p, W=p, C=1)
    fmap = []
    pad = (kernel_size - 1) // 2
    for i, c in enumerate(params["convs"]):
        stride = 3 if i < 4 else 1
        x = conv2d(x, c["w"], c["b"], stride=(stride, 1), padding=((pad, pad), (0, 0)))
        x = leaky_relu(x)
        fmap.append(x)
    x = conv2d(x, params["post"]["w"], params["post"]["b"], padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


# ---------------------------------------------------------------------------
# DiscriminatorS
# ---------------------------------------------------------------------------

_S_SPECS = [  # (k, stride, groups, c_in, c_out, pad)
    (15, 1, 1, 1, 16, 7),
    (41, 4, 4, 16, 64, 20),
    (41, 4, 16, 64, 256, 20),
    (41, 4, 64, 256, 1024, 20),
    (41, 4, 256, 1024, 1024, 20),
    (5, 1, 1, 1024, 1024, 2),
]


def disc_s_init(key):
    keys = jax.random.split(key, 7)
    convs = [
        _conv_init(keys[i], k, c_in // g, c_out)
        for i, (k, _, g, c_in, c_out, _) in enumerate(_S_SPECS)
    ]
    return {"convs": convs, "post": _conv_init(keys[6], 3, 1024, 1)}


def disc_s_apply(params, y: jax.Array):
    x = y[..., None]  # (B, T, 1)
    fmap = []
    for c, (k, stride, groups, _, _, pad) in zip(params["convs"], _S_SPECS):
        x = conv1d(x, c["w"], c["b"], stride=stride, padding=pad, groups=groups)
        x = leaky_relu(x)
        fmap.append(x)
    x = conv1d(x, params["post"]["w"], params["post"]["b"], padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


# ---------------------------------------------------------------------------
# DiscriminatorSpec (multiband complex STFT, models.py:1295-1363)
# ---------------------------------------------------------------------------


def _spec_bands(n_fft):
    nb = n_fft // 2 + 1
    return [(int(b0 * nb), int(b1 * nb)) for b0, b1 in SPEC_BANDS]


def disc_spec_init(key, window_length: int, channels: int = 32):
    bands = _spec_bands(window_length)
    keys = jax.random.split(key, 5 * len(bands) + 1)
    band_convs = []
    for bi in range(len(bands)):
        convs = [
            _conv2d_init(keys[5 * bi + 0], 3, 9, 2, channels),
            _conv2d_init(keys[5 * bi + 1], 3, 9, channels, channels),
            _conv2d_init(keys[5 * bi + 2], 3, 9, channels, channels),
            _conv2d_init(keys[5 * bi + 3], 3, 9, channels, channels),
            _conv2d_init(keys[5 * bi + 4], 3, 3, channels, channels),
        ]
        band_convs.append(convs)
    return {"band_convs": band_convs, "post": _conv2d_init(keys[-1], 3, 3, channels, 1)}


def disc_spec_apply(params, y: jax.Array, window_length: int):
    """y: (B, T). Complex STFT (center=True), DC-removed, peak-normalized."""
    hop = int(window_length * 0.25)
    y = y - jnp.mean(y, axis=-1, keepdims=True)
    y = 0.8 * y / (jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-9)
    re, im = stft_fn(y, window_length, hop, window_length, pad=window_length // 2)
    x = jnp.stack([re, im], axis=-1)  # (B, frames, F, 2) == NHWC with C=(re,im)
    bands = [x[:, :, b0:b1, :] for b0, b1 in _spec_bands(window_length)]

    fmap = []
    outs = []
    for band, stack in zip(bands, params["band_convs"]):
        for i, c in enumerate(stack):
            kh, kw = c["w"].shape[:2]
            stride = (1, 2) if (kw == 9 and i > 0) else (1, 1)
            band = conv2d(band, c["w"], c["b"], stride=stride,
                          padding=((kh // 2, kh // 2), (kw // 2, kw // 2)))
            band = leaky_relu(band)
            if i > 0:
                fmap.append(band)
        outs.append(band)
    x = jnp.concatenate(outs, axis=2)  # concat along frequency (torch dim=-1 in NCHW)
    x = conv2d(x, params["post"]["w"], params["post"]["b"], padding=((1, 1), (1, 1)))
    fmap.append(x)
    return x, fmap


# ---------------------------------------------------------------------------
# Combos
# ---------------------------------------------------------------------------


def mpd_init(key):
    """MultiPeriodDiscriminator (S + periods)."""
    keys = jax.random.split(key, 1 + len(PERIODS))
    return {"s": disc_s_init(keys[0]), "p": [disc_p_init(keys[1 + i]) for i in range(len(PERIODS))]}


def mpd_apply(params, y, y_hat):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for wav, outs, fmaps in ((y, y_d_rs, fmap_rs), (y_hat, y_d_gs, fmap_gs)):
        o, f = disc_s_apply(params["s"], wav)
        outs.append(o)
        fmaps.append(f)
        for p, pp in zip(PERIODS, params["p"]):
            o, f = disc_p_apply(pp, wav, p)
            outs.append(o)
            fmaps.append(f)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def mpmsd_init(key, periods=PERIODS, spec_ffts=SPEC_FFTS):
    """MultiPeriodMultiSpecDiscriminator (models.py:1420-1452) — the one
    train_ms.py uses. periods/spec_ffts shrinkable for dryrun/smoke configs."""
    keys = jax.random.split(key, 1 + len(periods) + len(spec_ffts))
    return {
        "s": disc_s_init(keys[0]),
        "p": [disc_p_init(keys[1 + i]) for i in range(len(periods))],
        "spec": [disc_spec_init(keys[1 + len(periods) + i], n) for i, n in enumerate(spec_ffts)],
    }


def mpmsd_apply(params, y, y_hat, periods=PERIODS, spec_ffts=SPEC_FFTS):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for wav, outs, fmaps in ((y, y_d_rs, fmap_rs), (y_hat, y_d_gs, fmap_gs)):
        o, f = disc_s_apply(params["s"], wav)
        outs.append(o)
        fmaps.append(f)
        for p, pp in zip(periods, params["p"]):
            o, f = disc_p_apply(pp, wav, p)
            outs.append(o)
            fmaps.append(f)
        for n_fft, sp in zip(spec_ffts, params["spec"]):
            o, f = disc_spec_apply(sp, wav, n_fft)
            outs.append(o)
            fmaps.append(f)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Duration discriminators (models.py:141-280)
# ---------------------------------------------------------------------------


def duration_disc_init(key, in_channels: int, filter_channels: int, kernel_size: int = 3, *, variant: int = 2):
    keys = jax.random.split(key, 6)
    p = {
        "conv1": _conv_init(keys[0], kernel_size, in_channels, filter_channels),
        "conv2": _conv_init(keys[1], kernel_size, filter_channels, filter_channels),
        "dur_proj": _conv_init(keys[2], 1, 1, filter_channels),
        "pre_out_conv1": _conv_init(keys[3], kernel_size, 2 * filter_channels, filter_channels),
        "pre_out_conv2": _conv_init(keys[4], kernel_size, filter_channels, filter_channels),
        "output": {"w": jax.random.normal(keys[5], (filter_channels, 1)) * filter_channels**-0.5,
                   "b": jnp.zeros((1,))},
    }
    if variant == 2:
        p["norm1"] = {"gamma": jnp.ones((filter_channels,)), "beta": jnp.zeros((filter_channels,))}
        p["norm2"] = {"gamma": jnp.ones((filter_channels,)), "beta": jnp.zeros((filter_channels,))}
        p["pre_out_norm1"] = {"gamma": jnp.ones((filter_channels,)), "beta": jnp.zeros((filter_channels,))}
        p["pre_out_norm2"] = {"gamma": jnp.ones((filter_channels,)), "beta": jnp.zeros((filter_channels,))}
    return p


def duration_disc_apply(params, x, x_mask, dur_r, dur_hat, *, kernel_size: int = 3, variant: int = 2):
    """x: (B, T, C) encoder output (stop-gradient applied by caller or here);
    dur_*: (B, T, 1). Returns [prob_r, prob_g], each (B, T, 1) in (0,1)."""
    x = jax.lax.stop_gradient(x)
    pad = kernel_size // 2
    x = conv1d(x * x_mask, params["conv1"]["w"], params["conv1"]["b"], padding=pad)
    if variant == 2:
        x = jax.nn.relu(x)
        x = layer_norm(x, params["norm1"]["gamma"], params["norm1"]["beta"])
    x = conv1d(x * x_mask, params["conv2"]["w"], params["conv2"]["b"], padding=pad)
    if variant == 2:
        x = jax.nn.relu(x)
        x = layer_norm(x, params["norm2"]["gamma"], params["norm2"]["beta"])

    probs = []
    for dur in (dur_r, dur_hat):
        d = conv1d(dur, params["dur_proj"]["w"], params["dur_proj"]["b"])
        h = jnp.concatenate([x, d], axis=-1)
        h = conv1d(h * x_mask, params["pre_out_conv1"]["w"], params["pre_out_conv1"]["b"], padding=pad)
        if variant == 2:
            h = jax.nn.relu(h)
            h = layer_norm(h, params["pre_out_norm1"]["gamma"], params["pre_out_norm1"]["beta"])
        h = conv1d(h * x_mask, params["pre_out_conv2"]["w"], params["pre_out_conv2"]["b"], padding=pad)
        if variant == 2:
            h = jax.nn.relu(h)
            h = layer_norm(h, params["pre_out_norm2"]["gamma"], params["pre_out_norm2"]["beta"])
        h = h * x_mask
        probs.append(jax.nn.sigmoid(h @ params["output"]["w"] + params["output"]["b"]))
    return probs


# ---------------------------------------------------------------------------
# WavLM discriminator (SLM logits over stacked hidden states)
# ---------------------------------------------------------------------------


def wavlm_disc_init(key, slm_hidden: int = 768, slm_layers: int = 13, initial: int = 64):
    keys = jax.random.split(key, 5)
    return {
        "pre": _conv_init(keys[0], 1, slm_hidden * slm_layers, initial),
        "convs": [
            _conv_init(keys[1], 5, initial, initial * 2),
            _conv_init(keys[2], 5, initial * 2, initial * 4),
            _conv_init(keys[3], 5, initial * 4, initial * 4),
        ],
        "post": _conv_init(keys[4], 3, initial * 4, 1),
    }


def wavlm_disc_apply(params, x):
    """x: (B, T, slm_hidden*slm_layers) stacked hidden states -> (B, n)."""
    x = conv1d(x, params["pre"]["w"], params["pre"]["b"])
    for c in params["convs"]:
        x = conv1d(x, c["w"], c["b"], padding=2)
        x = leaky_relu(x)
    x = conv1d(x, params["post"]["w"], params["post"]["b"], padding=1)
    return x.reshape(x.shape[0], -1)
