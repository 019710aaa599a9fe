"""Mel -> waveform vocoders: HiFiGAN v1 (+denoiser) and Vocos.

StableTTS serves mel through an external vocoder
(training/stabletts/matcha/cli.py:64-110: HiFiGAN v1 / Vocos / BigVGAN; the
shipped vosk bundles embed it in the exported graph). TPU-native versions:

  * HiFiGAN v1 — the vits2 generator trunk reused at vocoder configuration
    (matcha/hifigan/models.py:148-207: 80-mel input, upsample [8,8,2,2]);
    plus the spectral-subtraction Denoiser (hifigan/denoiser.py) as a pure
    function on our STFT ops.
  * Vocos — ConvNeXt backbone + iSTFT head (public Vocos architecture,
    22.05 kHz config: n_fft 1024, hop 256): all matmul/iSTFT work, no
    transposed convs at all — the fastest TPU option.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, depthwise_conv1d
from ..ops.norm import layer_norm
from ..ops.stft import istft, stft as stft_fn
from ..ops.wn import _conv_init
from .vits2 import VITS2Config, generator_init, generator_apply


def hifigan_v1_config() -> VITS2Config:
    """HiFiGAN v1 at 22.05 kHz / hop 256 (matcha/hifigan/config.py v1)."""
    return VITS2Config(
        inter_channels=80,  # mel input channels
        resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        upsample_rates=(8, 8, 2, 2),
        upsample_initial_channel=512,
        upsample_kernel_sizes=(16, 16, 4, 4),
        decoder_type="hifigan",
        gin_channels=0,
        n_speakers=0,
    )


def hifigan_init(key, cfg: VITS2Config | None = None):
    cfg = cfg or hifigan_v1_config()
    return generator_init(key, cfg)


def hifigan_apply(params, mel: jax.Array, cfg: VITS2Config | None = None) -> jax.Array:
    """mel: (B, T, 80) -> wav (B, T*256)."""
    cfg = cfg or hifigan_v1_config()
    wav, _ = generator_apply(params, cfg, mel)
    return jnp.clip(wav[..., 0], -1.0, 1.0)


def denoiser_bias(params, cfg: VITS2Config | None = None, *, n_fft=1024, hop=256, win=1024):
    """Magnitude bias of the vocoder on zero mel input (denoiser.py:14-47)."""
    cfg = cfg or hifigan_v1_config()
    mel = jnp.zeros((1, 88, 80))
    wav = hifigan_apply(params, mel, cfg)
    re, im = stft_fn(wav, n_fft, hop, win, pad=n_fft // 2)
    return jnp.sqrt(re**2 + im**2)[:, :1, :]  # (1, 1, F) first-frame bias


def denoise(wav: jax.Array, bias: jax.Array, strength: float = 2.5e-4, *, n_fft=1024, hop=256, win=1024):
    """Spectral subtraction (denoiser.py:57-66)."""
    re, im = stft_fn(wav, n_fft, hop, win, pad=n_fft // 2)
    mag = jnp.sqrt(re**2 + im**2)
    phase = jnp.arctan2(im, re)
    mag = jnp.clip(mag - bias * strength, 0.0, None)
    return istft(mag, phase, n_fft, hop, win)


# ---------------------------------------------------------------------------
# Vocos
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    padding: str = "same"  # mel frames == (T_wav / hop) frames


def vocos_init(key, cfg: VocosConfig):
    keys = jax.random.split(key, 3 * cfg.num_layers + 4)
    ki = iter(range(len(keys)))
    d = cfg.dim
    p = {
        "embed": _conv_init(keys[next(ki)], 7, cfg.input_channels, d),
        "norm": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
        "blocks": [],
        "final_norm": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
        # ISTFTHead: linear d -> n_fft + 2 (mag | phase)
        "head": {"w": jax.random.normal(keys[next(ki)], (d, cfg.n_fft + 2)) * d**-0.5,
                 "b": jnp.zeros((cfg.n_fft + 2,))},
    }
    layer_scale = 1.0 / cfg.num_layers
    for _ in range(cfg.num_layers):
        p["blocks"].append({
            "dwconv": _conv_init(keys[next(ki)], 7, 1, d),
            "norm": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
            "pw1": {"w": jax.random.normal(keys[next(ki)], (d, cfg.intermediate_dim)) * d**-0.5,
                    "b": jnp.zeros((cfg.intermediate_dim,))},
            "pw2": {"w": jax.random.normal(keys[next(ki)], (cfg.intermediate_dim, d)) * cfg.intermediate_dim**-0.5,
                    "b": jnp.zeros((d,))},
            "gamma": jnp.full((d,), layer_scale),
        })
    return p


def vocos_apply(params, cfg: VocosConfig, mel: jax.Array) -> jax.Array:
    """mel: (B, T, 80) -> wav (B, T*hop). ConvNeXt blocks + iSTFT head."""
    x = conv1d(mel, params["embed"]["w"], params["embed"]["b"], padding=3)
    x = layer_norm(x, params["norm"]["gamma"], params["norm"]["beta"], eps=1e-6)
    for blk in params["blocks"]:
        r = x
        h = depthwise_conv1d(x, blk["dwconv"]["w"], blk["dwconv"]["b"], padding=3)
        h = layer_norm(h, blk["norm"]["gamma"], blk["norm"]["beta"], eps=1e-6)
        h = jax.nn.gelu(h @ blk["pw1"]["w"] + blk["pw1"]["b"], approximate=False)
        h = h @ blk["pw2"]["w"] + blk["pw2"]["b"]
        x = r + blk["gamma"] * h
    x = layer_norm(x, params["final_norm"]["gamma"], params["final_norm"]["beta"], eps=1e-6)
    h = x @ params["head"]["w"] + params["head"]["b"]  # (B, T, n_fft+2)
    half = cfg.n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(h[..., :half], None, 1e2))
    phase = h[..., half:]
    wav = istft(mag, phase, cfg.n_fft, cfg.hop_length, cfg.n_fft)
    return jnp.clip(wav, -1.0, 1.0)


def vocos_from_state_dict(sd: dict, cfg: VocosConfig) -> dict:
    """Official Vocos checkpoint (backbone.* / head.*) -> our pytree."""
    from ..utils.torch_params import conv, linear, _np

    p = {
        "embed": conv(sd, "backbone.embed"),
        "norm": {"gamma": _np(sd["backbone.norm.weight"]), "beta": _np(sd["backbone.norm.bias"])},
        "blocks": [],
        "final_norm": {"gamma": _np(sd["backbone.final_layer_norm.weight"]),
                       "beta": _np(sd["backbone.final_layer_norm.bias"])},
        "head": linear(sd, "head.out"),
    }
    i = 0
    while f"backbone.convnext.{i}.dwconv.weight" in sd:
        b = f"backbone.convnext.{i}"
        p["blocks"].append({
            "dwconv": conv(sd, b + ".dwconv"),
            "norm": {"gamma": _np(sd[b + ".norm.weight"]), "beta": _np(sd[b + ".norm.bias"])},
            "pw1": linear(sd, b + ".pwconv1"),
            "pw2": linear(sd, b + ".pwconv2"),
            "gamma": _np(sd[b + ".gamma"]),
        })
        i += 1
    return p
