"""Sample-rate conversion as one strided conv (polyphase windowed-sinc).

The reference resamples 22.05k -> 16k through torchaudio for the WavLM/SLM
losses (losses.py:101,109). Same filter design (sinc × Hann^2 window,
lowpass_filter_width=6, rolloff=0.99): the polyphase bank becomes a single
conv with ``new_freq`` output channels and stride ``orig_freq`` — one MXU
matmul, then a reshape interleaves the phases.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .conv import conv1d


@lru_cache(maxsize=None)
def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                     rolloff: float = 0.99):
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t *= base
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * base / orig
    return kernel.astype(np.float32), orig, new, width  # (new, K)


def resample(x: jax.Array, orig_freq: int, new_freq: int, *, lowpass_filter_width: int = 6,
             rolloff: float = 0.99) -> jax.Array:
    """x: (B, T) -> (B, ceil(T * new/orig))."""
    kernel, orig, new, width = _resample_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    b, t = x.shape
    target_len = -(-t * new // orig)  # ceil
    xp = jnp.pad(x, ((0, 0), (width, width + orig)))
    w = jnp.asarray(kernel.T[:, None, :], dtype=x.dtype)  # (K, 1, new)
    y = conv1d(xp[..., None], w, stride=orig, padding=0)  # (B, frames, new)
    y = y.reshape(b, -1)[:, :target_len]
    return y
