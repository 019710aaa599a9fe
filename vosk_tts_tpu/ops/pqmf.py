"""Pseudo-QMF analysis/synthesis filterbank (MB-iSTFT combine stage).

Matches training/vits2/pqmf.py (Kaiser prototype :15-43, cosine-modulated
banks + up/down filters :45-116). Filters are built once in numpy; both
directions collapse into a single strided conv / transposed conv on device:

  analysis:  conv(pad(x), h_analysis) then stride-``subbands`` downsample —
             fused here into ONE conv with stride=subbands (the reference's
             separate updown_filter conv is an identity gather).
  synthesis: stride-``subbands`` transposed-conv upsample (×subbands gain)
             then conv with h_synthesis — the upsample is our subpixel
             transposed conv, the filter a plain conv.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy.signal.windows import kaiser

import jax
import jax.numpy as jnp

from .conv import conv1d, conv_transpose1d


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0) -> np.ndarray:
    """Kaiser-window lowpass prototype (pqmf.py:15-43)."""
    assert taps % 2 == 0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio
    return h_i * kaiser(taps + 1, beta)


@lru_cache(maxsize=None)
def pqmf_filters(subbands: int = 4, taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0):
    """(h_analysis, h_synthesis) each (subbands, taps+1) float32."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1) - (taps - 1) / 2
    k = np.arange(subbands)[:, None]
    phase = (2 * k + 1) * (np.pi / (2 * subbands)) * n[None, :]
    sign = ((-1.0) ** k) * np.pi / 4
    h_analysis = 2 * h_proto[None, :] * np.cos(phase + sign)
    h_synthesis = 2 * h_proto[None, :] * np.cos(phase - sign)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


def pqmf_analysis(x: jax.Array, subbands: int = 4, taps: int = 62,
                  cutoff_ratio: float = 0.15, beta: float = 9.0) -> jax.Array:
    """x: (B, T, 1) -> (B, T//subbands, subbands)."""
    h_a, _ = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    # Torch conv1d correlates with flipped-index order h[t] applied as
    # sum_k x[t+k]*w[k]; build (K, 1, subbands) kernel accordingly.
    w = jnp.asarray(h_a.T[:, None, :], dtype=x.dtype)  # (taps+1, 1, subbands)
    x = jnp.pad(x, ((0, 0), (taps // 2, taps // 2), (0, 0)))
    return conv1d(x, w, stride=subbands, padding=0)


def pqmf_synthesis(x: jax.Array, subbands: int = 4, taps: int = 62,
                   cutoff_ratio: float = 0.15, beta: float = 9.0) -> jax.Array:
    """x: (B, T//subbands, subbands) -> (B, T, 1)."""
    _, h_s = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    # updown_filter * subbands: y[t*subbands] = x[t, k] * subbands per band —
    # zero-stuffed upsample. Kernel (K=subbands, C_in, C_out) with only tap 0
    # set, so output length is T*subbands exactly as the reference.
    up_w = np.zeros((subbands, subbands, subbands), dtype=np.float32)
    up_w[0] = np.eye(subbands, dtype=np.float32) * subbands
    up = conv_transpose1d(x, jnp.asarray(up_w, dtype=x.dtype), stride=subbands, padding=0)
    up = jnp.pad(up, ((0, 0), (taps // 2, taps // 2), (0, 0)))
    w = jnp.asarray(h_s.T[:, :, None], dtype=x.dtype)  # (taps+1, subbands, 1)
    return conv1d(up, w, padding=0)
