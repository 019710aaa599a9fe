"""Pseudo-QMF analysis/synthesis filterbank (MB-iSTFT combine stage).

Matches training/vits2/pqmf.py (Kaiser prototype :15-43, cosine-modulated
banks + up/down filters :45-116). Filters are built once in numpy; both
directions collapse into a single strided conv / transposed conv on device:

  analysis:  conv(pad(x), h_analysis) then stride-``subbands`` downsample —
             fused here into ONE conv with stride=subbands (the reference's
             separate updown_filter conv is an identity gather).
  synthesis: stride-``subbands`` zero-stuff upsample (×subbands gain) then
             conv with h_synthesis — computed as one block-Toeplitz matmul
             (ops/blocked_fir), never touching the lane-starved full-rate
             4-channel tensor.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy.signal.windows import kaiser

import jax
import jax.numpy as jnp

from . import blocked_fir
from .conv import conv1d


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


def polyphase_upfir(x: jax.Array, w: jax.Array, *, stride: int,
                    gain: float = 1.0) -> jax.Array:
    """[zero-stuff upsample by ``stride`` (x gain) -> conv(w, pad=(K-1)//2)]
    as one block-Toeplitz matmul — for a LEARNED filter ``w`` (K, C_in, 1),
    K odd (the ms-iSTFT multistream_conv_post, reference models.py:1112;
    QuickVC uses the same stage). The blocked weight is built from ``w`` at
    trace time so the filter stays differentiable."""
    return blocked_fir.upsampled_corr(x, w.astype(x.dtype), stride=stride, gain=gain)


def pqmf_synthesis(x: jax.Array, subbands: int = 4, taps: int = 62,
                   cutoff_ratio: float = 0.15, beta: float = 9.0) -> jax.Array:
    """x: (B, T//subbands, subbands) -> (B, T, 1). Numerically identical to
    the reference's zero-stuff + synthesis-filter conv (golden-tested), but
    as a block-Toeplitz matmul (ops/blocked_fir): the straightforward conv is
    4 lanes in / 4 lanes out and measured ~60x off the MXU bound at bench
    shapes (SPEED_OF_LIGHT.md round 3)."""
    _, h_s = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    w = np.ascontiguousarray(h_s.T[:, :, None]).astype(np.float32)  # (K, sub, 1)
    return blocked_fir.upsampled_corr(x, w, stride=subbands, gain=float(subbands))
