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


@lru_cache(maxsize=None)
def _synthesis_polyphase(subbands: int, taps: int, cutoff_ratio: float, beta: float):
    """Polyphase form of [zero-stuff upsample -> pad -> h_synthesis conv].

    The reference computes the synthesis at the FULL sample rate with
    ``subbands`` input channels — on TPU that tensor is lane-starved
    (4/128 lanes) and was the single slowest op of the whole inference
    graph (7.8 ms of a 56 ms step at batch16/2048, tools/profile_stages).
    Algebraically, with t = subbands*m + r:

        y[t] = sum_{j,k} up[t + j - taps//2, k] * h_s[k, j]
             = sum_{c,k} x[m + t_c, k] * subbands * h_s[k, j(c, r)]

    i.e. each output PHASE r is a plain subband-rate correlation — one conv
    (C_taps, subbands, subbands) producing all phases, then depth-to-space.
    Returns (W, pad_left, pad_right)."""
    _, h_s = pqmf_filters(subbands, taps, cutoff_ratio, beta)
    half = taps // 2
    # valid (t, j) pairs: j in [0, taps], t = (r + j - half)/subbands integer
    t_vals = [(r + j - half) // subbands
              for r in range(subbands) for j in range(taps + 1)
              if (r + j - half) % subbands == 0]
    t_min, t_max = min(t_vals), max(t_vals)
    c_taps = t_max - t_min + 1
    w = np.zeros((c_taps, subbands, subbands), dtype=np.float32)
    for r in range(subbands):
        for j in range(taps + 1):
            if (r + j - half) % subbands == 0:
                c = (r + j - half) // subbands - t_min
                w[c, :, r] += subbands * h_s[:, j]
    return w, -t_min, t_max


def polyphase_upfir(x: jax.Array, w: jax.Array, *, stride: int,
                    gain: float = 1.0) -> jax.Array:
    """[zero-stuff upsample by ``stride`` (x gain) -> conv(w, pad=(K-1)//2)]
    as ONE input-rate conv + depth-to-space — for a LEARNED filter ``w``
    (K, C_in, 1), K odd (the ms-iSTFT multistream_conv_post, reference
    models.py:1112; QuickVC uses the same stage). Same polyphase algebra as
    ``pqmf_synthesis`` but the weight gather happens at trace time so the
    filter stays differentiable."""
    k_len, c_in, _ = w.shape
    taps, half = k_len - 1, (k_len - 1) // 2
    t_vals = [(r + j - half) // stride
              for r in range(stride) for j in range(k_len)
              if (r + j - half) % stride == 0]
    t_min, t_max = min(t_vals), max(t_vals)
    c_taps = t_max - t_min + 1
    cols = []
    for r in range(stride):
        taps_r = []
        for c in range(c_taps):
            j = stride * (c + t_min) + half - r
            if 0 <= j < k_len:
                taps_r.append(w[j, :, 0] * gain)
            else:
                taps_r.append(jnp.zeros((c_in,), w.dtype))
        cols.append(jnp.stack(taps_r))  # (c_taps, C_in)
    w2 = jnp.stack(cols, axis=-1)  # (c_taps, C_in, stride)
    b, t, _ = x.shape
    y = conv1d(x, w2.astype(x.dtype), padding=(-t_min, t_max))
    return y.reshape(b, t * stride, 1)


def pqmf_synthesis(x: jax.Array, subbands: int = 4, taps: int = 62,
                   cutoff_ratio: float = 0.15, beta: float = 9.0) -> jax.Array:
    """x: (B, T//subbands, subbands) -> (B, T, 1). Polyphase: numerically
    identical to the reference's upsample+filter (golden-tested), one
    subband-rate conv instead of a full-rate lane-starved one."""
    w, pad_l, pad_r = _synthesis_polyphase(subbands, taps, cutoff_ratio, beta)
    b, t, _ = x.shape
    y = conv1d(x, jnp.asarray(w, dtype=x.dtype), padding=(pad_l, pad_r))
    return y.reshape(b, t * subbands, 1)
