"""Upsampling FIR (transposed conv) as a block-Toeplitz matmul.

The inference tail of every iSTFT/PQMF decoder is a chain of small-channel
upsampling FIRs (reference training/vits2/stft.py:234-253 OLA conv_transpose,
pqmf.py:129-139 zero-stuff + synthesis filter).  As convolutions these are
lane-starved on TPU — e.g. the PQMF synthesis conv is 4 lanes in / 4 lanes
out, and measured 0.81 ms for ~0.2 GFLOP at bench shapes (tools/
exp_perf_r3.py), ~60x off the MXU bound.

This module computes ``conv_transpose1d(x, w, stride, padding=0)`` exactly,
but BLOCKED over groups of ``r_blk`` input frames:

    y[n] = sum_t x[t] . w[n - s*t]            (0 <= n - s*t < K)

For an output block covering frames [m*R, (m+1)*R) the contributing inputs
are frames [m*R - q, m*R + R) with q = ceil(K/s) - 1, so one strided conv
(kernel n_chunks*R frames, stride R, n_chunks = ceil((R+q)/R)) against a
constant block-Toeplitz weight produces ALL R*s*C_out output values of the
block as channels — R is chosen so that lands on >= 128 lanes — followed by
a depth-to-space reshape.  The windowing stays inside XLA's conv lowering
(an explicit patches+dot formulation measured 3.5x SLOWER: the
(T, C)->(T/R, R*C) patch reshapes are whole-tensor sublane/lane relayouts).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


def _plan(t: int, k: int, s: int, co: int, block: int | None):
    q = -(-k // s) - 1  # extra left frames: largest ceil(K/s)-1
    if block is None:
        r_blk = 1
        while r_blk * s * co < 128 and r_blk * s * co < 8 * k * co:
            r_blk *= 2
        r_blk = max(r_blk, 1)
    else:
        r_blk = block
    out_len = (t - 1) * s + k
    nblk = -(-out_len // (r_blk * s))
    n_chunks = -(-(r_blk + q) // r_blk)
    return q, r_blk, nblk, n_chunks, out_len


@lru_cache(maxsize=None)
def _tap_table(k: int, s: int, q: int, r_blk: int, n_chunks: int):
    """(a, r_out) -> tap index into w (or k for 'zero row')."""
    a = np.arange(n_chunks * r_blk)[:, None]
    r_out = np.arange(r_blk * s)[None, :]
    tau = r_out + s * (q - a)
    valid = (tau >= 0) & (tau < k)
    return np.where(valid, tau, k)  # (A, RS)


def upfir_blocked(x: jax.Array, w, *, stride: int, block: int | None = None) -> jax.Array:
    """Exact ``conv_transpose1d(x, w, stride=stride, padding=0)``.

    x: (B, T, C_in); w: (K, C_in, C_out) (array or np.ndarray, may be traced)
    -> (B, (T-1)*stride + K, C_out).
    """
    k, ci, co = w.shape
    s = stride
    b, t, _ = x.shape
    q, r_blk, nblk, n_chunks, out_len = _plan(t, k, s, co, block)

    taps = _tap_table(k, s, q, r_blk, n_chunks)  # (A, RS), value k == zero
    if isinstance(w, np.ndarray):
        w_ext = np.concatenate([w, np.zeros((1, ci, co), w.dtype)], axis=0)
        wb = w_ext[taps]  # (A, RS, Ci, Co)
        wb = jnp.asarray(
            np.ascontiguousarray(wb.transpose(0, 2, 1, 3)).reshape(
                n_chunks * r_blk, ci, r_blk * s * co
            ),
            dtype=x.dtype,
        )
    else:
        w_ext = jnp.concatenate([w, jnp.zeros((1, ci, co), w.dtype)], axis=0)
        wb = w_ext[jnp.asarray(taps)]  # (A, RS, Ci, Co)
        wb = wb.transpose(0, 2, 1, 3).reshape(n_chunks * r_blk, ci, r_blk * s * co)
        wb = wb.astype(x.dtype)

    # conv block m reads padded frames [m*R, m*R + n_chunks*R)
    # (original t = padded - q)
    tp = (nblk - 1) * r_blk + n_chunks * r_blk
    xp = jnp.pad(x, ((0, 0), (q, tp - q - t), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wb, window_strides=(r_blk,), padding=((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # (B, nblk, R*S*Co)
    y = y.reshape(b, nblk * r_blk * s, co)
    return y[:, :out_len]


def upsampled_corr(x: jax.Array, w, *, stride: int, gain: float = 1.0,
                   block: int | None = None) -> jax.Array:
    """[zero-stuff upsample by ``stride`` (x gain) -> conv1d(w, pad=(K-1)//2)]
    — the reference PQMF-synthesis / multistream_conv_post formulation
    (correlation semantics, odd K) — via :func:`upfir_blocked`.

    x: (B, T, C_in); w: (K, C_in, C_out) -> (B, T*stride, C_out).
    """
    k = w.shape[0]
    half = (k - 1) // 2
    # upfir output has (T-1)*stride + K samples; the slice below needs
    # k-1-half + T*stride <= that, i.e. half >= stride-1. jnp slicing would
    # silently clamp and return a shortened waveform otherwise.
    if half < stride - 1:
        raise ValueError(
            f"upsampled_corr: kernel too short (K={k}) for stride={stride}; "
            f"need (K-1)//2 >= stride-1")
    wt = jnp.flip(w, 0) * gain if not isinstance(w, np.ndarray) else np.ascontiguousarray(w[::-1]) * gain
    y = upfir_blocked(x, wt, stride=stride, block=block)
    return y[:, k - 1 - half : k - 1 - half + x.shape[1] * stride]
