"""Banded rel-pos flash attention (Pallas TPU kernel).

The VITS2 encoder/flow attention (training/vits2/attentions.py:118-271) is
GLOBAL softmax attention plus relative-position logits restricted to a
±window band (window=4). The skew-trick implementation materializes
O(L^2) score/probability tensors and, worse, the band<->full conversions
lower to whole-tensor relayouts that dominate inference: at batch 16 /
2048 frames the XLA banded path costs ~35 ms per layer on a v5e while
plain global attention costs ~1.1 ms (tools/profile_flow.py).

This kernel computes the same math flash-attention style: online softmax
over key/value blocks held in VMEM, the band bias added in-block from the
O(L*(2w+1)) rel-logit table, and the banded probability sums (needed for
the relative-value term) accumulated alongside the output with the same
rescaling — so nothing O(L^2) ever touches HBM.

Semantics (matching ops/attention.mha_apply banded path exactly, fp32):
  scores[i,j] = q_scaled[i] . k[j] + band[i, j-i+w]   (|j-i| <= w)
  scores[i,j] = mask_value                             (j >= kv_len)
  p = softmax_j(scores)
  out[i]    = sum_j p[i,j] v[j]
  band_p[i,m] = p[i, i+m-w]                            (0 out of range)
(the caller adds sum_m band_p[i,m] * rel_v[m] and the output projection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip to run the kernel in interpreter mode (CPU golden tests).
INTERPRET = False

_MASK_VALUE = -1e4  # reference uses -1e4, not -inf (attentions.py:186)
_NEG_INIT = -1e30


def _kernel(len_ref, q_ref, k_ref, v_ref, band_ref, o_ref, bp_ref, *,
            window: int, block_k: int, mask_value: float):
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    kv_len = len_ref[bh]

    block_q = q_ref.shape[1]
    t = k_ref.shape[1]
    dp = q_ref.shape[2]
    mp = band_ref.shape[2]
    m_band = 2 * window + 1
    nk = t // block_k

    q = q_ref[0].astype(jnp.float32)  # (BQ, DP), pre-scaled by caller
    band = band_ref[0].astype(jnp.float32)  # (BQ, MP)

    i_glob = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    m_i = jnp.full((block_q, 1), _NEG_INIT, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, dp), jnp.float32)
    bp = jnp.zeros((block_q, mp), jnp.float32)

    for jb in range(nk):
        k_blk = k_ref[0, jb * block_k:(jb + 1) * block_k, :].astype(jnp.float32)
        v_blk = v_ref[0, jb * block_k:(jb + 1) * block_k, :].astype(jnp.float32)

        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, BK)

        j_glob = jb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        delta = j_glob - i_glob
        for m in range(m_band):
            s = s + jnp.where(delta == m - window, band[:, m:m + 1], 0.0)
        s = jnp.where(j_glob < kv_len, s, mask_value)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)

        l_i = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        bp_blk = jnp.concatenate(
            [jnp.sum(jnp.where(delta == m - window, p, 0.0), axis=1, keepdims=True)
             for m in range(m_band)], axis=1)  # (BQ, 2w+1)
        bp = bp * alpha + jnp.pad(bp_blk, ((0, 0), (0, mp - m_band)))
        m_i = m_new

    inv_l = 1.0 / l_i
    o_ref[0] = (acc * inv_l).astype(o_ref.dtype)
    bp_ref[0] = (bp * inv_l).astype(bp_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supported(t_q: int, t_kv: int, window: int, dtype) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA path otherwise."""
    return (
        t_q == t_kv
        and t_q % 128 == 0
        and t_q >= 2 * window + 1
        and t_q <= 8192
        and dtype in (jnp.float32, jnp.bfloat16)
    )


@functools.partial(jax.jit, static_argnames=("window", "mask_value", "interpret"))
def banded_flash_attention(q, k, v, band, kv_len, *, window: int,
                           mask_value: float = _MASK_VALUE,
                           interpret: bool = False):
    """q,k,v: (B, H, T, D) with q PRE-SCALED by 1/sqrt(D); band: (B, H, T, 2w+1)
    rel-pos logits (q_scaled . rel_k); kv_len: (B,) int32 valid key prefix.

    Returns (out, band_p): (B, H, T, D) attention output and (B, H, T, 2w+1)
    banded probabilities for the caller's relative-value term.
    """
    b, h, t, d = q.shape
    m_band = 2 * window + 1
    dp = _round_up(d, 128)
    mp = _round_up(m_band, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(b * h, t, dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(b * h, t, dp)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(b * h, t, dp)
    bandp = jnp.pad(band, ((0, 0), (0, 0), (0, 0), (0, mp - m_band))).reshape(b * h, t, mp)
    len_bh = jnp.broadcast_to(kv_len.astype(jnp.int32)[:, None], (b, h)).reshape(b * h)

    block_q = max(bq for bq in (512, 256, 128) if t % bq == 0)
    block_k = block_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, qb, lens: (bh, qb, 0)),
            pl.BlockSpec((1, t, dp), lambda bh, qb, lens: (bh, 0, 0)),
            pl.BlockSpec((1, t, dp), lambda bh, qb, lens: (bh, 0, 0)),
            pl.BlockSpec((1, block_q, mp), lambda bh, qb, lens: (bh, qb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, qb, lens: (bh, qb, 0)),
            pl.BlockSpec((1, block_q, mp), lambda bh, qb, lens: (bh, qb, 0)),
        ],
    )

    kernel = functools.partial(_kernel, window=window, block_k=block_k,
                               mask_value=mask_value)
    out, bp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, mp), q.dtype),
        ],
        interpret=interpret,
    )(len_bh, qp, kp, vp, bandp)

    return (out[..., :d].reshape(b, h, t, d),
            bp[..., :m_band].reshape(b, h, t, m_band))
