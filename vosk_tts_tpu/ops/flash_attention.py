"""Banded rel-pos flash attention (Pallas TPU kernel).

The VITS2 encoder/flow attention (training/vits2/attentions.py:118-271) is
GLOBAL softmax attention plus relative-position logits restricted to a
±window band (window=4), plus a banded relative-VALUE term. The reference
skew-trick implementation materializes O(L^2) score/probability tensors
and, worse, the band<->full conversions lower to whole-tensor relayouts
that dominate inference: at batch 16 / 2048 frames the XLA banded path
costs ~35 ms per flow layer on a v5e while the attention math itself is
worth ~0.5 ms (tools/profile_flow_sub.py).

Kernel design (round 3, "v3" — see SPEED_OF_LIGHT.md §3-4 for the
measured history):

  * online-softmax flash attention over key/value blocks held in VMEM;
  * plain key blocks EXCLUDE the ±w diagonal band with one mask — the
    band is processed as one extra virtual block on a compact
    (BQ, 2w+1) tile read from a (BQ+2w)-row key/value window (shifted
    row products), instead of compare+select passes over every
    (BQ, BK) score tile (which made the first kernel VPU-bound:
    1.95 ms vs 0.5 ms of attention math per flow layer);
  * the rel-pos logits (q·rel_k) and the relative-value term
    (band_p·rel_v) are computed IN-KERNEL as two small MXU dots, so no
    (B, H, T, 2w+1)-padded-to-128-lanes band tensors ever touch HBM
    and the caller needs no lane-starved einsums.

Precision: fp32 inputs reproduce the XLA banded path exactly (all dots
accumulate in f32). bf16 inputs feed the MXU with bf16 operands (q.k,
rel-k logits, and the probability.V product downcast p to bf16) — full
MXU rate, at one-bf16-rounding tolerance vs the XLA path
(tests/test_flash_attention.py::test_mha_flash_bf16).

Semantics (matching ops/attention.mha_apply banded path, exact in fp32):
  scores[i,j] = q_scaled[i] . k[j] + (q_scaled[i] . rel_k[j-i+w]) |j-i|<=w
  scores[i,j] = mask_value                                        j >= kv_len
  p = softmax_j(scores)
  out[i] = sum_j p[i,j] v[j] + sum_m p[i, i+m-w] rel_v[m]
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


def _kernel(len_ref, q_ref, k_ref, v_ref, relk_ref, relv_ref, o_ref, *,
            window: int, block_k: int, mask_value: float):
    """q_ref: (1, BQ, DP) pre-scaled; k_ref/v_ref: (1, T+2w, DP) padded with
    ``window`` zero rows on each end; relk_ref/relv_ref: (1, MP, DP)."""
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    kv_len = len_ref[bh]

    block_q = q_ref.shape[1]
    t_pad = k_ref.shape[1]
    dp = q_ref.shape[2]
    mp = relk_ref.shape[1]
    m_band = 2 * window + 1
    t = t_pad - 2 * window
    nk = t // block_k

    q_nat = q_ref[0]  # (BQ, DP) — native dtype feeds the MXU at full rate
    # v4: ALL (BQ, BK) score/probability tiles live in the input dtype.
    # In bf16 serving this halves both the VPU exp cost (the dominant term:
    # ~2M transcendentals per program at BQ=BK=1024) and the score-tile
    # VMEM traffic; fp32 inputs keep exact XLA-path parity for tests.
    sdt = q_nat.dtype
    # band logits: q . rel_k[m]  -> (BQ, MP); cols >= m_band hit zero rows
    # (MXU accumulates in f32 — Mosaic requires 32-bit acc — then casts)
    band = jax.lax.dot_general(q_nat, relk_ref[0],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(sdt)

    i_loc = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    i_glob_col = qb * block_q + i_loc

    m_i = jnp.full((block_q, 1), _NEG_INIT, sdt)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, dp), jnp.float32)
    mask_val = jnp.asarray(mask_value, sdt)

    for jb in range(nk):
        k_blk = k_ref[0, window + jb * block_k : window + (jb + 1) * block_k, :]
        v_blk = v_ref[0, window + jb * block_k : window + (jb + 1) * block_k, :]

        s = jax.lax.dot_general(q_nat, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(sdt)  # (BQ, BK)
        # v5: plain blocks mask ONLY the kv-length cutoff (a lane compare —
        # 3 VPU passes over the tile instead of the 8-pass band-exclusion
        # chain); band columns keep their PLAIN logits here and the band
        # pass applies a signed correction on its compact (BQ, 2w+1) tile.
        j_glob = jb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(j_glob < kv_len, s, mask_val)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)  # sdt tile — the hot transcendental pass
        l_i = l_i * alpha.astype(jnp.float32) + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32)
        acc = acc * alpha.astype(jnp.float32) + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_i = m_new

    # ---- band pass: keys/values i-w .. i+w from a (BQ+2w) window.
    # Correction form: the plain pass double-counted band columns at their
    # plain logits, so accumulate exp(s+rel) - exp(s) for l and the V sum
    # (signed — the online-softmax accumulators are linear), and p_rel alone
    # for the relative-value term. ----
    start = qb * block_q  # window row 0 == global key (start - w); k_ref padded
    kwin = k_ref[0, pl.ds(start, block_q + 2 * window), :]
    vwin = v_ref[0, pl.ds(start, block_q + 2 * window), :]

    rel_cols, plain_cols = [], []
    for m in range(m_band):
        kd = kwin[m : m + block_q, :]  # key row i + m - w
        # accumulate in f32 then cast, matching the plain pass's MXU
        # rounding (f32-accumulated dot cast to sdt) so the signed
        # exp(s+rel)-exp(s) correction cancels tightly in bf16
        sm = jnp.sum(q_nat.astype(jnp.float32) * kd.astype(jnp.float32),
                     axis=1, keepdims=True, dtype=jnp.float32).astype(sdt)
        j = i_glob_col + (m - window)
        valid = (j >= 0) & (j < kv_len)
        rel_cols.append(jnp.where(valid, sm + band[:, m : m + 1], mask_val))
        plain_cols.append(jnp.where(valid, sm, mask_val))
    sb_rel = jnp.concatenate(rel_cols, axis=1)  # (BQ, 2w+1)
    sb_plain = jnp.concatenate(plain_cols, axis=1)

    m_new = jnp.maximum(m_i, jnp.maximum(
        jnp.max(sb_rel, axis=1, keepdims=True),
        jnp.max(sb_plain, axis=1, keepdims=True)))
    alpha = jnp.exp(m_i - m_new).astype(jnp.float32)
    p_rel = jnp.exp(sb_rel - m_new)  # (BQ, 2w+1) sdt
    p_plain = jnp.exp(sb_plain - m_new)
    diff32 = (p_rel.astype(jnp.float32) - p_plain.astype(jnp.float32))
    l_i = l_i * alpha + jnp.sum(diff32, axis=1, keepdims=True)
    acc = acc * alpha
    for m in range(m_band):
        acc = acc + diff32[:, m : m + 1] * vwin[m : m + block_q, :].astype(jnp.float32)

    # relative-value term: band_p @ rel_v, one (BQ, MP)x(MP, DP) dot
    pb_pad = jnp.pad(p_rel, ((0, 0), (0, mp - m_band)))
    acc = acc + jax.lax.dot_general(pb_pad, relv_ref[0].astype(pb_pad.dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


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


# ---------------------------------------------------------------------------
# Global flash attention in NATIVE channels-last layout (the DiT / CFM
# estimator attention: plain softmax over valid keys, no rel-pos band).
#
# The stock Pallas kernel wants (B, H, T, D) with D a multiple of 128; at the
# estimator's D=96 that calling convention costs more than the kernel: pad
# 96->128 (+33% HBM), two transposes, and segment-id plumbing measured 1.5 ms
# per layer against a 2.0 ms kernel (tools/profile_dit_block.py, B32 T2048).
# This kernel reads q/k/v exactly as the qkv projections produce them —
# (B, T, H*D) — and treats each head as a lane-block slice, so the only HBM
# traffic is the tensors themselves.
# ---------------------------------------------------------------------------


def _global_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *,
                   block_k: int, sm_scale: float, mask_value: float):
    """q_ref: (1, BQ, D); k_ref/v_ref: (1, T, D); grid (B, H, T//BQ)."""
    b = pl.program_id(0)
    kv_len = len_ref[b]

    block_q = q_ref.shape[1]
    t = k_ref.shape[1]
    d = q_ref.shape[2]
    nk = t // block_k

    q = q_ref[0]  # (BQ, D) native dtype
    sdt = q.dtype
    m_i = jnp.full((block_q, 1), _NEG_INIT, sdt)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)
    mask_val = jnp.asarray(mask_value, sdt)
    scale = jnp.asarray(sm_scale, sdt)

    for jb in range(nk):
        k_blk = k_ref[0, jb * block_k : (jb + 1) * block_k, :]
        v_blk = v_ref[0, jb * block_k : (jb + 1) * block_k, :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(sdt)
        s = s * scale
        j_glob = jb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        # finite mask value: fully-masked rows (padded queries) softmax to a
        # uniform over masked keys instead of 0/0 NaN; callers zero them
        s = jnp.where(j_glob < kv_len, s, mask_val)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)  # input-dtype tile (v4 lesson: VPU exp cost)
        l_i = l_i * alpha.astype(jnp.float32) + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32)
        acc = acc * alpha.astype(jnp.float32) + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_i = m_new

    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


def global_supported(t: int, d_head: int, dtype) -> bool:
    """Shapes the global kernel handles (t must split into >=128 q blocks)."""
    return (
        t % 128 == 0
        and t >= 256
        and t <= 8192
        and d_head <= 128
        and dtype in (jnp.float32, jnp.bfloat16)
    )


@functools.partial(jax.jit, static_argnames=("n_heads", "sm_scale", "mask_value",
                                             "interpret", "block_q"))
def global_flash_attention(q, k, v, kv_len, *, n_heads: int, sm_scale: float,
                           mask_value: float = -30000.0,
                           interpret: bool = False,
                           block_q: int | None = None):
    """q, k, v: (B, T, C) channels-last with C = n_heads * d_head, NOT
    pre-scaled; kv_len: (B,) int32 valid prefix (shared by queries and keys).

    Returns (B, T, C). Rows at positions >= kv_len hold a uniform average of
    masked values (finite, NOT NaN) — callers mask them out as the DiT block
    already does.
    """
    b, t, c = q.shape
    d = c // n_heads

    if block_q is None:
        # whole (T, D) K/V windows live in VMEM per program; score tiles are
        # (BQ, BK) in the input dtype. At D=96/T=2048 even 1024 fits easily.
        esize = jnp.dtype(q.dtype).itemsize
        budget = 16 * 1024 * 1024

        def vmem_est(bq):
            kv = 2 * t * d * esize
            tiles = 3 * bq * bq * esize
            q_acc = 2 * bq * d * 4 + bq * d * esize
            return kv + tiles + q_acc

        fits = [bq for bq in (1024, 512, 256, 128)
                if t % bq == 0 and vmem_est(bq) <= budget]
        block_q = max(fits) if fits else 128
    block_k = block_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_heads, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, h, qb, lens: (bb, qb, h)),
            pl.BlockSpec((1, t, d), lambda bb, h, qb, lens: (bb, 0, h)),
            pl.BlockSpec((1, t, d), lambda bb, h, qb, lens: (bb, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bb, h, qb, lens: (bb, qb, h)),
    )

    kernel = functools.partial(_global_kernel, block_k=block_k,
                               sm_scale=sm_scale, mask_value=mask_value)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), q, k, v)
    return out


def _global_rope_kernel(len_ref, q_ref, qr_ref, k_ref, kr_ref, v_ref,
                        cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref, *,
                        block_k: int, sm_scale: float, mask_value: float):
    """Like _global_kernel but RoPE happens ON the VMEM tiles:
    q = q*cos + q_rot*sin where q_rot = x @ (sign-permuted Wq) arrives as an
    extra packed section — the rotate-half lane shuffle became a weight
    permutation, so no elementwise rope pass ever touches HBM (measured
    1.17 ms/layer at the CFM serving shape)."""
    b = pl.program_id(0)
    kv_len = len_ref[b]

    block_q = q_ref.shape[1]
    t = k_ref.shape[1]
    d = q_ref.shape[2]
    nk = t // block_k

    q = q_ref[0] * cosq_ref[...] + qr_ref[0] * sinq_ref[...]
    sdt = q.dtype
    m_i = jnp.full((block_q, 1), _NEG_INIT, sdt)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)
    mask_val = jnp.asarray(mask_value, sdt)
    scale = jnp.asarray(sm_scale, sdt)

    for jb in range(nk):
        sl = pl.ds(jb * block_k, block_k)
        k_blk = k_ref[0, sl, :] * cosk_ref[sl, :] + kr_ref[0, sl, :] * sink_ref[sl, :]
        v_blk = v_ref[0, sl, :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(sdt)
        s = s * scale
        j_glob = jb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(j_glob < kv_len, s, mask_val)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_i = l_i * alpha.astype(jnp.float32) + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32)
        acc = acc * alpha.astype(jnp.float32) + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_i = m_new

    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "sm_scale", "mask_value",
                                             "interpret", "block_q"))
def global_flash_attention_rope(qkv5, cos, sin, kv_len, *, n_heads: int,
                                sm_scale: float,
                                mask_value: float = -30000.0,
                                interpret: bool = False,
                                block_q: int | None = None):
    """Packed variant with IN-KERNEL RoPE. ``qkv5``: (B, T, 5*n_heads*d)
    laid out [q | k | v | q_rot | k_rot] (d a multiple of 128) where the
    *_rot sections are the projections through sign-permuted weight copies
    (rotate-half as a weight permutation). ``cos``/``sin``: (T, d) tables,
    cos = 1 and sin = 0 beyond the roped dims so pass-through lanes survive
    the combine. Returns (B, T, n_heads*d)."""
    b, t, c5 = qkv5.shape
    d = c5 // (5 * n_heads)
    if d % 128 != 0:
        raise ValueError(f"packed layout needs 128-multiple head dim, got {d}")

    if block_q is None:
        esize = jnp.dtype(qkv5.dtype).itemsize
        budget = 16 * 1024 * 1024

        def vmem_est(bq):
            return 4 * t * d * esize + 3 * bq * bq * esize + 2 * bq * d * 4 + 2 * bq * d * esize

        fits = [bq for bq in (1024, 512, 256, 128)
                if t % bq == 0 and vmem_est(bq) <= budget]
        block_q = max(fits) if fits else 128
    block_k = block_q
    h = n_heads

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, hh, qb, lens: (bb, qb, hh)),
            pl.BlockSpec((1, block_q, d), lambda bb, hh, qb, lens: (bb, qb, 3 * h + hh)),
            pl.BlockSpec((1, t, d), lambda bb, hh, qb, lens: (bb, 0, h + hh)),
            pl.BlockSpec((1, t, d), lambda bb, hh, qb, lens: (bb, 0, 4 * h + hh)),
            pl.BlockSpec((1, t, d), lambda bb, hh, qb, lens: (bb, 0, 2 * h + hh)),
            pl.BlockSpec((block_q, d), lambda bb, hh, qb, lens: (qb, 0)),
            pl.BlockSpec((block_q, d), lambda bb, hh, qb, lens: (qb, 0)),
            pl.BlockSpec((t, d), lambda bb, hh, qb, lens: (0, 0)),
            pl.BlockSpec((t, d), lambda bb, hh, qb, lens: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bb, hh, qb, lens: (bb, qb, hh)),
    )

    kernel = functools.partial(_global_rope_kernel, block_k=block_k,
                               sm_scale=sm_scale, mask_value=mask_value)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h * d), qkv5.dtype),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), qkv5, qkv5, qkv5, qkv5, qkv5, cos, sin, cos, sin)
    return out


@functools.partial(jax.jit, static_argnames=("n_heads", "sm_scale", "mask_value",
                                             "interpret", "block_q"))
def global_flash_attention_packed(qkv, kv_len, *, n_heads: int, sm_scale: float,
                                  mask_value: float = -30000.0,
                                  interpret: bool = False,
                                  block_q: int | None = None):
    """Packed variant: ``qkv`` is (B, T, 3*n_heads*d) laid out
    [q heads | k heads | v heads] with d a multiple of 128 — exactly what a
    fused qkv projection produces. The q/k/v head slicing happens in the
    BlockSpec index maps (the same buffer is passed three times), so NO
    slice copies materialize: measured 3.26 ms -> 2.03 ms per CFM layer vs
    slicing the projection output into separate kernel operands
    (tools/exp_dit_mha.py — XLA copies each slice to a contiguous operand).

    Returns (B, T, n_heads*d)."""
    b, t, c3 = qkv.shape
    d = c3 // (3 * n_heads)
    if d % 128 != 0:
        raise ValueError(f"packed layout needs 128-multiple head dim, got {d}")

    if block_q is None:
        esize = jnp.dtype(qkv.dtype).itemsize
        budget = 16 * 1024 * 1024

        def vmem_est(bq):
            return 2 * t * d * esize + 3 * bq * bq * esize + 2 * bq * d * 4 + bq * d * esize

        fits = [bq for bq in (1024, 512, 256, 128)
                if t % bq == 0 and vmem_est(bq) <= budget]
        block_q = max(fits) if fits else 128
    block_k = block_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_heads, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, h, qb, lens: (bb, qb, h)),
            pl.BlockSpec((1, t, d), lambda bb, h, qb, lens: (bb, 0, n_heads + h)),
            pl.BlockSpec((1, t, d), lambda bb, h, qb, lens: (bb, 0, 2 * n_heads + h)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bb, h, qb, lens: (bb, qb, h)),
    )

    kernel = functools.partial(_global_kernel, block_k=block_k,
                               sm_scale=sm_scale, mask_value=mask_value)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, n_heads * d), qkv.dtype),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), qkv, qkv, qkv)
    return out


@functools.partial(jax.jit, static_argnames=("window", "mask_value", "interpret", "block_q"))
def banded_flash_attention(q, k, v, rel_k, rel_v, kv_len, *, window: int,
                           mask_value: float = _MASK_VALUE,
                           interpret: bool = False,
                           block_q: int | None = None):
    """q,k,v: (B, H, T, D) with q PRE-SCALED by 1/sqrt(D); rel_k/rel_v:
    (n_rel, 2w+1, D) relative-position tables (n_rel = 1 when heads share,
    else H); kv_len: (B,) int32 valid key prefix.

    Returns out: (B, H, T, D) — attention output INCLUDING the banded
    relative-value term (everything but the output projection).
    """
    b, h, t, d = q.shape
    n_rel = rel_k.shape[0]
    m_band = 2 * window + 1
    dp = _round_up(d, 128)
    mp = _round_up(m_band, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(b * h, t, dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (window, window), (0, dp - d))).reshape(b * h, t + 2 * window, dp)
    vp = jnp.pad(v, ((0, 0), (0, 0), (window, window), (0, dp - d))).reshape(b * h, t + 2 * window, dp)
    relk = jnp.pad(rel_k, ((0, 0), (0, mp - m_band), (0, dp - d)))
    relv = jnp.pad(rel_v, ((0, 0), (0, mp - m_band), (0, dp - d)))
    len_bh = jnp.broadcast_to(kv_len.astype(jnp.int32)[:, None], (b, h)).reshape(b * h)

    if block_q is None:
        # measured on v5e at flow shapes (B16 H2 T2048 D96): 1024 -> 0.73 ms,
        # 512 -> 0.98, 256 -> 0.79, 128 -> 1.03; 2048 exceeds scoped VMEM
        # (tools/exp_perf_r3.py block sweep). Larger T or fp32 shrinks the
        # admissible block: every program holds the full (T+2w, DP) K and V
        # windows plus ~3 (BQ, BK) f32 score/prob tiles, so pick the largest
        # block whose VMEM estimate fits the ~16 MB scoped budget.
        esize = jnp.dtype(q.dtype).itemsize
        budget = 16 * 1024 * 1024

        def vmem_est(bq):
            kv_windows = 2 * (t + 2 * window) * dp * esize
            band_f32 = 2 * (bq + 2 * window) * dp * 4
            tiles = 3 * bq * bq * 4
            q_acc = 4 * bq * dp * 4
            return kv_windows + band_f32 + tiles + q_acc

        fits = [bq for bq in (1024, 512, 256, 128)
                if t % bq == 0 and vmem_est(bq) <= budget]
        block_q = max(fits) if fits else 128
    block_k = block_q

    def rel_index(bh, qb, lens):
        del qb, lens
        return (bh % n_rel if n_rel > 1 else 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, qb, lens: (bh, qb, 0)),
            pl.BlockSpec((1, t + 2 * window, dp), lambda bh, qb, lens: (bh, 0, 0)),
            pl.BlockSpec((1, t + 2 * window, dp), lambda bh, qb, lens: (bh, 0, 0)),
            pl.BlockSpec((1, mp, dp), rel_index),
            pl.BlockSpec((1, mp, dp), rel_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bh, qb, lens: (bh, qb, 0)),
    )

    kernel = functools.partial(_kernel, window=window, block_k=block_k,
                               mask_value=mask_value)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, dp), q.dtype),
        interpret=interpret,
    )(len_bh, qp, kp, vp, relk, relv)

    return out[..., :d].reshape(b, h, t, d)
