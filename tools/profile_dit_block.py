#!/usr/bin/env python3
"""Decompose the CFM estimator (U-ViT DiT stack) at the multistream_v3
serving shape — the round-4 roofline put it at ~30% MXU efficiency with the
gap attributed to adaLN/FiLM elementwise passes (SPEED_OF_LIGHT §7); this
measures the actual split so the fusion work targets the real cost.

Shapes: CFG-doubled batch 2B=32, frames T=2048, hidden 384 (dec config),
bf16. Pieces:
  * whole decoder_apply (the per-ODE-step cost, minus hoisted cond_proj)
  * one dit_block_apply (attn + ffn + adaLN)
  * attention sub-pieces: qkvo projections, RoPE, flash kernel alone
  * FFN convs alone
  * the adaLN chain alone (2x layernorm+modulate + 2x gated residual)
  * U-ViT plumbing: lsc convs, in_proj, FiLM
MXU-floor FLOP counts printed per piece.

Relay-safe: device_timeit; SIGALRM watchdog. Run with default env (axon).
"""

import os
import signal
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "2400")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vosk_tts_tpu.models import stabletts as st
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = st.StableTTSConfig()
    params = st.matcha_init(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    params = cast(params)
    act = jnp.bfloat16

    B2, T = 32, 2048  # CFG-doubled batch
    H = cfg.dec_hidden  # 384
    dec = params["decoder"]
    blk = dec["blocks"][0]["dit"]
    n_heads, ks = cfg.dec_heads, cfg.dec_kernel

    x = jax.random.normal(jax.random.PRNGKey(1), (B2, T, H), act)
    mask = jnp.ones((B2, T, 1), act)
    c = jax.random.normal(jax.random.PRNGKey(2), (B2, cfg.spk_emb_dim), act)
    mu = jax.random.normal(jax.random.PRNGKey(3), (B2, T, cfg.hidden_channels), act)
    te = jax.random.normal(jax.random.PRNGKey(4), (B2, H), act)

    def dep(out, like):
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    def timeit(name, fn, c0, flop=None, n1=2, n2=8, reps=3):
        per, _, _ = device_timeit(fn, c0, n1=n1, n2=n2, reps=reps)
        eff = f"  {flop/per/1e12:6.0f} TF/s" if flop else ""
        fl = f"  ({flop/1e9:6.1f} GF)" if flop else ""
        print(f"{name:34s} {per*1e3:8.3f} ms{fl}{eff}", flush=True)
        return per

    tok = B2 * T
    fl_qkvo = 4 * 2 * H * H * tok
    fl_ffn = 2 * 2 * ks * H * cfg.dec_filter * tok
    fl_blk = fl_qkvo + fl_ffn

    # whole estimator step (cond hoisted, as cfm_solve runs it)
    cond = st.cond_proj_apply(dec, cfg, mu)

    def est(c0):
        out = st.decoder_apply(dec, cfg, c0, mask, mu, jnp.full((B2,), 0.5, act),
                               c, cond=cond)
        return c0 + 1e-6 * out

    noise = jax.random.normal(jax.random.PRNGKey(5), (B2, T, cfg.n_feats), act)
    # estimator input is (B,T,n_feats); decoder_apply concats with cond
    t_est = timeit("decoder_apply (whole, cond hoisted)", est, noise,
                   flop=6 * fl_blk + 3 * 2 * 2 * ks * 2 * H * H * tok
                   + 2 * (H + cfg.n_feats) * H * tok)

    # one DiT block
    def block(c0):
        out = st.dit_block_apply(blk, c0, c, mask, n_heads=n_heads, kernel_size=ks)
        return c0 + 1e-6 * out

    t_blk = timeit("dit_block (attn+ffn+adaLN)", block, x, flop=fl_blk)

    # attention: full mha (flash route engages on TPU at this shape)
    m2 = mask[..., 0]

    def mha(c0):
        out = st.dit_mha_apply(blk["attn"], c0, None, n_heads=n_heads, seq_mask=m2)
        return c0 + 1e-6 * out

    t_mha = timeit("dit_mha (qkvo+rope+flash)", mha, x, flop=fl_qkvo)

    # qkvo projections alone (4 conv1x1)
    from vosk_tts_tpu.ops.conv import conv1d

    def qkvo(c0):
        q = conv1d(c0, blk["attn"]["q"]["w"], blk["attn"]["q"]["b"])
        k = conv1d(c0, blk["attn"]["k"]["w"], blk["attn"]["k"]["b"])
        v = conv1d(c0, blk["attn"]["v"]["w"], blk["attn"]["v"]["b"])
        o = conv1d(q + k + v, blk["attn"]["o"]["w"], blk["attn"]["o"]["b"])
        return c0 + 1e-6 * o

    timeit("qkvo projections (4x conv1x1)", qkvo, x, flop=fl_qkvo)

    # rope alone on (B,H,T,dk)
    dk = H // n_heads
    qh = jax.random.normal(jax.random.PRNGKey(6), (B2, n_heads, T, dk), act)
    d_rope = (dk // 2) // 2 * 2

    def rope_fn(c0):
        return c0 + 1e-6 * st.rope(c0, d_rope)

    timeit("rope (elementwise)", rope_fn, qh)

    # mha plumbing alone: qkvo + reshape/transpose + rope + pad to 128, NO
    # attention (sum the padded tensors instead) — isolates what the stock
    # kernel's calling convention costs around the kernel itself
    import math as _math

    def plumbing(c0):
        b, t, ch = c0.shape
        q = conv1d(c0, blk["attn"]["q"]["w"], blk["attn"]["q"]["b"]).reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)
        k = conv1d(c0, blk["attn"]["k"]["w"], blk["attn"]["k"]["b"]).reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)
        v = conv1d(c0, blk["attn"]["v"]["w"], blk["attn"]["v"]["b"]).reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)
        q, k = st.rope(q, d_rope), st.rope(k, d_rope)
        pad = ((0, 0), (0, 0), (0, 0), (0, 128 - dk))
        out = (jnp.pad(q, pad) + jnp.pad(k, pad) + jnp.pad(v, pad))[..., :dk]
        out = out.transpose(0, 2, 1, 3).reshape(b, t, ch)
        out = conv1d(out, blk["attn"]["o"]["w"], blk["attn"]["o"]["b"])
        return c0 + 1e-6 * out

    timeit("mha plumbing (no attention)", plumbing, x, flop=fl_qkvo)

    # stock flash kernel alone on pre-prepared (padded, transposed) inputs
    from jax.experimental.pallas.ops.tpu import flash_attention as sfa

    qp = jax.random.normal(jax.random.PRNGKey(7), (B2, n_heads, T, 128), act)
    seg = jnp.ones((B2, T), jnp.int32)
    bq = bk = next(v for v in (1024, 512, 256, 128) if T % v == 0)
    bkm = next(v for v in (2048, 1024, 512, 256, 128) if T % v == 0)
    bs = sfa.BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bkm,
                        block_k_dkv=bk, block_q_dkv=bq, block_k_major_dq=bkm,
                        block_k_dq=bk, block_q_dq=bq)

    def kernel_only(c0):
        out = sfa.flash_attention(c0, c0, c0, segment_ids=sfa.SegmentIds(q=seg, kv=seg),
                                  sm_scale=1.0 / _math.sqrt(dk), block_sizes=bs)
        return c0 + 1e-6 * out

    timeit("stock flash kernel alone (D=128)", kernel_only, qp,
           flop=2 * 2 * B2 * n_heads * T * T * 128)

    # ffn alone
    def ffn(c0):
        out = st.dit_ffn_apply(blk["mlp"], c0, mask, kernel_size=ks)
        return c0 + 1e-6 * out

    timeit("ffn (2x k3 conv)", ffn, x, flop=fl_ffn)

    # adaLN chain alone: modulation MLP + 2x (norm+modulate) + 2x gated add
    def adaln(c0):
        h = c
        if "ada_in" in blk:
            h = h @ blk["ada_in"]["w"] + blk["ada_in"]["b"]
        h = jax.nn.silu(h)
        mods = h @ blk["ada_out"]["w"] + blk["ada_out"]["b"]
        sm, scm, gm, sp, scp, gp = jnp.split(mods[:, None, :], 6, axis=-1)

        def norm(v):
            mean = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.var(v, axis=-1, keepdims=True)
            return (v - mean) * jax.lax.rsqrt(var + 1e-5)

        a = norm(c0) * (1 + scm) + sm
        y = c0 + gm * a * mask
        f = norm(y) * (1 + scp) + sp
        y = y + gp * f
        return c0 + 1e-6 * y

    timeit("adaLN chain (2 LN+mod, 2 gate-add)", adaln, x)

    # FiLM + lsc conv (U-ViT plumbing per deep block)
    lsc = dec["lsc"][0]
    x2 = jnp.concatenate([x, x], axis=-1)

    def lsc_fn(c0):
        y = conv1d(c0, lsc["w"], lsc["b"], padding=ks // 2)
        return c0 + 1e-6 * jnp.concatenate([y, y], axis=-1)

    timeit("lsc conv (k3 768->384)", lsc_fn, x2, flop=2 * ks * 2 * H * H * tok)

    film = dec["blocks"][0]["film"]["film"]

    def film_fn(c0):
        gb = conv1d(te[:, None, :], film["w"], film["b"])
        gamma, beta = gb[..., :H], gb[..., H:]
        return c0 + 1e-6 * ((gamma * c0 + beta) * mask)

    timeit("FiLM (time scale-shift)", film_fn, x)

    print(f"\nblock accounting: mha {t_mha*1e3:.2f} + ffn+adaLN+film(rest) "
          f"{(t_blk-t_mha)*1e3:.2f} = {t_blk*1e3:.2f} ms; "
          f"6 blocks -> {6*t_blk*1e3:.1f} of est {t_est*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
