#!/usr/bin/env python3
"""Round-3 perf experiments at bench shapes (see SPEED_OF_LIGHT.md):

  1. banded flash attention (current kernel) + flow_reverse x4
  2. MRF stage1 (T=32768, C=128) XLA reference point
  3. conv_post 128->72 vs lane-padded 128->128(+slice)
  4. tail pieces: spec/phase transcendentals, istft_multiband, pqmf

History (results recorded in SPEED_OF_LIGHT.md): flash v1 full-tile
selects 1.95 ms -> v2 compact band pass 1.30 -> v3 in-kernel rel terms
1.21; Pallas MRF per-tap 30.4 ms vs XLA 13.9 (deleted); implicit-GEMM
variant rejected by Mosaic on v5e (bf16 rotate / offset-concat).
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
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.ops import attention as att
    from vosk_tts_tpu.ops import pqmf as pq
    from vosk_tts_tpu.ops import wn as wnops
    from vosk_tts_tpu.ops.conv import conv1d
    from vosk_tts_tpu.ops.stft import istft_multiband
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    act = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    B, T = 16, 2048
    h = cfg.hidden_channels
    layer = params["flow"]["flows"][0]
    g = params["emb_g"][jnp.zeros((B,), jnp.int32)][:, None, :]
    x_mask = jnp.ones((B, T, 1), act)
    x_full = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.inter_channels), act)
    hid0 = jax.random.normal(jax.random.PRNGKey(2), (B, T, h), act)

    def dep(out, like):
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    def timeit(name, fn, x_in):
        per, _, _ = device_timeit(fn, x_in)
        print(f"{name:38s} {per*1e3:9.3f} ms", flush=True)
        return per

    # ---- 1/2: attention kernel (v3: in-kernel rel-pos terms) ----
    if not os.environ.get("EXP_SKIP_FLOW"):
        timeit("mha flash v3", lambda c: att.mha_apply(
            layer["pre_transformer"]["attn"][0], c, c, None, n_heads=2,
            window_size=4, flash=True), hid0)
        timeit("flow_reverse x4 (v3)", lambda c: vits2.flow_block_apply(
            params["flow"], cfg, c, x_mask, g, reverse=True, flash=True), x_full)

    # ---- 1b: flash block_q sweep (raw kernel, flow shapes) ----
    if os.environ.get("EXP_BLOCK_SWEEP"):
        from vosk_tts_tpu.ops import flash_attention as fa
        d = h // 2
        qkv = jax.random.normal(jax.random.PRNGKey(9), (3, B, 2, T, d), act)
        relt = jax.random.normal(jax.random.PRNGKey(10), (1, 9, d), act)
        lens = jnp.full((B,), T, jnp.int32)
        for bq in (128, 256, 512, 1024):  # 2048 exceeds scoped VMEM (23.8M/16M)
            def fn(c, bq=bq):
                out = fa.banded_flash_attention(
                    qkv[0] + dep(c, qkv[0]), qkv[1], qkv[2], relt, relt, lens,
                    window=4, block_q=bq)
                return c + dep(out, c)
            timeit(f"flash raw block_q={bq}", fn, hid0)

    # ---- 1c: sdp_reverse (B=16, T=256) + decomposition ----
    if os.environ.get("EXP_SDP"):
        xs = jax.random.normal(jax.random.PRNGKey(11), (B, 256, h), act)
        ms = jnp.ones((B, 256, 1), act)
        def sdp_fn(c):
            logw = vits2.sdp_reverse(params["dp"], cfg, c, ms, g,
                                     rng=jax.random.PRNGKey(0), noise_scale=0.8)
            return c + dep(logw, c)
        timeit("sdp_reverse", sdp_fn, xs)

    if os.environ.get("EXP_SDP_SUB"):
        from vosk_tts_tpu.ops import flows as fl
        from vosk_tts_tpu.ops import wn as wnops2
        xs = jax.random.normal(jax.random.PRNGKey(11), (B, 256, h), act)
        ms = jnp.ones((B, 256, 1), act)
        dpp = params["dp"]
        ctx = vits2._sdp_context(dpp, cfg, xs, ms, g)
        z2 = jax.random.normal(jax.random.PRNGKey(12), (B, 256, 2), act)
        timeit("sdp ctx (pre+dds+proj)", lambda c: c + dep(
            vits2._sdp_context(dpp, cfg, c, ms, g), c), xs)
        timeit("sdp one convflow rev", lambda c: c + dep(fl.convflow_apply(
            dpp["flows"][2], c[..., :2] * 0 + z2, ms, g=ctx, reverse=True,
            filter_channels=256, kernel_size=3), c), xs)
        timeit("sdp ddsconv alone", lambda c: c + dep(wnops2.ddsconv_apply(
            dpp["flows"][2]["convs"], c, ms, g=ctx, kernel_size=3), c), ctx)

    # ---- 3: MRF stage1 ----
    t1, c1 = T * 16, cfg.upsample_initial_channel // 4  # 32768, 128
    x1 = jax.random.normal(jax.random.PRNGKey(3), (B, t1, c1), act)
    n_kernels = len(cfg.resblock_kernel_sizes)

    def mrf_stage_xla(x):
        xs = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            r = wnops.resblock1_apply(params["dec"]["resblocks"][n_kernels + j], x, None,
                                      kernel_size=rk, dilation=tuple(rd))
            xs = r if xs is None else xs + r
        return xs / n_kernels

    if not os.environ.get("EXP_SKIP_FLOW"):
        timeit("mrf stage1 XLA", lambda x: x + dep(mrf_stage_xla(x), x), x1)

    # ---- 4: conv_post lane padding ----
    gen = params["dec"]
    w_post, b_post = gen["conv_post"]["w"], gen["conv_post"]["b"]  # (7,128,72)
    co = w_post.shape[-1]
    w_pad = jnp.zeros((7, c1, 128), act).at[..., :co].set(w_post)
    b_pad = None if b_post is None else jnp.zeros((128,), act).at[:co].set(b_post)

    timeit("conv_post 128->72", lambda x: x + dep(
        conv1d(x, w_post, b_post, padding=3), x), x1)
    timeit("conv_post 128->128pad+slice", lambda x: x + dep(
        conv1d(x, w_pad, b_pad, padding=3)[..., :co], x), x1)

    # ---- 5: tail pieces ----
    y_post = conv1d(x1, w_post, b_post, padding=3)
    spec, phase = vits2._spec_phase(
        y_post.reshape(B, t1, cfg.subbands, cfg.gen_istft_n_fft + 2), cfg.gen_istft_n_fft)

    timeit("spec_phase (exp+sin)", lambda y: y + dep(vits2._spec_phase(
        y.reshape(B, t1, cfg.subbands, cfg.gen_istft_n_fft + 2), cfg.gen_istft_n_fft), y),
        y_post)
    timeit("istft_multiband", lambda s: s + dep(istft_multiband(
        s, phase, cfg.gen_istft_n_fft, cfg.gen_istft_hop_size, cfg.gen_istft_n_fft,
        mode=cfg.istft_mode), s), spec)
    y_mb = istft_multiband(spec, phase, cfg.gen_istft_n_fft, cfg.gen_istft_hop_size,
                           cfg.gen_istft_n_fft, mode=cfg.istft_mode)
    timeit("pqmf_synthesis", lambda y: y + dep(
        pq.pqmf_synthesis(y, subbands=cfg.subbands), y), y_mb)


if __name__ == "__main__":
    main()
