#!/usr/bin/env python3
"""Per-stage device-time breakdown of the flagship MB-iSTFT-VITS2 inference
graph at bench shapes, on whatever device JAX selects (TPU under axon).

Uses utils/profiling.device_timeit (in-program scan iteration + scalar
output + two-point slope): host-side timing loops and output fetches are
meaningless through the axon relay (~25 ms fixed dispatch cost, ~50-100 MB/s
fetch bandwidth). Each stage keeps a data dependence on the scan carry via a
never-true comparison against +inf so XLA cannot hoist it out of the loop.

Usage: python tools/profile_stages.py [--dtype bfloat16] [--batch 16]
"""

import argparse
import json
import os
import signal
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--text", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2048)
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "1500")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    if args.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )

    B, TX, TY = args.batch, args.text, args.frames
    rng = jax.random.PRNGKey(1)
    x_ids = jnp.zeros((B, TX), jnp.int32)
    x_lengths = jnp.full((B,), TX, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)

    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    g = params["emb_g"][sid][:, None, :]

    def dep(out, like):
        """Data-dependent zero: (sum(out) >= +inf) cast to like.dtype."""
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    results = {}

    def timeit(name, fn, carry0):
        per, _, _ = device_timeit(fn, carry0)
        results[name] = per
        print(f"{name:28s} {per*1e3:9.3f} ms", flush=True)

    # 1. text encoder: carry = x_ids
    def enc_stage(c):
        out = vits2.text_encoder_apply(params["enc_p"], cfg, c, x_lengths,
                                       g if cfg.enc_gin_channels else None)
        return c + dep(out, c)

    timeit("text_encoder", enc_stage, x_ids)

    # precompute stage inputs once
    x, m_p, logs_p, x_mask = vits2.text_encoder_apply(
        params["enc_p"], cfg, x_ids, x_lengths, g if cfg.enc_gin_channels else None)

    # 2. SDP reverse: carry = x
    def sdp_stage(c):
        logw = vits2.sdp_reverse(params["dp"], cfg, c, x_mask, g,
                                 rng=jax.random.PRNGKey(2), noise_scale=0.8)
        return c + dep(logw, c)

    timeit("sdp_reverse", sdp_stage, x)

    logw = vits2.sdp_reverse(params["dp"], cfg, x, x_mask, g,
                             rng=jax.random.PRNGKey(2), noise_scale=0.8)

    # 3. alignment expansion: carry = logw
    def align_stage(c):
        w_ceil = jnp.ceil(jnp.exp(c) * x_mask)[..., 0]
        y_lengths = jnp.clip(jnp.sum(w_ceil, -1), 1, TY).astype(jnp.int32)
        y_mask = vits2.sequence_mask(y_lengths, TY).astype(x_mask.dtype)[..., None]
        attn = vits2.generate_path(w_ceil, x_mask[..., 0], y_mask[..., 0])
        mp = jnp.einsum("byt,btc->byc", attn, m_p)
        lp = jnp.einsum("byt,btc->byc", attn, logs_p)
        z_p = mp + jax.random.normal(jax.random.PRNGKey(3), mp.shape, mp.dtype) * jnp.exp(lp) * 0.667
        return c + dep((z_p, y_mask), c)

    timeit("align+expand", align_stage, logw)

    w_ceil = jnp.ceil(jnp.exp(logw) * x_mask)[..., 0]
    y_lengths = jnp.clip(jnp.sum(w_ceil, -1), 1, TY).astype(jnp.int32)
    y_mask = vits2.sequence_mask(y_lengths, TY).astype(x_mask.dtype)[..., None]
    attn = vits2.generate_path(w_ceil, x_mask[..., 0], y_mask[..., 0])
    mp = jnp.einsum("byt,btc->byc", attn, m_p)
    lp = jnp.einsum("byt,btc->byc", attn, logs_p)
    z_p = mp + jax.random.normal(jax.random.PRNGKey(3), mp.shape, mp.dtype) * jnp.exp(lp) * 0.667

    # 4. flow reverse: carry = z_p (shape-preserving, no dep trick needed).
    # flash=True as in the real infer graph (vits2.infer) — without it the
    # full (B,H,T,T) attention dominates and the number is meaningless.
    timeit("flow_reverse",
           lambda c: vits2.flow_block_apply(params["flow"], cfg, c, y_mask, g,
                                            reverse=True, flash=True),
           z_p)

    z = vits2.flow_block_apply(params["flow"], cfg, z_p, y_mask, g, reverse=True, flash=True)

    # 5. full generator: carry = z
    def gen_stage(c):
        wav = vits2.generator_apply(params["dec"], cfg, c * y_mask, g)[0]
        return c + dep(wav, c)

    timeit("generator_full", gen_stage, z)

    # 6. whole fused graph: carry = (rng, x_ids-dep)
    def whole_stage(c):
        rng, ids = c
        rng, sub = jax.random.split(rng)
        out = vits2.infer(params, cfg, ids, x_lengths, sid, rng=sub, max_frames=TY)
        return rng, ids + dep(out["wav"], ids)

    per, _, _ = device_timeit(whole_stage, (rng, x_ids))
    results["WHOLE fused infer"] = per
    print(f"{'WHOLE fused infer':28s} {per*1e3:9.3f} ms", flush=True)

    audio_s = B * TY * 256 / 22050
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}, indent=1))
    print(f"whole-graph throughput: {audio_s/results['WHOLE fused infer']:.0f} audio-s/s")


if __name__ == "__main__":
    main()
