#!/usr/bin/env python3
"""Sub-stage breakdown of ONE pre_conv2 flow layer at bench shapes.

profile_stages.py shows flow_reverse = ~15.3 ms of the 49.4 ms serving step
while its FLOP model says ~3.3 ms at the chip anchor — this drills into
where the other 12 ms live (Pallas banded attention? WN gated convs at
C=192? fixed overheads?). See SPEED_OF_LIGHT.md.
"""

import argparse
import os
import signal
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=2048)
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "2400")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.ops import attention as att
    from vosk_tts_tpu.ops import wn as wnops
    from vosk_tts_tpu.ops.commons import fused_gate
    from vosk_tts_tpu.ops.conv import conv1d
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )

    B, T = args.batch, args.frames
    half, h = cfg.inter_channels // 2, cfg.hidden_channels
    layer = params["flow"]["flows"][0]
    g = params["emb_g"][jnp.zeros((B,), jnp.int32)][:, None, :]
    x_mask = jnp.ones((B, T, 1), act)
    x_full = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.inter_channels), act)
    x0 = x_full[..., :half]
    hid0 = jax.random.normal(jax.random.PRNGKey(2), (B, T, h), act)

    def dep(out, like):
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    def timeit(name, fn, x_in, gflop=None):
        per, _, _ = device_timeit(fn, x_in)
        eff = f"  {gflop/per/1e3:7.1f} TFLOP/s" if gflop else ""
        print(f"{name:36s} {per*1e3:9.3f} ms{eff}", flush=True)
        return per

    gf = lambda k, ci, co: 2 * k * ci * co * T * B / 1e9

    # whole flow reverse (4 layers)
    timeit("flow_reverse x4 (ref)", lambda c: vits2.flow_block_apply(
        params["flow"], cfg, c, x_mask, g, reverse=True, flash=True), x_full)

    # one layer's pieces
    timeit("pre 1x1 96->192", lambda c: c + dep(
        conv1d(c, layer["pre"]["w"], layer["pre"]["b"]), c), x0,
        gflop=gf(1, half, h))

    timeit("encoder 1L flash (attn+ffn)", lambda c: att.encoder_apply(
        layer["pre_transformer"], c, x_mask, n_heads=2, kernel_size=5,
        window_size=4, flash=True), hid0,
        gflop=4 * gf(1, h, h) + 2 * gf(5, h, h))

    # attention alone
    timeit("mha flash w=4", lambda c: att.mha_apply(
        layer["pre_transformer"]["attn"][0], c, c, None, n_heads=2,
        window_size=4, flash=True), hid0, gflop=4 * gf(1, h, h))

    # attention alone, XLA banded path (35 ms/layer — skip unless asked)
    if os.environ.get("PROFILE_XLA_BANDED"):
        timeit("mha XLA banded", lambda c: att.mha_apply(
            layer["pre_transformer"]["attn"][0], c, c, None, n_heads=2,
            window_size=4, flash=False), hid0, gflop=4 * gf(1, h, h))

    # ffn alone
    timeit("ffn k5 192->192->192", lambda c: att.ffn_apply(
        layer["pre_transformer"]["ffn"][0], c, x_mask, kernel_size=5),
        hid0, gflop=2 * gf(5, h, h))

    # WN 4 layers
    timeit("wn x4 k5 (gin)", lambda c: wnops.wn_apply(
        layer["enc"], c, x_mask, g, kernel_size=5, dilation_rate=1), hid0,
        gflop=4 * (gf(5, h, 2 * h)) + 3 * gf(1, h, 2 * h) + gf(1, h, h))

    # single WN in-conv (the matmul efficiency at C=192)
    timeit("conv k5 192->384", lambda c: c + dep(
        conv1d(c, layer["enc"]["in"][0]["w"], layer["enc"]["in"][0]["b"],
               padding=2), c), hid0, gflop=gf(5, h, 2 * h))

    # the same contraction lane-padded to 256->512
    w_pad = jnp.zeros((5, 256, 512), act)
    w_pad = w_pad.at[:, :h, : 2 * h].set(layer["enc"]["in"][0]["w"])
    hid_pad = jnp.zeros((B, T, 256), act).at[..., :h].set(hid0)
    timeit("conv k5 256->512 (padded)", lambda c: c + dep(
        conv1d(c, w_pad, None, padding=2), c), hid_pad,
        gflop=gf(5, 256, 512))

    # gate + res_skip elementwise cost
    x_in2 = jax.random.normal(jax.random.PRNGKey(3), (B, T, 2 * h), act)
    timeit("fused_gate 384", lambda c: c + dep(
        fused_gate(c, jnp.zeros_like(c)), c), x_in2)

    timeit("post 1x1 192->96", lambda c: c + dep(
        conv1d(c, layer["post"]["w"], layer["post"]["b"]), c), hid0,
        gflop=gf(1, h, half))


if __name__ == "__main__":
    main()
