#!/usr/bin/env python3
"""Micro-profile of the VITS2 flow block internals at bench shapes.

Uses utils/profiling.device_timeit (in-program scan iteration + scalar
output + two-point slope) — host-side timing loops and output fetches are
meaningless through the axon relay (~25 ms fixed dispatch cost, ~50-100 MB/s
fetch bandwidth).
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
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "1200")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.ops import attention as att
    from vosk_tts_tpu.ops import wn as wnops
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
    h = cfg.hidden_channels
    half = cfg.inter_channels // 2
    rng = jax.random.PRNGKey(1)
    z_p = jax.random.normal(rng, (B, T, cfg.inter_channels), act)
    y_mask = jnp.ones((B, T, 1), act)
    g = params["emb_g"][jnp.zeros((B,), jnp.int32)][:, None, :]
    hid = jax.random.normal(rng, (B, T, h), act)
    x0 = jax.random.normal(rng, (B, T, half), act)

    def timeit(name, fn, x0_):
        per, t1, t2 = device_timeit(fn, x0_)
        print(f"{name:34s} {per*1e3:9.3f} ms", flush=True)
        return per

    layer = params["flow"]["flows"][0]

    timeit("flow_reverse (4 flows, flash)",
           lambda z: vits2.flow_block_apply(params["flow"], cfg, z, y_mask, g, reverse=True,
                                            flash=True),
           z_p)

    timeit("one flow layer (flash)",
           lambda z: vits2._flow_layer_apply(layer, cfg, "pre_conv2", z, y_mask, g, True,
                                             flash=True),
           z_p)

    timeit("pre conv 96->192 k1 (sliced back)",
           lambda x: conv1d(x, layer["pre"]["w"], layer["pre"]["b"])[..., :half] * y_mask,
           x0)

    timeit("encoder_apply (1 layer)",
           lambda x: att.encoder_apply(layer["pre_transformer"], x * y_mask, y_mask,
                                       n_heads=2, kernel_size=5, window_size=4),
           hid)

    attn_mask = y_mask[:, None, :, 0][..., None, :] * y_mask[:, None, :, 0][..., :, None]
    kv_len = jnp.sum(y_mask[..., 0].astype(jnp.int32), axis=1)
    timeit("mha_apply flash",
           lambda x: att.mha_apply(layer["pre_transformer"]["attn"][0], x, x, attn_mask,
                                   n_heads=2, window_size=4, flash=True, kv_len=kv_len),
           hid)

    timeit("mha_apply alone",
           lambda x: att.mha_apply(layer["pre_transformer"]["attn"][0], x, x, attn_mask,
                                   n_heads=2, window_size=4),
           hid)

    timeit("mha_apply window=None",
           lambda x: att.mha_apply(layer["pre_transformer"]["attn"][0], x, x, attn_mask,
                                   n_heads=2, window_size=None),
           hid)

    timeit("ffn_apply alone",
           lambda x: att.ffn_apply(layer["pre_transformer"]["ffn"][0], x, y_mask, kernel_size=5),
           hid)

    timeit("wn_apply (4 layers k5)",
           lambda x: wnops.wn_apply(layer["enc"], x, y_mask, g, kernel_size=5, dilation_rate=1),
           hid)

    timeit("wn in-conv 192->384 k5 (sliced)",
           lambda x: conv1d(x, layer["enc"]["in"][0]["w"], layer["enc"]["in"][0]["b"],
                            padding=2)[..., :h],
           hid)


if __name__ == "__main__":
    main()
