#!/usr/bin/env python3
"""Micro-profile of the MB-iSTFT generator internals at bench shapes, with a
FLOP model per stage — the numbers behind SPEED_OF_LIGHT.md.

Uses utils/profiling.device_timeit (in-program scan + scalar out + two-point
slope); host-side timing is meaningless through the axon relay.
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
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "1500")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.ops import pqmf as pq
    from vosk_tts_tpu.ops import wn as wnops
    from vosk_tts_tpu.ops.conv import conv1d, conv_transpose1d
    from vosk_tts_tpu.ops.stft import istft_multiband
    from vosk_tts_tpu.ops.wn import leaky_relu
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
    gen = params["dec"]

    B, T = args.batch, args.frames
    rng = jax.random.PRNGKey(1)
    z = jax.random.normal(rng, (B, T, cfg.inter_channels), act)

    def dep(out, like):
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    def timeit(name, fn, x0, gflop=None):
        per, _, _ = device_timeit(fn, x0)
        eff = f"  {gflop/per/1e3:7.1f} TFLOP/s" if gflop else ""
        print(f"{name:34s} {per*1e3:9.3f} ms{eff}", flush=True)
        return per

    uic = cfg.upsample_initial_channel  # 512
    n_kernels = len(cfg.resblock_kernel_sizes)

    # stage inputs
    x_pre = conv1d(z, gen["conv_pre"]["w"], gen["conv_pre"]["b"], padding=3)
    x_up0 = conv_transpose1d(leaky_relu(x_pre), gen["ups"][0]["w"], gen["ups"][0]["b"],
                             stride=4, padding=6)
    x_s0 = x_up0
    for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
        r = wnops.resblock1_apply(gen["resblocks"][j], x_up0, None, kernel_size=rk, dilation=tuple(rd))
        x_s0 = r if j == 0 else x_s0 + r
    x_s0 = x_s0 / n_kernels
    x_up1 = conv_transpose1d(leaky_relu(x_s0), gen["ups"][1]["w"], gen["ups"][1]["b"],
                             stride=4, padding=6)

    def mrf_stage(i, x_in):
        def f(x):
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
                r = wnops.resblock1_apply(gen["resblocks"][i * n_kernels + j], x, None,
                                          kernel_size=rk, dilation=tuple(rd))
                xs = r if xs is None else xs + r
            return xs / n_kernels
        return f

    gf = lambda k, c, t: 2 * k * c * c * t * B / 1e9  # one conv GFLOP

    t0, c0 = T * 4, uic // 2      # 8192, 256
    t1, c1 = T * 16, uic // 4     # 32768, 128
    mrf_gflop0 = sum(6 * gf(k, c0, t0) for k in cfg.resblock_kernel_sizes)
    mrf_gflop1 = sum(6 * gf(k, c1, t1) for k in cfg.resblock_kernel_sizes)

    timeit("conv_pre k7 192->512", lambda x: x + dep(
        conv1d(x, gen["conv_pre"]["w"], gen["conv_pre"]["b"], padding=3), x), z,
        gflop=2 * 7 * 192 * 512 * T * B / 1e9)
    timeit("up0 k16s4 512->256", lambda x: x + dep(
        conv_transpose1d(leaky_relu(x), gen["ups"][0]["w"], gen["ups"][0]["b"],
                         stride=4, padding=6), x), x_pre,
        gflop=2 * 4 * 512 * 256 * t0 * B / 1e9)
    timeit("mrf stage0 (T=8192,C=256)", lambda x: x + dep(mrf_stage(0, x)(x), x),
           x_up0, gflop=mrf_gflop0)
    timeit("up1 k16s4 256->128", lambda x: x + dep(
        conv_transpose1d(leaky_relu(x), gen["ups"][1]["w"], gen["ups"][1]["b"],
                         stride=4, padding=6), x), x_s0,
        gflop=2 * 4 * 256 * 128 * t1 * B / 1e9)
    timeit("mrf stage1 (T=32768,C=128)", lambda x: x + dep(mrf_stage(1, x)(x), x),
           x_up1, gflop=mrf_gflop1)

    # conv_post alone (72 output channels -> lane padding question)
    timeit("conv_post k7 128->72", lambda x: x + dep(
        conv1d(x, gen["conv_post"]["w"], gen["conv_post"]["b"], padding=3), x), x_up1,
        gflop=2 * 7 * 128 * 72 * t1 * B / 1e9)

    # full decode tail: leaky+post+istft+pqmf
    def tail(x):
        y = jnp.where(x >= 0, x, 0.01 * x)
        y = jnp.pad(y, ((0, 0), (1, 0), (0, 0)), mode="reflect")
        y = conv1d(y, gen["conv_post"]["w"], gen["conv_post"]["b"], padding=3)
        b, t, _ = y.shape
        y = y.reshape(b, t, cfg.subbands, cfg.gen_istft_n_fft + 2)
        spec, phase = vits2._spec_phase(y, cfg.gen_istft_n_fft)
        y_mb = istft_multiband(spec, phase, cfg.gen_istft_n_fft, cfg.gen_istft_hop_size,
                               cfg.gen_istft_n_fft, mode=cfg.istft_mode)
        return pq.pqmf_synthesis(y_mb, subbands=cfg.subbands)

    timeit("tail: post+istft+pqmf", lambda x: x + dep(tail(x), x), x_up1)

    timeit("generator_full", lambda x: x + dep(
        vits2.generator_apply(gen, cfg, x, None)[0], x), z,
        gflop=2 * 7 * 192 * 512 * T * B / 1e9
        + 2 * 4 * 512 * 256 * t0 * B / 1e9 + mrf_gflop0
        + 2 * 4 * 256 * 128 * t1 * B / 1e9 + mrf_gflop1
        + 2 * 7 * 128 * 72 * t1 * B / 1e9)


if __name__ == "__main__":
    main()
