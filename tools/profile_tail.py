#!/usr/bin/env python3
"""Decompose the MB-iSTFT generator tail (everything after the MRF trunk):
conv_post, spec/phase, istft_multiband (conv_transpose + envelope divide),
pqmf_synthesis — the ~4 ms "tail" of SPEED_OF_LIGHT §2 whose 2.9 ms beyond
conv_post was round-3's unattacked headroom.

Relay-safe timing via device_timeit. Usage: python tools/profile_tail.py
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
    from vosk_tts_tpu.ops import pqmf as P
    from vosk_tts_tpu.ops.conv import conv1d
    from vosk_tts_tpu.ops.stft import istft_multiband
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = vits2.VITS2Config()
    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B, T = args.batch, args.frames
    n_fft, hop, sub = cfg.gen_istft_n_fft, cfg.gen_istft_hop_size, cfg.subbands
    ch = cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))  # 128
    T_up = T * 16  # trunk output length (frames * prod(upsample_rates))

    key = jax.random.PRNGKey(0)
    params = vits2.generator_init(key, cfg)
    if args.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    x_trunk = jax.random.normal(key, (B, T_up, ch), act)  # post-MRF activation

    def dep(out, like):
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    def timeit(name, fn, c0):
        per, _, _ = device_timeit(fn, c0)
        print(f"{name:36s} {per*1e3:9.3f} ms", flush=True)
        return per

    # 0. whole tail (reflect-pad + conv_post + spec/phase + istft + pqmf)
    def whole(c):
        x = jnp.pad(c, ((0, 0), (1, 0), (0, 0)), mode="reflect")
        x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
        b, t, _ = x.shape
        x = x.reshape(b, t, sub, n_fft + 2)
        spec, phase = vits2._spec_phase(x)  # noqa: SLF001
        y_mb = istft_multiband(spec, phase, n_fft, hop, n_fft, mode=cfg.istft_mode)
        wav = P.pqmf_synthesis(y_mb, subbands=sub)
        return c + dep(wav, c)

    try:
        timeit("TAIL whole", whole, x_trunk)
    except TypeError:
        def whole(c):
            x = jnp.pad(c, ((0, 0), (1, 0), (0, 0)), mode="reflect")
            x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
            b, t, _ = x.shape
            x = x.reshape(b, t, sub, n_fft + 2)
            spec, phase = vits2._spec_phase(x, n_fft)
            y_mb = istft_multiband(spec, phase, n_fft, hop, n_fft, mode=cfg.istft_mode)
            wav = P.pqmf_synthesis(y_mb, subbands=sub)
            return c + dep(wav, c)

        timeit("TAIL whole", whole, x_trunk)

    # 1. conv_post alone
    def post(c):
        x = jnp.pad(c, ((0, 0), (1, 0), (0, 0)), mode="reflect")
        x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
        return c + dep(x, c)

    timeit("conv_post (72ch, lane-padded)", post, x_trunk)

    # fixed intermediate tensors for the later stages
    xp = jnp.pad(x_trunk, ((0, 0), (1, 0), (0, 0)), mode="reflect")
    xp = conv1d(xp, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
    xp = xp.reshape(B, xp.shape[1], sub, n_fft + 2)
    spec, phase = vits2._spec_phase(xp, n_fft)

    # 2. spec/phase exp+sincos
    def sp(c):
        s, p = vits2._spec_phase(c, n_fft)
        return c + dep((s, p), c)

    timeit("spec_phase (exp + pi*sin)", sp, xp)

    # 3. istft_multiband
    def istft_stage(c):
        y = istft_multiband(c, phase, n_fft, hop, n_fft, mode=cfg.istft_mode)
        return c + dep(y, c)

    timeit("istft_multiband", istft_stage, spec)

    y_mb = istft_multiband(spec, phase, n_fft, hop, n_fft, mode=cfg.istft_mode)

    # 4. pqmf synthesis
    def pq(c):
        w = P.pqmf_synthesis(c, subbands=sub)
        return c + dep(w, c)

    timeit("pqmf_synthesis", pq, y_mb)

    # 5. FUSED tail: istft+env+pqmf as one blocked FIR (round-4 candidate)
    from vosk_tts_tpu.ops.stft import istft_pqmf_fused, mb_decoder_tail_fused

    def fused(c):
        w = istft_pqmf_fused(c, phase, n_fft, hop, n_fft, subbands=sub,
                             mode=cfg.istft_mode)
        return c + dep(w, c)

    timeit("FUSED istft+env+pqmf", fused, spec)

    # 6. whole tail with lane-space spec/phase + composite FIR (what
    # vits2.infer now runs)
    def whole_fused(c):
        x = jnp.pad(c, ((0, 0), (1, 0), (0, 0)), mode="reflect")
        x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
        wav = mb_decoder_tail_fused(x, n_fft, hop, n_fft, subbands=sub,
                                    mode=cfg.istft_mode)
        return c + dep(wav, c)

    timeit("TAIL whole (fused+lane specphase)", whole_fused, x_trunk)


if __name__ == "__main__":
    main()
