#!/usr/bin/env python3
"""Decompose the VITS2 split-serving PASS ONE (encoder + SDP) at the bench
workload shapes — it is ~21% of true-duration serving time (BENCH_r04) and
the round-4 perf doc said nothing about it (VERDICT r4 weak-1).

Pieces at B16, text buckets 64/128/256, bf16: text_encoder alone,
sdp_reverse alone (fused DDSConv path), whole encode_for_infer."""

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

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    B = 16

    def timeit(name, fn, c0, n1=4, n2=16, reps=3):
        per, _, _ = device_timeit(fn, c0, n1=n1, n2=n2, reps=reps)
        print(f"{name:34s} {per*1e3:8.3f} ms", flush=True)
        return per

    for t in (64, 128, 256):
        x = jnp.zeros((B, t), jnp.int32)
        xl = jnp.full((B,), t, jnp.int32)
        sid = jnp.zeros((B,), jnp.int32)
        g = params["emb_g"][sid][:, None, :]

        def te(c):
            rng, acc = c
            out = vits2.text_encoder_apply(
                params["enc_p"], cfg, x, xl,
                g if cfg.enc_gin_channels else None, flash=True)
            return rng, acc + jnp.sum(out[0][:, :1, :1].astype(jnp.float32))

        def sdp(c):
            rng, acc = c
            rng, sub = jax.random.split(rng)
            h, m_p, logs_p, x_mask = vits2.text_encoder_apply(
                params["enc_p"], cfg, x, xl,
                g if cfg.enc_gin_channels else None, flash=True)
            logw = vits2.sdp_reverse(params["dp"], cfg, h, x_mask, g, rng=sub,
                                     noise_scale=0.8)
            return rng, acc + jnp.sum(logw[:, :1, :].astype(jnp.float32))

        def enc(c):
            rng, acc = c
            rng, sub = jax.random.split(rng)
            e = vits2.encode_for_infer(params, cfg, x, xl, sid, rng=sub)
            return rng, acc + jnp.sum(e["pred_frames"]).astype(jnp.float32)

        c0 = (jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))
        t_te = timeit(f"t{t}: text_encoder", te, c0)
        t_sdp = timeit(f"t{t}: text_enc + sdp_reverse", sdp, c0)
        t_enc = timeit(f"t{t}: whole encode_for_infer", enc, c0)
        print(f"  -> sdp alone ~{(t_sdp-t_te)*1e3:.3f} ms; "
              f"enc overhead beyond te+sdp ~{(t_enc-t_sdp)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
