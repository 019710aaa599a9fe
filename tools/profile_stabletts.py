#!/usr/bin/env python3
"""Device-time profile of the StableTTS (multistream_v3 product path):
text encoder + CFM ODE synthesis + Vocos vocoder, at serving shapes.

Uses utils/profiling.device_timeit (see CLAUDE.md relay-timing gotchas).
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
    ap.add_argument("--text", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "2400")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import stabletts as st
    from vosk_tts_tpu.models import vocoder as voc
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = st.StableTTSConfig()
    params = st.matcha_init(jax.random.PRNGKey(0), cfg)
    vcfg = voc.VocosConfig()
    vparams = voc.vocos_init(jax.random.PRNGKey(1), vcfg)
    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.dtype == "bfloat16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
        params, vparams = cast(params), cast(vparams)

    B, TX, TY = args.batch, args.text, args.frames
    x = jnp.zeros((B, 5, TX), jnp.int32)
    x_lengths = jnp.full((B,), TX, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    bert = jnp.zeros((B, TX, 768), act)

    def dep(out, like):
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
        return (s >= jnp.inf).astype(like.dtype)

    def timeit(name, fn, c0):
        per, _, _ = device_timeit(fn, c0)
        print(f"{name:30s} {per*1e3:9.3f} ms", flush=True)
        return per

    # text encoder (two 4-layer DiT stacks)
    def te_stage(c):
        out = st.text_encoder_apply(params["text_encoder"], cfg, x, x_lengths,
                                    params["spk_emb"][sid], params["dur_spk_emb"][sid],
                                    c)
        return c + dep(out, c)

    timeit("text_encoder (2x4 DiT)", te_stage, bert)

    # one decoder (velocity estimator) call at CFG batch 2B
    spks = params["spk_emb"][sid]
    mu_y = jax.random.normal(jax.random.PRNGKey(2), (B, TY, cfg.hidden_channels), act)
    y_mask = jnp.ones((B, TY, 1), act)
    noise = jax.random.normal(jax.random.PRNGKey(3), (B, TY, cfg.n_feats), act)

    def est_stage(c):
        out = st._estimate_cfg(params, cfg, c, y_mask, mu_y, jnp.full((B,), 0.5, act), spks, 0.5)
        return c + 1e-6 * out

    timeit("estimator step (CFG 2B)", est_stage, noise)

    # full ODE solve
    def ode_stage(c):
        out = st.cfm_solve(params, cfg, mu_y, y_mask, rng=jax.random.PRNGKey(4),
                           n_timesteps=args.steps, spks=spks, guidance_scale=0.5, z=c)
        return c + 1e-6 * out

    timeit(f"cfm_solve ({args.steps} steps)", ode_stage, noise)

    # whole synthesise
    def synth_stage(c):
        out = st.synthesise(params, cfg, x, x_lengths, sid, c, rng=jax.random.PRNGKey(5),
                            max_frames=TY, n_timesteps=args.steps)
        return c + dep(out["mel"], c)

    t_syn = timeit("synthesise (whole)", synth_stage, bert)

    # vocos vocoder on mel
    mel = jax.random.normal(jax.random.PRNGKey(6), (B, TY, 80), act)

    def voc_stage(c):
        wav = voc.vocos_apply(vparams, vcfg, c)
        return c + dep(wav, c)

    t_voc = timeit("vocos vocoder", voc_stage, mel)

    audio_s = B * TY * 256 / 22050
    print(f"multistream_v3 throughput (synth+vocoder): {audio_s/(t_syn+t_voc):.0f} audio-s/s")


if __name__ == "__main__":
    main()
