#!/usr/bin/env python3
"""One bounded on-device GAN train-step measurement (VERDICT r3 weak-6).

Small-but-real shapes: the shipped MB-iSTFT-VITS2 architecture, batch 8,
segment 8192 samples (the reference's training segment,
configs/mb_istft_vits2_multi.json:13), spec length 400 frames (a typical
bucket, data_utils.py length filtering). Reports step-ms and samples/s.

Relay-safe: the whole D->durD->G update is ONE jit (train/vits2_train.py);
timing via device_timeit's in-program scan. fp32 params (training
precision), in-process SIGALRM watchdog.

Usage: python tools/profile_train_step.py [--batch 8] [--frames 400]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=400)  # spec frames
    ap.add_argument("--text", type=int, default=128)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="compute dtype (bfloat16 = the reference's AMP analogue)")
    ap.add_argument("--decompose", action="store_true",
                    help="also measure per-stage fwd/VJP pieces (VERDICT r4 weak-6)")
    ap.add_argument("--decompose-only", action="store_true",
                    help="skip the whole-step timing (its fp32 compile can OOM "
                         "the remote compile helper) and measure only stages")
    args = ap.parse_args()
    if args.decompose_only:
        args.decompose = True

    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "2400")))

    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.train import vits2_train as T

    if args.tiny:
        mcfg = vits2.VITS2Config(
            n_vocab=20, spec_channels=40, segment_size=8, inter_channels=16,
            hidden_channels=16, filter_channels=32, n_heads=2, n_layers=1,
            n_flows=1, posterior_wn_layers=2, sdp_n_flows=1,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_rates=(4,), upsample_kernel_sizes=(8,),
            upsample_initial_channel=32, n_speakers=4, gin_channels=8)
        tcfg = T.TrainConfig(
            filter_length=256, hop_length=mcfg.upsample_factor, win_length=256,
            n_mel_channels=40, fft_sizes=(64, 128, 32), hop_sizes=(8, 16, 4),
            win_lengths=(32, 64, 16), disc_periods=(2, 3), disc_spec_ffts=(64,))
    else:
        mcfg = vits2.VITS2Config()
        tcfg = T.TrainConfig()
    B, TX, TF = args.batch, args.text, args.frames
    hop = tcfg.hop_length

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = T.make_train_step(mcfg, tcfg, compute_dtype=cdt)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, mcfg.n_vocab, size=(B, TX)).astype(np.int32)),
        "x_lengths": jnp.full((B,), TX, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, TF, tcfg.n_mel_channels if args.tiny else mcfg.spec_channels if False else tcfg.n_mel_channels)).astype(np.float32)),
        "mel_lengths": jnp.full((B,), TF, jnp.int32),
        "wav": jnp.asarray((rng.standard_normal((B, TF * hop)) * 0.3).astype(np.float32)),
        "sid": jnp.asarray(rng.integers(0, mcfg.n_speakers, size=(B,)).astype(np.int32)),
    }

    # The scan-wrapped step OOMs the remote compile helper (the GAN step's
    # VJP graph is the largest in the repo), so time by enqueueing N
    # sequential steps and fetching one scalar at the end — the relay's
    # ~25 ms dispatch overhead amortizes across N (CLAUDE.md method #2).
    import time

    per, flops = None, 0.0
    jstep = jax.jit(step)
    if args.decompose_only:
        st = state
    else:
        st, metrics = jstep(state, batch, jax.random.PRNGKey(1))
        float(metrics["loss_gen_all"])  # warm + sync

    def run(n):
        t0 = time.perf_counter()
        s2, r = st, jax.random.PRNGKey(2)
        for _ in range(n):
            r, sub = jax.random.split(r)
            s2, m = jstep(s2, batch, sub)
        float(m["loss_gen_all"])  # one fetch syncs the chain
        return time.perf_counter() - t0

    samples = B * TF * hop
    import statistics

    out = {"config": f"mb-istft-vits2 B={B} TX={TX} TF={TF} {args.dtype}"}
    if not args.decompose_only:
        run(2)
        n1, n2 = 2, 8
        t1 = statistics.median(run(n1) for _ in range(3))
        t2 = statistics.median(run(n2) for _ in range(3))
        per = (t2 - t1) / (n2 - n1)
        print(f"GAN train step (B={B}, spec {TF}f, seg {mcfg.segment_size * hop} "
              f"samples, {args.dtype}): {per*1e3:.1f} ms", flush=True)

        # XLA's own FLOP count for the whole step -> model FLOP utilization
        try:
            ca = jstep.lower(state, batch, jax.random.PRNGKey(1)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0
        mfu = flops / per / 186e12 if flops else 0.0
        out.update({
            "train_step_ms": round(per * 1e3, 2),
            "samples_per_s": round(samples / per, 0),
            "audio_s_per_s_train": round(samples / 22050 / per, 1),
            "step_tflop": round(flops / 1e12, 3),
            "mfu_vs_bf16_anchor": round(mfu, 3),
        })

    if args.decompose:
        # Per-stage fwd / fwd+VJP device times. Each stage fn maps a scalar
        # carry to a scalar with a REAL data dependence through the whole
        # computation (perturb one input by s*1e-30, reduce the output) —
        # through the axon relay, independent repeated calls do NOT time
        # honestly; only a chained sequence does (CLAUDE.md).
        import time

        from vosk_tts_tpu.models import vits2 as V

        def timed(stage_fn, reps=3, n1=2, n2=6):
            jfn = jax.jit(stage_fn)
            float(jfn(jnp.zeros(())))

            def go(n):
                t0 = time.perf_counter()
                s2 = jnp.zeros(())
                for _ in range(n):
                    s2 = jfn(s2)
                float(s2)
                return time.perf_counter() - t0

            go(1)
            a = statistics.median(go(n1) for _ in range(reps))
            b = statistics.median(go(n2) for _ in range(reps))
            return (b - a) / (n2 - n1)

        pg = state["params_g"]

        def _fwd(p):
            o = V.forward_train(p, mcfg, batch["x"], batch["x_lengths"],
                                batch["mel"], batch["mel_lengths"], batch["sid"],
                                rng=jax.random.PRNGKey(3))
            o.pop("ids_slice")
            return o  # EVERY output — returning only wav lets XLA prune
                      # the MAS/SDP/flow branches that don't feed it

        def _perturb(p, s):
            q = dict(p)
            q["emb_g"] = p["emb_g"] + (s * 1e-30).astype(p["emb_g"].dtype)
            return q

        def g_fwd_stage(s):
            o = _fwd(_perturb(pg, s))
            # reduce over ALL outputs — sliced/partial reductions let XLA
            # dead-code-eliminate whole branches
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(o))
            return tot * 1e-20 + s * 0.5

        t_gf = timed(g_fwd_stage)

        def g_fwd_bwd_stage(s):
            o, vjp = jax.vjp(_fwd, _perturb(pg, s))
            (g,) = vjp(jax.tree_util.tree_map(jnp.ones_like, o))
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(g))
            return tot * 1e-20 + s * 0.5

        t_gfb = timed(g_fwd_bwd_stage)

        y_hat = jnp.asarray(rng.standard_normal((B, mcfg.segment_size * hop)).astype(np.float32)) * 0.1
        y_real = jnp.asarray(rng.standard_normal((B, mcfg.segment_size * hop)).astype(np.float32)) * 0.1

        from vosk_tts_tpu.models import discriminators as DD
        from vosk_tts_tpu.train import losses as LL

        def d_stage(s):
            def f(p):
                yr, yg, _, _ = DD.mpmsd_apply(p, y_real, y_hat + (s * 1e-30),
                                              periods=tuple(tcfg.disc_periods),
                                              spec_ffts=tuple(tcfg.disc_spec_ffts))
                l, _, _ = LL.discriminator_loss(yr, yg)
                return l + LL.discriminator_tprls_loss(yr, yg)

            g = jax.grad(f)(state["params_d"])
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(g))
            return tot * 1e-20 + s * 0.5

        t_dfb = timed(d_stage)

        out["decompose_ms"] = {
            "g_forward": round(t_gf * 1e3, 2),
            "g_forward_plus_vjp": round(t_gfb * 1e3, 2),
            "d_step_fwd_bwd": round(t_dfb * 1e3, 2),
        }
        print(f"G fwd {t_gf*1e3:.1f} ms; G fwd+VJP {t_gfb*1e3:.1f} ms; "
              f"D fwd+bwd {t_dfb*1e3:.1f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
