#!/usr/bin/env python3
"""Device-time profile of the GPT-SoVITS serving path: AR decode (the
reference's hot loop, t2s_model.py:324-447) single-stream and batched, plus
``sovits_decode`` at cloning shapes.

EOS logits are suppressed in the (random-init) predict head so the decode
while_loop runs to ``max_new`` — per-token time is then total/max_new with
the prefill amortized in (reported separately too).

Relay-safe: device_timeit (in-program scan + scalar fetch + two-point
slope); in-process SIGALRM watchdog. See CLAUDE.md for the relay gotchas.

Usage: python tools/profile_gpt_sovits.py [--max-new 256] [--batch 8]
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
    ap.add_argument("--text", type=int, default=128)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--codes", type=int, default=512)
    ap.add_argument("--tiny", action="store_true", help="tiny configs (CPU smoke)")
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "2400")))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from vosk_tts_tpu.models import gpt_sovits as GS
    from vosk_tts_tpu.utils.profiling import device_timeit

    if args.tiny:
        acfg = GS.ARConfig(embedding_dim=32, hidden_dim=32, num_head=2,
                           num_layers=2, vocab_size=33, phoneme_vocab_size=64,
                           bert_dim=16, eos=32)
    else:
        acfg = GS.ARConfig()
    aparams = GS.ar_init(jax.random.PRNGKey(0), acfg)
    # min_new=max_new forces full-length decodes (random weights EOS
    # immediately; editing the EOS weight column does NOT suppress the
    # logit — it adds -100*sum(h), which can be positive)
    if args.dtype == "bfloat16":
        aparams = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, aparams)

    TX, TP, NEW = args.text, args.prompt, args.max_new
    results = {}

    def timeit(name, fn, c0, n1=2, n2=6, reps=3):
        per, _, _ = device_timeit(fn, c0, n1=n1, n2=n2, reps=reps)
        results[name] = per
        print(f"{name:34s} {per*1e3:9.2f} ms", flush=True)
        return per

    # ---- single-stream AR decode ----
    x1 = jnp.zeros((1, TX), jnp.int32)
    bert1 = jnp.zeros((1, TX, acfg.bert_dim))
    prompts1 = jnp.zeros((1, TP), jnp.int32)

    def ar1(c):
        rng, acc = c
        rng, sub = jax.random.split(rng)
        toks, n = GS.ar_infer(aparams, acfg, x1, bert1, prompts1, rng=sub,
                              max_new=NEW, min_new=NEW, top_k=15, x_len=TX)
        return rng, acc + jnp.sum(toks).astype(jnp.float32) + n.astype(jnp.float32)

    c0 = (jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))
    t1 = timeit(f"ar_infer B=1 ({NEW} tokens)", ar1, c0)
    print(f"  -> {NEW/t1:.0f} tokens/s single-stream "
          f"({t1*1e3/NEW:.3f} ms/token incl. prefill)", flush=True)

    # ---- batched AR decode ----
    B = args.batch
    xb = jnp.zeros((B, TX), jnp.int32)
    xlb = jnp.full((B,), TX, jnp.int32)
    bertb = jnp.zeros((B, TX, acfg.bert_dim))
    promptsb = jnp.zeros((B, TP), jnp.int32)

    def arb(c):
        rng, acc = c
        rng, sub = jax.random.split(rng)
        toks, n = GS.ar_infer_batch(aparams, acfg, xb, xlb, bertb, promptsb,
                                    rng=sub, max_new=NEW, min_new=NEW, top_k=15)
        return rng, acc + jnp.sum(toks).astype(jnp.float32) + jnp.sum(n).astype(jnp.float32)

    tb = timeit(f"ar_infer_batch B={B} ({NEW} tokens)", arb, c0)
    print(f"  -> {B*NEW/tb:.0f} tokens/s aggregate at B={B} "
          f"({tb/t1:.2f}x the B=1 wall-clock for {B}x the work)", flush=True)

    # ---- SoVITS decode at cloning shapes ----
    if args.tiny:
        scfg = GS.SoVITSConfig(spec_channels=65, inter_channels=32,
                               hidden_channels=32, filter_channels=48,
                               n_layers=2, upsample_initial_channel=64,
                               upsample_rates=(4, 4), upsample_kernel_sizes=(16, 16),
                               gin_channels=32, ssl_dim=16, n_codes=32,
                               n_symbols=64, mrte_hidden=32, style_hidden=16)
    else:
        scfg = GS.SoVITSConfig()
    sparams = GS.sovits_init(jax.random.PRNGKey(2), scfg)
    if args.dtype == "bfloat16":
        sparams = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, sparams)
    TC = args.codes
    codes = jnp.zeros((1, TC), jnp.int32)
    text = jnp.zeros((1, TX), jnp.int32)
    tl = jnp.full((1,), TX, jnp.int32)
    refer = jnp.zeros((1, 200, scfg.spec_channels),
                      jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    rl = jnp.full((1,), 200, jnp.int32)

    def dec(c):
        rng, acc = c
        rng, sub = jax.random.split(rng)
        wav = GS.sovits_decode(sparams, scfg, codes, text, tl, refer, rl,
                               rng=sub, code_lengths=jnp.full((1,), TC, jnp.int32))
        return rng, acc + jnp.sum(wav[:, :4].astype(jnp.float32))

    td = timeit(f"sovits_decode B=1 Tc={TC}", dec, c0, n1=4, n2=12)
    upf = GS.upsample_factor(scfg)
    audio_s = TC * upf / 32000
    print(f"  -> {audio_s/td:.0f} audio-s/s decode ({audio_s:.1f}s audio per call)", flush=True)

    # ---- end-to-end utterance estimate ----
    ar_s_per_code = t1 / NEW
    e2e = {"ar_ms_per_token_b1": round(t1 * 1e3 / NEW, 3),
           "ar_tokens_s_b1": round(NEW / t1, 1),
           "ar_tokens_s_b8": round(B * NEW / tb, 1),
           "sovits_decode_audio_s_per_s": round(audio_s / td, 1),
           "e2e_rtf_b1": round((ar_s_per_code + td / TC) / (upf / 32000), 4)}
    print(json.dumps(e2e))


if __name__ == "__main__":
    main()
