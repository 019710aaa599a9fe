#!/usr/bin/env python3
"""Benchmark: MB-iSTFT-VITS2 synthesis throughput on one chip.

Prints ONE JSON line. The primary ``value`` is TRUE-DURATION throughput
(audio seconds a caller actually keeps, per second of device time) over a
realistic mixed-length serving workload using the duration-adaptive two-pass
path (api.predict_frames -> smallest sufficient frame bucket -> decode).
Worst-case-bucket capacity (what the static graph computes regardless of
durations) is reported as a secondary metric.

Method: every graph is jitted at a fixed shape class; timing runs INSIDE one
compiled program (lax.scan with an rng-carry data dependence), only a scalar
crosses the tunnel, and the per-iteration time is the slope between two
iteration counts (median of several runs) — see utils/profiling.device_timeit.
The axon relay's ~25 ms fixed dispatch cost per call and ~50-100 MB/s output
fetch are excluded by construction (they are tunnel artifacts, not device
time; a production host dispatches locally).

Baseline: the same architecture run by the REFERENCE torch implementation on
CPU (the reference's own deployment path is CPU/CUDA ONNX; torch-CPU eager is
the comparable host path available here), counting its ACTUAL dynamic output
frames — i.e. a true-duration rate, same units as our primary value. Measured
once and cached in .bench_baseline.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BATCH = 16
SAMPLE_RATE = 22050
HOP = 256
DTYPE = "bfloat16"  # serving precision; correctness is gated at fp32 in tests
BASELINE_CACHE = os.path.join(ROOT, ".bench_baseline.json")

# capacity config (same as BENCH_r01/r02 for round-over-round comparability)
CAP_TEXT, CAP_FRAMES = 256, 2048
# realistic mixed-length serving workload: (text_bucket, real token count).
# ~56 tokens is a short sentence, ~250 a long compound one (the reference
# caps text at 350 chars, data_utils.py:39).
WORKLOAD = ((64, 56), (128, 120), (256, 250))


def _params(vits2, jax, jnp):
    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    if DTYPE == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
    return cfg, params


def bench_jax():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vosk_tts_tpu import api
    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg, params = _params(vits2, jax, jnp)

    def inputs(batch, text_bucket, n_real):
        x = jnp.zeros((batch, text_bucket), jnp.int32)
        xl = jnp.full((batch,), n_real, jnp.int32)
        sid = jnp.zeros((batch,), jnp.int32)
        return x, xl, sid

    def decode_step(x, xl, sid, max_frames):
        def step(carry):
            rng, acc = carry
            rng, sub = jax.random.split(rng)
            out = vits2.infer(params, cfg, x, xl, sid, rng=sub, max_frames=max_frames)
            return rng, acc + jnp.sum(out["wav"][:, :1, 0].astype(jnp.float32))

        return step

    def encode_step(x, xl, sid):
        """Pass one of the split serving path (encoder + SDP)."""
        def step(carry):
            rng, acc = carry
            rng, sub = jax.random.split(rng)
            enc = vits2.encode_for_infer(params, cfg, x, xl, sid, rng=sub)
            return rng, acc + jnp.sum(enc["pred_frames"]).astype(jnp.float32)

        return step

    def split_decode_step(enc, sid, max_frames, gen_frames=None):
        """Pass two from fixed pass-one outputs (rng varies the z noise)."""
        def step(carry):
            rng, acc = carry
            rng, sub = jax.random.split(rng)
            out = vits2.decode_from_durations(params, cfg, enc, sid, rng=sub,
                                              max_frames=max_frames,
                                              gen_frames=gen_frames)
            return rng, acc + jnp.sum(out["wav"][:, :1, 0].astype(jnp.float32))

        return step

    carry0 = (jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))

    # ---- secondary: worst-case-bucket capacity (r01/r02-comparable) ------
    xc, xlc, sidc = inputs(BATCH, CAP_TEXT, CAP_TEXT)
    cap_elapsed, _, _ = device_timeit(decode_step(xc, xlc, sidc, CAP_FRAMES),
                                      carry0, n1=4, n2=16, reps=5)
    capacity_rate = (BATCH * CAP_FRAMES * HOP / SAMPLE_RATE) / cap_elapsed

    # ---- primary: adaptive SPLIT two-pass serving over the mixed workload --
    # pass one (encoder+SDP) runs once per batch; its outputs feed the decode
    # graph directly (vits2.decode_from_durations), so the encoder is never
    # recomputed (VERDICT r3 weak-5).
    total_audio_s, total_time_s = 0.0, 0.0
    per_class = {}
    enc_jit = jax.jit(lambda x, xl, sid, r: vits2.encode_for_infer(
        params, cfg, x, xl, sid, rng=r))
    for text_bucket, n_real in WORKLOAD:
        x, xl, sid = inputs(BATCH, text_bucket, n_real)
        enc = enc_jit(x, xl, sid, jax.random.PRNGKey(2))
        pred = np.asarray(enc["pred_frames"])
        fb = api.pick_frame_bucket(int(pred.max()), text_bucket)
        gen = api.pick_gen_frames(int(pred.max()), fb)
        t_enc, _, _ = device_timeit(encode_step(x, xl, sid), carry0, n1=4, n2=16, reps=3)
        t_decode, _, _ = device_timeit(split_decode_step(enc, sid, fb, gen), carry0,
                                       n1=4, n2=16, reps=3)
        audio_s = float(np.minimum(pred, fb).sum()) * HOP / SAMPLE_RATE
        total_audio_s += audio_s
        total_time_s += t_enc + t_decode
        per_class[f"t{text_bucket}"] = {
            "frame_bucket": fb, "gen_frames": gen, "frames_ms": round(t_enc * 1e3, 2),
            "decode_ms": round(t_decode * 1e3, 2), "audio_s": round(audio_s, 1),
        }
    true_rate = total_audio_s / total_time_s

    # ---- batch-1 p50 latency + RTF for a SHORT utterance (adaptive) ------
    x1, xl1, sid1 = inputs(1, WORKLOAD[0][0], WORKLOAD[0][1])
    enc1 = enc_jit(x1, xl1, sid1, jax.random.PRNGKey(3))
    pred1 = int(np.asarray(enc1["pred_frames"])[0])
    fb1 = api.pick_frame_bucket(pred1, WORKLOAD[0][0])
    gen1 = api.pick_gen_frames(pred1, fb1)
    tf1, _, _ = device_timeit(encode_step(x1, xl1, sid1), carry0, n1=4, n2=16, reps=5)
    td1, _, _ = device_timeit(split_decode_step(enc1, sid1, fb1, gen1), carry0, n1=4, n2=16, reps=5)
    lat1 = tf1 + td1
    audio1 = min(pred1, fb1) * HOP / SAMPLE_RATE
    rtf1 = lat1 / audio1

    return {
        "true_rate": true_rate,
        "capacity_rate": capacity_rate,
        "cap_step_ms": cap_elapsed * 1e3,
        "lat1_ms": lat1 * 1e3,
        "rtf1": rtf1,
        "short_frame_bucket": fb1,
        "per_class": per_class,
    }


def bench_stabletts():
    """StableTTS/multistream_v3 secondary metrics (VERDICT r4 missing-4):
    capacity at the fixed B16/2048-frame/10-step shape (comparable to
    SPEED_OF_LIGHT §7) and TRUE-duration throughput through the round-5
    duration-adaptive split path on a mixed workload."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vosk_tts_tpu import api
    from vosk_tts_tpu.models import stabletts as st
    from vosk_tts_tpu.models import vocoder as voc
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = st.StableTTSConfig()
    params = st.matcha_init(jax.random.PRNGKey(0), cfg)
    vcfg = voc.VocosConfig()
    vparams = voc.vocos_init(jax.random.PRNGKey(1), vcfg)
    if DTYPE == "bfloat16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
        params, vparams = cast(params), cast(vparams)
    act = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    N_STEPS = 10

    def inputs(batch, tx, n_real):
        x = jnp.zeros((batch, 5, tx), jnp.int32)
        xl = jnp.full((batch,), n_real, jnp.int32)
        sid = jnp.zeros((batch,), jnp.int32)
        bert = jnp.zeros((batch, tx, 768), act)
        return x, xl, sid, bert

    carry0 = (jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))

    # ---- capacity: fused synthesise + vocos at B16 / 2048 frames ----
    xc, xlc, sidc, bertc = inputs(BATCH, CAP_TEXT, CAP_TEXT)

    def cap_step(carry):
        rng, acc = carry
        rng, sub = jax.random.split(rng)
        out = st.synthesise(params, cfg, xc, xlc, sidc, bertc, rng=sub,
                            max_frames=CAP_FRAMES, n_timesteps=N_STEPS)
        wav = voc.vocos_apply(vparams, vcfg, out["mel"])
        return rng, acc + jnp.sum(wav[:, :4].astype(jnp.float32))

    t_cap, _, _ = device_timeit(cap_step, carry0, n1=2, n2=5, reps=3)
    cap_rate = (BATCH * CAP_FRAMES * HOP / SAMPLE_RATE) / t_cap

    # ---- true-duration: adaptive split over the mixed workload ----
    enc_jit = jax.jit(lambda x, xl, sid, bert: st.encode_for_synth(
        params, cfg, x, xl, sid, bert))
    total_audio, total_time = 0.0, 0.0
    for tx, n_real in WORKLOAD:
        x, xl, sid, bert = inputs(BATCH, tx, n_real)
        enc = enc_jit(x, xl, sid, bert)
        pred = np.asarray(enc["pred_frames"])
        fb = api.pick_ms_frame_bucket(int(pred.max()), tx)

        def enc_step(c):
            # carry IS the bert input (encode has no rng): the output-derived
            # +0 keeps a data dependence so the scan can't hoist the
            # loop-invariant encode out of the body
            e = st.encode_for_synth(params, cfg, x, xl, sid, c)
            s = jnp.sum(e["pred_frames"]).astype(jnp.float32)
            return c + (s >= jnp.inf).astype(c.dtype)

        def dec_step(carry):
            rng, acc = carry
            rng, sub = jax.random.split(rng)
            out = st.decode_from_durations(params, cfg, enc, sid, rng=sub,
                                           max_frames=fb, n_timesteps=N_STEPS)
            wav = voc.vocos_apply(vparams, vcfg, out["mel"])
            return rng, acc + jnp.sum(wav[:, :4].astype(jnp.float32))

        t_enc, _, _ = device_timeit(enc_step, bert, n1=2, n2=6, reps=3)
        t_dec, _, _ = device_timeit(dec_step, carry0, n1=2, n2=5, reps=3)
        total_audio += float(np.minimum(pred, fb).sum()) * HOP / SAMPLE_RATE
        total_time += t_enc + t_dec
    return {"stabletts_audio_s_per_s": round(cap_rate, 1),
            "stabletts_true_audio_s_per_s": round(total_audio / total_time, 1),
            "stabletts_capacity_step_ms": round(t_cap * 1e3, 2)}


def bench_gpt_sovits():
    """GPT-SoVITS secondary metrics (VERDICT r4 missing-4): AR decode
    tokens/s at B=1 and B=8 (text 128 + prompt 64, 256 new tokens, EOS
    suppressed so the loop runs to max_new) and sovits_decode audio-s/s at
    cloning shapes (Tc=512)."""
    import jax
    import jax.numpy as jnp

    from vosk_tts_tpu.models import gpt_sovits as GS
    from vosk_tts_tpu.utils.profiling import device_timeit

    acfg = GS.ARConfig()
    aparams = GS.ar_init(jax.random.PRNGKey(0), acfg)
    scfg = GS.SoVITSConfig()
    sparams = GS.sovits_init(jax.random.PRNGKey(2), scfg)
    if DTYPE == "bfloat16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
        aparams, sparams = cast(aparams), cast(sparams)
    act = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32

    TX, TP, NEW, B, TC = 128, 64, 256, 8, 512
    c0 = (jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))

    x1 = jnp.zeros((1, TX), jnp.int32)
    bert1 = jnp.zeros((1, TX, acfg.bert_dim), act)
    prompts1 = jnp.zeros((1, TP), jnp.int32)

    def ar1(c):
        rng, acc = c
        rng, sub = jax.random.split(rng)
        # min_new=NEW: the loop must run full length for an honest
        # tokens/s (random-init models EOS immediately otherwise)
        toks, n = GS.ar_infer(aparams, acfg, x1, bert1, prompts1, rng=sub,
                              max_new=NEW, min_new=NEW, top_k=15, x_len=TX)
        return rng, acc + jnp.sum(toks).astype(jnp.float32) + n.astype(jnp.float32)

    t1, _, _ = device_timeit(ar1, c0, n1=2, n2=6, reps=3)

    xb = jnp.zeros((B, TX), jnp.int32)
    xlb = jnp.full((B,), TX, jnp.int32)
    bertb = jnp.zeros((B, TX, acfg.bert_dim), act)
    promptsb = jnp.zeros((B, TP), jnp.int32)

    def arb(c):
        rng, acc = c
        rng, sub = jax.random.split(rng)
        toks, n = GS.ar_infer_batch(aparams, acfg, xb, xlb, bertb, promptsb,
                                    rng=sub, max_new=NEW, min_new=NEW, top_k=15)
        return rng, acc + jnp.sum(toks).astype(jnp.float32) + jnp.sum(n).astype(jnp.float32)

    tb, _, _ = device_timeit(arb, c0, n1=2, n2=6, reps=3)

    codes = jnp.zeros((1, TC), jnp.int32)
    text = jnp.zeros((1, TX), jnp.int32)
    tl = jnp.full((1,), TX, jnp.int32)
    refer = jnp.zeros((1, 200, scfg.spec_channels), act)
    rl = jnp.full((1,), 200, jnp.int32)

    def dec(c):
        rng, acc = c
        rng, sub = jax.random.split(rng)
        wav = GS.sovits_decode(sparams, scfg, codes, text, tl, refer, rl,
                               rng=sub, code_lengths=jnp.full((1,), TC, jnp.int32))
        return rng, acc + jnp.sum(wav[:, :4].astype(jnp.float32))

    td, _, _ = device_timeit(dec, c0, n1=2, n2=6, reps=3)
    audio_s = TC * GS.upsample_factor(scfg) / 32000
    return {"ar_tokens_per_s_b1": round(NEW / t1, 1),
            "ar_tokens_per_s_b8": round(B * NEW / tb, 1),
            "sovits_decode_audio_s_per_s": round(audio_s / td, 1)}


def bench_torch_cpu_baseline():
    """Reference torch implementation, CPU, same architecture; counts its
    actual dynamic output frames (a true-duration rate)."""
    if os.path.exists(BASELINE_CACHE):
        try:
            return json.load(open(BASELINE_CACHE))["audio_s_per_s"]
        except Exception:
            pass
    try:
        sys.path.insert(0, os.path.join(ROOT, "tests"))
        import torch

        import oracle

        models_ref = oracle.vits2("models")
        net = models_ref.SynthesizerTrn(
            62, 80, 32, 192, 192, 768, 2, 6, 3, 0.1, "1", [3, 7, 11],
            [[1, 3, 5]] * 3, [4, 4], 512, [16, 16], 16, 4,
            n_speakers=200, gin_channels=256, use_sdp=True,
            mb_istft_vits=True, subbands=4,
            use_spk_conditioned_encoder=True, use_transformer_flows=True,
            transformer_flow_type="pre_conv2",
        )
        net.eval()
        x = torch.zeros((BATCH, CAP_TEXT), dtype=torch.long)
        xl = torch.full((BATCH,), CAP_TEXT, dtype=torch.long)
        sid = torch.zeros((BATCH,), dtype=torch.long)
        with torch.no_grad():
            net.infer(x, xl, sid, noise_scale=0.0, noise_scale_w=0.0)  # warm
            t0 = time.perf_counter()
            _, _, _, y_mask, _ = net.infer(x, xl, sid, noise_scale=0.667, noise_scale_w=0.8)
            elapsed = time.perf_counter() - t0
        frames = int(y_mask.shape[-1])
        audio_seconds = BATCH * frames * HOP / SAMPLE_RATE
        value = audio_seconds / elapsed
        json.dump({"audio_s_per_s": value}, open(BASELINE_CACHE, "w"))
        return value
    except Exception as e:
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        return None


def main():
    # watchdog: a wedged device/tunnel must not hang the caller forever
    import signal

    def _on_alarm(signum, frame):
        print(json.dumps({
            "metric": "true_duration_audio_s_per_s",
            "value": 0.0,
            "unit": "audio-s/s",
            "vs_baseline": 0.0,
            "error": "bench timed out (device or tunnel unresponsive)",
        }))
        os._exit(1)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "3000")))

    r = bench_jax()
    baseline = bench_torch_cpu_baseline()
    vs = round(r["true_rate"] / baseline, 2) if baseline else 0.0
    out = {
        "metric": "true_duration_audio_s_per_s",
        "value": round(r["true_rate"], 1),
        "unit": "audio-s/s",
        "vs_baseline": vs,
        "capacity_audio_s_per_s": round(r["capacity_rate"], 1),
        "capacity_step_ms": round(r["cap_step_ms"], 2),
        "p50_latency_ms_batch1_short": round(r["lat1_ms"], 2),
        "rtf_batch1": round(r["rtf1"], 5),
        "workload": r["per_class"],
        "config": f"mb-istft-vits2 adaptive-buckets batch={BATCH} {DTYPE}; "
                  f"capacity at text={CAP_TEXT} frames={CAP_FRAMES}",
    }
    # secondary per-family metrics (VERDICT r4 missing-4) — a failure here
    # must not zero the primary metric
    if os.environ.get("BENCH_FAMILIES", "1") != "0":
        for fn in (bench_stabletts, bench_gpt_sovits):
            try:
                out.update(fn())
            except Exception as e:  # noqa: BLE001
                out[f"{fn.__name__}_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
