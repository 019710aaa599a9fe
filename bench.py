#!/usr/bin/env python3
"""Benchmark: batched MB-iSTFT-VITS2 synthesis throughput on one chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N,
   "unit": "audio-s/s", "vs_baseline": R}

Method: the flagship inference graph (shipped mb_istft_vits2_multi
architecture) is jitted at a fixed shape class (batch x text-bucket x
frame-capacity); throughput counts the full synthesized capacity
(frames x 256 samples @ 22.05 kHz), which is what the graph actually
computes regardless of predicted durations.

Timing: the axon relay adds ~25 ms fixed dispatch+sync overhead per program
call and fetches outputs at ~50-100 MB/s, either of which swamps the real
device time. So iterations run INSIDE one compiled program (lax.scan with an
rng-carry data dependence), only a scalar crosses the tunnel, and the
per-iteration time is the slope between two iteration counts (median of
several runs) — see utils/profiling.device_timeit.

Baseline: the same architecture, same shapes, run by the REFERENCE torch
implementation on CPU (the reference's own deployment path is CPU/CUDA ONNX;
torch-CPU eager is the comparable host path available here). The baseline is
measured once and cached in .bench_baseline.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BATCH = 16
TEXT_LEN = 256
MAX_FRAMES = 2048
SAMPLE_RATE = 22050
HOP = 256
DTYPE = "bfloat16"  # serving precision; correctness is gated at fp32 in tests
BASELINE_CACHE = os.path.join(ROOT, ".bench_baseline.json")


def bench_jax():
    import jax
    import jax.numpy as jnp

    from vosk_tts_tpu.models import vits2

    cfg = vits2.VITS2Config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    if DTYPE == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )

    from vosk_tts_tpu.utils.profiling import device_timeit

    x = jnp.zeros((BATCH, TEXT_LEN), jnp.int32)
    x_lengths = jnp.full((BATCH,), TEXT_LEN, jnp.int32)
    sid = jnp.zeros((BATCH,), jnp.int32)

    def step(carry):
        rng, acc = carry
        rng, sub = jax.random.split(rng)
        out = vits2.infer(params, cfg, x, x_lengths, sid, rng=sub, max_frames=MAX_FRAMES)
        return rng, acc + jnp.sum(out["wav"][:, :1, 0].astype(jnp.float32))

    carry0 = (jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))
    elapsed, _, _ = device_timeit(step, carry0, n1=4, n2=16, reps=5)

    # capacity = what the static-shape graph actually computes every call;
    # true duration = the audio a caller would keep (predicted wav_lengths,
    # clipped to the frame bucket) — report both (a bucketed server bills
    # capacity, an offline user experiences true duration).
    out = jax.jit(
        lambda r: vits2.infer(params, cfg, x, x_lengths, sid, rng=r,
                              max_frames=MAX_FRAMES)["wav_lengths"]
    )(jax.random.PRNGKey(2))
    import numpy as np

    true_samples = float(np.minimum(np.asarray(out), MAX_FRAMES * HOP).sum())
    capacity_seconds = BATCH * MAX_FRAMES * HOP / SAMPLE_RATE
    true_seconds = true_samples / SAMPLE_RATE

    # batch=1 latency / RTF (BASELINE metrics: p50 latency, RTF@batch=1).
    # device_timeit's slope removes dispatch overhead, so this is the p50
    # device latency of one utterance-synthesis step at the same bucket.
    x1, xl1, sid1 = x[:1], x_lengths[:1], sid[:1]

    def step1(carry):
        rng, acc = carry
        rng, sub = jax.random.split(rng)
        out = vits2.infer(params, cfg, x1, xl1, sid1, rng=sub, max_frames=MAX_FRAMES)
        return rng, acc + jnp.sum(out["wav"][:, :1, 0].astype(jnp.float32))

    lat1, _, _ = device_timeit(step1, (jax.random.PRNGKey(3), jnp.zeros((), jnp.float32)),
                               n1=4, n2=16, reps=5)
    rtf1 = lat1 / (MAX_FRAMES * HOP / SAMPLE_RATE)
    return capacity_seconds / elapsed, true_seconds / elapsed, elapsed, lat1, rtf1


def bench_torch_cpu_baseline():
    """Reference torch implementation, CPU, same architecture and shapes."""
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
        x = torch.zeros((BATCH, TEXT_LEN), dtype=torch.long)
        xl = torch.full((BATCH,), TEXT_LEN, dtype=torch.long)
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
            "metric": "audio_seconds_per_second_per_chip",
            "value": 0.0,
            "unit": "audio-s/s",
            "vs_baseline": 0.0,
            "error": "bench timed out (device or tunnel unresponsive)",
        }))
        os._exit(1)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "1200")))

    ours, true_rate, elapsed, lat1, rtf1 = bench_jax()
    baseline = bench_torch_cpu_baseline()
    vs = round(ours / baseline, 2) if baseline else 0.0
    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(ours, 1),
        "unit": "audio-s/s",
        "vs_baseline": vs,
        "true_duration_audio_s_per_s": round(true_rate, 1),
        "step_ms": round(elapsed * 1e3, 2),
        "p50_latency_ms_batch1": round(lat1 * 1e3, 2),
        "rtf_batch1": round(rtf1, 5),
        "config": f"mb-istft-vits2 batch={BATCH} text={TEXT_LEN} frames={MAX_FRAMES} {DTYPE}",
    }))


if __name__ == "__main__":
    main()
