"""Tracing/profiling utilities.

The reference has only ad-hoc RTF prints (vosk_tts/synth.py:122-139,
gpt-sovits/inference_cli.py stage timers). Here:

  * ``trace(dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable XPlane trace of the device timeline;
  * ``StageTimer`` — named wall-clock stages with audio-seconds/sec and
    RTF accounting;
  * ``device_stats()`` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

log = logging.getLogger("vosk_tts_tpu.profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


class StageTimer:
    """Accumulates wall-clock per named stage; reports RTF-style summaries."""

    def __init__(self, sample_rate: int = 22050):
        self.sample_rate = sample_rate
        self.stages: dict[str, float] = {}
        self.samples = 0

    @contextlib.contextmanager
    def stage(self, name: str, *, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def add_audio(self, n_samples: int):
        self.samples += n_samples

    def report(self) -> dict:
        total = sum(self.stages.values())
        audio_sec = self.samples / self.sample_rate
        out = {
            "stages_sec": dict(self.stages),
            "total_sec": total,
            "audio_sec": audio_sec,
            "rtf": total / audio_sec if audio_sec else None,
            "audio_sec_per_sec": audio_sec / total if total else None,
        }
        log.info("profile: %s", out)
        return out


def device_timeit(fn, carry0, *, n1: int = 4, n2: int = 20, reps: int = 5):
    """Per-iteration device time of ``fn`` (carry -> carry), measured honestly
    through the remote-TPU tunnel.

    The axon relay adds ~25 ms of fixed dispatch+sync overhead per program
    call and transfers ~50-100 MB/s on output fetch, so host-side timing
    loops and whole-array fetches both swamp real device time (a 4096^3
    bf16 matmul is 0.7 ms on-device but ~160 ms if you fetch its output).
    Method here:
      * iterate ``fn`` N times INSIDE one jitted ``lax.scan`` (carry keeps a
        data dependence so no iteration is dead);
      * reduce the final carry to ONE scalar on device; only that crosses
        the tunnel;
      * run at two iteration counts n1 < n2 and take the slope
        (t2 - t1)/(n2 - n1), median over ``reps``, cancelling the fixed
        dispatch cost.

    Returns (seconds_per_iteration, t_n1_median, t_n2_median).
    """
    import statistics

    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(c):
            def body(c, _):
                return fn(c), ()

            y, _ = jax.lax.scan(body, c, None, length=n)
            leaves = jax.tree_util.tree_leaves(y)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return run

    r1, r2 = make(n1), make(n2)
    float(r1(carry0))
    float(r2(carry0))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(carry0))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(r2(carry0))
        t2s.append(time.perf_counter() - t0)
    t1, t2 = statistics.median(t1s), statistics.median(t2s)
    return (t2 - t1) / (n2 - n1), t1, t2


def device_stats() -> list[dict]:
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out.append({"device": str(d), "bytes_in_use": s.get("bytes_in_use"),
                        "peak_bytes_in_use": s.get("peak_bytes_in_use")})
        except Exception:
            out.append({"device": str(d)})
    return out
