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
