"""Dynamic request batcher — pod-batched synthesis.

The reference server runs one utterance at a time per thread over a single
ONNX session (server/tts_server.py:37-54). On TPU, throughput comes from
batching: concurrent requests are collected for up to ``max_wait_ms``,
grouped into one padded batch per text-length bucket, and synthesized in a
single jitted call. Each caller gets its own trimmed waveform back.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from ..api import TEXT_BUCKETS, FRAMES_PER_TOKEN, audio_float_to_int16
from ..models import vits2


@dataclass
class _Item:
    ids: list
    sid: int
    speech_rate: float
    noise_level: float
    duration_noise_level: float
    future: Future = field(default_factory=Future)


class BatchSynthesizer:
    """Batches text requests onto the device. Thread-safe submit()."""

    def __init__(self, model, max_batch: int = 8, max_wait_ms: float = 5.0):
        self.model = model
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._cache = {}
        self._rng = jax.random.PRNGKey(0)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, ids, sid=0, speech_rate=1.0, noise_level=0.8, duration_noise_level=0.8) -> Future:
        item = _Item(list(ids), int(sid or 0), speech_rate, noise_level, duration_noise_level)
        self._q.put(item)
        return item.future

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _jit(self, bucket: int, batch: int):
        key = (bucket, batch)
        if key not in self._cache:
            cfg = self.model.model_config
            max_frames = bucket * FRAMES_PER_TOKEN

            @jax.jit
            def run(params, x, x_lengths, sid, rng, noise, inv_rate, dur_noise):
                return vits2.infer(
                    params, cfg, x, x_lengths, sid, rng=rng, max_frames=max_frames,
                    noise_scale=noise, length_scale=inv_rate, noise_scale_w=dur_noise,
                )

            self._cache[key] = run
        return self._cache[key]

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(items) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(items)
            except Exception as e:  # surface errors to every waiter
                for it in items:
                    if not it.future.done():
                        it.future.set_exception(e)

    def _run_batch(self, items):
        longest = max(len(it.ids) for it in items)
        bucket = next((b for b in TEXT_BUCKETS if b >= longest), TEXT_BUCKETS[-1])
        # pad batch size to a small set of classes to bound compilations
        bsz = 1
        while bsz < len(items):
            bsz *= 2
        bsz = min(bsz, self.max_batch)

        x = np.zeros((bsz, bucket), np.int32)
        x_lengths = np.zeros((bsz,), np.int32)
        sid = np.zeros((bsz,), np.int32)
        for i, it in enumerate(items):
            ids = it.ids[:bucket]
            x[i, : len(ids)] = ids
            x_lengths[i] = len(ids)
            sid[i] = it.sid
        x_lengths[len(items) :] = 1

        # scalar knobs are per-batch on device; rate is the first item's
        # (requests with wildly different rates rarely co-batch in practice)
        it0 = items[0]
        run = self._jit(bucket, bsz)
        self._rng, rng = jax.random.split(self._rng)
        out = run(
            self.model.params, jnp.asarray(x), jnp.asarray(x_lengths), jnp.asarray(sid), rng,
            jnp.float32(it0.noise_level), jnp.float32(1.0 / it0.speech_rate), jnp.float32(it0.duration_noise_level),
        )
        wavs = np.asarray(out["wav"])[..., 0]
        lengths = np.asarray(out["wav_lengths"])
        for i, it in enumerate(items):
            it.future.set_result(audio_float_to_int16(wavs[i, : lengths[i]]))
