"""Synthesis evaluation drivers.

  * ``batch_synthesize`` — synthesize a text list across speakers to wavs
    (extra/build-examples.sh + eval.py:48-90 equivalent);
  * ``eval_rtf`` — RTF / audio-seconds-per-second over a corpus
    (training/vits2/eval.py:140-144 xRT);
  * ``speaker_similarity`` — cosine similarity of speaker embeddings between
    generated and reference audio (extra/tts-test/ru/eval_similarity.py
    protocol). The embedder is pluggable; the built-in fallback uses the
    QuickVC LSTM speaker encoder (vc/eval-score.py used Resemblyzer — same
    idea, different embedder; absolute numbers are not comparable, ranking
    protocol is).
  * ``transcribe_wer`` — ASR round-trip WER protocol (eval.py:106-146);
    requires an ASR callable (e.g. a sherpa/whisper wrapper) to be injected.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class EvalResult:
    metric: str
    value: float
    extra: dict = field(default_factory=dict)


def batch_synthesize(synth, texts, out_dir, speakers=(0, 1, 2, 3, 4), speech_rate=1.0):
    """Synthesize every (speaker, text) pair to out_dir; returns wav paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for sid in speakers:
        for i, text in enumerate(texts):
            path = os.path.join(out_dir, f"spk{sid}_{i:04d}.wav")
            synth.synth(text, path, speaker_id=sid, speech_rate=speech_rate)
            paths.append(path)
    return paths


def eval_rtf(synth, texts, speaker_id=0, warmup=1) -> EvalResult:
    """Mean RTF + throughput over a text list (after jit warmup)."""
    for t in texts[:warmup]:
        synth.synth_audio(t, speaker_id=speaker_id)
    total_audio, total_time = 0.0, 0.0
    for t in texts:
        t0 = time.perf_counter()
        audio = synth.synth_audio(t, speaker_id=speaker_id)
        total_time += time.perf_counter() - t0
        total_audio += len(audio) / synth.model.sample_rate
    rtf = total_time / total_audio if total_audio else float("inf")
    return EvalResult("rtf", rtf, {"audio_sec_per_sec": total_audio / total_time if total_time else 0.0,
                                   "audio_sec": total_audio})


def _default_embedder():
    """Fallback speaker embedder: randomly initialized QuickVC LSTM encoder.
    Deterministic and usable for RANKING comparisons between systems on the
    same data; inject a trained embedder for absolute similarity numbers."""
    import jax
    import jax.numpy as jnp

    from ..models import quickvc as Q
    from ..ops.stft import mel_spectrogram

    params = Q.speaker_encoder_init(jax.random.PRNGKey(0))

    def embed(wav: np.ndarray, sample_rate: int) -> np.ndarray:
        mel = mel_spectrogram(jnp.asarray(wav, jnp.float32)[None, :], 1024, 80,
                              sample_rate, 256, 1024, 0.0, None)
        return np.asarray(Q.embed_utterance(params, mel))[0]

    return embed


def speaker_similarity(pairs, sample_rate=22050, embedder=None) -> EvalResult:
    """pairs: list of (generated_wav, reference_wav) float arrays. Returns
    avg/min cosine similarity (vc/eval-score.py:25-63 protocol)."""
    embedder = embedder or _default_embedder()
    sims = []
    for gen, ref in pairs:
        a = embedder(np.asarray(gen, np.float32), sample_rate)
        b = embedder(np.asarray(ref, np.float32), sample_rate)
        sims.append(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)))
    return EvalResult("speaker_similarity_avg", float(np.mean(sims)),
                      {"min": float(np.min(sims)), "n": len(sims)})


def transcribe_wer(wav_paths, ref_texts, asr) -> EvalResult:
    """ASR round-trip WER. ``asr(path) -> text`` must be provided (sherpa /
    whisper are not available in this environment)."""
    import re

    def norm(t):
        return re.sub(r"[^\w ]", "", t.lower()).split()

    errs, total = 0, 0
    for path, ref in zip(wav_paths, ref_texts):
        hyp = norm(asr(path))
        ref_w = norm(ref)
        errs += _edit_distance(hyp, ref_w)
        total += len(ref_w)
    return EvalResult("wer", errs / max(total, 1), {"words": total})


def _edit_distance(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]
