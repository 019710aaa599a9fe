"""Synthesis evaluation drivers.

  * ``batch_synthesize`` — synthesize a text list across speakers to wavs
    (extra/build-examples.sh + eval.py:48-90 equivalent);
  * ``eval_rtf`` — RTF / audio-seconds-per-second over a corpus
    (training/vits2/eval.py:140-144 xRT);
  * ``speaker_similarity`` — cosine similarity of speaker embeddings between
    generated and reference audio (extra/tts-test/ru/eval_similarity.py
    protocol). The embedder is pluggable; the default is the committed
    GE2E-trained LSTM d-vector artifact (eval/speaker_train.py — the same
    architecture + loss family as Resemblyzer, vc/eval-score.py:25, which
    cannot be downloaded here), falling back to the training-free MFCC+F0
    statistics signature (eval/speaker_embed.py) when the artifact is
    absent; both are held-out-voice regression tested
    (tests/test_speaker_embedder.py, tests/test_pipelines_eval.py).
  * ``transcribe_wer`` — ASR round-trip WER protocol (eval.py:106-146);
    requires an ASR callable (e.g. a sherpa/whisper wrapper) to be injected.
  * ``eval_utmos`` — UTMOS MOS-prediction protocol
    (extra/tts-test/ru/eval_utmos.py:8-18); scorer injectable (the utmos
    checkpoint cannot be downloaded here).
  * ``frechet_audio_distance`` — FAD between embedding sets
    (extra/tts-test/ru/eval_fad.py points at fadtk; implemented natively
    here with a pluggable embedder, default MFCC+F0 statistics).
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
    """Default speaker embedder: the committed GE2E-trained LSTM d-vector
    artifact (eval/speaker_train.py — same architecture + loss family as the
    reference's Resemblyzer gate, trained on the in-repo synthetic corpus so
    similarity regressions are detectable across rounds). Falls back to the
    training-free MFCC+F0 statistics (eval/speaker_embed.py) if the artifact
    is absent. Inject a real d-vector/ECAPA model for numbers comparable to
    the published Resemblyzer 0.880 (vc/README.md:24)."""
    try:
        from .speaker_train import lstm_embedder

        return lstm_embedder()
    except (FileNotFoundError, OSError, KeyError):
        from .speaker_embed import mfcc_f0_embedding

        return mfcc_f0_embedding


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


def eval_utmos(wav_paths, scorer) -> EvalResult:
    """UTMOS protocol (extra/tts-test/ru/eval_utmos.py:8-18): score every
    file, report mean and min. ``scorer(path) -> float`` must be injected —
    the utmos checkpoint auto-download of the reference script has no
    network path in this environment."""
    scores = [float(scorer(p)) for p in wav_paths]
    return EvalResult("utmos_mean", float(np.mean(scores)),
                      {"min": float(np.min(scores)), "n": len(scores)})


def frechet_audio_distance(ref_wavs, gen_wavs, sample_rate=22050,
                           embedder=None) -> EvalResult:
    """FAD (eval_fad.py / fadtk protocol): Frechet distance between Gaussian
    fits of per-utterance embeddings of a reference set and a generated set.

    fadtk's encodec embeddings are not downloadable here; the embedder is
    pluggable (``embedder(wav, sr) -> vec``) with the MFCC+F0 signature as
    default. FAD = |mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^1/2).
    """
    embedder = embedder or _default_embedder()
    e_ref = np.stack([embedder(np.asarray(w, np.float32), sample_rate) for w in ref_wavs])
    e_gen = np.stack([embedder(np.asarray(w, np.float32), sample_rate) for w in gen_wavs])
    mu1, mu2 = e_ref.mean(0), e_gen.mean(0)
    s1 = np.cov(e_ref, rowvar=False)
    s2 = np.cov(e_gen, rowvar=False)
    covmean = _sqrtm_psd(s1 @ s2)
    fad = float(np.sum((mu1 - mu2) ** 2) + np.trace(s1 + s2 - 2.0 * covmean))
    return EvalResult("fad", max(fad, 0.0), {"n_ref": len(ref_wavs), "n_gen": len(gen_wavs)})


def _sqrtm_psd(m, eps=1e-10):
    """Matrix square root of (a symmetrized view of) a PSD-ish product via
    eigendecomposition — scipy-free, exact for the symmetric case and the
    standard stable approximation used for the FAD cross term."""
    sym = (m + m.T) / 2.0
    vals, vecs = np.linalg.eigh(sym)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals + eps)) @ vecs.T


def _edit_distance(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]
