"""QuickVC training data pipeline (vc/data_utils.py equivalent).

Per utterance: precomputed ContentVec features (``.cv.npy``, written by
tools/vc_encode_dataset.py), a cached linear spectrogram (``.spec.npy``,
computed here with ops/stft at the reference's center=False semantics), the
normalized waveform, and mel for the speaker encoder.

Collate applies the reference's random windowing to a fixed
``max_speclen``-frame segment (vc/data_utils.py:137-149) so every batch is a
single static shape class.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..ops.stft import mel_spectrogram, spectrogram
from .data import load_wav


@dataclass
class VCDataConfig:
    file_list: str = ""  # one wav path per line (dataset/train.txt)
    sampling_rate: int = 16000
    filter_length: int = 1280
    hop_length: int = 320
    win_length: int = 1280
    n_mel_channels: int = 80
    max_wav_value: float = 32768.0
    max_speclen: int = 512


class VCDataset:
    def __init__(self, cfg: VCDataConfig):
        self.cfg = cfg
        with open(cfg.file_list, encoding="utf-8") as f:
            self.paths = [line.split("|")[0].strip() for line in f if line.strip()]
        self.lengths = []
        for p in self.paths:
            try:
                self.lengths.append(os.path.getsize(p) // (2 * cfg.hop_length))
            except OSError:
                self.lengths.append(0)

    def __len__(self):
        return len(self.paths)

    def example(self, idx: int):
        cfg = self.cfg
        path = self.paths[idx]
        wav, sr = load_wav(path)
        if sr != cfg.sampling_rate:
            raise ValueError(f"{path}: {sr} != {cfg.sampling_rate}")
        audio = wav / cfg.max_wav_value

        spec_cache = path[:-4] + ".spec.npy"
        if os.path.exists(spec_cache):
            spec = np.load(spec_cache)
        else:
            spec = np.asarray(
                spectrogram(audio[None, :], cfg.filter_length, cfg.hop_length, cfg.win_length)
            )[0]
            try:
                np.save(spec_cache, spec)
            except OSError:
                pass

        c = np.load(path[:-4] + ".cv.npy")  # (Tc, 768) contentvec frames (50 Hz)
        # contentvec is 50 Hz vs spec hop 320@16k = 50 Hz: frame-aligned; crop
        n = min(len(spec), len(c))
        mel = np.asarray(
            mel_spectrogram(audio[None, :], cfg.filter_length, cfg.n_mel_channels,
                            cfg.sampling_rate, cfg.hop_length, cfg.win_length, 0.0, None)
        )[0]
        return c[:n], spec[:n], mel[:n], audio[: n * cfg.hop_length]

    def collate(self, idxs, rng: np.random.Generator):
        """Random fixed-window batch (the reference's rand_spec_segments)."""
        cfg = self.cfg
        examples = [self.example(i) for i in idxs]
        seg = min(cfg.max_speclen, min(e[1].shape[0] for e in examples) - 1)
        b = len(examples)
        out = {
            "c": np.zeros((b, seg, examples[0][0].shape[1]), np.float32),
            "spec": np.zeros((b, seg, examples[0][1].shape[1]), np.float32),
            "mel": np.zeros((b, seg, cfg.n_mel_channels), np.float32),
            "wav": np.zeros((b, seg * cfg.hop_length), np.float32),
            "sid": np.zeros((b,), np.int32),
        }
        for i, (c, spec, mel, audio) in enumerate(examples):
            start = int(rng.integers(0, max(spec.shape[0] - seg, 1)))
            out["c"][i] = c[start : start + seg]
            out["spec"][i] = spec[start : start + seg]
            out["mel"][i] = mel[start : start + seg]
            out["wav"][i] = audio[start * cfg.hop_length : (start + seg) * cfg.hop_length]
        return out
