"""Training data pipeline — host-side numpy, TPU shape discipline.

Replaces training/vits2/data_utils.py (TextAudioSpeakerLoader :177-305,
DistributedBucketSampler :361-467):

  * metadata lines ``path|sid|text|cleaned`` (multi-speaker) or
    ``path|text`` (single-speaker, sid=0);
  * text modes: aligned (underscore-joined pre-aligned phones,
    text/__init__.py:56), g2p (dictionary + rules), raw-phones; optional
    blank intersperse;
  * mel computed with ops/stft.mel_spectrogram (identical to
    mel_processing.mel_spectrogram_torch) and cached as ``.mel.npy``;
  * bucket-by-length batching with epoch-seeded deterministic shuffle and
    ``host_id::num_hosts`` sharding (replaces rank-sliced DDP sampling);
  * every batch is padded to (text_bucket, frame_bucket) SHAPE CLASSES so the
    jitted train step compiles once per class — the XLA replacement for the
    reference's per-batch max-length padding.
"""

from __future__ import annotations

import os
import re
import wave as wave_mod
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

from ..ops.commons import intersperse
from ..text import convert, load_dictionary, plain_symbol_map


@dataclass
class DataConfig:
    metadata: str = ""
    wav_dir: str = ""
    sampling_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float | None = None
    add_blank: bool = True
    text_mode: str = "aligned"  # aligned | g2p | phones
    dictionary: str | None = None
    min_text_len: int = 1
    max_text_len: int = 350
    max_wav_value: float = 32768.0
    # shape classes
    text_buckets: Sequence[int] = (64, 128, 192, 256, 384, 512, 704)
    frame_buckets: Sequence[int] = (128, 256, 384, 512, 768, 1024)


_SPLIT = re.compile(r'([,.?!;:"() ])')


def text_to_ids_aligned(text: str, id_map: dict) -> list:
    """text/__init__.py:56-69: words are underscore-joined phone strings."""
    phones = ["^"]
    for word in _SPLIT.split(text):
        if word == "":
            continue
        if "_" in word:
            phones.extend(word.split("_"))
        else:
            phones.append(word)
    phones.append("$")
    return [id_map[p] for p in phones]


def text_to_ids_g2p(text: str, id_map: dict, dic: dict) -> list:
    phones = ["^"]
    for word in _SPLIT.split(text.lower()):
        if word == "":
            continue
        if _SPLIT.match(word) or word == "-":
            phones.append(word)
        elif word in dic:
            phones.extend(dic[word].split())
        else:
            phones.extend(convert(word).split())
    phones.append("$")
    return [id_map[p] for p in phones]


def load_wav(path: str) -> tuple[np.ndarray, int]:
    with wave_mod.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype=np.int16).astype(np.float32)
    return data, sr


class TTSDataset:
    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.id_map = plain_symbol_map()
        self.dic = load_dictionary(cfg.dictionary) if cfg.dictionary else {}
        self.items = []
        self.lengths = []
        with open(cfg.metadata, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("|")
                if len(parts) >= 4:
                    path, sid, text, cleaned = parts[0], int(parts[1]), parts[2], parts[3]
                elif len(parts) == 3:
                    path, sid, text, cleaned = parts[0], int(parts[1]), parts[2], parts[2]
                else:
                    path, sid, text, cleaned = parts[0], 0, parts[1], parts[1]
                if not (cfg.min_text_len <= len(text) <= cfg.max_text_len):
                    continue
                wav_path = os.path.join(cfg.wav_dir, path) if cfg.wav_dir else path
                if not wav_path.endswith(".wav"):
                    wav_path += ".wav"
                self.items.append((wav_path, sid, text, cleaned))
                # frame-length estimate from file size (data_utils.py:222)
                try:
                    self.lengths.append(os.path.getsize(wav_path) // (2 * cfg.hop_length))
                except OSError:
                    self.lengths.append(0)

    def __len__(self):
        return len(self.items)

    def text_ids(self, idx: int) -> list:
        _, _, text, cleaned = self.items[idx]
        if self.cfg.text_mode == "aligned":
            ids = text_to_ids_aligned(cleaned, self.id_map)
        elif self.cfg.text_mode == "g2p":
            ids = text_to_ids_g2p(text, self.id_map, self.dic)
        else:
            ids = [self.id_map[p] for p in text.split() if p in self.id_map]
        if self.cfg.add_blank:
            ids = intersperse(ids, 0)
        return ids

    def mel(self, idx: int) -> np.ndarray:
        """(frames, n_mel); cached as .mel.npy next to the wav."""
        wav_path = self.items[idx][0]
        cache = wav_path[:-4] + ".mel.npy"
        if os.path.exists(cache):
            return np.load(cache)
        audio = self.audio(idx)
        from ..ops.stft import mel_spectrogram

        m = np.asarray(
            mel_spectrogram(
                audio[None, :], self.cfg.filter_length, self.cfg.n_mel_channels,
                self.cfg.sampling_rate, self.cfg.hop_length, self.cfg.win_length,
                self.cfg.mel_fmin, self.cfg.mel_fmax,
            )
        )[0]
        try:
            np.save(cache, m)
        except OSError:
            pass
        return m

    def audio(self, idx: int) -> np.ndarray:
        data, sr = load_wav(self.items[idx][0])
        if sr != self.cfg.sampling_rate:
            raise ValueError(f"{self.items[idx][0]}: {sr} != {self.cfg.sampling_rate}")
        return data / self.cfg.max_wav_value

    def example(self, idx: int):
        ids = self.text_ids(idx)
        mel = self.mel(idx)
        audio = self.audio(idx)
        return ids, mel, audio, self.items[idx][1]


def _bucket_of(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


class BucketBatcher:
    """Length-bucketed, host-sharded, epoch-shuffled batch iterator yielding
    shape-class-padded numpy batches for the train step."""

    def __init__(self, dataset: TTSDataset, batch_size: int,
                 boundaries=(32, 300, 400, 500, 600, 700, 800, 900, 1000),
                 host_id: int = 0, num_hosts: int = 1, shuffle: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.shuffle = shuffle
        self.buckets = {}
        for i, ln in enumerate(dataset.lengths):
            for lo, hi in zip(boundaries[:-1], boundaries[1:]):
                if lo < ln <= hi:
                    self.buckets.setdefault(hi, []).append(i)
                    break

    def __iter__(self):
        return self.epoch(0)

    def num_batches(self) -> int:
        total = 0
        gbs = self.batch_size * self.num_hosts
        for idxs in self.buckets.values():
            n = len(idxs) + (-len(idxs)) % gbs
            total += n // gbs
        return total

    def epoch(self, epoch: int):
        rng = np.random.default_rng(1234 + epoch)
        batches = []
        gbs = self.batch_size * self.num_hosts
        for _, idxs in sorted(self.buckets.items()):
            order = list(idxs)
            if self.shuffle:
                order = [order[i] for i in rng.permutation(len(order))]
            # pad to an even multiple of the global batch (data_utils.py:425-429)
            rem = (gbs - len(order) % gbs) % gbs
            order = order + (order * (rem // max(len(order), 1)) + order[: rem % max(len(order), 1)])
            order = order[self.host_id :: self.num_hosts]
            for j in range(len(order) // self.batch_size):
                batches.append(order[j * self.batch_size : (j + 1) * self.batch_size])
        if self.shuffle:
            batches = [batches[i] for i in rng.permutation(len(batches))]
        for batch in batches:
            yield self.collate(batch)

    def collate(self, idxs) -> dict:
        cfg = self.ds.cfg
        examples = [self.ds.example(i) for i in idxs]
        tx = _bucket_of(max(len(e[0]) for e in examples), cfg.text_buckets)
        tf = _bucket_of(max(e[1].shape[0] for e in examples), cfg.frame_buckets)
        ts = tf * cfg.hop_length
        b = len(examples)
        out = {
            "x": np.zeros((b, tx), np.int32),
            "x_lengths": np.zeros((b,), np.int32),
            "mel": np.zeros((b, tf, cfg.n_mel_channels), np.float32),
            "mel_lengths": np.zeros((b,), np.int32),
            "wav": np.zeros((b, ts), np.float32),
            "sid": np.zeros((b,), np.int32),
        }
        for i, (ids, mel, audio, sid) in enumerate(examples):
            ids = ids[:tx]
            out["x"][i, : len(ids)] = ids
            out["x_lengths"][i] = len(ids)
            nf = min(mel.shape[0], tf)
            out["mel"][i, :nf] = mel[:nf]
            out["mel_lengths"][i] = nf
            ns = min(len(audio), ts)
            out["wav"][i, :ns] = audio[:ns]
            out["sid"][i] = sid
        return out
