"""StableTTS/Matcha training data pipeline.

Replaces training/stabletts/matcha/data/text_mel_datamodule.py:23-278:

  * filelist lines ``path|spk|text|aligned`` (n_spks>1) or ``path|text|aligned``
    (get_datapoint, text_mel_datamodule.py:163-181);
  * 5-stream phoneme encoding of the pre-aligned text + per-phone BERT rows
    (text_to_sequence_aligned, matcha/text/__init__.py:241-335) via the shared
    frontend (`g2p_multistream(aligned=True)`);
  * mel on the fly with ops/stft.mel_spectrogram (center=False reflect-pad
    semantics identical to matcha/utils/audio.mel_spectrogram), normalized by
    the dataset statistics (configs/data/ru.yaml mel_mean/mel_std;
    text_mel_datamodule.py:195-209) and cached as ``.melnorm.npy``;
  * kaldi ``.lab`` duration files beside each wav — lines ``phone start dur``,
    duration = last field in frames (get_durations,
    text_mel_datamodule.py:183-192; format: stabletts/README.md "Label file
    example");
  * shape-class padded batches (text/frame buckets, frame buckets kept
    multiples of 4 like fix_len_compatibility) so the jitted CFM step
    compiles once per class.

BERT embeddings: the dataset takes a ``bert_fn(text) -> (n_words+2, 768)``
callable (one row per word incl. ^/$ sentinels, the get_bert_embeddings
contract). Pass ``api``'s converted ruBERT for real training; defaults to
zeros so the pipeline is testable without the 700 MB model.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

from ..text import multistream_symbol_map
from ..text.frontend import g2p_multistream
from .data import load_wav, _bucket_of


@dataclass
class StableDataConfig:
    metadata: str = ""
    wav_dir: str = ""
    n_spks: int = 128
    sampling_rate: int = 22050
    n_fft: int = 1024
    n_mels: int = 80
    hop_length: int = 256
    win_length: int = 1024
    f_min: float = 0.0
    f_max: float | None = 8000.0
    mel_mean: float = -5.806578636169434  # configs/data/ru.yaml
    mel_std: float = 2.454238176345825
    load_durations: bool = True
    bert_dim: int = 768
    max_wav_value: float = 32768.0
    # shape classes (frame buckets multiples of 4: fix_len_compatibility)
    text_buckets: Sequence[int] = (64, 128, 192, 256, 384, 512)
    frame_buckets: Sequence[int] = (128, 256, 384, 512, 768, 1024)


def parse_lab(path: str) -> list[int]:
    """Kaldi label file -> per-phone durations in frames
    (text_mel_datamodule.py:183-192: ``int(items[-1])`` per line)."""
    durations = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            items = line.split()
            if not items:
                continue
            durations.append(int(items[-1]))
    return durations


class StableTTSDataset:
    def __init__(self, cfg: StableDataConfig,
                 bert_fn: Callable[[str], np.ndarray] | None = None):
        self.cfg = cfg
        self.bert_fn = bert_fn
        self.id_map = multistream_symbol_map()
        self.items = []
        self.lengths = []  # frame-length estimates for bucketing
        with open(cfg.metadata, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("|")
                if len(parts) >= 4:
                    path, spk, text, aligned = parts[0], int(parts[1]), parts[2], parts[3]
                elif len(parts) == 3:
                    path, spk, text, aligned = parts[0], 0, parts[1], parts[2]
                else:
                    continue
                wav_path = os.path.join(cfg.wav_dir, path) if cfg.wav_dir else path
                if not wav_path.endswith(".wav"):
                    wav_path += ".wav"
                self.items.append((wav_path, spk, text, aligned))
                try:
                    self.lengths.append(os.path.getsize(wav_path) // (2 * cfg.hop_length))
                except OSError:
                    self.lengths.append(0)

    def __len__(self):
        return len(self.items)

    def text_streams(self, idx: int):
        """(T, 5) int32 streams + (T, 768) bert rows."""
        _, _, text, aligned = self.items[idx]
        bert_rows = np.asarray(self.bert_fn(text), np.float32) if self.bert_fn is not None else None
        tuples, embs, _ = g2p_multistream(
            aligned, {}, self.id_map, bert_embeddings=bert_rows, aligned=True,
        )
        x = np.asarray(tuples, np.int32)  # (T, 5)
        if embs is not None:
            bert = np.asarray(embs, np.float32)
        else:
            bert = np.zeros((x.shape[0], self.cfg.bert_dim), np.float32)
        return x, bert

    def mel(self, idx: int) -> np.ndarray:
        """(frames, n_mels), already normalized by dataset statistics."""
        wav_path = self.items[idx][0]
        cache = wav_path[:-4] + ".melnorm.npy"
        if os.path.exists(cache):
            return np.load(cache)
        data, sr = load_wav(wav_path)
        if sr != self.cfg.sampling_rate:
            raise ValueError(f"{wav_path}: {sr} != {self.cfg.sampling_rate}")
        audio = data / self.cfg.max_wav_value
        from ..ops.stft import mel_spectrogram

        m = np.asarray(
            mel_spectrogram(
                audio[None, :], self.cfg.n_fft, self.cfg.n_mels,
                self.cfg.sampling_rate, self.cfg.hop_length, self.cfg.win_length,
                self.cfg.f_min, self.cfg.f_max,
            )
        )[0]
        m = (m - self.cfg.mel_mean) / self.cfg.mel_std
        try:
            np.save(cache, m)
        except OSError:
            pass
        return m

    def durations(self, idx: int) -> list[int] | None:
        if not self.cfg.load_durations:
            return None
        return parse_lab(self.items[idx][0][:-4] + ".lab")

    def example(self, idx: int):
        x, bert = self.text_streams(idx)
        mel = self.mel(idx)
        durs = self.durations(idx)
        return x, bert, mel, durs, self.items[idx][1]


class StableBatcher:
    """Length-bucketed, host-sharded, epoch-shuffled iterator yielding
    shape-class batches for stabletts_train.make_train_step."""

    def __init__(self, dataset: StableTTSDataset, batch_size: int,
                 host_id: int = 0, num_hosts: int = 1, shuffle: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.shuffle = shuffle
        self.order = list(range(len(dataset)))
        # sort by estimated length so same-epoch batches share shape classes
        self.order.sort(key=lambda i: dataset.lengths[i])

    def num_batches(self) -> int:
        gbs = self.batch_size * self.num_hosts
        return max(len(self.order) // gbs, 1) if self.order else 0

    def __iter__(self):
        return self.epoch(0)

    def epoch(self, epoch: int):
        rng = np.random.default_rng(1234 + epoch)
        gbs = self.batch_size * self.num_hosts
        order = list(self.order)
        rem = (gbs - len(order) % gbs) % gbs
        order = order + order[:rem]
        groups = [order[j * gbs : (j + 1) * gbs] for j in range(len(order) // gbs)]
        if self.shuffle:
            groups = [groups[i] for i in rng.permutation(len(groups))]
        for g in groups:
            mine = g[self.host_id :: self.num_hosts]
            yield self.collate(mine)

    def collate(self, idxs) -> dict:
        cfg = self.ds.cfg
        examples = [self.ds.example(i) for i in idxs]
        tx = _bucket_of(max(e[0].shape[0] for e in examples), cfg.text_buckets)
        tf = _bucket_of(max(e[2].shape[0] for e in examples), cfg.frame_buckets)
        b = len(examples)
        out = {
            "x": np.zeros((b, 5, tx), np.int32),
            "x_lengths": np.zeros((b,), np.int32),
            "mel": np.zeros((b, tf, cfg.n_mels), np.float32),
            "mel_lengths": np.zeros((b,), np.int32),
            "bert": np.zeros((b, tx, cfg.bert_dim), np.float32),
            "durations": np.zeros((b, tx), np.int32),
            "sid": np.zeros((b,), np.int32),
        }
        for i, (x, bert, mel, durs, spk) in enumerate(examples):
            t = min(x.shape[0], tx)
            out["x"][i, :, :t] = x[:t].T
            out["x_lengths"][i] = t
            nf = min(mel.shape[0], tf)
            out["mel"][i, :nf] = mel[:nf]
            out["mel_lengths"][i] = nf
            out["bert"][i, :t] = bert[:t]
            if durs is not None:
                d = np.asarray(durs[:t], np.int32)
                # clip cumulative durations into the frame bucket so
                # generate_path stays inside y_mask
                cum = np.cumsum(d)
                d = np.where(cum <= nf, d, np.maximum(nf - (cum - d), 0))
                out["durations"][i, : len(d)] = d
            out["sid"][i] = spk
        return out
