"""GPT-SoVITS training data pipelines.

Stage 1 (text -> semantic AR): re-implements
training/gpt-sovits/ar/data/dataset.py (Text2SemanticDataset):
  * ``semantic.tsv`` lines ``name\\tcode code code ...`` (25 Hz RVQ codes,
    written by tools/gpt_sovits_prepare.py = 3-get-semantic-vosk.py);
  * metadata lines ``path|spk|text|aligned`` where the aligned column holds
    underscore-joined phones (same file feeds stage 2; dataset.py:83-85 keys
    phoneme_data by item name, takes field 3);
  * reference filters (dataset.py:116-131): drop rows longer than
    ``max_sec*hz`` codes, phones > max_sec*hz/2.5, phone/sec ratio outside
    [min_ps_ratio, max_ps_ratio];
  * optional per-phone BERT rows from ``<name>.bert.npy`` (dataset.py:181-190;
    zeros when absent, same fallback);
  * semantic padding value = EOS 1024 (dataset.py collate pad_value=PAD).

Stage 2 (semantic -> wave VITS): re-implements
training/gpt-sovits/module/data_utils.py (TextAudioSpeakerLoader):
  * same metadata file; wavs at the S2 sampling rate;
  * linear spec with ops/stft center=False semantics, cached ``.spec.npy``;
  * SSL features from ``<name>.ssl.npy`` (the .pt cnhubert cache equivalent),
    replicate-padded/cropped to the spec frame count (data_utils.py:89-93);
  * >20 s utterances dropped (data_utils.py:67-69).

Both collate into shape-class padded buckets so the jitted steps compile
once per class (the XLA replacement for per-batch max-length padding).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..text import plain_symbol_map
from .data import load_wav, text_to_ids_aligned, _bucket_of


def read_metadata(path: str) -> list[tuple[str, int, str, str]]:
    """``path|spk|text|aligned`` rows (metadata-phones-ids.csv schema)."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) >= 4:
                rows.append((parts[0], int(parts[1]), parts[2], parts[3]))
    return rows


def read_semantic_tsv(path: str) -> dict[str, list[int]]:
    """``name\\tcodes`` rows (semantic.tsv; ar/data/dataset.py:78-80)."""
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            items = line.strip().split("\t")
            if len(items) == 2:
                out[items[0]] = [int(t) for t in items[1].split(" ")]
    return out


def _item_name(path: str) -> str:
    name = os.path.basename(path)
    return name[:-4] if name.endswith(".wav") else name


@dataclass
class S1DataConfig:
    metadata: str = ""
    semantic: str = ""
    wav_dir: str = ""  # where .bert.npy sidecars live
    bert_dim: int = 1024
    hz: int = 25
    max_sec: int = 100
    min_ps_ratio: float = 3.0
    max_ps_ratio: float = 25.0
    pad_val: int = 1024  # semantic padding = EOS
    text_buckets: Sequence[int] = (32, 64, 128, 256, 512)
    sem_buckets: Sequence[int] = (64, 128, 256, 512, 1024)


class S1Dataset:
    def __init__(self, cfg: S1DataConfig, *, apply_filters: bool = True):
        self.cfg = cfg
        self.id_map = plain_symbol_map()
        semantic = read_semantic_tsv(cfg.semantic)
        self.items = []  # (name, phoneme_ids, semantic_ids)
        for path, _spk, _text, aligned in read_metadata(cfg.metadata):
            name = _item_name(path)
            if name not in semantic:
                continue
            sem = semantic[name]
            phones = text_to_ids_aligned(aligned, self.id_map)
            if apply_filters:
                if len(sem) > cfg.max_sec * cfg.hz:
                    continue
                if len(phones) > cfg.max_sec * cfg.hz / 2.5:
                    continue
                ps_ratio = len(phones) / (len(sem) / cfg.hz)
                if not (cfg.min_ps_ratio <= ps_ratio <= cfg.max_ps_ratio):
                    continue
            self.items.append((name, phones, sem))

    def __len__(self):
        return len(self.items)

    def example(self, idx: int):
        name, phones, sem = self.items[idx]
        bert_path = os.path.join(self.cfg.wav_dir, name + ".bert.npy")
        bert = np.load(bert_path) if os.path.exists(bert_path) else None
        if bert is not None and bert.shape[0] != len(phones):
            raise ValueError(f"{name}: bert rows {bert.shape[0]} != phones {len(phones)}")
        return phones, sem, bert

    def collate(self, idxs) -> dict:
        cfg = self.cfg
        examples = [self.example(i) for i in idxs]
        tx = _bucket_of(max(len(e[0]) for e in examples), cfg.text_buckets)
        ty = _bucket_of(max(len(e[1]) for e in examples), cfg.sem_buckets)
        b = len(examples)
        out = {
            "x": np.zeros((b, tx), np.int32),
            "x_lengths": np.zeros((b,), np.int32),
            "y": np.full((b, ty), cfg.pad_val, np.int32),
            "y_lengths": np.zeros((b,), np.int32),
            "bert": np.zeros((b, tx, cfg.bert_dim), np.float32),
        }
        for i, (phones, sem, bert) in enumerate(examples):
            t, s = min(len(phones), tx), min(len(sem), ty)
            out["x"][i, :t] = phones[:t]
            out["x_lengths"][i] = t
            out["y"][i, :s] = sem[:s]
            out["y_lengths"][i] = s
            if bert is not None:
                out["bert"][i, :t] = bert[:t]
        return out


@dataclass
class S2DataConfig:
    metadata: str = ""
    wav_dir: str = ""
    sampling_rate: int = 32000
    filter_length: int = 2048
    hop_length: int = 640
    win_length: int = 2048
    max_wav_value: float = 32768.0
    max_sec: float = 20.0  # data_utils.py:67-69
    ssl_dim: int = 768
    text_buckets: Sequence[int] = (32, 64, 128, 256, 512)
    frame_buckets: Sequence[int] = (64, 128, 256, 512, 1024)


class S2Dataset:
    def __init__(self, cfg: S2DataConfig):
        self.cfg = cfg
        self.id_map = plain_symbol_map()
        self.items = []
        self.lengths = []
        for path, spk, _text, aligned in read_metadata(cfg.metadata):
            wav_path = os.path.join(cfg.wav_dir, path) if cfg.wav_dir else path
            try:
                size = os.path.getsize(wav_path)
            except OSError:
                continue
            if size / cfg.sampling_rate / 2 > cfg.max_sec:
                continue
            self.items.append((wav_path, spk, aligned))
            self.lengths.append(size // (2 * cfg.hop_length))

    def __len__(self):
        return len(self.items)

    def example(self, idx: int):
        from ..ops.stft import spectrogram

        cfg = self.cfg
        wav_path, _spk, aligned = self.items[idx]
        wav, sr = load_wav(wav_path)
        if sr != cfg.sampling_rate:
            raise ValueError(f"{wav_path}: {sr} != {cfg.sampling_rate}")
        audio = wav / cfg.max_wav_value

        spec_cache = wav_path[:-4] + ".spec.npy"
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

        ssl = np.load(wav_path[:-4] + ".ssl.npy")  # (Ts, 768) 50 Hz cnhubert
        n = spec.shape[0]
        if ssl.shape[0] < n:  # replicate-pad the tail (data_utils.py:91-92)
            ssl = np.concatenate([ssl, np.repeat(ssl[-1:], n - ssl.shape[0], axis=0)])
        ssl = ssl[:n]

        text = text_to_ids_aligned(aligned, self.id_map)
        return ssl, spec, audio[: n * cfg.hop_length], text

    def collate(self, idxs) -> dict:
        cfg = self.cfg
        examples = [self.example(i) for i in idxs]
        tx = _bucket_of(max(len(e[3]) for e in examples), cfg.text_buckets)
        tf = _bucket_of(max(e[1].shape[0] for e in examples), cfg.frame_buckets)
        b = len(examples)
        n_spec = cfg.filter_length // 2 + 1
        out = {
            "ssl": np.zeros((b, tf, cfg.ssl_dim), np.float32),
            "spec": np.zeros((b, tf, n_spec), np.float32),
            "spec_lengths": np.zeros((b,), np.int32),
            "text": np.zeros((b, tx), np.int32),
            "text_lengths": np.zeros((b,), np.int32),
            "wav": np.zeros((b, tf * cfg.hop_length), np.float32),
        }
        for i, (ssl, spec, audio, text) in enumerate(examples):
            nf = min(spec.shape[0], tf)
            out["ssl"][i, :nf] = ssl[:nf]
            out["spec"][i, :nf] = spec[:nf]
            out["spec_lengths"][i] = nf
            t = min(len(text), tx)
            out["text"][i, :t] = text[:t]
            out["text_lengths"][i] = t
            ns = min(len(audio), tf * cfg.hop_length)
            out["wav"][i, :ns] = audio[:ns]
        return out


class ShuffleBatcher:
    """Epoch-seeded, length-sorted, host-sharded batch iterator shared by the
    S1/S2/VC drivers (the DistributedBucketSampler role)."""

    def __init__(self, dataset, batch_size: int, host_id: int = 0,
                 num_hosts: int = 1, shuffle: bool = True, seed: int = 1234):
        self.ds = dataset
        self.batch_size = batch_size
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.shuffle = shuffle
        self.seed = seed
        self.order = list(range(len(dataset)))
        lengths = getattr(dataset, "lengths", None)
        if lengths:
            self.order.sort(key=lambda i: lengths[i])

    def num_batches(self) -> int:
        gbs = self.batch_size * self.num_hosts
        return max(len(self.order) // gbs, 1) if self.order else 0

    def epoch(self, epoch: int):
        rng = np.random.default_rng(self.seed + epoch)
        gbs = self.batch_size * self.num_hosts
        order = list(self.order)
        rem = (gbs - len(order) % gbs) % gbs
        order = order + order[:rem]
        groups = [order[j * gbs : (j + 1) * gbs] for j in range(len(order) // gbs)]
        if self.shuffle:
            groups = [groups[i] for i in rng.permutation(len(groups))]
        for g in groups:
            mine = g[self.host_id :: self.num_hosts]
            yield self.collate(mine, rng)

    def collate(self, idxs, rng):
        try:
            return self.ds.collate(idxs, rng)  # VCDataset wants the rng
        except TypeError:
            return self.ds.collate(idxs)

    def __iter__(self):
        return self.epoch(0)
