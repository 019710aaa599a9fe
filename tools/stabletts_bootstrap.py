#!/usr/bin/env python3
"""StableTTS data bootstrap tools (the Matcha utils the product pipeline
needs before training):

  stats      — dataset mel mean/std, the normalization constants consumed by
               StableDataConfig.mel_mean/mel_std. Matches
               matcha/utils/generate_data_statistics.py:25-47: over
               UN-normalized log-mels, mean = sum / (frames*channels),
               std = sqrt(E[x^2] - mean^2).
  durations  — per-phone durations from a TRAINED checkpoint via monotonic
               alignment search, written as kaldi-style ``.lab`` files beside
               each wav (lines ``phone start dur``; parse_lab reads the last
               field). Matches
               matcha/utils/get_durations_from_trained_model_new.py:48-81:
               the alignment is the MAS path through the Gaussian log-prior
               N(mel ; mu_mel, I) of the trained text encoder, durations =
               attn.sum over the frame axis. Any checkpoint works (early ones
               give rough alignments; re-run as training improves).

Usage:
  python tools/stabletts_bootstrap.py stats -c config.json [-o stats.json]
  python tools/stabletts_bootstrap.py durations -c config.json -m MODEL_DIR \
      [--batch-size 8]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def compute_stats(cfg_json: dict) -> dict:
    """Mel mean/std over the raw (un-normalized) dataset log-mels."""
    from vosk_tts_tpu.ops.stft import mel_spectrogram
    from vosk_tts_tpu.train.data import load_wav
    from vosk_tts_tpu.train.run_stabletts import build_configs

    dcfg, _, _ = build_configs(cfg_json)
    total, total_sq, frames = 0.0, 0.0, 0
    with open(dcfg.metadata, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 3:
                continue
            path = parts[0]
            wav_path = os.path.join(dcfg.wav_dir, path) if dcfg.wav_dir else path
            if not wav_path.endswith(".wav"):
                wav_path += ".wav"
            data, sr = load_wav(wav_path)
            if sr != dcfg.sampling_rate:
                raise ValueError(f"{wav_path}: {sr} != {dcfg.sampling_rate}")
            mel = np.asarray(mel_spectrogram(
                (data / dcfg.max_wav_value)[None, :], dcfg.n_fft, dcfg.n_mels,
                dcfg.sampling_rate, dcfg.hop_length, dcfg.win_length,
                dcfg.f_min, dcfg.f_max,
            ))[0]
            total += float(mel.sum())
            total_sq += float((mel.astype(np.float64) ** 2).sum())
            frames += mel.shape[0]
    n = frames * dcfg.n_mels
    mean = total / n
    std = math.sqrt(total_sq / n - mean * mean)
    return {"mel_mean": mean, "mel_std": std}


def mas_durations(params, mcfg, batch):
    """MAS path durations (B, Tx) int32 from the trained text encoder's mel
    prior: log N(y ; mu_mel, I) scored per (frame, phone), maximized
    monotonically (matcha_tts.py forward MAS; ops/mas.maximum_path)."""
    import jax.numpy as jnp

    from vosk_tts_tpu.models import stabletts as S
    from vosk_tts_tpu.ops.commons import sequence_mask
    from vosk_tts_tpu.ops.mas import maximum_path

    x, x_lengths = batch["x"], batch["x_lengths"]
    y, y_lengths = batch["mel"], batch["mel_lengths"]
    spks = jnp.asarray(params["spk_emb"])[batch["sid"]]
    dur_spks = jnp.asarray(params["dur_spk_emb"])[batch["sid"]]
    _, mu_mel, _, x_mask = S.text_encoder_apply(
        params["text_encoder"], mcfg, x, x_lengths, spks, dur_spks, batch["bert"])
    y_mask = sequence_mask(y_lengths, y.shape[1]).astype(x_mask.dtype)[..., None]

    const = -0.5 * mcfg.n_feats * math.log(2 * math.pi)
    yy = -0.5 * jnp.sum(y**2, axis=-1)                      # (B, Ty)
    cross = jnp.einsum("byc,btc->byt", y, mu_mel)            # (B, Ty, Tx)
    mm = -0.5 * jnp.sum(mu_mel**2, axis=-1)                  # (B, Tx)
    log_prior = yy[:, :, None] + cross + mm[:, None, :] + const
    attn_mask = y_mask[..., 0][:, :, None] * x_mask[..., 0][:, None, :]
    attn = maximum_path(log_prior, attn_mask)                # (B, Ty, Tx)
    return jnp.sum(attn, axis=1).astype(jnp.int32)           # (B, Tx)


def write_lab(path: str, phones, durs) -> None:
    """Kaldi-style label file: ``phone start dur`` per line (README "Label
    file example"; stabletts_data.parse_lab reads the last field)."""
    lines, start = [], 0
    for p, d in zip(phones, durs):
        lines.append(f"{int(p)} {start} {int(d)}")
        start += int(d)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def run_durations(cfg_json: dict, model_dir: str, batch_size: int = 8,
                  bert_fn=None) -> int:
    import jax

    from vosk_tts_tpu.train import stabletts_train as T
    from vosk_tts_tpu.train.run_stabletts import build_configs
    from vosk_tts_tpu.train.stabletts_data import StableBatcher, StableTTSDataset
    from vosk_tts_tpu.utils import checkpoint as ckpt

    dcfg, mcfg, tcfg = build_configs(cfg_json)
    dcfg.load_durations = False  # that's what we're here to create
    ds = StableTTSDataset(dcfg, bert_fn=bert_fn)
    batcher = StableBatcher(ds, batch_size, shuffle=False)

    template = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    loaded = ckpt.load_full_state(model_dir, "STATE", template)
    if loaded is None:
        raise FileNotFoundError(f"no STATE_* checkpoint in {model_dir}")
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, loaded[0]["params"])

    dur_fn = jax.jit(lambda batch: mas_durations(params, mcfg, batch))

    # deterministic full sweep: iterate dataset in order, one bucket batch
    # at a time (StableBatcher(shuffle=False) yields every item once, padded)
    written = 0
    order = list(batcher.order)
    for j in range(0, len(order), batch_size):
        idxs = order[j : j + batch_size]
        batch = batcher.collate(idxs)
        durs = np.asarray(dur_fn({k: v for k, v in batch.items() if k != "durations"}))
        for row, i in enumerate(idxs):
            t = int(batch["x_lengths"][row])
            nf = int(batch["mel_lengths"][row])
            d = durs[row, :t]
            assert d.sum() == nf, (d.sum(), nf)  # MAS covers every frame
            phones = batch["x"][row, 0, :t]
            write_lab(ds.items[i][0][:-4] + ".lab", phones, d)
            written += 1
    return written


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    ps = sub.add_parser("stats")
    ps.add_argument("-c", "--config", required=True)
    ps.add_argument("-o", "--output", default=None)
    pd = sub.add_parser("durations")
    pd.add_argument("-c", "--config", required=True)
    pd.add_argument("-m", "--model-dir", required=True)
    pd.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    cfg_json = json.load(open(args.config))
    if args.cmd == "stats":
        stats = compute_stats(cfg_json)
        out = json.dumps(stats, indent=1)
        if args.output:
            open(args.output, "w").write(out + "\n")
        print(out)
    else:
        n = run_durations(cfg_json, args.model_dir, args.batch_size)
        print(f"wrote {n} .lab files")


if __name__ == "__main__":
    main()
