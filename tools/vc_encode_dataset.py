#!/usr/bin/env python3
"""Offline ContentVec encoding of a VC dataset (vc/encode.py equivalent).

Usage: python tools/vc_encode_dataset.py HUBERT_BUNDLE WAV_DIR
  HUBERT_BUNDLE: dir with params.npz + config.json (converted HF Hubert,
  e.g. via tools/convert_hubert.py). Writes <wav>.cv.npy next to each wav.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from vosk_tts_tpu.models import hubert as H
from vosk_tts_tpu.train.data import load_wav
from vosk_tts_tpu.utils.checkpoint import load_params


def main():
    bundle, wav_dir = sys.argv[1], sys.argv[2]
    cfg = H.HubertConfig.from_hf(json.load(open(os.path.join(bundle, "config.json"))))
    params = load_params(os.path.join(bundle, "params.npz"))
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav"):
            continue
        path = os.path.join(wav_dir, name)
        out = path[:-4] + ".cv.npy"
        if os.path.exists(out):
            continue
        wav, sr = load_wav(path)
        assert sr == 16000, f"{path}: expected 16 kHz, got {sr}"
        feats = np.asarray(H.hubert_apply(params, cfg, jnp.asarray(wav / 32768.0)[None, :]))[0]
        np.save(out, feats)
        print(f"{name}: {feats.shape}")


if __name__ == "__main__":
    main()
