#!/usr/bin/env python3
"""GPT-SoVITS dataset preparation: SSL features + semantic codes.

Equivalent of training/gpt-sovits/prepare_datasets/{2-get-hubert-vosk.py,
3-get-semantic-vosk.py}: for each 16 kHz wav, extract ContentVec features
(saved .ssl.npy) and RVQ semantic codes (appended to semantic.tsv).

Usage:
  python tools/gpt_sovits_prepare.py HUBERT_BUNDLE SOVITS_STATE WAV_DIR OUT_TSV
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from vosk_tts_tpu.models import gpt_sovits as G
from vosk_tts_tpu.models import hubert as H
from vosk_tts_tpu.train.data import load_wav
from vosk_tts_tpu.utils.checkpoint import load_params


def main():
    hubert_bundle, sovits_state, wav_dir, out_tsv = sys.argv[1:5]
    hcfg = H.HubertConfig.from_hf(json.load(open(os.path.join(hubert_bundle, "config.json"))))
    hparams = load_params(os.path.join(hubert_bundle, "params.npz"))
    s_cfg = G.SoVITSConfig()
    s_params = load_params(sovits_state)

    with open(out_tsv, "w", encoding="utf-8") as f:
        for name in sorted(os.listdir(wav_dir)):
            if not name.endswith(".wav"):
                continue
            path = os.path.join(wav_dir, name)
            wav, sr = load_wav(path)
            assert sr == 16000, f"{path}: expected 16 kHz"
            ssl = H.hubert_apply(hparams, hcfg, jnp.asarray(wav / 32768.0)[None, :])
            np.save(path[:-4] + ".ssl.npy", np.asarray(ssl)[0])
            codes = np.asarray(G.sovits_extract_latent(s_params, s_cfg, ssl))[0]
            f.write(name[:-4] + "\t" + " ".join(map(str, codes.tolist())) + "\n")
            print(f"{name}: {len(codes)} codes")


if __name__ == "__main__":
    main()
