#!/usr/bin/env python3
"""Create a model bundle with randomly initialized VITS2 weights.

Useful for driving the full pipeline (frontend -> jit infer -> wav) and for
benchmarking when no trained checkpoint is available. Trained reference
checkpoints convert via tools/convert_checkpoint.py into the same layout.

Usage: python tools/make_demo_bundle.py OUTPUT_DIR [--full] [--seed N]
  --full  use the shipped mb_istft_vits2_multi architecture (default: small)
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vosk_tts_tpu.models import vits2
from vosk_tts_tpu.text import plain_symbol_map
from vosk_tts_tpu.utils.checkpoint import save_params


def full_config():
    """The shipped MB-iSTFT-VITS2 architecture
    (training/vits2/configs/mb_istft_vits2_multi.json)."""
    return vits2.VITS2Config()


def small_config():
    return vits2.VITS2Config(
        inter_channels=96,
        hidden_channels=96,
        filter_channels=384,
        n_layers=4,
        upsample_initial_channel=256,
        n_speakers=5,
        gin_channels=128,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = full_config() if args.full else small_config()
    params = vits2.synthesizer_init(jax.random.PRNGKey(args.seed), cfg)

    os.makedirs(args.out, exist_ok=True)
    save_params(os.path.join(args.out, "params.npz"), params)
    config = {
        "model_type": "vits2",
        "sample_rate": 22050,
        "phoneme_id_map": {k: [v] for k, v in plain_symbol_map().items()},
        "inference": {"noise_level": 0.8, "speech_rate": 1.0, "duration_noise_level": 0.8},
        "model": dataclasses.asdict(cfg),
    }
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(config, f, ensure_ascii=False, indent=1)
    # tiny dictionary so the G2P fallback is exercised for unseen words
    with open(os.path.join(args.out, "dictionary"), "w") as f:
        f.write("привет 1.0 p rj i0 vj e1 t\nмир 1.0 mj i1 r\n")
    print(f"bundle written to {args.out}")


if __name__ == "__main__":
    main()
