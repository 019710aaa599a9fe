#!/usr/bin/env python3
"""Convert a reference VITS2 torch checkpoint (G_*.pth) into a bundle.

Usage:
  python tools/convert_checkpoint.py G_1000.pth config.json OUTPUT_DIR \
      [--dictionary PATH]

``config.json`` is the reference training config
(e.g. training/vits2/configs/mb_istft_vits2_multi.json). Weight norm is
folded; layouts transposed to channels-last (utils/torch_params.py).
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vosk_tts_tpu.models.vits2 import VITS2Config
from vosk_tts_tpu.text import plain_symbol_map
from vosk_tts_tpu.utils.checkpoint import save_params
from vosk_tts_tpu.utils.torch_params import vits2_from_state_dict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("config")
    ap.add_argument("out")
    ap.add_argument("--dictionary", default=None)
    ap.add_argument("--family", default="vits2",
                    choices=("vits2", "quickvc", "sovits"),
                    help="reference checkpoint family (G_*.pth of "
                         "training/vits2, vc/, or gpt-sovits stage 2)")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    ref = json.load(open(args.config))
    if args.family == "quickvc":
        from vosk_tts_tpu.models.quickvc import QuickVCConfig
        from vosk_tts_tpu.utils.torch_params import quickvc_from_state_dict

        cfg = QuickVCConfig()
        params = quickvc_from_state_dict(sd, cfg)
    elif args.family == "sovits":
        from vosk_tts_tpu.models.gpt_sovits import SoVITSConfig
        from vosk_tts_tpu.utils.torch_params import sovits_from_state_dict

        cfg = SoVITSConfig()
        params = sovits_from_state_dict(sd, cfg)
    else:
        cfg = VITS2Config.from_reference_json(ref["model"], ref.get("data"), ref.get("train"))
        params = vits2_from_state_dict(sd, cfg)

    os.makedirs(args.out, exist_ok=True)
    save_params(os.path.join(args.out, "params.npz"), params)
    out_cfg = {
        "model_type": args.family,
        "sample_rate": ref.get("data", {}).get("sampling_rate", 22050),
        "phoneme_id_map": {k: [v] for k, v in plain_symbol_map().items()},
        "inference": {"noise_level": 0.8, "speech_rate": 1.0, "duration_noise_level": 0.8},
        "model": dataclasses.asdict(cfg),
    }
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(out_cfg, f, ensure_ascii=False, indent=1)
    if args.dictionary:
        shutil.copy(args.dictionary, os.path.join(args.out, "dictionary"))
    print(f"converted {args.checkpoint} -> {args.out} (step {ckpt.get('iteration', '?')})")


if __name__ == "__main__":
    main()
