#!/usr/bin/env python3
"""Convert an HF Hubert/ContentVec checkpoint dir into a params.npz bundle.

Usage: python tools/convert_hubert.py HF_MODEL_DIR OUT_DIR
(HF_MODEL_DIR must contain config.json + pytorch_model.bin/safetensors,
e.g. a local snapshot of lengyue233/content-vec-best.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vosk_tts_tpu.models.hubert import HubertConfig, hubert_from_state_dict
from vosk_tts_tpu.utils.checkpoint import save_params


def main():
    src, out = sys.argv[1], sys.argv[2]
    from transformers import HubertModel

    model = HubertModel.from_pretrained(src)
    cfg = HubertConfig.from_hf(model.config.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hubert_from_state_dict(sd, cfg)
    os.makedirs(out, exist_ok=True)
    save_params(os.path.join(out, "params.npz"), params)
    json.dump(model.config.to_dict(), open(os.path.join(out, "config.json"), "w"))
    print(f"converted {src} -> {out}")


if __name__ == "__main__":
    main()
