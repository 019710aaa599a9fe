"""tools/convert_checkpoint.py end-to-end: reference G_*.pth checkpoint ->
npz bundle -> api.Model synthesis (the weight-conversion product path,
SURVEY §7 step 3)."""

import json
import os
import subprocess
import sys

import numpy as np
import torch

import test_vits2_model as V

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_checkpoint_vits2(tmp_path):
    cfg = V.small_cfg()
    net = V.build_ref(cfg)
    torch.save({"model": net.state_dict(), "iteration": 7}, tmp_path / "G_7.pth")

    ref_json = {
        "train": {"segment_size": 8 * 64},
        "data": {"sampling_rate": 22050, "filter_length": 24, "hop_length": 64,
                 "n_speakers": cfg.n_speakers},
        "model": {
            "n_vocab": cfg.n_vocab, "inter_channels": cfg.inter_channels,
            "hidden_channels": cfg.hidden_channels,
            "filter_channels": cfg.filter_channels, "n_heads": cfg.n_heads,
            "n_layers": cfg.n_layers, "kernel_size": cfg.kernel_size,
            "p_dropout": 0.0, "resblock": "1",
            "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d) for d in cfg.resblock_dilation_sizes],
            "upsample_rates": list(cfg.upsample_rates),
            "upsample_initial_channel": cfg.upsample_initial_channel,
            "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
            "gen_istft_n_fft": cfg.gen_istft_n_fft,
            "gen_istft_hop_size": cfg.gen_istft_hop_size,
            "subbands": cfg.subbands, "gin_channels": cfg.gin_channels,
            "use_sdp": True, "mb_istft_vits": True,
            "use_spk_conditioned_encoder": True, "use_transformer_flows": True,
            "transformer_flow_type": "pre_conv2",
        },
    }
    (tmp_path / "ref.json").write_text(json.dumps(ref_json), encoding="utf-8")
    (tmp_path / "dictionary").write_text("привет 1.0 p rj i0 vj e1 t\n", encoding="utf-8")

    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "convert_checkpoint.py"),
         str(tmp_path / "G_7.pth"), str(tmp_path / "ref.json"),
         str(tmp_path / "bundle"), "--dictionary", str(tmp_path / "dictionary")],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr

    from vosk_tts_tpu.api import Model, Synth

    model = Model(model_path=tmp_path / "bundle")
    wav = Synth(model).synth_audio("привет", speaker_id=1)
    assert len(wav) > 0 and np.isfinite(wav).all()
