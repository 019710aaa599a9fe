"""Golden tests for the JAX Whisper encoder vs HF transformers
(the whisper_enc.py feature-extractor path of GPT-SoVITS, see
/root/reference/training/gpt-sovits/feature_extractor/whisper_enc.py).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vosk_tts_tpu.models import whisper as W


def tiny_cfg():
    return W.WhisperEncConfig(num_mel_bins=16, d_model=32, encoder_layers=2,
                              encoder_attention_heads=4, encoder_ffn_dim=64,
                              max_source_positions=60)


def hf_encoder(cfg):
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    hf = WhisperConfig(
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.encoder_attention_heads, decoder_layers=1,
        num_mel_bins=cfg.num_mel_bins, max_source_positions=cfg.max_source_positions,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
    )
    torch.manual_seed(3)
    enc = WhisperEncoder(hf).eval()
    return enc


def test_encoder_matches_transformers(rng):
    cfg = tiny_cfg()
    enc = hf_encoder(cfg)
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = W.whisper_from_state_dict(sd, cfg)

    # T_mel = 2 * max_source_positions (HF asserts the full 30 s shape
    # relationship: conv2 stride 2 halves it)
    mel = rng.standard_normal((2, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    got = np.asarray(whisper_apply_jit(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def whisper_apply_jit(params, cfg, mel):
    return jax.jit(lambda p, m: W.whisper_encoder_apply(p, cfg, m))(params, mel)


def test_log_mel_matches_whisper_feature_extractor(rng):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # 80 mel, 400 fft, 160 hop, 16 kHz
    wav = (rng.standard_normal(16000 * 3) * 0.2).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]  # (80, 3000)
    got = np.asarray(W.whisper_log_mel(jnp.asarray(W.pad_or_trim(wav))[None, :]))[0]
    np.testing.assert_allclose(got.T, ref, rtol=1e-4, atol=1e-5)


def test_get_content_shape(rng):
    cfg = tiny_cfg()
    params = W.whisper_encoder_init(jax.random.PRNGKey(0), cfg)
    # 0.5 s at 16 kHz -> 50 mel frames -> 25 feature frames
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    # tiny max_source_positions: trim the padded mel path by monkey-shape
    mel = W.whisper_log_mel(jnp.asarray(W.pad_or_trim(wav, 160 * 2 * cfg.max_source_positions))[None, :],
                            cfg.num_mel_bins)
    feats = W.whisper_encoder_apply(params, cfg, mel)
    n = len(wav) // W.HOP
    assert feats.shape == (1, cfg.max_source_positions, cfg.d_model)
    assert np.isfinite(np.asarray(feats)).all()
    assert n // 2 == 25

    with pytest.raises(ValueError):
        W.get_content(params, cfg, np.zeros(W.N_SAMPLES + 160, np.float32))
