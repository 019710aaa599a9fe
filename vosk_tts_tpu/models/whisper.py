"""Whisper audio encoder in JAX (the alternative SSL content extractor).

The reference's GPT-SoVITS can extract semantic features with the Whisper
"small" encoder instead of cnhubert
(/root/reference/training/gpt-sovits/feature_extractor/whisper_enc.py):
30 s of 16 kHz audio -> whisper log-mel -> 2x conv subsample -> pre-LN
transformer -> features truncated to mel_len//2 frames.

Same computation as a static-shape JAX program: the log-mel is a DFT-matmul
spectrogram (T always padded/trimmed to 3000 frames, so the whole thing jits
once), the encoder is a plain pre-LN MHA stack that XLA maps onto the MXU.
Weights convert from an HF ``WhisperModel.encoder`` state_dict
(``whisper_from_state_dict``). Golden-tested vs transformers in
tests/test_whisper.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d
from ..ops.stft import hann_window, mel_filterbank

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_SAMPLES = 30 * SAMPLE_RATE  # 480_000 -> 3000 mel frames


@dataclass(frozen=True)
class WhisperEncConfig:
    num_mel_bins: int = 80
    d_model: int = 768          # "small"
    encoder_layers: int = 12
    encoder_attention_heads: int = 12
    encoder_ffn_dim: int = 3072
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, d: dict):
        return cls(
            num_mel_bins=d["num_mel_bins"], d_model=d["d_model"],
            encoder_layers=d["encoder_layers"],
            encoder_attention_heads=d["encoder_attention_heads"],
            encoder_ffn_dim=d["encoder_ffn_dim"],
            max_source_positions=d["max_source_positions"],
        )


# ---------------------------------------------------------------------------
# log-mel frontend (whisper.audio.log_mel_spectrogram semantics)
# ---------------------------------------------------------------------------


def whisper_log_mel(wav: jax.Array, n_mels: int = 80) -> jax.Array:
    """wav (B, N_SAMPLES) float32 at 16 kHz -> (B, 3000, n_mels) log-mel.

    Matches whisper/HF WhisperFeatureExtractor: centered 400-pt hann STFT
    (reflect pad), power spectrum with the last frame dropped, slaney mel,
    log10 clamped at 1e-10, floored at (max - 8), then (x + 4) / 4.
    """
    b, n = wav.shape
    pad = N_FFT // 2
    y = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = n // HOP  # whisper drops the trailing stft frame
    idx = jnp.arange(N_FFT)[None, :] + HOP * jnp.arange(n_frames)[:, None]
    frames = y[:, idx] * jnp.asarray(hann_window(N_FFT), wav.dtype)
    k = np.arange(N_FFT // 2 + 1)
    ang = 2.0 * np.pi * np.outer(np.arange(N_FFT), k) / N_FFT
    cos_b = jnp.asarray(np.cos(ang), wav.dtype)
    sin_b = jnp.asarray(np.sin(ang), wav.dtype)
    re = jnp.einsum("btn,nk->btk", frames, cos_b)
    im = jnp.einsum("btn,nk->btk", frames, sin_b)
    power = re * re + im * im
    mel = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, n_mels, 0.0, None), wav.dtype)
    spec = jnp.einsum("btk,mk->btm", power, mel)
    log_spec = jnp.log10(jnp.maximum(spec, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, floor) + 4.0) / 4.0


def pad_or_trim(wav: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    wav = np.asarray(wav, np.float32)
    if len(wav) >= length:
        return wav[:length]
    return np.pad(wav, (0, length - len(wav)))


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _attn(x, p, n_heads):
    b, t, d = x.shape
    hd = d // n_heads
    q = (x @ p["q"]["w"] + p["q"]["b"]) * (hd ** -0.5)
    k = x @ p["k"]["w"]  # no bias in whisper k_proj
    v = x @ p["v"]["w"] + p["v"]["b"]
    q, k, v = (a.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3) for a in (q, k, v))
    w = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ p["out"]["w"] + p["out"]["b"]


def whisper_encoder_apply(params, cfg: WhisperEncConfig, mel: jax.Array) -> jax.Array:
    """mel (B, T_mel, n_mels) -> hidden states (B, T_mel//2, d_model)."""
    x = jax.nn.gelu(conv1d(mel, params["conv1"]["w"], params["conv1"]["b"], padding=1),
                    approximate=False)
    x = jax.nn.gelu(conv1d(x, params["conv2"]["w"], params["conv2"]["b"],
                           stride=2, padding=1), approximate=False)
    x = x + params["pos"][: x.shape[1]]
    eps = cfg.layer_norm_eps
    for layer in params["layers"]:
        h = _ln(x, layer["ln1"], eps)
        x = x + _attn(h, layer["attn"], cfg.encoder_attention_heads)
        h = _ln(x, layer["ln2"], eps)
        h = jax.nn.gelu(h @ layer["fc1"]["w"] + layer["fc1"]["b"], approximate=False)
        x = x + (h @ layer["fc2"]["w"] + layer["fc2"]["b"])
    return _ln(x, params["ln_post"], eps)


def get_content(params, cfg: WhisperEncConfig, wav_16k: np.ndarray) -> jax.Array:
    """whisper_enc.get_content equivalent: (n,) float 16 kHz audio (< 30 s)
    -> (1, T_mel//2, d_model) features (channels-last; the reference
    transposes to (1, d, T) for torch, whisper_enc.py:14-25)."""
    n_frames = len(wav_16k) // HOP
    if n_frames >= 3000:
        raise ValueError("input longer than 30 s (whisper_enc.py asserts this)")
    mel = whisper_log_mel(jnp.asarray(pad_or_trim(wav_16k))[None, :], cfg.num_mel_bins)
    feats = whisper_encoder_apply(params, cfg, mel)
    return feats[:, : n_frames // 2, :]


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed positional table (whisper/model.py sinusoids)."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def whisper_encoder_init(key, cfg: WhisperEncConfig):
    keys = jax.random.split(key, 2 + 6 * cfg.encoder_layers)
    ki = iter(range(len(keys)))
    d, f = cfg.d_model, cfg.encoder_ffn_dim

    def lin(k, a, b, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(a)
        return {"w": jax.random.normal(k, (a, b)) * s, "b": jnp.zeros((b,))}

    def lnp():
        return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}

    p = {
        "conv1": {"w": jax.random.normal(keys[next(ki)], (3, cfg.num_mel_bins, d)) * 0.02,
                  "b": jnp.zeros((d,))},
        "conv2": {"w": jax.random.normal(keys[next(ki)], (3, d, d)) * 0.02,
                  "b": jnp.zeros((d,))},
        "pos": jnp.asarray(_sinusoids(cfg.max_source_positions, d)),
        "layers": [],
        "ln_post": lnp(),
    }
    for _ in range(cfg.encoder_layers):
        p["layers"].append({
            "ln1": lnp(),
            "attn": {"q": lin(keys[next(ki)], d, d), "k": lin(keys[next(ki)], d, d),
                     "v": lin(keys[next(ki)], d, d), "out": lin(keys[next(ki)], d, d)},
            "ln2": lnp(),
            "fc1": lin(keys[next(ki)], d, f),
            "fc2": lin(keys[next(ki)], f, d),
        })
    return p


def whisper_from_state_dict(sd: dict, cfg: WhisperEncConfig) -> dict:
    """Convert an HF WhisperModel.encoder state_dict (numpy arrays)."""
    def lin(pfx):
        return {"w": np.ascontiguousarray(sd[pfx + ".weight"].T),
                "b": sd.get(pfx + ".bias", np.zeros(sd[pfx + ".weight"].shape[0], np.float32))}

    def lnp(pfx):
        return {"g": sd[pfx + ".weight"], "b": sd[pfx + ".bias"]}

    p = {
        # torch Conv1d (O, I, K) -> (K, I, O)
        "conv1": {"w": sd["conv1.weight"].transpose(2, 1, 0), "b": sd["conv1.bias"]},
        "conv2": {"w": sd["conv2.weight"].transpose(2, 1, 0), "b": sd["conv2.bias"]},
        "pos": sd["embed_positions.weight"],
        "layers": [],
        "ln_post": lnp("layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        pfx = f"layers.{i}"
        p["layers"].append({
            "ln1": lnp(f"{pfx}.self_attn_layer_norm"),
            "attn": {
                "q": lin(f"{pfx}.self_attn.q_proj"),
                "k": {"w": np.ascontiguousarray(sd[f"{pfx}.self_attn.k_proj.weight"].T)},
                "v": lin(f"{pfx}.self_attn.v_proj"),
                "out": lin(f"{pfx}.self_attn.out_proj"),
            },
            "ln2": lnp(f"{pfx}.final_layer_norm"),
            "fc1": lin(f"{pfx}.fc1"),
            "fc2": lin(f"{pfx}.fc2"),
        })
    return jax.tree_util.tree_map(jnp.asarray, p)
