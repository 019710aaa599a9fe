"""High-level inference pipelines beyond plain TTS:

  * voice conversion (vc/convert.py equivalent) — ContentVec -> QuickVC
  * zero-shot cloning (gpt-sovits/inference_cli.py:164-274 equivalent) —
    reference audio -> semantic prompt -> AR decode -> SoVITS decode

These compose the model zoo; all heavy stages are jitted with bucketed
shapes by the callers (see serving/batcher.py for the batching pattern).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .models import gpt_sovits as GS
from .models import hubert as H
from .models import quickvc as Q
from .ops.stft import mel_spectrogram, spectrogram


def convert_voice(
    vc_params,
    vc_cfg: Q.QuickVCConfig,
    hubert_params,
    hubert_cfg: H.HubertConfig,
    src_wav_16k: np.ndarray,
    tgt_wav_16k: np.ndarray,
    *,
    rng,
    mel_n: int = 80,
):
    """vc/convert.py:37-87: target mel -> speaker embed; source wav ->
    ContentVec -> infer. Both wavs are 1-D float arrays at 16 kHz."""
    c = H.hubert_apply(hubert_params, hubert_cfg, jnp.asarray(src_wav_16k)[None, :])
    tgt_mel = mel_spectrogram(
        jnp.asarray(tgt_wav_16k)[None, :], 1280, mel_n, 16000, 320, 1280, 0.0, None
    )
    wav = Q.infer(vc_params, vc_cfg, c, tgt_mel, rng=rng)
    return np.asarray(wav)[0]


def clone_tts(
    ar_params,
    ar_cfg: GS.ARConfig,
    sovits_params,
    sovits_cfg: GS.SoVITSConfig,
    hubert_params,
    hubert_cfg: H.HubertConfig,
    phoneme_ids: np.ndarray,
    bert: np.ndarray,
    ref_wav_16k: np.ndarray,
    ref_spec: np.ndarray,
    *,
    rng,
    top_k: int = 15,
    temperature: float = 1.0,
    max_new: int = 600,
    noise_scale: float = 0.5,
):
    """GPT-SoVITS two-stage inference:
      1. reference wav -> ContentVec SSL -> semantic prompt codes
      2. AR decode text -> semantic tokens
      3. SoVITS decode tokens + reference spectrogram -> waveform
    phoneme_ids: (T,) int; bert: (T, bert_dim); ref_spec: (Tr, spec_channels).
    """
    r_ar, r_dec = jax.random.split(rng)
    ssl = H.hubert_apply(hubert_params, hubert_cfg, jnp.asarray(ref_wav_16k)[None, :])
    prompts = GS.sovits_extract_latent(sovits_params, sovits_cfg, ssl)  # (1, Tp)

    tokens, n = GS.ar_infer(
        ar_params, ar_cfg, jnp.asarray(phoneme_ids)[None, :], jnp.asarray(bert)[None],
        prompts, rng=r_ar, top_k=top_k, temperature=temperature, max_new=max_new,
    )
    n = int(n)
    codes = tokens[:, :max(n, 1)]

    wav = GS.sovits_decode(
        sovits_params, sovits_cfg, codes,
        jnp.asarray(phoneme_ids)[None, :], jnp.asarray([len(phoneme_ids)], jnp.int32),
        jnp.asarray(ref_spec)[None], jnp.asarray([ref_spec.shape[0]], jnp.int32),
        rng=r_dec, noise_scale=noise_scale,
    )
    return np.asarray(wav)[0], n
