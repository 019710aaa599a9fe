"""QuickVC voice conversion (vc/models.py) — TPU-native JAX.

Composition (vc/models.py:770-872):
  enc_p  = PosteriorEncoder over 768-d ContentVec features (no speaker cond)
  enc_q  = PosteriorEncoder over linear spectrogram (speaker-conditioned)
  flow   = plain ResidualCouplingBlock (4 steps, mean-only)
  dec    = Multistream-iSTFT generator @16 kHz (upsample [5,4], subbands 4)
  enc_spk= 3-layer LSTM mel speaker encoder with partial-slice averaging
           (vc/models.py:728-767)

ContentVec itself is models/hubert.py. Config: vc/configs/quickvc.json.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.commons import rand_slice_segments, sequence_mask
from .vits2 import (
    VITS2Config,
    flow_block_init,
    flow_block_apply,
    generator_init,
    generator_apply,
    posterior_init,
    posterior_apply,
)


@dataclass(frozen=True)
class QuickVCConfig:
    spec_channels: int = 641  # filter_length 1280 // 2 + 1
    segment_size: int = 32  # frames
    inter_channels: int = 192
    hidden_channels: int = 192
    ssl_dim: int = 768
    gin_channels: int = 256
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (5, 4)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    subbands: int = 4
    decoder_type: str = "ms_istft"
    n_mel_channels: int = 80

    def as_vits2(self, *, spec_channels=None, gin=None) -> VITS2Config:
        return VITS2Config(
            spec_channels=spec_channels if spec_channels is not None else self.spec_channels,
            segment_size=self.segment_size,
            inter_channels=self.inter_channels,
            hidden_channels=self.hidden_channels,
            resblock=self.resblock,
            resblock_kernel_sizes=tuple(self.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in self.resblock_dilation_sizes),
            upsample_rates=tuple(self.upsample_rates),
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_kernel_sizes=tuple(self.upsample_kernel_sizes),
            # QuickVC decoder ConvTranspose1d scheme (vc/models.py:429-430):
            # padding=(k-u+1-i)//2, output_padding=1-i per layer
            upsample_paddings=tuple(
                (k - u + 1 - i) // 2
                for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes))
            ),
            upsample_output_paddings=tuple(
                1 - i for i in range(len(self.upsample_rates))
            ),
            gen_istft_n_fft=self.gen_istft_n_fft,
            gen_istft_hop_size=self.gen_istft_hop_size,
            subbands=self.subbands,
            decoder_type=self.decoder_type,
            gin_channels=gin if gin is not None else self.gin_channels,
            n_speakers=0,
            use_transformer_flows=False,
        )


# ---------------------------------------------------------------------------
# LSTM speaker encoder (vc/models.py:728-767)
# ---------------------------------------------------------------------------


def _lstm_layer_init(key, in_dim, hidden):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = hidden**-0.5
    u = lambda k, shp: jax.random.uniform(k, shp, jnp.float32, -s, s)
    return {
        "w_ih": u(k1, (in_dim, 4 * hidden)),
        "w_hh": u(k2, (hidden, 4 * hidden)),
        "b_ih": u(k3, (4 * hidden,)),
        "b_hh": u(k4, (4 * hidden,)),
    }


def speaker_encoder_init(key, mel_channels: int = 80, hidden: int = 256, emb: int = 256, layers: int = 3):
    keys = jax.random.split(key, layers + 1)
    s = hidden**-0.5
    return {
        "lstm": [
            _lstm_layer_init(keys[i], mel_channels if i == 0 else hidden, hidden) for i in range(layers)
        ],
        "linear": {
            "w": jax.random.uniform(keys[-1], (hidden, emb), jnp.float32, -s, s),
            "b": jnp.zeros((emb,)),
        },
    }


def _lstm_forward(layer, x):
    """x: (B, T, in) -> (outputs (B, T, H), h_last (B, H)). Torch gate order i,f,g,o."""
    b, t, _ = x.shape
    hdim = layer["w_hh"].shape[0]

    def step(carry, xt):
        h, c = carry
        gates = xt @ layer["w_ih"] + layer["b_ih"] + h @ layer["w_hh"] + layer["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    # carry in the activation dtype — an f32 init silently upcasts the whole
    # LSTM (and everything downstream of the speaker embedding) in bf16
    # serving until a conv dtype mismatch crashes (bf16 gate, round 5)
    init = (jnp.zeros((b, hdim), x.dtype), jnp.zeros((b, hdim), x.dtype))
    (h_last, _), outs = lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(outs, 0, 1), h_last


def speaker_encoder_apply(params, mels: jax.Array) -> jax.Array:
    """mels: (B, T, 80) -> L2-normalized embedding (B, emb)."""
    x = mels
    for layer in params["lstm"]:
        x, h_last = _lstm_forward(layer, x)
    e = jax.nn.relu(h_last @ params["linear"]["w"] + params["linear"]["b"])
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


def embed_utterance(params, mel: jax.Array, partial_frames: int = 128, partial_hop: int = 64) -> jax.Array:
    """Partial-slice averaged utterance embedding (vc/models.py:743-767).
    mel: (1, T, 80), T static."""
    t = mel.shape[1]
    if t <= partial_frames:
        return speaker_encoder_apply(params, mel[:, -partial_frames:])
    starts = list(range(0, t - partial_frames, partial_hop))
    slices = [mel[0, s : s + partial_frames] for s in starts]
    slices.append(mel[0, -partial_frames:])
    stack = jnp.stack(slices, axis=0)  # (N, partial, 80)
    embeds = speaker_encoder_apply(params, stack)
    e = jnp.mean(embeds, axis=0, keepdims=True)
    return e


# ---------------------------------------------------------------------------
# Synthesizer
# ---------------------------------------------------------------------------


def synthesizer_init(key, cfg: QuickVCConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "enc_p": posterior_init(k1, cfg.as_vits2(spec_channels=cfg.ssl_dim, gin=0)),
        "enc_q": posterior_init(k2, cfg.as_vits2()),
        "flow": flow_block_init(k3, cfg.as_vits2()),
        "dec": generator_init(k4, cfg.as_vits2()),
        "enc_spk": speaker_encoder_init(k5, cfg.n_mel_channels, cfg.gin_channels, cfg.gin_channels),
    }


def forward_train(params, cfg: QuickVCConfig, c, spec, mel, *, rng, c_lengths=None, spec_lengths=None):
    """vc/models.py:844-860. c: (B, Tc, 768) contentvec; spec: (B, Tc, F);
    mel: (B, Tc, 80) for the speaker embedding."""
    r_p, r_q, r_slice = jax.random.split(rng, 3)
    b = c.shape[0]
    if c_lengths is None:
        c_lengths = jnp.full((b,), c.shape[1], jnp.int32)
    if spec_lengths is None:
        spec_lengths = jnp.full((b,), spec.shape[1], jnp.int32)

    g = speaker_encoder_apply(params["enc_spk"], mel)[:, None, :]  # (B, 1, gin)

    vcfg_p = cfg.as_vits2(spec_channels=cfg.ssl_dim, gin=0)
    _, m_p, logs_p, _ = posterior_apply(params["enc_p"], vcfg_p, c, c_lengths, rng=r_p)
    z, m_q, logs_q, spec_mask = posterior_apply(params["enc_q"], cfg.as_vits2(), spec, spec_lengths, g, rng=r_q)
    z_p = flow_block_apply(params["flow"], cfg.as_vits2(), z, spec_mask, g)

    z_slice, ids_slice = rand_slice_segments(z, spec_lengths, cfg.segment_size, r_slice)
    o, o_mb = generator_apply(params["dec"], cfg.as_vits2(), z_slice, g)
    return {
        "wav": o, "wav_mb": o_mb, "ids_slice": ids_slice, "spec_mask": spec_mask,
        "z": z, "z_p": z_p, "m_p": m_p, "logs_p": logs_p, "m_q": m_q, "logs_q": logs_q,
    }


def infer(params, cfg: QuickVCConfig, c, tgt_mel, *, rng, c_lengths=None):
    """vc/models.py:862-872: content z_p ~ posterior(c), reverse flow with
    the target speaker embedding, decode."""
    b = c.shape[0]
    if c_lengths is None:
        c_lengths = jnp.full((b,), c.shape[1], jnp.int32)
    g = embed_utterance(params["enc_spk"], tgt_mel)[:, None, :]
    g = jnp.broadcast_to(g, (b, 1, g.shape[-1]))

    vcfg_p = cfg.as_vits2(spec_channels=cfg.ssl_dim, gin=0)
    z_p, m_p, logs_p, c_mask = posterior_apply(params["enc_p"], vcfg_p, c, c_lengths, rng=rng)
    z = flow_block_apply(params["flow"], cfg.as_vits2(), z_p, c_mask, g, reverse=True)
    o, _ = generator_apply(params["dec"], cfg.as_vits2(), z * c_mask, g)
    return o[..., 0]
