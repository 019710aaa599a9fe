"""WavLM encoder in JAX — the frozen SLM backbone of the WavLM/SLM losses
(training/vits2/losses.py:96-186 WavLMLoss; shipped config uses
wavlm-base-plus with 13 hidden states × 768).

Architecture = HuBERT (conv feature extractor + conv positional embedding +
post-LN transformer) plus WavLM's gated relative position bias: a bucketed
T5-style bias table shared across layers, gated per layer by a projection of
the query states. Weights convert from an HF ``WavLMModel`` state_dict.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d


@dataclass(frozen=True)
class WavLMConfig:
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"

    @classmethod
    def from_hf(cls, d: dict):
        return cls(
            conv_dim=tuple(d["conv_dim"]),
            conv_kernel=tuple(d["conv_kernel"]),
            conv_stride=tuple(d["conv_stride"]),
            hidden_size=d["hidden_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            num_conv_pos_embeddings=d.get("num_conv_pos_embeddings", 128),
            num_conv_pos_embedding_groups=d.get("num_conv_pos_embedding_groups", 16),
            num_buckets=d.get("num_buckets", 320),
            max_bucket_distance=d.get("max_bucket_distance", 800),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            feat_extract_norm=d.get("feat_extract_norm", "group"),
        )


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _relative_buckets(rel_pos: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """modeling_wavlm.py:253-271 (T5 bucket scheme, bidirectional)."""
    nb = num_buckets // 2
    buckets = (rel_pos > 0).astype(np.int64) * nb
    rel = np.abs(rel_pos)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(max_distance / max_exact) * (nb - max_exact)
    large = np.minimum((max_exact + large).astype(np.int64), nb - 1)
    return buckets + np.where(is_small, rel, large)


def wavlm_apply(params, cfg: WavLMConfig, wav: jax.Array):
    """wav: (B, T) 16 kHz -> list of hidden states [proj, layer1..layerN]
    (matching HF output_hidden_states ordering: 13 states for base)."""
    x = wav[..., None]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        c = params["conv_layers"][i]
        x = conv1d(x, c["w"], c.get("b"), stride=s, padding=0)
        if i == 0 and cfg.feat_extract_norm == "group":
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * c["gn_gamma"] + c["gn_beta"]
        x = jax.nn.gelu(x, approximate=False)

    x = _ln(x, params["fp_ln"], cfg.layer_norm_eps)
    x = x @ params["fp"]["w"] + params["fp"]["b"]

    k = cfg.num_conv_pos_embeddings
    pos = conv1d(x, params["pos_conv"]["w"], params["pos_conv"]["b"],
                 padding=k // 2, groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = _ln(x, params["enc_ln"], cfg.layer_norm_eps)

    b, t, h = x.shape
    heads = cfg.num_attention_heads
    dk = h // heads

    # shared bucketed position bias (first layer's table); buckets are static
    rel = np.arange(t)[None, :] - np.arange(t)[:, None]  # memory - context
    buckets = _relative_buckets(rel, cfg.num_buckets, cfg.max_bucket_distance)  # numpy (T,T)
    pos_bias = jnp.asarray(params["rel_attn_embed"])[jnp.asarray(buckets)].transpose(2, 0, 1)

    hidden_states = [x]
    for layer in params["layers"]:
        q = (x @ layer["q"]["w"] + layer["q"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        kk = (x @ layer["k"]["w"] + layer["k"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        v = (x @ layer["v"]["w"] + layer["v"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)

        # gated position bias (modeling_wavlm.py:165-180): gate from the
        # UN-projected hidden states reshaped per head
        gh = x.reshape(b, t, heads, dk).transpose(0, 2, 1, 3)  # (B,H,T,dk)
        proj = gh @ layer["gru_lin"]["w"] + layer["gru_lin"]["b"]  # (B,H,T,8)
        proj = proj.reshape(b, heads, t, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)  # (B,H,T,1) each
        gate = gate_a * (gate_b * layer["gru_const"].reshape(1, heads, 1, 1) - 1.0) + 2.0  # (B,H,T,1)
        gated_bias = gate * pos_bias[None]  # (B,H,T,T)

        scores = jnp.einsum("bhtd,bhsd->bhts", q, kk) / math.sqrt(dk) + gated_bias
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3).reshape(b, t, h)
        x = x + (ctx @ layer["out"]["w"] + layer["out"]["b"])
        x = _ln(x, layer["attn_ln"], cfg.layer_norm_eps)
        f = jax.nn.gelu(x @ layer["ffn_in"]["w"] + layer["ffn_in"]["b"], approximate=False)
        x = _ln(x + (f @ layer["ffn_out"]["w"] + layer["ffn_out"]["b"]), layer["ffn_ln"], cfg.layer_norm_eps)
        hidden_states.append(x)
    return hidden_states


def wavlm_from_state_dict(sd: dict, cfg: WavLMConfig) -> dict:
    """HF WavLMModel state_dict -> pytree."""
    from ..utils.torch_params import fold_weight_norm, linear, _np

    sd = fold_weight_norm(sd)
    conv_layers = []
    for i in range(len(cfg.conv_kernel)):
        base = f"feature_extractor.conv_layers.{i}"
        c = {"w": _np(sd[f"{base}.conv.weight"]).transpose(2, 1, 0)}
        if f"{base}.conv.bias" in sd:
            c["b"] = _np(sd[f"{base}.conv.bias"])
        if i == 0 and f"{base}.layer_norm.weight" in sd:
            c["gn_gamma"] = _np(sd[f"{base}.layer_norm.weight"])
            c["gn_beta"] = _np(sd[f"{base}.layer_norm.bias"])
        conv_layers.append(c)
    pw_key = "encoder.pos_conv_embed.conv.weight"
    if pw_key not in sd and "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = _np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
        v = _np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        sd[pw_key] = g * v / norm
    p = {
        "conv_layers": conv_layers,
        "fp_ln": {"gamma": _np(sd["feature_projection.layer_norm.weight"]),
                  "beta": _np(sd["feature_projection.layer_norm.bias"])},
        "fp": linear(sd, "feature_projection.projection"),
        "pos_conv": {"w": _np(sd[pw_key]).transpose(2, 1, 0),
                     "b": _np(sd["encoder.pos_conv_embed.conv.bias"])},
        "enc_ln": {"gamma": _np(sd["encoder.layer_norm.weight"]), "beta": _np(sd["encoder.layer_norm.bias"])},
        "rel_attn_embed": _np(sd["encoder.layers.0.attention.rel_attn_embed.weight"]),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        p["layers"].append({
            "q": linear(sd, f"{b}.attention.q_proj"),
            "k": linear(sd, f"{b}.attention.k_proj"),
            "v": linear(sd, f"{b}.attention.v_proj"),
            "out": linear(sd, f"{b}.attention.out_proj"),
            "gru_lin": linear(sd, f"{b}.attention.gru_rel_pos_linear"),
            "gru_const": _np(sd[f"{b}.attention.gru_rel_pos_const"]),
            "attn_ln": {"gamma": _np(sd[f"{b}.layer_norm.weight"]), "beta": _np(sd[f"{b}.layer_norm.bias"])},
            "ffn_in": linear(sd, f"{b}.feed_forward.intermediate_dense"),
            "ffn_out": linear(sd, f"{b}.feed_forward.output_dense"),
            "ffn_ln": {"gamma": _np(sd[f"{b}.final_layer_norm.weight"]), "beta": _np(sd[f"{b}.final_layer_norm.bias"])},
        })
    return p


def stacked_hidden_states(hidden_states) -> jax.Array:
    """Stack L states (B, T, H) -> (B, T, L*H) — the layout the WavLM
    discriminator consumes (losses.py:128-135 stack+transpose+flatten)."""
    return jnp.concatenate(hidden_states, axis=-1)
