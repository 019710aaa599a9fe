"""HuBERT / ContentVec encoder in JAX (the VC content extractor).

The reference loads an HF ``HubertModel`` ("lengyue233/content-vec-best") and
takes ``last_hidden_state`` at 16 kHz (vc/contentvec.py:3-13, vc/encode.py).
This is the same computation as a JAX program: conv feature extractor
(7 layers, group-norm first), feature projection, conv positional embedding,
post-LN transformer stack. Weights convert from the HF state_dict
(``hubert_from_state_dict``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d


@dataclass(frozen=True)
class HubertConfig:
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"  # base: group-norm on first conv only
    do_stable_layer_norm: bool = False  # base: post-LN

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
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            feat_extract_norm=d.get("feat_extract_norm", "group"),
            do_stable_layer_norm=d.get("do_stable_layer_norm", False),
        )


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def hubert_apply(params, cfg: HubertConfig, wav: jax.Array) -> jax.Array:
    """wav: (B, T_samples) 16 kHz -> last hidden state (B, T_frames, hidden)."""
    x = wav[..., None]  # (B, T, 1)
    # --- conv feature extractor ---
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        c = params["conv_layers"][i]
        x = conv1d(x, c["w"], c.get("b"), stride=s, padding=0)
        if i == 0 and cfg.feat_extract_norm == "group":
            # GroupNorm(num_groups=dim, channels=dim) == per-channel instance norm
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * c["gn_gamma"] + c["gn_beta"]
        x = jax.nn.gelu(x, approximate=False)

    # --- feature projection ---
    x = _ln(x, params["fp_ln"], cfg.layer_norm_eps)
    x = x @ params["fp"]["w"] + params["fp"]["b"]

    # --- conv positional embedding (weight-norm folded) ---
    k = cfg.num_conv_pos_embeddings
    pad = k // 2
    pos = conv1d(x, params["pos_conv"]["w"], params["pos_conv"]["b"],
                 padding=pad, groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = _ln(x, params["enc_ln"], cfg.layer_norm_eps)

    # --- transformer stack (post-LN for base) ---
    b, t, h = x.shape
    heads = cfg.num_attention_heads
    dk = h // heads
    for layer in params["layers"]:
        q = (x @ layer["q"]["w"] + layer["q"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        kk = (x @ layer["k"]["w"] + layer["k"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        v = (x @ layer["v"]["w"] + layer["v"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, kk) / math.sqrt(dk)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3).reshape(b, t, h)
        x = _ln(x + (ctx @ layer["attn_out"]["w"] + layer["attn_out"]["b"]), layer["attn_ln"], cfg.layer_norm_eps)
        f = jax.nn.gelu(x @ layer["ffn_in"]["w"] + layer["ffn_in"]["b"], approximate=False)
        x = _ln(x + (f @ layer["ffn_out"]["w"] + layer["ffn_out"]["b"]), layer["ffn_ln"], cfg.layer_norm_eps)
    return x


def hubert_init(key, cfg: HubertConfig):
    keys = jax.random.split(key, 16 + 6 * cfg.num_hidden_layers)
    ki = iter(range(len(keys)))
    h = cfg.hidden_size

    def lin(k, a, b):
        s = a**-0.5
        return {"w": jax.random.uniform(k, (a, b), jnp.float32, -s, s), "b": jnp.zeros((b,))}

    def lnp(dim):
        return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}

    conv_layers = []
    in_dim = 1
    for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
        c = {"w": jax.random.normal(keys[next(ki)], (k, in_dim, dim)) * (in_dim * k) ** -0.5}
        if i == 0 and cfg.feat_extract_norm == "group":
            c["gn_gamma"] = jnp.ones((dim,))
            c["gn_beta"] = jnp.zeros((dim,))
        conv_layers.append(c)
        in_dim = dim
    p = {
        "conv_layers": conv_layers,
        "fp_ln": lnp(cfg.conv_dim[-1]),
        "fp": lin(keys[next(ki)], cfg.conv_dim[-1], h),
        "pos_conv": {
            "w": jax.random.normal(keys[next(ki)],
                                   (cfg.num_conv_pos_embeddings, h // cfg.num_conv_pos_embedding_groups, h)) * 0.02,
            "b": jnp.zeros((h,)),
        },
        "enc_ln": lnp(h),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        p["layers"].append({
            "q": lin(keys[next(ki)], h, h),
            "k": lin(keys[next(ki)], h, h),
            "v": lin(keys[next(ki)], h, h),
            "attn_out": lin(keys[next(ki)], h, h),
            "attn_ln": lnp(h),
            "ffn_in": lin(keys[next(ki)], h, cfg.intermediate_size),
            "ffn_out": lin(keys[next(ki)], cfg.intermediate_size, h),
            "ffn_ln": lnp(h),
        })
    return p


def hubert_from_state_dict(sd: dict, cfg: HubertConfig) -> dict:
    """HF HubertModel state_dict -> our pytree (weight-norm pos conv folded)."""
    from ..utils.torch_params import fold_weight_norm, linear, _np

    sd = fold_weight_norm(sd)
    conv_layers = []
    for i in range(len(cfg.conv_kernel)):
        base = f"feature_extractor.conv_layers.{i}"
        c = {"w": _np(sd[f"{base}.conv.weight"]).transpose(2, 1, 0)}
        if f"{base}.conv.bias" in sd:
            c["b"] = _np(sd[f"{base}.conv.bias"])
        if f"{base}.layer_norm.weight" in sd and i == 0:
            c["gn_gamma"] = _np(sd[f"{base}.layer_norm.weight"])
            c["gn_beta"] = _np(sd[f"{base}.layer_norm.bias"])
        conv_layers.append(c)
    # HF stores pos conv as parametrized weight-norm (original0/original1) or
    # plain weight_g/weight_v; normalize both spellings
    pw_key = "encoder.pos_conv_embed.conv.weight"
    if pw_key not in sd:
        if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
            g = _np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
            v = _np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
            # torch weight_norm dim=2 for pos conv: norm over (0,1)
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
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        p["layers"].append({
            "q": linear(sd, f"{b}.attention.q_proj"),
            "k": linear(sd, f"{b}.attention.k_proj"),
            "v": linear(sd, f"{b}.attention.v_proj"),
            "attn_out": linear(sd, f"{b}.attention.out_proj"),
            "attn_ln": {"gamma": _np(sd[f"{b}.layer_norm.weight"]), "beta": _np(sd[f"{b}.layer_norm.bias"])},
            "ffn_in": linear(sd, f"{b}.feed_forward.intermediate_dense"),
            "ffn_out": linear(sd, f"{b}.feed_forward.output_dense"),
            "ffn_ln": {"gamma": _np(sd[f"{b}.final_layer_norm.weight"]), "beta": _np(sd[f"{b}.final_layer_norm.bias"])},
        })
    return p
