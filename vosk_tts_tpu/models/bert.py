"""BERT encoder in JAX (ruBERT word embeddings for the multistream frontend).

The reference runs ruBERT through ONNX (vosk_tts/model.py:59-61,
synth.py:25-44) or HF transformers (stabletts matcha/text/__init__.py:47-67,
taking hidden_states[-3]). Here the same encoder runs as part of the JAX
program: standard post-LN BERT (embeddings + N transformer layers), returning
every hidden state. Weights convert from a HF ``BertModel`` state_dict
(utils/torch_params.bert_from_state_dict).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 119547
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def from_hf(cls, d: dict):
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            max_position_embeddings=d.get("max_position_embeddings", 512),
            type_vocab_size=d.get("type_vocab_size", 2),
            layer_norm_eps=d.get("layer_norm_eps", 1e-12),
        )


def _linear_init(key, c_in, c_out):
    wk, bk = jax.random.split(key)
    s = 0.02
    return {"w": jax.random.normal(wk, (c_in, c_out)) * s, "b": jnp.zeros((c_out,))}


def _ln():
    return None  # placeholder replaced in init


def bert_init(key, cfg: BertConfig):
    keys = jax.random.split(key, 4 + 6 * cfg.num_hidden_layers)
    ki = iter(range(len(keys)))
    h = cfg.hidden_size

    def ln_p():
        return {"gamma": jnp.ones((h,)), "beta": jnp.zeros((h,))}

    p = {
        "word_emb": jax.random.normal(keys[next(ki)], (cfg.vocab_size, h)) * 0.02,
        "pos_emb": jax.random.normal(keys[next(ki)], (cfg.max_position_embeddings, h)) * 0.02,
        "type_emb": jax.random.normal(keys[next(ki)], (cfg.type_vocab_size, h)) * 0.02,
        "emb_ln": ln_p(),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        p["layers"].append({
            "q": _linear_init(keys[next(ki)], h, h),
            "k": _linear_init(keys[next(ki)], h, h),
            "v": _linear_init(keys[next(ki)], h, h),
            "attn_out": _linear_init(keys[next(ki)], h, h),
            "attn_ln": ln_p(),
            "ffn_in": _linear_init(keys[next(ki)], h, cfg.intermediate_size),
            "ffn_out": _linear_init(keys[next(ki)], cfg.intermediate_size, h),
            "ffn_ln": ln_p(),
        })
    return p


def _ln_apply(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def bert_apply(params, cfg: BertConfig, input_ids, attention_mask=None, token_type_ids=None):
    """input_ids: (B, T) int32 -> list of hidden states [emb, layer1, ..., layerN]."""
    b, t = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)

    x = params["word_emb"][input_ids] + params["pos_emb"][jnp.arange(t)][None] + params["type_emb"][token_type_ids]
    x = _ln_apply(x, params["emb_ln"], cfg.layer_norm_eps)

    bias = jnp.where(attention_mask[:, None, None, :] == 0, -1e9, 0.0)
    heads = cfg.num_attention_heads
    dk = cfg.hidden_size // heads
    hidden_states = [x]
    for layer in params["layers"]:
        q = (x @ layer["q"]["w"] + layer["q"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        k = (x @ layer["k"]["w"] + layer["k"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        v = (x @ layer["v"]["w"] + layer["v"]["b"]).reshape(b, t, heads, dk).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(dk) + bias
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        x = _ln_apply(x + (ctx @ layer["attn_out"]["w"] + layer["attn_out"]["b"]), layer["attn_ln"], cfg.layer_norm_eps)
        f = jax.nn.gelu(x @ layer["ffn_in"]["w"] + layer["ffn_in"]["b"], approximate=False)
        x = _ln_apply(x + (f @ layer["ffn_out"]["w"] + layer["ffn_out"]["b"]), layer["ffn_ln"], cfg.layer_norm_eps)
        hidden_states.append(x)
    return hidden_states


class WordPieceTokenizer:
    """BertWordPieceTokenizer wrapper (same library the reference uses,
    vosk_tts/model.py:60)."""

    def __init__(self, vocab_path, lowercase: bool = True):
        from tokenizers.implementations import BertWordPieceTokenizer

        self.tok = BertWordPieceTokenizer(vocab=str(vocab_path), unk_token="[UNK]", lowercase=lowercase)

    def encode(self, text: str):
        return self.tok.encode(text)


class BertEncoder:
    """Bundled BERT: params + config + cached jitted forward per length bucket."""

    LENGTH_BUCKETS = (32, 64, 128, 256, 512)

    def __init__(self, params, config: dict):
        self.params = params
        self.cfg = BertConfig.from_hf(config)
        self._cache = {}

    def _jit(self, bucket):
        if bucket not in self._cache:
            cfg = self.cfg

            @jax.jit
            def run(params, ids, mask, types):
                hs = bert_apply(params, cfg, ids, mask, types)
                return jnp.stack(hs)  # (L+1, B, T, H)

            self._cache[bucket] = run
        return self._cache[bucket]

    def __call__(self, input_ids, attention_mask, token_type_ids):
        t = len(input_ids)
        bucket = next((bkt for bkt in self.LENGTH_BUCKETS if bkt >= t), self.LENGTH_BUCKETS[-1])
        ids = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        types = np.zeros((1, bucket), np.int32)
        ids[0, :t] = input_ids[:bucket]
        mask[0, :t] = attention_mask[:bucket]
        types[0, :t] = token_type_ids[:bucket]
        hs = np.asarray(self._jit(bucket)(self.params, ids, mask, types))
        return hs[:, 0, :t]  # (L+1, T, H)
