"""torch module -> vosk_tts_tpu param-pytree converters (test-side).

Layout rules:
  Conv1d weight (O, I, K)          -> (K, I, O)
  depthwise Conv1d (C, 1, K)       -> (K, 1, C)
  ConvTranspose1d (I, O, K)        -> (K, I, O)
  Linear (O, I)                    -> (I, O)
Weight-normed modules are folded via remove_weight_norm before reading.
"""

import numpy as np
import torch


def _np(t):
    return t.detach().cpu().numpy()


def conv_p(m):
    return {"w": _np(m.weight).transpose(2, 1, 0), "b": _np(m.bias) if m.bias is not None else None}


def convT_p(m):
    return {"w": _np(m.weight).transpose(2, 0, 1), "b": _np(m.bias) if m.bias is not None else None}


def linear_p(m):
    return {"w": _np(m.weight).T, "b": _np(m.bias)}


def ln_p(m):
    return {"gamma": _np(m.gamma), "beta": _np(m.beta)}


def wn_p(m):
    m.remove_weight_norm()
    p = {
        "in": [conv_p(l) for l in m.in_layers],
        "res_skip": [conv_p(l) for l in m.res_skip_layers],
    }
    if m.gin_channels != 0:
        p["cond"] = conv_p(m.cond_layer)
    return p


def resblock1_p(m):
    m.remove_weight_norm()
    return {"convs1": [conv_p(c) for c in m.convs1], "convs2": [conv_p(c) for c in m.convs2]}


def resblock2_p(m):
    m.remove_weight_norm()
    return {"convs": [conv_p(c) for c in m.convs]}


def ddsconv_p(m):
    return {
        "sep": [conv_p(c) for c in m.convs_sep],
        "pw": [conv_p(c) for c in m.convs_1x1],
        "norm1": [ln_p(n) for n in m.norms_1],
        "norm2": [ln_p(n) for n in m.norms_2],
    }


def convrelunorm_p(m):
    return {
        "convs": [conv_p(c) for c in m.conv_layers],
        "norms": [ln_p(n) for n in m.norm_layers],
        "proj": conv_p(m.proj),
    }


def mha_p(m):
    p = {"q": conv_p(m.conv_q), "k": conv_p(m.conv_k), "v": conv_p(m.conv_v), "o": conv_p(m.conv_o)}
    if m.window_size is not None:
        p["emb_rel_k"] = _np(m.emb_rel_k)
        p["emb_rel_v"] = _np(m.emb_rel_v)
    return p


def ffn_p(m):
    return {"c1": conv_p(m.conv_1), "c2": conv_p(m.conv_2)}


def encoder_p(m):
    p = {
        "attn": [mha_p(a) for a in m.attn_layers],
        "ffn": [ffn_p(f) for f in m.ffn_layers],
        "norm1": [ln_p(n) for n in m.norm_layers_1],
        "norm2": [ln_p(n) for n in m.norm_layers_2],
    }
    if hasattr(m, "spk_emb_linear"):
        p["spk_emb"] = linear_p(m.spk_emb_linear)
    return p


def coupling_p(m):
    return {"pre": conv_p(m.pre), "enc": wn_p(m.enc), "post": conv_p(m.post)}


def convflow_p(m):
    return {"pre": conv_p(m.pre), "convs": ddsconv_p(m.convs), "proj": conv_p(m.proj)}


def elementwise_affine_p(m):
    return {"m": _np(m.m)[:, 0], "logs": _np(m.logs)[:, 0]}
