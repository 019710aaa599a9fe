"""Relative-position multi-head attention + conv FFN + transformer stacks.

Channels-last functional modules matching training/vits2/attentions.py:
  MultiHeadAttention (rel-pos window=4, rel->abs skew tricks :231-260,
  proximal bias :262), FFN (:274-320), Encoder (:13-65, speaker conditioning
  injected before layer ``cond_layer_idx``), Decoder (:67-115), FFT flow block
  (:396-454, gin via fused tanh-sigmoid gate).

Everything is dense matmul + pad/reshape. The banded rel-pos path has a
Pallas flash kernel (ops/flash_attention.py) engaged via ``flash=True`` on
TPU at serving lengths: the XLA band<->full conversions relayout O(T^2)
tensors and cost ~30x the attention itself at 2048 frames. Inference paths
pass flash=True; training keeps the XLA path (differentiable, and text
lengths ≤ ~400 make it cheap there).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from . import flash_attention as fa
from .commons import fused_gate, subsequent_mask
from .conv import conv1d
from .norm import layer_norm


def _dropout(x, p, rng):
    if rng is None or p <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def _xavier_conv1x1(key, c_in, c_out, dtype=jnp.float32):
    wk, bk = jax.random.split(key)
    a = math.sqrt(6.0 / (c_in + c_out))
    s = c_in**-0.5
    return {
        "w": jax.random.uniform(wk, (1, c_in, c_out), dtype, -a, a),
        "b": jax.random.uniform(bk, (c_out,), dtype, -s, s),
    }


# ---------------------------------------------------------------------------
# Relative-position MHA.
# ---------------------------------------------------------------------------


def mha_init(key, channels: int, out_channels: int, n_heads: int, *, window_size: int | None = None,
             heads_share: bool = True, proximal_init: bool = False):
    kq, kk, kv, ko, kr1, kr2 = jax.random.split(key, 6)
    k_channels = channels // n_heads
    p = {
        "q": _xavier_conv1x1(kq, channels, channels),
        "k": _xavier_conv1x1(kk, channels, channels),
        "v": _xavier_conv1x1(kv, channels, channels),
        "o": _xavier_conv1x1(ko, channels, out_channels),
    }
    if proximal_init:
        p["k"] = {"w": p["q"]["w"], "b": p["q"]["b"]}
    if window_size is not None:
        n_rel = 1 if heads_share else n_heads
        std = k_channels**-0.5
        p["emb_rel_k"] = jax.random.normal(kr1, (n_rel, 2 * window_size + 1, k_channels)) * std
        p["emb_rel_v"] = jax.random.normal(kr2, (n_rel, 2 * window_size + 1, k_channels)) * std
    return p


def _get_relative_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """Slice/pad the (n_rel, 2w+1, d) table to (n_rel, 2*length-1, d)
    (attentions.py:222-236)."""
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, slice_start : slice_start + 2 * length - 1]


def _relative_to_absolute(x: jax.Array) -> jax.Array:
    """(B, H, L, 2L-1) -> (B, H, L, L) via the pad/reshape skew
    (attentions.py:238-252)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jax.Array) -> jax.Array:
    """(B, H, L, L) -> (B, H, L, 2L-1) (attentions.py:254-264)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _band_to_full(rel: jax.Array, w: int, length: int) -> jax.Array:
    """(B, H, L, 2w+1) banded values -> (B, H, L, L) matrix with
    out[i, i+m-w] = rel[i, m]; zeros outside the band.

    TPU-critical: the reference skew trick (attentions.py:238-252) pads the
    (2w+1) table to (2L-1) first, making the rel-logit tensors O(L^2) — at
    2048 frames that is ~1 GB of HBM traffic per flow layer. This keeps the
    O(L·(2w+1)) band and expands via a single pad+reshape."""
    b, h, l, k = rel.shape
    pad = jnp.pad(rel, ((0, 0), (0, 0), (0, 0), (0, length + 1 - k)))
    flat = pad.reshape(b, h, l * (length + 1))
    flat = lax.dynamic_slice_in_dim(flat, w, l * length, axis=2)
    full = flat.reshape(b, h, l, length)
    i = lax.broadcasted_iota(jnp.int32, (l, length), 0)
    j = lax.broadcasted_iota(jnp.int32, (l, length), 1)
    return jnp.where(jnp.abs(i - j) <= w, full, 0.0)


def _full_to_band(p: jax.Array, w: int) -> jax.Array:
    """(B, H, L, L) -> (B, H, L, 2w+1) diagonal bands:
    out[i, m] = p[i, i+m-w] (zeros where out of range)."""
    b, h, l, _ = p.shape
    k = 2 * w + 1
    flat = p.reshape(b, h, l * l)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (w, l - w)))
    band = flat.reshape(b, h, l, l + 1)[..., :k]
    i = lax.broadcasted_iota(jnp.int32, (l, k), 0)
    m = lax.broadcasted_iota(jnp.int32, (l, k), 1)
    valid = (i + m - w >= 0) & (i + m - w < l)
    return jnp.where(valid, band, 0.0)


def _proximal_bias(length: int) -> jax.Array:
    r = jnp.arange(length, dtype=jnp.float32)
    diff = r[None, :] - r[:, None]
    return (-jnp.log1p(jnp.abs(diff)))[None, None]


def mha_apply(
    params,
    x: jax.Array,
    c: jax.Array,
    attn_mask: jax.Array | None = None,
    *,
    n_heads: int,
    window_size: int | None = None,
    proximal_bias: bool = False,
    p_dropout: float = 0.0,
    rng=None,
    flash: bool = False,
    kv_len: jax.Array | None = None,
) -> jax.Array:
    """x (query src): (B, Tt, C); c (key/value src): (B, Ts, C);
    attn_mask: broadcastable to (B, 1|H, Tt, Ts).

    ``flash=True`` routes banded self-attention through the Pallas kernel
    (ops/flash_attention.py) when the backend/shape support it — the XLA
    banded path materializes O(T^2) relayouts and is ~30x slower at serving
    lengths. ``kv_len`` (B,) gives the valid key prefix (defaults to Ts);
    callers must pass it when sequences are padded. The kernel path assumes
    the sequence-mask structure of ``attn_mask`` (valid prefix per batch row)
    rather than reading the mask itself.
    """
    b, t_t, channels = x.shape
    t_s = c.shape[1]
    k_channels = channels // n_heads

    q = conv1d(x, params["q"]["w"], params["q"]["b"])
    k = conv1d(c, params["k"]["w"], params["k"]["b"])
    v = conv1d(c, params["v"]["w"], params["v"]["b"])

    # (B, T, C) -> (B, H, T, Dk)
    q = q.reshape(b, t_t, n_heads, k_channels).transpose(0, 2, 1, 3)
    k = k.reshape(b, t_s, n_heads, k_channels).transpose(0, 2, 1, 3)
    v = v.reshape(b, t_s, n_heads, k_channels).transpose(0, 2, 1, 3)

    use_flash = (
        flash
        and window_size is not None
        and x is c
        and not proximal_bias
        and (rng is None or p_dropout <= 0.0)
        and fa.supported(t_t, t_s, window_size, x.dtype)
        and (jax.default_backend() == "tpu" or fa.INTERPRET)
    )
    if use_flash:
        qs = q * (k_channels**-0.5)
        if kv_len is None:
            kv_len = jnp.full((b,), t_s, jnp.int32)
        out = fa.banded_flash_attention(qs, k, v, params["emb_rel_k"],
                                        params["emb_rel_v"], kv_len,
                                        window=window_size, interpret=fa.INTERPRET)
        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, channels)
        return conv1d(out, params["o"]["w"], params["o"]["b"])

    scores = jnp.einsum("bhtd,bhsd->bhts", q / math.sqrt(k_channels), k)
    # banded fast path: keep relative logits at O(L·(2w+1)) instead of
    # padding the table to (2L-1) like the reference skew (attentions.py:222)
    banded = window_size is not None and t_s >= 2 * window_size + 1
    if window_size is not None and not banded:
        rel_k = _get_relative_embeddings(params["emb_rel_k"], t_s, window_size)
        rel_logits = jnp.einsum("bhld,hmd->bhlm", q / math.sqrt(k_channels), rel_k)
        scores = scores + _relative_to_absolute(rel_logits)
    elif banded:
        rel_band = jnp.einsum("bhld,hmd->bhlm", q / math.sqrt(k_channels), params["emb_rel_k"])
        scores = scores + _band_to_full(rel_band, window_size, t_s)
    if proximal_bias:
        scores = scores + _proximal_bias(t_s)
    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    p_attn = _dropout(p_attn, p_dropout, rng)
    output = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)
    if window_size is not None and not banded:
        rel_w = _absolute_to_relative(p_attn)
        rel_v = _get_relative_embeddings(params["emb_rel_v"], t_s, window_size)
        output = output + jnp.einsum("bhlm,hmd->bhld", rel_w, rel_v)
    elif banded:
        rel_w_band = _full_to_band(p_attn, window_size)
        output = output + jnp.einsum("bhlm,hmd->bhld", rel_w_band, params["emb_rel_v"])
    output = output.transpose(0, 2, 1, 3).reshape(b, t_t, channels)
    return conv1d(output, params["o"]["w"], params["o"]["b"])


# ---------------------------------------------------------------------------
# Conv FFN.
# ---------------------------------------------------------------------------


def ffn_init(key, in_ch: int, out_ch: int, filter_ch: int, kernel_size: int):
    k1, k2 = jax.random.split(key)
    from .wn import _conv_init

    return {"c1": _conv_init(k1, kernel_size, in_ch, filter_ch), "c2": _conv_init(k2, kernel_size, filter_ch, out_ch)}


def ffn_apply(params, x, x_mask, *, kernel_size: int, activation: str | None = None,
              causal: bool = False, p_dropout: float = 0.0, rng=None):
    if kernel_size == 1:
        pad = ((0, 0),)
    elif causal:
        pad = ((kernel_size - 1, 0),)
    else:
        pad = (((kernel_size - 1) // 2, kernel_size // 2),)
    x = conv1d(x * x_mask, params["c1"]["w"], params["c1"]["b"], padding=pad[0])
    if activation == "gelu":
        x = x * jax.nn.sigmoid(1.702 * x)
    else:
        x = jax.nn.relu(x)
    x = _dropout(x, p_dropout, rng)
    x = conv1d(x * x_mask, params["c2"]["w"], params["c2"]["b"], padding=pad[0])
    return x * x_mask


# ---------------------------------------------------------------------------
# Encoder stack (rel-pos transformer, optional speaker conditioning).
# ---------------------------------------------------------------------------


def encoder_init(key, hidden: int, filter_ch: int, n_heads: int, n_layers: int, kernel_size: int,
                 *, window_size: int = 4, gin: int = 0):
    keys = jax.random.split(key, 2 * n_layers + 1)
    p = {
        "attn": [mha_init(keys[2 * i], hidden, hidden, n_heads, window_size=window_size) for i in range(n_layers)],
        "ffn": [ffn_init(keys[2 * i + 1], hidden, hidden, filter_ch, kernel_size) for i in range(n_layers)],
        "norm1": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
        "norm2": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
    }
    if gin:
        wk, bk = jax.random.split(keys[-1])
        a = math.sqrt(6.0 / (gin + hidden))  # torch nn.Linear default is kaiming-uniform; close enough for init
        s = gin**-0.5
        p["spk_emb"] = {
            "w": jax.random.uniform(wk, (gin, hidden), minval=-s, maxval=s),
            "b": jax.random.uniform(bk, (hidden,), minval=-s, maxval=s),
        }
    return p


def encoder_apply(params, x, x_mask, g=None, *, n_heads: int, kernel_size: int,
                  window_size: int = 4, cond_layer_idx: int = 2, p_dropout: float = 0.0, rng=None,
                  flash: bool = False):
    """attentions.py:49-65. x: (B, T, H); x_mask: (B, T, 1); g: (B, 1, gin)."""
    attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
    kv_len = jnp.sum(x_mask[..., 0].astype(jnp.int32), axis=1) if flash else None
    x = x * x_mask
    n_layers = len(params["attn"])
    for i in range(n_layers):
        if g is not None and i == cond_layer_idx:
            gp = g @ params["spk_emb"]["w"] + params["spk_emb"]["b"]
            x = (x + gp) * x_mask
        rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
        y = mha_apply(params["attn"][i], x, x, attn_mask, n_heads=n_heads,
                      window_size=window_size, p_dropout=p_dropout, rng=rngs[0],
                      flash=flash, kv_len=kv_len)
        y = _dropout(y, p_dropout, rngs[1])
        x = layer_norm(x + y, params["norm1"][i]["gamma"], params["norm1"][i]["beta"])
        y = ffn_apply(params["ffn"][i], x, x_mask, kernel_size=kernel_size, p_dropout=p_dropout, rng=rngs[2])
        y = _dropout(y, p_dropout, rngs[2])
        x = layer_norm(x + y, params["norm2"][i]["gamma"], params["norm2"][i]["beta"])
        if rng is not None:
            rng = jax.random.fold_in(rng, i)
    return x * x_mask


# ---------------------------------------------------------------------------
# Decoder stack — causal self-attn + encoder cross-attn (attentions.py:67-115)
# ---------------------------------------------------------------------------


def decoder_init(key, hidden: int, filter_ch: int, n_heads: int, n_layers: int, kernel_size: int,
                 *, proximal_init: bool = True):
    keys = jax.random.split(key, 3 * n_layers)
    return {
        "self_attn": [
            mha_init(keys[3 * i], hidden, hidden, n_heads, proximal_init=proximal_init)
            for i in range(n_layers)
        ],
        "cross_attn": [mha_init(keys[3 * i + 1], hidden, hidden, n_heads) for i in range(n_layers)],
        "ffn": [ffn_init(keys[3 * i + 2], hidden, hidden, filter_ch, kernel_size) for i in range(n_layers)],
        "norm0": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
        "norm1": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
        "norm2": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
    }


def decoder_apply(params, x, x_mask, h, h_mask, *, n_heads: int, kernel_size: int,
                  proximal_bias: bool = False, p_dropout: float = 0.0, rng=None):
    """x: decoder input (B, Tx, H); h: encoder output (B, Th, H)."""
    t = x.shape[1]
    self_mask = subsequent_mask(t)[None]  # (1,1,T,T)
    cross_mask = h_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
    x = x * x_mask
    n_layers = len(params["self_attn"])
    for i in range(n_layers):
        y = mha_apply(params["self_attn"][i], x, x, self_mask, n_heads=n_heads,
                      proximal_bias=proximal_bias, p_dropout=p_dropout, rng=rng)
        x = layer_norm(x + y, params["norm0"][i]["gamma"], params["norm0"][i]["beta"])
        y = mha_apply(params["cross_attn"][i], x, h, cross_mask, n_heads=n_heads,
                      p_dropout=p_dropout, rng=rng)
        x = layer_norm(x + y, params["norm1"][i]["gamma"], params["norm1"][i]["beta"])
        y = ffn_apply(params["ffn"][i], x, x_mask, kernel_size=kernel_size, causal=True,
                      p_dropout=p_dropout, rng=rng)
        x = layer_norm(x + y, params["norm2"][i]["gamma"], params["norm2"][i]["beta"])
    return x * x_mask


# ---------------------------------------------------------------------------
# FFT block — causal self-attention flow core (attentions.py:396-454).
# ---------------------------------------------------------------------------


def fft_init(key, hidden: int, filter_ch: int, n_heads: int, n_layers: int, kernel_size: int, *, gin: int = 0):
    keys = jax.random.split(key, 2 * n_layers + 2)
    p = {
        "attn": [mha_init(keys[2 * i], hidden, hidden, n_heads, proximal_init=True) for i in range(n_layers)],
        "ffn": [ffn_init(keys[2 * i + 1], hidden, hidden, filter_ch, kernel_size) for i in range(n_layers)],
        "norm0": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
        "norm1": [{"gamma": jnp.ones((hidden,)), "beta": jnp.zeros((hidden,))} for _ in range(n_layers)],
    }
    if gin:
        p["cond_layer"] = _xavier_conv1x1(keys[-2], gin, 2 * hidden * n_layers)
        p["cond_pre"] = _xavier_conv1x1(keys[-1], hidden, 2 * hidden)
    return p


def fft_apply(params, x, x_mask, g=None, *, n_heads: int, kernel_size: int, p_dropout: float = 0.0, rng=None):
    hidden = x.shape[-1]
    n_layers = len(params["attn"])
    if g is not None:
        g = conv1d(g, params["cond_layer"]["w"], params["cond_layer"]["b"])
    t = x.shape[1]
    self_mask = subsequent_mask(t)[None]  # (1, 1, T, T)
    x = x * x_mask
    for i in range(n_layers):
        if g is not None:
            xp = conv1d(x, params["cond_pre"]["w"], params["cond_pre"]["b"])
            g_l = g[..., 2 * hidden * i : 2 * hidden * (i + 1)]
            x = fused_gate(xp, g_l)
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        y = mha_apply(params["attn"][i], x, x, self_mask, n_heads=n_heads, p_dropout=p_dropout, rng=rngs[0])
        y = _dropout(y, p_dropout, rngs[0])
        x = layer_norm(x + y, params["norm0"][i]["gamma"], params["norm0"][i]["beta"])
        y = ffn_apply(params["ffn"][i], x, x_mask, kernel_size=kernel_size, causal=True,
                      p_dropout=p_dropout, rng=rngs[1])
        y = _dropout(y, p_dropout, rngs[1])
        x = layer_norm(x + y, params["norm1"][i]["gamma"], params["norm1"][i]["beta"])
        if rng is not None:
            rng = jax.random.fold_in(rng, i)
    return x * x_mask
