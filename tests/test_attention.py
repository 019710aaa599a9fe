"""Golden tests: rel-pos MHA / FFN / Encoder / FFT vs reference attentions.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import oracle
import convert_helpers as ch

from vosk_tts_tpu.ops import mha_apply, ffn_apply, encoder_apply, fft_apply

attentions = oracle.vits2("attentions")

TOL = dict(rtol=2e-4, atol=2e-4)


def _mask(rng, b, t):
    lengths = rng.integers(t // 2, t + 1, size=b)
    return (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)


@pytest.mark.parametrize("window_size", [None, 4])
def test_mha_self_attention(rng, window_size):
    torch.manual_seed(0)
    c, heads = 32, 4
    m = attentions.MultiHeadAttention(c, c, heads, window_size=window_size)
    m.eval()
    b, t = 2, 17
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    mask = _mask(rng, b, t)
    attn_mask_t = torch.from_numpy(mask[:, None, :])  # (B,1,T)
    am = attn_mask_t.unsqueeze(2) * attn_mask_t.unsqueeze(-1)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(x.transpose(0, 2, 1)), attn_mask=am).numpy()
    p = ch.mha_p(m)
    am_j = jnp.asarray(mask)[:, None, :, None] * jnp.asarray(mask)[:, None, None, :]
    got = mha_apply(p, jnp.asarray(x), jnp.asarray(x), am_j, n_heads=heads, window_size=window_size)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1) * mask[:, None, :], want * mask[:, None, :], **TOL)


def test_mha_cross_attention(rng):
    torch.manual_seed(0)
    c, heads = 32, 2
    m = attentions.MultiHeadAttention(c, c, heads)
    m.eval()
    b, tt, ts = 2, 11, 19
    x = rng.standard_normal((b, tt, c)).astype(np.float32)
    cc = rng.standard_normal((b, ts, c)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(cc.transpose(0, 2, 1))).numpy()
    got = mha_apply(ch.mha_p(m), jnp.asarray(x), jnp.asarray(cc), None, n_heads=heads)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, **TOL)


@pytest.mark.parametrize("causal,kernel", [(False, 3), (True, 3), (False, 1)])
def test_ffn(rng, causal, kernel):
    torch.manual_seed(0)
    m = attentions.FFN(16, 16, 64, kernel, causal=causal)
    m.eval()
    b, t = 2, 15
    x = rng.standard_normal((b, t, 16)).astype(np.float32)
    mask = _mask(rng, b, t)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(mask[:, None, :])).numpy()
    got = ffn_apply(ch.ffn_p(m), jnp.asarray(x), jnp.asarray(mask[..., None]), kernel_size=kernel, causal=causal)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, **TOL)


@pytest.mark.parametrize("gin", [0, 64])
def test_encoder(rng, gin):
    torch.manual_seed(0)
    h, fc, heads, layers, k = 32, 64, 4, 4, 3
    kwargs = {"gin_channels": gin} if gin else {}
    m = attentions.Encoder(h, fc, heads, layers, kernel_size=k, p_dropout=0.0, window_size=4, **kwargs)
    m.eval()
    b, t = 2, 21
    x = rng.standard_normal((b, t, h)).astype(np.float32)
    mask = _mask(rng, b, t)
    g = rng.standard_normal((b, 1, gin)).astype(np.float32) if gin else None
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(mask[:, None, :]),
                 g=torch.from_numpy(g.transpose(0, 2, 1)) if gin else None).numpy()
    p = ch.encoder_p(m)
    got = encoder_apply(p, jnp.asarray(x), jnp.asarray(mask[..., None]),
                        jnp.asarray(g) if gin else None, n_heads=heads, kernel_size=k, window_size=4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("gin", [0, 32])
def test_fft_block(rng, gin):
    torch.manual_seed(0)
    h, fc, heads, layers, k = 16, 32, 2, 2, 3
    kwargs = {"isflow": True, "gin_channels": gin} if gin else {}
    m = attentions.FFT(h, fc, heads, n_layers=layers, kernel_size=k, p_dropout=0.0, **kwargs)
    m.eval()
    b, t = 2, 13
    x = rng.standard_normal((b, t, h)).astype(np.float32)
    mask = _mask(rng, b, t)
    g = rng.standard_normal((b, 1, gin)).astype(np.float32) if gin else None
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(mask[:, None, :]),
                 g=torch.from_numpy(g.transpose(0, 2, 1)) if gin else None).numpy()
    # fold weight norm on cond layer before conversion
    p = {}
    if gin:
        from torch.nn.utils import remove_weight_norm
        remove_weight_norm(m.cond_layer)
        p["cond_layer"] = ch.conv_p(m.cond_layer)
        p["cond_pre"] = ch.conv_p(m.cond_pre)
    p.update({
        "attn": [ch.mha_p(a) for a in m.self_attn_layers],
        "ffn": [ch.ffn_p(f) for f in m.ffn_layers],
        "norm0": [ch.ln_p(n) for n in m.norm_layers_0],
        "norm1": [ch.ln_p(n) for n in m.norm_layers_1],
    })
    got = fft_apply(p, jnp.asarray(x), jnp.asarray(mask[..., None]),
                    jnp.asarray(g) if gin else None, n_heads=heads, kernel_size=k)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=1e-3, atol=1e-3)


def test_decoder_stack(rng):
    from vosk_tts_tpu.ops import attention as A
    import convert_helpers as ch

    torch.manual_seed(0)
    h, fc, heads, layers, k = 16, 32, 2, 2, 3
    m = attentions.Decoder(h, fc, heads, layers, kernel_size=k, p_dropout=0.0)
    m.eval()
    b, tx, th = 2, 9, 13
    x = rng.standard_normal((b, tx, h)).astype(np.float32)
    hh = rng.standard_normal((b, th, h)).astype(np.float32)
    x_mask = np.ones((b, tx), np.float32)
    h_mask = _mask(rng, b, th)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(x_mask[:, None, :]),
                 torch.from_numpy(hh.transpose(0, 2, 1)), torch.from_numpy(h_mask[:, None, :])).numpy()
    p = {
        "self_attn": [ch.mha_p(a) for a in m.self_attn_layers],
        "cross_attn": [ch.mha_p(a) for a in m.encdec_attn_layers],
        "ffn": [ch.ffn_p(f) for f in m.ffn_layers],
        "norm0": [ch.ln_p(n) for n in m.norm_layers_0],
        "norm1": [ch.ln_p(n) for n in m.norm_layers_1],
        "norm2": [ch.ln_p(n) for n in m.norm_layers_2],
    }
    got = A.decoder_apply(p, jnp.asarray(x), jnp.asarray(x_mask[..., None]),
                          jnp.asarray(hh), jnp.asarray(h_mask[..., None]),
                          n_heads=heads, kernel_size=k)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=1e-3, atol=1e-3)
