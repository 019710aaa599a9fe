"""Golden tests: conv ops vs torch (CPU) semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from vosk_tts_tpu.ops.conv import conv1d, conv_transpose1d, depthwise_conv1d


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("k,dilation,groups", [(1, 1, 1), (3, 1, 1), (5, 1, 1), (3, 3, 1), (5, 2, 1), (3, 1, 4)])
def test_conv1d_same_matches_torch(rng, k, dilation, groups):
    b, t, cin, cout = 2, 37, 8, 12
    x = rng.standard_normal((b, t, cin), dtype=np.float32)
    w = rng.standard_normal((k, cin // groups, cout), dtype=np.float32)
    bias = rng.standard_normal((cout,), dtype=np.float32)

    pad = (k * dilation - dilation) // 2  # reference get_padding (commons.py:14)
    y = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), padding=pad, dilation=dilation, groups=groups)

    xt = torch.from_numpy(x).permute(0, 2, 1)
    wt = torch.from_numpy(w).permute(2, 1, 0)  # (K, I, O) -> (O, I, K)
    yt = tF.conv1d(xt, wt, torch.from_numpy(bias), padding=pad, dilation=dilation, groups=groups)
    np.testing.assert_allclose(_np(y), yt.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,padding", [
    (16, 4, 6),   # HiFiGAN/vosk 0.9 config: upsample_rates [4,4], kernels [16,16]
    (16, 8, 4),
    (8, 4, 2),
    (4, 2, 1),
    (4, 2, 0),    # tail-extension case: out_len > T*stride
    (3, 2, 1),    # non-divisible K -> general fallback path
    (5, 3, 1),
    (63, 1, 31),  # multistream_conv_post k=63 (models.py:1107) as stride-1 transpose
    (4, 4, 0),    # PQMF/updown filter style (stride == k)
])
def test_conv_transpose1d_matches_torch(rng, k, stride, padding):
    b, t, cin, cout = 2, 29, 6, 10
    x = rng.standard_normal((b, t, cin), dtype=np.float32)
    w = rng.standard_normal((k, cin, cout), dtype=np.float32)
    bias = rng.standard_normal((cout,), dtype=np.float32)

    y = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), stride=stride, padding=padding)

    xt = torch.from_numpy(x).permute(0, 2, 1)
    wt = torch.from_numpy(w).permute(1, 2, 0)  # (K, I, O) -> (I, O, K)
    yt = tF.conv_transpose1d(xt, wt, torch.from_numpy(bias), stride=stride, padding=padding)
    np.testing.assert_allclose(_np(y), yt.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_depthwise_matches_torch(rng):
    b, t, c, k = 2, 31, 16, 5
    dilation = 5  # DDSConv uses dilation = kernel**i (modules.py:87)
    x = rng.standard_normal((b, t, c), dtype=np.float32)
    w = rng.standard_normal((k, 1, c), dtype=np.float32)
    pad = (k * dilation - dilation) // 2
    y = depthwise_conv1d(jnp.asarray(x), jnp.asarray(w), padding=pad, dilation=dilation)
    xt = torch.from_numpy(x).permute(0, 2, 1)
    wt = torch.from_numpy(w).permute(2, 1, 0)
    yt = tF.conv1d(xt, wt, padding=pad, dilation=dilation, groups=c)
    np.testing.assert_allclose(_np(y), yt.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-4)
