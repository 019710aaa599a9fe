"""Blocked-Toeplitz upsampling FIR == dense transposed conv, exactly.

Covers the shapes used by the decoder tails: iSTFT OLA (K=16, s=4, 72->4 and
18->1), PQMF synthesis (K=63, s=4, 4->1), ms-iSTFT multistream_conv_post
(K=63, s=4, 4->1, traced weights), plus adversarial K/s combinations
(K < s, K not multiple of s, q > R)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vosk_tts_tpu.ops import pqmf as pq
from vosk_tts_tpu.ops.blocked_fir import upfir_blocked, upsampled_corr
from vosk_tts_tpu.ops.conv import conv1d, conv_transpose1d


@pytest.mark.parametrize(
    "k,ci,co,s,t",
    [
        (16, 72, 4, 4, 37),
        (16, 18, 1, 4, 64),
        (63, 4, 1, 4, 50),
        (5, 3, 2, 4, 21),   # K not multiple of s, K > s
        (3, 2, 2, 4, 16),   # K < s
        (64, 4, 1, 4, 40),  # q = 15 > R for small blocks
        (7, 5, 3, 1, 33),   # stride 1 (plain conv as matmul)
    ],
)
def test_upfir_blocked_matches_conv_transpose(k, ci, co, s, t):
    rng = np.random.RandomState(k * 100 + ci + co + s + t)
    x = jnp.asarray(rng.randn(2, t, ci).astype(np.float32))
    w = rng.randn(k, ci, co).astype(np.float32)
    ref = conv_transpose1d(x, jnp.asarray(w), stride=s, padding=0)
    got = upfir_blocked(x, w, stride=s)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # traced-weight path (jnp weights)
    got_j = upfir_blocked(x, jnp.asarray(w), stride=s)
    np.testing.assert_allclose(np.asarray(got_j), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # explicit small block forces the q > R multi-chunk path
    got_b = upfir_blocked(x, w, stride=s, block=2)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upsampled_corr_matches_zero_stuff_conv():
    """upsampled_corr == [zero-stuff x gain -> pad (K-1)//2 -> correlate]."""
    rng = np.random.RandomState(0)
    s, k, ci, co, t = 4, 63, 4, 1, 41
    x = rng.randn(2, t, ci).astype(np.float32)
    w = rng.randn(k, ci, co).astype(np.float32)
    up = np.zeros((2, t * s, ci), np.float32)
    up[:, ::s] = x * float(s)
    ref = conv1d(jnp.asarray(up), jnp.asarray(w), padding=(k - 1) // 2)
    got = upsampled_corr(jnp.asarray(x), w, stride=s, gain=float(s))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    got_j = upsampled_corr(jnp.asarray(x), jnp.asarray(w), stride=s, gain=float(s))
    np.testing.assert_allclose(np.asarray(got_j), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pqmf_synthesis_matches_reference_formulation():
    """pqmf_synthesis == the reference's zero-stuff (x subbands) + pad +
    synthesis-filter conv (training/vc/quickvc pqmf.py:129-139)."""
    rng = np.random.RandomState(1)
    sub, taps = 4, 62
    x = rng.randn(2, 64, sub).astype(np.float32)
    _, h_s = pq.pqmf_filters(sub, taps)
    up = np.zeros((2, 64 * sub, sub), np.float32)
    up[:, ::sub] = x * float(sub)
    ref = conv1d(jnp.asarray(up), jnp.asarray(h_s.T[:, :, None]), padding=taps // 2)
    got = pq.pqmf_synthesis(jnp.asarray(x), subbands=sub)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
