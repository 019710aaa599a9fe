"""Golden tests: PQMF filterbank and monotonic alignment search."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import oracle

from vosk_tts_tpu.ops import pqmf_analysis, pqmf_synthesis, maximum_path
from refshim.monotonic_align import maximum_path_numpy

pqmf_ref = oracle.vits2("pqmf")


def test_pqmf_analysis_synthesis_match_reference(rng):
    m = pqmf_ref.PQMF(torch.device("cpu"))
    t = 4096
    x = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)
    xt = torch.from_numpy(x)[:, None, :]
    with torch.no_grad():
        bands_t = m.analysis(xt)
        rec_t = m.synthesis(bands_t)

    bands = pqmf_analysis(jnp.asarray(x)[..., None])
    np.testing.assert_allclose(np.asarray(bands).transpose(0, 2, 1), bands_t.numpy(), rtol=1e-4, atol=1e-5)

    rec = pqmf_synthesis(bands)
    np.testing.assert_allclose(np.asarray(rec)[..., 0], rec_t.numpy()[:, 0], rtol=1e-4, atol=1e-5)


def test_pqmf_near_perfect_reconstruction(rng):
    """In-band signals reconstruct with small ripple (the banks overlap at the
    transition edges, so white noise does not — sine content is the PR claim)."""
    t = 8192
    n = np.arange(t)
    x = sum(0.2 * np.sin(2 * np.pi * f * n / 22050) for f in (220.0, 440.0, 1317.0, 3250.0))
    x = x.astype(np.float32)[None]
    rec = np.asarray(pqmf_synthesis(pqmf_analysis(jnp.asarray(x)[..., None])))[..., 0]
    c = np.correlate(rec[0], x[0], "full")
    lag = int(c.argmax() - (t - 1))
    assert -62 <= lag < 62
    a = rec[0, max(lag, 0) : t + min(lag, 0)]
    b = x[0, : len(a)]
    # cutoff_ratio 0.15 (the reference's own choice) leaves a few % magnitude
    # ripple and phase distortion; assert strong correlation + energy match
    corr = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.97
    assert 0.8 < np.linalg.norm(a) / np.linalg.norm(b) < 1.2


def test_mas_matches_oracle(rng):
    b, t_y, t_x = 4, 37, 19
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    t_ys = rng.integers(t_x, t_y + 1, size=b).astype(np.int32)
    t_xs = rng.integers(5, t_x + 1, size=b).astype(np.int32)
    t_xs = np.minimum(t_xs, t_ys)

    want = maximum_path_numpy(neg_cent, t_ys, t_xs)

    y_mask = (np.arange(t_y)[None] < t_ys[:, None]).astype(np.float32)
    x_mask = (np.arange(t_x)[None] < t_xs[:, None]).astype(np.float32)
    attn_mask = y_mask[:, :, None] * x_mask[:, None, :]
    got = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(attn_mask)))
    np.testing.assert_array_equal(got, want)


def test_mas_path_properties(rng):
    b, t_y, t_x = 2, 25, 10
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    attn_mask = np.ones((b, t_y, t_x), np.float32)
    path = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(attn_mask)))
    # each output frame maps to exactly one input token
    assert (path.sum(-1) == 1).all()
    # monotonic, non-decreasing token index
    idx = path.argmax(-1)
    assert (np.diff(idx, axis=1) >= 0).all()
    assert (np.diff(idx, axis=1) <= 1).all()
    # every token is used at least once
    assert (path.sum(1) >= 1).all()


def test_mas_cpp_matches_oracle(rng):
    from vosk_tts_tpu.native import maximum_path_cpp

    b, t_y, t_x = 4, 43, 17
    neg_cent = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    t_ys = rng.integers(t_x, t_y + 1, size=b).astype(np.int32)
    t_xs = np.minimum(rng.integers(5, t_x + 1, size=b), t_ys).astype(np.int32)
    want = maximum_path_numpy(neg_cent, t_ys, t_xs)
    got = maximum_path_cpp(neg_cent, t_ys, t_xs)
    np.testing.assert_array_equal(got.astype(np.float32), want)
