"""BigVGAN vocoder tests: alias-free samplers + forward shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vosk_tts_tpu.models import bigvgan as BV


def test_alias_free_samplers(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 4)).astype(np.float32))
    up = BV._upsample2(x)
    assert up.shape == (2, 128, 4)
    down = BV._downsample2(up)
    assert down.shape == (2, 64, 4)
    # up+down roundtrip approximates identity for lowpass content
    t = np.arange(128, dtype=np.float64)
    sine = np.sin(2 * np.pi * 5 * t / 128).astype(np.float32)[None, :, None]
    rec = np.asarray(BV._downsample2(BV._upsample2(jnp.asarray(sine))))
    err = np.abs(rec[0, 10:-10, 0] - sine[0, 10:-10, 0])
    assert err.max() < 0.02


def test_bigvgan_forward(rng):
    cfg = BV.BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    params = BV.bigvgan_init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.standard_normal((1, 20, 8)).astype(np.float32))
    wav = BV.bigvgan_apply(params, cfg, mel)
    assert wav.shape == (1, 20 * 8)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_snake_activation():
    x = jnp.linspace(-2, 2, 32).reshape(1, 32, 1)
    alpha = jnp.zeros((1,))  # logscale -> alpha=1
    y = BV._snake(x, alpha, None, logscale=True, variant="snake")
    want = np.asarray(x) + np.sin(np.asarray(x)) ** 2
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)
