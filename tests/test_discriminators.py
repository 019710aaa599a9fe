"""Golden tests: discriminators + losses vs reference torch implementations."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import oracle
import convert_helpers as ch

from vosk_tts_tpu.models import discriminators as D
from vosk_tts_tpu.train import losses as L

models_ref = oracle.vits2("models")
losses_ref = oracle.vits2("losses")

TOL = dict(rtol=2e-3, atol=2e-3)


def _fold(m):
    from torch.nn.utils import remove_weight_norm

    for mod in m.modules():
        try:
            remove_weight_norm(mod)
        except (ValueError, AttributeError):
            pass
    return m


def conv2d_p(c):
    return {"w": c.weight.detach().numpy().transpose(2, 3, 1, 0), "b": c.bias.detach().numpy()}


def test_disc_p(rng):
    torch.manual_seed(0)
    m = _fold(models_ref.DiscriminatorP(3))
    y = rng.standard_normal((2, 1000)).astype(np.float32) * 0.3
    with torch.no_grad():
        want, fmap_w = m(torch.from_numpy(y)[:, None, :])
    p = {"convs": [conv2d_p(c) for c in m.convs], "post": conv2d_p(m.conv_post)}
    got, fmap_g = D.disc_p_apply(p, jnp.asarray(y), 3)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)
    assert len(fmap_g) == len(fmap_w)
    # fmaps: ours NHWC, torch NCHW
    np.testing.assert_allclose(
        np.asarray(fmap_g[0]).transpose(0, 3, 1, 2), fmap_w[0].numpy(), **TOL
    )


def test_disc_s(rng):
    torch.manual_seed(0)
    m = _fold(models_ref.DiscriminatorS())
    y = rng.standard_normal((2, 1000)).astype(np.float32) * 0.3
    with torch.no_grad():
        want, fmap_w = m(torch.from_numpy(y)[:, None, :])
    p = {"convs": [ch.conv_p(c) for c in m.convs], "post": ch.conv_p(m.conv_post)}
    got, fmap_g = D.disc_s_apply(p, jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_disc_spec(rng):
    torch.manual_seed(0)
    m = _fold(models_ref.DiscriminatorSpec(512))
    y = rng.standard_normal((2, 2048)).astype(np.float32) * 0.3
    with torch.no_grad():
        want, fmap_w = m(torch.from_numpy(y)[:, None, :])
    p = {
        "band_convs": [[conv2d_p(c) for c in stack] for stack in m.band_convs],
        "post": conv2d_p(m.conv_post),
    }
    got, fmap_g = D.disc_spec_apply(p, jnp.asarray(y), 512)
    # ours NHWC (B, T, F, 1) vs torch NCHW (B, 1, T, F)
    np.testing.assert_allclose(np.asarray(got)[..., 0], want.numpy()[:, 0], **TOL)


def test_duration_disc2(rng):
    torch.manual_seed(0)
    m = models_ref.DurationDiscriminator2(16, 24, 3, 0.0)
    m.eval()
    b, t = 2, 12
    x = rng.standard_normal((b, t, 16)).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    dur_r = np.abs(rng.standard_normal((b, t, 1))).astype(np.float32)
    dur_g = np.abs(rng.standard_normal((b, t, 1))).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(mask.transpose(0, 2, 1)),
                 torch.from_numpy(dur_r.transpose(0, 2, 1)), torch.from_numpy(dur_g.transpose(0, 2, 1)))
    p = {
        "conv1": ch.conv_p(m.conv_1), "conv2": ch.conv_p(m.conv_2),
        "norm1": ch.ln_p(m.norm_1), "norm2": ch.ln_p(m.norm_2),
        "dur_proj": ch.conv_p(m.dur_proj),
        "pre_out_conv1": ch.conv_p(m.pre_out_conv_1), "pre_out_conv2": ch.conv_p(m.pre_out_conv_2),
        "pre_out_norm1": ch.ln_p(m.pre_out_norm_1), "pre_out_norm2": ch.ln_p(m.pre_out_norm_2),
        "output": ch.linear_p(m.output_layer[0]),
    }
    got = D.duration_disc_apply(p, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(dur_r), jnp.asarray(dur_g))
    # reference wraps each prob in a list
    np.testing.assert_allclose(np.asarray(got[0]), want[0][0].numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(got[1]), want[1][0].numpy(), **TOL)


def test_wavlm_disc(rng):
    torch.manual_seed(0)
    m = _fold(models_ref.WavLMDiscriminator(slm_hidden=32, slm_layers=4, initial_channel=8))
    x = rng.standard_normal((2, 32 * 4, 20)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x))
    p = {
        "pre": ch.conv_p(m.pre),
        "convs": [ch.conv_p(c) for c in m.convs],
        "post": ch.conv_p(m.conv_post),
    }
    got = D.wavlm_disc_apply(p, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_gan_losses(rng):
    drs = [rng.standard_normal((2, 50)).astype(np.float32) for _ in range(3)]
    dgs = [rng.standard_normal((2, 50)).astype(np.float32) for _ in range(3)]
    want_d, _, _ = losses_ref.discriminator_loss([torch.from_numpy(d) for d in drs], [torch.from_numpy(d) for d in dgs])
    got_d, _, _ = L.discriminator_loss([jnp.asarray(d) for d in drs], [jnp.asarray(d) for d in dgs])
    np.testing.assert_allclose(float(got_d), want_d.item(), rtol=1e-5)

    want_g, _ = losses_ref.generator_loss([torch.from_numpy(d) for d in drs], [torch.from_numpy(d) for d in dgs])
    got_g, _ = L.generator_loss([jnp.asarray(d) for d in dgs])
    np.testing.assert_allclose(float(got_g), want_g.item(), rtol=1e-5)

    want_t = losses_ref.discriminator_TPRLS_loss([torch.from_numpy(d) for d in drs], [torch.from_numpy(d) for d in dgs])
    got_t = L.discriminator_tprls_loss([jnp.asarray(d) for d in drs], [jnp.asarray(d) for d in dgs])
    np.testing.assert_allclose(float(got_t), want_t.item(), rtol=1e-3, atol=1e-5)


def test_feature_and_kl_losses(rng):
    f_r = [[rng.standard_normal((2, 4, 6)).astype(np.float32) for _ in range(2)] for _ in range(3)]
    f_g = [[rng.standard_normal((2, 4, 6)).astype(np.float32) for _ in range(2)] for _ in range(3)]
    want = losses_ref.feature_loss([[torch.from_numpy(a) for a in l] for l in f_r],
                                   [[torch.from_numpy(a) for a in l] for l in f_g])
    got = L.feature_loss([[jnp.asarray(a) for a in l] for l in f_r], [[jnp.asarray(a) for a in l] for l in f_g])
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-5)

    b, t, c = 2, 10, 8
    z_p = rng.standard_normal((b, t, c)).astype(np.float32)
    logs_q = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    m_p = rng.standard_normal((b, t, c)).astype(np.float32)
    logs_p = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    mask = (rng.random((b, t, 1)) > 0.2).astype(np.float32)
    want_kl = losses_ref.kl_loss(
        torch.from_numpy(z_p.transpose(0, 2, 1)), torch.from_numpy(logs_q.transpose(0, 2, 1)),
        torch.from_numpy(m_p.transpose(0, 2, 1)), torch.from_numpy(logs_p.transpose(0, 2, 1)),
        torch.from_numpy(mask.transpose(0, 2, 1)),
    )
    got_kl = L.kl_loss(jnp.asarray(z_p), jnp.asarray(logs_q), jnp.asarray(m_p), jnp.asarray(logs_p), jnp.asarray(mask))
    np.testing.assert_allclose(float(got_kl), want_kl.item(), rtol=1e-4)


def test_multi_res_stft_loss(rng):
    stft_loss_ref = oracle.vits2("stft_loss")
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    y = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    ffts, hops, wins = [384, 683, 171], [30, 60, 10], [150, 300, 60]
    m = stft_loss_ref.MultiResolutionSTFTLoss(ffts, hops, wins)
    with torch.no_grad():
        want_sc, want_mag = m(torch.from_numpy(x), torch.from_numpy(y))
    got_sc, got_mag = L.multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y), ffts, hops, wins)
    np.testing.assert_allclose(float(got_sc), want_sc.item(), rtol=1e-3)
    np.testing.assert_allclose(float(got_mag), want_mag.item(), rtol=1e-3)
