"""Fused MRF res-pair Pallas kernel vs the XLA path (ops/wn.resblock1_apply),
interpret mode on CPU, every generator geometry used by the model zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vosk_tts_tpu.ops import mrf
from vosk_tts_tpu.ops import wn as wnops


@pytest.mark.parametrize("k,dil,c,t", [
    (3, (1, 3, 5), 128, 1024),
    (7, (1, 3, 5), 128, 1024),
    (11, (1, 3, 5), 128, 1024),
    (3, (1, 3, 5), 256, 2048),
    (11, (1, 3, 5), 256, 2048),
])
def test_fused_resblock_matches_xla(rng, k, dil, c, t):
    params = wnops.resblock1_init(jax.random.PRNGKey(0), c, k, dil)
    x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)

    ref = wnops.resblock1_apply(params, x, None, kernel_size=k, dilation=dil)
    got = mrf.resblock1_apply_fused(params, x, kernel_size=k, dilation=dil,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_res_pair_chunked(rng):
    """Multi-chunk path (t > chunk_t) must equal the single-chunk result."""
    c, t, k, d = 128, 4096, 11, 5
    params = wnops.resblock1_init(jax.random.PRNGKey(1), c, k, (d,))
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    c1, c2 = params["convs1"][0], params["convs2"][0]

    one = mrf.fused_res_pair(x, c1["w"], c1["b"], c2["w"], c2["b"],
                             kernel_size=k, dilation=d, chunk_t=4096,
                             interpret=True)
    many = mrf.fused_res_pair(x, c1["w"], c1["b"], c2["w"], c2["b"],
                              kernel_size=k, dilation=d, chunk_t=1024,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(many), np.asarray(one),
                               rtol=1e-6, atol=1e-6)


def test_supported_predicate():
    assert mrf.supported(8192, 256)
    assert mrf.supported(32768, 128)
    assert not mrf.supported(1000, 256)   # t not a block multiple
    assert not mrf.supported(8192, 72)    # c not lane-aligned


def test_generator_fused_matches_xla(rng, monkeypatch):
    """generator_apply(fused_mrf=True) must equal the XLA path at a
    supported geometry (the serving path flips this on under TPU)."""
    from vosk_tts_tpu.models import vits2

    monkeypatch.setattr(mrf, "INTERPRET", True)
    cfg = vits2.VITS2Config(
        inter_channels=32, hidden_channels=32, upsample_initial_channel=256,
        upsample_rates=(4, 4), upsample_kernel_sizes=(16, 16),
        n_speakers=2, gin_channels=16,
    )
    params = vits2.generator_init(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(rng.standard_normal((1, 512, cfg.inter_channels)), jnp.float32)
    ref = vits2.generator_apply(params, cfg, z, None)[0]
    got = vits2.generator_apply(params, cfg, z, None, fused_mrf=True)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
