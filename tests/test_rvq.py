"""RVQ training mechanics golden tests vs the reference EuclideanCodebook
(/root/reference/training/gpt-sovits/module/core_vq.py:96-233): kmeans init,
EMA codebook update with Laplace smoothing, dead-code expiry ordering — plus
the wired-in make_s2_step integration."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import oracle
from vosk_tts_tpu.ops import rvq

K, D, N = 12, 6, 200


def oracle_core_vq():
    import importlib

    base = "/root/reference/training/gpt-sovits"
    if oracle._SHIM in sys.path:
        sys.path.remove(oracle._SHIM)
    sys.path.insert(0, oracle._SHIM)
    if base not in sys.path:
        sys.path.insert(1, base)
    return importlib.import_module("module.core_vq")


def test_kmeans_matches_reference(rng):
    cv = oracle_core_vq()
    samples = rng.standard_normal((N, D)).astype(np.float32)

    torch.manual_seed(7)
    ref_means, ref_bins = cv.kmeans(torch.from_numpy(samples), K, num_iters=10)

    # replay the reference's init sampling (randperm right after the seed)
    torch.manual_seed(7)
    idx = torch.randperm(N)[:K].numpy()
    means, bins = rvq.kmeans_run(jnp.asarray(samples), jnp.asarray(samples[idx]), 10)

    np.testing.assert_allclose(np.asarray(means), ref_means.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bins), ref_bins.numpy())


def _ref_codebook(cv, embed, threshold=2):
    cb = cv.EuclideanCodebook(dim=D, codebook_size=K, kmeans_init=False,
                              decay=0.9, epsilon=1e-5,
                              threshold_ema_dead_code=threshold)
    with torch.no_grad():
        cb.embed.copy_(torch.from_numpy(embed))
        cb.embed_avg.copy_(torch.from_numpy(embed))
    cb.train()
    return cb


@pytest.mark.parametrize("threshold", [0, 2])
def test_ema_update_matches_reference(rng, threshold):
    """Three training forwards: embed/embed_avg/cluster_size and the emitted
    codes must match the oracle exactly (the expiry branch is clobbered by
    the normalize — core_vq.py:216-231 — so buffers stay deterministic)."""
    cv = oracle_core_vq()
    embed0 = rng.standard_normal((K, D)).astype(np.float32)
    cb = _ref_codebook(cv, embed0, threshold)

    state = rvq.state_init(K, D, embed=embed0)
    key = jax.random.PRNGKey(0)

    for step in range(3):
        x = rng.standard_normal((N, D)).astype(np.float32)
        _, ref_codes = cb(torch.from_numpy(x)[None])  # (1,N)

        codes = rvq.quantize(state["embed"], jnp.asarray(x))
        key, sub = jax.random.split(key)
        state = rvq.ema_step(state, jnp.asarray(x), sub, decay=0.9,
                             threshold_ema_dead_code=float(threshold))

        np.testing.assert_array_equal(np.asarray(codes), ref_codes[0].numpy())
        np.testing.assert_allclose(np.asarray(state["cluster_size"]),
                                   cb.cluster_size.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state["embed_avg"]),
                                   cb.embed_avg.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state["embed"]),
                                   cb.embed.numpy(), rtol=1e-4, atol=1e-5)


def test_kmeans_init_on_first_batch(rng):
    """inited flips after the first update; embed leaves zero; second update
    does NOT re-init (cluster sizes keep EMA-decaying)."""
    state = rvq.state_init(K, D)
    assert float(state["inited"]) == 0
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    state = rvq.train_update(state, x, jax.random.PRNGKey(1), kmeans_iters=5)
    assert float(state["inited"]) == 1
    assert np.abs(np.asarray(state["embed"])).max() > 0
    embed1 = np.asarray(state["embed"])

    state = rvq.train_update(state, x, jax.random.PRNGKey(2), kmeans_iters=5)
    assert not np.allclose(np.asarray(state["embed"]), embed1)  # EMA moved it


def test_s2_step_updates_codebook(rng):
    """make_s2_step integration: vq buffers init + move, codebook mirror in
    params_g tracks vq['embed'], losses stay finite."""
    from vosk_tts_tpu.models import gpt_sovits as G
    from vosk_tts_tpu.train import gpt_sovits_train as T

    cfg = G.SoVITSConfig(
        spec_channels=65, inter_channels=32, hidden_channels=32, filter_channels=64,
        n_layers=4, upsample_initial_channel=64, upsample_rates=(4, 4),
        upsample_kernel_sizes=(16, 16), gin_channels=32, ssl_dim=16, n_codes=20,
        n_symbols=64, mrte_hidden=32, style_hidden=16, segment_size=8,
    )
    tcfg = T.S2TrainConfig(
        n_mel_channels=20, filter_length=128, hop_length=16, win_length=128,
        sampling_rate=3200, fft_sizes=(64, 32), hop_sizes=(8, 4), win_lengths=(32, 16),
        vq_kmeans_iters=5,
    )
    state = T.init_s2_state(jax.random.PRNGKey(0), cfg, tcfg)
    assert float(state["vq"]["inited"]) == 0

    b, tf = 2, 40
    batch = {
        "ssl": jnp.asarray(rng.standard_normal((b, tf, 16)), jnp.float32),
        "spec": jnp.asarray(rng.standard_normal((b, tf, 65)), jnp.float32),
        "spec_lengths": jnp.asarray([tf, tf - 8], jnp.int32),
        "text": jnp.asarray(rng.integers(0, 30, size=(b, 9)), jnp.int32),
        "text_lengths": jnp.asarray([9, 7], jnp.int32),
        "wav": jnp.asarray(rng.standard_normal((b, tf * 16)) * 0.3, jnp.float32),
    }
    step = jax.jit(T.make_s2_step(cfg, tcfg))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert float(state["vq"]["inited"]) == 1
    np.testing.assert_array_equal(np.asarray(state["params_g"]["codebook"]),
                                  np.asarray(state["vq"]["embed"]))
    embed1 = np.asarray(state["vq"]["embed"])

    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(state["vq"]["embed"]), embed1)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
