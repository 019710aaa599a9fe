"""Tensor-parallel vocoder sharding (SURVEY §2.10 TP row, VERDICT item 10).

On a 2 (data) x 4 (model) virtual mesh, the generator with Megatron-style
channel shardings must produce the SAME waveform as the single-device run —
GSPMD inserts the collectives; numerics must be unchanged — and each device
must address only 1/4 of the trunk weights (the HBM win that motivates TP).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vosk_tts_tpu.models import vits2
from vosk_tts_tpu.parallel import mesh as M
from vosk_tts_tpu.parallel import tp


def _cfg(decoder_type="mb_istft"):
    return vits2.VITS2Config(
        n_vocab=20, inter_channels=32, hidden_channels=32,
        upsample_initial_channel=128, n_speakers=4, gin_channels=16,
        decoder_type=decoder_type,
    )


@pytest.mark.parametrize("decoder_type", ["mb_istft", "hifigan"])
def test_tp_generator_matches_single_device(rng, decoder_type):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _cfg(decoder_type)
    params = vits2.generator_init(jax.random.PRNGKey(0), cfg)

    B, T = 2, 64
    z = jnp.asarray(rng.standard_normal((B, T, cfg.inter_channels)), jnp.float32)
    g = (jnp.asarray(rng.standard_normal((B, 1, cfg.gin_channels)), jnp.float32)
         if decoder_type == "hifigan" else None)

    def f(p, z, g):
        return vits2.generator_apply(p, cfg, z, g)[0]

    ref = np.asarray(jax.jit(f, static_argnums=())(params, z, g))

    mesh = M.make_mesh(n_data=2, n_model=4)
    p_sh = tp.shard_generator_params(mesh, params)
    z_sh = jax.device_put(z, NamedSharding(mesh, P("data")))
    g_sh = jax.device_put(g, NamedSharding(mesh, P("data"))) if g is not None else None

    out_sharding = NamedSharding(mesh, P("data"))
    f_tp = jax.jit(f, out_shardings=out_sharding)
    got = np.asarray(f_tp(p_sh, z_sh, g_sh))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_tp_shards_are_real(rng):
    """The widest weights must actually live 1/4-per-device (HBM headroom)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _cfg()
    params = vits2.generator_init(jax.random.PRNGKey(0), cfg)
    mesh = M.make_mesh(n_data=2, n_model=4)
    p_sh = tp.shard_generator_params(mesh, params)

    w = p_sh["conv_pre"]["w"]  # (7, inter, uic) column-parallel
    shard = w.addressable_shards[0].data
    assert shard.shape[2] == w.shape[2] // 4

    rb = p_sh["resblocks"][0]["convs1"][0]["w"]  # row-parallel
    assert rb.addressable_shards[0].data.shape[1] == rb.shape[1] // 4

    up = p_sh["ups"][0]["w"]
    assert up.addressable_shards[0].data.shape[2] == up.shape[2] // 4
