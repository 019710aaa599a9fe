"""Golden test: JAX WavLM vs HF transformers WavLMModel."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vosk_tts_tpu.models import wavlm as W


def test_wavlm_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=50,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    torch.manual_seed(0)
    m = transformers.WavLMModel(hf_cfg)
    m.eval()

    wav = (rng.standard_normal((2, 3200)) * 0.2).astype(np.float32)
    with torch.no_grad():
        out = m(torch.from_numpy(wav), output_hidden_states=True)
    want_states = [h.numpy() for h in out.hidden_states]

    cfg = W.WavLMConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = W.wavlm_from_state_dict(sd, cfg)
    got_states = W.wavlm_apply(params, cfg, jnp.asarray(wav))

    assert len(got_states) == len(want_states)
    for i, (g, w) in enumerate(zip(got_states, want_states)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=5e-3, atol=5e-3, err_msg=f"state {i}")


def test_stacked_hidden_states(rng):
    hs = [jnp.asarray(rng.standard_normal((1, 5, 4)).astype(np.float32)) for _ in range(3)]
    stacked = W.stacked_hidden_states(hs)
    assert stacked.shape == (1, 5, 12)
    # layer ordering preserved (torch stack(dim=1)+flatten(1,2) layout)
    np.testing.assert_array_equal(np.asarray(stacked[..., :4]), np.asarray(hs[0]))


def test_resample_sine(rng):
    """22.05k -> 16k polyphase resample preserves an in-band sine."""
    import jax.numpy as jnp
    from vosk_tts_tpu.ops.resample import resample

    t = np.arange(22050, dtype=np.float64) / 22050
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = np.asarray(resample(jnp.asarray(x), 22050, 16000))
    assert y.shape == (1, 16000)
    t16 = np.arange(16000, dtype=np.float64) / 16000
    ref = np.sin(2 * np.pi * 440 * t16).astype(np.float32)
    err = np.abs(y[0, 100:-100] - ref[100:-100])
    assert err.max() < 1e-2


def test_train_step_with_slm(rng):
    """Full GAN step with the WavLM/SLM loss branch on a tiny frozen WavLM."""
    import jax
    import jax.numpy as jnp
    from vosk_tts_tpu.models import vits2, wavlm as WL
    from vosk_tts_tpu.train import vits2_train as T

    mcfg = vits2.VITS2Config(
        n_vocab=20, spec_channels=80, segment_size=8,
        inter_channels=32, hidden_channels=32, filter_channels=64, n_layers=3,
        upsample_initial_channel=64, n_speakers=4, gin_channels=16,
    )
    wl_cfg = WL.WavLMConfig(hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 4),
                            conv_stride=(5, 4), num_conv_pos_embeddings=8,
                            num_conv_pos_embedding_groups=2, num_buckets=32, max_bucket_distance=50)
    wl_params = W.wavlm_from_state_dict  # noqa - just init randomly instead
    import vosk_tts_tpu.models.wavlm as _w
    # random init via converter is not available; construct minimal pytree through HF
    transformers = pytest.importorskip("transformers")
    hf = transformers.WavLMModel(transformers.WavLMConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2, intermediate_size=32,
        conv_dim=[8, 8], conv_kernel=[10, 4], conv_stride=[5, 4],
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
        num_buckets=32, max_bucket_distance=50, do_stable_layer_norm=False))
    wl_params = W.wavlm_from_state_dict({k: v.numpy() for k, v in hf.state_dict().items()}, wl_cfg)

    tcfg = T.TrainConfig(use_slm=True, use_dur_disc=False)
    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg,
                               slm_hidden=16, slm_layers=3, slm_initial=8)
    step = jax.jit(T.make_train_step(mcfg, tcfg, slm={"params": wl_params, "cfg": wl_cfg}))
    b, tx, tf = 1, 8, 24
    batch = {
        "x": rng.integers(0, 20, size=(b, tx)).astype(np.int32),
        "x_lengths": np.full((b,), tx, np.int32),
        "mel": rng.standard_normal((b, tf, 80)).astype(np.float32),
        "mel_lengths": np.full((b,), tf, np.int32),
        "wav": (rng.standard_normal((b, tf * 256)) * 0.3).astype(np.float32),
        "sid": rng.integers(0, 4, size=(b,)).astype(np.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_slm_disc"]))
    assert np.isfinite(float(metrics["loss_gen_all"]))
