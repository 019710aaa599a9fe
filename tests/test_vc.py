"""Golden tests: QuickVC (speaker encoder, synthesizer) + HuBERT/ContentVec."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import oracle
import convert_helpers as ch


# ---------------------------------------------------------------------------
# HuBERT vs HF transformers
# ---------------------------------------------------------------------------


def test_hubert_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    from vosk_tts_tpu.models import hubert as H

    hf_cfg = transformers.HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    torch.manual_seed(0)
    m = transformers.HubertModel(hf_cfg)
    m.eval()

    wav = (rng.standard_normal((2, 3200)) * 0.2).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(wav)).last_hidden_state.numpy()

    cfg = H.HubertConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = H.hubert_from_state_dict(sd, cfg)
    got = np.asarray(H.hubert_apply(params, cfg, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# Speaker encoder vs reference LSTM
# ---------------------------------------------------------------------------


def _vc_models():
    return oracle._load("vc", "vc", ("models",))[0] if False else oracle_vc()


def oracle_vc():
    import importlib
    import os
    import sys

    import scipy.signal

    if not hasattr(scipy.signal, "kaiser"):  # old-scipy API used by vc/pqmf.py
        scipy.signal.kaiser = scipy.signal.windows.kaiser

    sys.path.insert(0, "/root/reference/vc")
    if oracle._SHIM in sys.path:
        sys.path.remove(oracle._SHIM)
    sys.path.insert(0, oracle._SHIM)
    saved = {n: sys.modules.pop(n, None) for n in oracle._ALL_REF_MODULES}
    try:
        mod = importlib.import_module("models")
        mod_commons = sys.modules.get("commons")
    finally:
        sys.path.remove("/root/reference/vc")
        for n, m in saved.items():
            if m is not None and n not in sys.modules:
                sys.modules[n] = m
    sys.modules.pop("models", None)
    sys.modules.pop("commons", None)
    sys.modules.pop("modules", None)
    sys.modules.pop("attentions", None)
    sys.modules.pop("pqmf", None)
    sys.modules.pop("stft", None)
    return mod


def test_speaker_encoder_matches(rng):
    from vosk_tts_tpu.models import quickvc as Q

    vc_models = oracle_vc()
    torch.manual_seed(0)
    m = vc_models.SpeakerEncoder(mel_n_channels=20, model_hidden_size=32, model_embedding_size=32)
    m.eval()

    mel = rng.standard_normal((2, 50, 20)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(mel)).numpy()

    params = {
        "lstm": [
            {
                "w_ih": m.lstm.state_dict()[f"weight_ih_l{i}"].numpy().T,
                "w_hh": m.lstm.state_dict()[f"weight_hh_l{i}"].numpy().T,
                "b_ih": m.lstm.state_dict()[f"bias_ih_l{i}"].numpy(),
                "b_hh": m.lstm.state_dict()[f"bias_hh_l{i}"].numpy(),
            }
            for i in range(3)
        ],
        "linear": ch.linear_p(m.linear),
    }
    got = np.asarray(Q.speaker_encoder_apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # embed_utterance with partial slices
    mel_long = rng.standard_normal((1, 300, 20)).astype(np.float32)
    with torch.no_grad():
        want_e = m.embed_utterance(torch.from_numpy(mel_long)).numpy()
    got_e = np.asarray(Q.embed_utterance(params, jnp.asarray(mel_long)))
    np.testing.assert_allclose(got_e, want_e, rtol=1e-3, atol=1e-4)


def test_quickvc_infer_smoke(rng):
    from vosk_tts_tpu.models import quickvc as Q

    cfg = Q.QuickVCConfig(
        spec_channels=65, inter_channels=32, hidden_channels=32,
        upsample_initial_channel=64, gin_channels=16, ssl_dim=24,
    )
    params = Q.synthesizer_init(jax.random.PRNGKey(0), cfg)
    c = rng.standard_normal((1, 40, 24)).astype(np.float32)
    tgt_mel = rng.standard_normal((1, 200, 80)).astype(np.float32)
    wav = Q.infer(params, cfg, jnp.asarray(c), jnp.asarray(tgt_mel), rng=jax.random.PRNGKey(1))
    # trunk: T=40 -> 5T+1=201 (k16/s5/p5) -> 804 (k16/s4/p6); +1 reflect pad;
    # istft hop 4: (805-1)*4=3216 per subband; x4 subbands = 12864 samples
    assert wav.shape[0] == 1 and wav.shape[1] == 12864
    assert np.isfinite(np.asarray(wav)).all()

    out = Q.forward_train(params, cfg, jnp.asarray(c),
                          jnp.asarray(rng.standard_normal((1, 40, 65)).astype(np.float32)),
                          jnp.asarray(rng.standard_normal((1, 40, 80)).astype(np.float32)),
                          rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out["wav"])).all()
