"""Golden test: JAX BERT vs HF transformers BertModel (random small config)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vosk_tts_tpu.models import bert as B
from vosk_tts_tpu.utils.torch_params import bert_from_state_dict


def test_bert_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    )
    torch.manual_seed(0)
    m = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    m.eval()

    b, t = 2, 17
    ids = rng.integers(0, 100, size=(b, t)).astype(np.int64)
    mask = np.ones((b, t), np.int64)
    mask[1, -4:] = 0
    types = np.zeros((b, t), np.int64)

    with torch.no_grad():
        out = m(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types), output_hidden_states=True,
        )
    want = [h.numpy() for h in out.hidden_states]

    cfg = B.BertConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = bert_from_state_dict(sd, cfg.num_hidden_layers)
    got = B.bert_apply(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                       jnp.asarray(types, jnp.int32))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        valid = mask[..., None].astype(bool)
        np.testing.assert_allclose(np.asarray(g)[valid[..., 0]], w[valid[..., 0]], rtol=2e-3, atol=2e-3)


def test_bert_encoder_bucketing(rng):
    cfg = B.BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=32, max_position_embeddings=64)
    params = B.bert_init(jax.random.PRNGKey(0), cfg)
    enc = B.BertEncoder(params, cfg.__dict__)
    ids = list(rng.integers(0, 50, size=12))
    hs = enc(ids, [1] * 12, [0] * 12)
    assert hs.shape == (3, 12, 16)
    assert np.isfinite(hs).all()
