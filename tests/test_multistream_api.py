"""End-to-end multistream_v3 bundle: 5-stream frontend + BERT + StableTTS +
vocoder through the public Synth API."""

import dataclasses
import json
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module", params=["vocos", "hifigan"])
def ms_bundle(request, tmp_path_factory):
    import jax
    from vosk_tts_tpu.models import stabletts, bert as bert_mod, vocoder as voc
    from vosk_tts_tpu.models.vits2 import VITS2Config
    from vosk_tts_tpu.text import multistream_symbol_map
    from vosk_tts_tpu.utils.checkpoint import save_params

    out = tmp_path_factory.mktemp("msbundle") / f"vosk-model-tts-ru-ms-{request.param}"
    out.mkdir(parents=True)

    cfg = stabletts.StableTTSConfig(
        n_vocab=207, n_feats=16, n_spks=5, spk_emb_dim=8, hidden_channels=32,
        filter_channels=64, n_heads=2, n_layers=2, phone_emb_dim=12, punc_emb_dim=4,
        bert_dim=24, bert_proj_dim=4, dec_hidden=32, dec_filter=64, dec_layers=2, dec_heads=2,
    )
    matcha = stabletts.matcha_init(jax.random.PRNGKey(0), cfg)
    if request.param == "vocos":
        vcfg = voc.VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=2,
                               n_fft=16, hop_length=256 // 16)  # tiny head
        # note: hop*frames must stay consistent with sample trimming; use a
        # hifigan-equivalent total upsample of 256 via n_fft/hop not possible
        # for tiny config — use real ratios instead
        vcfg = voc.VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=2,
                               n_fft=1024, hop_length=256)
        vparams = voc.vocos_init(jax.random.PRNGKey(1), vcfg)
        vocoder_cfg = dataclasses.asdict(vcfg)
    else:
        vcfg = VITS2Config(inter_channels=16, upsample_initial_channel=64,
                           upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
                           decoder_type="hifigan", gin_channels=0, n_speakers=0)
        vparams = voc.hifigan_init(jax.random.PRNGKey(1), vcfg)
        vocoder_cfg = dataclasses.asdict(vcfg)

    bcfg = bert_mod.BertConfig(vocab_size=200, hidden_size=24, num_hidden_layers=2,
                               num_attention_heads=2, intermediate_size=48, max_position_embeddings=64)
    bparams = bert_mod.bert_init(jax.random.PRNGKey(2), bcfg)

    save_params(out / "params.npz", {"matcha": matcha, "vocoder": vparams})
    (out / "bert").mkdir()
    save_params(out / "bert" / "params.npz", bparams)
    json.dump(dataclasses.asdict(bcfg), open(out / "bert" / "config.json", "w"))
    # tiny wordpiece vocab (russian chars as tokens)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list("абвгдежзийклмнопрстуфхцчшщъыьэюяё") + ["##" + c for c in "абвгдежзийклмнопрстуфхцчшщъыьэюяё"]
    (out / "bert" / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")

    json.dump(
        {
            "model_type": "multistream_v3",
            "sample_rate": 22050,
            "hop_length": 256,
            "vocoder": request.param,
            "vocoder_config": vocoder_cfg,
            "phoneme_id_map": multistream_symbol_map(),
            "inference": {"n_timesteps": 2},
            "model": dataclasses.asdict(cfg),
        },
        open(out / "config.json", "w"),
        ensure_ascii=False,
    )
    (out / "dictionary").write_text("привет 1.0 p rj i0 vj e1 t\n", encoding="utf-8")
    return out


def test_multistream_synth(ms_bundle, tmp_path):
    from vosk_tts_tpu.api import Model, Synth

    model = Model(model_path=ms_bundle)
    assert model.bert is not None
    synth = Synth(model)
    out = tmp_path / "ms.wav"
    synth.synth("Привет мир!", str(out), speaker_id=1)
    with wave.open(str(out)) as f:
        assert f.getframerate() == 22050
        n = f.getnframes()
    assert n > 1000
