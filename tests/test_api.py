"""End-to-end API/CLI tests: bundle -> Model -> Synth -> wav."""

import json
import subprocess
import sys
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    out = tmp_path_factory.mktemp("bundle") / "vosk-model-tts-ru-test"
    import jax
    import dataclasses
    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.text import plain_symbol_map
    from vosk_tts_tpu.utils.checkpoint import save_params

    cfg = vits2.VITS2Config(
        inter_channels=32, hidden_channels=32, filter_channels=64, n_layers=3,
        upsample_initial_channel=64, n_speakers=5, gin_channels=16, spec_channels=13,
    )
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    out.mkdir(parents=True)
    save_params(out / "params.npz", params)
    json.dump(
        {
            "model_type": "vits2",
            "sample_rate": 22050,
            "phoneme_id_map": {k: [v] for k, v in plain_symbol_map().items()},
            "inference": {"noise_level": 0.8, "speech_rate": 1.0, "duration_noise_level": 0.8},
            "model": dataclasses.asdict(cfg),
        },
        open(out / "config.json", "w"),
        ensure_ascii=False,
    )
    (out / "dictionary").write_text("привет 1.0 p rj i0 vj e1 t\n", encoding="utf-8")
    return out


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from vosk_tts_tpu.utils.checkpoint import save_params, load_params
    from vosk_tts_tpu.models import vits2

    cfg = vits2.VITS2Config(
        inter_channels=32, hidden_channels=32, filter_channels=64, n_layers=3,
        upsample_initial_channel=64, n_speakers=3, gin_channels=16, spec_channels=13,
    )
    params = vits2.synthesizer_init(jax.random.PRNGKey(0), cfg)
    save_params(tmp_path / "p.npz", params)
    loaded = load_params(tmp_path / "p.npz")

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(loaded)
    # None leaves (bias-free convs) are dropped on save; compare the rest
    d1 = {jax.tree_util.keystr(k): v for k, v in flat1 if v is not None}
    d2 = {jax.tree_util.keystr(k): v for k, v in flat2}
    assert set(d1) == set(d2)
    for k in d1:
        np.testing.assert_array_equal(np.asarray(d1[k]), np.asarray(d2[k]))


def test_synth_writes_wav(bundle, tmp_path):
    from vosk_tts_tpu.api import Model, Synth

    model = Model(model_path=bundle)
    synth = Synth(model)
    out = tmp_path / "out.wav"
    synth.synth("Привет мир!", str(out), speaker_id=2)

    with wave.open(str(out)) as f:
        assert f.getframerate() == 22050
        assert f.getnchannels() == 1
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype=np.int16)
    assert n > 1000  # produced some audio
    assert data.dtype == np.int16


def test_synth_audio_speech_rate(bundle):
    from vosk_tts_tpu.api import Model, Synth

    model = Model(model_path=bundle)
    synth = Synth(model)
    a_slow = synth.synth_audio("Привет мир!", speaker_id=0, speech_rate=0.5)
    a_fast = synth.synth_audio("Привет мир!", speaker_id=0, speech_rate=2.0)
    assert len(a_slow) > len(a_fast)


def test_cli(bundle, tmp_path):
    out = tmp_path / "cli.wav"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, "-m", "vosk_tts_tpu.cli", "--model", str(bundle), "--input", "Привет мир!",
         "--output", str(out), "--speaker", "1"],
        capture_output=True, text=True, env={**env},
        cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr
    with wave.open(str(out)) as f:
        assert f.getnframes() > 0


def test_synth_batch_sharded(bundle):
    """Batch synthesis shards over the virtual 8-device mesh."""
    import jax
    from vosk_tts_tpu.api import Model, Synth

    model = Model(model_path=bundle)
    synth = Synth(model)
    texts = ["Привет мир!", "Добрый день.", "Как дела?"]
    wavs = synth.synth_batch(texts, speaker_ids=[0, 1, 2])
    assert len(wavs) == 3
    for w in wavs:
        assert w.dtype.name == "int16" and len(w) > 1000


def test_registry_download_and_load(bundle, tmp_path, monkeypatch):
    """Registry resolution (reference model.py:17-127): model-list.json +
    <name>.zip over a file:// registry, unzip into the cache dir, load."""
    import shutil

    from vosk_tts_tpu import registry
    from vosk_tts_tpu.api import Model, Synth

    reg = tmp_path / "registry"
    reg.mkdir()
    name = bundle.name
    shutil.make_archive(str(reg / name), "zip", root_dir=bundle.parent, base_dir=name)
    (reg / "model-list.json").write_text(json.dumps([
        {"name": "other-model", "lang": "en", "type": "big", "obsolete": "false"},
        {"name": name, "lang": "ru", "type": "small", "obsolete": "false"},
    ]), encoding="utf-8")

    cache = tmp_path / "cache"
    monkeypatch.setenv("VOSK_TTS_REGISTRY", f"file://{reg}")

    # by-name download
    path = registry.resolve(name, None, [str(cache)])
    assert (path / "config.json").exists() and not (cache / f"{name}.zip").exists()

    # by-lang selection rule picks the non-obsolete small entry
    models = registry.model_list()
    assert registry.select_by_lang(models, "ru")["name"] == name
    assert registry.select_by_lang(models, "en") is None  # type != small

    # end-to-end: Model() with an empty local cache pulls from the registry
    cache2 = tmp_path / "cache2"
    monkeypatch.setattr("vosk_tts_tpu.api.MODEL_DIRS", [str(cache2)])
    model = Model(model_name=name)
    wav = Synth(model).synth_audio("привет", speaker_id=0)
    assert len(wav) > 0 and np.isfinite(wav).all()

    # second load hits the local cache (no registry needed)
    monkeypatch.delenv("VOSK_TTS_REGISTRY")
    model2 = Model(model_name=name)
    assert model2.path == model.path
