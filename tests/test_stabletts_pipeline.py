"""End-to-end StableTTS training pipeline: toy corpus on disk -> dataset
(.lab kaldi durations, mel-stat normalization, 5-stream collate) ->
jitted CFM+duration step -> loss decreases; plus the run_stabletts driver
(train, checkpoint, resume).

Reference behavior:
  training/stabletts/matcha/data/text_mel_datamodule.py:163-209 (filelist,
  get_durations .lab parsing, mel normalization) and matcha/train.py.
"""

import json
import os
import wave

import numpy as np
import pytest

import jax

from vosk_tts_tpu.models.stabletts import StableTTSConfig
from vosk_tts_tpu.train import stabletts_train as T
from vosk_tts_tpu.train.stabletts_data import (
    StableBatcher,
    StableDataConfig,
    StableTTSDataset,
    parse_lab,
)

SR = 22050
HOP = 256

# aligned texts: words are underscore-joined phones (text_to_sequence_aligned)
ALIGNED = [
    "m_a1 vj_i1_r",
    "d_o1_m u1",
    "s_a0_d m_i1_r a1",
]


def _write_wav(path, n_samples, seed):
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(n_samples) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        f.writeframes(data.tobytes())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """3-utterance toy corpus: wav + .lab + metadata, then a dataset whose
    .lab durations exactly cover each stream length."""
    root = tmp_path_factory.mktemp("stabletts_corpus")
    meta_lines = []
    for i, aligned in enumerate(ALIGNED):
        name = f"utt{i}"
        _write_wav(root / f"{name}.wav", 256 * (40 + 8 * i), seed=i)
        meta_lines.append(f"{name}|{i % 2}|dummy text {i}|{aligned}")
    meta = root / "metadata.csv"
    meta.write_text("\n".join(meta_lines) + "\n", encoding="utf-8")

    dcfg = StableDataConfig(metadata=str(meta), wav_dir=str(root), n_spks=2)
    ds = StableTTSDataset(dcfg)

    # write .lab files with one duration row per stream entry, summing to the
    # true frame count (the kaldi-alignment invariant)
    for i in range(len(ds)):
        x, _ = ds.text_streams(i)
        n_frames = ds.mel(i).shape[0]
        t = x.shape[0]
        base = n_frames // t
        durs = [base] * t
        durs[-1] += n_frames - base * t
        lab = "\n".join(f"p {j} {d}" for j, d in enumerate(durs))
        (root / f"utt{i}.lab").write_text(lab + "\n", encoding="utf-8")
    return root, dcfg, ds


def small_cfg(n_vocab=256):
    return StableTTSConfig(
        n_vocab=n_vocab, n_spks=2, spk_emb_dim=8,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
        phone_emb_dim=16, punc_emb_dim=2, bert_proj_dim=8,
        dec_hidden=32, dec_filter=64, dec_layers=2, dec_heads=2,
    )


def test_lab_parsing(corpus):
    root, _, ds = corpus
    durs = parse_lab(str(root / "utt0.lab"))
    x, _ = ds.text_streams(0)
    assert len(durs) == x.shape[0]
    assert sum(durs) == ds.mel(0).shape[0]


def test_dataset_normalization_and_shapes(corpus):
    _, dcfg, ds = corpus
    mel = ds.mel(0)
    assert mel.shape[1] == dcfg.n_mels
    # normalized by dataset stats: un-normalizing must give log-mel scale
    # (log of clamped magnitudes, definitely not ~N(0,1) around -5.8)
    raw = mel * dcfg.mel_std + dcfg.mel_mean
    assert raw.mean() < -1.0  # log-compressed mel is strongly negative
    # cache round-trip
    mel2 = ds.mel(0)
    np.testing.assert_array_equal(mel, mel2)

    x, bert = ds.text_streams(0)
    assert x.shape[1] == 5
    assert bert.shape == (x.shape[0], dcfg.bert_dim)


def test_collate_shapes_and_duration_clipping(corpus):
    _, dcfg, ds = corpus
    batcher = StableBatcher(ds, batch_size=3, shuffle=False)
    batch = next(iter(batcher))
    b, _, tx = batch["x"].shape
    assert b == 3 and tx in dcfg.text_buckets
    tf = batch["mel"].shape[1]
    assert tf in dcfg.frame_buckets
    assert batch["bert"].shape == (b, tx, dcfg.bert_dim)
    for i in range(b):
        t = batch["x_lengths"][i]
        nf = batch["mel_lengths"][i]
        # durations cover exactly the real frames, zero in padding
        assert batch["durations"][i].sum() == nf
        assert batch["durations"][i, t:].sum() == 0


def test_cfm_loss_decreases(corpus):
    """VERDICT r1 item 2: toy end-to-end training whose CFM+duration loss
    decreases (evaluated at a FIXED rng so the comparison is deterministic)."""
    _, dcfg, ds = corpus
    mcfg = small_cfg()
    # accumulate=1: this test checks learning, not accumulation (covered by
    # test_grad_accumulation_equivalence); 40 plain updates keep it fast.
    tcfg = T.StableTrainConfig(learning_rate=3e-3, accumulate=1)
    batcher = StableBatcher(ds, batch_size=3, shuffle=False)
    batch = next(iter(batcher))

    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = jax.jit(T.make_train_step(mcfg, tcfg))

    eval_step = jax.jit(T.make_train_step(
        mcfg, T.StableTrainConfig(learning_rate=0.0, accumulate=1)))
    eval_rng = jax.random.PRNGKey(123)

    _, m0 = eval_step(state, batch, eval_rng)
    rng = jax.random.PRNGKey(7)
    for _ in range(40):
        rng, r = jax.random.split(rng)
        state, _ = step(state, batch, r)
    _, m1 = eval_step(state, batch, eval_rng)

    assert float(m1["dur_loss"]) < float(m0["dur_loss"])
    assert float(m1["loss"]) < float(m0["loss"])
    assert int(state["step"]) == 40


def test_bootstrap_stats_and_durations(tmp_path):
    """tools/stabletts_bootstrap (VERDICT r2 missing-1): dataset mel stats
    match the generate_data_statistics.py formula, and MAS durations from a
    trained checkpoint produce .lab files the data pipeline trains from
    end-to-end (get_durations_from_trained_model_new.py equivalent)."""
    import jax.numpy as jnp

    sys_tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    import sys

    sys.path.insert(0, sys_tools)
    try:
        from stabletts_bootstrap import compute_stats, run_durations
    finally:
        sys.path.remove(sys_tools)

    from vosk_tts_tpu.utils import checkpoint as ckpt

    # fresh corpus (no .lab files yet — that's what the tool creates)
    root = tmp_path / "corpus"
    root.mkdir()
    meta_lines = []
    for i, aligned in enumerate(ALIGNED):
        _write_wav(root / f"utt{i}.wav", 256 * (40 + 8 * i), seed=i)
        meta_lines.append(f"utt{i}|{i % 2}|dummy text {i}|{aligned}")
    (root / "metadata.csv").write_text("\n".join(meta_lines) + "\n", encoding="utf-8")

    cfg_json = {
        "data": {"training_files": str(root / "metadata.csv"), "wav_dir": str(root),
                 "n_spks": 2},
        "model": {"spk_emb_dim": 8, "hidden_channels": 32, "filter_channels": 64,
                  "n_heads": 2, "n_layers": 1, "phone_emb_dim": 16,
                  "punc_emb_dim": 2, "bert_proj_dim": 8, "dec_hidden": 32,
                  "dec_filter": 64, "dec_layers": 2, "dec_heads": 2},
        "train": {"batch_size": 3, "accumulate": 1},
    }

    # ---- stats: manual reference-formula recomputation must agree --------
    stats = compute_stats(cfg_json)
    assert np.isfinite(stats["mel_mean"]) and stats["mel_std"] > 0
    from vosk_tts_tpu.ops.stft import mel_spectrogram
    from vosk_tts_tpu.train.data import load_wav

    mels = []
    for i in range(len(ALIGNED)):
        data, sr = load_wav(str(root / f"utt{i}.wav"))
        mels.append(np.asarray(mel_spectrogram(
            (data / 32768.0)[None, :], 1024, 80, 22050, 256, 1024, 0.0, 8000.0))[0])
    allm = np.concatenate(mels, axis=0)
    assert stats["mel_mean"] == pytest.approx(float(allm.mean()), rel=1e-6)
    assert stats["mel_std"] == pytest.approx(float(allm.std()), rel=1e-4)

    # ---- durations: checkpoint -> MAS -> .lab -> trainable ---------------
    cfg_json["data"]["mel_mean"] = stats["mel_mean"]
    cfg_json["data"]["mel_std"] = stats["mel_std"]
    from vosk_tts_tpu.train.run_stabletts import build_configs

    dcfg2, mcfg2, tcfg2 = build_configs(cfg_json)
    model_dir = tmp_path / "ckpt"
    state = T.init_train_state(jax.random.PRNGKey(3), mcfg2, tcfg2)
    ckpt.save_full_state(str(model_dir), "STATE", 1, jax.device_get(state))

    n = run_durations(cfg_json, str(model_dir), batch_size=3)
    assert n == len(ALIGNED)

    ds = StableTTSDataset(dcfg2)
    for i in range(len(ds)):
        durs = ds.durations(i)
        x, _ = ds.text_streams(i)
        assert len(durs) == x.shape[0]            # one duration per phone
        assert sum(durs) == ds.mel(i).shape[0]    # MAS covers every frame
        assert all(d >= 0 for d in durs)

    # the bootstrapped corpus trains end-to-end
    batcher = StableBatcher(ds, batch_size=3, shuffle=False)
    batch = next(iter(batcher))
    step = jax.jit(T.make_train_step(mcfg2, tcfg2))
    state2, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accumulation_equivalence(corpus):
    """accumulate=4 (optax.MultiSteps) == one base-optimizer update with the
    mean of the 4 micro-batch gradients, with zero movement in between —
    Lightning's accumulate_grad_batches semantics
    (stabletts/configs/trainer/default.yaml)."""
    import optax

    from vosk_tts_tpu.models import stabletts as S

    _, dcfg, ds = corpus
    mcfg = small_cfg()
    tcfg = T.StableTrainConfig(learning_rate=1e-3, accumulate=4)
    batcher = StableBatcher(ds, batch_size=3, shuffle=False)
    batch = next(iter(batcher))
    rngs = [jax.random.PRNGKey(100 + i) for i in range(4)]

    state = T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    params0 = state["params"]
    step = jax.jit(T.make_train_step(mcfg, tcfg))

    # ---- manual: mean of 4 micro-grads through the base chain -----------
    def loss_fn(params, rng):
        out = S.forward_train(
            params, mcfg, batch["x"], batch["x_lengths"], batch["mel"],
            batch["mel_lengths"], batch["sid"], batch["bert"],
            batch["durations"], rng=rng, cfg_dropout=tcfg.cfg_dropout,
            use_dur_loss=tcfg.use_dur_loss,
        )
        return out["diff_loss"] + out["dur_loss"]

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = [grad_fn(params0, r) for r in rngs]
    mean_g = jax.tree.map(lambda *g: sum(g[1:], g[0]) / len(g), *grads)
    base = T.make_optimizer(T.StableTrainConfig(
        learning_rate=tcfg.learning_rate, grad_clip=tcfg.grad_clip, accumulate=1))
    updates, _ = base.update(mean_g, base.init(params0), params0)
    expected = optax.apply_updates(params0, updates)

    # ---- MultiSteps: 4 micro-steps, params frozen until the 4th ---------
    for i, r in enumerate(rngs):
        state, _ = step(state, batch, r)
        moved = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(state["params"]), jax.tree.leaves(params0))
        )
        if i < 3:
            assert moved == 0.0, f"params moved at micro-step {i}"
    for got, want in zip(jax.tree.leaves(state["params"]), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-7)


def test_driver_train_and_resume(corpus, tmp_path):
    """run_stabletts driver: trains, checkpoints, resumes from latest."""
    from vosk_tts_tpu.train import run_stabletts

    root, dcfg, _ = corpus
    model_dir = tmp_path / "model"
    cfg = {
        "data": {
            "training_files": dcfg.metadata,
            "wav_dir": str(root),
            "n_spks": 2,
        },
        "model": {
            "spk_emb_dim": 8, "hidden_channels": 32, "filter_channels": 64,
            "n_heads": 2, "n_layers": 1, "phone_emb_dim": 16,
            "punc_emb_dim": 2, "bert_proj_dim": 8, "dec_hidden": 32,
            "dec_filter": 64, "dec_layers": 2, "dec_heads": 2,
        },
        "train": {"batch_size": 3, "epochs": 2, "log_interval": 1,
                  "save_interval": 1, "learning_rate": 1e-4},
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg), encoding="utf-8")

    run_stabletts.main(["-c", str(cfg_path), "-m", str(model_dir)])
    ckpts = [f for f in os.listdir(model_dir) if f.startswith("STATE_") and f.endswith(".npz")
             and not f.endswith(".opt.npz")]
    assert ckpts, "driver saved no checkpoint"

    first_steps = max(int(f.split("_")[1].split(".")[0]) for f in ckpts)

    # resume: second run continues the step counter instead of restarting
    run_stabletts.main(["-c", str(cfg_path), "-m", str(model_dir), "--epochs", "3"])
    from vosk_tts_tpu.utils import checkpoint as ckpt

    latest = ckpt.latest_checkpoint(str(model_dir), "STATE_")
    final_step = int(os.path.basename(latest)[len("STATE_"):-len(".npz")])
    assert final_step > first_steps
