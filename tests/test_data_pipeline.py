"""Data pipeline + training-driver integration test on a synthetic corpus."""

import json
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        n = int(22050 * (0.8 + 0.3 * rng.random()))
        wav = (rng.standard_normal(n) * 3000).astype(np.int16)
        path = root / f"utt{i}.wav"
        with wave.open(str(path), "w") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(22050)
            f.writeframes(wav.tobytes())
        # aligned text: underscore-joined phones per word
        lines.append(f"{path}|{i % 3}|privet mir|p_rj_i0_vj_e1_t m_i1_r")
    meta = root / "metadata.csv"
    meta.write_text("\n".join(lines), encoding="utf-8")
    return root, meta


def test_dataset_and_batcher(corpus):
    from vosk_tts_tpu.train.data import DataConfig, TTSDataset, BucketBatcher

    root, meta = corpus
    cfg = DataConfig(metadata=str(meta), text_buckets=(32, 64), frame_buckets=(64, 128, 192))
    ds = TTSDataset(cfg)
    assert len(ds) == 6

    ids, mel, audio, sid = ds.example(0)
    assert ids[0] == 1 or ids[0] == 0  # ^ possibly after blank intersperse rules
    assert mel.shape[1] == 80
    assert np.isfinite(mel).all()
    # mel cache hit second time
    mel2 = ds.mel(0)
    np.testing.assert_array_equal(mel, mel2)

    b = BucketBatcher(ds, batch_size=2)
    batches = list(b.epoch(0))
    assert len(batches) >= 1
    for batch in batches:
        assert batch["x"].shape[0] == 2
        assert batch["x"].shape[1] in (32, 64)
        assert batch["mel"].shape[1] in (64, 128, 192)
        assert batch["wav"].shape[1] == batch["mel"].shape[1] * 256
        assert (batch["mel_lengths"] > 0).all()
    # epoch shuffle is deterministic per epoch
    again = list(b.epoch(0))
    np.testing.assert_array_equal(batches[0]["x"], again[0]["x"])


def test_host_sharding(corpus):
    from vosk_tts_tpu.train.data import DataConfig, TTSDataset, BucketBatcher

    root, meta = corpus
    cfg = DataConfig(metadata=str(meta))
    ds = TTSDataset(cfg)
    b0 = BucketBatcher(ds, batch_size=1, host_id=0, num_hosts=2, shuffle=False)
    b1 = BucketBatcher(ds, batch_size=1, host_id=1, num_hosts=2, shuffle=False)
    n0, n1 = b0.num_batches(), b1.num_batches()
    assert n0 == n1  # even split with padding
    x0 = [tuple(b["sid"]) for b in b0.epoch(0)]
    x1 = [tuple(b["sid"]) for b in b1.epoch(0)]
    assert len(x0) == len(x1) == n0


def test_vc_dataset(tmp_path):
    import jax
    import wave as wave_mod
    from vosk_tts_tpu.train.vc_data import VCDataConfig, VCDataset

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        n = 16000
        wav = (rng.standard_normal(n) * 2000).astype(np.int16)
        p = tmp_path / f"u{i}.wav"
        with wave_mod.open(str(p), "w") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(wav.tobytes())
        # fake contentvec features at 50 Hz
        np.save(str(p)[:-4] + ".cv.npy", rng.standard_normal((n // 320, 24)).astype(np.float32))
        paths.append(str(p))
    flist = tmp_path / "train.txt"
    flist.write_text("\n".join(paths))

    cfg = VCDataConfig(file_list=str(flist), max_speclen=16)
    ds = VCDataset(cfg)
    assert len(ds) == 3
    batch = ds.collate([0, 1, 2], np.random.default_rng(1))
    assert batch["c"].shape == (3, 16, 24)
    assert batch["spec"].shape[1] == 16 and batch["spec"].shape[2] == 641
    assert batch["wav"].shape == (3, 16 * 320)
    assert np.isfinite(batch["spec"]).all()
