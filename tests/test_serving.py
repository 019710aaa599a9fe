"""gRPC server + batcher tests (in-process, real sockets on localhost)."""

import threading
import wave

import numpy as np
import pytest

pytest.importorskip("grpc")


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    out = tmp_path_factory.mktemp("bundle") / "vosk-model-tts-ru-test"
    import jax
    import dataclasses
    import json
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
            "inference": {},
            "model": dataclasses.asdict(cfg),
        },
        open(out / "config.json", "w"),
        ensure_ascii=False,
    )
    (out / "dictionary").write_text("", encoding="utf-8")
    return out


def test_proto_roundtrip():
    from vosk_tts_tpu.serving import proto

    req = proto.UtteranceSynthesisRequest(text="Привет")
    req.hints.add(speaker_id=3)
    req.hints.add(speech_rate=1.5)
    blob = req.SerializeToString()
    back = proto.UtteranceSynthesisRequest.FromString(blob)
    assert back.text == "Привет"
    assert back.hints[0].speaker_id == 3
    assert abs(back.hints[1].speech_rate - 1.5) < 1e-9


def test_server_synthesis_stream(bundle, tmp_path):
    from vosk_tts_tpu.api import Model
    from vosk_tts_tpu.serving.server import make_server
    from vosk_tts_tpu.serving.client import SynthesizerClient

    model = Model(model_path=bundle)
    server, servicer, port = make_server(model, interface="127.0.0.1", port=0, threads=4)
    server.start()
    try:
        client = SynthesizerClient(f"127.0.0.1:{port}")
        data = client.synthesize("Привет мир!", speaker_id=2)
        # default output: WAV container
        assert data[:4] == b"RIFF"
        out = tmp_path / "srv.wav"
        out.write_bytes(data)
        with wave.open(str(out)) as f:
            assert f.getframerate() == 22050
            assert f.getnframes() > 1000

        # concurrent requests exercise the batcher
        results = {}

        def one(i):
            results[i] = client.synthesize("Привет мир!", speaker_id=i % 5)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(len(v) > 1000 for v in results.values())
        client.close()
    finally:
        servicer.batcher.close()
        server.stop(0)
