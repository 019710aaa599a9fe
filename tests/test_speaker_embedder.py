"""GE2E-trained LSTM speaker embedder: artifact regression + trainer smoke.

The committed artifact (eval/data/speaker_encoder.npz) is the default
embedder of eval/harness.speaker_similarity (VERDICT r2 item 7): its scores
must stay discriminative on HELD-OUT synthetic voices so cross-round
similarity regressions in the VC/TTS stacks are detectable.
"""

import numpy as np

import jax


def test_artifact_discriminates_heldout_voices():
    from vosk_tts_tpu.eval import speaker_train as ST
    from vosk_tts_tpu.eval.harness import speaker_similarity

    emb = ST.lstm_embedder()  # loads the committed artifact
    rng = np.random.default_rng(999)  # held-out: trainer uses seed 0 voices
    va, vb, vc = (ST.synthetic_voice(rng) for _ in range(3))
    a = [ST.synthetic_utterance(rng, va) for _ in range(3)]
    b = [ST.synthetic_utterance(rng, vb) for _ in range(3)]
    c = [ST.synthetic_utterance(rng, vc) for _ in range(2)]

    same = speaker_similarity([(a[0], a[1]), (a[1], a[2]),
                               (b[0], b[1]), (c[0], c[1])], embedder=emb)
    cross = speaker_similarity([(a[0], b[0]), (a[1], b[1]),
                                (b[2], c[0]), (a[2], c[1])], embedder=emb)
    # regression thresholds: trained artifact scored ~0.9 same / ~0.5 cross
    assert same.value > 0.75, (same.value, cross.value)
    assert same.value > cross.value + 0.15, (same.value, cross.value)


def test_default_embedder_is_artifact():
    from vosk_tts_tpu.eval.harness import _default_embedder

    emb = _default_embedder()
    # the trained path returns a closure, not the bare mfcc function
    from vosk_tts_tpu.eval.speaker_embed import mfcc_f0_embedding

    assert emb is not mfcc_f0_embedding


def test_ge2e_trainer_smoke():
    from vosk_tts_tpu.eval import speaker_train as ST

    params, extra = ST.train_speaker_encoder(
        1, n_voices=4, utts_per_voice=3, voices_per_batch=3, utts_per_batch=2,
        steps=3, hidden=8, emb=8, layers=1)
    assert np.isfinite(extra["loss"])
    e = ST.lstm_embedder(params)(np.random.default_rng(0).standard_normal(22050).astype(np.float32), 22050)
    assert e.shape == (8,) and np.isfinite(e).all()
