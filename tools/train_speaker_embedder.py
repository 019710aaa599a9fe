#!/usr/bin/env python3
"""Train the GE2E LSTM speaker embedder on the synthetic multi-voice corpus
and write the committed artifact consumed by eval/harness._default_embedder.

The reference's similarity gate uses a pretrained Resemblyzer d-vector net
(vc/eval-score.py:25-63); no egress here, so we train the same architecture
+ loss in-repo (see eval/speaker_train.py docstring for the caveats).

Usage: python tools/train_speaker_embedder.py [--steps 400] [--out PATH]
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # tiny model; train host-side. The axon plugin overrides the env var, so
    # pin the platform both ways (CLAUDE.md gotcha).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vosk_tts_tpu.eval import speaker_train as ST

    params, extra = ST.train_speaker_encoder(args.seed, steps=args.steps,
                                             log=lambda m: print(m, flush=True))
    out = args.out or ST.ARTIFACT
    ST.save_artifact(out, params, extra)
    print(f"wrote {out} (final ge2e loss {extra['loss']:.4f})")

    # quick self-check: same-voice vs cross-voice margin on held-out voices
    import numpy as np

    from vosk_tts_tpu.eval.harness import speaker_similarity

    rng = np.random.default_rng(12345)
    emb = ST.lstm_embedder(params)
    va, vb = ST.synthetic_voice(rng), ST.synthetic_voice(rng)
    a = [ST.synthetic_utterance(rng, va) for _ in range(3)]
    b = [ST.synthetic_utterance(rng, vb) for _ in range(3)]
    same = speaker_similarity([(a[0], a[1]), (a[1], a[2]), (b[0], b[1])], embedder=emb)
    cross = speaker_similarity([(a[0], b[0]), (a[1], b[1]), (a[2], b[2])], embedder=emb)
    print(f"held-out same {same.value:.3f} cross {cross.value:.3f}")


if __name__ == "__main__":
    main()
