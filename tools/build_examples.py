#!/usr/bin/env python3
"""Multi-voice smoke synthesis (extra/build-examples.sh equivalent).

Usage: python tools/build_examples.py BUNDLE_DIR OUT_DIR [--speakers 0,1,2,3,4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = "Добрый день, это проверка синтеза речи. Сегодня хорошая погода!"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle")
    ap.add_argument("out")
    ap.add_argument("--speakers", default="0,1,2,3,4")
    ap.add_argument("--text", default=TEXT)
    args = ap.parse_args()

    from vosk_tts_tpu.api import Model, Synth
    from vosk_tts_tpu.eval import batch_synthesize

    model = Model(model_path=args.bundle)
    synth = Synth(model)
    speakers = [int(s) for s in args.speakers.split(",")]
    paths = batch_synthesize(synth, [args.text], args.out, speakers=speakers)
    print("\n".join(paths))


if __name__ == "__main__":
    main()
