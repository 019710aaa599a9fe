"""Evaluation harness (the extra/tts-test + training/vits2/eval.py analogue).

The reference asserts quality empirically with external scorers (sherpa ASR
WER, UTMOS, wespeaker/Resemblyzer similarity, fadtk FAD — SURVEY.md §4).
Those model downloads aren't available in this environment, so each metric is
a pluggable backend: the synthesis/measurement driver is here, the scorer is
injected (or the built-in fallback is used where one exists).
"""

from .harness import (EvalResult, batch_synthesize, eval_rtf, eval_utmos,
                      frechet_audio_distance, speaker_similarity,
                      transcribe_wer)
from .speaker_embed import mfcc_f0_embedding
