"""Evaluation harness (the extra/tts-test + training/vits2/eval.py analogue).

The reference asserts quality empirically with external scorers (sherpa ASR
WER, UTMOS, wespeaker/Resemblyzer similarity, fadtk FAD — SURVEY.md §4).
Those model downloads aren't available in this environment, so each metric is
a pluggable backend: the synthesis/measurement driver is here, the scorer is
injected (or the built-in fallback is used where one exists).
"""

from .harness import batch_synthesize, eval_rtf, speaker_similarity, EvalResult
