"""Minimal librosa stand-in for importing reference modules as test oracles.

The real librosa is not installed in this image; the reference op files only
use `librosa.util.pad_center/tiny/normalize` and `librosa.filters.mel`. The
mel filterbank here delegates to our own numpy re-derivation
(vosk_tts_tpu.ops.stft.mel_filterbank), so mel tests validate shape/plumbing
while the filterbank itself is covered by dedicated property tests.
"""

from . import util, filters  # noqa: F401
