"""Minimal torchaudio stand-in (Spectrogram only) for reference-module import."""

from . import transforms  # noqa: F401
