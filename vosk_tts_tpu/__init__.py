"""vosk_tts_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

Re-implements the capabilities of the vosk-tts ecosystem (VITS2 / MB-iSTFT
synthesis, StableTTS flow matching, QuickVC voice conversion, GPT-SoVITS
zero-shot cloning) as a single JAX model zoo on one shared kernel library,
designed for TPU from the ground up:

  * channels-last (B, T, C) layouts so the feature axis maps onto TPU lanes,
  * static shapes + bucketed padding (no dynamic output sizes under jit),
  * matmul-formulated STFT/iSTFT for the MXU,
  * subpixel (depth-to-space) transposed convolutions,
  * on-device monotonic alignment search (anti-diagonal wavefront scan),
  * jax.sharding Mesh + collectives for data/tensor parallel serving/training.

API surface mirrors the reference `vosk_tts` package
(/root/reference/vosk_tts/__init__.py): `Model`, `Synth`.
"""

from .version import __version__

# Heavy imports are kept lazy so `import vosk_tts_tpu` stays cheap for tools
# that only need ops or text processing.


def __getattr__(name):
    if name in ("Model", "Synth"):
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module 'vosk_tts_tpu' has no attribute {name!r}")
