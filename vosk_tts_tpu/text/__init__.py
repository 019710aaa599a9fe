"""Text frontend: Russian G2P, symbol tables, multistream phoneme encoding.

Pure-Python host-side code (no device work) mirroring the behavior of the
reference frontend (vosk_tts/g2p.py, vosk_tts/synth.py:152-454,
training/*/text/). Kept separate from the model zoo so pod-scale serving can
run it on CPU threads while the TPU runs the acoustic graph.
"""

from .g2p import convert
from .symbols import plain_symbol_map, multistream_symbol_map, PHONES, BASE_SYMBOLS
from .frontend import (
    g2p_plain,
    g2p_noembed,
    g2p_multistream,
    load_dictionary,
)
