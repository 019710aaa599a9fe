"""Shared TPU op library.

One kernel set serves every model family (VITS2, StableTTS, QuickVC,
GPT-SoVITS) — replacing the reference's four copy-pasted op stacks
(training/vits2/modules.py, training/stabletts/..., vc/..., gpt-sovits/...).

Layout convention: activations are channels-last ``(batch, time, channels)``
so the channel axis lands on TPU vector lanes and matmuls contract over it.
Masks are ``(batch, time, 1)`` float arrays.
"""

from .commons import (
    sequence_mask,
    generate_path,
    intersperse,
    slice_segments,
    rand_slice_segments,
    fused_gate,
    kl_divergence,
    subsequent_mask,
)
from .conv import conv1d, conv_transpose1d, depthwise_conv1d
from .norm import layer_norm
