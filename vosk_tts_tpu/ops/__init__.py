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
from .stft import (
    istft,
    istft_onnx,
    spectrogram,
    spec_to_mel,
    mel_spectrogram,
    mel_filterbank,
)
from .wn import (
    wn_init,
    wn_apply,
    resblock1_init,
    resblock1_apply,
    resblock2_init,
    resblock2_apply,
    ddsconv_init,
    ddsconv_apply,
    convrelunorm_init,
    convrelunorm_apply,
    leaky_relu,
)
from .attention import (
    mha_init,
    mha_apply,
    ffn_init,
    ffn_apply,
    encoder_init,
    encoder_apply,
    decoder_init,
    decoder_apply,
    fft_init,
    fft_apply,
)
from .resample import resample
from .flows import (
    log_flow,
    flip_flow,
    elementwise_affine_init,
    elementwise_affine_apply,
    residual_coupling_init,
    residual_coupling_apply,
    convflow_init,
    convflow_apply,
)
from .transforms import piecewise_rational_quadratic_transform
from .pqmf import pqmf_analysis, pqmf_synthesis, pqmf_filters
from .mas import maximum_path
