def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
    from vosk_tts_tpu.ops.stft import mel_filterbank

    return mel_filterbank(sr, n_fft, n_mels, float(fmin), None if fmax is None else float(fmax))
