"""Golden tests: STFT/iSTFT/mel vs torch / reference semantics."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import vosk_tts_tpu.ops.stft as S

import oracle


def test_spectrogram_matches_reference(rng):
    """spectrogram == mel_processing.spectrogram_torch (torch.stft center=False
    with external (n_fft-hop)//2 reflect pad)."""
    n_fft, hop, win = 1024, 256, 1024
    y = (rng.standard_normal((2, 8192)) * 0.3).astype(np.float32)

    got = S.spectrogram(jnp.asarray(y), n_fft, hop, win)

    yt = torch.from_numpy(y)
    pad = (n_fft - hop) // 2
    yp = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(yp, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
                      center=False, normalized=False, onesided=True, return_complex=True)
    want = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6).numpy()  # (B, F, T)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-4)


def test_istft_matches_torch(rng):
    """istft == torch.istft(center=True) for arbitrary (mag, phase)."""
    n_fft, hop, win = 16, 4, 16
    frames = 64
    mag = np.abs(rng.standard_normal((2, frames, n_fft // 2 + 1))).astype(np.float32)
    phase = (rng.standard_normal((2, frames, n_fft // 2 + 1)) * 2).astype(np.float32)

    got = S.istft(jnp.asarray(mag), jnp.asarray(phase), n_fft, hop, win)

    mt = torch.from_numpy(mag.transpose(0, 2, 1))
    pt = torch.from_numpy(phase.transpose(0, 2, 1))
    want = torch.istft(mt * torch.exp(1j * pt), n_fft, hop, win, window=torch.hann_window(win)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_istft_larger_window(rng):
    n_fft, hop, win = 1024, 256, 1024
    frames = 20
    mag = np.abs(rng.standard_normal((1, frames, n_fft // 2 + 1))).astype(np.float32)
    phase = rng.standard_normal((1, frames, n_fft // 2 + 1)).astype(np.float32)
    got = S.istft(jnp.asarray(mag), jnp.asarray(phase), n_fft, hop, win)
    mt = torch.from_numpy(mag.transpose(0, 2, 1))
    pt = torch.from_numpy(phase.transpose(0, 2, 1))
    want = torch.istft(mt * torch.exp(1j * pt), n_fft, hop, win, window=torch.hann_window(win)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_istft_onnx_matches_reference_class(rng):
    """istft_onnx == reference OnnxSTFT.inverse (the exported-model path)."""
    ref_stft = oracle.vits2("stft")
    n_fft, hop, win = 16, 4, 16
    m = ref_stft.OnnxSTFT(filter_length=n_fft, hop_length=hop, win_length=win)
    frames = 32
    mag = np.abs(rng.standard_normal((2, frames, n_fft // 2 + 1))).astype(np.float32)
    phase = (rng.standard_normal((2, frames, n_fft // 2 + 1)) * 3).astype(np.float32)

    got = S.istft_onnx(jnp.asarray(mag), jnp.asarray(phase), n_fft, hop, win)

    with torch.no_grad():
        want = m.inverse(torch.from_numpy(mag.transpose(0, 2, 1)), torch.from_numpy(phase.transpose(0, 2, 1)))
    want = want.squeeze(1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    fb = S.mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support, peaks are monotonically increasing in frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    assert fb.sum() > 0
    # Slaney normalization: each filter integrates (approx) to 2/(band width in Hz)
    # -> rows with wider bands have smaller peaks
    assert fb[0].max() > fb[-1].max()


def test_mel_spectrogram_runs(rng):
    y = (rng.standard_normal((2, 4096)) * 0.2).astype(np.float32)
    mel = S.mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024, 0.0, None)
    assert mel.shape == (2, 4096 // 256, 80)
    assert np.isfinite(np.asarray(mel)).all()


def test_istft_roundtrip(rng):
    """stft(center=True semantics) -> istft reconstructs the signal."""
    n_fft, hop, win = 64, 16, 64
    t = 1024
    y = rng.standard_normal((1, t)).astype(np.float32) * 0.5
    re, im = S.stft(jnp.asarray(y), n_fft, hop, win, pad=n_fft // 2)
    mag = jnp.sqrt(re**2 + im**2 + 1e-12)
    phase = jnp.arctan2(im, re)
    rec = S.istft(mag, phase, n_fft, hop, win)
    n = min(rec.shape[1], t)
    np.testing.assert_allclose(np.asarray(rec)[0, hop : n - hop], y[0, hop : n - hop], rtol=1e-3, atol=1e-3)


def test_istft_pqmf_fused_exact(rng):
    """Fused iSTFT+envelope+PQMF tail (one blocked FIR at composite stride)
    vs the unfused composition — exact in both istft modes, including the
    envelope/slice edge regions and the small-t fallback."""
    from vosk_tts_tpu.ops.pqmf import pqmf_synthesis

    for t in (65, 129, 40):  # 40 exercises the small-t fallback
        for mode in ("torch", "onnx"):
            mag = jnp.asarray(np.abs(rng.standard_normal((2, t, 4, 9))).astype(np.float32))
            ph = jnp.asarray(rng.standard_normal((2, t, 4, 9)).astype(np.float32))
            want = pqmf_synthesis(S.istft_multiband(mag, ph, 16, 4, 16, mode=mode),
                                  subbands=4)
            got = S.istft_pqmf_fused(mag, ph, 16, 4, 16, subbands=4, mode=mode)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"t={t} mode={mode}")


def test_mb_decoder_tail_fused_exact(rng):
    """Lane-space spec/phase + composite FIR from the raw conv_post
    activation vs the reshape->_spec_phase->istft->pqmf composition."""
    from vosk_tts_tpu.ops.pqmf import pqmf_synthesis

    for t in (65, 40):
        for mode in ("torch", "onnx"):
            x = jnp.asarray((rng.standard_normal((2, t, 72)) * 0.5).astype(np.float32))
            xs = x.reshape(2, t, 4, 18)
            spec = jnp.exp(xs[..., :9])
            phase = np.pi * jnp.sin(xs[..., 9:])
            want = pqmf_synthesis(S.istft_multiband(spec, phase, 16, 4, 16, mode=mode),
                                  subbands=4)
            got = S.mb_decoder_tail_fused(x, 16, 4, 16, subbands=4, mode=mode)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"t={t} mode={mode}")
