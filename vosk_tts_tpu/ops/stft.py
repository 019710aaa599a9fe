"""STFT / iSTFT / mel-spectrogram, formulated as MXU matmuls.

Numerical semantics match the reference exactly (the allclose gate):

  * ``spectrogram`` == ``spectrogram_torch`` (training/vits2/mel_processing.py:49-72):
    reflect-pad by (n_fft-hop)//2 on both sides, then a center=False STFT with a
    Hann window and magnitude = sqrt(re^2 + im^2 + 1e-6).
  * ``spec_to_mel`` / ``mel_spectrogram`` == mel_processing.py:75-125 with the
    librosa Slaney-scale/Slaney-norm filterbank (re-derived here in numpy;
    librosa.filters.mel defaults sr/n_fft/n_mels/fmin/fmax, htk=False).
  * ``istft`` == ``torch.istft(center=True)`` as used by TorchSTFT.inverse
    (training/vits2/stft.py:270-296) — overlap-add plus window-envelope
    normalization, then trim n_fft//2 from each end.
  * ``istft_onnx`` == OnnxSTFT.inverse (training/vits2/stft.py:181-267): plain
    conv-transpose overlap-add scaled by n_fft/hop (no envelope correction) and
    trimmed — the path baked into the exported multistream models.

TPU formulation: the framing+DFT is a single strided conv whose kernel is the
windowed real-DFT basis (n_fft taps, n_fft+2 output channels); the iSTFT is the
matching transposed conv. Both lower onto the MXU as dense matmuls — no FFT
butterflies (XLA:TPU has no fast FFT; for these sizes (16..1280) the dense DFT
matmul is faster anyway and fuses with neighbouring elementwise work).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .conv import conv1d, conv_transpose1d


# ---------------------------------------------------------------------------
# Static (numpy) basis construction — computed once per (n_fft, hop, win).
# ---------------------------------------------------------------------------


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window == torch.hann_window(win) == scipy get_window fftbins."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


@lru_cache(maxsize=None)
def _dft_bases(n_fft: int, win_length: int):
    """Windowed real-DFT forward basis (n_fft, n_fft+2) and inverse basis.

    Forward: columns [cos_k | -sin_k] so that frames @ basis gives
    [real(X_k) ; imag(X_k)] for k = 0..n_fft/2 (matching np.fft conventions
    used by reference stft.py:91-99: fft of identity, real rows then imag).
    Inverse: pinv(scale * fourier_basis).T * window (stft.py:100-101).
    """
    cutoff = n_fft // 2 + 1
    k = np.arange(cutoff)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    fourier = np.vstack([np.cos(ang), -np.sin(ang)])  # (n_fft+2, n_fft)

    window = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    window[off : off + win_length] = hann_window(win_length)

    forward = (fourier * window[None, :]).T.astype(np.float32)  # (n_fft, 2*cutoff)
    inv = np.linalg.pinv(fourier).T  # (n_fft+2, n_fft); scale folded in by caller
    inverse = (inv * window[None, :]).astype(np.float32)  # (n_fft+2, n_fft)
    return forward, inverse


@lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float | None
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized mel filterbank (n_mels, n_fft//2+1).

    Re-derivation of librosa.filters.mel defaults (htk=False, norm='slaney'),
    which mel_processing.py:80,105 relies on.
    """
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# On-device transforms. Waveforms are (B, T); spectrograms are (B, frames, F)
# channels-last so F rides the TPU lane axis.
# ---------------------------------------------------------------------------


def _reflect_pad(y: jax.Array, pad: int) -> jax.Array:
    if pad == 0:
        return y
    return jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")


def stft(y: jax.Array, n_fft: int, hop: int, win: int, *, pad: int | None = None):
    """Real STFT. y: (B, T) -> (real, imag) each (B, frames, n_fft//2+1).

    ``pad`` defaults to the reference spectrogram_torch padding (n_fft-hop)//2
    with center=False framing; pass pad=n_fft//2 for torch.stft center=True
    semantics.
    """
    if pad is None:
        pad = (n_fft - hop) // 2
    y = _reflect_pad(y, pad)
    fwd, _ = _dft_bases(n_fft, win)
    frames = conv1d(y[..., None], jnp.asarray(fwd, dtype=y.dtype)[:, None, :], stride=hop, padding=0)
    cutoff = n_fft // 2 + 1
    return frames[..., :cutoff], frames[..., cutoff:]


def spectrogram(y: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """Magnitude spectrogram matching mel_processing.spectrogram_torch:49-72.

    Returns (B, frames, n_fft//2+1) channels-last (reference returns (B, F, T))."""
    re, im = stft(y, n_fft, hop, win)
    return jnp.sqrt(re * re + im * im + 1e-6)


def spectral_normalize(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """Dynamic-range compression log(clamp(x)) (mel_processing.py:17-23)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def spec_to_mel(
    spec: jax.Array, n_fft: int, num_mels: int, sr: int, fmin: float, fmax: float | None
) -> jax.Array:
    """Linear spectrogram (B, T, F) -> log-mel (B, T, n_mels)."""
    fb = jnp.asarray(mel_filterbank(sr, n_fft, num_mels, fmin, fmax))
    return spectral_normalize(spec @ fb.T)


def mel_spectrogram(
    y: jax.Array, n_fft: int, num_mels: int, sr: int, hop: int, win: int, fmin: float, fmax: float | None
) -> jax.Array:
    """Waveform (B, T) -> log-mel (B, frames, n_mels) (mel_processing.py:87-125)."""
    return spec_to_mel(spectrogram(y, n_fft, hop, win), n_fft, num_mels, sr, fmin, fmax)


@lru_cache(maxsize=None)
def _window_envelope_np(n_fft: int, hop: int, win: int, n_frames: int) -> np.ndarray:
    """Sum-squared window envelope over the overlap-add output (static shape)."""
    w = np.zeros(n_fft)
    off = (n_fft - win) // 2
    w[off : off + win] = hann_window(win)
    wsq = w * w
    out = np.zeros(n_fft + hop * (n_frames - 1))
    for i in range(n_frames):
        out[i * hop : i * hop + n_fft] += wsq
    return out.astype(np.float32)


def _ola_inverse(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """Overlap-add of per-frame windowed inverse real-DFTs, as ONE transposed
    conv (kernel = windowed pinv basis, stride = hop) — a single MXU matmul
    per tile, exactly mirroring the reference's conv_transpose1d formulation
    (training/vits2/stft.py:146-151, 234-239)."""
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    spectra = jnp.concatenate([re, im], axis=-1)  # (B, T, n_fft+2)
    _, inv = _dft_bases(n_fft, win)
    w = jnp.asarray(inv, dtype=spectra.dtype)[..., None].transpose(1, 0, 2)  # (K, C_in, 1)
    y = conv_transpose1d(spectra, w, stride=hop, padding=0)
    return y[..., 0]  # (B, hop*(T-1) + n_fft)


def istft(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """Inverse STFT matching torch.istft(center=True) (TorchSTFT.inverse,
    training/vits2/stft.py:283-288): OLA(irfft(X) * window) / OLA(window^2),
    trimmed by n_fft//2 on each side.

    mag/phase: (B, frames, n_fft//2+1) -> waveform (B, (frames-1)*hop).
    """
    t = mag.shape[1]
    y = _ola_inverse(mag, phase, n_fft, hop, win)
    env = _window_envelope_np(n_fft, hop, win, t)
    y = y / jnp.asarray(np.where(env > 1.1754944e-38, env, 1.0), dtype=y.dtype)
    half = n_fft // 2
    return y[:, half : y.shape[1] - half]


def istft_multiband(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int,
                    win: int, *, mode: str = "torch") -> jax.Array:
    """All-subband inverse STFT in one conv: mag/phase (B, T, sub, n_fft//2+1)
    -> (B, (T-1)*hop [+0/-0 per mode trim], sub).

    Same math as mapping :func:`istft`/:func:`istft_onnx` over subbands, but
    the per-subband bases sit block-diagonally in ONE transposed conv, so no
    (B*sub, T, bins) batch-fold transposes and no lane-starved small-channel
    tensors (they cost ~2 ms of the 56 ms serving step, tools/profile).
    The window envelope is identical across subbands, so the torch-mode
    normalization is a broadcast divide.
    """
    b, t, sub, _ = mag.shape
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    spectra = jnp.concatenate([re, im], axis=-1).reshape(b, t, sub * (n_fft + 2))
    _, inv = _dft_bases(n_fft, win)
    w1 = inv[..., None].transpose(1, 0, 2)  # (K=n_fft, n_fft+2, 1)
    wbd = np.zeros((n_fft, sub * (n_fft + 2), sub), dtype=np.float32)
    for s in range(sub):
        wbd[:, s * (n_fft + 2) : (s + 1) * (n_fft + 2), s] = w1[:, :, 0]
    # NOTE: stays on the subpixel conv_transpose lowering — the blocked-FIR
    # matmul formulation measured SLOWER here (2.6 ms vs 1.15 at bench
    # shapes: 72 input lanes already feed the MXU well, and the blocked
    # kernel's 2R-frame window forces an im2col relayout). PQMF synthesis
    # (4 lanes in) is where blocked_fir wins (ops/pqmf.py).
    y = conv_transpose1d(spectra, jnp.asarray(wbd, spectra.dtype), stride=hop, padding=0)
    if mode == "torch":
        env = _window_envelope_np(n_fft, hop, win, t)
        y = y / jnp.asarray(np.where(env > 1.1754944e-38, env, 1.0), y.dtype)[None, :, None]
    half = n_fft // 2
    return y[:, half : y.shape[1] - half, :]


@lru_cache(maxsize=None)
def _fused_mb_kernel(n_fft: int, hop: int, win: int, sub: int, taps: int,
                     cutoff_ratio: float, beta: float, mode: str):
    """Composite kernel for iSTFT(conv_transpose, stride=hop) -> steady-state
    envelope divide -> PQMF synthesis (zero-stuff x sub + FIR), collapsed
    into ONE conv_transpose of stride hop*sub:

        out[u] = sum_t spectra[t, c] . G2[u + off - hop*sub*t, c]

    with off = (taps)//2 + sub*(n_fft//2). Returns (G2 (Kc, C, 1) float32,
    off). The envelope is periodic (period hop) away from the signal edges,
    so it folds into the kernel per tap phase; the caller patches the edge
    samples exactly (istft_pqmf_fused)."""
    from .pqmf import pqmf_filters

    _, inv = _dft_bases(n_fft, win)  # (n_fft+2, n_fft)
    w1 = inv.T  # w1[j, cc]: iSTFT tap j for spectral channel cc

    if mode == "torch":
        env = _window_envelope_np(n_fft, hop, win, 64)
        n0 = hop * (-(-(win - hop) // hop))  # first steady hop-aligned pos
        env_p = env[n0 : n0 + hop]  # phase phi = (tap j) % hop
    else:
        env_p = np.ones(hop, np.float32)

    _, h_s = pqmf_filters(sub, taps, cutoff_ratio, beta)
    k2 = taps + 1
    wt = h_s.T[::-1, :] * float(sub)  # flipped synthesis filter (K2, sub)

    c_in = sub * (n_fft + 2)
    kc = sub * (n_fft - 1) + k2
    g2 = np.zeros((kc, c_in, 1), np.float32)
    for s in range(sub):
        for cc in range(n_fft + 2):
            c = s * (n_fft + 2) + cc
            for j in range(n_fft):
                coef = w1[j, cc] / env_p[j % hop]
                lo = sub * j  # q - sub*j in [0, K2)
                g2[lo : lo + k2, c, 0] += coef * wt[:, s]
    off = (k2 - 1) // 2 + sub * (n_fft // 2)
    return g2, off


def istft_pqmf_fused(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int,
                     win: int, *, subbands: int, taps: int = 62,
                     cutoff_ratio: float = 0.15, beta: float = 9.0,
                     mode: str = "torch") -> jax.Array:
    """Exactly ``pqmf_synthesis(istft_multiband(mag, phase, ...))`` — the
    whole MB-iSTFT decoder tail beyond conv_post — as ONE blocked upsampling
    FIR at the composite stride hop*subbands (ops/blocked_fir lands it on
    >=128 MXU lanes), instead of conv_transpose -> envelope divide ->
    second FIR over a lane-starved (B, T*hop, sub) intermediate.

    Near the signal edges the composition is NOT a pure convolution: the
    unfused path slices y_full[half:-half] before the PQMF FIR (zero
    context beyond the slice), and torch-mode envelope normalization is
    position-dependent there too. The first/last few samples are therefore
    recomputed via the unfused ops on small frame slices and patched in
    (matching the unfused path to fp-reassociation tolerance)."""
    from . import blocked_fir
    from .pqmf import pqmf_synthesis

    b, t, sub, _ = mag.shape
    stride = hop * subbands
    edge_frames = max(16, -(-((taps + 1) + 2 * win) // stride) + 2)
    if t < 2 * edge_frames + 1:
        y_mb = istft_multiband(mag, phase, n_fft, hop, win, mode=mode)
        return pqmf_synthesis(y_mb, subbands=subbands, taps=taps,
                              cutoff_ratio=cutoff_ratio, beta=beta)

    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    spectra = jnp.concatenate([re, im], axis=-1).reshape(b, t, sub * (n_fft + 2))
    g2, off = _fused_mb_kernel(n_fft, hop, win, subbands, taps,
                               cutoff_ratio, beta, mode)
    z = blocked_fir.upfir_blocked(spectra, g2.astype(np.float32), stride=stride)
    out = z[:, off : off + stride * (t - 1), :]

    patch = 8 * stride  # covers envelope edge region + slice-boundary leak
    nf = edge_frames

    def unfused(m_sl, p_sl):
        y_mb = istft_multiband(m_sl, p_sl, n_fft, hop, win, mode=mode)
        return pqmf_synthesis(y_mb, subbands=subbands, taps=taps,
                              cutoff_ratio=cutoff_ratio, beta=beta)

    head = unfused(mag[:, :nf], phase[:, :nf])
    tail = unfused(mag[:, -nf:], phase[:, -nf:])
    out = jnp.concatenate(
        [head[:, :patch], out[:, patch : out.shape[1] - patch],
         tail[:, -patch:]], axis=1)
    return out


@lru_cache(maxsize=None)
def _specphase_lane_maps(n_fft: int, sub: int):
    """Lane-space spec/phase evaluation: the conv_post output x (B, T,
    sub*(n_fft+2)) has, per subband group of n_fft+2 lanes, log-magnitude
    bins [0, cutoff) then phase-argument bins [cutoff, n_fft+2). The iSTFT
    spectra [re | im] per group are

        spectra[c] = exp(x[Pm c]) * sin(pi * sin(x[Pp c]) + off[c])

    (sin(theta + pi/2) = cos(theta) turns the re/im split into a per-lane
    phase offset), so the whole thing is two tiny permutation matmuls plus
    elementwise work in the NATIVE 72-lane layout — no (B, T, sub, bins)
    reshape relayouts (measured 1.1 ms of the round-3 tail)."""
    per = n_fft + 2
    cutoff = n_fft // 2 + 1
    c_tot = sub * per
    pm = np.zeros((c_tot, c_tot), np.float32)
    pp = np.zeros((c_tot, c_tot), np.float32)
    off = np.zeros((c_tot,), np.float32)
    for g in range(sub):
        for j in range(per):
            c = g * per + j
            if j < cutoff:  # re lane: mag bin j, phase bin j
                pm[g * per + j, c] = 1.0
                pp[g * per + cutoff + j, c] = 1.0
                off[c] = np.pi / 2
            else:  # im lane: mag bin j-cutoff, phase bin j-cutoff
                pm[g * per + (j - cutoff), c] = 1.0
                pp[g * per + j, c] = 1.0
                off[c] = 0.0
    return pm, pp, off


def mb_decoder_tail_fused(x: jax.Array, n_fft: int, hop: int, win: int, *,
                          subbands: int, taps: int = 62,
                          cutoff_ratio: float = 0.15, beta: float = 9.0,
                          mode: str = "torch") -> jax.Array:
    """The ENTIRE MB-iSTFT tail after conv_post from the raw (B, T,
    sub*(n_fft+2)) activation: lane-space spec/phase (no 4-D reshapes) +
    the composite iSTFT+envelope+PQMF blocked FIR (istft_pqmf_fused), with
    exact edge patches. Equals

        spec, phase = _spec_phase(x.reshape(B, T, sub, n_fft+2))
        pqmf_synthesis(istft_multiband(spec, phase, ...))

    to fp-reassociation tolerance (tests/test_stft.py)."""
    from . import blocked_fir
    from .pqmf import pqmf_synthesis

    b, t, c_tot = x.shape
    per = n_fft + 2
    cutoff = n_fft // 2 + 1
    stride = hop * subbands

    def unfused_4d(x_sl):
        xs = x_sl.reshape(x_sl.shape[0], x_sl.shape[1], subbands, per)
        spec = jnp.exp(xs[..., :cutoff])
        phase = np.pi * jnp.sin(xs[..., cutoff:])
        y_mb = istft_multiband(spec, phase, n_fft, hop, win, mode=mode)
        return pqmf_synthesis(y_mb, subbands=subbands, taps=taps,
                              cutoff_ratio=cutoff_ratio, beta=beta)

    edge_frames = max(16, -(-((taps + 1) + 2 * win) // stride) + 2)
    if t < 2 * edge_frames + 1:
        return unfused_4d(x)

    pm, pp, off = _specphase_lane_maps(n_fft, subbands)
    xm = x @ jnp.asarray(pm, x.dtype)
    xp = x @ jnp.asarray(pp, x.dtype)
    spectra = jnp.exp(xm) * jnp.sin(np.pi * jnp.sin(xp) + jnp.asarray(off, x.dtype))

    g2, off_k = _fused_mb_kernel(n_fft, hop, win, subbands, taps,
                                 cutoff_ratio, beta, mode)
    z = blocked_fir.upfir_blocked(spectra, g2.astype(np.float32), stride=stride)
    out = z[:, off_k : off_k + stride * (t - 1), :]

    patch = 8 * stride
    head = unfused_4d(x[:, :edge_frames])
    tail = unfused_4d(x[:, -edge_frames:])
    return jnp.concatenate(
        [head[:, :patch], out[:, patch : out.shape[1] - patch],
         tail[:, -patch:]], axis=1)


def istft_onnx(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """OnnxSTFT.inverse semantics (training/vits2/stft.py:234-253): the scale
    inside pinv(scale*fourier) and the trailing *= n_fft/hop cancel, leaving
    plain windowed-pinv overlap-add with NO envelope normalization — the path
    baked into the exported multistream ONNX models."""
    y = _ola_inverse(mag, phase, n_fft, hop, win)
    half = n_fft // 2
    return y[:, half : y.shape[1] - half]
