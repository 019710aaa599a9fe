"""Training losses (GAN + KL + STFT), matching training/vits2/losses.py and
stft_loss.py numerically. All reductions are branch-free jnp ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import stft as stft_fn


def feature_loss(fmap_r, fmap_g):
    """losses.py:7-15 (×2 scaling)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN D loss (losses.py:18-31)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN G loss (losses.py:34-42)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def _tprls_one(dr, dg, tau=0.04):
    """StyleTTS2 relativistic least-squares term (losses.py:48-55): masked
    mean over elements where dr < dg + median(dr-dg)."""
    diff = dr - dg
    m = jnp.median(diff)
    mask = dr < dg + m
    sq = (diff - m) ** 2
    denom = jnp.maximum(jnp.sum(mask), 1)
    l_rel = jnp.sum(jnp.where(mask, sq, 0.0)) / denom
    return tau - jax.nn.relu(tau - l_rel)


def discriminator_tprls_loss(disc_real_outputs, disc_generated_outputs):
    return sum(_tprls_one(dr, dg) for dr, dg in zip(disc_real_outputs, disc_generated_outputs))


def generator_tprls_loss(disc_real_outputs, disc_generated_outputs):
    # reference swaps the iteration names but computes the same quantity
    # (losses.py:58-65)
    return sum(_tprls_one(dr, dg) for dr, dg in zip(disc_real_outputs, disc_generated_outputs))


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """losses.py:68-83. Channels-last: (B, T, C); z_mask (B, T, 1)."""
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)


def duration_loss(logw, logw_, x_mask):
    """MSE duration loss for the deterministic predictor (models.py:1668)."""
    return jnp.sum((logw - logw_) ** 2) / jnp.sum(x_mask)


# ---------------------------------------------------------------------------
# Multi-resolution STFT loss (stft_loss.py)
# ---------------------------------------------------------------------------


def _stft_mag(x, n_fft, hop, win):
    """torch.stft(center=True) magnitude with the 1e-7 clamp
    (stft_loss.py:12-29). x: (B, T) -> (B, frames, F)."""
    re, im = stft_fn(x, n_fft, hop, win, pad=n_fft // 2)
    return jnp.sqrt(jnp.clip(re * re + im * im, min=1e-7))


def stft_loss(x, y, n_fft, hop, win):
    """(spectral convergence, log-magnitude L1) (stft_loss.py:67-97)."""
    x_mag = _stft_mag(x, n_fft, hop, win)
    y_mag = _stft_mag(y, n_fft, hop, win)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


def multi_resolution_stft_loss(x, y, fft_sizes, hop_sizes, win_lengths):
    """stft_loss.py:100-136: averaged over resolutions."""
    sc_total, mag_total = 0.0, 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss(x, y, n_fft, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(fft_sizes)
    return sc_total / n, mag_total / n


def subband_stft_loss(y_mb, y_hat_mb, fft_sizes, hop_sizes, win_lengths):
    """losses.py:85-90: flatten subbands into batch, sum sc+mag."""
    b, t, sub = y_mb.shape
    y_flat = y_mb.transpose(0, 2, 1).reshape(b * sub, t)
    y_hat_flat = y_hat_mb.transpose(0, 2, 1).reshape(b * sub, -1)[:, :t]
    sc, mag = multi_resolution_stft_loss(y_hat_flat, y_flat, fft_sizes, hop_sizes, win_lengths)
    return sc + mag
