"""VITS2 GAN training step — one fused pjit step, everything on device.

Mirrors training/vits2/train_ms.py:330-451 (update order D -> durD -> G, same
loss terms) with the TPU-native differences:

  * the whole step (G forward incl. MAS, both D updates, G update) is ONE
    jitted function — no host sync anywhere in the loop;
  * the G forward runs once: its VJP is captured (``jax.vjp``) and reused for
    the generator update, so the G update differentiates through the *updated*
    discriminators exactly like the reference, without recomputing the
    forward;
  * data parallelism is a mesh axis: batch arrays are sharded over 'data',
    params replicated; XLA inserts the gradient all-reduce (the reference's
    DDP/NCCL, train_ms.py:74-77).

The WavLM/SLM branch (train_ms.py:397-406,441-444) requires a frozen WavLM
encoder; it is gated off by default (``use_slm=False``) until the JAX WavLM
port lands — the WavLMDiscriminator itself is implemented
(models/discriminators.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..models import vits2
from ..models import discriminators as D
from ..ops.commons import slice_segments
from ..ops.pqmf import pqmf_analysis
from ..ops.stft import mel_spectrogram
from . import losses as L


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4
    betas: Sequence[float] = (0.8, 0.99)
    eps: float = 1e-9
    lr_decay: float = 0.999875  # per epoch (ExponentialLR)
    c_mel: float = 45.0
    c_kl: float = 1.0
    # mel/stft params (configs/mb_istft_vits2_multi.json data block)
    sampling_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float | None = None
    # subband stft loss resolutions (train block :18-21)
    fft_sizes: Sequence[int] = (384, 683, 171)
    hop_sizes: Sequence[int] = (30, 60, 10)
    win_lengths: Sequence[int] = (150, 300, 60)
    use_dur_disc: bool = True
    use_slm: bool = False
    # discriminator shape (reference defaults; shrinkable for dryrun/smoke)
    disc_periods: Sequence[int] = D.PERIODS
    disc_spec_ffts: Sequence[int] = D.SPEC_FFTS


def make_optimizer(tcfg: TrainConfig):
    """AdamW as the reference (train_ms.py:207-235); lr injected so the
    per-epoch exponential decay is a host-side scalar update."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=tcfg.learning_rate, b1=tcfg.betas[0], b2=tcfg.betas[1],
        eps=tcfg.eps, weight_decay=0.01,
    )


def init_train_state(key, mcfg: vits2.VITS2Config, tcfg: TrainConfig,
                     slm_hidden: int = 768, slm_layers: int = 13, slm_initial: int = 64):
    kg, kd, kdur, kwd = jax.random.split(key, 4)
    params_g = vits2.synthesizer_init(kg, mcfg)
    params_d = D.mpmsd_init(kd, periods=tuple(tcfg.disc_periods), spec_ffts=tuple(tcfg.disc_spec_ffts))
    params_dur = (
        D.duration_disc_init(kdur, mcfg.hidden_channels, mcfg.hidden_channels, 3, variant=2)
        if tcfg.use_dur_disc
        else None
    )
    opt = make_optimizer(tcfg)
    state = {
        "step": jnp.zeros((), jnp.int32),
        "params_g": params_g,
        "params_d": params_d,
        "opt_g": opt.init(params_g),
        "opt_d": opt.init(params_d),
    }
    if params_dur is not None:
        state["params_dur"] = params_dur
        state["opt_dur"] = opt.init(params_dur)
    if tcfg.use_slm:
        params_wd = D.wavlm_disc_init(kwd, slm_hidden, slm_layers, slm_initial)
        state["params_wd"] = params_wd
        state["opt_wd"] = opt.init(params_wd)
    return state


def lr_at_epoch(tcfg: TrainConfig, epoch: int) -> float:
    return tcfg.learning_rate * (tcfg.lr_decay**epoch)


def set_lr(state, lr):
    """Update the injected learning rate in every optimizer state.

    All four optimizers (G, D, durD, and the WavLM/SLM discriminator) share
    one ExponentialLR schedule in the reference (train_ms.py:283-295)."""
    out = dict(state)
    for k in ("opt_g", "opt_d", "opt_dur", "opt_wd"):
        if k in state:
            s = state[k]
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            out[k] = s
    return out


def make_train_step(mcfg: vits2.VITS2Config, tcfg: TrainConfig, *, mas_noise_scale: float = 0.0,
                    slm=None, compute_dtype=None):
    """Returns jit-able ``step(state, batch, rng) -> (state, metrics)``.

    batch: x (B,Tx) int32, x_lengths (B,), mel (B,Tf,n_mel), mel_lengths (B,),
    wav (B,Ts), sid (B,). ``use_mel_posterior_encoder`` semantics: the
    posterior consumes the mel directly (train_ms.py:81-88,351-356).

    ``slm``: optional dict {"params": frozen WavLM pytree, "cfg": WavLMConfig}
    enabling the WavLM/SLM loss branch (train_ms.py:397-406,441-444); the
    state must then also carry params_wd/opt_wd (init_train_state with
    tcfg.use_slm=True).

    ``compute_dtype``: e.g. jnp.bfloat16 for mixed-precision training — the
    TPU analogue of the reference's AMP GradScaler path (train_ms.py:297):
    forwards/backwards run in bf16 through a differentiable cast of the f32
    master params (cotangents come back f32 at the cast boundary, so the
    optimizer state and updates stay full precision); bf16 keeps f32's
    exponent range, so no loss scaling is needed.
    """
    opt = make_optimizer(tcfg)

    def _c(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)
    if slm is not None:
        from ..models.wavlm import stacked_hidden_states, wavlm_apply
        from ..ops.resample import resample

        slm_params, slm_cfg = slm["params"], slm["cfg"]

        def slm_states(wav):
            w16 = resample(wav, tcfg.sampling_rate, 16000)
            return wavlm_apply(slm_params, slm_cfg, w16)
    seg_frames = mcfg.segment_size
    seg_samples = seg_frames * tcfg.hop_length
    periods = tuple(tcfg.disc_periods)
    spec_ffts = tuple(tcfg.disc_spec_ffts)

    def mel_of(wav):
        return mel_spectrogram(
            wav, tcfg.filter_length, tcfg.n_mel_channels, tcfg.sampling_rate,
            tcfg.hop_length, tcfg.win_length, tcfg.mel_fmin, tcfg.mel_fmax,
        )

    def step(state, batch, rng):
        x, x_lengths = batch["x"], batch["x_lengths"]
        mel, mel_lengths = _c(batch["mel"]), batch["mel_lengths"]
        wav, sid = _c(batch["wav"]), batch["sid"]

        # ---- G forward once, VJP captured -------------------------------
        def fwd(params_g):
            out = vits2.forward_train(
                _c(params_g), mcfg, x, x_lengths, mel, mel_lengths, sid,
                rng=rng, mas_noise_scale=mas_noise_scale,
            )
            ids = out.pop("ids_slice")
            attn = out.pop("attn")
            return out, (ids, attn)

        out, vjp_fn, (ids_slice, _) = jax.vjp(fwd, state["params_g"], has_aux=True)

        y_hat = out["wav"][..., 0]  # (B, seg_samples)
        y_real = slice_segments(wav[..., None], ids_slice * tcfg.hop_length, seg_samples)[..., 0]
        y_mel = slice_segments(mel, ids_slice, seg_frames)
        y_hat_mel = mel_of(y_hat)

        metrics = {}

        # ---- Discriminator update (train_ms.py:377-412) ------------------
        def d_loss_fn(params_d):
            yr, yg, _, _ = D.mpmsd_apply(_c(params_d), y_real, jax.lax.stop_gradient(y_hat),
                                         periods=periods, spec_ffts=spec_ffts)
            loss_disc, _, _ = L.discriminator_loss(yr, yg)
            loss_tprls = L.discriminator_tprls_loss(yr, yg)
            return loss_disc + loss_tprls

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state["params_d"])
        d_updates, opt_d = opt.update(d_grads, state["opt_d"], state["params_d"])
        params_d = optax.apply_updates(state["params_d"], d_updates)
        metrics["loss_disc"] = d_loss

        # ---- WavLM/SLM discriminator update (train_ms.py:397-406) -------
        params_wd, opt_wd = state.get("params_wd"), state.get("opt_wd")
        if slm is not None and params_wd is not None:
            hs_real = jax.lax.stop_gradient(stacked_hidden_states(slm_states(y_real)))
            hs_fake = jax.lax.stop_gradient(stacked_hidden_states(slm_states(y_hat)))

            def wd_loss_fn(p):
                dr = D.wavlm_disc_apply(p, hs_real)
                dg = D.wavlm_disc_apply(p, hs_fake)
                return jnp.mean((1 - dr) ** 2) + jnp.mean(dg**2)

            wd_loss, wd_grads = jax.value_and_grad(wd_loss_fn)(params_wd)
            wd_updates, opt_wd = opt.update(wd_grads, opt_wd, params_wd)
            params_wd = optax.apply_updates(params_wd, wd_updates)
            metrics["loss_slm_disc"] = wd_loss

        # ---- Duration discriminator update (train_ms.py:384-395) --------
        params_dur, opt_dur = state.get("params_dur"), state.get("opt_dur")
        if params_dur is not None:
            hx = jax.lax.stop_gradient(out["x"])
            xm = jax.lax.stop_gradient(out["x_mask"])
            logw_r = jax.lax.stop_gradient(out["logw_"])
            logw_g = jax.lax.stop_gradient(out["logw"])

            def dur_loss_fn(p):
                pr, pg = D.duration_disc_apply(_c(p), hx, xm, logw_r, logw_g)
                loss, _, _ = L.discriminator_loss([pr], [pg])
                return loss

            dur_loss, dur_grads = jax.value_and_grad(dur_loss_fn)(params_dur)
            dur_updates, opt_dur = opt.update(dur_grads, opt_dur, params_dur)
            params_dur = optax.apply_updates(params_dur, dur_updates)
            metrics["loss_dur_disc"] = dur_loss

        # ---- Generator update (train_ms.py:414-451), via captured VJP ----
        def g_loss_fn(o):
            yh = o["wav"][..., 0]
            yh_mel = mel_of(yh)
            yr_, yg_, fmap_r, fmap_g = D.mpmsd_apply(_c(params_d), y_real, yh,
                                                     periods=periods, spec_ffts=spec_ffts)
            loss_gen, _ = L.generator_loss(yg_)
            loss_gen_tprls = L.generator_tprls_loss(yr_, yg_)
            loss_fm = L.feature_loss(fmap_r, fmap_g)
            n = min(y_mel.shape[1], yh_mel.shape[1])
            loss_mel = jnp.mean(jnp.abs(y_mel[:, :n] - yh_mel[:, :n])) * tcfg.c_mel
            loss_dur = jnp.sum(o["l_length"])
            loss_kl = L.kl_loss(o["z_p"], o["logs_q"], o["m_p"], o["logs_p"], o["y_mask"]) * tcfg.c_kl
            if mcfg.decoder_type == "mb_istft":
                y_mb = pqmf_analysis(y_real[..., None], subbands=mcfg.subbands)
                loss_subband = L.subband_stft_loss(
                    y_mb, o["wav_mb"], tcfg.fft_sizes, tcfg.hop_sizes, tcfg.win_lengths
                )
            else:
                loss_subband = 0.0
            total = loss_gen + loss_gen_tprls + loss_fm + loss_mel + loss_dur + loss_kl + loss_subband
            if params_dur is not None:
                pr, pg = D.duration_disc_apply(_c(params_dur), o["x"], out["x_mask"], o["logw_"], o["logw"])
                loss_dur_gen, _ = L.generator_loss([pg])
                total = total + loss_dur_gen
            if slm is not None and params_wd is not None:
                # loss_lm: per-layer L1 to the real embeddings (losses.py:111-118);
                # loss_lm_gen: LSGAN against the (updated) SLM discriminator
                hs_fake_g = slm_states(yh)
                hs_real_ng = [jax.lax.stop_gradient(h) for h in slm_states(y_real)]
                loss_lm = sum(jnp.mean(jnp.abs(hr - hf)) for hr, hf in zip(hs_real_ng, hs_fake_g))
                dg = D.wavlm_disc_apply(params_wd, stacked_hidden_states(hs_fake_g))
                loss_lm_gen = jnp.mean((1 - dg) ** 2)
                total = total + loss_lm + loss_lm_gen
            return total, {
                "loss_gen": loss_gen, "loss_fm": loss_fm, "loss_mel": loss_mel,
                "loss_dur": loss_dur, "loss_kl": loss_kl, "loss_subband": loss_subband,
            }

        (g_loss, g_metrics), out_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(out)
        (g_grads,) = vjp_fn(out_grads)
        g_updates, opt_g = opt.update(g_grads, state["opt_g"], state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_updates)
        metrics["loss_gen_all"] = g_loss
        metrics.update(g_metrics)

        new_state = {
            "step": state["step"] + 1,
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": opt_g,
            "opt_d": opt_d,
        }
        if params_dur is not None:
            new_state["params_dur"] = params_dur
            new_state["opt_dur"] = opt_dur
        if params_wd is not None:
            new_state["params_wd"] = params_wd
            new_state["opt_wd"] = opt_wd
        return new_state, metrics

    return step
