"""QuickVC GAN training step (vc/train.py:46-127) — same structure as the
VITS2 step (fused D->G with captured VJP) on the QuickVC graph."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..models import discriminators as D
from ..models import quickvc as Q
from ..ops.commons import slice_segments
from ..ops.stft import mel_spectrogram
from . import losses as L
from .vits2_train import make_optimizer, TrainConfig


@dataclass(frozen=True)
class VCTrainConfig(TrainConfig):
    sampling_rate: int = 16000
    filter_length: int = 1280
    hop_length: int = 320
    win_length: int = 1280


def init_train_state(key, mcfg: Q.QuickVCConfig, tcfg: VCTrainConfig):
    kg, kd = jax.random.split(key)
    params_g = Q.synthesizer_init(kg, mcfg)
    params_d = D.mpd_init(kd)
    opt = make_optimizer(tcfg)
    return {
        "step": jnp.zeros((), jnp.int32),
        "params_g": params_g,
        "params_d": params_d,
        "opt_g": opt.init(params_g),
        "opt_d": opt.init(params_d),
    }


def make_train_step(mcfg: Q.QuickVCConfig, tcfg: VCTrainConfig):
    opt = make_optimizer(tcfg)
    seg_frames = mcfg.segment_size
    seg_samples = seg_frames * tcfg.hop_length

    def mel_of(wav):
        return mel_spectrogram(wav, tcfg.filter_length, tcfg.n_mel_channels, tcfg.sampling_rate,
                               tcfg.hop_length, tcfg.win_length, tcfg.mel_fmin, tcfg.mel_fmax)

    def step(state, batch, rng):
        """batch: c (B,T,768), spec (B,T,F), mel (B,T,80), wav (B,T*hop)."""

        def fwd(params_g):
            out = Q.forward_train(params_g, mcfg, batch["c"], batch["spec"], batch["mel"], rng=rng)
            ids = out.pop("ids_slice")
            return out, ids

        out, vjp_fn, ids_slice = jax.vjp(fwd, state["params_g"], has_aux=True)
        y_hat = out["wav"][..., 0][:, :seg_samples]
        y_real = slice_segments(batch["wav"][..., None], ids_slice * tcfg.hop_length, seg_samples)[..., 0]
        y_mel = mel_of(y_real)

        def d_loss_fn(params_d):
            yr, yg, _, _ = D.mpd_apply(params_d, y_real, jax.lax.stop_gradient(y_hat))
            loss_disc, _, _ = L.discriminator_loss(yr, yg)
            return loss_disc + L.discriminator_tprls_loss(yr, yg)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state["params_d"])
        d_updates, opt_d = opt.update(d_grads, state["opt_d"], state["params_d"])
        params_d = optax.apply_updates(state["params_d"], d_updates)

        def g_loss_fn(o):
            yh = o["wav"][..., 0][:, :seg_samples]
            yr, yg, fmap_r, fmap_g = D.mpd_apply(params_d, y_real, yh)
            loss_gen, _ = L.generator_loss(yg)
            loss_tprls = L.generator_tprls_loss(yr, yg)
            loss_fm = L.feature_loss(fmap_r, fmap_g)
            yh_mel = mel_of(yh)
            n = min(y_mel.shape[1], yh_mel.shape[1])  # MS-iSTFT length +1 quirk
            loss_mel = jnp.mean(jnp.abs(y_mel[:, :n] - yh_mel[:, :n])) * tcfg.c_mel
            loss_kl = L.kl_loss(o["z_p"], o["logs_q"], o["m_p"], o["logs_p"], o["spec_mask"]) * tcfg.c_kl
            total = loss_gen + loss_tprls + loss_fm + loss_mel + loss_kl
            return total, {"loss_gen": loss_gen, "loss_fm": loss_fm, "loss_mel": loss_mel, "loss_kl": loss_kl}

        (g_loss, g_metrics), out_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(out)
        (g_grads,) = vjp_fn(out_grads)
        g_updates, opt_g = opt.update(g_grads, state["opt_g"], state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_updates)

        metrics = {"loss_disc": d_loss, "loss_gen_all": g_loss, **g_metrics}
        return {
            "step": state["step"] + 1,
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": opt_g,
            "opt_d": opt_d,
        }, metrics

    return step
