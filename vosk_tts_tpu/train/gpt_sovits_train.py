"""GPT-SoVITS training steps.

Stage 1 (s1_train.py + t2s_lightning_module.py:119-141): AR cross-entropy
with ScaledAdam (lr locked to 0.002 by the reference's WarmupCosineLRSchedule
— see train/scaled_adam.py) as the default, with AdamW + warmup-cosine as an
alternative. Stage 2 (s2_train.py): the usual VITS GAN recipe over the
SoVITS graph (MultiPeriodDiscriminator, mel/KL/fm losses + RVQ commit loss),
same fused single-jit structure as train/vits2_train.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..models import discriminators as D
from ..models import gpt_sovits as G
from ..ops.commons import slice_segments
from ..ops.stft import mel_spectrogram
from . import losses as L
from .vits2_train import TrainConfig, make_optimizer


@dataclass(frozen=True)
class S1TrainConfig:
    # "scaled_adam" = reference parity (t2s_lightning_module.py:119-127:
    # lr=0.01, betas (0.9, 0.95), clipping_scale 2.0, period 1000, with the
    # schedule locked at 0.002); "adamw" = plain warmup-cosine AdamW.
    optimizer: str = "scaled_adam"
    learning_rate: float = 1e-4
    warmup_steps: int = 2000
    total_steps: int = 300_000
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    # DPO branch (s1 config train.if_dpo; t2s_lightning_module.py:38). The
    # reference halves batch_size when on (ar/data/data_module.py:45) — that
    # is a data-driver concern, mirrored in tools/gpt_sovits docs.
    if_dpo: bool = False


def make_s1_optimizer(tcfg: S1TrainConfig):
    if tcfg.optimizer == "scaled_adam":
        from .scaled_adam import scaled_adam, warmup_cosine_lr

        return scaled_adam(
            learning_rate=warmup_cosine_lr(0.0, 0.01, 0.002, tcfg.warmup_steps,
                                           tcfg.total_steps, locked=0.002),
            betas=(0.9, 0.95), clipping_scale=2.0, clipping_update_period=1000,
        )
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.learning_rate, tcfg.warmup_steps, tcfg.total_steps
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay),
    )


def init_s1_state(key, mcfg: G.ARConfig, tcfg: S1TrainConfig):
    params = G.ar_init(key, mcfg)
    opt = make_s1_optimizer(tcfg)
    return {"step": jnp.zeros((), jnp.int32), "params": params, "opt": opt.init(params)}


def make_s1_step(mcfg: G.ARConfig, tcfg: S1TrainConfig):
    opt = make_s1_optimizer(tcfg)

    def step(state, batch, rng):
        def loss_fn(params):
            if tcfg.if_dpo:
                return G.ar_forward_train_dpo(
                    params, mcfg, batch["x"], batch["x_lengths"], batch["y"],
                    batch["y_lengths"], batch["bert"], rng=rng,
                )
            loss, acc = G.ar_forward_train(
                params, mcfg, batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"], batch["bert"]
            )
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, opt_state = opt.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"step": state["step"] + 1, "params": params, "opt": opt_state},
            {"loss": loss, "acc": acc},
        )

    return step


@dataclass(frozen=True)
class S2TrainConfig(TrainConfig):
    sampling_rate: int = 32000
    filter_length: int = 2048
    hop_length: int = 640
    win_length: int = 2048
    c_commit: float = 1.0
    # RVQ EMA buffers (module/quantize.py:44-50 defaults)
    vq_decay: float = 0.99
    vq_epsilon: float = 1e-5
    vq_threshold_ema_dead_code: float = 2.0
    vq_kmeans_iters: int = 50


def init_s2_state(key, mcfg: G.SoVITSConfig, tcfg: S2TrainConfig):
    from ..ops import rvq

    kg, kd = jax.random.split(key)
    params_g = G.sovits_init(kg, mcfg)
    params_d = D.mpd_init(kd)
    opt = make_optimizer(tcfg)
    return {
        "step": jnp.zeros((), jnp.int32),
        "params_g": params_g,
        "params_d": params_d,
        "opt_g": opt.init(params_g),
        "opt_d": opt.init(params_d),
        # EMA-owned codebook buffers (core_vq.py kmeans_init=True: zero embed,
        # inited on the first batch); params_g["codebook"] mirrors vq["embed"]
        "vq": rvq.state_init(mcfg.n_codes, mcfg.ssl_dim),
    }


def make_s2_step(mcfg: G.SoVITSConfig, tcfg: S2TrainConfig):
    from ..ops import rvq
    from ..ops.conv import conv1d

    opt = make_optimizer(tcfg)
    seg_samples = mcfg.segment_size * tcfg.hop_length
    ssl_stride = 2 if mcfg.semantic_frame_rate == "25hz" else 1

    def mel_of(wav):
        return mel_spectrogram(wav, tcfg.filter_length, tcfg.n_mel_channels, tcfg.sampling_rate,
                               tcfg.hop_length, tcfg.win_length, tcfg.mel_fmin, tcfg.mel_fmax)

    def step(state, batch, rng):
        """batch: ssl (B,Ts,768), spec (B,Tf,F), spec_lengths, text,
        text_lengths, wav (B, Tf*hop)."""
        rng, r_vq = jax.random.split(rng)

        # RVQ buffer transition (core_vq.py training forward): kmeans-init the
        # codebook on the first batch, then quantize with it in the graph and
        # EMA-update afterwards. The codebook is a buffer, not a gradient
        # parameter — params_g["codebook"] mirrors vq["embed"].
        proj = state["params_g"]["ssl_proj"]
        x_ssl = jax.lax.stop_gradient(
            conv1d(batch["ssl"], proj["w"], proj["b"], stride=ssl_stride, padding=0)
        )
        flat = x_ssl.reshape(-1, x_ssl.shape[-1])
        r_init, r_ema = jax.random.split(r_vq)
        vq = rvq.maybe_kmeans_init(state["vq"], flat, r_init,
                                   kmeans_iters=tcfg.vq_kmeans_iters)
        state = {**state, "params_g": {**state["params_g"], "codebook": vq["embed"]}}

        def fwd(params_g):
            out = G.sovits_forward_train(
                params_g, mcfg, batch["ssl"], batch["spec"], batch["spec_lengths"],
                batch["text"], batch["text_lengths"], rng=rng,
            )
            ids = out.pop("ids_slice")
            return out, ids

        out, vjp_fn, ids_slice = jax.vjp(fwd, state["params_g"], has_aux=True)
        y_hat = out["wav"][..., 0][:, :seg_samples]
        y_real = slice_segments(batch["wav"][..., None], ids_slice * tcfg.hop_length, seg_samples)[..., 0]
        y_mel = mel_of(y_real)

        def d_loss_fn(params_d):
            yr, yg, _, _ = D.mpd_apply(params_d, y_real, jax.lax.stop_gradient(y_hat))
            loss, _, _ = L.discriminator_loss(yr, yg)
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state["params_d"])
        d_updates, opt_d = opt.update(d_grads, state["opt_d"], state["params_d"])
        params_d = optax.apply_updates(state["params_d"], d_updates)

        def g_loss_fn(o):
            yh = o["wav"][..., 0][:, :seg_samples]
            yr, yg, fmap_r, fmap_g = D.mpd_apply(params_d, y_real, yh)
            loss_gen, _ = L.generator_loss(yg)
            loss_fm = L.feature_loss(fmap_r, fmap_g)
            yh_mel = mel_of(yh)
            n = min(y_mel.shape[1], yh_mel.shape[1])
            loss_mel = jnp.mean(jnp.abs(y_mel[:, :n] - yh_mel[:, :n])) * tcfg.c_mel
            loss_kl = L.kl_loss(o["z_p"], o["logs_q"], o["m_p"], o["logs_p"], o["y_mask"]) * tcfg.c_kl
            total = loss_gen + loss_fm + loss_mel + loss_kl + o["commit_loss"] * tcfg.c_commit
            return total, {"loss_gen": loss_gen, "loss_fm": loss_fm, "loss_mel": loss_mel,
                           "loss_kl": loss_kl, "commit": o["commit_loss"]}

        (g_loss, g_metrics), out_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(out)
        (g_grads,) = vjp_fn(out_grads)
        g_updates, opt_g = opt.update(g_grads, state["opt_g"], state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_updates)

        # EMA codebook update with the pre-update features; the EMA result
        # overrides whatever the (zero-grad) optimizer did to the mirror
        vq = rvq.ema_step(vq, flat, r_ema, decay=tcfg.vq_decay,
                          epsilon=tcfg.vq_epsilon,
                          threshold_ema_dead_code=tcfg.vq_threshold_ema_dead_code)
        params_g = {**params_g, "codebook": vq["embed"]}

        return (
            {"step": state["step"] + 1, "params_g": params_g, "params_d": params_d,
             "opt_g": opt_g, "opt_d": opt_d, "vq": vq},
            {"loss_disc": d_loss, "loss_gen_all": g_loss, **g_metrics},
        )

    return step
