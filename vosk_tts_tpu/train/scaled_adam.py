"""ScaledAdam (k2/icefall) as an optax GradientTransformation.

The reference trains GPT-SoVITS stage 1 with ScaledAdam
(/root/reference/training/gpt-sovits/ar/modules/optim.py:123-622,
t2s_lightning_module.py:119-127): Adam-like updates scaled by each tensor's
parameter RMS, plus a learned per-tensor log-scale updated every
``size_update_period`` steps, plus median-history gradient clipping.

Differences from the torch original, none numeric:
  - The torch class stacks same-shaped tensors into batches purely as a CPU
    speed hack (BatchedOptimizer, optim.py:27-106); per-tensor math is
    identical, so here every pytree leaf is handled independently and XLA
    fuses the whole update into one program.
  - Host-side logging (gradient-dominating-parameter printout) is dropped.
  - The clipping-norm ring buffer, threshold refresh and clip factor are
    state tensors updated with jnp.where instead of python branches, so the
    whole optimizer jits.

The schedule: the reference wraps the optimizer in WarmupCosineLRSchedule
(lr_schedulers.py:11-67) whose ``step()`` overrides everything with
``self.lr = lr = self.end_lr = 0.002`` — i.e. the lr actually executed is a
constant 0.002. ``warmup_cosine_lr`` implements the nominal schedule;
``locked=True`` (default, matching executed reference behavior) returns the
constant lock value.

Golden-tested leaf-by-leaf against the reference optimizer in
tests/test_scaled_adam.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaledAdamState(NamedTuple):
    step: jax.Array            # int32 scalar
    delta: optax.Updates       # momentum-folded parameter change, per leaf
    exp_avg_sq: optax.Updates  # second moment of (clipped) grads, per leaf
    param_rms: optax.Updates   # scalar rms per leaf, refreshed every T steps
    scale_grads: optax.Updates  # (T,) ring of sum(p*grad) per leaf
    scale_exp_avg_sq: optax.Updates  # scalar per leaf
    model_norms: jax.Array     # (clipping_update_period,) ring of tot norms
    model_norm_threshold: jax.Array  # scalar, inf until first refresh


def _is_scalar(p) -> bool:
    return p.size == 1


def scaled_adam(
    learning_rate: float | Callable[[jax.Array], jax.Array] = 0.01,
    betas: tuple[float, float] = (0.9, 0.95),
    clipping_scale: float | None = 2.0,
    scalar_lr_scale: float = 0.1,
    eps: float = 1e-8,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
    scalar_max: float = 10.0,
    size_update_period: int = 4,
    clipping_update_period: int = 1000,
) -> optax.GradientTransformation:
    beta1, beta2 = betas
    T = size_update_period
    P = clipping_update_period

    def init(params):
        zeros_like = lambda p: jnp.zeros_like(p)
        return ScaledAdamState(
            step=jnp.zeros((), jnp.int32),
            delta=jax.tree_util.tree_map(zeros_like, params),
            exp_avg_sq=jax.tree_util.tree_map(zeros_like, params),
            # optim.py:287-290 — rms of the *initial* parameter value
            param_rms=jax.tree_util.tree_map(
                lambda p: jnp.sqrt(jnp.mean(jnp.square(p))), params),
            scale_grads=jax.tree_util.tree_map(
                lambda p: jnp.zeros((T,), p.dtype), params),
            scale_exp_avg_sq=jax.tree_util.tree_map(
                lambda p: jnp.zeros((), p.dtype), params),
            model_norms=jnp.zeros((P,), jnp.float32),
            model_norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
        )

    def update(grads, state: ScaledAdamState, params=None):
        if params is None:
            raise ValueError("scaled_adam requires params")
        step = state.step
        lr = learning_rate(step) if callable(learning_rate) else learning_rate

        leaves_g, treedef = jax.tree_util.tree_flatten(grads)
        leaves_p = treedef.flatten_up_to(params)
        leaves_rms = treedef.flatten_up_to(state.param_rms)

        # ---- global clipping factor (optim.py:300-389) -------------------
        if clipping_scale is None:
            factor = jnp.asarray(1.0, jnp.float32)
            norms = state.model_norms
            threshold = state.model_norm_threshold
        else:
            tot_sumsq = jnp.zeros((), jnp.float32)
            for g, p, rms in zip(leaves_g, leaves_p, leaves_rms):
                g32 = g.astype(jnp.float32)
                if _is_scalar(p):
                    tot_sumsq += jnp.sum(jnp.square(g32))
                else:
                    tot_sumsq += jnp.sum(jnp.square(g32 * rms.astype(jnp.float32)))
            tot_norm = jnp.sqrt(tot_sumsq)
            norms = state.model_norms.at[step % P].set(tot_norm)
            # threshold refresh: clipping_scale * median of the recorded ring
            # (sorted index min(P-1, (P//4)*2), optim.py:347-358)
            med = jnp.sort(norms)[min(P - 1, (P // 4) * 2)]
            refresh = jnp.logical_and(step % P == 0, step > 0)
            threshold = jnp.where(refresh, clipping_scale * med,
                                  state.model_norm_threshold)
            factor = jnp.where(
                step < P, 1.0,
                jnp.minimum(1.0, threshold / (tot_norm + 1e-20)))
            factor = jnp.where(step == 0, 1.0, factor)

        # ---- per-leaf update (optim.py:448-622) ---------------------------
        is_size_step = step % T == T - 1

        def one(g, p, delta, eas, rms, sg, seas):
            # NOTE the reference quirk: _step/_step_scalar re-read p.grad
            # (optim.py:573,606), so the clipping factor reaches ONLY the
            # size-update scale_grads (optim.py:467-478). Replicated exactly.
            g_clip = g * factor.astype(g.dtype)
            delta = beta1 * delta
            if _is_scalar(p):
                # _step_scalar (optim.py:600-622)
                eas = beta2 * eas + (1 - beta2) * jnp.square(g)
                bc2 = 1 - beta2 ** (step + 1)
                denom = jnp.sqrt(eas / bc2) + eps
                delta = delta + (-lr * scalar_lr_scale * (1 - beta1)) * g / denom
                upd = jnp.clip(p, -scalar_max, scalar_max) - p + delta
                return upd, delta, eas, rms, sg, seas

            # size (log-scale) bookkeeping (optim.py:474-489)
            sg = sg.at[step % T].set(jnp.sum(p * g_clip))
            new_rms = jnp.sqrt(jnp.mean(jnp.square(p)))
            rms = jnp.where(is_size_step, new_rms, rms)
            # _size_update (optim.py:499-558), only on size steps with step>0
            beta2c = beta2 ** T
            seas_new = beta2c * seas + (1 - beta2c) * jnp.mean(jnp.square(sg))
            size_step = (step + 1) // T
            bc2 = 1 - beta2c ** size_step.astype(jnp.float32)
            size_lr = lr * scalar_lr_scale
            scale_step = -size_lr * jnp.sqrt(bc2) * jnp.sum(sg) / (jnp.sqrt(seas_new) + eps)
            scale_step = jnp.where(rms < param_min_rms, 0.0, scale_step)
            scale_step = jnp.where(rms > param_max_rms, -size_lr * T, scale_step)
            do_size = jnp.logical_and(is_size_step, step > 0)
            seas = jnp.where(do_size, seas_new, seas)
            delta = delta + jnp.where(do_size, (1 - beta1) * scale_step, 0.0) * p

            # _step (optim.py:560-598)
            eas = beta2 * eas + (1 - beta2) * jnp.square(g)
            bc2g = 1 - beta2 ** (step + 1)
            eas_used = jnp.where(bc2g < 0.99, eas / bc2g, eas)
            gn = g / (jnp.sqrt(eas_used) + eps)
            alpha = -lr * (1 - beta1) * jnp.maximum(rms, param_min_rms)
            delta = delta + gn * alpha
            return delta, delta, eas, rms, sg, seas

        outs = [one(g, p, d, e, r, s, se) for g, p, d, e, r, s, se in zip(
            leaves_g, leaves_p,
            treedef.flatten_up_to(state.delta),
            treedef.flatten_up_to(state.exp_avg_sq),
            leaves_rms,
            treedef.flatten_up_to(state.scale_grads),
            treedef.flatten_up_to(state.scale_exp_avg_sq))]

        unflat = lambda i: jax.tree_util.tree_unflatten(treedef, [o[i] for o in outs])
        new_state = ScaledAdamState(
            step=step + 1,
            delta=unflat(1),
            exp_avg_sq=unflat(2),
            param_rms=unflat(3),
            scale_grads=unflat(4),
            scale_exp_avg_sq=unflat(5),
            model_norms=norms,
            model_norm_threshold=threshold,
        )
        return unflat(0), new_state

    return optax.GradientTransformation(init, update)


def warmup_cosine_lr(
    init_lr: float,
    peak_lr: float,
    end_lr: float,
    warmup_steps: int,
    total_steps: int,
    locked: float | None = 0.002,
) -> Callable[[jax.Array], jax.Array]:
    """WarmupCosineLRSchedule (lr_schedulers.py:11-67).

    ``locked`` mirrors what the reference actually executes: its ``step()``
    unconditionally overrides the computed lr with the constant 0.002
    (lr_schedulers.py:63 ``self.lr = lr = self.end_lr = 0.002``). Pass
    ``locked=None`` for the nominal warmup->cosine schedule.
    """
    if locked is not None:
        const = jnp.asarray(locked, jnp.float32)
        return lambda step: const

    def schedule(step):
        step = step.astype(jnp.float32)
        warm = init_lr + (peak_lr - init_lr) / warmup_steps * step
        ratio = jnp.clip((step - warmup_steps) / (total_steps - warmup_steps), 0.0, 1.0)
        cos = end_lr + 0.5 * (1.0 + jnp.cos(jnp.pi * ratio)) * (peak_lr - end_lr)
        return jnp.where(step < warmup_steps, warm,
                         jnp.where(step > total_steps, end_lr, cos))

    return schedule
