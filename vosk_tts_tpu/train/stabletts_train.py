"""StableTTS/Matcha CFM training step (the Lightning trainer equivalent,
training/stabletts/matcha/train.py + baselightningmodule.py).

Single AdamW optimizer over the decoder (+optionally encoder/dp), gradient
clipping 5.0 and accumulation 4 as configs/trainer/default.yaml
(accumulate_grad_batches).  Accumulation is ``optax.MultiSteps``: each call
of the train step consumes one micro-batch; the averaged gradient is applied
every ``accumulate`` micro-steps (zero updates in between), exactly
Lightning's accumulate_grad_batches semantics."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..models import stabletts as S


@dataclass(frozen=True)
class StableTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    accumulate: int = 4
    cfg_dropout: float = 0.1
    use_dur_loss: bool = True


def make_optimizer(tcfg: StableTrainConfig):
    base = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=tcfg.learning_rate, weight_decay=tcfg.weight_decay
        ),
    )
    if tcfg.accumulate > 1:
        # clip-then-accumulate matches Lightning: it clips the *applied*
        # gradient; MultiSteps averages micro-grads and feeds base.update
        # once per cycle, so clipping sees the averaged gradient.
        return optax.MultiSteps(base, every_k_schedule=tcfg.accumulate)
    return base


def init_train_state(key, mcfg: S.StableTTSConfig, tcfg: StableTrainConfig):
    params = S.matcha_init(key, mcfg)
    opt = make_optimizer(tcfg)
    return {"step": jnp.zeros((), jnp.int32), "params": params, "opt": opt.init(params)}


def make_train_step(mcfg: S.StableTTSConfig, tcfg: StableTrainConfig):
    opt = make_optimizer(tcfg)

    def step(state, batch, rng):
        def loss_fn(params):
            out = S.forward_train(
                params, mcfg, batch["x"], batch["x_lengths"], batch["mel"], batch["mel_lengths"],
                batch["sid"], batch["bert"], batch["durations"], rng=rng,
                cfg_dropout=tcfg.cfg_dropout, use_dur_loss=tcfg.use_dur_loss,
            )
            total = out["diff_loss"] + out["dur_loss"]
            return total, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, opt_state = opt.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics = {"loss": loss, "diff_loss": out["diff_loss"], "dur_loss": out["dur_loss"]}
        return {"step": state["step"] + 1, "params": params, "opt": opt_state}, metrics

    return step
