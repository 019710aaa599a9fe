"""Shared training-driver loop: mesh sharding, TB logging, full-state
checkpoint/resume. Each family driver (run_vc, run_gpt_sovits, ...) builds
its dataset/state/step and delegates the epoch loop here (the role Lightning's
Trainer.fit plays for the reference's stabletts/s1 stages)."""

from __future__ import annotations

import logging
import time

import numpy as np

import jax

from ..parallel import mesh as M
from ..utils import checkpoint as ckpt


def make_writer(model_dir: str, host_id: int):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(model_dir) if host_id == 0 else None
    except Exception:
        return None


def train_loop(*, model_dir: str, state, step_fn, batcher, epochs: int,
               start_epoch: int = 0, log_interval: int = 100,
               save_interval: int = 1000, mesh=None, tag: str = "STATE",
               log: logging.Logger | None = None, host_id: int = 0,
               seed: int = 0, on_save=None, set_lr=None):
    """Runs the epoch loop; returns the final state. ``state`` must already be
    resumed (use resume_state); ``on_save(state, step)`` runs after each
    checkpoint; ``set_lr(state, epoch)`` applies a per-epoch schedule."""
    log = log or logging.getLogger("vosk_tts_tpu.train")
    mesh = mesh if mesh is not None else M.make_mesh()
    state = M.replicate_params(mesh, state)
    writer = make_writer(model_dir, host_id)
    rng = jax.random.PRNGKey(seed)
    global_step = int(np.asarray(state["step"]))

    for epoch in range(start_epoch, epochs):
        if set_lr is not None:
            state = set_lr(state, epoch)
        t_epoch = time.time()
        for batch in batcher.epoch(epoch):
            batch = M.shard_batch(mesh, batch)
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            global_step += 1
            if host_id == 0 and global_step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                log.info("epoch %d step %d %s", epoch, global_step,
                         {k: round(v, 4) for k, v in m.items()})
                if writer:
                    for k, v in m.items():
                        writer.add_scalar(f"train/{k}", v, global_step)
            if host_id == 0 and global_step % save_interval == 0:
                ckpt.save_full_state(model_dir, tag, global_step,
                                     jax.device_get(state), extra={"epoch": epoch})
                log.info("saved checkpoint at step %d", global_step)
                if on_save is not None:
                    on_save(state, global_step)
        log.info("epoch %d done in %.1fs", epoch, time.time() - t_epoch)

    if host_id == 0:
        ckpt.save_full_state(model_dir, tag, global_step,
                             jax.device_get(state), extra={"epoch": epochs})
    return state


def resume_state(model_dir: str, state, tag: str = "STATE",
                 log: logging.Logger | None = None):
    """Restore the latest full state if present; returns (state, start_epoch)."""
    log = log or logging.getLogger("vosk_tts_tpu.train")
    resume = ckpt.load_full_state(model_dir, tag, state)
    if resume is None:
        return state, 0
    state, meta = resume
    start_epoch = meta.get("epoch", 0)
    log.info("resumed from step %s epoch %d", meta.get("step"), start_epoch)
    return state, start_epoch
