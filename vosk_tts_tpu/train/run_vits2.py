"""VITS2 training driver — the train_ms.py / train_finetune.py equivalent.

Usage:
  python -m vosk_tts_tpu.train.run_vits2 -c config.json -m MODEL_DIR \
      [--finetune PRETRAINED_DIR] [--epochs N]

``config.json`` follows the reference schema
(training/vits2/configs/mb_istft_vits2_multi.json: train/data/model blocks).
Differences from the reference loop (train_ms.py:52-605):
  * one jitted step does D -> durD -> G (no host round-trips, MAS on device);
  * multi-host data parallelism comes from the mesh — run the same script on
    every host after jax.distributed.initialize(); the batcher shards by
    host id (replaces DistributedBucketSampler's rank slicing);
  * checkpoints are npz pytrees (utils/checkpoint.py), per-stream G/D/DUR
    like the reference's G_*/D_*/DUR_*.pth;
  * finetune mode loads pretrained streams and keeps the duration
    discriminator frozen (train_finetune.py:239-241).
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

import jax

from ..models.vits2 import VITS2Config
from ..parallel import mesh as M
from ..utils import checkpoint as ckpt
from . import vits2_train as T
from .data import DataConfig, TTSDataset, BucketBatcher

log = logging.getLogger("vosk_tts_tpu.train")


def build_configs(cfg: dict):
    train, data, model = cfg["train"], cfg["data"], cfg["model"]
    mcfg = VITS2Config.from_reference_json(model, data, train)
    tcfg = T.TrainConfig(
        learning_rate=train.get("learning_rate", 2e-4),
        betas=tuple(train.get("betas", (0.8, 0.99))),
        eps=train.get("eps", 1e-9),
        lr_decay=train.get("lr_decay", 0.999875),
        c_mel=train.get("c_mel", 45.0),
        c_kl=train.get("c_kl", 1.0),
        sampling_rate=data.get("sampling_rate", 22050),
        filter_length=data.get("filter_length", 1024),
        hop_length=data.get("hop_length", 256),
        win_length=data.get("win_length", 1024),
        n_mel_channels=data.get("n_mel_channels", 80),
        mel_fmin=data.get("mel_fmin", 0.0),
        mel_fmax=data.get("mel_fmax"),
        fft_sizes=tuple(train.get("fft_sizes", (384, 683, 171))),
        hop_sizes=tuple(train.get("hop_sizes", (30, 60, 10))),
        win_lengths=tuple(train.get("win_lengths", (150, 300, 60))),
        use_dur_disc=model.get("use_duration_discriminator", True),
    )
    dcfg = DataConfig(
        metadata=data["training_files"],
        sampling_rate=tcfg.sampling_rate,
        filter_length=tcfg.filter_length,
        hop_length=tcfg.hop_length,
        win_length=tcfg.win_length,
        n_mel_channels=tcfg.n_mel_channels,
        mel_fmin=tcfg.mel_fmin,
        mel_fmax=tcfg.mel_fmax,
        add_blank=data.get("add_blank", True),
        text_mode="aligned" if data.get("aligned_text") else ("g2p" if data.get("g2p_text") else "aligned"),
    )
    return mcfg, tcfg, dcfg


def _eval_to_tb(writer, state, mcfg, tcfg, batch, step):
    """train_ms.py:542-600 evaluate equivalent: synthesize the first batch
    utterance and log audio + mel image to TensorBoard."""
    try:
        import jax.numpy as jnp

        from ..models import vits2 as V
        from ..utils.plotting import plot_spectrogram_to_numpy

        x = jnp.asarray(np.asarray(batch["x"])[:1])
        xl = jnp.asarray(np.asarray(batch["x_lengths"])[:1])
        sid = jnp.asarray(np.asarray(batch["sid"])[:1])
        out = V.infer(jax.device_get(state["params_g"]), mcfg, x, xl, sid,
                      rng=jax.random.PRNGKey(step), max_frames=1024)
        wav = np.asarray(out["wav"])[0, : int(out["wav_lengths"][0]), 0]
        writer.add_audio("eval/audio", wav[None, :], step, sample_rate=tcfg.sampling_rate)
        writer.add_image("eval/attn", plot_spectrogram_to_numpy(np.asarray(out["attn"][0]).T),
                         step, dataformats="HWC")
    except Exception as e:  # eval must never kill training
        log.warning("tb eval failed: %s", e)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-m", "--model-dir", required=True)
    ap.add_argument("--finetune", default=None, help="pretrained checkpoint dir")
    ap.add_argument("--wavlm-dir", default=None,
                    help="frozen WavLM bundle (params.npz + config.json) enabling "
                         "the SLM loss branch (train_ms.py:397-406,441-444)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--log-interval", type=int, default=None)
    ap.add_argument("--save-interval-steps", type=int, default=None)
    # multi-host: run the same script on every host (replaces the reference's
    # mp.spawn + init_process_group, train_ms.py:52-77). With no flags,
    # jax.distributed.initialize() auto-detects cluster env (TPU pods);
    # --dist-coordinator pins it explicitly (tests / ad-hoc CPU clusters).
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() (auto-detect)")
    ap.add_argument("--dist-coordinator", default=None, help="host:port")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.dist_coordinator:
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id,
        )
    elif args.distributed:
        jax.distributed.initialize()

    logging.basicConfig(level=logging.INFO)
    from ..utils.repro import check_git_hash

    check_git_hash(args.model_dir)
    cfg = json.load(open(args.config))
    mcfg, tcfg, dcfg = build_configs(cfg)
    train_cfg = cfg["train"]
    epochs = args.epochs or train_cfg.get("epochs", 20000)
    log_interval = args.log_interval or train_cfg.get("log_interval", 200)
    save_interval = args.save_interval_steps or train_cfg.get("eval_interval", 1000)
    batch_size = train_cfg.get("batch_size", 24)

    n_hosts = jax.process_count()
    host_id = jax.process_index()
    # global batch = per-host batch x hosts (the batcher yields host-local rows)
    mesh = M.data_mesh_for_batch(batch_size * n_hosts)

    dataset = TTSDataset(dcfg)
    batcher = BucketBatcher(dataset, batch_size, host_id=host_id, num_hosts=n_hosts)
    log.info("dataset: %d utts, %d batches/epoch", len(dataset), batcher.num_batches())

    # frozen WavLM for the SLM GAN branch (reference applies it by default in
    # train_ms.py:397-406; here it is enabled by providing the converted bundle)
    slm = None
    slm_dims = {}
    if args.wavlm_dir:
        import dataclasses

        from pathlib import Path

        from ..models import wavlm as WL

        wdir = Path(args.wavlm_dir)
        wl_cfg = WL.WavLMConfig.from_hf(json.load(open(wdir / "config.json")))
        slm = {"params": ckpt.load_params(wdir / "params.npz"), "cfg": wl_cfg}
        tcfg = dataclasses.replace(tcfg, use_slm=True)
        slm_dims = {"slm_hidden": wl_cfg.hidden_size,
                    "slm_layers": wl_cfg.num_hidden_layers + 1,
                    "slm_initial": train_cfg.get("slm_initial", 64)}
        log.info("SLM loss enabled (WavLM from %s)", wdir)

    start_epoch = 0
    state = T.init_train_state(jax.random.PRNGKey(train_cfg.get("seed", 1234)), mcfg, tcfg, **slm_dims)
    resume = ckpt.load_full_state(args.model_dir, "STATE", state)
    if resume is not None:
        state, meta = resume
        start_epoch = meta.get("epoch", 0)
        log.info("resumed from step %s epoch %d", meta.get("step"), start_epoch)
    elif args.finetune:
        pre = ckpt.load_full_state(args.finetune, "STATE", state)
        if pre is None:
            raise FileNotFoundError(f"no pretrained STATE_* in {args.finetune}")
        for k in ("params_g", "params_d", "params_dur"):
            if k in pre[0]:
                state[k] = pre[0][k]
        log.info("finetuning from %s", args.finetune)

    state = M.replicate_params(mesh, state)
    freeze_dur = bool(args.finetune)  # train_finetune.py:239-241
    step_fn = jax.jit(T.make_train_step(mcfg, tcfg, slm=slm))
    rng = jax.random.PRNGKey(0)

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(args.model_dir) if host_id == 0 else None
    except Exception:
        writer = None

    global_step = int(np.asarray(state["step"]))
    for epoch in range(start_epoch, epochs):
        state = T.set_lr(state, T.lr_at_epoch(tcfg, epoch))
        t_epoch = time.time()
        for batch in batcher.epoch(epoch):
            batch = M.shard_batch(mesh, batch)
            rng, step_rng = jax.random.split(rng)
            frozen_dur = state.get("params_dur")
            state, metrics = step_fn(state, batch, step_rng)
            if freeze_dur and frozen_dur is not None:
                state["params_dur"] = frozen_dur
            global_step += 1
            if host_id == 0 and global_step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                log.info("epoch %d step %d %s", epoch, global_step, {k: round(v, 3) for k, v in m.items()})
                if writer:
                    for k, v in m.items():
                        writer.add_scalar(f"train/{k}", v, global_step)
                    writer.add_scalar("train/lr", T.lr_at_epoch(tcfg, epoch), global_step)
            if host_id == 0 and global_step % save_interval == 0:
                ckpt.save_full_state(args.model_dir, "STATE", global_step,
                                     jax.device_get(state), extra={"epoch": epoch})
                # named params_g stream for export/eval tooling (G_*.pth analogue)
                ckpt.save_train_state(args.model_dir, "G", global_step,
                                      jax.device_get(state["params_g"]))
                log.info("saved checkpoint at step %d", global_step)
                if writer:
                    _eval_to_tb(writer, state, mcfg, tcfg, batch, global_step)
        log.info("epoch %d done in %.1fs", epoch, time.time() - t_epoch)

    if host_id == 0:
        ckpt.save_full_state(args.model_dir, "STATE", global_step,
                             jax.device_get(state), extra={"epoch": epochs})
        ckpt.save_train_state(args.model_dir, "G", global_step,
                              jax.device_get(state["params_g"]))


if __name__ == "__main__":
    main()
