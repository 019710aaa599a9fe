"""GPT-SoVITS training drivers — the s1_train.py / s2_train.py entry points
(reference: /root/reference/training/gpt-sovits/s1_train.py:37-131 Lightning
trainer; s2_train.py mp.spawn GAN loop).

Usage:
  python -m vosk_tts_tpu.train.run_gpt_sovits --stage s1 -c config.json -m DIR
  python -m vosk_tts_tpu.train.run_gpt_sovits --stage s2 -c config.json -m DIR

``config.json`` blocks: data (metadata/semantic paths), model (ARConfig or
SoVITSConfig overrides), train (lr/steps/epochs/intervals; ``if_dpo`` enables
the stage-1 DPO branch).
"""

from __future__ import annotations

import argparse
import json
import logging

import jax

from ..models import gpt_sovits as G
from ..parallel import mesh as M
from . import gpt_sovits_train as T
from .driver_common import resume_state, train_loop
from .gpt_sovits_data import (
    S1DataConfig,
    S1Dataset,
    S2DataConfig,
    S2Dataset,
    ShuffleBatcher,
)

log = logging.getLogger("vosk_tts_tpu.train.gpt_sovits")


def _filter_fields(cls, d: dict) -> dict:
    return {k: v for k, v in d.items() if k in cls.__dataclass_fields__}


def build_s1(cfg: dict):
    data, model, train = cfg.get("data", {}), cfg.get("model", {}), cfg.get("train", {})
    dcfg = S1DataConfig(
        metadata=data["metadata"],
        semantic=data["semantic"],
        wav_dir=data.get("wav_dir", ""),
        bert_dim=model.get("bert_dim", 1024),
        max_sec=data.get("max_sec", 100),
        pad_val=model.get("eos", 1024),
    )
    mcfg = G.ARConfig(**_filter_fields(G.ARConfig, model))
    tcfg = T.S1TrainConfig(
        learning_rate=train.get("learning_rate", 1e-4),
        warmup_steps=train.get("warmup_steps", 2000),
        total_steps=train.get("total_steps", 300_000),
        weight_decay=train.get("weight_decay", 0.01),
        grad_clip=train.get("grad_clip", 1.0),
        if_dpo=train.get("if_dpo", False),
    )
    return dcfg, mcfg, tcfg


def build_s2(cfg: dict):
    data, model, train = cfg.get("data", {}), cfg.get("model", {}), cfg.get("train", {})
    dcfg = S2DataConfig(
        metadata=data["metadata"],
        wav_dir=data.get("wav_dir", ""),
        sampling_rate=data.get("sampling_rate", 32000),
        filter_length=data.get("filter_length", 2048),
        hop_length=data.get("hop_length", 640),
        win_length=data.get("win_length", 2048),
        ssl_dim=model.get("ssl_dim", 768),
    )
    mcfg = G.SoVITSConfig(
        spec_channels=dcfg.filter_length // 2 + 1,
        **{k: v for k, v in _filter_fields(G.SoVITSConfig, model).items()
           if k != "spec_channels"},
    )
    tcfg = T.S2TrainConfig(
        learning_rate=train.get("learning_rate", 2e-4),
        betas=tuple(train.get("betas", (0.8, 0.99))),
        eps=train.get("eps", 1e-9),
        lr_decay=train.get("lr_decay", 0.999875),
        c_mel=train.get("c_mel", 45.0),
        c_kl=train.get("c_kl", 1.0),
        c_commit=train.get("c_commit", 1.0),
        sampling_rate=dcfg.sampling_rate,
        filter_length=dcfg.filter_length,
        hop_length=dcfg.hop_length,
        win_length=dcfg.win_length,
        n_mel_channels=train.get("n_mel_channels", 128),
        mel_fmax=train.get("mel_fmax"),
        fft_sizes=tuple(train.get("fft_sizes", (384, 683, 171))),
        hop_sizes=tuple(train.get("hop_sizes", (30, 60, 10))),
        win_lengths=tuple(train.get("win_lengths", (150, 300, 60))),
    )
    return dcfg, mcfg, tcfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("s1", "s2"), required=True)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-m", "--model-dir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--log-interval", type=int, default=None)
    ap.add_argument("--save-interval-steps", type=int, default=None)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = json.load(open(args.config))
    train_cfg = cfg.get("train", {})
    epochs = args.epochs or train_cfg.get("epochs", 100)
    batch_size = train_cfg.get("batch_size", 8)
    seed = train_cfg.get("seed", 1234)

    if args.stage == "s1":
        dcfg, mcfg, tcfg = build_s1(cfg)
        if tcfg.if_dpo:  # the reference halves batch when DPO doubles memory
            batch_size = max(batch_size // 2, 1)  # ar/data/data_module.py:45
        dataset = S1Dataset(dcfg)
        state = T.init_s1_state(jax.random.PRNGKey(seed), mcfg, tcfg)
        step_fn = jax.jit(T.make_s1_step(mcfg, tcfg))
        tag = "S1"
    else:
        dcfg, mcfg, tcfg = build_s2(cfg)
        dataset = S2Dataset(dcfg)
        state = T.init_s2_state(jax.random.PRNGKey(seed), mcfg, tcfg)
        step_fn = jax.jit(T.make_s2_step(mcfg, tcfg))
        tag = "S2"

    batcher = ShuffleBatcher(dataset, batch_size,
                             host_id=jax.process_index(), num_hosts=jax.process_count())
    log.info("stage %s: %d rows, %d batches/epoch", args.stage, len(dataset), batcher.num_batches())

    state, start_epoch = resume_state(args.model_dir, state, tag=tag, log=log)

    train_loop(
        model_dir=args.model_dir,
        state=state,
        step_fn=step_fn,
        batcher=batcher,
        epochs=epochs,
        start_epoch=start_epoch,
        log_interval=args.log_interval or train_cfg.get("log_interval", 100),
        save_interval=args.save_interval_steps or train_cfg.get("save_interval", 1000),
        mesh=M.data_mesh_for_batch(batch_size),
        tag=tag,
        log=log,
        host_id=jax.process_index(),
    )


if __name__ == "__main__":
    main()
