"""QuickVC training driver — the vc/train.py entry point equivalent
(reference: /root/reference/vc/train.py:46-127, DDP trainer with bucket
sampler, G/D AdamW pair, resume-from-latest).

Usage:
  python -m vosk_tts_tpu.train.run_vc -c config.json -m MODEL_DIR [--epochs N]

``config.json`` blocks follow vc/configs/quickvc.json (train/data/model).
Dataset: one wav path per line (vc dataset/train.txt), with ``.cv.npy``
ContentVec sidecars written by tools/vc_encode_dataset.py.
"""

from __future__ import annotations

import argparse
import json
import logging

import jax

from ..models.quickvc import QuickVCConfig
from ..parallel import mesh as M
from . import vc_train as T
from .driver_common import resume_state, train_loop
from .gpt_sovits_data import ShuffleBatcher
from .vc_data import VCDataConfig, VCDataset

log = logging.getLogger("vosk_tts_tpu.train.vc")


def build_configs(cfg: dict):
    train, data, model = cfg.get("train", {}), cfg.get("data", {}), cfg.get("model", {})
    dcfg = VCDataConfig(
        file_list=data["training_files"],
        sampling_rate=data.get("sampling_rate", 16000),
        filter_length=data.get("filter_length", 1280),
        hop_length=data.get("hop_length", 320),
        win_length=data.get("win_length", 1280),
        n_mel_channels=data.get("n_mel_channels", 80),
        max_speclen=data.get("max_speclen", 512),
    )
    mcfg = QuickVCConfig(
        spec_channels=dcfg.filter_length // 2 + 1,
        n_mel_channels=model.get("n_mel_channels", dcfg.n_mel_channels),
        **{k: v for k, v in model.items()
           if k in QuickVCConfig.__dataclass_fields__
           and k not in ("spec_channels", "n_mel_channels")},
    )
    tcfg = T.VCTrainConfig(
        learning_rate=train.get("learning_rate", 2e-4),
        betas=tuple(train.get("betas", (0.8, 0.99))),
        eps=train.get("eps", 1e-9),
        lr_decay=train.get("lr_decay", 0.999875),
        c_mel=train.get("c_mel", 45.0),
        c_kl=train.get("c_kl", 1.0),
        sampling_rate=dcfg.sampling_rate,
        filter_length=dcfg.filter_length,
        hop_length=dcfg.hop_length,
        win_length=dcfg.win_length,
        n_mel_channels=dcfg.n_mel_channels,
    )
    return dcfg, mcfg, tcfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-m", "--model-dir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--log-interval", type=int, default=None)
    ap.add_argument("--save-interval-steps", type=int, default=None)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = json.load(open(args.config))
    dcfg, mcfg, tcfg = build_configs(cfg)
    train_cfg = cfg.get("train", {})
    epochs = args.epochs or train_cfg.get("epochs", 10000)
    batch_size = train_cfg.get("batch_size", 64)

    dataset = VCDataset(dcfg)
    batcher = ShuffleBatcher(dataset, batch_size,
                             host_id=jax.process_index(), num_hosts=jax.process_count())
    log.info("dataset: %d utts, %d batches/epoch", len(dataset), batcher.num_batches())

    state = T.init_train_state(jax.random.PRNGKey(train_cfg.get("seed", 1234)), mcfg, tcfg)
    state, start_epoch = resume_state(args.model_dir, state, log=log)

    train_loop(
        model_dir=args.model_dir,
        state=state,
        step_fn=jax.jit(T.make_train_step(mcfg, tcfg)),
        batcher=batcher,
        epochs=epochs,
        start_epoch=start_epoch,
        log_interval=args.log_interval or train_cfg.get("log_interval", 100),
        save_interval=args.save_interval_steps or train_cfg.get("eval_interval", 1000),
        mesh=M.data_mesh_for_batch(batch_size),
        log=log,
        host_id=jax.process_index(),
    )


if __name__ == "__main__":
    main()
