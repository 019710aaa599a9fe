"""StableTTS/Matcha CFM training driver — the Lightning/Hydra trainer
equivalent (training/stabletts/matcha/train.py:36-126 +
baselightningmodule.py:19-233).

Usage:
  python -m vosk_tts_tpu.train.run_stabletts -c config.json -m MODEL_DIR \
      [--epochs N] [--bert-dir BERT_BUNDLE]

``config.json`` blocks: data (configs/data/ru.yaml fields), model
(StableTTSConfig overrides), train (lr/grad_clip/epochs/intervals).
Differences from the reference trainer:
  * one jitted CFM+duration step (grad clip 5.0 inside the optax chain);
  * shape-class batches instead of dynamic padding (XLA static shapes);
  * multi-host data parallelism via the mesh; the batcher shards by host id;
  * checkpoints are npz pytrees with resume-from-latest.
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

import jax

from ..models.stabletts import StableTTSConfig
from ..parallel import mesh as M
from ..utils import checkpoint as ckpt
from . import stabletts_train as T
from .stabletts_data import StableDataConfig, StableTTSDataset, StableBatcher

log = logging.getLogger("vosk_tts_tpu.train.stabletts")


def build_configs(cfg: dict):
    data, model, train = cfg.get("data", {}), cfg.get("model", {}), cfg.get("train", {})
    dcfg = StableDataConfig(
        metadata=data["training_files"],
        wav_dir=data.get("wav_dir", ""),
        n_spks=data.get("n_spks", 128),
        sampling_rate=data.get("sample_rate", 22050),
        n_fft=data.get("n_fft", 1024),
        n_mels=data.get("n_feats", 80),
        hop_length=data.get("hop_length", 256),
        win_length=data.get("win_length", 1024),
        f_min=data.get("f_min", 0.0),
        f_max=data.get("f_max", 8000.0),
        mel_mean=data.get("mel_mean", -5.806578636169434),
        mel_std=data.get("mel_std", 2.454238176345825),
        load_durations=data.get("load_durations", True),
    )
    mcfg = StableTTSConfig(
        n_spks=dcfg.n_spks,
        n_feats=dcfg.n_mels,
        mel_mean=dcfg.mel_mean,
        mel_std=dcfg.mel_std,
        **{k: v for k, v in model.items() if k in StableTTSConfig.__dataclass_fields__
           and k not in ("n_spks", "n_feats", "mel_mean", "mel_std")},
    )
    tcfg = T.StableTrainConfig(
        learning_rate=train.get("learning_rate", 1e-4),
        weight_decay=train.get("weight_decay", 0.0),
        grad_clip=train.get("grad_clip", 5.0),
        accumulate=train.get("accumulate", 4),
        cfg_dropout=train.get("cfg_dropout", 0.1),
    )
    return dcfg, mcfg, tcfg


def make_bert_fn(bert_dir: str):
    """Word-level ruBERT rows for the dataset (the get_bert_embeddings
    contract of matcha/text/__init__.py:47-67: hidden_states[-3], drop
    '##'-subwords and punctuation tokens)."""
    import json as _json
    import re
    from pathlib import Path

    from ..models import bert as bert_mod
    from ..utils.checkpoint import load_params

    d = Path(bert_dir)
    tok = bert_mod.WordPieceTokenizer(d / "vocab.txt")
    enc = bert_mod.BertEncoder(load_params(d / "params.npz"), _json.load(open(d / "config.json")))
    pattern = re.compile('[-,.?!;:"]')

    def bert_fn(text: str) -> np.ndarray:
        e = tok.encode(text.replace("+", ""))
        hs = enc(e.ids, e.attention_mask, e.type_ids)
        vectors = hs[-3]  # (T, H)
        selected = [i for i, t in enumerate(e.tokens) if t[0] != "#" and not pattern.match(t)]
        return np.asarray(vectors[selected], np.float32)

    return bert_fn


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-m", "--model-dir", required=True)
    ap.add_argument("--bert-dir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--log-interval", type=int, default=None)
    ap.add_argument("--save-interval-steps", type=int, default=None)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = json.load(open(args.config))
    dcfg, mcfg, tcfg = build_configs(cfg)
    train_cfg = cfg.get("train", {})
    epochs = args.epochs or train_cfg.get("epochs", 1000)
    log_interval = args.log_interval or train_cfg.get("log_interval", 100)
    save_interval = args.save_interval_steps or train_cfg.get("save_interval", 1000)
    batch_size = train_cfg.get("batch_size", 6)

    n_hosts = jax.process_count()
    host_id = jax.process_index()
    mesh = M.data_mesh_for_batch(batch_size)

    bert_fn = make_bert_fn(args.bert_dir) if args.bert_dir else None
    dataset = StableTTSDataset(dcfg, bert_fn=bert_fn)
    batcher = StableBatcher(dataset, batch_size, host_id=host_id, num_hosts=n_hosts)
    log.info("dataset: %d utts, %d batches/epoch", len(dataset), batcher.num_batches())

    start_epoch = 0
    state = T.init_train_state(jax.random.PRNGKey(train_cfg.get("seed", 1234)), mcfg, tcfg)
    resume = ckpt.load_full_state(args.model_dir, "STATE", state)
    if resume is not None:
        state, meta = resume
        start_epoch = meta.get("epoch", 0)
        log.info("resumed from step %s epoch %d", meta.get("step"), start_epoch)

    state = M.replicate_params(mesh, state)
    step_fn = jax.jit(T.make_train_step(mcfg, tcfg))
    rng = jax.random.PRNGKey(0)

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(args.model_dir) if host_id == 0 else None
    except Exception:
        writer = None

    global_step = int(np.asarray(state["step"]))
    for epoch in range(start_epoch, epochs):
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
                ckpt.save_full_state(args.model_dir, "STATE", global_step,
                                     jax.device_get(state), extra={"epoch": epoch})
                log.info("saved checkpoint at step %d", global_step)
        log.info("epoch %d done in %.1fs", epoch, time.time() - t_epoch)

    if host_id == 0:
        ckpt.save_full_state(args.model_dir, "STATE", global_step,
                             jax.device_get(state), extra={"epoch": epochs})


if __name__ == "__main__":
    main()
