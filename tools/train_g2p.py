#!/usr/bin/env python3
"""Train the neural English G2P (text/neural_g2p.py) on the local CMUdict.

The held-out eval words used by tests/test_cleaner.py and
tools/lts_error_analysis.py (random.seed(0) samples of the [a-z]{4,12}
vocabulary: 400 and 3000 words) are EXCLUDED from training, so the
committed artifact's reported PER is honest. Model selection uses a
separate 2000-word dev split carved from the training set — the held-out
PER is reported once at the end.

Usage:
  python tools/train_g2p.py [--epochs 24] [--batch 256] \
      [--out vosk_tts_tpu/text/g2p_en_lstm.npz]
"""

import argparse
import os
import random
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF_TEXT = "/root/reference/training/gpt-sovits/text"


def read_cmu(path):
    cmu = {}
    with open(os.path.join(path, "cmudict.rep"), encoding="latin-1") as f:
        for i, line in enumerate(f):
            if i < 57 or not line.strip():
                continue
            parts = line.strip().split("  ")
            if len(parts) != 2:
                continue
            w = parts[0].lower()
            if not re.fullmatch(r"[a-z']+", w):
                continue
            cmu.setdefault(w, tuple(parts[1].split(" ")))
    return cmu


def edit(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default=os.path.join(ROOT, "vosk_tts_tpu/text/g2p_en_lstm.npz"))
    ap.add_argument("--platform", default="cpu",
                    help="cpu | axon (TPU: ~1.5 ms/step vs ~0.7 s/step CPU; "
                         "steps run in scan chunks so the relay dispatch "
                         "amortizes)")
    ap.add_argument("--chunk", type=int, default=50,
                    help="train steps per device call (lax.scan chunk)")
    args = ap.parse_args()

    import signal

    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("TRAIN_TIMEOUT_S", "3000")))

    os.environ.setdefault("JAX_PLATFORMS", args.platform)
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vosk_tts_tpu.text import neural_g2p as NG

    cmu = read_cmu(REF_TEXT)
    eval_vocab = [w for w in cmu if re.fullmatch(r"[a-z]{4,12}", w)]
    random.seed(0)
    held400 = set(random.sample(eval_vocab, 400))
    random.seed(0)
    held3000 = random.sample(eval_vocab, 3000)
    held = held400 | set(held3000)

    phones = NG.phone_vocab()
    p2i = {p: i for i, p in enumerate(phones)}

    rows = []
    for w, ph in cmu.items():
        if w in held or len(w) < 2 or len(w) > NG.MAX_WORD:
            continue
        if len(ph) + 1 > NG.MAX_PHONES or any(p not in p2i for p in ph):
            continue
        rows.append((w, ph))
    random.seed(1)
    random.shuffle(rows)
    dev, train = rows[:2000], rows[2000:]
    print(f"train {len(train)}  dev {len(dev)}  held-out {len(held3000)}")

    def pack(items):
        n = len(items)
        wid = np.zeros((n, NG.MAX_WORD), np.int32)
        pin = np.zeros((n, NG.MAX_PHONES), np.int32)
        tgt = np.zeros((n, NG.MAX_PHONES), np.int32)
        for i, (w, ph) in enumerate(items):
            wid[i] = NG.encode_word(w)
            ids = [p2i[p] for p in ph]
            pin[i, 0] = 1  # BOS
            pin[i, 1 : 1 + len(ids)] = ids
            tgt[i, : len(ids)] = ids
            tgt[i, len(ids)] = 2  # EOS
        return wid, pin, tgt

    wid_tr, pin_tr, tgt_tr = pack(train)

    params = NG.init_params(jax.random.PRNGKey(0), n_phones=len(phones))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    sched = optax.cosine_decay_schedule(args.lr, args.epochs * (len(train) // args.batch))
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    def loss_fn(p, wid, pin, tgt):
        logits = NG.teacher_logits_jax(p, wid, pin)
        # positions after EOS are PAD(0) targets -> masked; EOS itself kept
        mask = ((tgt > 0) | (tgt == 2)).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    @jax.jit
    def step_chunk(p, o, wids, pins, tgts):
        """lax.scan over a (K, B, ...) stack of batches — ONE device call
        per K steps (the axon relay costs ~25 ms per call)."""
        def body(carry, xs):
            p, o = carry
            wid, pin, tgt = xs
            l, g = jax.value_and_grad(loss_fn)(p, wid, pin, tgt)
            up, o = opt.update(g, o, p)
            return (optax.apply_updates(p, up), o), l

        (p, o), ls = jax.lax.scan(body, (p, o), (wids, pins, tgts))
        return p, o, jnp.mean(ls)

    def np_per(model, words):
        strip = lambda ps: [x.rstrip("012") for x in ps]
        e = t = 0
        for w in words:
            got = model.predict(w)
            gold = list(cmu[w])
            e += edit(strip(got), strip(gold))
            t += len(gold)
        return e / t

    rngnp = np.random.default_rng(0)
    n = len(train)
    best_dev = 1e9
    tmp_path = args.out + ".tmp.npz"
    t0 = time.time()
    K = args.chunk
    for ep in range(args.epochs):
        order = rngnp.permutation(n)
        tot, nchunks = 0.0, 0
        nb = n // args.batch
        for ci in range(0, nb, K):
            k = min(K, nb - ci)
            idx = order[ci * args.batch : (ci + k) * args.batch]
            stack = lambda a: jnp.asarray(
                a[idx].reshape(k, args.batch, *a.shape[1:]))
            params, opt_state, l = step_chunk(
                params, opt_state, stack(wid_tr), stack(pin_tr), stack(tgt_tr))
            tot += float(l)
            nchunks += 1
        nb = nchunks
        # dev PER via the numpy inference path (what ships)
        np.savez(tmp_path, **NG.flatten_for_npz(
            jax.tree_util.tree_map(np.asarray, params), phones))
        model = NG.NeuralG2P(tmp_path)
        dev_per = np_per(model, [w for w, _ in dev[:500]])
        mark = ""
        if dev_per < best_dev:
            best_dev = dev_per
            np.savez(args.out, **NG.flatten_for_npz(
                jax.tree_util.tree_map(np.asarray, params), phones))
            mark = "  *saved"
        print(f"epoch {ep:2d}  loss {tot/nb:.4f}  dev PER {dev_per:.4f}"
              f"  ({time.time()-t0:.0f}s){mark}", flush=True)

    os.remove(tmp_path)
    model = NG.NeuralG2P(args.out)
    held_per = np_per(model, held3000)
    print(f"\nFINAL held-out PER (3000 words, stress-stripped): {held_per:.4f}")
    print(f"artifact: {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
