"""Neural letter-to-sound model for English OOV words.

The reference resolves OOV English words with the g2p_en package — an
LSTM-attention seq2seq trained on CMUdict (training/gpt-sovits/text/
english.py:256). Its checkpoint is not retrievable in this environment, so
this module trains the same MODEL FAMILY from scratch on the locally
available CMUdict (tools/train_g2p.py) and ships the trained weights as a
committed artifact — the same precedent as the GE2E speaker embedder
(eval/speaker_train.py). The round-4 rule engine remains the fallback when
the artifact is absent (en_g2p.letter_to_sound).

Architecture (g2p_en-style, written fresh in JAX):
  * encoder: char embedding + single-layer BiLSTM;
  * decoder: phone embedding + LSTM, dot-product attention over encoder
    states, concat -> vocab projection; greedy decode at inference.

Training runs in JAX (tools/train_g2p.py, CPU is enough — ~1.2M params);
inference here is pure numpy (a per-word greedy loop beats JAX dispatch
overhead at 1-word batch sizes and keeps the text frontend host-side, as
SURVEY §7 prescribes).
"""

from __future__ import annotations

import numpy as np

# letters a-z plus apostrophe; 0 = PAD
LETTERS = "abcdefghijklmnopqrstuvwxyz'"
L2I = {c: i + 1 for i, c in enumerate(LETTERS)}
MAX_WORD = 20
MAX_PHONES = 24  # incl. EOS


def phone_vocab():
    """Stressed-ARPA output alphabet: PAD, BOS, EOS + CMU phones."""
    from .en_g2p import arpa_symbols

    syms = sorted(arpa_symbols())
    return ["<pad>", "<bos>", "<eos>"] + syms


def encode_word(word: str) -> np.ndarray:
    ids = [L2I[c] for c in word if c in L2I][:MAX_WORD]
    out = np.zeros((MAX_WORD,), np.int32)
    out[: len(ids)] = ids
    return out


# ---------------------------------------------------------------------------
# Parameter init (JAX only used by the trainer)
# ---------------------------------------------------------------------------


def init_params(key, *, emb: int = 128, enc_hidden: int = 128,
                dec_hidden: int = 256, n_phones: int = 90):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 12)

    def mat(k, a, b):
        return jax.random.normal(k, (a, b)) * (a**-0.5)

    def lstm(k, in_dim, hid):
        k1, k2 = jax.random.split(k)
        return {"w_ih": mat(k1, in_dim, 4 * hid), "b_ih": jnp.zeros((4 * hid,)),
                "w_hh": mat(k2, hid, 4 * hid), "b_hh": jnp.zeros((4 * hid,))}

    enc_out = 2 * enc_hidden
    return {
        "char_emb": mat(ks[0], len(LETTERS) + 1, emb),
        "enc_f": lstm(ks[1], emb, enc_hidden),
        "enc_b": lstm(ks[2], emb, enc_hidden),
        "phone_emb": mat(ks[3], n_phones, emb),
        "dec": lstm(ks[4], emb + enc_out, dec_hidden),
        "attn_q": mat(ks[5], dec_hidden, enc_out),
        "out": mat(ks[6], dec_hidden + enc_out, n_phones),
        "out_b": np.zeros((n_phones,)),
        "dec_h0": mat(ks[7], enc_out, dec_hidden),
    }


def _lstm_scan_jax(layer, x, reverse=False):
    import jax
    import jax.numpy as jnp
    from jax import lax

    b, t, _ = x.shape
    hid = layer["w_hh"].shape[0]

    def step(carry, xt):
        h, c = carry
        g = xt @ layer["w_ih"] + layer["b_ih"] + h @ layer["w_hh"] + layer["b_hh"]
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, hid), x.dtype), jnp.zeros((b, hid), x.dtype))
    xs = jnp.swapaxes(x, 0, 1)
    _, hs = lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def encoder_apply_jax(params, word_ids):
    """word_ids: (B, MAX_WORD) -> (enc_out (B, T, 2H), mask (B, T))."""
    import jax.numpy as jnp

    x = params["char_emb"][word_ids]
    hf = _lstm_scan_jax(params["enc_f"], x)
    hb = _lstm_scan_jax(params["enc_b"], x, reverse=True)
    enc = jnp.concatenate([hf, hb], axis=-1)
    mask = (word_ids > 0).astype(enc.dtype)
    return enc * mask[..., None], mask


def teacher_logits_jax(params, word_ids, phone_in):
    """Teacher-forced decoder logits. phone_in: (B, Tp) BOS-led targets."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    enc, mask = encoder_apply_jax(params, word_ids)
    b = word_ids.shape[0]
    hid = params["dec"]["w_hh"].shape[0]
    # init decoder state from mean encoder state
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
    h0 = jnp.tanh((jnp.sum(enc, axis=1) / denom) @ params["dec_h0"])
    emb = params["phone_emb"][phone_in]  # (B, Tp, E)
    neg = (1.0 - mask) * -1e9

    def step(carry, et):
        h, c, ctx = carry
        inp = jnp.concatenate([et, ctx], axis=-1)
        g = inp @ params["dec"]["w_ih"] + params["dec"]["b_ih"] + h @ params["dec"]["w_hh"] + params["dec"]["b_hh"]
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        q = h @ params["attn_q"]  # (B, 2H)
        score = jnp.einsum("bd,btd->bt", q, enc) + neg
        a = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", a, enc)
        logit = jnp.concatenate([h, ctx], axis=-1) @ params["out"] + params["out_b"]
        return (h, c, ctx), logit

    ctx0 = jnp.zeros((b, enc.shape[-1]), enc.dtype)
    init = (h0, jnp.zeros((b, hid), enc.dtype), ctx0)
    _, logits = lax.scan(step, init, jnp.swapaxes(emb, 0, 1))
    return jnp.swapaxes(logits, 0, 1)  # (B, Tp, V)


# ---------------------------------------------------------------------------
# numpy inference (greedy)
# ---------------------------------------------------------------------------


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


class NeuralG2P:
    """Greedy numpy decoder around a trained artifact."""

    def __init__(self, npz_path):
        z = np.load(npz_path, allow_pickle=True)
        self.p = {k: z[k].astype(np.float32) for k in z.files if k != "phones"}
        self.phones = [str(s) for s in z["phones"]]

    def _lstm_seq(self, pre, x, reverse=False):
        w_ih, b_ih = self.p[pre + "_w_ih"], self.p[pre + "_b_ih"]
        w_hh, b_hh = self.p[pre + "_w_hh"], self.p[pre + "_b_hh"]
        hid = w_hh.shape[0]
        t = x.shape[0]
        h = np.zeros(hid, np.float32)
        c = np.zeros(hid, np.float32)
        out = np.zeros((t, hid), np.float32)
        order = range(t - 1, -1, -1) if reverse else range(t)
        for idx in order:
            g = x[idx] @ w_ih + b_ih + h @ w_hh + b_hh
            i, f, gg, o = np.split(g, 4)
            c = _sig(f) * c + _sig(i) * np.tanh(gg)
            h = _sig(o) * np.tanh(c)
            out[idx] = h
        return out

    def predict(self, word: str) -> list:
        ids = [L2I[ch] for ch in word.lower() if ch in L2I][:MAX_WORD]
        if not ids:
            return []
        # replicate training exactly: the LSTMs run over the FULL padded
        # window (the backward scan consumes the pad rows first and the
        # model was trained with that), then only real rows feed attention
        padded = np.zeros((MAX_WORD,), np.int64)
        padded[: len(ids)] = ids
        x = self.p["char_emb"][padded]
        hf = self._lstm_seq("enc_f", x)
        hb = self._lstm_seq("enc_b", x, reverse=True)
        enc = np.concatenate([hf, hb], axis=-1)[: len(ids)]  # (T, 2H)

        w_ih, b_ih = self.p["dec_w_ih"], self.p["dec_b_ih"]
        w_hh, b_hh = self.p["dec_w_hh"], self.p["dec_b_hh"]
        hid = w_hh.shape[0]
        h = np.tanh(enc.mean(axis=0) @ self.p["dec_h0"])
        c = np.zeros(hid, np.float32)
        ctx = np.zeros(enc.shape[-1], np.float32)
        tok = 1  # BOS
        out = []
        for _ in range(MAX_PHONES):
            inp = np.concatenate([self.p["phone_emb"][tok], ctx])
            g = inp @ w_ih + b_ih + h @ w_hh + b_hh
            i, f, gg, o = np.split(g, 4)
            c = _sig(f) * c + _sig(i) * np.tanh(gg)
            h = _sig(o) * np.tanh(c)
            q = h @ self.p["attn_q"]
            score = enc @ q
            score = score - score.max()
            a = np.exp(score)
            a /= a.sum()
            ctx = a @ enc
            logit = np.concatenate([h, ctx]) @ self.p["out"] + self.p["out_b"]
            tok = int(np.argmax(logit))
            if tok == 2:  # EOS
                break
            if tok > 2:
                out.append(self.phones[tok])
        return out


def flatten_for_npz(params, phones):
    """Flatten the trainer's pytree into the npz layout NeuralG2P reads."""
    flat = {"char_emb": params["char_emb"], "phone_emb": params["phone_emb"],
            "attn_q": params["attn_q"], "out": params["out"],
            "out_b": params["out_b"], "dec_h0": params["dec_h0"]}
    for name in ("enc_f", "enc_b", "dec"):
        for k in ("w_ih", "b_ih", "w_hh", "b_hh"):
            flat[f"{name}_{k}"] = params[name][k]
    flat = {k: np.asarray(v, np.float32) for k, v in flat.items()}
    flat["phones"] = np.asarray(phones)
    return flat
