"""Trainable speaker embedder for the similarity eval protocol.

The reference gates VC quality on Resemblyzer cosine similarity
(/root/reference/training/vc/eval-score.py:25-63, published avg 0.880 on
the shipped model, vc/README.md:24). Resemblyzer is a GE2E-trained LSTM
d-vector net; its checkpoint cannot be downloaded here (zero egress), so
this module trains the SAME architecture this repo already ships for
QuickVC (models/quickvc.py speaker_encoder_*, mirroring vc/models.py:728)
with the GE2E loss (Wan et al. 2018 — the loss Resemblyzer was trained
with) on an in-repo synthetic multi-voice corpus.

The resulting scores are NOT comparable to the published 0.880 absolute
numbers (different training data), but they are *stable across rounds*:
the artifact is committed, so similarity regressions in the VC/TTS stacks
are detectable. The weight-free MFCC+F0 signature (speaker_embed.py)
remains the fallback when the artifact is absent.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.quickvc import speaker_encoder_apply, speaker_encoder_init
from ..ops.stft import mel_spectrogram

ARTIFACT = os.path.join(os.path.dirname(__file__), "data", "speaker_encoder.npz")

#: mel front-end of the embedder (22.05 kHz eval protocol shapes)
MEL = dict(n_fft=1024, num_mels=40, sr=22050, hop=256, win=1024, fmin=0.0, fmax=None)
PARTIAL_FRAMES = 80  # ~0.93 s windows, averaged over the utterance


# ---------------------------------------------------------------------------
# Synthetic multi-voice corpus (no external data in this environment).
# ---------------------------------------------------------------------------


def synthetic_voice(rng: np.random.Generator) -> dict:
    """A random 'voice': F0 + formant envelope + glottal tilt."""
    f0 = float(rng.uniform(85.0, 320.0))
    n_formants = 4
    centers = np.sort(rng.uniform(300.0, 4200.0, n_formants))
    bws = rng.uniform(60.0, 220.0, n_formants)
    gains = rng.uniform(0.5, 1.0, n_formants)
    tilt = float(rng.uniform(0.5, 1.5))  # spectral rolloff exponent
    return {"f0": f0, "centers": centers, "bws": bws, "gains": gains, "tilt": tilt}


def synthetic_utterance(rng: np.random.Generator, voice: dict,
                        n_sec: float = 1.2, sr: int = 22050) -> np.ndarray:
    """One 'utterance' of a voice: jittered harmonic stack shaped by the
    voice's formant envelope, with a random prosody contour (slow F0 drift +
    amplitude modulation) so utterances differ within a voice."""
    n = int(n_sec * sr)
    t = np.arange(n) / sr
    # slow F0 contour around the voice's base (vibrato-scale drift)
    drift = np.interp(t, np.linspace(0, n_sec, 6), rng.uniform(0.94, 1.06, 6))
    phase = 2 * np.pi * np.cumsum(voice["f0"] * drift) / sr
    src = sum(np.sin((k + 1) * phase + rng.uniform(0, 2 * np.pi))
              / (k + 1) ** voice["tilt"] for k in range(16))
    spec = np.fft.rfft(src)
    freqs = np.fft.rfftfreq(n, 1 / sr)
    env = sum(g * np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
              for fc, bw, g in zip(voice["centers"], voice["bws"], voice["gains"]))
    wav = np.fft.irfft(spec * (env + 0.02), n=n)
    contour = np.interp(t, np.linspace(0, n_sec, 8), 0.3 + rng.uniform(0, 0.7, 8))
    wav = wav * contour + rng.standard_normal(n) * 3e-4  # light noise floor
    return (wav / (np.abs(wav).max() + 1e-9) * 0.5).astype(np.float32)


def _utterance_mel(wav: np.ndarray) -> np.ndarray:
    m = mel_spectrogram(jnp.asarray(wav, jnp.float32)[None, :], MEL["n_fft"],
                        MEL["num_mels"], MEL["sr"], MEL["hop"], MEL["win"],
                        MEL["fmin"], MEL["fmax"])
    return np.asarray(m[0])


# ---------------------------------------------------------------------------
# GE2E loss (Wan et al., "Generalized End-to-End Loss for Speaker
# Verification" — the objective behind Resemblyzer's d-vectors).
# ---------------------------------------------------------------------------


def ge2e_loss(embeds: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """embeds: (N voices, M utts, D) L2-normalized. Softmax variant."""
    n, m, d = embeds.shape
    centroids = embeds.mean(axis=1)  # (N, D)
    # exclusive centroid for own-voice similarity (eq. 8)
    excl = (centroids[:, None, :] * m - embeds) / (m - 1)  # (N, M, D)
    excl = excl / (jnp.linalg.norm(excl, axis=-1, keepdims=True) + 1e-6)
    cnorm = centroids / (jnp.linalg.norm(centroids, axis=-1, keepdims=True) + 1e-6)

    sim = jnp.einsum("nmd,kd->nmk", embeds, cnorm)  # (N, M, N)
    own = jnp.sum(embeds * excl, axis=-1)  # (N, M)
    eye = jnp.eye(n, dtype=bool)[:, None, :]
    sim = jnp.where(eye, own[..., None], sim) * w + b
    # log-softmax CE against the own-voice column
    logz = jax.nn.logsumexp(sim, axis=-1)
    pos = jnp.take_along_axis(sim, jnp.arange(n)[:, None, None].repeat(m, 1), -1)[..., 0]
    return jnp.mean(logz - pos)


def train_speaker_encoder(
    seed: int = 0,
    *,
    n_voices: int = 64,
    utts_per_voice: int = 6,
    voices_per_batch: int = 8,
    utts_per_batch: int = 4,
    steps: int = 400,
    hidden: int = 64,
    emb: int = 64,
    layers: int = 2,
    lr: float = 1e-3,
    log=None,
):
    """Train the LSTM speaker encoder with GE2E on a synthetic corpus.
    Returns (params, state_dict-extra) — pass to ``save_artifact``."""
    rng = np.random.default_rng(seed)
    voices = [synthetic_voice(rng) for _ in range(n_voices)]
    mels = np.stack([
        np.stack([_utterance_mel(synthetic_utterance(rng, v))[:PARTIAL_FRAMES]
                  for _ in range(utts_per_voice)])
        for v in voices
    ])  # (V, U, T, mel)

    key = jax.random.PRNGKey(seed)
    params = {
        "enc": speaker_encoder_init(key, mel_channels=MEL["num_mels"],
                                    hidden=hidden, emb=emb, layers=layers),
        "w": jnp.asarray(10.0),
        "b": jnp.asarray(-5.0),
    }
    # GE2E training discipline (Wan et al. §3): clip gradients, keep w > 0.
    opt = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))
    opt_state = opt.init(params)

    def loss_fn(p, batch):
        n, m, t, c = batch.shape
        e = speaker_encoder_apply(p["enc"], batch.reshape(n * m, t, c))
        e = jnp.nan_to_num(e)  # relu can zero a whole embedding early on
        return ge2e_loss(e.reshape(n, m, -1), jnp.maximum(p["w"], 1e-2), p["b"])

    @jax.jit
    def step_fn(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    last = None
    for it in range(steps):
        vi = rng.choice(n_voices, voices_per_batch, replace=False)
        ui = rng.integers(0, utts_per_voice, size=(voices_per_batch, utts_per_batch))
        batch = jnp.asarray(mels[vi[:, None], ui])
        params, opt_state, loss = step_fn(params, opt_state, batch)
        last = float(loss)
        if log and it % 50 == 0:
            log(f"step {it}: ge2e {last:.4f}")
    return params, {"loss": last, "hidden": hidden, "emb": emb, "layers": layers}


# ---------------------------------------------------------------------------
# Artifact + embedder callable.
# ---------------------------------------------------------------------------


def save_artifact(path: str, params, extra: dict) -> None:
    from ..utils.checkpoint import save_params

    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_params(path, {"params": params, "meta": {k: np.asarray(v) for k, v in extra.items()}})


def load_artifact(path: str = ARTIFACT):
    from ..utils.checkpoint import load_params

    return load_params(path)


def lstm_embedder(params=None):
    """Returns an ``embedder(wav, sample_rate)`` callable for
    harness.speaker_similarity, using partial-window averaging as
    vc/models.py:743-767 / Resemblyzer's embed_utterance."""
    if params is None:
        params = load_artifact()["params"]
    enc = params["enc"]

    @jax.jit
    def _embed_windows(windows):  # (K, T, mel)
        e = jnp.nan_to_num(speaker_encoder_apply(enc, windows))
        e = e.mean(axis=0)
        return e / (jnp.linalg.norm(e) + 1e-9)

    def embed(wav: np.ndarray, sample_rate: int) -> np.ndarray:
        if sample_rate != MEL["sr"]:
            # linear resample to the embedder's rate (eval-path only)
            n = int(round(len(wav) * MEL["sr"] / sample_rate))
            wav = np.interp(np.linspace(0, len(wav) - 1, n),
                            np.arange(len(wav)), wav)
        mel = _utterance_mel(np.asarray(wav, np.float32))
        t = mel.shape[0]
        if t < PARTIAL_FRAMES:
            mel = np.pad(mel, ((0, PARTIAL_FRAMES - t), (0, 0)), mode="wrap")
            t = PARTIAL_FRAMES
        starts = list(range(0, t - PARTIAL_FRAMES + 1, PARTIAL_FRAMES // 2))
        if starts[-1] != t - PARTIAL_FRAMES:
            starts.append(t - PARTIAL_FRAMES)
        windows = np.stack([mel[s : s + PARTIAL_FRAMES] for s in starts])
        return np.asarray(_embed_windows(jnp.asarray(windows)))

    return embed
