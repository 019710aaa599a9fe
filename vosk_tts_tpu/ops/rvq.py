"""Vector-quantization training mechanics (EuclideanCodebook semantics).

Functional re-implementation of the reference RVQ core
(/root/reference/training/gpt-sovits/module/core_vq.py:96-233, the encodec
EuclideanCodebook): kmeans init on the first training batch, EMA codebook
update with Laplace smoothing, and dead-code expiry — as a pure state
transition suitable for one jitted train step (no in-place buffers).

State pytree: ``{"embed": (K,D), "embed_avg": (K,D), "cluster_size": (K,),
"inited": ()}``. The straight-through / commit-loss side lives in the model
graph (models/gpt_sovits.sovits_forward_train); this module owns the
non-gradient buffer updates, applied by train/gpt_sovits_train.make_s2_step.

Reference-order quirk preserved deliberately: ``forward`` expires dead codes
*before* the EMA update and then overwrites ``embed`` with the normalized
``embed_avg`` (core_vq.py:216-231), so expiry never survives a training step
(it only touches ``embed``, which the same call recomputes). Golden-tested
against the torch oracle in tests/test_rvq.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def state_init(codebook_size: int, dim: int, *, embed=None) -> dict:
    """kmeans_init=True state: zero embed, inited=0 (core_vq.py:121-139).
    Pass ``embed`` for uniform-init semantics (inited=1)."""
    if embed is None:
        embed = jnp.zeros((codebook_size, dim), jnp.float32)
        inited = jnp.zeros((), jnp.float32)
    else:
        embed = jnp.asarray(embed, jnp.float32)
        inited = jnp.ones((), jnp.float32)
    return {
        "embed": embed,
        "embed_avg": embed.copy(),
        "cluster_size": jnp.zeros((codebook_size,), jnp.float32),
        "inited": inited,
    }


def quantize(embed: jax.Array, x: jax.Array) -> jax.Array:
    """Nearest-neighbour code ids. embed: (K,D); x: (...,D) -> (...)."""
    d = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2 * x @ embed.T
        + jnp.sum(embed**2, -1)
    )
    return jnp.argmin(d, axis=-1)


def sample_vectors(rng, samples: jax.Array, num: int) -> jax.Array:
    """core_vq.py:60-68: randperm when enough samples, randint otherwise
    (static shapes: the branch is resolved at trace time)."""
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(rng, n)[:num]
    else:
        idx = jax.random.randint(rng, (num,), 0, n)
    return samples[idx]


def kmeans_run(samples: jax.Array, means0: jax.Array, num_iters: int = 10):
    """The torch kmeans loop (core_vq.py:71-93) from explicit initial means:
    hard assignment, scatter-mean, empty clusters keep their previous mean.
    Returns (means, bins)."""
    k = means0.shape[0]

    def body(means, _):
        codes = quantize(means, samples)  # (N,)
        onehot = jax.nn.one_hot(codes, k, dtype=samples.dtype)  # (N,K)
        bins = jnp.sum(onehot, axis=0)  # (K,)
        zero = bins == 0
        sums = onehot.T @ samples  # (K,D)
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        means = jnp.where(zero[:, None], means, new_means)
        return means, bins

    means, bins = jax.lax.scan(body, means0, None, length=num_iters)
    return means, bins[-1]


def kmeans(rng, samples: jax.Array, num_clusters: int, num_iters: int = 10,
           max_samples: int = 500):
    """core_vq.py:71-77: cap at the FIRST max_samples rows, sample initial
    means, run the loop."""
    samples = samples[:max_samples]
    means0 = sample_vectors(rng, samples, num_clusters)
    return kmeans_run(samples, means0, num_iters)


def maybe_kmeans_init(state: dict, x: jax.Array, rng, *, kmeans_iters: int = 10,
                      max_samples: int = 500) -> dict:
    """init_embed_ (core_vq.py:141-152): on the first training batch, kmeans
    over the flattened features seeds embed/embed_avg/cluster_size."""
    def do_init(s):
        embed, bins = kmeans(rng, x, s["embed"].shape[0], kmeans_iters, max_samples)
        return {
            "embed": embed,
            "embed_avg": embed.copy(),
            "cluster_size": bins.astype(jnp.float32),
            "inited": jnp.ones((), jnp.float32),
        }

    return jax.lax.cond(state["inited"] > 0, lambda s: s, do_init, state)


def _laplace_smoothing(x, n_categories: int, epsilon: float):
    return (x + epsilon) / (jnp.sum(x) + n_categories * epsilon)


def ema_step(state: dict, x: jax.Array, rng, *, decay: float = 0.99,
             epsilon: float = 1e-5, threshold_ema_dead_code: float = 2.0) -> dict:
    """One training-forward buffer transition (core_vq.py:207-231), given the
    flattened batch features x: (N, D). Must run on an ALREADY-INITED state.

    Order (reference-exact): expire dead codes into ``embed`` (clobbered two
    lines later — kept for semantic parity), EMA cluster_size / embed_avg,
    then embed = embed_avg / laplace-smoothed cluster_size."""
    k = state["embed"].shape[0]
    codes = quantize(state["embed"], x)
    onehot = jax.nn.one_hot(codes, k, dtype=x.dtype)  # (N,K)

    embed = state["embed"]
    if threshold_ema_dead_code > 0:
        expired = state["cluster_size"] < threshold_ema_dead_code
        embed = jnp.where(expired[:, None], sample_vectors(rng, x, k), embed)

    cluster_size = state["cluster_size"] * decay + jnp.sum(onehot, 0) * (1 - decay)
    embed_sum = onehot.T @ x  # (K,D)
    embed_avg = state["embed_avg"] * decay + embed_sum * (1 - decay)
    n = _laplace_smoothing(cluster_size, k, epsilon) * jnp.sum(cluster_size)
    embed = embed_avg / n[:, None]

    return {
        "embed": embed,
        "embed_avg": embed_avg,
        "cluster_size": cluster_size,
        "inited": state["inited"],
    }


def train_update(state: dict, x: jax.Array, rng, *, decay: float = 0.99,
                 epsilon: float = 1e-5, threshold_ema_dead_code: float = 2.0,
                 kmeans_iters: int = 10, max_samples: int = 500) -> dict:
    """Full per-step buffer update: kmeans-init on the first batch, then the
    EMA transition. x: (N, D) flattened features (stop-gradient upstream)."""
    r_init, r_expire = jax.random.split(rng)
    state = maybe_kmeans_init(state, x, r_init, kmeans_iters=kmeans_iters,
                              max_samples=max_samples)
    return ema_step(state, x, r_expire, decay=decay, epsilon=epsilon,
                    threshold_ema_dead_code=threshold_ema_dead_code)
