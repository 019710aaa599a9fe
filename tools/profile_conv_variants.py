#!/usr/bin/env python3
"""Compare conv1d implementations on the TPU at flow shapes.

XLA's conv_general_dilated lowering for 1-D convs with ~200 channels runs at
<1% MXU efficiency here. Candidates: tap-wise shifted matmuls, im2col single
matmul, and a plain matmul ceiling.
"""

import os
import signal
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "900")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, T, CIN, COUT, K = 16, 2048, 192, 384, 5
N = 20

rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, CIN), jnp.bfloat16)
w = jax.random.normal(rng, (K, CIN, COUT), jnp.bfloat16) * 0.05
b = jnp.zeros((COUT,), jnp.bfloat16)
PAD = (K - 1) // 2


def timeit(name, fn):
    def body(c, _):
        y = fn(c)
        return y[..., :CIN], ()

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=N)
        return y

    out = run(x)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    out = run(x)
    np.asarray(out).ravel()[:1]
    dt = (time.perf_counter() - t0) / N
    gflop = 2 * B * T * CIN * COUT * K / 1e9
    print(f"{name:28s} {dt*1e3:8.2f} ms   {gflop/dt/1e3:7.2f} TFLOP/s", flush=True)


def conv_xla(x):
    y = lax.conv_general_dilated(
        x, w, (1,), ((PAD, PAD),),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + b


def conv_taps(x):
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0)))
    y = b.astype(jnp.float32)
    acc = jnp.zeros((B, T, COUT), jnp.float32)
    for k in range(K):
        acc = acc + jnp.einsum("bti,io->bto", lax.dynamic_slice_in_dim(xp, k, T, 1), w[k],
                               preferred_element_type=jnp.float32)
    return (acc + y).astype(x.dtype)


def conv_taps_bf16(x):
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0)))
    acc = None
    for k in range(K):
        t = jnp.einsum("bti,io->bto", lax.dynamic_slice_in_dim(xp, k, T, 1), w[k])
        acc = t if acc is None else acc + t
    return acc + b


def conv_im2col(x):
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0)))
    cols = jnp.concatenate([lax.dynamic_slice_in_dim(xp, k, T, 1) for k in range(K)], axis=-1)
    return jnp.einsum("btk,ko->bto", cols, w.reshape(K * CIN, COUT)) + b


def matmul_ceiling(x):
    # same FLOPs as the conv: (B*T, K*CIN) @ (K*CIN, COUT) without the gather
    return jnp.einsum("bti,io->bto", x, w2) + b


w2 = jax.random.normal(rng, (CIN, COUT), jnp.bfloat16) * 0.05

timeit("xla conv_general_dilated", conv_xla)
timeit("tapwise matmul (f32 acc)", conv_taps)
timeit("tapwise matmul (bf16)", conv_taps_bf16)
timeit("im2col single matmul", conv_im2col)
timeit("plain matmul (1/5 flops)", matmul_ceiling)
