"""Fused MRF residual-pair Pallas kernel (the decoder speed-of-light item).

The HiFiGAN-family generator spends ~92% of its decoder FLOPs in the MRF
resblocks (reference models.py:904-944: for each kernel size, three
[leaky -> dilated conv -> leaky -> conv -> residual-add] pairs). On the XLA
path every conv round-trips activations through HBM; at the serving shapes
(B=16, T up to 32k, C 256/128) that traffic, not the MXU, bounds the stage
(see tools/profile_stages.py; SURVEY §7 "transposed-conv/MRF efficiency").

This kernel fuses one whole pair in VMEM:

    out = x + conv_{k,1}( leaky( conv_{k,d}( leaky(x) ) ) )

  - the time axis is chunked host-side with a 2H halo (H = (k-1)/2*(d+1)),
    so every tile computes VALID convolutions with static slice sizes and
    no edge conditionals;
  - each conv is k shifted (rows, C) @ (C, C) matmuls on the MXU with fp32
    accumulation;
  - activations stay in VMEM for the whole pair: HBM sees one read and one
    write per pair instead of four.

Numerics match ops/wn.resblock1_apply tap-for-tap (same contraction order
per tap; fp32 accumulators) — tests/test_mrf.py checks exact-tolerance
equality on CPU (interpret mode) for every generator geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Flip for CPU golden tests.
INTERPRET = False

_SLOPE = 0.1  # LRELU_SLOPE (reference commons.py)


def _leaky(x):
    # max/min formulation: identical to where(x>=0, x, slope*x) but avoids a
    # bf16 vector cmpf, which Mosaic rejects on v5e ("Target does not
    # support this comparison").
    return jnp.maximum(x, 0) + jnp.asarray(_SLOPE, x.dtype) * jnp.minimum(x, 0)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            k: int, d: int, block_t: int, halo: int, chunk: int,
            n_chunk: int, t_total: int):
    """x_ref: (1, chunk+2H, C) resident row; o_ref: (1, block_t, C) tile."""
    row = pl.program_id(0)
    tile = pl.program_id(1)
    c = x_ref.shape[-1]
    w = block_t + 2 * halo
    xin = x_ref[0, pl.ds(tile * block_t, w), :]

    def conv_valid(v, w_ref, b_ref, kk, dd):
        rows = v.shape[0] - (kk - 1) * dd
        acc = jnp.zeros((rows, c), jnp.float32)
        for j in range(kk):
            acc += jax.lax.dot(v[j * dd : j * dd + rows, :], w_ref[j, :, :],
                               preferred_element_type=jnp.float32)
        return (acc + b_ref[0, :].astype(jnp.float32)).astype(v.dtype)

    y = conv_valid(_leaky(xin), w1_ref, b1_ref, k, d)          # w - (k-1)d rows
    # conv2 zero-pads OUTSIDE the true sequence (torch 'same' semantics):
    # conv1 values computed over the zero-padded halo beyond [0, T) must not
    # leak in — zero the activation at out-of-range global positions.
    base = (row % n_chunk) * chunk + tile * block_t - (k - 1) // 2
    g = base + jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1), 0)
    inside = jnp.logical_and(g >= 0, g < t_total)
    y = jnp.where(inside, _leaky(y), jnp.zeros_like(y))
    y = conv_valid(y, w2_ref, b2_ref, k, 1)                    # block_t rows
    o_ref[0, :, :] = y + xin[halo : halo + block_t, :]


def supported(t: int, c: int, *, block_t: int = 512) -> bool:
    return t % block_t == 0 and c % 128 == 0


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilation",
                                             "block_t", "chunk_t", "interpret"))
def fused_res_pair(x, w1, b1, w2, b2, *, kernel_size: int, dilation: int,
                   block_t: int = 512, chunk_t: int = 8192,
                   interpret: bool = False):
    """One MRF residual pair, fused. x: (B, T, C); w*: (k, C, C); b*: (C,).

    Equivalent to (ops/wn.resblock1_apply inner loop, reference
    modules.py ResBlock1.forward):
        xt = leaky(x); xt = conv(k, dilation)(xt)
        xt = leaky(xt); xt = conv(k, 1)(xt)
        return x + xt
    """
    b, t, c = x.shape
    k, d = kernel_size, dilation
    halo = (k - 1) // 2 * (d + 1)
    chunk = min(chunk_t, t)
    assert t % chunk == 0 and chunk % block_t == 0, (t, chunk, block_t)
    n_chunk = t // chunk

    # host-side haloed chunking: rows (B*n_chunk, chunk + 2H, C)
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    if n_chunk == 1:
        rows = xp
    else:
        starts = jnp.arange(n_chunk) * chunk
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(xp, s, chunk + 2 * halo, 1),
            out_axes=1)(starts).reshape(b * n_chunk, chunk + 2 * halo, c)

    grid = (b * n_chunk, chunk // block_t)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, d=d, block_t=block_t, halo=halo,
                          chunk=chunk, n_chunk=n_chunk, t_total=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk + 2 * halo, c), lambda r, tl: (r, 0, 0)),
            pl.BlockSpec((k, c, c), lambda r, tl: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda r, tl: (0, 0)),
            pl.BlockSpec((k, c, c), lambda r, tl: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda r, tl: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda r, tl: (r, tl, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_chunk, chunk, c), x.dtype),
        interpret=interpret or INTERPRET,
    )(rows, w1, b1.reshape(1, c), w2, b2.reshape(1, c))

    return out.reshape(b, t, c)


def resblock1_apply_fused(params, x, *, kernel_size: int, dilation,
                          interpret: bool = False):
    """Drop-in for ops/wn.resblock1_apply (mask-free generator path)."""
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilation):
        x = fused_res_pair(x, c1["w"], c1["b"], c2["w"], c2["b"],
                           kernel_size=kernel_size, dilation=d,
                           interpret=interpret)
    return x
