"""Tensor-parallel sharding for the vocoder (HiFiGAN-family generator).

SURVEY §2.10's named TPU-native addition: the widest part of the synthesis
graph is the generator trunk (upsample transposed convs + MRF resblocks at
``upsample_initial_channel`` width, reference models.py:845-1029). When HBM
headroom requires it — very long utterances, very wide vocoders, or serving
many replicas per chip — the channel dimension shards over a ``model`` mesh
axis and XLA's SPMD partitioner inserts the collectives over ICI.

Design: this module emits *seed shardings* for the generator parameter
pytree in the Megatron column/row pattern and lets GSPMD propagate them
through ``generator_apply`` unchanged — no model-code edits, no manual
collectives (the scaling-book recipe: pick a mesh, annotate, let XLA
partition):

  - ``conv_pre`` / ``cond`` / ``ups[i]``: column-parallel — output-channel
    dim of the (K, I, O) weight sharded over ``model``, so trunk activations
    are channel-sharded and each device holds 1/n of the widest tensors.
  - resblock ``convs1`` (dilated): row-parallel — input-channel dim sharded,
    matching the sharded activations; GSPMD reduces the contraction with a
    psum over ``model``.
  - resblock ``convs2`` and ``conv_post``: column/row continuation chosen so
    the residual adds stay on channel-sharded activations.

Weights whose channel dims don't divide the axis (e.g. the final
``conv_post`` with subbands*(n_fft+2) outputs, the k=63 multistream filter)
stay replicated; GSPMD inserts the boundary all-gather.

Verified in tests/test_tp.py: on a 2 (data) x 4 (model) virtual mesh the
sharded generator matches the single-device result and each device
addresses only 1/4 of the trunk weights.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(w_shape, dim_to_shard: int, n: int, axis: str):
    """Shard `dim_to_shard` of a weight if divisible by the axis size."""
    if w_shape[dim_to_shard] % n != 0:
        return P()
    spec = [None] * len(w_shape)
    spec[dim_to_shard] = axis
    return P(*spec)


def generator_tp_shardings(mesh: Mesh, gen_params, *, axis: str = "model"):
    """NamedSharding pytree for a generator param dict (vits2.generator_init).

    Column-parallel (O sharded): conv_pre, cond, ups[i], resblock convs2.
    Row-parallel (I sharded): resblock convs1 (consume the channel-sharded
    activations; psum restores them for the residual add via convs2's
    column split — GSPMD resolves the exact collective placement).
    Anything not divisible by the axis size is replicated.
    """
    n = mesh.shape[axis]

    def named(spec):
        return NamedSharding(mesh, spec)

    def col(p):  # output channels sharded: w (K, I, O) dim 2, b (O,) dim 0
        out = {"w": named(_spec_for(p["w"].shape, 2, n, axis))}
        if p.get("b") is not None:
            out["b"] = named(_spec_for(p["b"].shape, 0, n, axis))
        elif "b" in p:
            out["b"] = None
        return out

    def row(p):  # input channels sharded: w (K, I, O) dim 1; bias replicated
        out = {"w": named(_spec_for(p["w"].shape, 1, n, axis))}
        if "b" in p:
            out["b"] = named(P()) if p["b"] is not None else None
        return out

    def repl(p):
        return jax.tree_util.tree_map(
            lambda x: None if x is None else named(P()), p,
            is_leaf=lambda x: x is None)

    sh = {"conv_pre": col(gen_params["conv_pre"])}
    sh["ups"] = [col(u) for u in gen_params["ups"]]
    sh["resblocks"] = []
    for rb in gen_params["resblocks"]:
        if "convs1" in rb:  # resblock1: dilated conv (row) -> 1x conv (col)
            sh["resblocks"].append({
                "convs1": [row(c) for c in rb["convs1"]],
                "convs2": [col(c) for c in rb["convs2"]],
            })
        else:  # resblock2: single conv per dilation; keep channel-sharded
            sh["resblocks"].append({"convs": [row(c) for c in rb["convs"]]})
    # conv_post contracts the (sharded) trunk channels into spectral bins:
    # row-parallel so no activation gather is needed before the contraction.
    sh["conv_post"] = row(gen_params["conv_post"])
    if "cond" in gen_params:
        sh["cond"] = col(gen_params["cond"])
    if "multistream_conv_post" in gen_params:
        sh["multistream_conv_post"] = repl(gen_params["multistream_conv_post"])
    return sh


def shard_generator_params(mesh: Mesh, gen_params, *, axis: str = "model"):
    """device_put the generator params with TP shardings."""
    shardings = generator_tp_shardings(mesh, gen_params, axis=axis)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None else jax.device_put(x, s),
        gen_params, shardings, is_leaf=lambda x: x is None)
