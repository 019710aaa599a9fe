"""ScaledAdam golden test vs the reference optimizer
(/root/reference/training/gpt-sovits/ar/modules/optim.py:123-622) and the
WarmupCosineLRSchedule lock (lr_schedulers.py:63).

Trajectory comparison over enough steps to exercise every branch: size
(log-scale) updates every 4 steps, the clipping ring-buffer refresh, the
post-period clip factor, the scalar-parameter path, and same-shape
parameter batching on the torch side.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import oracle
from vosk_tts_tpu.train import scaled_adam as SA


def oracle_optim():
    import importlib

    base = "/root/reference/training/gpt-sovits"
    if oracle._SHIM in sys.path:
        sys.path.remove(oracle._SHIM)
    sys.path.insert(0, oracle._SHIM)
    if base not in sys.path:
        sys.path.insert(1, base)
    return importlib.import_module("ar.modules.optim")


def make_params(rng):
    return {
        "w1": rng.standard_normal((4, 6)).astype(np.float32) * 0.5,
        "w2": rng.standard_normal((4, 6)).astype(np.float32) * 2.0,
        "w3": rng.standard_normal((3, 5, 2)).astype(np.float32) * 0.1,
        "s": rng.standard_normal((1,)).astype(np.float32),
    }


def make_targets(rng, params):
    return {k: rng.standard_normal(v.shape).astype(np.float32) for k, v in params.items()}


def loss_np_expr(p, t):
    # quadratic + linear so grads depend on the evolving params
    return sum(((p[k] - t[k]) ** 2).sum() + 0.1 * (p[k] * t[k]).sum() for k in p)


@pytest.mark.parametrize("clipping_scale", [None, 2.0])
def test_scaled_adam_matches_reference(rng, clipping_scale):
    optim = oracle_optim()
    init = make_params(rng)
    targets = make_targets(rng, init)
    n_steps, period = 11, 4

    # --- torch reference ---------------------------------------------------
    names = sorted(init)
    tparams = {k: torch.nn.Parameter(torch.from_numpy(init[k].copy())) for k in names}
    opt = optim.ScaledAdam(
        [tparams[k] for k in names],
        lr=0.01,
        betas=(0.9, 0.95),
        clipping_scale=clipping_scale,
        parameters_names=[names],
        show_dominant_parameters=False,
        clipping_update_period=period,
        size_update_period=4,
    )
    ref_traj = []
    for _ in range(n_steps):
        opt.zero_grad()
        loss = sum(
            ((tparams[k] - torch.from_numpy(targets[k])) ** 2).sum()
            + 0.1 * (tparams[k] * torch.from_numpy(targets[k])).sum()
            for k in names
        )
        loss.backward()
        opt.step()
        ref_traj.append({k: tparams[k].detach().numpy().copy() for k in names})

    # --- ours ----------------------------------------------------------------
    tx = SA.scaled_adam(
        learning_rate=0.01, betas=(0.9, 0.95), clipping_scale=clipping_scale,
        clipping_update_period=period, size_update_period=4,
    )
    params = {k: jnp.asarray(v) for k, v in init.items()}
    tgt = {k: jnp.asarray(v) for k, v in targets.items()}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: loss_np_expr(p, tgt))(params)
        updates, state = tx.update(grads, state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), state

    for i in range(n_steps):
        params, state = step(params, state)
        for k in names:
            np.testing.assert_allclose(
                np.asarray(params[k]), ref_traj[i][k], rtol=2e-5, atol=2e-6,
                err_msg=f"step {i} param {k} (clipping={clipping_scale})")


def test_scalar_clamp_path(rng):
    """A scalar pushed past scalar_max must clamp exactly like the reference."""
    optim = oracle_optim()
    s0 = np.asarray([9.99], np.float32)
    tp = torch.nn.Parameter(torch.from_numpy(s0.copy()))
    opt = optim.ScaledAdam([tp], lr=5.0, betas=(0.9, 0.95), clipping_scale=None,
                           parameters_names=[["s"]], show_dominant_parameters=False)
    tx = SA.scaled_adam(learning_rate=5.0, betas=(0.9, 0.95), clipping_scale=None)
    params = {"s": jnp.asarray(s0)}
    state = tx.init(params)
    for i in range(4):
        opt.zero_grad()
        (-(tp.sum())).backward()  # push upward past scalar_max=10
        opt.step()
        grads = {"s": jnp.asarray([-1.0], jnp.float32)}
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(np.asarray(params["s"]), tp.detach().numpy(),
                                   rtol=1e-6, atol=1e-6, err_msg=f"step {i}")


def test_warmup_cosine_lock():
    """The reference scheduler's step() hard-locks lr to 0.002
    (lr_schedulers.py:63) — locked mode must reproduce exactly that."""
    sched = SA.warmup_cosine_lr(1e-6, 0.01, 1e-6, warmup_steps=100, total_steps=1000)
    for s in [0, 50, 100, 500, 2000]:
        assert float(sched(jnp.asarray(s))) == pytest.approx(0.002)
    nominal = SA.warmup_cosine_lr(0.0, 0.01, 1e-4, 100, 1000, locked=None)
    assert float(nominal(jnp.asarray(0))) == pytest.approx(0.0)
    assert float(nominal(jnp.asarray(50))) == pytest.approx(0.005)
    assert float(nominal(jnp.asarray(100))) == pytest.approx(0.01)
    assert float(nominal(jnp.asarray(1000))) == pytest.approx(1e-4)
    assert float(nominal(jnp.asarray(5000))) == pytest.approx(1e-4)
    mid = float(nominal(jnp.asarray(550)))
    assert 1e-4 < mid < 0.01
