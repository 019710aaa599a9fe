#!/usr/bin/env python3
"""On-TPU parity check: DiT attention via the stock Pallas flash kernel
(segment-id padding) vs the einsum path. Run once per change to
stabletts.dit_mha_apply; CPU falls back to einsum so this must run on the
chip. Small shapes — cheap."""

import os
import signal
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "900")))

    import numpy as np

    import jax
    import jax.numpy as jnp

    from vosk_tts_tpu.models import stabletts as st

    rng = np.random.default_rng(0)
    b, t, c, heads = 2, 256, 384, 4
    params = st.dit_mha_init(jax.random.PRNGKey(0), c, heads)
    # flash engages only in bf16 (serving precision); f32 stays on the
    # exact einsum path, so only the bf16 comparison exercises the kernel
    for dtype, tol in ((jnp.bfloat16, 3e-2),):
        p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32)).astype(dtype)
        lengths = [256, 180]
        m = jnp.asarray((np.arange(t)[None, :] < np.asarray(lengths)[:, None])
                        .astype(np.float32)).astype(dtype)
        x = x * m[..., None]
        bias = jnp.where((m[:, None, :, None] * m[:, None, None, :]) == 0,
                         -jnp.finfo(dtype).max, 0.0).astype(dtype)

        want = st.dit_mha_apply(p, x, bias, n_heads=heads)  # einsum path
        got = st.dit_mha_apply(p, x, bias, n_heads=heads, seq_mask=m)  # flash
        w = np.asarray(want.astype(jnp.float32)) * np.asarray(m)[..., None]
        g = np.asarray(got.astype(jnp.float32)) * np.asarray(m)[..., None]
        err = np.max(np.abs(g - w)) / (np.max(np.abs(w)) + 1e-9)
        print(f"{jnp.dtype(dtype).name}: rel err {err:.2e}", flush=True)
        assert err < tol, (dtype, err)
    print("DIT FLASH PARITY OK", flush=True)


if __name__ == "__main__":
    main()
