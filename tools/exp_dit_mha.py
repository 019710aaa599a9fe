#!/usr/bin/env python3
"""In-situ decomposition of the NEW native-layout DiT mha route: each piece
measured exactly as composed in stabletts.dit_mha_apply, then the whole —
the gap between sum-of-parts and the whole is XLA scheduling/copy overhead
to locate. B32 T2048 C384 bf16 (CFM serving shape)."""

import math
import os
import signal
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    signal.signal(signal.SIGALRM, lambda *a: (print("TIMEOUT", flush=True), os._exit(1)))
    signal.alarm(int(os.environ.get("PROFILE_TIMEOUT_S", "2400")))

    import jax
    import jax.numpy as jnp

    from vosk_tts_tpu.models import stabletts as st
    from vosk_tts_tpu.ops import flash_attention as fa
    from vosk_tts_tpu.ops.conv import conv1d
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = st.StableTTSConfig()
    params = st.matcha_init(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    params = cast(params)
    act = jnp.bfloat16
    blk = params["decoder"]["blocks"][0]["dit"]["attn"]

    B2, T, H = 32, 2048, st.StableTTSConfig().dec_hidden
    n_heads = cfg.dec_heads
    dk = H // n_heads
    dp, cp = 128, n_heads * 128
    d_rope = (dk // 2) // 2 * 2

    x = jax.random.normal(jax.random.PRNGKey(1), (B2, T, H), act)
    m2 = jnp.ones((B2, T), act)

    def timeit(name, fn, c0, n1=2, n2=8, reps=3):
        per, _, _ = device_timeit(fn, c0, n1=n1, n2=n2, reps=reps)
        print(f"{name:38s} {per*1e3:8.3f} ms", flush=True)
        return per

    def padded_cols(p, c):
        w4 = p["w"].reshape(1, c, n_heads, dk)
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, dp - dk)))
        b4 = jnp.pad(p["b"].reshape(n_heads, dk), ((0, 0), (0, dp - dk)))
        return w4.reshape(1, c, cp), b4.reshape(cp)

    wq, bq = padded_cols(blk["q"], H)
    wk, bk_ = padded_cols(blk["k"], H)
    wv, bv = padded_cols(blk["v"], H)
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
    bqkv = jnp.concatenate([bq, bk_, bv])
    wo4 = jnp.pad(blk["o"]["w"].reshape(1, n_heads, dk, H),
                  ((0, 0), (0, 0), (0, dp - dk), (0, 0))).reshape(1, cp, H)

    # 1. fused qkv conv alone
    def qkv_fn(c0):
        y = conv1d(c0, wqkv, bqkv)
        return c0 + 1e-6 * y[..., :H]

    timeit("fused qkv conv (384->1536)", qkv_fn, x)

    # 2. rope on padded layout
    qp = jax.random.normal(jax.random.PRNGKey(2), (B2, T, cp), act)

    def rope_fn(c0):
        y = st.rope(c0.reshape(B2, T, n_heads, dp), d_rope, time_axis=1)
        return c0 + 1e-6 * y.reshape(B2, T, cp)

    timeit("rope (B,T,512 padded layout)", rope_fn, qp)

    # 3. kernel alone on contiguous (B,T,512) inputs
    kv_len = jnp.full((B2,), T, jnp.int32)

    def kern_fn(c0):
        y = fa.global_flash_attention(c0, c0, c0, kv_len, n_heads=n_heads,
                                      sm_scale=1.0 / math.sqrt(dk))
        return c0 + 1e-6 * y

    timeit("global kernel alone (D=128)", kern_fn, qp)

    # 3b. kernel on SLICED operands (as in-graph: q,k,v are slices of qkv)
    qkv_big = jax.random.normal(jax.random.PRNGKey(3), (B2, T, 3 * cp), act)

    def kern_sliced(c0):
        q, k, v = c0[..., :cp], c0[..., cp:2 * cp], c0[..., 2 * cp:]
        y = fa.global_flash_attention(q, k, v, kv_len, n_heads=n_heads,
                                      sm_scale=1.0 / math.sqrt(dk))
        return c0 + 1e-6 * jnp.concatenate([y, y, y], axis=-1)

    timeit("kernel on qkv slices", kern_sliced, qkv_big)

    # 4. o-proj with padded rows
    def o_fn(c0):
        return c0 + 1e-6 * jnp.concatenate(
            [conv1d(c0, wo4, blk["o"]["b"])] * 4, axis=-1)[..., :cp]

    timeit("o-proj (512->384 padded rows)", o_fn, qp)

    # 5. whole new mha route
    def mha_fn(c0):
        y = st.dit_mha_apply(blk, c0, None, n_heads=n_heads, seq_mask=m2)
        return c0 + 1e-6 * y

    timeit("dit_mha_apply (whole new route)", mha_fn, x)

    # 6. whole WITHOUT kernel (same graph, attention replaced by q+k+v sum)
    def mha_nokernel(c0):
        qkv = conv1d(c0, wqkv, bqkv)
        q, k, v = qkv[..., :cp], qkv[..., cp:2 * cp], qkv[..., 2 * cp:]
        q = st.rope(q.reshape(B2, T, n_heads, dp), d_rope, time_axis=1).reshape(B2, T, cp)
        k = st.rope(k.reshape(B2, T, n_heads, dp), d_rope, time_axis=1).reshape(B2, T, cp)
        out = q + k + v
        return c0 + 1e-6 * conv1d(out, wo4, blk["o"]["b"])

    timeit("mha graph minus kernel", mha_nokernel, x)


if __name__ == "__main__":
    main()


def extra():
    """Ablations: rope cost in-graph; kernel block_q sweep."""
    import math
    import jax
    import jax.numpy as jnp
    from vosk_tts_tpu.models import stabletts as st
    from vosk_tts_tpu.ops import flash_attention as fa
    from vosk_tts_tpu.ops.conv import conv1d
    from vosk_tts_tpu.utils.profiling import device_timeit

    cfg = st.StableTTSConfig()
    params = st.matcha_init(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    params = cast(params)
    act = jnp.bfloat16
    blk = params["decoder"]["blocks"][0]["dit"]["attn"]
    B2, T, H = 32, 2048, cfg.dec_hidden
    n_heads = cfg.dec_heads
    dk = H // n_heads
    dp, cp = 128, n_heads * 128
    x = jax.random.normal(jax.random.PRNGKey(1), (B2, T, H), act)
    m2 = jnp.ones((B2, T), act)
    kv_len = jnp.full((B2,), T, jnp.int32)

    def timeit(name, fn, c0, n1=2, n2=8, reps=3):
        per, _, _ = device_timeit(fn, c0, n1=n1, n2=n2, reps=reps)
        print(f"{name:38s} {per*1e3:8.3f} ms", flush=True)
        return per

    def padded_cols(p, c):
        w4 = p["w"].reshape(1, c, n_heads, dk)
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, dp - dk)))
        b4 = jnp.pad(p["b"].reshape(n_heads, dk), ((0, 0), (0, dp - dk)))
        return w4.reshape(1, c, cp), b4.reshape(cp)

    wq, bq = padded_cols(blk["q"], H)
    wk, bk_ = padded_cols(blk["k"], H)
    wv, bv = padded_cols(blk["v"], H)
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
    bqkv = jnp.concatenate([bq, bk_, bv])
    wo4 = jnp.pad(blk["o"]["w"].reshape(1, n_heads, dk, H),
                  ((0, 0), (0, 0), (0, dp - dk), (0, 0))).reshape(1, cp, H)

    # (a) whole route WITHOUT rope
    def mha_norope(c0):
        qkv = conv1d(c0, wqkv, bqkv)
        out = fa.global_flash_attention_packed(qkv, kv_len, n_heads=n_heads,
                                               sm_scale=1.0 / math.sqrt(dk))
        return c0 + 1e-6 * conv1d(out, wo4, blk["o"]["b"])

    timeit("mha route WITHOUT rope", mha_norope, x)

    # (b) kernel block sweep on packed input
    qkv_big = jax.random.normal(jax.random.PRNGKey(3), (B2, T, 3 * cp), act)
    for bq_ in (1024, 512, 256):
        def kern(c0, bq_=bq_):
            y = fa.global_flash_attention_packed(c0, kv_len, n_heads=n_heads,
                                                 sm_scale=1.0 / math.sqrt(dk),
                                                 block_q=bq_)
            return c0.at[..., :cp].add(1e-6 * y)
        timeit(f"packed kernel block_q={bq_}", kern, qkv_big)

    # (c) whole current route for reference
    def mha_fn(c0):
        y = st.dit_mha_apply(blk, c0, None, n_heads=n_heads, seq_mask=m2)
        return c0 + 1e-6 * y
    timeit("dit_mha_apply (current route)", mha_fn, x)


if __name__ == "__main__" and os.environ.get("EXP_EXTRA"):
    extra()
