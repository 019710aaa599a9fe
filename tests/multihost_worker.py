"""Worker process for the 2-process multi-host test (test_multihost.py).

Run as:  python tests/multihost_worker.py --process-id I --num-processes N \
             --coordinator localhost:PORT [--local-devices 4]

Each process sees ``local_devices`` virtual CPU devices, joins the cluster
via ``jax.distributed.initialize`` (the TPU-native replacement for the
reference's mp.spawn + init_process_group, train_ms.py:52-77), builds its
HOST-LOCAL slice of a deterministic global batch, and runs ONE full VITS2
GAN training step over the global data-parallel mesh. Prints the step
metrics as one JSON line; the parent asserts both processes print the same
numbers as a single-process 8-device run of the same global batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_configs():
    """Tiny-depth config with every GAN structure present (the
    __graft_entry__.dryrun_multichip geometry)."""
    from vosk_tts_tpu.models import vits2
    from vosk_tts_tpu.train import vits2_train as T

    mcfg = vits2.VITS2Config(
        n_vocab=20, spec_channels=40, segment_size=8,
        inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, n_flows=1, posterior_wn_layers=2, sdp_n_flows=1,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=32, n_speakers=4, gin_channels=8,
    )
    hop = mcfg.upsample_factor
    tcfg = T.TrainConfig(
        filter_length=256, hop_length=hop, win_length=256, n_mel_channels=40,
        fft_sizes=(64, 128, 32), hop_sizes=(8, 16, 4), win_lengths=(32, 64, 16),
        disc_periods=(2, 3), disc_spec_ffts=(64,),
    )
    return mcfg, tcfg


def global_batch(b: int, hop: int):
    import numpy as np

    rng = np.random.default_rng(0)
    tx, tf = 12, 24
    return {
        "x": rng.integers(0, 20, size=(b, tx)).astype(np.int32),
        "x_lengths": np.full((b,), tx, np.int32),
        "mel": rng.standard_normal((b, tf, 40)).astype(np.float32),
        "mel_lengths": np.full((b,), tf, np.int32),
        "wav": (rng.standard_normal((b, tf * hop)) * 0.3).astype(np.float32),
        "sid": rng.integers(0, 4, size=(b,)).astype(np.int32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--bench-steps", type=int, default=0,
                    help="also time this many steps and print STEP_TIME")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(args.coordinator, args.num_processes, args.process_id)

    import numpy as np

    from vosk_tts_tpu.parallel import mesh as M
    from vosk_tts_tpu.train import vits2_train as T

    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, jax.devices()
    assert jax.process_count() == args.num_processes

    mcfg, tcfg = tiny_configs()
    batch = global_batch(n_global, mcfg.upsample_factor)
    lo = args.process_id * args.local_devices
    local = {k: v[lo : lo + args.local_devices] for k, v in batch.items()}

    mesh = M.make_mesh(n_data=n_global)
    state = M.replicate_params(mesh, T.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg))
    sharded = M.shard_batch(mesh, local)  # host-local rows -> global batch

    step = jax.jit(T.make_train_step(mcfg, tcfg))
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    out = {k: float(v) for k, v in metrics.items()}
    assert new_state["params_g"]["enc_p"]["proj"]["w"].sharding.is_fully_replicated
    print("METRICS " + json.dumps(out, sort_keys=True), flush=True)

    if args.bench_steps:
        import time

        s = new_state
        for _ in range(2):  # warm past any re-compilation/donation effects
            s, m = step(s, sharded, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.bench_steps):
            s, m = step(s, sharded, jax.random.PRNGKey(3))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.bench_steps
        print(f"STEP_TIME {dt:.6f}", flush=True)


if __name__ == "__main__":
    main()
