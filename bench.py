r"""Benchmark: batched offline mocap inference throughput on one TPU chip.

Measures the headline number from BASELINE.md: AIST++-style offline
evaluation throughput (frames/sec through the full SigMP fusion step — six
LSTMs + IK/FK + translation/floor logic per frame) using the batched
``vmap``+``lax.scan`` runner, versus the reference *architecture* baseline:
the same network driven one frame per device dispatch (the reference's
``forward_online`` Python loop, evaluate.py:75-81) measured on the same
hardware.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from robustcap_tpu.config import SigMPConfig
    from robustcap_tpu.models import sig_mp
    from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

    B = int(os.environ.get("BENCH_BATCH", 512))
    T = int(os.environ.get("BENCH_FRAMES", 512))
    SEQ_FRAMES = int(os.environ.get("BENCH_SEQ_FRAMES", 240))

    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(0))  # full-size bank
    if os.environ.get("BENCH_DTYPE", "f32") in ("bf16", "bfloat16"):
        from robustcap_tpu.nn.rnn import cast_params
        params = cast_params(params, jnp.bfloat16)
    cfg = SigMPConfig()

    rng = np.random.RandomState(0)
    j2dc = (rng.randn(B, T, 33, 3) * 0.1).astype(np.float32)
    j2dc[..., 2] = np.clip(rng.uniform(0.3, 1.0, (B, T, 1)), 0, 1)
    accc = rng.randn(B, T, 6, 3).astype(np.float32)
    aa = (rng.randn(B * T * 6, 3) * 0.2).astype(np.float32)
    import robustcap_tpu.math as M
    oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                      ).reshape(B, T, 6, 3, 3)

    frames = {
        "j2dc": jnp.asarray(j2dc),
        "accc": jnp.asarray(accc),
        "oric": jnp.asarray(oric),
        "first_tran": jnp.zeros((B, T, 3)),
        "first_tran_valid": jnp.asarray(
            np.arange(T)[None, :].repeat(B, 0) == 0),
        "first_frame": jnp.zeros((B, T), bool),
        "gravityc": jnp.broadcast_to(
            jnp.asarray([0.0, -1.0, 0.0]), (B, T, 3)),
    }

    batched = jax.jit(
        lambda p, f: sig_mp.forward_offline_batched(p, model, cfg, f))

    # compile + warmup
    out = batched(params, frames)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = batched(params, frames)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    batched_fps = B * T / dt

    # true on-chip per-frame step time: chain SEQ_FRAMES steps in ONE
    # dispatch (B=1 scan) so host<->device round-trips don't pollute the
    # number — this is the latency a locally-attached chip would see.
    one = jax.tree.map(lambda x: x[:1, :SEQ_FRAMES], frames)
    single = jax.jit(
        lambda p, f: sig_mp.forward_offline_batched(p, model, cfg, f))
    jax.block_until_ready(single(params, one))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(single(params, one))
    device_step_ms = (time.perf_counter() - t0) / 3 / SEQ_FRAMES * 1e3

    # baseline: per-frame sequential dispatch (reference architecture)
    net = sig_mp.StreamingNet(params, model, cfg)
    net.forward_online(j2dc[0, 0], accc[0, 0], oric[0, 0],
                       first_tran=np.zeros(3, np.float32))  # compile
    lat = []
    for t in range(1, SEQ_FRAMES):
        s = time.perf_counter()
        _, tr = net.forward_online(j2dc[0, t % T], accc[0, t % T],
                                   oric[0, t % T])
        jax.block_until_ready(tr)
        lat.append(time.perf_counter() - s)
    seq_fps = 1.0 / float(np.mean(lat))
    p50_ms = float(np.percentile(lat, 50) * 1e3)

    result = {
        "metric": "aist_batched_eval_throughput",
        "value": round(batched_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(batched_fps / seq_fps, 2),
        "extra": {
            "sequential_fps": round(seq_fps, 1),
            "streaming_p50_ms": round(p50_ms, 3),
            "device_step_ms": round(device_step_ms, 4),
            "batch": B, "frames": T,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
