r"""Decompose batched-step cost: which parts of the fused scan cost what.

Runs the offline batched scan under several configs on the current device
and prints per-variant step times. Development tool (not the driver bench).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from robustcap_tpu.config import SigMPConfig
    from robustcap_tpu.models import sig_mp
    from robustcap_tpu.nn.rnn import cast_params, quantize_params, rnn_scan
    from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

    B = int(os.environ.get("B", 512))
    T = int(os.environ.get("T", 128))
    dtype = os.environ.get("DTYPE", "f32")

    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(0))
    int8c = dtype == "int8c"
    if dtype == "bf16":
        params = cast_params(params, jnp.bfloat16)
    elif dtype in ("int8", "int8c"):
        params = quantize_params(params)

    rng = np.random.RandomState(0)
    j2dc = (rng.randn(B, T, 33, 3) * 0.1).astype(np.float32)
    j2dc[..., 2] = 0.9
    frames = {
        "j2dc": jnp.asarray(j2dc),
        "accc": jnp.asarray(rng.randn(B, T, 6, 3).astype(np.float32)),
        "oric": jnp.tile(jnp.eye(3), (B, T, 6, 1, 1)).astype(jnp.float32),
        "first_tran": jnp.zeros((B, T, 3)),
        "first_tran_valid": jnp.asarray(
            np.arange(T)[None].repeat(B, 0) == 0),
        "first_frame": jnp.zeros((B, T), bool),
        "gravityc": jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]),
                                     (B, T, 3)),
    }

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    variants = {
        "full": SigMPConfig(int8_compute=int8c),
        "no_updaters": SigMPConfig(use_vision_updater=False,
                                   use_imu_updater=False,
                                   int8_compute=int8c),
        "no_vision_updater": SigMPConfig(use_vision_updater=False,
                                         int8_compute=int8c),
        "no_floor": SigMPConfig(use_flat_floor=False, int8_compute=int8c),
    }
    for name, cfg in variants.items():
        fn = jax.jit(lambda p, f, cfg=cfg:
                     sig_mp.forward_offline_batched(p, model, cfg, f))
        dt = timeit(fn, params, frames)
        print(f"{name:20s} {dt / T * 1e3:8.4f} ms/step "
              f"({B * T / dt:12.0f} fps)")

    # pure LSTM-bank reference point: the 6 cells on dummy inputs
    xs = jnp.asarray(rng.randn(T, B, 171).astype(np.float32))

    def lstm_only(params, xs):
        outs = []
        for name, insize in [("rnn2", 72), ("rnn3", 141), ("rnn4", 171),
                             ("rnn6", 240), ("rnn7", 141), ("rnn8", 141)]:
            x = jnp.zeros((T, B, insize), xs.dtype) + xs[..., :1]
            outs.append(rnn_scan(params[name], x, int8_compute=int8c)[0])
        return [o.sum() for o in outs]

    dt = timeit(jax.jit(lstm_only), params, xs)
    print(f"{'lstm_bank_only':20s} {dt / T * 1e3:8.4f} ms/step "
          f"({B * T / dt:12.0f} fps)")

    # -- true single-stream serving path (SERVING=1): the unvmapped cond
    # scan with the serving-only optimizations (fused spec-head triple,
    # scalar-confidence cond tail; docs/PERFORMANCE.md), K-vs-2K chained
    # differencing with DISTINCT inputs per rep (tunnel relay caches
    # identical dispatches)
    if os.environ.get("SERVING", "0") != "0":
        from functools import partial
        K = int(os.environ.get("K", 512))
        occ = float(os.environ.get("OCC", 0.3))

        def mk(t, seed):
            r = np.random.RandomState(seed)
            j = (r.randn(t, 33, 3) * 0.1).astype(np.float32)
            conf = r.uniform(0.3, 1.0, (t, 1)).astype(np.float32)
            conf[r.rand(t) < occ] = 0.05
            j[..., 2] = conf
            return (jnp.asarray(j),
                    jnp.asarray(r.randn(t, 6, 3).astype(np.float32)),
                    jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                        (t, 6, 1, 1))))

        import dataclasses
        for name, scfg in (
                ("serving", SigMPConfig(int8_compute=int8c)),
                ("serving_ptail",
                 SigMPConfig(int8_compute=int8c, pallas_tail=True)),
                ("serving_live", SigMPConfig.live_mode()),
                ("serving_live_ptail",
                 dataclasses.replace(SigMPConfig.live_mode(),
                                     pallas_tail=True))):
            sp = sig_mp.prepare_scan_params(params, scfg.int8_compute)
            step = sig_mp.make_step(model, scfg,
                                    include_first_frame_step=False,
                                    cond_updater=True)

            @jax.jit
            def f(p, j2dc, accc, oric, step=step):
                fr = sig_mp._sequence_frames(j2dc, accc, oric,
                                             None, True, None)
                f0 = jax.tree.map(lambda x: x[0], fr)
                c0 = sig_mp.prescan_first_frame(p, model,
                                                sig_mp.init_carry(p), f0)
                _, (_, tr) = jax.lax.scan(partial(step, p), c0, fr)
                return tr.sum()

            d1 = [mk(K, 10 + i) for i in range(5)]
            d2 = [mk(2 * K, 20 + i) for i in range(5)]
            float(f(sp, *d1[0]))
            float(f(sp, *d2[0]))
            out = []
            for i in range(5):
                t0 = time.perf_counter()
                float(f(sp, *d1[i]))
                t1 = time.perf_counter()
                float(f(sp, *d2[i]))
                t2 = time.perf_counter()
                out.append(((t2 - t1) - (t1 - t0)) / K * 1e3)
            ms = float(np.percentile(out, 50))
            print(f"{name:20s} {ms:8.4f} ms/step (B=1, occ={occ})")


if __name__ == "__main__":
    main()
