r"""Benchmark: batched offline mocap inference throughput on one TPU chip.

Measures the headline number from BASELINE.md: AIST++-style offline
evaluation throughput (frames/sec through the full SigMP fusion step — six
LSTMs + IK/FK + translation/floor logic per frame) using the batched
``vmap``+``lax.scan`` runner.

Honesty notes (VERDICT round-1 weakness 1):

* ``device_p50_ms`` is the **on-device** per-frame latency of the streaming
  step (B=1), measured by differencing two chained-scan lengths — time(2K
  steps) - time(K steps) over K — so the network-tunnel RTT (~30-40 ms per
  dispatch in this environment) and any fixed dispatch overhead cancel
  exactly. Reported as a first-class field; the BASELINE.md target is
  <16 ms p50.
* ``vs_baseline`` compares against the ACTUAL reference implementation
  (torch ``Net.forward_online``, /root/reference/net/sig_mp.py:114-274)
  executed on this host's CPU — the reference's own supported device
  (evaluate.py:15) — not against a tunnel-throttled per-frame dispatch.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Pinned healthy-host baseline (VERDICT r3 item 5): the reference's torch-CPU
# ``Net.forward_online`` measured 14.76 FPS in BENCH_r02 on the last healthy
# multi-core host (protocol: _measure_reference_cpu_fps below — 40 frames,
# full-size net, random weights, this repo's fixture inputs). ``vs_baseline``
# divides by this fixed point so the headline multiplier stops moving when
# the VM degrades; ``extra.vs_baseline_live`` reports the same-run
# measurement against ``extra.baseline_fps_live``.
PINNED_BASELINE_FPS = 14.76

# On-chip kernel-parity acceptance bounds (VERDICT r3 item 4), asserted by
# _bound_parity below — exceeding one fails the SECTION (recorded in
# extra.section_errors), not the bench. Calibrated from measured on-chip
# drift at the default K=240-frame chunks (docs/PERFORMANCE.md "On-chip
# parity bounds"): the fused kernels share math but not accumulation order
# with the XLA step, and per-frame rounding (MXU bf16-input matmuls)
# compounds through the recurrent carry. Bounds sit ~4x above the observed
# values so regressions trip them while routine drift does not.
TAIL_POSE_P50_BOUND = 0.02    # f32 tail kernel vs XLA f32 tail
TAIL_TRAN_BOUND = 0.02
SERVE_POSE_P50_BOUND = 0.08   # bf16 serve kernel vs XLA bf16 scan
SERVE_TRAN_BOUND = 0.02
INT8_TRAN_BOUND = 0.1         # int8-resident serve vs bf16 XLA scan


def _parity_metrics(pose_a, tran_a, pose_b, tran_b):
    r"""Robust on-device parity summary between two (pose [T,24,3,3],
    tran [T,3]) trajectories. The pose MAX is dominated by r6d->R
    orthonormalization blow-ups on near-degenerate frames (random weights
    produce ill-conditioned r6d outputs; docs/PERFORMANCE.md), so the
    asserted bound uses the per-frame MEDIAN plus the translation max —
    translation integrates every gate/branch decision, so a semantic
    divergence (a flipped branch) shows up there immediately."""
    dp = jnp.abs(pose_a - pose_b).max(axis=(1, 2, 3))
    return {
        "pose_frame_p50_max_abs_diff": round(
            float(jnp.percentile(dp, 50)), 6),
        "pose_max_abs_diff": round(float(dp.max()), 6),
        "tran_max_abs_diff": round(
            float(jnp.abs(tran_a - tran_b).max()), 6),
    }


def _bound_parity(metrics, pose_p50_bound, tran_bound):
    r"""Assert the acceptance bound on a parity summary (VERDICT r3 item 4):
    records the bound in the metrics and returns an error string (section
    failure) when exceeded, None when within bounds."""
    metrics["bounds"] = {"pose_frame_p50": pose_p50_bound,
                         "tran_max": tran_bound}
    ok = (metrics["pose_frame_p50_max_abs_diff"] <= pose_p50_bound
          and metrics["tran_max_abs_diff"] <= tran_bound)
    metrics["parity_ok"] = ok
    if not ok:
        return (f"parity bound exceeded: pose_p50="
                f"{metrics['pose_frame_p50_max_abs_diff']} "
                f"(bound {pose_p50_bound}), tran_max="
                f"{metrics['tran_max_abs_diff']} (bound {tran_bound})")
    return None


def _measure_reference_cpu_fps(j2dc, accc, oric, n_frames=40):
    r"""Run the real torch reference Net.forward_online on this host's CPU
    (random weights — same FLOPs as released weights) and return frames/sec.
    Falls back to the reference's 60 FPS design constant when the reference
    tree is unavailable."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        import torch
        from _reference_harness import make_reference_net
        net = make_reference_net(seed=0)
        jt = [torch.from_numpy(np.ascontiguousarray(j2dc[0, t]))
              for t in range(n_frames)]
        at = [torch.from_numpy(np.ascontiguousarray(accc[0, t]))
              for t in range(n_frames)]
        ot = [torch.from_numpy(np.ascontiguousarray(oric[0, t]))
              for t in range(n_frames)]
        net.forward_online(jt[0], at[0], ot[0],
                           first_tran=torch.zeros(3))  # warm
        t0 = time.perf_counter()
        for t in range(1, n_frames):
            net.forward_online(jt[t], at[t], ot[t])
        dt = time.perf_counter() - t0
        return (n_frames - 1) / dt, "measured torch-CPU reference"
    except Exception as e:  # pragma: no cover - environment-dependent
        return 60.0, f"reference unavailable ({type(e).__name__}); 60 FPS design constant"


def _carry_forward_bundle(bundle, state_path, allow_store=True):
    r"""Persist a PROVEN bundle result; attach it as ``last_good`` on failure.

    Mutates ``bundle`` in place. Success (export + load both ok) overwrites
    the state file with a timestamped copy; a failed export reads it back
    into ``bundle["last_good"]`` so a tunnel flap during the round-end run
    does not erase a previously proven export from the artifact.
    ``allow_store=False`` (CPU fallback run) keeps the read-back path but
    never records an off-chip export as chip proof.
    """
    try:
        if (allow_store and bundle and bundle.get("export_ok")
                and bundle.get("load_run_ok")):
            keep = {k: v for k, v in bundle.items() if k != "last_good"}
            with open(state_path, "w") as fh:
                json.dump({"measured_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "bundle": keep}, fh)
        elif (bundle is not None and not bundle.get("export_ok")
                and os.path.exists(state_path)):
            with open(state_path) as fh:
                bundle["last_good"] = json.load(fh)
    except Exception:  # noqa: BLE001 - state is best-effort
        pass


# optional extra.* sections the carry-forward below persists between runs
_CARRIED_SECTIONS = (
    "device_p50_bf16_ms", "tunnel_per_dispatch_p50_ms", "smplify_refine_fps",
    "int8c_fps", "batched_bf16_fps", "train_fps", "pallas", "multistream",
    "pallas_tail", "pallas_serve", "serving_bundle_chunk",
)


def _section_proven(val):
    r"""Is this live section value a PROOF worth persisting?

    ``None`` (starved/skipped) is not; a dict whose top-level ``*_ok``
    flags include an explicit ``False`` (e.g. a chunk-artifact export that
    timed out through a flapping tunnel) is a recorded failure, not proof —
    it must neither overwrite a stored success nor block carrying it."""
    if val is None:
        return False
    if isinstance(val, dict):
        return all(v is not False
                   for k, v in val.items() if k.endswith("_ok"))
    return True


def _carry_forward_sections(extra, state_path):
    r"""Persist every measured optional section; surface prior proof for nulls.

    A run in this environment routinely loses optional sections to tunnel
    flaps / budget starvation (docs/bench_runs_r04: run2 and run4 lost
    everything after the core measurements), so the one artifact the driver
    records per round under-reports what the repo has proven. For each
    section in ``_CARRIED_SECTIONS``: a non-null live value overwrites that
    section's on-disk state (timestamped); a null one pulls the stored copy
    into ``extra["last_good"][name]``. Carried values are NEVER written
    into the live slots — a starved slot stays null and the prior proof
    sits adjacent under ``last_good`` with its measurement time, so live
    and carried evidence cannot be confused.
    """
    state = {}
    try:
        if os.path.exists(state_path):
            with open(state_path) as fh:
                state = json.load(fh)
    except Exception:  # noqa: BLE001 - state is best-effort
        state = {}
    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    device = extra.get("device", "")
    carried = {}
    for name in _CARRIED_SECTIONS:
        val = extra.get(name)
        if _section_proven(val):
            state[name] = {"measured_at": now, "value": val,
                           "device": device}
        elif name in state:
            carried[name] = state[name]
    if carried:
        extra["last_good"] = carried
    try:
        with open(state_path, "w") as fh:
            json.dump(state, fh)
    except Exception:  # noqa: BLE001 - state is best-effort
        pass


def main():
    import threading

    # Hard watchdog FIRST: the tunneled TPU backend can go fully down in
    # this environment — then in-process device ops (and even backend
    # initialization) HANG rather than raise, beyond any soft deadline
    # check. Arm before anything touches the backend so the driver still
    # gets ONE json line no matter what.
    hard_s = float(os.environ.get("BENCH_HARD_DEADLINE_S", "560"))

    def _die():
        print(json.dumps({
            "metric": "aist_batched_eval_throughput", "value": 0,
            "unit": "frames/sec", "vs_baseline": 0,
            "error": f"hard deadline {hard_s:.0f}s exceeded — backend hang "
                     "(tunnel outage?); partial sections lost"}),
            flush=True)
        os._exit(3)

    watchdog = threading.Timer(hard_s, _die)
    watchdog.daemon = True
    watchdog.start()

    # The tunneled TPU flaps (observed: up a few minutes per hour). If the
    # bench starts during an outage, wait a bounded while for the tunnel —
    # probing with throwaway SUBPROCESSES under a hard timeout, never the
    # in-process backend — turning a would-be zero-value round artifact
    # into a measured one when the tunnel returns within the window.
    wait_s = float(os.environ.get("BENCH_WAIT_TUNNEL_S", "240"))
    t_wait0 = time.perf_counter()
    while wait_s > 0:
        import subprocess
        try:
            ok = subprocess.run(
                [sys.executable, "-c",
                 "import numpy as np, jax, jax.numpy as jnp\n"
                 "x = jnp.asarray(np.random.randn(24, 24)"
                 ".astype(np.float32))\n"
                 "print(float((x @ x).sum()))"],
                capture_output=True, timeout=75).returncode == 0
        except Exception:  # noqa: BLE001 - includes TimeoutExpired
            ok = False
        if ok or time.perf_counter() - t_wait0 >= wait_s:
            break  # up, or proceed anyway; the watchdog bounds the hang
        time.sleep(30)

    # Persistent compilation cache (opt-out BENCH_JAX_CACHE=0): a bench run
    # compiles ~18 distinct programs at 20-40 s each, which on a degraded
    # 1-vCPU host pushes the late sections (pallas chunk serving, the AOT
    # bundle) past the soft deadline. Cache-warm reruns recover them. Gated
    # OFF for cpu: the XLA:CPU executable serializer has segfaulted on this
    # host (CLAUDE.md); the tunneled TPU backend round-trips cleanly
    # (probed: write + read-hit).
    if os.environ.get("BENCH_JAX_CACHE", "1") != "0":
        try:
            # set the cache config BEFORE the first compile, then drop it if
            # the resolved backend is actually cpu (tunnel-down fallback —
            # the pin is "axon,cpu"); default_backend() may hang during an
            # outage, which the armed watchdog bounds
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0)
            if jax.default_backend() == "cpu":
                jax.config.update("jax_compilation_cache_dir", None)
        except Exception:  # noqa: BLE001 - cache is best-effort
            try:
                jax.config.update("jax_compilation_cache_dir", None)
            except Exception:  # noqa: BLE001
                pass

    # Every optional section runs under this guard: a failure in one
    # (e.g. a kernel the real chip rejects — the round-3 Pallas scoped-VMEM
    # overflow crashed the whole bench before any JSON line) is recorded in
    # extra.section_errors instead of killing the measurement run.
    section_errors = {}
    section_seconds = {}

    def guarded(label, fn, default=None):
        t0 = time.perf_counter()
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - report, don't die
            section_errors[label] = f"{type(e).__name__}: {e}"[:300]
            return default
        finally:
            # wall time per section in the artifact: starvation of the late
            # sections (soft deadline) is diagnosable from the JSON alone
            section_seconds[label] = round(
                section_seconds.get(label, 0.0)
                + (time.perf_counter() - t0), 1)

    from robustcap_tpu.config import SigMPConfig
    from robustcap_tpu.models import sig_mp
    from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

    B = int(os.environ.get("BENCH_BATCH", 512))
    T = int(os.environ.get("BENCH_FRAMES", 512))
    # the latency differencing runs K and 2K frame scans sliced from the
    # T-frame pool, so K can't exceed T//2 (the raw-data slices would
    # silently clamp while the generated fields wouldn't — shape mismatch)
    K = min(int(os.environ.get("BENCH_SEQ_FRAMES", 240)), max(T // 2, 1))
    # soft deadline: optional sections (int8c, smplify, per-dispatch
    # latency) are skipped once exceeded, so a slow host/tunnel still
    # produces the JSON line instead of being killed by an outer timeout
    deadline = time.perf_counter() + float(
        os.environ.get("BENCH_DEADLINE_S", "420"))

    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(0))  # full-size bank
    bench_dtype = os.environ.get("BENCH_DTYPE", "f32")

    def int8c_setup(p):
        r"""(quantized params, int8-MXU cfg, jitted batched fn) — the single
        definition of the int8c configuration (approximate serving mode:
        weights stay int8 in-loop, activations quantized per row)."""
        from robustcap_tpu.nn.rnn import quantize_params
        qp = quantize_params(p)
        qcfg = SigMPConfig(int8_compute=True)
        qfn = jax.jit(
            lambda p_, f: sig_mp.forward_offline_batched(p_, model, qcfg, f))
        return qp, qcfg, qfn

    cfg = SigMPConfig()
    if bench_dtype in ("bf16", "bfloat16"):
        from robustcap_tpu.nn.rnn import cast_params
        params = cast_params(params, jnp.bfloat16)
    elif bench_dtype == "int8":
        from robustcap_tpu.nn.rnn import quantize_params
        params = quantize_params(params)
    elif bench_dtype == "int8c":
        params, cfg, _ = int8c_setup(params)

    rng = np.random.RandomState(0)
    j2dc = (rng.randn(B, T, 33, 3) * 0.1).astype(np.float32)
    j2dc[..., 2] = np.clip(rng.uniform(0.3, 1.0, (B, T, 1)), 0, 1)
    accc = rng.randn(B, T, 6, 3).astype(np.float32)
    aa = (rng.randn(B * T * 6, 3) * 0.2).astype(np.float32)
    import robustcap_tpu.math as M
    oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                      ).reshape(B, T, 6, 3, 3).astype(np.float32)

    def make_frames(b, t):
        return {
            "j2dc": jnp.asarray(j2dc[:b, :t]),
            "accc": jnp.asarray(accc[:b, :t]),
            "oric": jnp.asarray(oric[:b, :t]),
            "first_tran": jnp.zeros((b, t, 3)),
            "first_tran_valid": jnp.asarray(
                np.arange(t)[None, :].repeat(b, 0) == 0),
            "first_frame": jnp.zeros((b, t), bool),
            "gravityc": jnp.broadcast_to(
                jnp.asarray([0.0, -1.0, 0.0]), (b, t, 3)),
        }

    batched = jax.jit(
        lambda p, f: sig_mp.forward_offline_batched(p, model, cfg, f))

    # -- headline: batched eval throughput ---------------------------------
    frames = make_frames(B, T)
    jax.block_until_ready(batched(params, frames))  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        jax.block_until_ready(batched(params, frames))
    dt = (time.perf_counter() - t0) / reps
    batched_fps = B * T / dt

    # -- int8-MXU serving mode (approximate; docs/PERFORMANCE.md) ----------
    def run_int8c():
        qparams, _, qbatched = int8c_setup(params)
        jax.block_until_ready(qbatched(qparams, frames))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(qbatched(qparams, frames))
        return B * T / ((time.perf_counter() - t0) / reps)

    int8c_fps = None
    if (bench_dtype == "f32" and os.environ.get("BENCH_INT8C", "1") != "0"
            and time.perf_counter() < deadline):
        int8c_fps = guarded("int8c", run_int8c)

    # exact-mode bf16 batched throughput (weights cast, f32 carry/geometry)
    def run_batched_bf16():
        from robustcap_tpu.nn.rnn import cast_params
        pb = cast_params(params, jnp.bfloat16)
        jax.block_until_ready(batched(pb, frames))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(batched(pb, frames))
        return B * T / ((time.perf_counter() - t0) / reps)

    batched_bf16_fps = None
    if (bench_dtype == "f32"
            and os.environ.get("BENCH_BATCHED_BF16", "1") != "0"
            and time.perf_counter() < deadline):
        batched_bf16_fps = guarded("batched_bf16", run_batched_bf16)

    # -- on-device streaming step latency (B=1), RTT-free by differencing --
    # Uses the TRUE single-stream scan (forward_offline, no vmap): it
    # carries the serving-only step optimizations (fused spec-head triple,
    # scalar-confidence cond tail) that the vmapped batched builder
    # deliberately disables.
    single = jax.jit(lambda p, f: sig_mp.forward_offline(
        p, model, cfg, f["j2dc"], f["accc"], f["oric"],
        first_frame=True, gravityc=f["gravityc"][0]))

    def frames1(t):
        f = make_frames(1, t)
        return jax.tree.map(lambda x: x[0], f)

    one_k = frames1(K)
    two_k = frames1(2 * K)
    jax.block_until_ready(single(params, one_k))
    jax.block_until_ready(single(params, two_k))

    def timed(f):
        t0 = time.perf_counter()
        jax.block_until_ready(single(params, f))
        return time.perf_counter() - t0

    per_step = []
    for _ in range(5):
        t1 = timed(one_k)
        t2 = timed(two_k)
        per_step.append((t2 - t1) / K * 1e3)
    device_p50_ms = float(np.percentile(per_step, 50))

    # -- AOT serving bundle on the real backend (VERDICT r2 item 6) --------
    # Runs RIGHT AFTER the two core measurements, BEFORE every optional
    # perf section (VERDICT r3 item 2: in round 3 this section ran last and
    # was starved down to its 30 s floor by the sections before it, while
    # the export itself needs ~65 s) — and its budget floor is 120 s.
    # Export runs in a SUBPROCESS under a hard timeout: tpu-platform
    # jax.export lowering through the tunneled backend is a documented
    # hang hazard (docs/PERFORMANCE.md) — this either proves it fixed or
    # pins the reproduction, every round. On success the parent loads the
    # artifact and executes frames on the chip (the load+run path).
    def export_sub(bdir, extra_kwargs, budget):
        import subprocess
        script = (
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "from robustcap_tpu.config import SigMPConfig\n"
            "from robustcap_tpu.models import sig_mp\n"
            "from robustcap_tpu.smpl import ParametricModel, "
            "synthetic_smpl_data\n"
            "from robustcap_tpu.serving import export_serving_bundle\n"
            "model = ParametricModel(data=synthetic_smpl_data())\n"
            "params = sig_mp.init_params(jax.random.PRNGKey(0))\n"
            "%s"
            "m = export_serving_bundle(params, model, SigMPConfig(%s),"
            " %r, platforms=('tpu',)%s)\n"
            "print('EXPORTED', m['platforms'])\n"
        ) % (os.path.dirname(os.path.abspath(__file__)),
             extra_kwargs.get("pre", ""),
             extra_kwargs.get("cfg", ""), bdir,
             extra_kwargs.get("kw", ""))
        t0 = time.perf_counter()
        try:
            proc = subprocess.run([sys.executable, "-c", script],
                                  capture_output=True, text=True,
                                  timeout=budget)
            ok = proc.returncode == 0
            reason = None if ok else proc.stderr[-400:]
        except subprocess.TimeoutExpired:
            ok, reason = False, (
                f"tpu-platform export lowering exceeded {budget:.0f}s "
                "(pinned hazard: hangs through the tunneled backend)")
        return ok, reason, time.perf_counter() - t0

    def run_bundle():
        import tempfile
        bdir = tempfile.mkdtemp(prefix="rc_bundle_")
        export_ok, reason, export_s = export_sub(
            bdir, {}, min(300.0, max(120.0, deadline - time.perf_counter())))
        bundle = {"export_ok": export_ok,
                  "export_seconds": round(export_s, 1),
                  "reason": reason}
        if export_ok:
            try:
                from robustcap_tpu.serving import ServingBundle
                sb = ServingBundle.load(bdir)
                sb.forward_online(j2dc[0, 0], accc[0, 0], oric[0, 0],
                                  first_tran=np.zeros(3, np.float32),
                                  first_frame=True)
                lat = []
                for t in range(1, 20):
                    s = time.perf_counter()
                    _, tr = sb.forward_online(j2dc[0, t % T], accc[0, t % T],
                                              oric[0, t % T])
                    jax.block_until_ready(tr)
                    lat.append(time.perf_counter() - s)
                bundle["load_run_ok"] = True
                bundle["dispatch_p50_ms"] = round(
                    float(np.percentile(lat, 50) * 1e3), 3)
            except Exception as e:  # noqa: BLE001 - report, don't die
                bundle["load_run_ok"] = False
                bundle["reason"] = f"{type(e).__name__}: {e}"[:400]

        return bundle

    bundle = None
    if os.environ.get("BENCH_BUNDLE", "1") != "0":
        bundle = guarded("serving_bundle", run_bundle)
        # Carry-forward (VERDICT r3 item 2): the tunneled backend flaps for
        # tens of minutes at a time, and an export that catches a flap
        # times out — that must not erase a previously PROVEN export from
        # the round artifact. On success, persist the result next to the
        # compile cache (untracked); on failure, attach it timestamped and
        # clearly labeled as ``last_good`` alongside this run's failure.
        _carry_forward_bundle(bundle, os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".bench_last_good_bundle.json"),
            allow_store="TPU" in str(jax.devices()[0]))

    # same differencing with bfloat16 weights (exact-mode fast serving
    # dtype — halves the bank's weight traffic; docs/PERFORMANCE.md)
    def run_p50_bf16():
        from robustcap_tpu.nn.rnn import cast_params
        pb = cast_params(params, jnp.bfloat16)
        jax.block_until_ready(single(pb, one_k))
        jax.block_until_ready(single(pb, two_k))
        out = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(single(pb, one_k))
            t1 = time.perf_counter()
            jax.block_until_ready(single(pb, two_k))
            t2 = time.perf_counter()
            out.append(((t2 - t1) - (t1 - t0)) / K * 1e3)
        return float(np.percentile(out, 50))

    device_p50_bf16_ms = None
    if (bench_dtype == "f32" and os.environ.get("BENCH_P50_BF16", "1") != "0"
            and time.perf_counter() < deadline):
        device_p50_bf16_ms = guarded("p50_bf16", run_p50_bf16)

    # -- fused geometry-tail Pallas kernel (ops/pallas_tail.py): the whole
    # post-heads tail (r6d->R, IK, FK, translation/floor, 33-landmark LBS)
    # as ONE kernel launch instead of dozens of tiny XLA ops. Same chained
    # differencing; parity is measured on-device against the XLA tail.
    def run_p50_tail():
        import dataclasses
        from robustcap_tpu.nn.rnn import cast_params
        cfg_t = dataclasses.replace(cfg, pallas_tail=True)
        single_t = jax.jit(lambda p, f: sig_mp.forward_offline(
            p, model, cfg_t, f["j2dc"], f["accc"], f["oric"],
            first_frame=True, gravityc=f["gravityc"][0]))

        # on-device numerical parity (f32): fused tail vs the XLA tail.
        # Bounded (VERDICT r3 item 4): the expected drift is MXU bf16-input
        # matmul rounding inside the kernel's dots vs XLA's op-by-op f32
        # tail, compounded through the K-frame recurrent carry — so the
        # asserted bound is on the per-frame MEDIAN pose diff plus the
        # translation max (docs/PERFORMANCE.md "On-chip parity bounds").
        pa, ta = single(params, one_k)
        pb, tb = single_t(params, one_k)
        parity = _parity_metrics(pa, ta, pb, tb)
        err = _bound_parity(parity, pose_p50_bound=TAIL_POSE_P50_BOUND,
                            tran_bound=TAIL_TRAN_BOUND)
        if err:
            section_errors["pallas_tail_parity"] = err

        def diff_p50(pp):
            jax.block_until_ready(single_t(pp, one_k))
            jax.block_until_ready(single_t(pp, two_k))
            out = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(single_t(pp, one_k))
                t1 = time.perf_counter()
                jax.block_until_ready(single_t(pp, two_k))
                t2 = time.perf_counter()
                out.append(((t2 - t1) - (t1 - t0)) / K * 1e3)
            return float(np.percentile(out, 50))

        res = {"parity": parity,
               "device_p50_tail_ms": round(diff_p50(params), 4)}
        if time.perf_counter() < deadline:
            res["device_p50_tail_bf16_ms"] = round(
                diff_p50(cast_params(params, jnp.bfloat16)), 4)
        return res

    tail = None
    if (bench_dtype == "f32" and os.environ.get("BENCH_TAIL", "1") != "0"
            and time.perf_counter() < deadline):
        tail = guarded("pallas_tail", run_p50_tail)

    # -- whole-step weight-resident serving kernel (ops/pallas_serve.py):
    # the entire frame loop in ONE Pallas launch per chunk, bank weights
    # VMEM-resident across frames (the B=1 scan is HBM-weight-bound —
    # docs/PERFORMANCE.md). bf16 weights; parity measured on-device against
    # the XLA bf16 scan on the same frames.
    def run_serve():
        from robustcap_tpu.nn.rnn import cast_params
        from robustcap_tpu.ops.pallas_serve import (prepare_serve_params,
                                                    serve_scan)
        # the grid-pipelined kernel's VMEM use is chunk-length-independent,
        # so the serve differencing can use the full K-frame chunks
        Ks = min(int(os.environ.get("BENCH_SERVE_FRAMES", K)), T // 2)
        sv_one, sv_two = frames1(Ks), frames1(2 * Ks)
        pb = cast_params(params, jnp.bfloat16)
        prepped = prepare_serve_params(pb, dtype=jnp.bfloat16)
        meta = {k: prepped[k] for k in ("H", "dtype", "stream")}
        arrs = {k: prepped[k] for k in ("ops", "init")}

        @jax.jit
        def fwd(arrs_, p, f):
            frames = sig_mp._sequence_frames(f["j2dc"], f["accc"],
                                             f["oric"], None, True,
                                             f["gravityc"][0])
            frame0 = jax.tree.map(lambda x: x[0], frames)
            carry = sig_mp.prescan_first_frame(p, model,
                                               sig_mp.init_carry(p), frame0)
            poses, trans, _, _ = serve_scan(dict(arrs_, **meta), model, cfg,
                                            frames, carry)
            return poses, trans

        # on-device parity vs the XLA bf16 scan (same weights, same
        # frames), bounded (VERDICT r3 item 4): both sides compute in bf16
        # but with different fusion/accumulation order, so per-frame drift
        # compounds through the Ks-frame carry; the bound is on the
        # per-frame median pose diff + translation max.
        pa, ta = single(pb, sv_one)
        ps, ts = fwd(arrs, pb, sv_one)
        parity = _parity_metrics(pa, ta, ps, ts)
        err = _bound_parity(parity, pose_p50_bound=SERVE_POSE_P50_BOUND,
                            tran_bound=SERVE_TRAN_BOUND)
        if err:
            section_errors["pallas_serve_parity"] = err

        def shifted(base, i):
            # distinct inputs per rep: the int8 kernel's device time
            # (~5 ms/dispatch) sits under the tunnel RTT, where repeated
            # identical dispatches can be relay-cached (CLAUDE.md) — the
            # r4 run series showed a 2x spread on the int8 number before
            # this. Device-side roll of the data streams only; the
            # first-frame markers stay in place.
            return dict(base,
                        **{k: jnp.roll(base[k], i, axis=0)
                           for k in ("j2dc", "accc", "oric")})

        def diff_p50(f, a, p):
            jax.block_until_ready(f(a, p, sv_one))
            jax.block_until_ready(f(a, p, sv_two))
            out = []
            for i in range(6):
                s1, s2 = shifted(sv_one, i + 1), shifted(sv_two, i + 1)
                jax.block_until_ready((s1, s2))
                t0 = time.perf_counter()
                jax.block_until_ready(f(a, p, s1))
                t1 = time.perf_counter()
                jax.block_until_ready(f(a, p, s2))
                t2 = time.perf_counter()
                if i > 0:
                    out.append(((t2 - t1) - (t1 - t0)) / Ks * 1e3)
            return (float(np.percentile(out, 50)),
                    [round(x, 4) for x in out])

        bf16_p50, bf16_samples = diff_p50(fwd, arrs, pb)
        res = {"device_p50_serve_bf16_ms": round(bf16_p50, 4),
               "serve_bf16_samples": bf16_samples,
               "stream": list(meta["stream"]),
               "parity": parity}

        # int8-resident gate bank: the whole quantized bank lives in VMEM,
        # zero per-frame weight HBM traffic (approximate int8c semantics)
        if time.perf_counter() < deadline:
            from robustcap_tpu.nn.rnn import quantize_params
            import dataclasses
            qp_s = quantize_params(params)
            prep8 = prepare_serve_params(qp_s, int8_gates=True)
            meta8 = {k: prep8[k] for k in ("H", "dtype", "stream")}
            meta8["int8"] = True
            arrs8 = {k: prep8[k] for k in ("ops", "init")}
            cfg8 = dataclasses.replace(cfg, int8_compute=True)

            @jax.jit
            def fwd8(arrs_, p, f):
                frames = sig_mp._sequence_frames(f["j2dc"], f["accc"],
                                                 f["oric"], None, True,
                                                 f["gravityc"][0])
                frame0 = jax.tree.map(lambda x: x[0], frames)
                carry = sig_mp.prescan_first_frame(
                    p, model, sig_mp.init_carry(p), frame0,
                    int8_compute=True)
                poses, trans, _, _ = serve_scan(dict(arrs_, **meta8), model,
                                                cfg8, frames, carry)
                return poses, trans

            sp8 = sig_mp.prepare_scan_params(qp_s, True)
            p8, t8 = fwd8(arrs8, sp8, sv_one)
            # int8 is an APPROXIMATE mode: its quality contract is the
            # end-metric acceptance test (<2mm MPJPE delta,
            # tests/test_quantization.py), not bitwise parity — so the
            # drift vs the bf16 XLA scan is recorded, with only the
            # translation (which integrates every branch decision)
            # bounded as a semantic-divergence tripwire.
            parity8 = _parity_metrics(pa, ta, p8, t8)
            err8 = _bound_parity(parity8, pose_p50_bound=1.0,
                                 tran_bound=INT8_TRAN_BOUND)
            if err8:
                section_errors["pallas_serve_int8_parity"] = err8
            int8_p50, int8_samples = diff_p50(fwd8, arrs8, sp8)
            res["device_p50_serve_int8_ms"] = round(int8_p50, 4)
            res["serve_int8_samples"] = int8_samples
            res["int8_parity"] = parity8

        # live serving: throttled occluded frames skip BOTH wide stacks
        # (and the rnn6 weight DMA) inside the kernel — with live_mode's
        # conf_range the uniform(0.3, 1) confidences are ~79% occluded
        if time.perf_counter() < deadline:
            import dataclasses
            cfgl = SigMPConfig.live_mode()

            @jax.jit
            def fwdl(arrs_, p, f):
                frames = sig_mp._sequence_frames(f["j2dc"], f["accc"],
                                                 f["oric"], None, True,
                                                 f["gravityc"][0])
                frame0 = jax.tree.map(lambda x: x[0], frames)
                carry = sig_mp.prescan_first_frame(
                    p, model, sig_mp.init_carry(p), frame0)
                poses, trans, _, _ = serve_scan(dict(arrs_, **meta), model,
                                                cfgl, frames, carry)
                return poses, trans

            live_p50, live_samples = diff_p50(fwdl, arrs, pb)
            res["device_p50_serve_live_bf16_ms"] = round(live_p50, 4)
            res["serve_live_samples"] = live_samples
        return res

    serve = None
    if (bench_dtype == "f32" and os.environ.get("BENCH_SERVE", "1") != "0"
            and time.perf_counter() < deadline):
        serve = guarded("pallas_serve", run_serve)

    # wall-clock per-frame dispatch through the tunnel (context only; the
    # ~30-40 ms RTT of this environment's network-attached TPU dominates)
    def run_tunnel_latency():
        net = sig_mp.StreamingNet(params, model, cfg)
        net.forward_online(j2dc[0, 0], accc[0, 0], oric[0, 0],
                           first_tran=np.zeros(3, np.float32))  # compile
        lat = []
        for t in range(1, 40):
            s = time.perf_counter()
            _, tr = net.forward_online(j2dc[0, t % T], accc[0, t % T],
                                       oric[0, t % T])
            jax.block_until_ready(tr)
            lat.append(time.perf_counter() - s)
        return float(np.percentile(lat, 50) * 1e3)

    tunnel_p50_ms = None
    if (os.environ.get("BENCH_TUNNEL", "1") != "0"
            and time.perf_counter() < deadline):
        tunnel_p50_ms = guarded("tunnel_latency", run_tunnel_latency)

    # -- baseline: the real reference on this host's CPU -------------------
    ref_fps, baseline_kind = _measure_reference_cpu_fps(j2dc, accc, oric)

    # -- SMPLify batched refinement throughput (VERDICT item 2) ------------
    def run_smplify():
        from robustcap_tpu.smplify.runner import _jitted_fit
        from robustcap_tpu.smplify.prior import MaxMixturePrior
        prior = MaxMixturePrior("data/dataset_work", num_gaussians=8)
        fit = _jitted_fit(model, prior, False, 20, 0.001, 1, batched=True)
        Bs, Ts = 16, 128
        aa_s = (rng.randn(Bs * Ts * 24, 3) * 0.2).astype(np.float32)
        pose0 = np.asarray(M.axis_angle_to_rotation_matrix(
            jnp.asarray(aa_s))).reshape(Bs, Ts, 24, 3, 3)
        tran0 = rng.randn(Bs, Ts, 3).astype(np.float32) * 0.1 + [0, 0, 3]
        kp = (rng.randn(Bs, Ts, 33, 3) * 50 + 300).astype(np.float32)
        kp[..., 2] = 0.9
        ori_s = np.broadcast_to(np.eye(3, dtype=np.float32),
                                (Bs, Ts, 6, 3, 3)).copy()
        cam = np.broadcast_to(np.asarray(
            [[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32),
            (Bs, 3, 3)).copy()
        mask = np.ones((Bs, Ts), np.float32)
        args = tuple(jnp.asarray(x) for x in
                     (pose0, tran0, kp, ori_s, cam, mask))
        jax.block_until_ready(fit(*args))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(fit(*args))
        return Bs * Ts / (time.perf_counter() - t0)

    smplify_fps = None
    if (os.environ.get("BENCH_SMPLIFY", "1") != "0"
            and time.perf_counter() < deadline):
        smplify_fps = guarded("smplify", run_smplify)

    # -- training step throughput (VERDICT r2 item 3, r3 item 7) -----------
    # DP train step over a mesh of all attached devices (one chip here;
    # the same code path the 8-device CPU tests and dryrun_multichip
    # exercise), for ALL SIX modules with their real trainer losses:
    # rnn2 = the RNNWithInit path (init-net seeds (h0,c0) from the first
    # label), rnn3 = multi-horizon velocity, rnn4 = the widest (1280),
    # rnn6 = visual translation, rnn7 = the FK-loss head, rnn8 = the
    # pos-weighted-BCE contact head. Match: reference
    # articulate/utils/torch/train.py:15, net/sig_mp.py:301-857.
    def run_train():
        import optax

        from robustcap_tpu.models.sig_mp import RNN_SPECS
        from robustcap_tpu.nn.rnn import init_rnn_params
        from robustcap_tpu.parallel.mesh import make_dp_train_step
        from robustcap_tpu.train.losses import (make_fk_pose_loss,
                                                masked_bce_pos_weight,
                                                masked_mse,
                                                velocity_horizon_loss)
        from robustcap_tpu.train.trainers import make_forward_fn

        import math
        Tt = int(os.environ.get("BENCH_TRAIN_FRAMES", 200))
        Bt = int(os.environ.get("BENCH_TRAIN_BATCH", 256))
        # the data mesh must evenly divide the batch (tiny smoke batches
        # under the 8-virtual-device CPU conftest otherwise can't shard)
        mesh = jax.make_mesh((math.gcd(len(jax.devices()), Bt),), ("data",))
        losses = {"rnn2": masked_mse, "rnn3": velocity_horizon_loss,
                  "rnn4": masked_mse, "rnn6": masked_mse,
                  "rnn7": make_fk_pose_loss(model),
                  "rnn8": masked_bce_pos_weight(np.asarray([1.7, 2.1],
                                                           np.float32))}
        fps = {}
        for name, loss_fn in losses.items():
            if fps and time.perf_counter() > deadline:
                break  # partial coverage beats a blown budget
            i, o, h, dropout, with_init = RNN_SPECS[name]
            p = init_rnn_params(jax.random.PRNGKey(1), i, o, h, 2, with_init)
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adam(1e-4))
            step = make_dp_train_step(
                make_forward_fn(dropout, with_init=with_init), loss_fn,
                tx, mesh)
            opt_state = tx.init(p)
            xs = jnp.asarray(rng.randn(Tt, Bt, i), jnp.float32)
            if name == "rnn8":  # contact labels are per-foot {0,1}
                ys = jnp.asarray(rng.rand(Tt, Bt, o) < 0.5, jnp.float32)
            else:
                ys = jnp.asarray(rng.randn(Tt, Bt, o), jnp.float32)
            init = jnp.asarray(ys[0]) if with_init else None
            lengths = jnp.full((Bt,), Tt, jnp.int32)
            key = jax.random.PRNGKey(2)
            p, opt_state, _ = step(p, opt_state, xs, ys, lengths, init,
                                   key, 1.0)  # compile + warm
            jax.block_until_ready(p)
            t0 = time.perf_counter()
            reps_t = 3
            for _ in range(reps_t):
                p, opt_state, loss = step(p, opt_state, xs, ys, lengths,
                                          init, key, 1.0)
            jax.block_until_ready(p)
            fps[name] = Tt * Bt / ((time.perf_counter() - t0) / reps_t)
        return fps

    train_fps = {}
    if (os.environ.get("BENCH_TRAIN", "1") != "0"
            and time.perf_counter() < deadline):
        train_fps = guarded("train", run_train, default={})

    # -- weight-stationary Pallas inertial path (VERDICT r2 item 1) --------
    # Three numbers, all RTT-free by chained differencing with DISTINCT
    # inputs per rep (the tunnel relay caches identical dispatches):
    #  * standalone rnn2 scan (T steps, B=1): XLA vs the Pallas kernel,
    #  * on-device kernel-vs-scan max|diff| (numerical parity on real HW),
    #  * B=1 chunked serving: standard vs cfg.pallas_inertial per-frame ms.
    def run_pallas():
        from robustcap_tpu.nn.rnn import rnn_scan
        from robustcap_tpu.ops.pallas_lstm import rnn_scan_pallas_chunked

        p2 = params["rnn2"]
        # long enough that the kernel's per-step cost (~µs) resolves above
        # tunnel jitter in the K-vs-2K differencing (at 256 the Pallas run
        # sits under the noise floor and can difference negative)
        Kp = int(os.environ.get("BENCH_PALLAS_FRAMES", 1024))

        def scan_xla(xs):
            return rnn_scan(p2, xs)[0]

        def scan_pl(xs):
            return rnn_scan_pallas_chunked(p2, xs)[0]

        jx_fn, jp_fn = jax.jit(scan_xla), jax.jit(scan_pl)
        reps_p = 5

        def diff_ms_per_step(fn, k):
            xs_k = [jnp.asarray(rng.randn(k, 72) * 0.3, jnp.float32)
                    for _ in range(reps_p)]
            xs_2k = [jnp.asarray(rng.randn(2 * k, 72) * 0.3, jnp.float32)
                     for _ in range(reps_p)]
            # warm both shapes
            jax.block_until_ready(fn(xs_k[0]))
            jax.block_until_ready(fn(xs_2k[0]))
            out = []
            for i in range(reps_p):
                t0 = time.perf_counter()
                float(fn(xs_k[i]).sum())      # scalar fetch forces exec
                t1 = time.perf_counter()
                float(fn(xs_2k[i]).sum())
                t2 = time.perf_counter()
                out.append(((t2 - t1) - (t1 - t0)) / k * 1e3)
            return float(np.percentile(out, 50))

        parity = float(jnp.abs(
            jp_fn(xs := jnp.asarray(rng.randn(Kp, 72) * 0.3, jnp.float32))
            - jx_fn(xs)).max())
        xla_ms = diff_ms_per_step(jx_fn, Kp)
        # the kernel's per-step cost is 10-30x smaller than the XLA scan's
        # (~1 µs), so its K-vs-2K signal needs 4x the steps to resolve above
        # tunnel jitter — at Kp=1024 the median difference can land negative
        pl_ms = diff_ms_per_step(jp_fn, 4 * Kp)

        # B=1 chunked serving end to end (chunks slice the T-frame data
        # pool, so the chunk length is capped at T//2 independently of the
        # standalone probe's generated-data length)
        Kc = min(Kp, T // 2)
        chunk_reps = int(os.environ.get("BENCH_CHUNK_REPS", 9))

        def chunk_ms(c, wparams):
            r"""(p50, per-rep samples) ms/frame by K-vs-2K differencing with
            distinct inputs per rep. Samples are recorded in the artifact
            (VERDICT r3 item 3): the round-2/3 driver runs disagreed on the
            chunk contest's winner, so the spread is now first-class."""
            net = sig_mp.StreamingNet(wparams, model, c)
            net.forward_online(j2dc[0, 0], accc[0, 0], oric[0, 0],
                               first_tran=np.zeros(3, np.float32),
                               first_frame=True)  # clears first_reach
            K1, K2 = Kc, 2 * Kc
            # warm both compiled chunk programs
            net.forward_chunk(j2dc[0, :K1], accc[0, :K1], oric[0, :K1])
            net.forward_chunk(j2dc[0, :K2], accc[0, :K2], oric[0, :K2])
            out = []
            # one extra leading rep: the first post-warmup differencing pair
            # consistently carries a relay/cache transient (negative or wild
            # samples in the r4 run artifacts) — prime it, publish the rest
            for i in range(chunk_reps + 1):
                a = (i + 1) % T
                sl1 = np.roll(j2dc[0], a, 0)[:K1], \
                    np.roll(accc[0], a, 0)[:K1], np.roll(oric[0], a, 0)[:K1]
                sl2 = np.roll(j2dc[0], a, 0)[:K2], \
                    np.roll(accc[0], a, 0)[:K2], np.roll(oric[0], a, 0)[:K2]
                t0 = time.perf_counter()
                _, tr = net.forward_chunk(*sl1)
                float(jnp.asarray(tr).sum())
                t1 = time.perf_counter()
                _, tr = net.forward_chunk(*sl2)
                float(jnp.asarray(tr).sum())
                t2 = time.perf_counter()
                if i > 0:
                    out.append(((t2 - t1) - (t1 - t0)) / K1 * 1e3)
            return (float(np.percentile(out, 50)),
                    [round(x, 5) for x in out])

        res = {
            "rnn2_xla_ms_per_step": round(xla_ms, 5),
            "rnn2_pallas_ms_per_step": round(pl_ms, 5),
            "kernel_vs_scan_max_abs_diff": round(parity, 6),
        }
        if bench_dtype == "f32" and time.perf_counter() < deadline:
            from robustcap_tpu.nn.rnn import cast_params
            pb16 = cast_params(params, jnp.bfloat16)
            contenders = [
                ("chunk_std", SigMPConfig(), params),
                ("chunk_pallas", SigMPConfig(pallas_inertial=True), params),
            ]
            if os.environ.get("BENCH_SERVE", "1") != "0":
                # the whole-step weight-resident kernel (bf16 — its serving
                # dtype), vs the XLA scan on the same bf16 weights. Gated
                # with the serve section: off-chip (CPU smoke) the kernel
                # runs full-width interpret mode, far too slow
                contenders += [
                    ("chunk_xla_bf16", SigMPConfig(), pb16),
                    ("chunk_serve_bf16", SigMPConfig(pallas_serve=True),
                     pb16),
                ]
            for label, c, wp in contenders:
                if time.perf_counter() > deadline and label != "chunk_std":
                    break
                p50, samples = guarded(f"pallas.{label}",
                                       lambda c=c, wp=wp: chunk_ms(c, wp),
                                       default=(None, None))
                res[f"{label}_ms_per_frame"] = (
                    None if p50 is None else round(p50, 5))
                res[f"{label}_samples"] = samples
        return res

    pallas = None
    if (os.environ.get("BENCH_PALLAS", "1") != "0"
            and time.perf_counter() < deadline):
        pallas = guarded("pallas", run_pallas)

    # -- multi-client serving aggregate (the StreamingMultiplexer's device
    # cost, streaming/multiplex.py): per-tick cost of the vmapped steady
    # step at S concurrent streams, measured RTT-free by K-vs-2K
    # differencing of the batched scan at B=S (the scanned form of the
    # multiplexer's per-tick dispatch). The B=1 serving step is
    # HBM-weight-bound (docs/PERFORMANCE.md), so S streams share one weight
    # read per tick and per-stream cost falls nearly S-fold until the MXU
    # takes over. Runs LAST: a new section must not starve the proven ones.
    def run_multistream():
        from robustcap_tpu.nn.rnn import cast_params
        pb = cast_params(params, jnp.bfloat16)
        S = min(int(os.environ.get("BENCH_STREAMS", 8)), B)

        pool_k, pool_2k = make_frames(B, K), make_frames(B, 2 * K)

        def frames_at(i):
            # distinct inputs per rep (relay caches repeated identical
            # dispatches — CLAUDE.md gotcha): slide an S-row window over
            # the device-resident B-row pool (on-device gather, no re-upload)
            sel = jnp.asarray((np.arange(S) + i) % B)
            return ({k: v[sel] for k, v in pool_k.items()},
                    {k: v[sel] for k, v in pool_2k.items()})
        f_k, f_2k = frames_at(0)
        jax.block_until_ready(batched(pb, f_k))
        jax.block_until_ready(batched(pb, f_2k))
        out = []
        for i in range(6):
            f_k, f_2k = frames_at(i + 1)
            # the window gathers above run async on the device — wait for
            # them, or they execute inside the first timing segment and the
            # differencing goes negative (observed: bench_runs_r04 run8)
            jax.block_until_ready((f_k, f_2k))
            t0 = time.perf_counter()
            jax.block_until_ready(batched(pb, f_k))
            t1 = time.perf_counter()
            jax.block_until_ready(batched(pb, f_2k))
            t2 = time.perf_counter()
            if i > 0:
                out.append(((t2 - t1) - (t1 - t0)) / K * 1e3)
        tick = float(np.percentile(out, 50))
        return {"streams": S, "ms_per_tick_bf16": round(tick, 4),
                "ms_per_stream_bf16": round(tick / S, 4),
                "samples_ms_per_tick": [round(x, 4) for x in out]}

    multistream = None
    if (bench_dtype == "f32"
            and os.environ.get("BENCH_MULTISTREAM", "1") != "0"
            and time.perf_counter() < deadline):
        multistream = guarded("multistream", run_multistream)

    # -- the --pallas-serve chunk-artifact bundle (VERDICT r3 item 2): the
    # K-frame whole-step weight-resident kernel as a serialized Mosaic
    # custom call inside the exported chunk program. Runs LAST: its export
    # lowers the full Pallas serve program through the tunnel (measured
    # 138-215 s — docs/bench_runs_r04), which in a 420 s budget would starve
    # every live kernel measurement if it ran early (it did exactly that to
    # the round-4 full run 3). Starved/failed runs keep the prior proof via
    # the generalized carry-forward (extra.last_good.serving_bundle_chunk).
    def run_bundle_chunk():
        import tempfile
        Kc = int(os.environ.get("BENCH_BUNDLE_CHUNK", 240))
        cdir = tempfile.mkdtemp(prefix="rc_bundle_serve_")
        # serving dtype: the weight-resident kernel runs bf16 (the f32
        # bank would double the VMEM plan) — cast before export so the
        # bundle's weights.pkl rebuilds the bf16 operand bank
        ok_c, reason_c, export_s_c = export_sub(
            cdir, {"pre": ("import jax.numpy as jnp\n"
                           "from robustcap_tpu.nn.rnn import "
                           "cast_params\n"
                           "params = cast_params(params, "
                           "jnp.bfloat16)\n"),
                   "cfg": "pallas_serve=True",
                   "kw": ", chunk_len=%d" % Kc},
            min(300.0, max(90.0, deadline - time.perf_counter())))
        chunk = {"export_ok": ok_c,
                 "export_seconds": round(export_s_c, 1),
                 "reason": reason_c, "chunk_len": Kc}
        if ok_c:
            try:
                from robustcap_tpu.serving import ServingBundle
                sbc = ServingBundle.load(cdir)
                sbc.forward_online(j2dc[0, 0], accc[0, 0], oric[0, 0],
                                   first_tran=np.zeros(3, np.float32),
                                   first_frame=True)
                lat = []
                for i in range(3):
                    a = (i * Kc + 1) % (T - Kc)
                    s = time.perf_counter()
                    _, tr = sbc.forward_chunk(
                        j2dc[0, a:a + Kc], accc[0, a:a + Kc],
                        oric[0, a:a + Kc])
                    jax.block_until_ready(tr)
                    lat.append((time.perf_counter() - s) / Kc * 1e3)
                chunk["load_run_ok"] = True
                # one whole-chunk dispatch per K frames: RTT amortized,
                # so wall-clock per frame is an honest serving number
                chunk["dispatch_ms_per_frame"] = round(
                    float(np.percentile(lat, 50)), 4)
            except Exception as e:  # noqa: BLE001 - report, don't die
                chunk["load_run_ok"] = False
                chunk["reason"] = f"{type(e).__name__}: {e}"[:400]
        return chunk

    bundle_chunk = None
    if (os.environ.get("BENCH_BUNDLE_SERVE", "1") != "0"
            and bundle is not None and bundle.get("export_ok")
            and deadline - time.perf_counter() > 60):
        bundle_chunk = guarded("serving_bundle_chunk", run_bundle_chunk)

    watchdog.cancel()
    result = {
        "metric": "aist_batched_eval_throughput",
        "value": round(batched_fps, 1),
        "unit": "frames/sec",
        # headline multiplier vs the PINNED healthy-host reference number
        # (VERDICT r3 item 5) — no longer a function of VM degradation
        "vs_baseline": round(batched_fps / PINNED_BASELINE_FPS, 2),
        "device_p50_ms": round(device_p50_ms, 4),
        "extra": {
            "baseline_fps_pinned": PINNED_BASELINE_FPS,
            "baseline_fps_live": round(ref_fps, 2),
            "vs_baseline_live": round(batched_fps / ref_fps, 2),
            "baseline_kind": baseline_kind,
            "device_step_method": "chained-scan differencing (RTT-free)",
            "device_p50_bf16_ms": (None if device_p50_bf16_ms is None
                                   else round(device_p50_bf16_ms, 4)),
            "tunnel_per_dispatch_p50_ms": (
                None if tunnel_p50_ms is None else round(tunnel_p50_ms, 3)),
            "smplify_refine_fps": (None if smplify_fps is None
                                   else round(smplify_fps, 1)),
            "int8c_fps": (None if int8c_fps is None else round(int8c_fps, 1)),
            "batched_bf16_fps": (None if batched_bf16_fps is None
                                 else round(batched_bf16_fps, 1)),
            "train_fps": ({k: round(v, 1) for k, v in train_fps.items()}
                          or None),
            "pallas": pallas,
            "multistream": multistream,
            "pallas_tail": tail,
            "pallas_serve": serve,
            "serving_bundle": bundle,
            "serving_bundle_chunk": bundle_chunk,
            "serving_dtype": bench_dtype,
            "section_errors": section_errors or None,
            "section_seconds": section_seconds or None,
            "batch": B, "frames": T,
            "device": str(jax.devices()[0]),
        },
    }
    # TPU runs only: a CPU run (tunnel-down fallback, or the CI smoke
    # driving main() at tiny sizes) must neither store its numbers as
    # "proven" nor dress a CPU artifact with chip evidence
    if "TPU" in result["extra"]["device"]:
        try:
            _carry_forward_sections(result["extra"], os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".bench_last_good_sections.json"))
        except Exception as e:  # noqa: BLE001 - provenance is best-effort
            result["extra"]["last_good_error"] = (
                f"{type(e).__name__}: {e}"[:200])
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the driver needs its line
        if not isinstance(e, SystemExit):
            print(json.dumps({
                "metric": "aist_batched_eval_throughput", "value": 0,
                "unit": "frames/sec", "vs_baseline": 0,
                "error": f"{type(e).__name__}: {e}"[:400]}), flush=True)
        raise
