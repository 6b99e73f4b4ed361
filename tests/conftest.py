r"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so data-parallel sharding is
exercised without TPU hardware (SURVEY.md §4f). Must be set before jax import.
"""

import os

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (single
# tunneled TPU); concurrent test processes would contend for it. Unit tests
# must run on the virtual CPU mesh; only bench.py touches the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap the CPU codegen ISA: live-migrated VMs can advertise AVX512/AMX in
# /proc/cpuinfo while the vCPU faults on them — LLVM then SEGFAULTS inside
# backend_compile_and_load on the big scan programs (observed on this
# environment after a mid-session host migration). AVX2 is universally safe
# and these are correctness tests, not CPU benchmarks.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize registers a tunneled TPU backend and
# overrides jax_platforms via jax.config.update, which beats the env var —
# re-override here so tests really run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite compiles many large scan graphs;
# caching makes re-runs and parallel test shards dramatically faster.
#
# Hazard (observed in this environment): after a VM live-migration the
# XLA:CPU executable serializer repeatedly SEGFAULTED in
# put_executable_and_time on the largest scan program (with stale AND
# fresh caches, with and without the ISA cap), and stale-cache reads
# stalled the whole suite. The persistent cache is therefore OPT-IN
# (ROBUSTCAP_JAX_CACHE=1): correctness runs work everywhere without it;
# enable it on a known-healthy host for faster re-runs. The
# machine-signature sentinel below wipes a cache built on a different
# host generation when the cache is enabled.
# ---------------------------------------------------------------------------
# Quick smoke tier: `pytest -m quick` (~2-3 min on a healthy host).
#
# Whole modules are marked rather than individual tests: the expensive unit is
# the module-scoped fixture compile (scan programs, the torch reference
# harness), so a module is either cheap or it isn't. The list below is the
# cheap-but-load-bearing core — small-width configs, no torch-reference
# compile, no full-width scans. `tools/run_suite_sharded.sh --quick` runs the
# same set one process per module.
# ---------------------------------------------------------------------------
QUICK_MODULES = {
    "test_math_angular",
    "test_math_spatial",
    "test_smpl_model",
    "test_nn_rnn",
    "test_sig_mp_step",
    "test_golden",
    "test_evaluators",
    "test_filters_compat",
    "test_preprocess",
    "test_smooth_bbox",
    "test_streaming",
    "test_doc_claims",
}

# ---------------------------------------------------------------------------
# Core verification tier: `pytest -m core` (VERDICT r3 item 6).
#
# The strongest per-round evidence at a budget a degraded (1-vCPU) host can
# actually complete: the torch-reference cross-parity of the flagship step,
# the regenerable golden fixture + explicit-branching oracle, and the Pallas
# serving-kernel agreement suites (CPU interpret mode). Measured wall time
# at 1 vCPU: see docs/PERFORMANCE.md "Verification tiers".
# `tools/run_suite_sharded.sh --core` runs the same set process-isolated.
# ---------------------------------------------------------------------------
CORE_MODULES = {
    "test_sig_mp_step",
    "test_golden",
    "test_reference_parity",
    "test_pallas_tail",
    "test_pallas_serve",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        if item.module.__name__ in CORE_MODULES:
            item.add_marker(pytest.mark.core)


_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
if os.environ.get("ROBUSTCAP_JAX_CACHE", "0") == "1":
    import hashlib

    def _machine_signature() -> str:
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        return hashlib.sha1(line.encode()).hexdigest()[:16]
        except OSError:
            pass
        import platform
        return platform.processor() or "unknown"

    _sig_file = os.path.join(_cache_dir, "MACHINE_SIGNATURE")
    _sig = _machine_signature()
    if os.path.isdir(_cache_dir):
        try:
            old = open(_sig_file).read()
        except OSError:
            old = ""
        if old != _sig:
            import shutil
            shutil.rmtree(_cache_dir, ignore_errors=True)
    os.makedirs(_cache_dir, exist_ok=True)
    with open(_sig_file, "w") as f:
        f.write(_sig)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
