r"""bench.py smoke: the driver's round-end measurement must always emit one
well-formed JSON line, whatever subset of sections runs. CPU, tiny sizes."""

import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def bench_env(monkeypatch):
    for k, v in {
        "BENCH_BATCH": "2", "BENCH_FRAMES": "8", "BENCH_SEQ_FRAMES": "4",
        "BENCH_SMPLIFY": "0", "BENCH_INT8C": "0", "BENCH_TRAIN": "0",
        "BENCH_PALLAS": "0", "BENCH_BUNDLE": "0",
        # the fused tail/serve kernel sections compile full-width interpret
        # programs — far too slow for a CPU smoke (their correctness lives
        # in tests/test_pallas_tail.py / test_pallas_serve.py)
        "BENCH_TAIL": "0", "BENCH_SERVE": "0",
        # ungated-by-default timing extras: each costs a scan compile that
        # eats the smoke deadline on degraded 1-vCPU hosts
        "BENCH_P50_BF16": "0", "BENCH_TUNNEL": "0", "BENCH_MULTISTREAM": "0",
        "BENCH_DEADLINE_S": "200", "BENCH_HARD_DEADLINE_S": "900",
    }.items():
        monkeypatch.setenv(k, v)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    yield monkeypatch


def _run_main():
    import bench
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().strip().splitlines() if ln]
    return json.loads(lines[-1])


def test_emits_one_json_line_with_required_fields(bench_env):
    out = _run_main()
    assert out["metric"] == "aist_batched_eval_throughput"
    assert out["value"] > 0 and out["unit"] == "frames/sec"
    assert "vs_baseline" in out and "device_p50_ms" in out
    extra = out["extra"]
    for key in ("baseline_fps_pinned", "baseline_fps_live",
                "vs_baseline_live", "baseline_kind", "train_fps", "pallas",
                "serving_bundle", "serving_bundle_chunk", "int8c_fps",
                "serving_dtype", "section_seconds", "sections_skipped"):
        assert key in extra
    # the headline multiplier divides by the PINNED healthy-host baseline
    # (VERDICT r3 item 5), so it cannot move with VM degradation
    import bench
    assert out["vs_baseline"] == round(out["value"]
                                       / bench.PINNED_BASELINE_FPS, 2)


def test_every_skipped_section_records_why(bench_env):
    r"""VERDICT r4 weak 4: a null section must be distinguishable between
    'failed' (section_errors), 'disabled' and 'starved' (sections_skipped)
    from the JSON alone."""
    out = _run_main()
    extra = out["extra"]
    skipped = extra["sections_skipped"]
    # env-disabled sections carry the disable reason
    for name, env_key in (("smplify_refine_fps", "BENCH_SMPLIFY"),
                          ("train_fps", "BENCH_TRAIN"),
                          ("pallas", "BENCH_PALLAS"),
                          ("serving_bundle", "BENCH_BUNDLE"),
                          ("pallas_serve", "BENCH_SERVE"),
                          ("multistream", "BENCH_MULTISTREAM")):
        assert skipped[name] == f"disabled: {env_key}=0"
    # the chunk bundle records its unmet prerequisite
    assert "prerequisite" in skipped["serving_bundle_chunk"]
    # nothing is null without a recorded reason or error
    for name in bench_sections_nullable():
        if extra.get(name) in (None, {}):
            assert name in skipped or name in (extra["section_errors"]
                                               or {}), name


def bench_sections_nullable():
    import bench
    return bench._CARRIED_SECTIONS


def test_train_section_reports_all_six_modules(bench_env):
    bench_env.setenv("BENCH_TRAIN", "1")
    bench_env.setenv("BENCH_TRAIN_FRAMES", "6")
    bench_env.setenv("BENCH_TRAIN_BATCH", "4")
    # the execution plan's per-section budget floors (want()) would skip
    # the section when a degraded 1-vCPU host burns the default smoke
    # deadline on the core compiles — this test is about COVERAGE, not time
    bench_env.setenv("BENCH_DEADLINE_S", "900")
    out = _run_main()
    tf = out["extra"]["train_fps"]
    assert set(tf) == {"rnn2", "rnn3", "rnn4", "rnn6", "rnn7", "rnn8"}
    assert all(v > 0 for v in tf.values())


def test_pallas_section_reports_parity_and_timings(bench_env):
    bench_env.setenv("BENCH_PALLAS", "1")
    bench_env.setenv("BENCH_PALLAS_FRAMES", "4")
    bench_env.setenv("BENCH_DEADLINE_S", "900")  # see train test above
    out = _run_main()
    pl = out["extra"]["pallas"]
    assert pl["kernel_vs_scan_max_abs_diff"] < 1e-3
    assert pl["rnn2_pallas_ms_per_step"] > 0
    assert pl["rnn2_xla_ms_per_step"] > 0
    assert pl["chunk_std_ms_per_frame"] > 0
    assert pl["chunk_pallas_ms_per_frame"] > 0
    # the per-rep spread is first-class in the artifact (VERDICT r3 item 3)
    assert len(pl["chunk_std_samples"]) == len(pl["chunk_pallas_samples"])
    assert pl["chunk_std_samples"], "samples must be recorded"
    # the serve contenders are gated with BENCH_SERVE (off in this smoke:
    # full-width interpret mode on CPU)
    assert "chunk_serve_bf16_ms_per_frame" not in pl


def test_multistream_section_reports_per_stream_cost(bench_env):
    bench_env.setenv("BENCH_MULTISTREAM", "1")
    # on a degraded 1-vCPU host the fixture's 200 s soft deadline can
    # expire before the plan reaches this section — not what this test
    # is probing
    bench_env.setenv("BENCH_DEADLINE_S", "900")
    out = _run_main()
    ms = out["extra"]["multistream"]
    # S clamps to the bench batch (2 here): the section measures the
    # vmapped multiplexer tick at B=S, so S can't exceed the data pool
    assert ms["streams"] == 2
    # tick timing itself is differencing noise at smoke sizes on CPU; the
    # smoke asserts the section's structure, the chip asserts the value
    assert isinstance(ms["ms_per_tick_bf16"], float)
    # both fields round the same unrounded tick, so compare with the
    # rounding granularity as tolerance
    assert abs(ms["ms_per_stream_bf16"]
               - ms["ms_per_tick_bf16"] / ms["streams"]) < 1e-3


_SIX = {"rnn2": 1.0, "rnn3": 2.0, "rnn4": 3.0, "rnn6": 4.0, "rnn7": 5.0,
        "rnn8": 6.0}


class TestSectionCarryForward:
    r"""The unified last-good store (rounds 4-5): every optional section's
    proven result persists between runs (committed docs/bench_last_good.json
    in production); a starved run surfaces the prior proof under
    ``extra.last_good`` without touching the null live slot. Round-5
    hardening (ADVICE r4): nested ``*_ok: False`` and negative-timing
    results are failures, partial results neither store nor overwrite, and
    stale proofs are not carried."""

    def test_measured_sections_persist_and_null_ones_carry(self, tmp_path):
        import bench
        state = str(tmp_path / "state.json")
        run1 = {"pallas_serve": {"device_p50_serve_bf16_ms": 0.09},
                "multistream": None, "train_fps": dict(_SIX)}
        bench._carry_forward_sections(run1, state)
        assert "last_good" not in run1  # nothing stored yet for the null

        run2 = {"pallas_serve": None, "multistream": {"streams": 8},
                "train_fps": None}
        bench._carry_forward_sections(run2, state)
        # live null stays null; prior proof adjacent and timestamped
        assert run2["pallas_serve"] is None
        lg = run2["last_good"]
        assert lg["pallas_serve"]["value"] == {
            "device_p50_serve_bf16_ms": 0.09}
        assert lg["train_fps"]["value"] == _SIX
        assert lg["pallas_serve"]["measured_at"]
        assert "multistream" not in lg  # measured live this run

    def test_fresh_measurement_replaces_stored_value(self, tmp_path):
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        bench._carry_forward_sections({"int8c_fps": 1.0}, state)
        bench._carry_forward_sections({"int8c_fps": 2.0}, state)
        assert _json.load(open(state))["int8c_fps"]["value"] == 2.0

    def test_missing_state_file_is_harmless(self, tmp_path):
        import bench
        extra = {"pallas": None}
        bench._carry_forward_sections(extra, str(tmp_path / "none.json"))
        assert "last_good" not in extra

    def test_recorded_failure_neither_stores_nor_blocks_carry(self, tmp_path):
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        good = {"serving_bundle_chunk": {
            "export_ok": True, "load_run_ok": True,
            "dispatch_ms_per_frame": 0.39}}
        bench._carry_forward_sections(good, state)

        # a failed export is a recorded failure, not proof: the stored
        # success must survive AND be carried alongside the live failure
        failed = {"serving_bundle_chunk": {
            "export_ok": False, "load_run_ok": False,
            "reason": "export lowering exceeded 138s"}}
        bench._carry_forward_sections(failed, state)
        assert failed["last_good"]["serving_bundle_chunk"]["value"][
            "dispatch_ms_per_frame"] == 0.39
        assert _json.load(open(state))["serving_bundle_chunk"]["value"][
            "export_ok"] is True

    def test_bundle_export_ok_but_load_failed_still_carries(self, tmp_path):
        r"""ADVICE r4 (low): export_ok=True + load_run_ok=False (chip
        rejects the artifact / tunnel flap during load) is NOT proof — the
        stored full success must be carried, not erased."""
        import bench
        state = str(tmp_path / "state.json")
        good = {"serving_bundle": {"export_ok": True, "load_run_ok": True,
                                   "dispatch_p50_ms": 32.0}}
        bench._carry_forward_sections(good, state)
        half = {"serving_bundle": {"export_ok": True, "load_run_ok": False,
                                   "reason": "tunnel flap during load"}}
        bench._carry_forward_sections(half, state)
        assert half["last_good"]["serving_bundle"]["value"][
            "dispatch_p50_ms"] == 32.0

    def test_nested_parity_failure_is_not_proof(self, tmp_path):
        r"""ADVICE r4 (medium): parity_ok:false nested under res['parity']
        must neither persist as proof nor block carrying the stored one."""
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        good = {"pallas_serve": {"device_p50_serve_bf16_ms": 0.09,
                                 "parity": {"parity_ok": True}}}
        bench._carry_forward_sections(good, state)
        bad = {"pallas_serve": {"device_p50_serve_bf16_ms": 0.08,
                                "parity": {"parity_ok": False}}}
        bench._carry_forward_sections(bad, state)
        assert bad["last_good"]["pallas_serve"]["value"][
            "device_p50_serve_bf16_ms"] == 0.09
        assert _json.load(open(state))["pallas_serve"]["value"][
            "parity"]["parity_ok"] is True

    def test_negative_timing_is_not_proof(self, tmp_path):
        r"""ADVICE r4 (medium): a negative differencing aggregate (cf.
        bench_runs_r04 run8 multistream -0.176 ms/tick) is a transient,
        not proof."""
        import bench
        state = str(tmp_path / "state.json")
        good = {"multistream": {"streams": 8, "ms_per_tick_bf16": 0.134,
                                "samples_ms_per_tick": [0.13, 0.14]}}
        bench._carry_forward_sections(good, state)
        bad = {"multistream": {"streams": 8, "ms_per_tick_bf16": -0.176,
                               "samples_ms_per_tick": [-0.2, -0.18, 0.1]}}
        bench._carry_forward_sections(bad, state)
        assert bad["last_good"]["multistream"]["value"][
            "ms_per_tick_bf16"] == 0.134
        # negative scalar sections are equally not proof
        neg = {"int8c_fps": -5.0}
        bench._carry_forward_sections(neg, state)
        assert "int8c_fps" not in (neg.get("last_good") or {})

    def test_partial_train_fps_neither_stores_nor_overwrites(self, tmp_path):
        r"""ADVICE r4 (medium): train_fps truncated mid-loop by the soft
        deadline is a partial, not proof."""
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        partial = {"train_fps": {"rnn2": 1.0, "rnn3": 2.0}}
        bench._carry_forward_sections(partial, state)
        assert "train_fps" not in _json.load(open(state))

        bench._carry_forward_sections({"train_fps": dict(_SIX)}, state)
        partial2 = {"train_fps": {"rnn2": 9.0}}
        bench._carry_forward_sections(partial2, state)
        assert partial2["last_good"]["train_fps"]["value"] == _SIX
        assert _json.load(open(state))["train_fps"]["value"] == _SIX

    def test_less_complete_fresh_proof_keeps_richer_store(self, tmp_path):
        r"""ADVICE r4 (medium): a proven-but-narrower fresh result (e.g. the
        serve section without its int8/live sub-parts) must not overwrite a
        stored superset; the richer proof is surfaced adjacent instead."""
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        full = {"pallas_serve": {"device_p50_serve_bf16_ms": 0.09,
                                 "device_p50_serve_int8_ms": 0.04}}
        bench._carry_forward_sections(full, state)
        narrow = {"pallas_serve": {"device_p50_serve_bf16_ms": 0.10}}
        bench._carry_forward_sections(narrow, state)
        stored = _json.load(open(state))["pallas_serve"]["value"]
        assert stored["device_p50_serve_int8_ms"] == 0.04
        assert narrow["last_good"]["pallas_serve"]["value"] == stored

    def test_suspect_device_timing_is_not_proof(self, tmp_path):
        r"""A bundle whose differenced device timing failed the
        plausibility floor (relay ack'd without executing — observed
        0.0009 ms "device" samples) records device_timing_ok:false and
        must neither persist nor block carrying the honest stored proof."""
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        good = {"serving_bundle": {"export_ok": True, "load_run_ok": True,
                                   "device_p50_ms": 0.2995}}
        bench._carry_forward_sections(good, state)
        fake = {"serving_bundle": {"export_ok": True, "load_run_ok": True,
                                   "device_p50_ms": None,
                                   "device_timing_ok": False,
                                   "device_timing_note": "below floor"}}
        bench._carry_forward_sections(fake, state)
        assert fake["last_good"]["serving_bundle"]["value"][
            "device_p50_ms"] == 0.2995
        assert _json.load(open(state))["serving_bundle"]["value"][
            "device_p50_ms"] == 0.2995

    def test_stale_stored_proof_is_not_carried(self, tmp_path):
        r"""VERDICT r4 weak 3: a last_good from an earlier round must not
        silently satisfy this one — age-bounded, with the rejection
        recorded."""
        import bench
        import json as _json
        state = str(tmp_path / "state.json")
        old = {"measured_at": "2026-01-01T00:00:00Z",
               "value": {"streams": 8, "ms_per_tick_bf16": 0.1},
               "device": "TPU"}
        with open(state, "w") as fh:
            _json.dump({"multistream": old}, fh)
        skipped = {}
        extra = {"multistream": None}
        bench._carry_forward_sections(extra, state, skipped=skipped)
        assert "multistream" not in (extra.get("last_good") or {})
        assert "stale" in skipped["multistream"]


class TestParityBounds:
    r"""Unit tests for the on-chip parity acceptance helpers (VERDICT r3
    item 4): these gate the driver artifact's kernel sections, so their
    pass/fail logic is CI-guarded here."""

    def _traj(self, seed, scale=1.0):
        import numpy as np
        rng = np.random.RandomState(seed)
        return (rng.randn(8, 24, 3, 3).astype("f") * scale,
                rng.randn(8, 3).astype("f") * scale)

    def test_identical_trajectories_pass(self):
        import bench
        pose, tran = self._traj(0)
        m = bench._parity_metrics(pose, tran, pose.copy(), tran.copy())
        assert bench._bound_parity(m, 0.01, 0.01) is None
        assert m["parity_ok"] and m["bounds"] == {"pose_frame_p50": 0.01,
                                                  "tran_max": 0.01}

    def test_exceeding_bound_fails_with_reason(self):
        import bench
        pose, tran = self._traj(1)
        pose2 = pose + 1.0  # every frame off by 1 -> median trips
        m = bench._parity_metrics(pose, tran, pose2, tran)
        err = bench._bound_parity(m, 0.01, 0.01)
        assert err is not None and "pose_p50" in err
        assert not m["parity_ok"]

    def test_single_frame_blowup_does_not_trip_median(self):
        import bench
        import numpy as np
        pose, tran = self._traj(2)
        pose2 = np.array(pose)
        pose2[3] += 100.0  # one degenerate frame (r6d blow-up pattern)
        m = bench._parity_metrics(pose, tran, pose2, tran)
        assert bench._bound_parity(m, 0.01, 0.01) is None
        assert m["pose_max_abs_diff"] > 50  # recorded, not asserted

    def test_translation_divergence_trips(self):
        import bench
        import numpy as np
        pose, tran = self._traj(3)
        tran2 = np.array(tran)
        tran2[-1] += 0.5  # a flipped branch integrates into tran
        m = bench._parity_metrics(pose, tran, pose, tran2)
        err = bench._bound_parity(m, 0.01, 0.01)
        assert err is not None and "tran_max" in err


class TestWatchdogArtifact:
    r"""A hard-deadline kill mid-section used to print a bare zero line —
    the round artifact lost every completed section AND every stored proof.
    The fallback artifact (bench._watchdog_artifact) must report what
    completed, mark the in-flight/unreached sections as lost, and attach
    the committed proof store's last_good for them (TPU runs only)."""

    def _store(self, tmp_path):
        import json as _json
        state = str(tmp_path / "state.json")
        import time as _time
        now = _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime())
        with open(state, "w") as fh:
            _json.dump({"train_fps": {"measured_at": now,
                                      "value": dict(_SIX),
                                      "device": "TPU v5 lite0"}}, fh)
        return state

    def test_completed_sections_and_store_carry_survive(self, tmp_path):
        import bench
        art = bench._watchdog_artifact(
            core={"batched_fps": 800000.0, "device_p50_ms": 0.31},
            sections={"pallas_serve": {"device_p50_serve_bf16_ms": 0.09}},
            skipped={"int8c_fps": "disabled: BENCH_INT8C=0"},
            device="TPU v5 lite0", store_path=self._store(tmp_path),
            hard_s=560.0, seconds={"pallas_serve": 120.0})
        assert art["value"] == 800000.0 and art["device_p50_ms"] == 0.31
        assert art["vs_baseline"] > 0
        assert "hard deadline" in art["error"]
        e = art["extra"]
        # the measured core rides along as a carried "headline" section
        assert e["headline"] == {"batched_fps": 800000.0,
                                 "device_p50_ms": 0.31}
        # the completed section rides along live
        assert e["pallas_serve"]["device_p50_serve_bf16_ms"] == 0.09
        # the unreached one is marked lost and carried from the store
        assert e["train_fps"] is None
        assert e["sections_skipped"]["train_fps"].startswith("lost:")
        assert e["last_good"]["train_fps"]["value"] == _SIX
        # pre-kill skip reasons are preserved, not overwritten with "lost"
        assert e["sections_skipped"]["int8c_fps"] == "disabled: BENCH_INT8C=0"
        assert e["section_seconds"] == {"pallas_serve": 120.0}

    def test_no_core_measurements_yields_zero_line_with_carry(self, tmp_path):
        import bench
        art = bench._watchdog_artifact(
            core={}, sections={}, skipped={}, device="TPU v5 lite0",
            store_path=self._store(tmp_path), hard_s=560.0)
        assert art["value"] == 0 and art["vs_baseline"] == 0
        assert art["device_p50_ms"] is None
        assert art["extra"]["last_good"]["train_fps"]["value"] == _SIX

    def test_cpu_fallback_does_not_dress_with_chip_proof(self, tmp_path):
        import bench
        art = bench._watchdog_artifact(
            core={}, sections={}, skipped={},
            device="TFRT_CPU_0", store_path=self._store(tmp_path),
            hard_s=560.0)
        assert "last_good" not in art["extra"]

    def test_completed_sections_persist_to_the_store(self, tmp_path):
        import bench
        import json as _json
        state = self._store(tmp_path)
        bench._watchdog_artifact(
            core={}, sections={"int8c_fps": 1300000.0}, skipped={},
            device="TPU v5 lite0", store_path=state, hard_s=560.0)
        assert _json.load(open(state))["int8c_fps"]["value"] == 1300000.0

    def test_headline_is_carried_when_core_never_completed(self, tmp_path):
        r"""A kill BEFORE the headline finishes must surface the last
        proven headline under last_good (the top-level value honestly
        stays 0 — it was not measured this run)."""
        import bench
        state = self._store(tmp_path)
        # run 1: core completed, then killed — headline persists to store
        bench._watchdog_artifact(
            core={"batched_fps": 800000.0, "device_p50_ms": 0.31},
            sections={}, skipped={}, device="TPU v5 lite0",
            store_path=state, hard_s=560.0)
        # run 2: killed before the core — carried headline is the evidence
        art = bench._watchdog_artifact(
            core={}, sections={}, skipped={}, device="TPU v5 lite0",
            store_path=state, hard_s=560.0)
        assert art["value"] == 0
        assert art["extra"]["last_good"]["headline"]["value"] == {
            "batched_fps": 800000.0, "device_p50_ms": 0.31}
