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
        "BENCH_P50_BF16": "0", "BENCH_TUNNEL": "0",
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
    for key in ("baseline_fps", "baseline_kind", "train_fps", "pallas",
                "serving_bundle", "int8c_fps", "serving_dtype"):
        assert key in extra


def test_train_section_reports_both_heads(bench_env):
    bench_env.setenv("BENCH_TRAIN", "1")
    bench_env.setenv("BENCH_TRAIN_FRAMES", "6")
    bench_env.setenv("BENCH_TRAIN_BATCH", "4")
    out = _run_main()
    tf = out["extra"]["train_fps"]
    assert set(tf) == {"rnn4", "rnn7"}
    assert all(v > 0 for v in tf.values())


def test_pallas_section_reports_parity_and_timings(bench_env):
    bench_env.setenv("BENCH_PALLAS", "1")
    bench_env.setenv("BENCH_PALLAS_FRAMES", "4")
    out = _run_main()
    pl = out["extra"]["pallas"]
    assert pl["kernel_vs_scan_max_abs_diff"] < 1e-3
    assert pl["rnn2_pallas_ms_per_step"] > 0
    assert pl["rnn2_xla_ms_per_step"] > 0
    assert pl["chunk_std_ms_per_frame"] > 0
    assert pl["chunk_pallas_ms_per_frame"] > 0
