r"""Quantized-serving quality contracts: end-metric acceptance helpers.

The int8 serving modes are APPROXIMATE (dynamic activation quantization,
int8xint8->int32 gate matmuls), so their quality contract is not bitwise
parity but a bounded delta on the END metrics (MPJPE/PVE/PA-MPJPE) through
the actual eval pipeline — the same contract the CI asserts
(tests/test_quantization.py::TestEndMetricAcceptance) and the driver bench
asserts on-chip each round (bench.py, extra.pallas_serve.int8_end_metric_*;
VERDICT r4 item 3).

This module is the one definition of that measurement, shared by
``tools/quant_report.py`` (full report) and ``bench.py`` (trimmed fixture).
Reference counterpart: none — the torch reference has no quantized modes;
the metric aggregation it feeds is ``/root/reference/evaluate.py:83-109``.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

import jax.numpy as jnp

from ..config import SigMPConfig
from ..models import sig_mp

__all__ = ["serve_end_metric_deltas"]


def serve_end_metric_deltas(params, model, eval_frames: int = 64,
                            n_seq: int = 1, n_cam: int = 2,
                            modes=("int8",), seed: int = 5):
    r"""MPJPE/PVE/PA-MPJPE deltas (mm) of the Pallas serving kernel modes
    against the f32 XLA scan, through the real eval aggregation.

    Trajectories come from the B=1 ``forward_offline`` path for BOTH sides
    (the batch builders strip ``pallas_serve``, so the kernel cannot run
    under ``evaluate_sequences`` directly); scoring reuses the REAL eval
    aggregation via its result2 cache-loading branch — identical metric
    code, identical fixture corpus, only the forward program differs.

    ``modes``: any of ``"bf16"`` (cast weights, exact-mode kernel) and
    ``"int8"`` (int8-resident gate bank, approximate int8c semantics).
    Returns ``{"f32_mm": {...}, "pallas_serve_<mode>_delta_mm": {...}}``
    with all values in millimeters.
    """
    import torch

    from ..nn.rnn import cast_params, quantize_params
    from ..preprocess import build_fixture_dataset
    from .datasets import build_aist_sequences
    from .evaluate import evaluate_sequences

    ds = build_fixture_dataset(model, n_seq=n_seq, T=eval_frames,
                               n_cam=n_cam, seed=seed)
    seqs = build_aist_sequences(ds, num_cameras=n_cam)

    def run_and_score(p, cfg):
        pose_p, tran_p = [], []
        for s in seqs:
            pose, tran = sig_mp.forward_offline(
                p, model, cfg, s.j2dc, s.accc, s.oric,
                first_tran=s.first_tran, first_frame=s.first_frame,
                gravityc=s.gravityc)
            pose_p.append(torch.from_numpy(np.array(pose, np.float32)))
            tran_p.append(torch.from_numpy(np.array(tran, np.float32)))
        with tempfile.TemporaryDirectory() as td:
            cache = os.path.join(td, "result2.pt")
            torch.save([pose_p, tran_p], cache)
            out = evaluate_sequences(seqs, model=model, cache_path=cache,
                                     pad_to_multiple=eval_frames)
        return {k: float(out[k]) for k in ("mpjpe", "pve", "pampjpe")}

    m_f = run_and_score(params, SigMPConfig())

    def delta_mm(m):
        return {k: round((m[k] - m_f[k]) * 1e3, 4) for k in m_f}

    res = {"f32_mm": {k: round(v * 1e3, 3) for k, v in m_f.items()}}
    for mode in modes:
        if mode == "bf16":
            m = run_and_score(cast_params(params, jnp.bfloat16),
                              SigMPConfig(pallas_serve=True))
        elif mode == "int8":
            m = run_and_score(quantize_params(params),
                              SigMPConfig(pallas_serve=True,
                                          int8_compute=True))
        else:
            raise ValueError(f"unknown serve mode {mode!r}")
        res[f"pallas_serve_{mode}_delta_mm"] = delta_mm(m)
    return res
