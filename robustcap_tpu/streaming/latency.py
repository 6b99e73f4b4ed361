r"""Streaming latency harness: per-frame p50/p95/p99 of the live step.

The reference targets 60 FPS by construction (SURVEY.md §6); this harness
measures it. Our observability story for the live path: run the jitted
streaming step over a synthetic sensor stream and report the latency
distribution plus an optional ``jax.profiler`` trace.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from ..config import SigMPConfig
from ..models import sig_mp
from ..smpl.model import ParametricModel

__all__ = ["measure_streaming_latency"]


def measure_streaming_latency(params, model: ParametricModel,
                              cfg: Optional[SigMPConfig] = None,
                              n_frames: int = 600, warmup: int = 30,
                              trace_dir: Optional[str] = None,
                              seed: int = 0) -> Dict[str, float]:
    r"""Returns {p50_ms, p95_ms, p99_ms, mean_ms, fps} over ``n_frames``."""
    import jax

    cfg = cfg or SigMPConfig.live_mode()
    net = sig_mp.StreamingNet(params, model, cfg)
    rng = np.random.RandomState(seed)
    j2dc = (rng.randn(n_frames + warmup, 33, 3) * 0.1).astype(np.float32)
    j2dc[..., 2] = rng.uniform(0.3, 1.0, (n_frames + warmup, 1))
    accc = rng.randn(n_frames + warmup, 6, 3).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))

    net.forward_online(j2dc[0], accc[0], eye, first_frame=True)
    for t in range(1, warmup):
        _, tr = net.forward_online(j2dc[t], accc[t], eye)
    jax.block_until_ready(tr)

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    lat = np.empty(n_frames)
    for i in range(n_frames):
        t = warmup + i
        s = time.perf_counter()
        _, tr = net.forward_online(j2dc[t], accc[t], eye)
        jax.block_until_ready(tr)
        lat[i] = time.perf_counter() - s
    if trace_dir:
        jax.profiler.stop_trace()

    return {
        "p50_ms": float(np.percentile(lat, 50) * 1e3),
        "p95_ms": float(np.percentile(lat, 95) * 1e3),
        "p99_ms": float(np.percentile(lat, 99) * 1e3),
        "mean_ms": float(lat.mean() * 1e3),
        "fps": float(1.0 / lat.mean()),
    }
