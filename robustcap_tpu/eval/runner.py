r"""Batched offline inference runner: bucketed vmap'd scans, optional
data-parallel sharding over a device mesh.

This replaces the reference's hot loop #1 — the per-frame Python loop over
``net.forward_online`` inside nested sequence/batch loops
(evaluate.py:64-93) — with one ``lax.scan``+``vmap`` launch per length
bucket, sharded over the ``data`` mesh axis when more than one device is
available (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SigMPConfig
from ..models import sig_mp
from ..smpl.model import ParametricModel
from .datasets import EvalSequence, bucket_sequences

__all__ = ["run_sequences", "stack_frames"]


def stack_frames(seqs: List[EvalSequence], pad_len: int,
                 first_tran_mode: str = "gt") -> Dict:
    r"""Stack EvalSequences into one padded [B, T, ...] frame pytree."""
    B = len(seqs)
    out = {
        "j2dc": np.zeros((B, pad_len, 33, 3), np.float32),
        "accc": np.zeros((B, pad_len, 6, 3), np.float32),
        "oric": np.tile(np.eye(3, dtype=np.float32), (B, pad_len, 6, 1, 1)),
        "first_tran": np.zeros((B, pad_len, 3), np.float32),
        "first_tran_valid": np.zeros((B, pad_len), bool),
        "first_frame": np.zeros((B, pad_len), bool),
        "gravityc": np.zeros((B, pad_len, 3), np.float32),
    }
    for b, s in enumerate(seqs):
        T = s.length
        out["j2dc"][b, :T] = s.j2dc
        out["accc"][b, :T] = s.accc
        out["oric"][b, :T] = s.oric
        out["gravityc"][b, :T] = s.gravityc
        out["gravityc"][b, T:] = s.gravityc[-1]
        # keep padded keypoints mid-confidence-free and orientations sane by
        # repeating the final frame (padded outputs are discarded)
        out["j2dc"][b, T:] = s.j2dc[-1]
        out["accc"][b, T:] = s.accc[-1]
        out["oric"][b, T:] = s.oric[-1]
        if first_tran_mode == "gt" and s.first_tran is not None:
            out["first_tran"][b, 0] = s.first_tran
            out["first_tran_valid"][b, 0] = True
        elif first_tran_mode == "first_frame" or s.first_frame:
            out["first_frame"][b, 0] = True
    return {k: jnp.asarray(v) for k, v in out.items()}


def _make_batched_fn(body_model: ParametricModel, cfg: SigMPConfig,
                     mesh: Optional[jax.sharding.Mesh]):
    # big-batch path: keep the speculative-head fusion off (see make_step —
    # it wins ~9% at B=1 but loses to state-stacking traffic at MXU-wide B)
    step = sig_mp.make_step(body_model, cfg, include_first_frame_step=False,
                            fuse_spec_heads=False)

    def run_one(params, frames):
        frame0 = jax.tree.map(lambda x: x[0], frames)
        carry = sig_mp.prescan_first_frame(
            params, body_model, sig_mp.init_carry(params), frame0,
            int8_compute=cfg.int8_compute)
        _, out = jax.lax.scan(partial(step, params), carry, frames)
        return out

    def run_batch(params, frames):
        return jax.vmap(run_one, in_axes=(None, 0))(params, frames)

    if mesh is None:
        return jax.jit(run_batch)

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(replicated, data_sharding),
             out_shardings=data_sharding)
    def run_sharded(params, frames):
        return run_batch(params, frames)

    return run_sharded


def run_sequences(params, body_model: ParametricModel, cfg: SigMPConfig,
                  seqs: List[EvalSequence], first_tran_mode: str = "gt",
                  mesh: Optional[jax.sharding.Mesh] = None,
                  max_bucket: int = 32, pad_to_multiple: int = 128
                  ) -> List[Tuple[np.ndarray, np.ndarray]]:
    r"""Run the fusion net over all sequences; returns per-sequence
    (pose [T, 24, 3, 3], tran [T, 3]) trimmed to true lengths, in input
    order."""
    from ..nn.rnn import prepare_scan_params

    results: List = [None] * len(seqs)
    params = prepare_scan_params(params, cfg.int8_compute)  # hoist dequant
    run = _make_batched_fn(body_model, cfg, mesh)
    n_dev = mesh.devices.size if mesh is not None else 1
    # two-phase: dispatch every bucket first (jax dispatch is async, so the
    # next bucket's host assembly and transfer overlap the previous bucket's
    # compute), then fetch
    pending = []
    for indices, pad_len in bucket_sequences(seqs, max_bucket, pad_to_multiple):
        batch = [seqs[i] for i in indices]
        # pad the batch so it divides the data axis
        while mesh is not None and len(batch) % n_dev != 0:
            batch.append(batch[-1])
        frames = stack_frames(batch, pad_len, first_tran_mode)
        pending.append((indices, run(params, frames)))
    for indices, (pose, tran) in pending:
        pose = np.asarray(pose)
        tran = np.asarray(tran)
        for k, i in enumerate(indices):
            T = seqs[i].length
            results[i] = (pose[k, :T], tran[k, :T])
    return results
