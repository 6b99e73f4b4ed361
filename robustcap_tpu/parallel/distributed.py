r"""Multi-host (DCN) wiring: jax.distributed initialization + process-local
dataset sharding.

The reference is single-process (SURVEY.md §2.3); one-host DP is where the
round-1 rebuild stopped. This module extends the same data-parallel design
across hosts:

* :func:`initialize_distributed` — gated wrapper over
  ``jax.distributed.initialize``: activates only when a coordinator is
  configured (arguments or ``ROBUSTCAP_COORDINATOR`` / ``JAX_COORDINATOR_
  ADDRESS`` env vars, the flag-behind behavior); otherwise the process runs
  single-host and everything below degenerates to the local mesh,
* :func:`make_global_mesh` — 1-D ``data`` mesh over ALL processes' devices
  (gradient all-reduce rides ICI within a host and DCN across hosts, both
  inserted by XLA from the same shardings as the single-host path),
* :func:`dataset_shard_indices` / :func:`process_local_batch` — each
  process loads and assembles ONLY its slice of the global sequence batch;
  :func:`global_batch_from_local` stitches per-process local arrays into
  one globally-sharded array (``jax.make_array_from_process_local_data``)
  that feeds the unchanged DP train/eval steps.

Single-process semantics are exact special cases (process_count=1), so the
whole path is CPU-testable on the virtual 8-device mesh.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DistContext", "initialize_distributed", "make_global_mesh",
           "dataset_shard_indices", "process_local_batch",
           "global_batch_from_local"]

_INITIALIZED = False


@dataclass(frozen=True)
class DistContext:
    r"""What this process knows about the job after (non-)initialization."""
    enabled: bool
    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> DistContext:
    r"""Initialize multi-host JAX when a coordinator is configured.

    Resolution order: explicit arguments, then ``ROBUSTCAP_COORDINATOR`` /
    ``ROBUSTCAP_NUM_PROCESSES`` / ``ROBUSTCAP_PROCESS_ID`` env vars, then
    JAX's own ``JAX_COORDINATOR_ADDRESS`` convention. With none of them the
    call is a no-op and the job is single-process (the flag-gated behavior —
    local runs and tests never touch the distributed runtime). Idempotent.
    """
    global _INITIALIZED
    coordinator_address = (coordinator_address
                           or os.environ.get("ROBUSTCAP_COORDINATOR")
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address and not _INITIALIZED:
        # honor the ROBUSTCAP_* overrides, but when unset leave the values
        # as None so jax.distributed.initialize applies its OWN env-var
        # resolution (JAX_NUM_PROCESSES / JAX_PROCESS_ID) — defaulting to
        # 1/0 here would make every host of a standard JAX multi-host
        # launch initialize as process 0 of 1
        if num_processes is None:
            env = os.environ.get("ROBUSTCAP_NUM_PROCESSES")
            num_processes = int(env) if env is not None else None
        if process_id is None:
            env = os.environ.get("ROBUSTCAP_PROCESS_ID")
            process_id = int(env) if env is not None else None
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _INITIALIZED = True
    return DistContext(
        enabled=_INITIALIZED,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def make_global_mesh(axis_name: str = "data") -> Mesh:
    r"""1-D data mesh over every device of every process. On one host this
    is exactly ``make_mesh()``; across hosts the same shardings make XLA
    place the gradient all-reduce on ICI within hosts and DCN between."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def dataset_shard_indices(n_items: int, process_index: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    r"""Deterministic partition of dataset item indices across processes:
    process p takes items p, p + P, p + 2P, ... (strided, so sequence-length
    distributions stay balanced across hosts)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return np.arange(process_index, n_items, process_count)


def process_local_batch(global_batch_size: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    r"""This process's contiguous row slice of a [global_batch, ...] array
    (rows are laid out process-major so the global array's data axis matches
    device order)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    assert global_batch_size % process_count == 0, (
        f"global batch {global_batch_size} must divide process count "
        f"{process_count}")
    per = global_batch_size // process_count
    return slice(process_index * per, (process_index + 1) * per)


def global_batch_from_local(local_tree, mesh: Mesh, axis: int = 0,
                            axis_name: str = "data"):
    r"""Assemble a globally-sharded array from each process's LOCAL rows.

    ``local_tree`` holds this process's slice (shape [global/az P, ...]);
    the result is a jax.Array with global shape whose shards live on the
    local devices — no cross-host data movement. Feeds the unchanged DP
    train/eval steps. Single-process this equals ``shard_batch``.
    """
    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[axis] = axis_name
        sharding = NamedSharding(mesh, P(*spec))
        global_shape = list(x.shape)
        global_shape[axis] = x.shape[axis] * jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape))

    return jax.tree.map(put, local_tree)
