r"""Batched live-stream multiplexer: N concurrent capture sessions, one
vmapped step per tick.

The reference serves exactly one subject per process (live_server.py). On a
TPU the per-step cost is dominated by weight reads, so stepping N streams
batched costs barely more than one: this service multiplexes up to
``capacity`` independent streaming sessions into a single vmapped fused-step
dispatch, with per-slot reset (a new subject joins without disturbing
others).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SigMPConfig
from ..models import sig_mp
from ..smpl.model import ParametricModel

__all__ = ["StreamingMultiplexer"]


class StreamingMultiplexer:
    r"""Fixed-capacity batch of independent streaming sessions."""

    def __init__(self, params, body_model: ParametricModel,
                 cfg: Optional[SigMPConfig] = None, capacity: int = 8):
        self.params = params
        self.cfg = cfg or SigMPConfig.live_mode()
        self.capacity = capacity
        # steady single-eval step for every tick; first-frame work runs in a
        # vmapped prescan dispatched only on ticks where some slot starts a
        # session (prescan_first_frame is masked per-row on frame["first_frame"])
        step = sig_mp.make_step(body_model, self.cfg,
                                include_first_frame_step=False)

        @partial(jax.jit, donate_argnums=(1,))
        def step_all(params, carries, frames):
            return jax.vmap(lambda c, f: step(params, c, f),
                            in_axes=(0, 0))(carries, frames)

        @partial(jax.jit, donate_argnums=(1,))
        def prescan_all(params, carries, frames):
            return jax.vmap(
                lambda c, f: sig_mp.prescan_first_frame(
                    params, body_model, c, f,
                    int8_compute=self.cfg.int8_compute),
                in_axes=(0, 0))(carries, frames)

        self._step_all = step_all
        self._prescan_all = prescan_all
        single = sig_mp.init_carry(params)
        self._fresh = single
        self.carries = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (capacity,) + x.shape).copy(),
            single)
        self.active = np.zeros(capacity, bool)

    # -- session management --------------------------------------------------

    def open_slot(self) -> int:
        r"""Claim a free slot for a new subject (state reset)."""
        free = np.where(~self.active)[0]
        if len(free) == 0:
            raise RuntimeError("multiplexer full")
        slot = int(free[0])
        self.reset_slot(slot)
        self.active[slot] = True
        return slot

    def close_slot(self, slot: int):
        self.active[slot] = False

    def reset_slot(self, slot: int):
        self.carries = jax.tree.map(
            lambda b, s: b.at[slot].set(s), self.carries, self._fresh)

    # -- the tick -------------------------------------------------------------

    def step(self, j2dc: np.ndarray, accc: np.ndarray, oric: np.ndarray,
             first_frame: Optional[np.ndarray] = None,
             gravityc: Optional[np.ndarray] = None):
        r"""Advance every slot one frame.

        j2dc [N, 33, 3], accc [N, 6, 3], oric [N, 6, 3, 3] (rows of inactive
        slots can hold anything). Returns (pose [N, 24, 3, 3], tran [N, 3]).
        """
        N = self.capacity
        frames = {
            "j2dc": jnp.asarray(j2dc, jnp.float32).reshape(N, 33, 3),
            "accc": jnp.asarray(accc, jnp.float32).reshape(N, 6, 3),
            "oric": jnp.asarray(oric, jnp.float32).reshape(N, 6, 3, 3),
            "first_tran": jnp.zeros((N, 3), jnp.float32),
            "first_tran_valid": jnp.zeros((N,), bool),
            "first_frame": (jnp.zeros((N,), bool) if first_frame is None
                            else jnp.asarray(first_frame, bool)),
            "gravityc": (jnp.broadcast_to(
                jnp.asarray(sig_mp.DEFAULT_GRAVITY), (N, 3))
                if gravityc is None
                else jnp.asarray(gravityc, jnp.float32).reshape(N, 3)),
        }
        if first_frame is not None and np.any(first_frame):
            self.carries = self._prescan_all(self.params, self.carries,
                                             frames)
        self.carries, (pose, tran) = self._step_all(self.params,
                                                    self.carries, frames)
        return np.asarray(pose), np.asarray(tran)
