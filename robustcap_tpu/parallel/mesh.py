r"""Device-mesh utilities: data-parallel sharding for eval and training.

The reference is single-process/single-device (SURVEY.md §2.3); the TPU
rebuild scales along one axis — **data** — because the model (~60 M params)
is far smaller than a chip's HBM. Weights are replicated; sequence batches
shard over ``data``; gradients/metrics reduce with ``psum`` over ICI.

``make_dp_train_step`` builds an SPMD training step with
``shard_map``-style sharding via jit in/out shardings: inputs sharded on the
batch axis, parameters replicated, gradient all-reduce inserted by XLA.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_batch", "make_dp_train_step"]


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    r"""1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh, axis: int = 0, axis_name: str = "data"):
    r"""Place a pytree of arrays with dimension ``axis`` sharded over the
    mesh's data axis."""
    def put(x):
        spec = [None] * x.ndim
        spec[axis] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, tree)


def make_dp_train_step(forward_fn: Callable, loss_fn: Callable, tx,
                       mesh: Mesh, axis_name: str = "data",
                       batch_axis: int = 1):
    r"""Data-parallel train step: params replicated, batch sharded.

    ``forward_fn(params, xs, lengths, init, rng)``/``loss_fn(out, ys,
    lengths)`` as in ``robustcap_tpu.train.loop``. XLA inserts the gradient
    all-reduce (psum over ICI) from the sharding constraints; no manual
    collectives needed.
    """
    repl = NamedSharding(mesh, P())

    def spec_for(x):
        s = [None] * x.ndim
        if x.ndim > batch_axis:
            s[batch_axis] = axis_name
        return NamedSharding(mesh, P(*s))

    def step(params, opt_state, xs, ys, lengths, init, rng, scale=1.0):
        def compute(p):
            out = forward_fn(p, xs, lengths, init, rng)
            return loss_fn(out, ys, lengths)

        loss, grads = jax.value_and_grad(compute)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * scale, updates)
        return optax.apply_updates(params, updates), opt_state, loss

    def jit_step(params, opt_state, xs, ys, lengths, init, rng, scale=1.0):
        xs_s = jax.device_put(xs, spec_for(xs))
        ys_s = jax.device_put(ys, spec_for(ys))
        lengths_s = jax.device_put(
            lengths, NamedSharding(mesh, P(axis_name)))
        init_s = (None if init is None else
                  jax.device_put(init, NamedSharding(mesh, P(axis_name))))
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        return _compiled(params, opt_state, xs_s, ys_s, lengths_s, init_s,
                         rng, jnp.asarray(scale, jnp.float32))

    _compiled = jax.jit(step, out_shardings=(repl, repl, repl))
    return jit_step
