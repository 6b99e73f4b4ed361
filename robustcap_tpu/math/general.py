r"""General tensor math utilities (pure JAX).

TPU-native re-implementation of the small helpers the reference keeps in
``articulate/math/general.py`` (reference: general.py:15-103). Everything here
is shape-polymorphic, jit-safe, and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "lerp",
    "normalize_tensor",
    "append_value",
    "append_zero",
    "append_one",
    "vector_cross_matrix",
    "block_diagonal_matrix",
]


def lerp(a, b, t):
    r"""Unclamped linear interpolation: ``a`` at ``t=0``, ``b`` at ``t=1``.

    Reference parity: articulate/math/general.py:15.
    """
    return a * (1 - t) + b * t


def normalize_tensor(x: jnp.ndarray, dim: int = -1, return_norm: bool = False,
                     eps: float = 0.0):
    r"""Normalize ``x`` along ``dim`` to unit norm.

    With ``eps > 0`` the division is guarded (useful inside jit where the
    reference instead patches NaNs afterwards). With ``eps == 0`` behaviour
    matches the reference exactly (0/0 -> nan, handled by callers).

    Reference parity: articulate/math/general.py:27.
    """
    norm = jnp.linalg.norm(x, axis=dim, keepdims=True)
    if eps > 0:
        normalized = x / jnp.maximum(norm, eps)
    else:
        normalized = x / norm
    return (normalized, norm) if return_norm else normalized


def append_value(x: jnp.ndarray, value: float, dim: int = -1) -> jnp.ndarray:
    r"""Append a constant slab of ``value`` along ``dim`` (size grows by 1).

    Reference parity: articulate/math/general.py:42.
    """
    dim = dim % x.ndim
    pad_shape = list(x.shape)
    pad_shape[dim] = 1
    app = jnp.full(pad_shape, value, dtype=x.dtype)
    return jnp.concatenate((x, app), axis=dim)


def append_zero(x: jnp.ndarray, dim: int = -1) -> jnp.ndarray:
    return append_value(x, 0.0, dim)


def append_one(x: jnp.ndarray, dim: int = -1) -> jnp.ndarray:
    return append_value(x, 1.0, dim)


def vector_cross_matrix(x: jnp.ndarray) -> jnp.ndarray:
    r"""Skew-symmetric matrix ``[v]_x`` for each 3-vector (batched).

    Reference parity: articulate/math/general.py:63.
    """
    x = x.reshape(-1, 3)
    zeros = jnp.zeros_like(x[:, 0])
    m = jnp.stack(
        (zeros, -x[:, 2], x[:, 1],
         x[:, 2], zeros, -x[:, 0],
         -x[:, 1], x[:, 0], zeros),
        axis=1,
    )
    return m.reshape(-1, 3, 3)


def block_diagonal_matrix(matrices) -> jnp.ndarray:
    r"""Block-diagonal matrix from a list of 2-D matrices.

    Reference parity: articulate/math/general.py:89.
    """
    rows = sum(int(m.shape[0]) for m in matrices)
    cols = sum(int(m.shape[1]) for m in matrices)
    out = jnp.zeros((rows, cols), dtype=matrices[0].dtype)
    r = c = 0
    for m in matrices:
        out = out.at[r:r + m.shape[0], c:c + m.shape[1]].set(m)
        r += m.shape[0]
        c += m.shape[1]
    return out
