r"""Batched Procrustes alignment and PA-MPJPE on device.

TPU-native rebuild of the reference's numpy Procrustes loop
(``utils.py:138-203``): the reference runs one SVD per frame on the host;
here the whole sequence is one batched ``jnp.linalg.svd`` with the
det-sign fix, jittable and vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["similarity_transform", "reconstruction_error"]


def similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    r"""Align each S1[i] (N points x 3) to S2[i] with the best similarity
    transform (scale+rotation+translation); returns transformed S1.

    Matches utils.py:138-186 (which works on [3, N] slices host-side).
    """
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = jnp.sum(X1 ** 2, axis=(1, 2))
    K = jnp.swapaxes(X1, 1, 2) @ X2                      # [B, 3, 3]
    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, 1, 2)
    det = jnp.linalg.det(U @ Vh)
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape)
    Z = Z.at[:, -1, -1].set(jnp.sign(det))
    R = V @ Z @ jnp.swapaxes(U, 1, 2)                    # [B, 3, 3]
    # trace(R K) / var1 with K transposed into R's frame
    scale = jnp.einsum("bij,bij->b", R, jnp.swapaxes(K, 1, 2)) / var1
    t = mu2 - scale[:, None, None] * (mu1 @ jnp.swapaxes(R, 1, 2))
    return scale[:, None, None] * (S1 @ jnp.swapaxes(R, 1, 2)) + t


def reconstruction_error(S1: jnp.ndarray, S2: jnp.ndarray,
                         reduction: str = "mean"):
    r"""PA-MPJPE: Procrustes-align then mean joint distance
    (utils.py:195-203)."""
    S1_hat = similarity_transform(S1, S2)
    re = jnp.sqrt(jnp.sum((S1_hat - S2) ** 2, axis=-1)).mean(axis=-1)
    if reduction == "mean":
        return re.mean()
    if reduction == "sum":
        return re.sum()
    return re


def reconstruction_error_np(S1, S2, reduction: str = "mean"):
    r"""Float64 host-side PA-MPJPE with batched numpy SVDs.

    The f32 SVD on device carries ~1 mm of numerical noise — material
    against PA-MPJPE values of a few cm — so final metrics use this float64
    path (matching the reference's numpy precision, utils.py:138-203) while
    staying fully batched (one vectorized SVD over all frames, not the
    reference's per-frame Python loop).
    """
    import numpy as np
    S1 = np.asarray(S1, np.float64)
    S2 = np.asarray(S2, np.float64)
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = np.sum(X1 ** 2, axis=(1, 2))
    K = np.swapaxes(X1, 1, 2) @ X2
    U, s, Vh = np.linalg.svd(K)
    V = np.swapaxes(Vh, 1, 2)
    Z = np.broadcast_to(np.eye(3), K.shape).copy()
    Z[:, -1, -1] = np.sign(np.linalg.det(U @ Vh))
    R = V @ Z @ np.swapaxes(U, 1, 2)
    scale = np.einsum("bij,bij->b", R, np.swapaxes(K, 1, 2)) / var1
    t = mu2 - scale[:, None, None] * (mu1 @ np.swapaxes(R, 1, 2))
    S1_hat = scale[:, None, None] * (S1 @ np.swapaxes(R, 1, 2)) + t
    re = np.sqrt(((S1_hat - S2) ** 2).sum(axis=-1)).mean(axis=-1)
    if reduction == "mean":
        return re.mean()
    if reduction == "sum":
        return re.sum()
    return re
