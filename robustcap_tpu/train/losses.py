r"""Masked sequence losses for the per-RNN trainers.

Rebuild of the loss functions in the reference trainers (net/sig_mp.py):
masked equivalents of concatenate-then-MSE (RNNLossWrapper, rnn.py:15-23),
the rnn3 multi-horizon velocity loss (sig_mp.py:409-415), the rnn7
FK-weighted pose loss (sig_mp.py:749-767), and the rnn8 pos-weighted BCE
(sig_mp.py:829-831).

Divergence note: the reference's RNNLossWrapper concatenates the whole batch
along time before applying sequence-structured losses, so rnn3's horizon
windows can straddle sequence boundaries; here windows are computed per
sequence (masked), which is the intended semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_mse", "masked_distance", "velocity_horizon_loss",
           "make_fk_pose_loss", "masked_bce_pos_weight"]


def _mask(ys, lengths):
    T = ys.shape[0]
    return (jnp.arange(T)[:, None] < lengths[None, :]).astype(ys.dtype)


def masked_mse(ys, labels, lengths):
    r"""Mean squared error over valid frames (== MSE over the concatenated
    batch, rnn.py:15-23)."""
    m = _mask(ys, lengths)[..., None]
    err = ((ys - labels) ** 2) * m
    return err.sum() / (m.sum() * ys.shape[-1])


def masked_distance(ys, labels, lengths, dim: int = 3):
    r"""Mean 3-D point distance (PositionErrorEvaluator as eval_fn,
    sig_mp.py:341)."""
    T, B = ys.shape[:2]
    d = (ys - labels).reshape(T, B, -1, dim)
    dist = jnp.linalg.norm(d, axis=-1)
    m = _mask(ys, lengths)[..., None]
    return (dist * m).sum() / (m.sum() * dist.shape[-1])


def velocity_horizon_loss(ys, labels, lengths):
    r"""Multi-horizon velocity loss: per-frame MSE plus MSE of velocity sums
    over windows of 6/20/60 frames (sig_mp.py:409-415). Windows are aligned
    so the first ``T mod w`` valid frames are dropped, like the reference's
    ``x[l % w:].view(-1, w, 3).sum(1)``."""
    T, B, D = ys.shape
    m2 = _mask(ys, lengths)
    total = masked_mse(ys, labels, lengths)
    cs_p = jnp.cumsum(ys * m2[..., None], axis=0)
    cs_t = jnp.cumsum(labels * m2[..., None], axis=0)
    zero = jnp.zeros((1, B, D), ys.dtype)
    cs_p = jnp.concatenate([zero, cs_p])       # [T+1, B, D]
    cs_t = jnp.concatenate([zero, cs_t])

    for w in (6, 20, 60):
        n_win = T // w + 1
        start0 = lengths % w                                  # [B]
        starts = start0[None, :] + (jnp.arange(n_win) * w)[:, None]  # [n, B]
        ends = starts + w
        valid = (ends <= lengths[None, :]).astype(ys.dtype)   # [n, B]
        starts_c = jnp.minimum(starts, T)
        ends_c = jnp.minimum(ends, T)
        sum_p = (jnp.take_along_axis(cs_p, ends_c[..., None], 0)
                 - jnp.take_along_axis(cs_p, starts_c[..., None], 0))
        sum_t = (jnp.take_along_axis(cs_t, ends_c[..., None], 0)
                 - jnp.take_along_axis(cs_t, starts_c[..., None], 0))
        err = ((sum_p - sum_t) ** 2) * valid[..., None]
        total = total + err.sum() / jnp.maximum(valid.sum() * D, 1.0)
    return total


def make_fk_pose_loss(body_model, fk_weight: float = 100.0):
    r"""r6d-pose loss with a joint-position term through the light FK
    (sig_mp.py:749-767): loss = mse(r6d) + 100 * mse(FK(r6d))."""
    from .. import math as M
    import numpy as np
    parent = jnp.asarray(body_model.tree.parent_clamped)
    ancestor = jnp.asarray(body_model.tree.ancestor_matrix)
    bone = jnp.asarray(np.asarray(body_model._bone_vector))

    def fk(r6d):
        # [T, B, 144] -> [T, B, 24, 3]; only the (replicated) feature axis
        # is reshaped, so the batch axis may carry a mesh sharding (the DP
        # train step shards B — flattening T*B would be a ShardingTypeError)
        r6 = r6d.reshape(r6d.shape[:-1] + (24, 6))
        R = M.r6d_to_rotation_matrix_nd(r6)            # [T, B, 24, 3, 3]
        pb = jnp.einsum("tbjrc,jc->tbjr", R[:, :, parent], bone)
        pb = pb.at[:, :, 0].set(0.0)
        return jnp.einsum("ij,tbjk->tbik", ancestor, pb)

    def loss(ys, labels, lengths):
        m = _mask(ys, lengths)
        l1 = masked_mse(ys, labels, lengths)
        jp = fk(ys)
        jt = fk(labels)
        err = ((jp - jt) ** 2) * m[..., None, None]
        l2 = err.sum() / (m.sum() * 72)
        return l1 + fk_weight * l2

    return loss


def masked_bce_pos_weight(pos_weight):
    r"""BCE-with-logits with per-class positive weighting
    (sig_mp.py:829-831)."""
    pw = jnp.asarray(pos_weight)

    def loss(ys, labels, lengths):
        m = _mask(ys, lengths)[..., None]
        logp = jax.nn.log_sigmoid(ys)
        logn = jax.nn.log_sigmoid(-ys)
        l = -(pw * labels * logp + (1 - labels) * logn)
        return (l * m).sum() / (m.sum() * ys.shape[-1])

    return loss
