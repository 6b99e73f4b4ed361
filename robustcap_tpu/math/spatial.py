r"""Rigid-body / articulated-body spatial math (pure JAX).

TPU-native re-implementation of ``articulate/math/spatial.py``. The reference
walks the kinematic tree with a sequential per-joint Python loop
(spatial.py:104-123); here the tree is preprocessed once (host-side numpy)
into

* a *level decomposition* — joints grouped by depth, so forward kinematics is
  a short static chain of batched gather+matmul steps (depth of SMPL = 8), and
* an *ancestor matrix* A (A[i, j] = 1 iff j is i or an ancestor of i), so the
  tree prefix-sum ``bone vectors -> joint positions`` is a single [J, J] x
  [J, 3] matmul that XLA maps straight onto the MXU.

Inverse kinematics needs no scan at all: ``R_local[i] = R_glb[parent[i]]^T
R_glb[i]`` is one gather + one batched matmul.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "KinematicTree", "mat3_mul", "transformation_matrix", "decode_transformation_matrix",
    "inverse_transformation_matrix", "bone_vector_to_joint_position",
    "joint_position_to_bone_vector", "forward_kinematics_R",
    "inverse_kinematics_R", "forward_kinematics_T", "inverse_kinematics_T",
    "forward_kinematics",
]


def _canonical_parent(parent: Sequence) -> Tuple[int, ...]:
    r"""Parent list with root encoded as -1 (accepts None / -1 at index 0)."""
    out = []
    for i, p in enumerate(parent):
        if p is None or (i == 0):
            out.append(-1)
        else:
            out.append(int(p))
    return tuple(out)


@dataclass(frozen=True)
class KinematicTree:
    r"""Preprocessed kinematic tree structure (host-side constants).

    ``parent[i]`` must be < i for i > 0, as in the reference
    (spatial.py:135). All members are numpy, captured as compile-time
    constants when closed over in jitted functions.
    """
    parent: Tuple[int, ...]
    levels: Tuple[Tuple[int, ...], ...] = field(init=False)
    ancestor_matrix: np.ndarray = field(init=False)  # [J, J] float32
    parent_clamped: np.ndarray = field(init=False)   # [J] int32, root -> 0

    def __post_init__(self):
        parent = _canonical_parent(self.parent)
        object.__setattr__(self, "parent", parent)
        n = len(parent)
        depth = [0] * n
        for i in range(1, n):
            if parent[i] >= i:
                raise ValueError("parent[i] must be smaller than i")
            depth[i] = depth[parent[i]] + 1
        levels = []
        for d in range(1, max(depth) + 1):
            levels.append(tuple(i for i in range(n) if depth[i] == d))
        object.__setattr__(self, "levels", tuple(levels))

        anc = np.zeros((n, n), dtype=np.float32)
        for i in range(n):
            j = i
            while j >= 0:
                anc[i, j] = 1.0
                j = parent[j]
        object.__setattr__(self, "ancestor_matrix", anc)
        pc = np.array([max(p, 0) for p in parent], dtype=np.int32)
        object.__setattr__(self, "parent_clamped", pc)

    @property
    def num_joints(self) -> int:
        return len(self.parent)


_TREE_CACHE: dict = {}


def get_tree(parent) -> KinematicTree:
    if isinstance(parent, KinematicTree):
        return parent
    key = _canonical_parent(parent)
    tree = _TREE_CACHE.get(key)
    if tree is None:
        tree = KinematicTree(key)
        _TREE_CACHE[key] = tree
    return tree


def mat3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    r"""Batched 3x3 matrix product as broadcast multiply-sum.

    Two reasons over ``a @ b``: (1) tiny dots pad badly onto the MXU's
    128-lane tiles — elementwise VPU math is the right shape for [..., 3, 3];
    (2) XLA:CPU's simplifier miscompiles vmap(jvp(dot_general)) with gathered
    non-leading batch dims (hit by vmapped SMPLify gradients through the
    level-parallel FK)."""
    return (a[..., :, :, None] * b[..., None, :, :]).sum(-2)


def transformation_matrix(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    r"""Homogeneous transform T_sb from R [*, 3, 3] and p [*, 3]
    (reference: spatial.py:60)."""
    Rp = jnp.concatenate((R, p[..., None]), axis=-1)
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate((Rp, bottom), axis=-2)


def decode_transformation_matrix(T: jnp.ndarray):
    r"""T [*, 4, 4] -> (R [*, 3, 3], p [*, 3]) (reference: spatial.py:78)."""
    return T[..., :3, :3], T[..., :3, 3]


def inverse_transformation_matrix(T: jnp.ndarray) -> jnp.ndarray:
    r"""Closed-form SE(3) inverse (reference: spatial.py:90)."""
    R, p = decode_transformation_matrix(T)
    invR = jnp.swapaxes(R, -1, -2)
    invp = -(invR @ p[..., None])[..., 0]
    return transformation_matrix(invR, invp)


def bone_vector_to_joint_position(bone_vec: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Tree prefix-sum as one MXU matmul with the ancestor matrix
    (reference loops joints: spatial.py:126,104-112)."""
    tree = get_tree(parent)
    bone_vec = bone_vec.reshape(bone_vec.shape[0], -1, 3)
    anc = jnp.asarray(tree.ancestor_matrix, dtype=bone_vec.dtype)
    return jnp.einsum("ij,bjk->bik", anc, bone_vec)


def joint_position_to_bone_vector(joint_pos: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Inverse of the tree prefix-sum: subtract the parent position
    (reference: spatial.py:148,115-123)."""
    tree = get_tree(parent)
    joint_pos = joint_pos.reshape(joint_pos.shape[0], -1, 3)
    parent_pos = joint_pos[:, tree.parent_clamped]
    parent_pos = parent_pos.at[:, 0].set(0.0)
    return joint_pos - parent_pos


def forward_kinematics_R(R_local: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Global rotations from local rotations, level-parallel
    (reference: spatial.py:170)."""
    tree = get_tree(parent)
    R_local = R_local.reshape(R_local.shape[0], -1, 3, 3)
    R_glb = R_local
    for level in tree.levels:
        idx = np.array(level)
        pidx = tree.parent_clamped[idx]
        R_glb = R_glb.at[:, idx].set(mat3_mul(R_glb[:, pidx], R_local[:, idx]))
    return R_glb


def inverse_kinematics_R(R_global: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Local rotations from global rotations — one gather + batched matmul,
    no tree walk needed (reference: spatial.py:197)."""
    tree = get_tree(parent)
    R_global = R_global.reshape(R_global.shape[0], -1, 3, 3)
    parent_R = R_global[:, tree.parent_clamped]
    local = mat3_mul(jnp.swapaxes(parent_R, -1, -2), R_global)
    return local.at[:, 0].set(R_global[:, 0])


def forward_kinematics_T(T_local: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Global SE(3) transforms from local ones, level-parallel
    (reference: spatial.py:224)."""
    tree = get_tree(parent)
    T_local = T_local.reshape(T_local.shape[0], -1, 4, 4)
    T_glb = T_local
    for level in tree.levels:
        idx = np.array(level)
        pidx = tree.parent_clamped[idx]
        T_glb = T_glb.at[:, idx].set(T_glb[:, pidx] @ T_local[:, idx])
    return T_glb


def inverse_kinematics_T(T_global: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Local SE(3) transforms from global ones (reference: spatial.py:252)."""
    tree = get_tree(parent)
    T_global = T_global.reshape(T_global.shape[0], -1, 4, 4)
    parent_T = T_global[:, tree.parent_clamped]
    local = inverse_transformation_matrix(parent_T) @ T_global
    return local.at[:, 0].set(T_global[:, 0])


def forward_kinematics(R_local: jnp.ndarray, p_local: jnp.ndarray, parent):
    r"""(R_glb, p_glb) = FK(R_local, p_local) (reference: spatial.py:280).

    Implemented directly on (R, p) pairs per level instead of 4x4 transforms —
    fewer FLOPs and no homogeneous padding.
    """
    tree = get_tree(parent)
    R_local = R_local.reshape(R_local.shape[0], -1, 3, 3)
    p_local = p_local.reshape(p_local.shape[0], -1, 3)
    R_glb = R_local
    p_glb = p_local
    for level in tree.levels:
        idx = np.array(level)
        pidx = tree.parent_clamped[idx]
        R_glb = R_glb.at[:, idx].set(mat3_mul(R_glb[:, pidx], R_local[:, idx]))
        p_glb = p_glb.at[:, idx].set(
            p_glb[:, pidx]
            + (R_glb[:, pidx] * p_local[:, idx, None, :]).sum(-1))
    return R_glb, p_glb
