r"""Rotation-representation math (pure JAX, batched, jit/grad-safe).

TPU-native re-implementation of the reference's ``articulate/math/angular.py``.
The reference leans on cv2.Rodrigues (CPU per-element loops, angular.py:236)
and scipy for euler conversions (angular.py:321-391); here every conversion is
a closed-form batched XLA computation so it can live inside jitted scan steps
and be differentiated (the reference breaks gradients through
rotation_matrix_to_axis_angle — callers that need that exact semantics wrap
with ``lax.stop_gradient`` themselves).

Conventions (identical to the reference):
* quaternions are wxyz,
* euler angles: uppercase seq = intrinsic, lowercase = extrinsic (scipy-style),
* r6d is the first two *columns* of the rotation matrix, column-major
  (angular.py:267-274).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from .general import lerp, normalize_tensor, vector_cross_matrix

__all__ = [
    "RotationRepresentation", "to_rotation_matrix", "radian_to_degree",
    "degree_to_radian", "normalize_angle", "angle_difference", "angle_between",
    "svd_rotate", "generate_random_rotation_matrix",
    "generate_random_rotation_matrix_constrained",
    "axis_angle_to_rotation_matrix", "rotation_matrix_to_axis_angle",
    "r6d_to_rotation_matrix", "r6d_to_rotation_matrix_nd",
    "rotation_matrix_to_r6d",
    "quaternion_to_axis_angle", "axis_angle_to_quaternion",
    "quaternion_to_rotation_matrix", "rotation_matrix_to_quaternion",
    "euler_angle_to_rotation_matrix", "rotation_matrix_to_euler_angle",
    "quaternion_product", "quaternion_inverse", "quaternion_mean",
]

_EPS = 1e-8


class RotationRepresentation(enum.Enum):
    r"""Rotation representations (reference: angular.py:21-29)."""
    AXIS_ANGLE = 0
    ROTATION_MATRIX = 1
    QUATERNION = 2
    R6D = 3
    EULER_ANGLE = 4


def to_rotation_matrix(r: jnp.ndarray, rep: RotationRepresentation):
    r"""Convert any representation to [N, 3, 3] rotation matrices."""
    if rep == RotationRepresentation.AXIS_ANGLE:
        return axis_angle_to_rotation_matrix(r)
    if rep == RotationRepresentation.QUATERNION:
        return quaternion_to_rotation_matrix(r)
    if rep == RotationRepresentation.R6D:
        return r6d_to_rotation_matrix(r)
    if rep == RotationRepresentation.EULER_ANGLE:
        return euler_angle_to_rotation_matrix(r)
    if rep == RotationRepresentation.ROTATION_MATRIX:
        return r.reshape(-1, 3, 3)
    raise ValueError("unknown rotation representation")


def radian_to_degree(q):
    return q * (180.0 / np.pi)


def degree_to_radian(q):
    return q * (np.pi / 180.0)


def normalize_angle(q):
    r"""Normalize radians into [-pi, pi) (reference: angular.py:109)."""
    mod = q % (2 * np.pi)
    return jnp.where(mod >= np.pi, mod - 2 * np.pi, mod)


def angle_difference(target, source):
    return normalize_angle(target - source)


def quaternion_product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    r"""Hamilton product of wxyz quaternions (reference: angular.py:79)."""
    shape = q1.shape
    q1 = q1.reshape(-1, 4)
    q2 = q2.reshape(-1, 4)
    w1, xyz1 = q1[:, :1], q1[:, 1:]
    w2, xyz2 = q2[:, :1], q2[:, 1:]
    xyz = jnp.cross(xyz1, xyz2) + w1 * xyz2 + w2 * xyz1
    w = w1 * w2 - jnp.sum(xyz1 * xyz2, axis=1, keepdims=True)
    return jnp.concatenate((w, xyz), axis=1).reshape(shape)


def quaternion_inverse(q: jnp.ndarray) -> jnp.ndarray:
    r"""Conjugate of wxyz quaternions (reference: angular.py:96)."""
    shape = q.shape
    q = q.reshape(-1, 4)
    out = jnp.concatenate((q[:, :1], -q[:, 1:]), axis=1)
    return out.reshape(shape)


def quaternion_mean(q: jnp.ndarray) -> jnp.ndarray:
    r"""Sign-aligned mean quaternion (reference: angular.py:68)."""
    q = q.reshape(-1, 4)
    ref_col = jnp.argmax(jnp.mean(jnp.abs(q), axis=0))
    # where(.. < 0) rather than sign(): a sample whose pivot component is
    # exactly 0 must be kept (sign flip is a no-op for it), not zeroed out
    signs = jnp.where(q[:, ref_col] < 0, -1.0, 1.0)[:, None]
    q = q * signs
    return normalize_tensor(jnp.mean(q, axis=0))


def axis_angle_to_rotation_matrix(a: jnp.ndarray) -> jnp.ndarray:
    r"""Rodrigues formula, safe at zero angle (reference: angular.py:221)."""
    a = a.reshape(-1, 3)
    # sqrt(sum + tiny) keeps the gradient finite at exactly zero rotation
    # (the conversion is differentiated through in SMPLify's closure; the
    # reference's batch_rodrigues adds a similar epsilon,
    # temporal_smplify.py:43). The value perturbation is below f32 ulp.
    angle = jnp.sqrt(jnp.sum(a * a, axis=-1) + 1e-16)
    # Guarded normalization: at angle=0 the axis term is multiplied by
    # (1-cos)=0 and sin=0, so any finite axis gives the identity — matching
    # the reference's nan->0 patch (angular.py:229).
    axis = a / jnp.maximum(angle, _EPS)[:, None]
    i = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), (a.shape[0], 3, 3))
    c = jnp.cos(angle)[:, None, None]
    s = jnp.sin(angle)[:, None, None]
    outer = axis[:, :, None] * axis[:, None, :]
    return c * i + (1 - c) * outer + s * vector_cross_matrix(axis)


def rotation_matrix_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    r"""Rotation matrices -> wxyz quaternions, w >= 0.

    Branchless Shepperd's method: computes all four candidate quadruples and
    selects by the largest pivot with ``where`` — jit/vmap friendly, stable
    for every rotation, unlike the naive trace formula.
    """
    r = r.reshape(-1, 3, 3)
    m00, m01, m02 = r[:, 0, 0], r[:, 0, 1], r[:, 0, 2]
    m10, m11, m12 = r[:, 1, 0], r[:, 1, 1], r[:, 1, 2]
    m20, m21, m22 = r[:, 2, 0], r[:, 2, 1], r[:, 2, 2]
    tr = m00 + m11 + m22

    # candidate 0: pivot w
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # candidate 1: pivot x
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                   axis=-1)
    # candidate 2: pivot y
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                   axis=-1)
    # candidate 3: pivot z
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                   axis=-1)

    pivots = jnp.stack([1.0 + tr,
                        1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22,
                        1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=1)  # [N, 4, 4]
    q = jnp.take_along_axis(cands, best[:, None, None].repeat(4, -1),
                            axis=1)[:, 0]
    q = normalize_tensor(q, eps=_EPS)
    # canonicalize to w >= 0 so downstream axis-angle lands in [0, pi]
    return q * jnp.where(q[:, :1] < 0, -1.0, 1.0)


def rotation_matrix_to_axis_angle(r: jnp.ndarray) -> jnp.ndarray:
    r"""Rotation matrices -> axis-angle with angle in [0, pi].

    Same output convention as the reference's cv2.Rodrigues path
    (angular.py:236) but closed-form, batched, and differentiable. Note the
    reference *detaches* this conversion from the autodiff graph; callers
    needing that exact behaviour should wrap with ``lax.stop_gradient``.
    """
    q = rotation_matrix_to_quaternion(r)
    return quaternion_to_axis_angle(q)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    r"""(Unnormalized) wxyz quaternions -> axis-angle (reference: angular.py:277).

    Uses atan2 instead of acos/sin for stability near zero rotation.
    """
    q = normalize_tensor(q.reshape(-1, 4), eps=_EPS)
    xyz_norm = jnp.linalg.norm(q[:, 1:], axis=-1)
    angle = 2.0 * jnp.arctan2(xyz_norm, q[:, 0])
    axis = q[:, 1:] / jnp.maximum(xyz_norm, _EPS)[:, None]
    return axis * angle[:, None]


def axis_angle_to_quaternion(a: jnp.ndarray) -> jnp.ndarray:
    r"""Axis-angle -> wxyz quaternion (reference: angular.py:293)."""
    a = a.reshape(-1, 3)
    angle = jnp.linalg.norm(a, axis=-1)
    axis = a / jnp.maximum(angle, _EPS)[:, None]
    half = 0.5 * angle
    return jnp.concatenate(
        (jnp.cos(half)[:, None], jnp.sin(half)[:, None] * axis), axis=1)


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    r"""(Unnormalized) wxyz quaternions -> rotation matrices
    (reference: angular.py:306)."""
    q = normalize_tensor(q.reshape(-1, 4), eps=_EPS)
    a, b, c, d = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack(
        (1 - 2 * c * c - 2 * d * d, 2 * b * c - 2 * a * d, 2 * a * c + 2 * b * d,
         2 * b * c + 2 * a * d, 1 - 2 * b * b - 2 * d * d, 2 * c * d - 2 * a * b,
         2 * b * d - 2 * a * c, 2 * a * b + 2 * c * d, 1 - 2 * b * b - 2 * c * c),
        axis=1,
    )
    return r.reshape(-1, 3, 3)


def r6d_to_rotation_matrix(r6d: jnp.ndarray) -> jnp.ndarray:
    r"""6D representation -> rotation matrix via Gram-Schmidt
    (reference: angular.py:249). The 6 numbers are [col0; col1]."""
    r6d = r6d.reshape(-1, 6)
    col0 = normalize_tensor(r6d[:, 0:3], eps=_EPS)
    proj = jnp.sum(col0 * r6d[:, 3:6], axis=1, keepdims=True)
    col1 = normalize_tensor(r6d[:, 3:6] - proj * col0, eps=_EPS)
    col2 = jnp.cross(col0, col1)
    return jnp.stack((col0, col1, col2), axis=-1)


def r6d_to_rotation_matrix_nd(r6d: jnp.ndarray) -> jnp.ndarray:
    r"""[..., 6] -> [..., 3, 3] leading-shape-preserving Gram-Schmidt.

    Same math as :func:`r6d_to_rotation_matrix` without the ``reshape(-1)``
    flatten, so it is safe inside computations whose leading axes carry a
    mesh sharding (flattening a sharded axis is a ShardingTypeError under
    explicit-sharding jit)."""
    col0 = normalize_tensor(r6d[..., 0:3], eps=_EPS)
    proj = jnp.sum(col0 * r6d[..., 3:6], axis=-1, keepdims=True)
    col1 = normalize_tensor(r6d[..., 3:6] - proj * col0, eps=_EPS)
    col2 = jnp.cross(col0, col1)
    return jnp.stack((col0, col1, col2), axis=-1)


def rotation_matrix_to_r6d(r: jnp.ndarray) -> jnp.ndarray:
    r"""Rotation matrix -> 6D (first two columns, column-major;
    reference: angular.py:267)."""
    r = r.reshape(-1, 3, 3)
    return jnp.swapaxes(r[:, :, :2], 1, 2).reshape(-1, 6)


_AXES = {"X": 0, "Y": 1, "Z": 2, "x": 0, "y": 1, "z": 2}


def _single_axis_rotation(axis: int, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == 0:
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == 1:
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    else:
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angle_to_rotation_matrix(q: jnp.ndarray, seq: str = "XYZ") -> jnp.ndarray:
    r"""Euler angles -> rotation matrices (scipy convention;
    reference: angular.py:337). Uppercase = intrinsic, lowercase = extrinsic."""
    q = q.reshape(-1, 3)
    mats = [_single_axis_rotation(_AXES[s], q[:, i]) for i, s in enumerate(seq)]
    if seq.isupper():       # intrinsic: R = R1 @ R2 @ R3
        return mats[0] @ mats[1] @ mats[2]
    if seq.islower():       # extrinsic: R = R3 @ R2 @ R1
        return mats[2] @ mats[1] @ mats[0]
    raise ValueError("seq must be all-intrinsic (upper) or all-extrinsic (lower)")


def rotation_matrix_to_euler_angle(r, seq: str = "XYZ") -> np.ndarray:
    r"""Rotation matrices -> euler angles (host-side, via scipy;
    reference: angular.py:321). Not jittable — used only by offline tools."""
    from scipy.spatial.transform import Rotation
    return Rotation.from_matrix(np.asarray(r).reshape(-1, 3, 3)).as_euler(seq)


def angle_between(rot1: jnp.ndarray, rot2: jnp.ndarray,
                  rep: RotationRepresentation = RotationRepresentation.ROTATION_MATRIX):
    r"""Angle in radians between two batched rotations (reference: angular.py:128).

    Computed from the relative rotation's quaternion (equivalent to the
    reference's |Rodrigues(R1^T R2)| with angle in [0, pi])."""
    r1 = to_rotation_matrix(rot1, rep)
    r2 = to_rotation_matrix(rot2, rep)
    offsets = jnp.swapaxes(r1, -1, -2) @ r2
    return jnp.linalg.norm(rotation_matrix_to_axis_angle(offsets), axis=-1)


def svd_rotate(source_points: jnp.ndarray, target_points: jnp.ndarray,
               calc_R: bool = True, calc_t: bool = False, calc_s: bool = False):
    r"""Batched Procrustes: min ||s R src + t - tgt||^2 (reference: angular.py:144).

    Returns (R [B,n,n], t [B,n], s [B], transformed source points [B,m,n]).
    Runs fully batched on-device (the reference loops Python SVDs per batch
    element, angular.py:170-177).
    """
    if calc_t:
        src_mean = jnp.mean(source_points, axis=1, keepdims=True)
        tgt_mean = jnp.mean(target_points, axis=1, keepdims=True)
    else:
        src_mean = jnp.zeros_like(source_points[:, :1])
        tgt_mean = jnp.zeros_like(target_points[:, :1])

    if calc_s:
        src_rms = jnp.sum((source_points - src_mean) ** 2, axis=(1, 2))
        tgt_rms = jnp.sum((target_points - tgt_mean) ** 2, axis=(1, 2))
        scale = jnp.sqrt(tgt_rms / src_rms)
    else:
        scale = jnp.ones_like(source_points[:, 0, 0])

    n = source_points.shape[2]
    if calc_R:
        m = jnp.swapaxes(source_points - src_mean, 1, 2) @ (target_points - tgt_mean)
        u, _, vt = jnp.linalg.svd(m)
        v = jnp.swapaxes(vt, 1, 2)
        det = jnp.linalg.det(v @ jnp.swapaxes(u, 1, 2))
        # det-sign fix (reference flips v's last column when det < -0.9)
        flip = jnp.where(det < -0.9, -1.0, 1.0)
        v = v.at[:, :, -1].multiply(flip[:, None])
        rotation = v @ jnp.swapaxes(u, 1, 2)
    else:
        rotation = jnp.broadcast_to(jnp.eye(n, dtype=source_points.dtype),
                                    (source_points.shape[0], n, n))

    translation = (-scale[:, None, None] * (rotation @ jnp.swapaxes(src_mean, 1, 2))
                   + jnp.swapaxes(tgt_mean, 1, 2))
    transformed = (scale[:, None, None]
                   * (source_points @ jnp.swapaxes(rotation, 1, 2))
                   + jnp.swapaxes(translation, 1, 2))
    return rotation, translation[..., 0], scale, transformed


def generate_random_rotation_matrix(key, n: int = 1) -> jnp.ndarray:
    r"""Uniform random rotation matrices via normalized Gaussian quaternions."""
    q = jax.random.normal(key, (n, 4))
    return quaternion_to_rotation_matrix(q)


def generate_random_rotation_matrix_constrained(
        key, n: int = 1, y=(-180, 180), p=(-90, 90), r=(-180, 180)) -> jnp.ndarray:
    r"""Random rotations with yaw/pitch/roll ranges in degrees, local Y-X-Z
    order (reference: angular.py:205). Jittable (used in train-time camera
    augmentation, sig_mp.py:528)."""
    ky, kp, kr = jax.random.split(key, 3)
    ry = degree_to_radian(lerp(y[0], y[1], jax.random.uniform(ky, (n,))))
    rp = degree_to_radian(lerp(p[0], p[1], jax.random.uniform(kp, (n,))))
    rr = degree_to_radian(lerp(r[0], r[1], jax.random.uniform(kr, (n,))))
    return euler_angle_to_rotation_matrix(jnp.stack((ry, rp, rr), axis=1), seq="YXZ")
