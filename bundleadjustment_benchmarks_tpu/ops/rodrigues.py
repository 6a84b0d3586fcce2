"""Rotation kernels: Rodrigues exp/log map, quaternion conversions.

TPU-native reimplementation of the reference's Math namespace
(/root/reference/src/MathUtils.h:13-94). All functions are written for a
single rotation and batch via ``jax.vmap``; leading batch dims are handled by
the ``*_batched`` wrappers. Everything is dtype-polymorphic (f32/f64).

Semantics replicated from the reference:
  * exp map uses the small-angle cutoff |theta| <= 1e-6 -> identity
    (MathUtils.h:74). We keep the same cutoff but compute gradients safely.
  * The reference's createQuaternionFromRotationMatrix has a transcription bug
    (reads R(1,2) for m21, MathUtils.h:30). We implement the CORRECT formula
    (SURVEY.md section 2.1 directs not to replicate the bug; the buggy path is
    only reachable via an estimateNorm helper no in-repo driver calls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Small-angle cutoff of the reference exp map (MathUtils.h:74).
RODRIGUES_EPS = 1e-6


def cross_product_matrix(v: jax.Array) -> jax.Array:
    """[v]_x such that [v]_x @ w == cross(v, w). Reference MathUtils.h:13-21.

    Accepts (..., 3) and returns (..., 3, 3).
    """
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(vx)
    return jnp.stack(
        [
            jnp.stack([zero, -vz, vy], axis=-1),
            jnp.stack([vz, zero, -vx], axis=-1),
            jnp.stack([-vy, vx, zero], axis=-1),
        ],
        axis=-2,
    )


def exp_rodrigues(omega: jax.Array) -> jax.Array:
    """Rotation matrix from axis-angle vector, R = I + c1 [w]_x + c2 [w]_x^2.

    c1 = sin(t)/t, c2 = (1-cos(t))/t^2 (reference MathUtils.h:66-82).

    DOCUMENTED DEVIATION from the reference: for |t| <= 1e-6 the reference
    hard-switches to the identity matrix (MathUtils.h:74), which truncates
    sub-1e-6 rotations AND makes the function non-differentiable at 0 (an
    autodiff through the switch yields a zero derivative). We instead use the
    Taylor coefficients c1 = 1 - t^2/6, c2 = 1/2 - t^2/24 below the cutoff:
    exact identity at t = 0, correct gradients everywhere, and strictly more
    accurate than the reference's truncation (difference <= ~1e-6 per matrix
    entry, far below the LM flatline tolerance of 1e-8 relative energy).

    Accepts (..., 3), returns (..., 3, 3).
    """
    dtype = omega.dtype
    theta2 = jnp.sum(omega * omega, axis=-1)
    eps = jnp.asarray(RODRIGUES_EPS, dtype)
    small = theta2 <= eps * eps
    # Guard BEFORE the sqrt so gradients stay finite at theta == 0 (sqrt has
    # an infinite derivative there); the guarded branch is discarded by the
    # final where, and so is its (finite) gradient.
    safe_theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    c1 = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    c2 = jnp.where(
        small,
        0.5 - theta2 / 24.0,
        (1.0 - jnp.cos(safe_theta)) / (safe_theta * safe_theta),
    )
    J = cross_product_matrix(omega)
    J2 = J @ J
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), J.shape)
    return eye + c1[..., None, None] * J + c2[..., None, None] * J2


def quaternion_from_rotation_matrix(R: jax.Array) -> jax.Array:
    """Quaternion (x, y, z, w) from rotation matrix.

    Correct version of reference MathUtils.h:23-40 (the reference reads
    R(1,2) where R(2,1) is meant; we use R(2,1)).
    """
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    zero = jnp.zeros_like(m00)
    qw = jnp.sqrt(jnp.maximum(zero, 1.0 + m00 + m11 + m22)) / 2
    qx = jnp.sqrt(jnp.maximum(zero, 1.0 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(zero, 1.0 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(zero, 1.0 - m00 - m11 + m22)) / 2
    # copysign semantics of reference MathUtils.h:9-11: negative iff y < 0.
    qx = jnp.where(R[..., 2, 1] - R[..., 1, 2] < 0, -qx, qx)
    qy = jnp.where(R[..., 0, 2] - R[..., 2, 0] < 0, -qy, qy)
    qz = jnp.where(R[..., 1, 0] - R[..., 0, 1] < 0, -qz, qz)
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def rotation_matrix_from_quaternion(q: jax.Array) -> jax.Array:
    """Rotation matrix from quaternion (x, y, z, w); reference MathUtils.h:42-64."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    length = jnp.sqrt(x * x + y * y + z * z + w * w)
    s = jnp.where(length > 0, 1.0 / jnp.where(length > 0, length, 1.0), 0.0)
    x, y, z, w = x * s, y * s, z * s, w * s
    wx, wy, wz = 2 * w * x, 2 * w * y, 2 * w * z
    xx, xy, xz = 2 * x * x, 2 * x * y, 2 * x * z
    yy, yz, zz = 2 * y * y, 2 * y * z, 2 * z * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            jnp.stack([one - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, one - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, one - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def log_rodrigues(R: jax.Array) -> jax.Array:
    """Axis-angle vector from rotation matrix (reference MathUtils.h:84-94).

    Matches the reference recipe: quaternion -> normalize(q.xyz) * 2*acos(q.w).
    For the identity rotation the reference normalizes a zero vector (NaN); we
    return zeros instead.
    """
    q = quaternion_from_rotation_matrix(R)
    xyz = q[..., :3]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    safe = jnp.where(norm > 0, norm, jnp.ones_like(norm))
    angle = 2.0 * jnp.arccos(jnp.clip(q[..., 3:4], -1.0, 1.0))
    return jnp.where(norm > 0, xyz / safe * angle, jnp.zeros_like(xyz))
