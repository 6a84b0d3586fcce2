"""Full camera API: the reference CameraMatrix surface as pure array functions.

TPU-native rework of /root/reference/src/CameraMatrix.{h,cpp}. The reference
is an AoS class caching K^-1, R^T and the camera center on every setter
(CameraMatrix.cpp:289-298); here every operation is a stateless function over
(K, R, T) arrays — under jit XLA CSEs repeated subexpressions, so cached
members are unnecessary. All functions broadcast over leading batch dims.

Coverage map (reference file:line -> function here):
  setProjection / RQ decomposition :33-91   -> decompose_projection
  world<->camera transforms :259-273        -> transform_* functions
  projectPoint (linear) :218-223            -> project_point_linear
  projectPoint (distorted) :225-236         -> projection.project_affine
  unprojectPixel :238-250                   -> unproject_pixel
  intersectRayWithPlane :252-257            -> intersect_ray_with_plane
  getRay / getCameraCenter :151-163         -> get_ray / camera_center
  optical axis / up / right :165-179        -> optical_* functions
  isOnGoodSide :181-183                     -> is_on_good_side
  normalized coordinates :275-287           -> to/from_normalized_coordinate
  getFocalLength/AspectRatio/PrincipalPoint :207-216 -> accessors
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.ops import projection as projection_ops


def camera_center(R: jax.Array, T: jax.Array) -> jax.Array:
    """c = -R^T T (the reference's cached m_center, CameraMatrix.cpp:296-297)."""
    return -jnp.einsum("...ji,...j->...i", R, T)


def orientation(R: jax.Array, T: jax.Array) -> jax.Array:
    """[R | T] as (..., 3, 4) (reference getOrientation)."""
    return jnp.concatenate([R, T[..., :, None]], axis=-1)


def projection_matrix(K: jax.Array, R: jax.Array, T: jax.Array) -> jax.Array:
    """P = K [R | T] (reference getProjection, CameraMatrix.cpp:200-204)."""
    return jnp.einsum("...ij,...jk->...ik", K, orientation(R, T))


def decompose_projection(P: jax.Array):
    """P = K [R | T] -> (K, R, T) via RQ decomposition.

    Reference setProjection (CameraMatrix.cpp:33-91) runs an RQ decomposition
    with Givens rotations; here we use the QR-of-reversed-transpose identity.
    K is normalized to K[2,2] = 1 with positive diagonal; returns batched
    results for (..., 3, 4) inputs.
    """
    M = P[..., :3]
    # RQ via QR: with J the row/column exchange, M^T J = Q~ R~ gives
    # M = (J R~^T J)(J Q~^T) with the first factor upper-triangular and the
    # second orthogonal.
    rev = jnp.flip(jnp.swapaxes(M, -1, -2), axis=-1)  # M^T J
    Qt, Rt = jnp.linalg.qr(rev)
    K = jnp.flip(jnp.swapaxes(Rt, -1, -2), axis=(-1, -2))  # J R~^T J
    R = jnp.flip(jnp.swapaxes(Qt, -1, -2), axis=-2)  # J Q~^T
    # Sign convention: diag(K) > 0 (then det R = sign(det M); for a proper
    # camera matrix built from det-+1 R and positive-determinant K this
    # recovers the original factors).
    diag = jnp.stack([K[..., 0, 0], K[..., 1, 1], K[..., 2, 2]], axis=-1)
    sign = jnp.where(jnp.sign(diag) == 0, 1.0, jnp.sign(diag))
    K = K * sign[..., None, :]
    R = R * sign[..., :, None]
    K_norm = K / K[..., 2:3, 2:3]
    T = jnp.linalg.solve(K, P[..., 3][..., None])[..., 0]
    return K_norm, R, T


def focal_length(K: jax.Array) -> jax.Array:
    """K(0,0) (CameraMatrix.cpp:207-209)."""
    return K[..., 0, 0]


def aspect_ratio(K: jax.Array) -> jax.Array:
    """K(1,1)/K(0,0) (CameraMatrix.cpp:211-213)."""
    return K[..., 1, 1] / K[..., 0, 0]


def principal_point(K: jax.Array) -> jax.Array:
    """(K(0,2), K(1,2)) (CameraMatrix.cpp:215-217)."""
    return jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)


def transform_point_into_camera_space(R, T, p):
    """R p + T (CameraMatrix.cpp:259-261)."""
    return projection_ops.transform_into_camera_space(R, T, p)


def transform_point_from_camera_space(R, T, p):
    """R^T (p - T) (CameraMatrix.cpp:263-265)."""
    return jnp.einsum("...ji,...j->...i", R, p - T)


def transform_direction_into_camera_space(R, d):
    """R d (CameraMatrix.cpp:271-273)."""
    return jnp.einsum("...ij,...j->...i", R, d)


def transform_direction_from_camera_space(R, d):
    """R^T d (CameraMatrix.cpp:267-269)."""
    return jnp.einsum("...ji,...j->...i", R, d)


def to_normalized_coordinate(K, p):
    """(K00 p0 + K01 p1 + K02, K11 p1 + K12) (CameraMatrix.cpp:275-280)."""
    out0 = K[..., 0, 0] * p[..., 0] + K[..., 0, 1] * p[..., 1] + K[..., 0, 2]
    out1 = K[..., 1, 1] * p[..., 1] + K[..., 1, 2]
    return jnp.stack([out0, out1], axis=-1)


def from_normalized_coordinate(K, p):
    """Inverse of to_normalized_coordinate via K^-1 rows (CameraMatrix.cpp:282-287)."""
    Kinv = jnp.linalg.inv(K)
    out0 = (
        Kinv[..., 0, 0] * p[..., 0] + Kinv[..., 0, 1] * p[..., 1] + Kinv[..., 0, 2]
    )
    out1 = Kinv[..., 1, 1] * p[..., 1] + Kinv[..., 1, 2]
    return jnp.stack([out0, out1], axis=-1)


def project_point_linear(K, R, T, X):
    """Distortion-free projection q = K(RX+T); returns (q0/q2, q1/q2)
    (CameraMatrix.cpp:218-223)."""
    q = jnp.einsum(
        "...ij,...j->...i", K, transform_point_into_camera_space(R, T, X)
    )
    return q[..., :2] / q[..., 2:3]


def get_ray(K, R, T, p):
    """World-space unit-free ray through pixel p (CameraMatrix.cpp:151-157):
    R^T K^-1 [p; 1]."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    ray = jnp.einsum("...ij,...j->...i", jnp.linalg.inv(K), ph)
    return jnp.einsum("...ji,...j->...i", R, ray)


def unproject_pixel(K, R, T, p, depth):
    """Pixel + depth -> world point (CameraMatrix.cpp:238-250)."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    ray = jnp.einsum("...ij,...j->...i", jnp.linalg.inv(K), ph)
    ray = ray * (depth / ray[..., 2])[..., None]
    ray = jnp.einsum("...ji,...j->...i", R, ray)
    return camera_center(R, T) + ray


def intersect_ray_with_plane(K, R, T, plane, x, y):
    """Intersect the pixel ray with plane (n, d) (CameraMatrix.cpp:252-257)."""
    p = jnp.stack([jnp.asarray(x, K.dtype), jnp.asarray(y, K.dtype)], axis=-1)
    ray = get_ray(K, R, T, p)
    c = camera_center(R, T)
    n = plane[..., :3]
    rho = (-jnp.sum(n * c, axis=-1) - plane[..., 3]) / jnp.sum(n * ray, axis=-1)
    return c + rho[..., None] * ray


def optical_axis(R):
    """Third row of R: world-space viewing direction (CameraMatrix.cpp:165-167)."""
    return R[..., 2, :]


def up_vector(R):
    """R^T [0,1,0] per transformDirectionFromCameraSpace (CameraMatrix.cpp:169-171)."""
    return R[..., 1, :]


def right_vector(R):
    """R^T [1,0,0] per transformDirectionFromCameraSpace (CameraMatrix.cpp:173-175)."""
    return R[..., 0, :]


def is_on_good_side(R, T, p):
    """True if p is in front of the camera (z > 0 in camera frame,
    CameraMatrix.cpp:181-183)."""
    return transform_point_into_camera_space(R, T, p)[..., 2] > 0
