"""Analytic BA Jacobian as dense per-observation block tensors.

TPU-native replacement of the reference's triplet-scatter Jacobian assembly
(BAFunctor::dE_pos, /root/reference/src/Optimization/BAFunctor.h:181-297).
Instead of 24 triplet scatters per observation into a CSC sparse matrix, we
return two dense block tensors

    Jc: (K, 2, 9)  d(robust residual_i)/d(camera params of cam_idx[i])
    Jp: (K, 2, 3)  d(robust residual_i)/d(point coords of pt_idx[i])

which, together with (cam_idx, pt_idx), *are* the sparse Jacobian: row block i
occupies columns [3*pt, 3*pt+3) and [3M + 9*cam, 3M + 9*cam + 9) of the
reference's points-first column ordering (BAFunctor.h:183-191).

Chain rule replicated from the reference:
  * poseDerivatives: d(RX+T)/d(T,omega) = [I | -[XX - T]_x], dXX/dX = R
    (BAFunctor.h:126-142 — the left-multiplied incremental rotation
    parameterization, matching update_params' R <- exp(dw) R0);
  * projection/distortion chain dp_dxd, dxu_dXX, dxd_dxu (BAFunctor.h:215-225);
  * column 6 (focal) derivative is the DISTORTED point xd (BAFunctor.h:252),
    i.e. d(f*xd)/df;
  * robust 2x2 outer derivative (BAFunctor.h:227-242) multiplies the block.

Camera column ordering inside the 9-block: T(0:3), omega(3:6), f(6), k1(7),
k2(8) — matching BAFunctor.h:186-191 and update_params.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.ops import projection, robust, rodrigues


class JacobianBlocks(NamedTuple):
    """Implicit sparse Jacobian: dense blocks + residuals evaluated jointly."""

    Jc: jax.Array  # (K, 2, 9)
    Jp: jax.Array  # (K, 2, 3)
    f: jax.Array  # (K, 2) robustified residuals at the same state


def residuals_and_jacobian(state, obs, tau2, compute_dtype=None) -> JacobianBlocks:
    """Evaluate robustified residuals and their analytic Jacobian blocks.

    One fused pass over observations (the reference evaluates the projection
    twice — once in E_pos, once in dE_pos:229 — we share the computation; the
    values are identical).

    ``compute_dtype`` (mixed precision): the world->camera transform
    XX = R X + T always runs in the STATE dtype — BAL far-field points
    (|X| ~ 1e4, z ~ 4) cancel catastrophically below f64 — and everything
    downstream (normalized coordinates, distortion, robust chain) runs in
    ``compute_dtype``; after the division by z all quantities are O(1)-to-
    O(f) and f32-safe. None = state dtype throughout.
    """
    R = state.R[obs.cam_idx]
    T = state.T[obs.cam_idx]
    focal = state.K[obs.cam_idx, 0, 0]
    k1 = state.k1[obs.cam_idx]
    k2 = state.k2[obs.cam_idx]
    X = state.points[obs.pt_idx]

    XX = projection.transform_into_camera_space(R, T, X)
    if compute_dtype is not None and XX.dtype != compute_dtype:
        XX = XX.astype(compute_dtype)
        R = R.astype(compute_dtype)
        T = T.astype(compute_dtype)
        focal = focal.astype(compute_dtype)
        k1 = k1.astype(compute_dtype)
        k2 = k2.astype(compute_dtype)
        obs = type(obs)(
            cam_idx=obs.cam_idx,
            pt_idx=obs.pt_idx,
            measurements=obs.measurements.astype(compute_dtype),
            weights=obs.weights,
        )
    z = XX[..., 2]
    xu = XX[..., :2] / z[..., None]
    xd = projection.distort(k1, k2, xu)
    q = focal[..., None] * xd
    r = q - obs.measurements  # raw residual

    # poseDerivatives (BAFunctor.h:126-142): d_dRT = [I | -[XX - T]_x].
    mJ = -rodrigues.cross_product_matrix(XX - T)  # (K, 3, 3)

    # dxu_dXX (BAFunctor.h:219-221).
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(inv_z)
    dxu_dXX = jnp.stack(
        [
            jnp.stack([inv_z, zeros, -XX[..., 0] * inv_z2], axis=-1),
            jnp.stack([zeros, inv_z, -XX[..., 1] * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (K, 2, 3)

    # dp_dxu = (f * I2) @ dxd_dxu; dp_dXX = dp_dxu @ dxu_dXX.
    dxd_dxu = projection.distort_jac_point(k1, k2, xu)  # (K, 2, 2)
    dp_dxu = focal[..., None, None] * dxd_dxu
    dp_dXX = dp_dxu @ dxu_dXX  # (K, 2, 3)

    # Camera block: [dp_dXX @ I | dp_dXX @ (-[XX-T]_x) | xd | f * dxd_dk1k2].
    dp_dT = dp_dXX
    dp_dw = dp_dXX @ mJ
    d_dk = focal[..., None, None] * projection.distort_jac_params(xu)  # (K, 2, 2)
    Jc = jnp.concatenate([dp_dT, dp_dw, xd[..., None], d_dk], axis=-1)  # (K, 2, 9)

    # Point block: dp_dXX @ R (BAFunctor.h:258).
    Jp = dp_dXX @ R  # (K, 2, 3)

    # Robust outer derivative and residual scaling.
    outer = robust.robust_outer_derivative(tau2, r)  # (K, 2, 2)
    Jc = outer @ Jc
    Jp = outer @ Jp
    f = r * robust.robust_scale(tau2, r)[..., None]
    return JacobianBlocks(Jc=Jc, Jp=Jp, f=f)


def gradient(blocks: JacobianBlocks, cam_idx, pt_idx, n_cameras: int, n_points: int):
    """JtRes = -J^T f in block form: (-sum Jc^T f per cam, -sum Jp^T f per point).

    The reference computes the same vector densely at
    BacktrackLevMarqCholesky.h:250.  Returns (g_cams (N,9), g_pts (M,3)).
    """
    gc = jnp.einsum("kri,kr->ki", blocks.Jc, blocks.f)  # (K, 9)
    gp = jnp.einsum("kri,kr->ki", blocks.Jp, blocks.f)  # (K, 3)
    g_cams = -jax.ops.segment_sum(gc, cam_idx, num_segments=n_cameras)
    g_pts = -jax.ops.segment_sum(gp, pt_idx, num_segments=n_points)
    return g_cams, g_pts
