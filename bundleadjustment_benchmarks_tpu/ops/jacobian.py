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
    return _blocks_from_geometry(
        R, XX - T, XX, focal, k1, k2, obs.measurements, tau2
    )


#: Row layout of the planar chain output: f(2), Jc row0(9), Jc row1(9),
#: Jp row0(3), Jp row1(3).
PLANAR_CHAIN_ROWS = 26


def planar_blocks_chain(camg, ptsg, m0, m1, tau2):
    """Full robustified residual + Jacobian chain on planar f32 components.

    ``camg``/``ptsg`` are indexables of 27/6 like-shaped f32 components (rows
    of a stacked array); ``m0``/``m1`` the measurement components. The same
    code runs as XLA element-wise ops over (K,) rows and inside Pallas
    kernels over (sublane, lane) tiles — this is the single source of truth
    for the df32 chain math (see residuals_and_jacobian_fast for the
    derivation notes and reference citations).

    Returns a list of PLANAR_CHAIN_ROWS components:
    [f0, f1, jc0_0..jc0_8, jc1_0..jc1_8, jp0_0..jp0_2, jp1_0..jp1_2].
    """
    RX, XX = projection.planar_transform_df(camg, ptsg)
    r0, r1, kr, xu0, xu1, r2, invz = projection.planar_residual_comps(
        camg, XX, m0, m1
    )
    focal, k1, k2 = camg[24], camg[25], camg[26]

    # dxd_dxu (DistortionFunction.cpp:38-51), scaled by focal: dp_dxu.
    dkr = 2.0 * k1 + 4.0 * k2 * r2
    p00 = focal * (kr + xu0 * xu0 * dkr)
    p01 = focal * (xu0 * xu1 * dkr)
    p11 = focal * (kr + xu1 * xu1 * dkr)

    # dp_dXX[r][c] = dp_dxu[r][:] @ dxu_dXX[:][c] (BAFunctor.h:219-225) with
    # dxu_dXX = [[invz, 0, -xu0 invz], [0, invz, -xu1 invz]].
    dp = [[None] * 3 for _ in range(2)]
    dp[0][0] = p00 * invz
    dp[0][1] = p01 * invz
    dp[0][2] = -(p00 * xu0 + p01 * xu1) * invz
    dp[1][0] = p01 * invz
    dp[1][1] = p11 * invz
    dp[1][2] = -(p01 * xu0 + p11 * xu1) * invz

    # mJ = -[XX - T]_x = -[R X]_x (BAFunctor.h:126-142).
    a, b, c = RX[0].hi, RX[1].hi, RX[2].hi
    zer = jnp.zeros_like(a)
    mJ = [[zer, c, -b], [-c, zer, a], [b, -a, zer]]

    # dp_dw[r][c] = sum_s dp[r][s] mJ[s][c].
    dpw = [
        [sum(dp[r][s] * mJ[s][ci] for s in range(3)) for ci in range(3)]
        for r in range(2)
    ]
    # Jp[r][c] = sum_s dp[r][s] R[s][c] (BAFunctor.h:258); R.hi rows 0-8.
    jp = [
        [sum(dp[r][s] * camg[3 * s + ci] for s in range(3)) for ci in range(3)]
        for r in range(2)
    ]

    # Camera block columns 6-8: focal and distortion derivatives
    # (BAFunctor.h:245-261): xd, f*xu*r2, f*xu*r4.
    xd0, xd1 = kr * xu0, kr * xu1
    r4 = r2 * r2
    jc = [
        [dp[0][0], dp[0][1], dp[0][2], dpw[0][0], dpw[0][1], dpw[0][2],
         xd0, focal * xu0 * r2, focal * xu0 * r4],
        [dp[1][0], dp[1][1], dp[1][2], dpw[1][0], dpw[1][1], dpw[1][2],
         xd1, focal * xu1 * r2, focal * xu1 * r4],
    ]

    # Robust outer 2x2 (BAFunctor.h:227-242), expanded:
    # out[i][j] = cr * r_i r_j + cd * delta_ij with
    #   cr = (W/2 * psi^-1/2 - sqrt(psi)/r^2) / |r|, cd = sqrt(psi)/r^2 * |r|.
    # STABLE CLOSED FORM (f32-critical): the reference's cr is a difference
    # of two nearly-equal O(rn2^-1/2) terms that cancels CATASTROPHICALLY for
    # small residuals — in f32 it corrupted ~34% of Jacobian entries near
    # convergence (measured cos(g_f32, g_f64) = -0.35 at the LM plateau,
    # stalling the df32 drive ~2% above the f64 basin). Substituting
    # psi = rn2 (2 - u)/4, W = 1 - u with u = rn2/tau2 gives exactly
    #   inlier  (rn2 <  tau2): cr = -1/(2 tau2 sqrt(2-u)), cd = sqrt(2-u)/2
    #   outlier (rn2 >= tau2): cr = -tau/(2 rn2^{3/2}),    cd = tau/(2 |r|)
    # (same values as BAFunctor.h:227-242 for every r != 0, no cancellation,
    # no eps guards; at r == 0 this is the true limit sqrt(1/2) I where the
    # reference's guarded expression degenerates to 0 — measure-zero event).
    tau2f = jnp.asarray(tau2, jnp.float32)
    rn2 = r0 * r0 + r1 * r1
    u = rn2 / tau2f
    inl = rn2 < tau2f
    tau = jnp.sqrt(tau2f)
    som = jnp.sqrt(jnp.maximum(2.0 - u, 0.0))  # inlier-only: 2-u in (1, 2]
    rn2_out = jnp.maximum(rn2, tau2f)  # exact on the outlier branch
    rnorm_out = jnp.sqrt(rn2_out)
    cr = jnp.where(
        inl,
        -1.0 / (2.0 * tau2f * jnp.maximum(som, 1.0)),
        -tau / (2.0 * rn2_out * rnorm_out),
    )
    cd = jnp.where(inl, som / 2.0, tau / (2.0 * rnorm_out))
    o00 = cr * r0 * r0 + cd
    o01 = cr * r0 * r1
    o11 = cr * r1 * r1 + cd

    def rob(rows):
        return [
            [o00 * rows[0][ci] + o01 * rows[1][ci] for ci in range(len(rows[0]))],
            [o01 * rows[0][ci] + o11 * rows[1][ci] for ci in range(len(rows[0]))],
        ]

    jc = rob(jc)
    jp = rob(jp)
    # Residual scale s = sqrt(psi)/|r| == cd exactly (both branches); the
    # stable form keeps f consistent with the Jacobian's outer factor.
    f0, f1 = r0 * cd, r1 * cd
    return [f0, f1] + jc[0] + jc[1] + jp[0] + jp[1]


def blocks_from_planar_rows(rows) -> JacobianBlocks:
    """Assemble PLANAR_CHAIN_ROWS planar components (a list of (K,) arrays or
    a (26, K) array) into the block tensors consumed by the MXU grams: one
    stack + transpose each (single relayout instead of dozens)."""
    if not isinstance(rows, (list, tuple)):
        rows = [rows[i] for i in range(rows.shape[0])]
    Jc = jnp.stack(rows[2:20], axis=0).T.reshape(-1, 2, 9)
    Jp = jnp.stack(rows[20:26], axis=0).T.reshape(-1, 2, 3)
    f = jnp.stack(rows[0:2], axis=0).T
    return JacobianBlocks(Jc=Jc, Jp=Jp, f=f)


def residuals_and_jacobian_fast(fast, obs, tau2) -> JacobianBlocks:
    """df32 planar variant: identical math to residuals_and_jacobian, written
    as scalar-component ("planar") arithmetic over (K,) rows.

    Two TPU-specific deviations from the array-of-structs formulation, both
    value-preserving:
      * the world->camera transform runs in two-float arithmetic
        (projection.planar_transform_df) — zero f64 HLOs on K/M-sized data;
      * every (K, a, b)-shaped intermediate with tiny trailing dims is
        replaced by its (K,) scalar components — tiny trailing dims waste
        ~95% of each (8, 128) vector tile and their slicing costs a strided
        relayout per component. Only the final Jc/Jp/f blocks are assembled
        (one transpose each) for the downstream MXU grams.

    See also ops/pallas_chain.py, which runs the same planar_blocks_chain
    inside one fused Pallas kernel (the TPU production path).
    """
    camg, ptsg = projection.planar_gather(fast, obs)
    m = obs.measurements.astype(jnp.float32)
    rows = planar_blocks_chain(camg, ptsg, m[:, 0], m[:, 1], tau2)
    return blocks_from_planar_rows(rows)


def _blocks_from_geometry(R, RXmT, XX, focal, k1, k2, measurements, tau2):
    """Shared Jacobian/residual tail. ``RXmT`` is XX - T (== R X), feeding the
    pose derivative's cross-product matrix."""
    z = XX[..., 2]
    xu = XX[..., :2] / z[..., None]
    xd = projection.distort(k1, k2, xu)
    q = focal[..., None] * xd
    r = q - measurements  # raw residual

    # poseDerivatives (BAFunctor.h:126-142): d_dRT = [I | -[XX - T]_x].
    mJ = -rodrigues.cross_product_matrix(RXmT)  # (K, 3, 3)

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
