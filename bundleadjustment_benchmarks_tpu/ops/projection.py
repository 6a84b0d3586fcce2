"""Camera projection + radial distortion kernels (array-based, batched).

TPU-native rework of the reference's per-object CameraMatrix /
DistortionFunction hot-path methods:
  * transformPointIntoCameraSpace: /root/reference/src/CameraMatrix.cpp:259-261
  * DistortionFunction::operator(): /root/reference/src/DistortionFunction.cpp:14-23
  * BAFunctor::projectPoint (focal * distorted): BAFunctor.h:151-156
  * CameraMatrix::projectPoint (full affine K): CameraMatrix.cpp:225-236

Unlike the reference's AoS C++ objects with cached K^-1/R^T/center, everything
here is a pure function over SoA arrays; under jit XLA fuses the chain, so no
caching is needed. All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.ops import robust


def transform_into_camera_space(R: jax.Array, T: jax.Array, X: jax.Array) -> jax.Array:
    """XX = R @ X + T. (..., 3, 3), (..., 3), (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, X) + T


def distort(k1: jax.Array, k2: jax.Array, xu: jax.Array) -> jax.Array:
    """xd = (1 + k1 r^2 + k2 r^4) * xu, r^2 = |xu|^2 (DistortionFunction.cpp:14-23)."""
    r2 = jnp.sum(xu * xu, axis=-1)
    kr = 1.0 + k1 * r2 + k2 * r2 * r2
    return kr[..., None] * xu


def distort_jac_params(xu: jax.Array) -> jax.Array:
    """d(xd)/d(k1,k2) as (..., 2, 2): [[x r2, x r4], [y r2, y r4]].

    Reference DistortionFunction.cpp:25-36.
    """
    r2 = jnp.sum(xu * xu, axis=-1)
    r4 = r2 * r2
    return jnp.stack(
        [
            jnp.stack([xu[..., 0] * r2, xu[..., 0] * r4], axis=-1),
            jnp.stack([xu[..., 1] * r2, xu[..., 1] * r4], axis=-1),
        ],
        axis=-2,
    )


def distort_jac_point(k1: jax.Array, k2: jax.Array, xu: jax.Array) -> jax.Array:
    """d(xd)/d(xu) as symmetric (..., 2, 2) (DistortionFunction.cpp:38-51)."""
    r2 = jnp.sum(xu * xu, axis=-1)
    kr = 1.0 + k1 * r2 + k2 * r2 * r2
    dkr = 2.0 * k1 + 4.0 * k2 * r2
    x, y = xu[..., 0], xu[..., 1]
    d00 = kr + x * x * dkr
    d01 = x * y * dkr
    d11 = kr + y * y * dkr
    return jnp.stack(
        [jnp.stack([d00, d01], axis=-1), jnp.stack([d01, d11], axis=-1)], axis=-2
    )


def project(
    R: jax.Array,
    T: jax.Array,
    focal: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    X: jax.Array,
) -> jax.Array:
    """Hot-path projection: focal * distort(perspective(R X + T)).

    Matches BAFunctor::projectPoint (BAFunctor.h:151-156): only K(0,0) is used
    (BAL K is diag(-f,-f,1), so focal is the NEGATIVE focal length).
    """
    XX = transform_into_camera_space(R, T, X)
    xu = XX[..., :2] / XX[..., 2:3]
    xd = distort(k1, k2, xu)
    return focal[..., None] * xd


def project_affine(
    K: jax.Array,
    R: jax.Array,
    T: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    X: jax.Array,
) -> jax.Array:
    """Full-intrinsic projection used by the statistics printouts.

    Matches CameraMatrix::projectPoint(distortion, X) (CameraMatrix.cpp:225-236):
        p = distort(perspective(R X + T))
        out = (K00 p0 + K01 p1 + K02,  K11 p1 + K12)
    For BAL data (K01=K02=K12=0) this equals ``project``.
    """
    XX = transform_into_camera_space(R, T, X)
    xu = XX[..., :2] / XX[..., 2:3]
    p = distort(k1, k2, xu)
    out0 = K[..., 0, 0] * p[..., 0] + K[..., 0, 1] * p[..., 1] + K[..., 0, 2]
    out1 = K[..., 1, 1] * p[..., 1] + K[..., 1, 2]
    return jnp.stack([out0, out1], axis=-1)


def residuals_raw(state, obs, compute_dtype=None) -> jax.Array:
    """Unrobustified reprojection residuals r_i = project_i - measurement_i, (K, 2).

    Mixed precision (``compute_dtype``): XX = R X + T stays in the state
    dtype (far-field cancellation), the rest of the chain runs in
    compute_dtype — see jacobian.residuals_and_jacobian.
    """
    R = state.R[obs.cam_idx]
    T = state.T[obs.cam_idx]
    focal = state.K[obs.cam_idx, 0, 0]
    k1 = state.k1[obs.cam_idx]
    k2 = state.k2[obs.cam_idx]
    X = state.points[obs.pt_idx]
    XX = transform_into_camera_space(R, T, X)
    meas = obs.measurements
    if compute_dtype is not None and XX.dtype != compute_dtype:
        XX = XX.astype(compute_dtype)
        focal = focal.astype(compute_dtype)
        k1 = k1.astype(compute_dtype)
        k2 = k2.astype(compute_dtype)
        meas = meas.astype(compute_dtype)
    xu = XX[..., :2] / XX[..., 2:3]
    xd = distort(k1, k2, xu)
    return focal[..., None] * xd - meas


def residuals(state, obs, tau2, compute_dtype=None) -> jax.Array:
    """Robustified residual vector, (K, 2): r_i * sqrt(psi(|r|^2))/max(eps,|r|).

    Matches BAFunctor::E_pos (BAFunctor.h:160-178); sum(out**2) == sum(psi).
    """
    r = residuals_raw(state, obs, compute_dtype)
    return r * robust.robust_scale(tau2, r)[..., None]


def accumulation_dtype(dtype):
    """f64 accumulation for f32 storage when x64 is on (mixed precision):
    scalars like the energy cost nothing in f64 but keep the LM accept test
    and flatline check meaningful at f32 array precision."""
    return jnp.float64 if jax.config.jax_enable_x64 else dtype


def energy(state, obs, tau2, compute_dtype=None) -> jax.Array:
    """LM objective: squared norm of the robustified residual vector."""
    f = residuals(state, obs, tau2, compute_dtype)
    return jnp.sum(f * f, dtype=accumulation_dtype(f.dtype))
