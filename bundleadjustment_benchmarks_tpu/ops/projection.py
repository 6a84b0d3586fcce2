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
from bundleadjustment_benchmarks_tpu.ops import twofloat as tf


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


#: Planar camera pack rows: 9 R.hi, 9 R.lo, 3 T.hi, 3 T.lo, focal, k1, k2.
CAM_PACK_ROWS = 27


def planar_camera_pack(fast) -> jax.Array:
    """(27, N) f32 planar pack of the per-camera geometry parameters.

    PLANAR LAYOUT RATIONALE: TPU vector tiles are (8 sublanes, 128 lanes) over
    the TRAILING two dims. Gathered (K, 3, 3) tensors waste 97% of each lane
    tile and — worse — extracting a scalar component [..., i, j] is a strided
    relayout (~40us each on a v5e; ~36 of them dominated the geometry chain).
    In (component, K) planar form, a component is a contiguous (K,) row:
    slicing is free and every element-wise op runs on full lanes.
    """
    R_df = tf.from_array(fast.R)  # N-sized split: negligible
    T_df = tf.from_array(fast.T)
    return jnp.concatenate(
        [
            R_df.hi.reshape(-1, 9).T,
            R_df.lo.reshape(-1, 9).T,
            T_df.hi.T,
            T_df.lo.T,
            fast.K[:, 0, 0].astype(jnp.float32)[None],
            fast.k1.astype(jnp.float32)[None],
            fast.k2.astype(jnp.float32)[None],
        ],
        axis=0,
    )


def planar_gather(fast, obs):
    """Gather the per-observation planar operands (XLA-side, outside kernels).

    Returns (camg (27, K), ptsg (6, K)) f32 planar components.
    """
    cam = planar_camera_pack(fast)  # (27, N)
    pts = jnp.concatenate([fast.points.hi, fast.points.lo], axis=0)  # (6, M)
    return cam[:, obs.cam_idx], pts[:, obs.pt_idx]


def planar_transform_df(camg, ptsg):
    """World->camera transform in two-float arithmetic on planar components.

    The single precision-critical step (CameraMatrix.cpp:259-261): |R X| ~ 1e4
    cancels to z ~ 4, so products must be exact (two_prod) and the
    accumulation compensated. ``camg``/``ptsg`` are any indexables of
    like-shaped f32 components (rows of a (27, ...) array work) — the same
    code runs as XLA element-wise ops and inside Pallas kernels on tiles.

    Returns (RX list of 3 DF == R X, XX list of 3 DF == R X + T).
    """
    X = [tf.DF(ptsg[i], ptsg[3 + i]) for i in range(3)]

    def R_df(i, j):
        return tf.DF(camg[3 * i + j], camg[9 + 3 * i + j])

    RX = []
    for i in range(3):
        acc = tf.mul(R_df(i, 0), X[0])
        acc = tf.add(acc, tf.mul(R_df(i, 1), X[1]))
        acc = tf.add(acc, tf.mul(R_df(i, 2), X[2]))
        RX.append(acc)
    XX = [tf.add(RX[i], tf.DF(camg[18 + i], camg[21 + i])) for i in range(3)]
    return RX, XX


def planar_geometry_df(fast, obs):
    """Per-observation df32 geometry in planar form (zero f64 HLOs on K/M data).

    Returns (camg (27, K) f32 planar camera components, RX list of 3 DF
    (K,)-components == R X, XX list of 3 DF == R X + T).
    """
    camg, ptsg = planar_gather(fast, obs)
    RX, XX = planar_transform_df(camg, ptsg)
    return camg, RX, XX


def planar_residual_comps(camg, XX, m0, m1):
    """(r0, r1, kr, xu0, xu1, r2, invz) planar f32 components of the raw
    residual chain (shared by the fast energy and Jacobian; kernel-safe)."""
    z = XX[2].hi
    invz = 1.0 / z
    xu0 = XX[0].hi * invz
    xu1 = XX[1].hi * invz
    r2 = xu0 * xu0 + xu1 * xu1
    k1, k2, focal = camg[25], camg[26], camg[24]
    kr = 1.0 + k1 * r2 + k2 * r2 * r2
    r0 = focal * kr * xu0 - m0
    r1 = focal * kr * xu1 - m1
    return r0, r1, kr, xu0, xu1, r2, invz


def _planar_residual_comps(camg, XX, obs):
    m = obs.measurements.astype(jnp.float32)
    return planar_residual_comps(camg, XX, m[:, 0], m[:, 1])


def planar_energy_df(camg, XX, m0, m1, tau2) -> tf.DF:
    """Per-observation robustified squared residual (== psi contribution) as a
    DF, on planar components (kernel-safe). Summing the returned DF over
    observations gives the LM objective to ~2^-48 relative."""
    r0, r1, *_ = planar_residual_comps(camg, XX, m0, m1)
    rn2 = r0 * r0 + r1 * r1
    tau2f = jnp.asarray(tau2, jnp.float32)
    # Stable residual scale s = sqrt(psi)/|r|, closed per branch (see the
    # planar_blocks_chain robust-outer derivation — same formula, so the
    # fast energy is EXACTLY the objective whose derivative the fast
    # Jacobian computes): inlier sqrt(2 - rn2/tau2)/2, outlier tau/(2 |r|).
    u = rn2 / tau2f
    rn2_out = jnp.maximum(rn2, tau2f)
    s = jnp.where(
        rn2 < tau2f,
        jnp.sqrt(jnp.maximum(2.0 - u, 0.0)) / 2.0,
        jnp.sqrt(tau2f) / (2.0 * jnp.sqrt(rn2_out)),
    )
    return tf.add(tf.prod_ff(r0 * s, r0 * s), tf.prod_ff(r1 * s, r1 * s))


def residuals_raw_fast(fast, obs) -> jax.Array:
    """Unrobustified residuals on the df32 fast state, (K, 2) f32."""
    camg, _, XX = planar_geometry_df(fast, obs)
    r0, r1, *_ = _planar_residual_comps(camg, XX, obs)
    return jnp.stack([r0, r1], axis=-1)


def energy_fast(fast, obs, tau2) -> jax.Array:
    """LM objective on the df32 fast state: compensated f32 reduction.

    The flatline stop compares energies at 1e-8 relative
    (BacktrackLevMarqCholesky.h:343-350); a plain f32 sum has ~1e-7 noise at
    K ~ 1e5, so the reduction runs as a two-float tree sum (~2^-48) and only
    the final SCALAR converts to the accumulation dtype.
    """
    camg, _, XX = planar_geometry_df(fast, obs)
    m = obs.measurements.astype(jnp.float32)
    # psi-scaled squared residual == psi itself (BAFunctor.h:160-178):
    # (r * sqrt(psi)/max(eps,|r|))^2 summed over the 2 coords = psi(|r|^2),
    # up to the eps guard which we keep via the same scale formula.
    e = tf.sum_df(planar_energy_df(camg, XX, m[:, 0], m[:, 1], tau2))
    acc = accumulation_dtype(jnp.float32)
    return tf.to_f64(e) if acc == jnp.float64 else tf.to_f32(e)


def compensated_square_sum(f: jax.Array) -> jax.Array:
    """sum(f*f) with two-float accumulation; result in the accumulation dtype.

    Drop-in replacement for jnp.sum(f*f, dtype=f64), which forces an emulated
    K-sized f64 reduce on TPU.
    """
    if f.dtype == jnp.float64:
        return jnp.sum(f * f)
    e = tf.sum_df(tf.prod_ff(f, f))
    acc = accumulation_dtype(f.dtype)
    return tf.to_f64(e) if acc == jnp.float64 else tf.to_f32(e)


def accumulation_dtype(dtype):
    """f64 accumulation for f32 storage when x64 is on (mixed precision):
    scalars like the energy cost nothing in f64 but keep the LM accept test
    and flatline check meaningful at f32 array precision."""
    return jnp.float64 if jax.config.jax_enable_x64 else dtype


def energy(state, obs, tau2, compute_dtype=None) -> jax.Array:
    """LM objective: squared norm of the robustified residual vector."""
    f = residuals(state, obs, tau2, compute_dtype)
    return jnp.sum(f * f, dtype=accumulation_dtype(f.dtype))
