"""Robust kernels (smooth truncated quadratics) used by the BA objective.

Reference sources:
  * psi / psi_weight / psi_hat: /root/reference/src/Optimization/BAFunctor.h:147-149
  * the *different* cubic kernel used only by the "true objective" printout:
    /root/reference/src/Utils.h:10-13

All functions are elementwise and dtype-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Epsilon guard used by the reference residual/Jacobian scaling
#: (BAFunctor.h:159).
EPS_PSI_RESIDUAL = 1e-15


def psi(tau2, r2):
    """Smooth truncated quadratic: r2*(2 - r2/tau2)/4 if r2 < tau2 else tau2/4.

    Reference BAFunctor.h:147.
    """
    r2 = jnp.asarray(r2)
    tau2 = jnp.asarray(tau2, r2.dtype)
    return jnp.where(r2 < tau2, r2 * (2.0 - r2 / tau2) / 4.0, tau2 / 4.0)


def psi_weight(tau2, r2):
    """max(0, 1 - r2/tau2). Reference BAFunctor.h:148."""
    r2 = jnp.asarray(r2)
    tau2 = jnp.asarray(tau2, r2.dtype)
    return jnp.maximum(jnp.zeros_like(r2), 1.0 - r2 / tau2)


def psi_hat(tau2, r2, w2):
    """Half-quadratic lifted form: w2*r2 + tau2/2*(w2-1)^2. Reference BAFunctor.h:149."""
    r2 = jnp.asarray(r2)
    tau2 = jnp.asarray(tau2, r2.dtype)
    return w2 * r2 + tau2 / 2.0 * (w2 - 1.0) * (w2 - 1.0)


def psi_cubic(tau2, r2):
    """The 'true objective' kernel: r2*(3 - 3 r2/tau2 + (r2/tau2)^2)/6, capped tau2/6.

    Reference Utils.h:10-13. NOTE the reference call site passes a NORM (not a
    squared norm) as ``r2`` (Utils.h:61-62); callers replicate that quirk for
    output parity, not this function.
    """
    r2 = jnp.asarray(r2)
    tau2 = jnp.asarray(tau2, r2.dtype)
    r4 = r2 * r2
    tau4 = tau2 * tau2
    return jnp.where(
        r2 < tau2,
        r2 * (3.0 - 3.0 * r2 / tau2 + r4 / tau4) / 6.0,
        tau2 / 6.0,
    )


def robust_scale(tau2, r: jax.Array) -> jax.Array:
    """Per-observation residual scale s = sqrt(psi(tau2, |r|^2)) / max(eps, |r|).

    The reference emits residuals r_i * s so that sum(fvec^2) == sum(psi)
    (BAFunctor.h:160-178). ``r`` is (..., 2); returns (...,).
    """
    r2 = jnp.sum(r * r, axis=-1)
    sqrt_psi = jnp.sqrt(psi(tau2, r2))
    rnorm = jnp.maximum(jnp.asarray(EPS_PSI_RESIDUAL, r.dtype), jnp.sqrt(r2))
    return sqrt_psi / rnorm


def robust_outer_derivative(tau2, r: jax.Array) -> jax.Array:
    """2x2 outer derivative of the robustified residual wrt the raw residual.

    Reference BAFunctor.h:227-242:
        W/2 * psi^(-1/2) * r r^T/|r|  +  sqrt(psi)/r^2 * (|r| I - r r^T/|r|)
    with eps=1e-15 guards on 1/sqrt(psi), 1/r^2 and 1/|r|.

    ``r`` is (..., 2); returns (..., 2, 2).
    """
    dtype = r.dtype
    eps = jnp.asarray(EPS_PSI_RESIDUAL, dtype)
    r2 = jnp.sum(r * r, axis=-1)
    W = psi_weight(tau2, r2)
    sqrt_psi = jnp.sqrt(psi(tau2, r2))
    rsqrt_psi = 1.0 / jnp.maximum(eps, sqrt_psi)
    rcp_r2 = 1.0 / jnp.maximum(eps, r2)
    rnorm_r = 1.0 / jnp.maximum(eps, jnp.sqrt(r2))
    rrt = r[..., :, None] * r[..., None, :] * rnorm_r[..., None, None]
    rI = jnp.sqrt(r2)[..., None, None] * jnp.eye(2, dtype=dtype)
    return (
        (W / 2.0 * rsqrt_psi)[..., None, None] * rrt
        + (sqrt_psi * rcp_r2)[..., None, None] * (rI - rrt)
    )
