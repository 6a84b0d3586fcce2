"""Reprojection-error statistics and the 'true objective' printouts.

Output-parity reimplementation of /root/reference/src/Utils.h:15-68. The
printed strings match the reference's shapes:

    Mean reprojection error: <value>
    Inlier mean reprojection error: <value> (<nInliers> / <K> inliers)
    True objective: <value>

Replicated quirk: showObjective passes the residual NORM (not its square) as
the ``r2`` argument of the cubic kernel (Utils.h:61-62); we do the same so the
printed objective matches bit-for-bit semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.ops import projection, robust


class ErrorStats(NamedTuple):
    mean_reprojection_error: jax.Array
    inlier_mean_reprojection_error: jax.Array
    n_inliers: jax.Array
    n_observations: int


@jax.jit
def _error_stats_impl(state, obs, avg_focal_length, inlier_threshold):
    Km = state.K[obs.cam_idx]
    p = projection.project_affine(
        Km,
        state.R[obs.cam_idx],
        state.T[obs.cam_idx],
        state.k1[obs.cam_idx],
        state.k2[obs.cam_idx],
        state.points[obs.pt_idx],
    )
    err = jnp.linalg.norm(avg_focal_length * (p - obs.measurements), axis=-1)
    inlier = err <= inlier_threshold
    n_inl = jnp.sum(inlier)
    # All-outlier guard: the reference divides unconditionally (Utils.h:38 —
    # inlier mean would print nan); report 0 instead of NaN so downstream
    # JSON/metrics stay finite on degenerate states.
    inl_mean = jnp.where(
        n_inl > 0,
        jnp.sum(jnp.where(inlier, err, 0.0)) / jnp.maximum(n_inl, 1),
        jnp.zeros((), err.dtype),
    )
    return (jnp.mean(err), inl_mean, n_inl)


def error_statistics(state, obs, avg_focal_length, inlier_threshold) -> ErrorStats:
    """Mean/inlier reprojection error (reference Utils::showErrorStatistics, Utils.h:15-43)."""
    mean_err, inl_err, n_inl = _error_stats_impl(
        state,
        obs,
        jnp.asarray(avg_focal_length, state.T.dtype),
        jnp.asarray(inlier_threshold, state.T.dtype),
    )
    return ErrorStats(mean_err, inl_err, n_inl, obs.n_observations)


@jax.jit
def _objective_impl(state, obs, avg_focal_length, tau2):
    Km = state.K[obs.cam_idx]
    p = projection.project_affine(
        Km,
        state.R[obs.cam_idx],
        state.T[obs.cam_idx],
        state.k1[obs.cam_idx],
        state.k2[obs.cam_idx],
        state.points[obs.pt_idx],
    )
    # Reference quirk (Utils.h:61): r2 := || afl^2 * (p - m) || — a norm.
    r2 = jnp.linalg.norm(
        (avg_focal_length * avg_focal_length) * (p - obs.measurements), axis=-1
    )
    return jnp.sum(robust.psi_cubic(tau2, r2))


def true_objective(state, obs, avg_focal_length, inlier_threshold) -> jax.Array:
    """The 'true objective' sum of cubic-kernel costs (reference Utils::showObjective)."""
    return _objective_impl(
        state,
        obs,
        jnp.asarray(avg_focal_length, state.T.dtype),
        jnp.asarray(inlier_threshold * inlier_threshold, state.T.dtype),
    )


def show_error_statistics(state, obs, avg_focal_length, inlier_threshold) -> float:
    """Print the reference-format stats lines; returns inlier ratio (Utils.h:42)."""
    s = error_statistics(state, obs, avg_focal_length, inlier_threshold)
    print(f"Mean reprojection error: {float(s.mean_reprojection_error):g}")
    print(
        f"Inlier mean reprojection error: {float(s.inlier_mean_reprojection_error):g}"
        f" ({int(s.n_inliers)} / {s.n_observations} inliers)"
    )
    return float(s.n_inliers) / s.n_observations


def show_objective(state, obs, avg_focal_length, inlier_threshold) -> float:
    """Print the reference-format 'True objective' line; returns the objective."""
    obj = float(true_objective(state, obs, avg_focal_length, inlier_threshold))
    print(f"True objective: {obj:g}")
    return obj
