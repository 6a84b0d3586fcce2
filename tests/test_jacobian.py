"""Analytic Jacobian blocks vs jax.jacfwd through the manifold update.

The oracle: J_analytic must equal d/d(delta) residuals(apply_step(x, delta))
at delta = 0 — this validates the full chain including the left-multiplied
incremental Rodrigues parameterization (BAFunctor.h:126-142, update_params
:299-342) and the robust outer derivative (:227-242).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bundleadjustment_benchmarks_tpu.models.problem import apply_step
from bundleadjustment_benchmarks_tpu.ops import jacobian, projection

from conftest import make_synthetic_problem


def dense_jacobian_autodiff(problem):
    """(2K, 3M + 9N) dense Jacobian via jacfwd wrt a zero manifold step."""
    state, obs = problem.state, problem.obs
    m, n = problem.n_points, problem.n_cameras
    tau2 = problem.tau2

    def h(flat):
        dxp = flat[: 3 * m].reshape(m, 3)
        dxc = flat[3 * m :].reshape(n, 9)
        st = apply_step(state, dxp, dxc)
        return projection.residuals(st, obs, tau2).reshape(-1)

    return jax.jacfwd(h)(jnp.zeros(3 * m + 9 * n))


def dense_jacobian_analytic(problem):
    state, obs = problem.state, problem.obs
    m, n = problem.n_points, problem.n_cameras
    blocks = jacobian.residuals_and_jacobian(state, obs, problem.tau2)
    K = obs.n_observations
    J = np.zeros((2 * K, 3 * m + 9 * n))
    Jc = np.asarray(blocks.Jc)
    Jp = np.asarray(blocks.Jp)
    ci = np.asarray(obs.cam_idx)
    pi = np.asarray(obs.pt_idx)
    for i in range(K):
        J[2 * i : 2 * i + 2, 3 * pi[i] : 3 * pi[i] + 3] = Jp[i]
        J[2 * i : 2 * i + 2, 3 * m + 9 * ci[i] : 3 * m + 9 * ci[i] + 9] = Jc[i]
    return J, blocks


def test_jacobian_matches_autodiff():
    problem = make_synthetic_problem(n_cameras=3, n_points=6, obs_per_point=2, seed=7)
    J_auto = np.asarray(dense_jacobian_autodiff(problem))
    J_analytic, blocks = dense_jacobian_analytic(problem)
    np.testing.assert_allclose(J_analytic, J_auto, rtol=1e-6, atol=1e-9)


def test_residuals_match_energy():
    problem = make_synthetic_problem(seed=3)
    blocks = jacobian.residuals_and_jacobian(
        problem.state, problem.obs, problem.tau2
    )
    f2 = projection.residuals(problem.state, problem.obs, problem.tau2)
    np.testing.assert_allclose(blocks.f, f2, rtol=1e-13)


def test_gradient_matches_dense():
    problem = make_synthetic_problem(seed=11)
    J_analytic, blocks = dense_jacobian_analytic(problem)
    f = np.asarray(blocks.f).reshape(-1)
    g_dense = -J_analytic.T @ f
    m = problem.n_points
    g_cams, g_pts = jacobian.gradient(
        blocks,
        problem.obs.cam_idx,
        problem.obs.pt_idx,
        problem.n_cameras,
        problem.n_points,
    )
    np.testing.assert_allclose(
        np.asarray(g_pts).reshape(-1), g_dense[: 3 * m], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g_cams).reshape(-1), g_dense[3 * m :], rtol=1e-9, atol=1e-12
    )
