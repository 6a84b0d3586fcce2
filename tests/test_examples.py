"""The ellipse-fitting LM smoke example (reference's missing Ellipse_Fitting_Test)."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples")
)

from ellipse_fitting import fit_ellipse, sample_ellipse  # noqa: E402

from bundleadjustment_benchmarks_tpu.solvers import lm  # noqa: E402
from bundleadjustment_benchmarks_tpu.solvers.norms import estimate_norm  # noqa: E402

from conftest import make_synthetic_problem  # noqa: E402


def test_ellipse_fit_recovers_parameters():
    samples = sample_ellipse(center=(1.0, -2.0), axes=(3.0, 1.5), phi=0.6)
    result = fit_ellipse(samples)
    cx, cy, a, b, phi = np.asarray(result.state)
    assert result.status in (lm.LMStatus.Success, lm.LMStatus.MaxItersReached)
    np.testing.assert_allclose([cx, cy], [1.0, -2.0], atol=0.02)
    np.testing.assert_allclose(sorted([a, b]), [1.5, 3.0], atol=0.05)
    # phi recovered modulo the ellipse's pi symmetry (and axis swap).
    assert result.energy < 0.05


def test_estimate_norm_matches_dense():
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.ops import rodrigues

    problem = make_synthetic_problem(n_cameras=3, n_points=5, seed=1)
    st = problem.state
    m, n = problem.n_points, problem.n_cameras
    rng = np.random.default_rng(0)
    diag = jnp.asarray(rng.uniform(0.5, 2.0, size=3 * m + 9 * n))
    got = float(estimate_norm(st, diag))

    # Dense reimplementation following BAFunctor.cpp:25-61 literally.
    dc = np.asarray(diag[3 * m :]).reshape(n, 9)
    omega = np.asarray(rodrigues.log_rodrigues(st.R))
    total = 0.0
    for i in range(n):
        total += np.linalg.norm(np.asarray(st.T)[i] * dc[i, 0:3])
        total += np.linalg.norm(omega[i] * dc[i, 3:6])
        total += np.linalg.norm(
            np.array([float(st.k1[i]), float(st.k2[i])]) * dc[i, 7:9]
        )
        total += abs(float(st.focal[i]) * dc[i, 6])
    total = total**2
    total += np.sum(
        (np.asarray(st.points) * np.asarray(diag[: 3 * m]).reshape(m, 3)) ** 2
    )
    np.testing.assert_allclose(got, np.sqrt(total), rtol=1e-10)
