"""Mixed-precision path: f64 geometry + f32 Schur matmuls must still converge.

Pure-f32 BA on BAL-scale data is numerically impossible (far-field points
make R X + T catastrophically cancel; V's f32 formation error exceeds any
reasonable damping) — verified empirically on problem-21. The supported fast
path is mixed: LMConfig(matmul_dtype='float32').
"""

import numpy as np
import pytest

from bundleadjustment_benchmarks_tpu.ops import jacobian, projection
from bundleadjustment_benchmarks_tpu.solvers import lm, schur

from conftest import make_synthetic_problem


@pytest.mark.parametrize("mode", schur.MODES)
def test_mixed_solve_close_to_f64(mode):
    problem = make_synthetic_problem(n_cameras=4, n_points=12, obs_per_point=3, seed=6)
    blocks = jacobian.residuals_and_jacobian(
        problem.state, problem.obs, problem.tau2
    )
    lam = 0.05
    ctx64 = schur.build_context(blocks, problem, mode)
    dxp64, dxc64 = schur.solve_damped(ctx64, lam, problem, mode)
    import jax.numpy as jnp

    ctx32 = schur.build_context(blocks, problem, mode, mm_dtype=jnp.float32)
    dxp32, dxc32 = schur.solve_damped(
        ctx32, lam, problem, mode, mm_dtype=jnp.float32
    )
    # f32 matmul roundoff is amplified by the reduced system's (Jacobi-
    # scaled) conditioning; ~1e-3 relative agreement is the expected regime,
    # and LM-level convergence (below) is the functional criterion. qrkit's
    # cached camera factor adds one more f32 gram formation
    # (Rcc = gram-sqrt of U - sum QtRpc^T QtRpc, schur.build_context), so
    # its budget is 2x the direct modes'.
    tol = 2e-2 if mode == "qrkit" else 1e-2
    scale = float(np.abs(np.asarray(dxc64)).max())
    np.testing.assert_allclose(
        np.asarray(dxc32), np.asarray(dxc64), atol=tol * scale
    )
    np.testing.assert_allclose(
        np.asarray(dxp32), np.asarray(dxp64),
        atol=tol * float(np.abs(np.asarray(dxp64)).max()),
    )


def test_mixed_lm_converges():
    # inlier_threshold=2.0 -> smooth deterministic basin (the default
    # tau=0.5 landscape is a chaotic ladder of truncation plateaus; see
    # utils/synthetic.py) so a tight convergence contract is meaningful.
    problem = make_synthetic_problem(
        n_cameras=4, n_points=20, obs_per_point=3, seed=7,
        inlier_threshold=2.0,
    )
    e0 = float(projection.energy(problem.state, problem.obs, problem.tau2))
    cfg = lm.LMConfig(drive="jit", max_iter=15, matmul_dtype="float32")
    res = lm.minimize(problem, mode="cholesky", config=cfg)
    assert res.energy < 1e-3 * e0


def test_refine_step_mechanics_and_divergence():
    """Mixed-precision iterative refinement (LMConfig.refine_steps /
    schur.refine_step — the VERDICT r4 item-5 structural experiment).

    Two pinned facts (the measured round-5 result, BASELINE.md "df32
    step-refinement experiment"):

    1. the residual + correction plumbing is EXACT: refining the f64 step
       through the f64 path is a fixed point (drift at the solver's own
       residual level);
    2. refining an f32-formed step through the f32-formed system does NOT
       contract — the reduced camera system's condition number (~2e9 on
       this tiny synthetic problem; ~1e12 unscaled on BAL, see
       _camera_solve_chol) times f32 STORAGE rounding of S (~8e-8
       relative, measured) exceeds 1, so each pass amplifies by ~2-3x.
       The df32 accuracy split is therefore NOT closable by per-trial
       step refinement against the f32 system — a measured negative with
       a mechanism, complementing the r4 trajectory-level negative
       (adaptive-handover experiment).
    """
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_synthetic_problem
    from bundleadjustment_benchmarks_tpu.solvers import schur
    from bundleadjustment_benchmarks_tpu.ops import jacobian

    problem = make_synthetic_problem(n_cameras=5, n_points=40, obs_per_point=3,
                                     seed=9)
    blocks = jacobian.residuals_and_jacobian(
        problem.state, problem.obs, problem.tau2
    )
    lam = 1e-4
    for mode in ("cholesky", "qrchol", "moreqr"):
        ctx64 = schur.build_context(blocks, problem, mode)
        dxp64, dxc64 = schur.solve_damped(ctx64, lam, problem, mode)

        # Fact 1: f64 fixed point.
        dxpr, dxcr = schur.refine_step(ctx64, lam, problem, mode,
                                       dxp64, dxc64)
        drift = float(np.linalg.norm(np.asarray(dxcr - dxc64))) / float(
            np.linalg.norm(np.asarray(dxc64)))
        assert drift < 1e-6, (mode, drift)

        # Fact 2: f32 non-contraction (documented divergence).
        ctx32 = schur.build_context(blocks, problem, mode,
                                    mm_dtype=jnp.float32)
        dxp, dxc = schur.solve_damped(
            ctx32, lam, problem, mode, mm_dtype=jnp.float32,
        )
        err0 = float(np.linalg.norm(np.asarray(dxc - dxc64)))
        dxp, dxc = schur.refine_step(
            ctx32, lam, problem, mode, dxp, dxc, mm_dtype=jnp.float32,
        )
        err1 = float(np.linalg.norm(np.asarray(dxc - dxc64)))
        # Not a contraction: the pass must not magically fix the step
        # (if this ever starts contracting, the negative result is stale
        # and refine_steps deserves promotion to a supported drive).
        assert err1 > 0.5 * err0, (mode, err0, err1)
