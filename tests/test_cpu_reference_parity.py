"""Anti-circularity oracle: JAX f64 trajectory vs the independent scipy port.

The pinned-energy integration oracles (tests/test_integration_bal.py) were
recorded WITH this repo, so a bug predating the recording would be invisible
to them. This test instead runs benchmarks/cpu_reference.py — a fully
independent numpy/scipy.sparse implementation of the reference CHOLESKY
driver (splu of the whole J^T J + lambda I, no Schur elimination, no shared
kernels) — LIVE against the JAX f64 host drive on real BAL data and compares
the first accepted-iteration trajectory. No recorded constants from the JAX
path anywhere.

What agreement proves (jointly): BAL ingestion conventions
(bundle_adjustment_large.cpp:59-108), the robustified residual
(BAFunctor.h:147-178), the analytic Jacobian chain (BAFunctor.h:181-297),
the LM control flow with Nielsen updates (BacktrackLevMarqCholesky.h:299-334),
and the linear solve itself.

Expected agreement level (measured): the two code paths solve the same
ill-conditioned damped system with different factorizations (splu vs batched
Schur elimination), so steps differ at solver-conditioning level and accepted
energies drift apart by ~2e-3 relative over 5 iterations; the lambda sequence
(init = 1e-12 max diag, Nielsen clamped at 1/3 on these strongly-accepted
steps) matches to ~1e-7.
"""

import json
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tests.conftest import PROBLEM21

N_ITERS = 5


@pytest.mark.slow
def test_jax_f64_trajectory_matches_independent_scipy_port():
    from benchmarks import cpu_reference as cr
    from bundleadjustment_benchmarks_tpu.io import bal
    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm
    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare, _trial
    import jax.numpy as jnp

    # --- independent scipy path (live, no recorded constants) ---
    ds = bal.read_bal(PROBLEM21)
    st = cr.State(ds)
    cpu_trace = []
    st_out, status, iters, fun_evals, cpu_final = cr.minimize(
        st, ds.cam_idx, ds.pt_idx, ds.measurements,
        ds.n_points, ds.n_cameras, max_iter=N_ITERS, trace=cpu_trace,
    )
    assert len(cpu_trace) == N_ITERS  # all iterations accepted on first trial

    # --- JAX f64 host drive, cholesky mode ---
    problem = load_bal_problem(PROBLEM21, dtype=jnp.float64)
    cfg = lm.LMConfig(max_iter=N_ITERS, drive="host", verbose=False)
    prep = lambda s: _prepare(s, problem, "cholesky", None)  # noqa: E731
    tri = lambda c, s, la: _trial(c, s, la, problem, "cholesky", None)  # noqa: E731
    mf = tempfile.mktemp(suffix=".jsonl")
    try:
        res = lm.host_loop(problem.state, prep, tri, cfg, metrics_path=mf)
        rows = [json.loads(line) for line in open(mf)]
    finally:
        if os.path.exists(mf):
            os.remove(mf)
    assert all(r["status"] == "Accepted" for r in rows)
    assert len(rows) == N_ITERS

    # Initial energy ||f||^2 must agree tightly (pure residual math, no solve).
    # cpu trace rows: (iter, post-accept energy, post-accept lambda).
    # jax metric rows: f = PRE-accept energy at that iteration, lambda =
    # post-accept. So jax rows[0].f is the iter-0 energy; jax rows[i].f for
    # i >= 1 equals the cpu post-accept energy of iteration i.
    jax_e0 = rows[0]["f"]
    f0 = cr.residuals(cr.State(ds), ds.cam_idx, ds.pt_idx, ds.measurements)
    np.testing.assert_allclose(jax_e0, float(f0 @ f0), rtol=1e-9)

    cpu_energies = [t[1] for t in cpu_trace]
    jax_energies = [rows[i]["f"] for i in range(1, N_ITERS)] + [res.energy]
    np.testing.assert_allclose(jax_energies, cpu_energies, rtol=5e-3)
    # Energies must be strictly decreasing in both.
    assert all(np.diff(cpu_energies) < 0) and all(np.diff(jax_energies) < 0)

    cpu_lams = [t[2] for t in cpu_trace]
    jax_lams = [r["lambda"] for r in rows]
    np.testing.assert_allclose(jax_lams, cpu_lams, rtol=1e-6)

    # Post-run statistics (Utils.h:15-68) from the two independent stat
    # implementations on each path's own final state.
    from bundleadjustment_benchmarks_tpu.utils import stats as jstats

    cpu_stats = cr.error_statistics(
        st_out, ds.cam_idx, ds.pt_idx, ds.measurements
    )
    jax_stats = jstats.error_statistics(res.state, problem.obs, 1.0, 0.5)
    # The all-observations mean includes truncated-kernel outliers whose
    # positions are unconstrained (zero gradient beyond tau) and drift
    # differently under the two solvers — compare it loosely; the inlier
    # mean is the meaningful statistic.
    np.testing.assert_allclose(
        float(jax_stats.mean_reprojection_error),
        cpu_stats["mean_reprojection_error"],
        rtol=2e-2,
    )
    np.testing.assert_allclose(
        float(jax_stats.inlier_mean_reprojection_error),
        cpu_stats["inlier_mean_reprojection_error"],
        rtol=5e-3,
    )
    assert (
        abs(int(jax_stats.n_inliers) - cpu_stats["n_inliers"])
        <= 0.005 * cpu_stats["n_observations"]
    )
