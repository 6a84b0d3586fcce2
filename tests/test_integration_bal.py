"""Full-stack integration: LM on real BAL data vs recorded f64 oracles.

The reference's de-facto correctness check is printout parity across its
five binaries on the same BAL input (SURVEY.md section 4). These tests pin
the jit-driven LM (the bench path) on problem-21 against recorded energies
from the f64 CPU run — any regression in ingestion, Jacobian, Schur
reduction, damping control flow, or manifold updates moves these numbers.

Recorded with: drive='jit', max_iter=6, f64, this repo @ cached-pair-gram.
Tolerance is loose (0.5%): accept/reject trajectories amplify benign
rounding differences across BLAS/platforms; a real bug moves energies by
far more (e.g. the TPU eigh NaN regression stalled moreqr at 1884.9).
"""

import pytest

from bundleadjustment_benchmarks_tpu.ops import projection
from bundleadjustment_benchmarks_tpu.solvers import lm

from conftest import problem21  # noqa: F401  (fixture)

#: (mode -> final Sum psi energy after 6 LM iterations, f64 oracle).
#: qrkit (Moré-cached camera QR) and spqr (whole-matrix QR per trial) are
#: DISTINCT realizations since round 4 (schur.MODE_STRATEGY) that solve the
#: same damped system; both must stay within tolerance of the recorded
#: value — the shared oracle pins their mutual and historical parity.
ORACLE_6ITER = {
    "cholesky": 1571.7996228190314,
    "qrchol": 1571.083942269066,
    "moreqr": 1578.7991240545743,
    "qrkit": 1585.749697306041,
    "spqr": 1585.749697306041,
}

#: Pre-optimization stats, matching the reference binaries' printout on
#: problem-21 (bundle_adjustment_large.cpp:111-114): initial energy and the
#: 'true objective' are pure functions of the parsed problem.
INITIAL_ENERGY = 1884.922805967446


@pytest.mark.parametrize("mode", sorted(ORACLE_6ITER))
def test_problem21_lm_energy_vs_oracle(mode, problem21):  # noqa: F811
    problem = problem21
    e0 = float(projection.energy(problem.state, problem.obs, problem.tau2))
    assert abs(e0 - INITIAL_ENERGY) < 1e-6 * INITIAL_ENERGY

    res = lm.minimize(
        problem, mode=mode, config=lm.LMConfig(drive="jit", max_iter=6)
    )
    oracle = ORACLE_6ITER[mode]
    assert res.fun_evals == 12  # one prepare + one accepted trial per iter
    assert abs(res.energy - oracle) < 5e-3 * oracle, (mode, res.energy)
