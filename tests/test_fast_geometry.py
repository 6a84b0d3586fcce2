"""df32 ("fast geometry") path: planar Jacobian/energy vs f64 oracles + LM drive.

The df32 drive (LMConfig.geometry="df32") replaces every K/M-sized f64 HLO
with two-float compensated f32 (ops/twofloat.py, planar layout — see
jacobian.residuals_and_jacobian_fast). These tests pin its accuracy against
the f64 reference implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.ops import jacobian, projection
from bundleadjustment_benchmarks_tpu.solvers import lm, schur

from conftest import make_synthetic_problem


@pytest.fixture(scope="module")
def synth():
    return make_synthetic_problem(n_cameras=5, n_points=40, obs_per_point=4, seed=11)


def test_fast_blocks_match_f64(synth):
    fast = problem_mod.to_fast(synth.state)
    b64 = jacobian.residuals_and_jacobian(synth.state, synth.obs, synth.tau2)
    bft = jacobian.residuals_and_jacobian_fast(fast, synth.obs, synth.tau2)
    for name in ("Jc", "Jp", "f"):
        a = np.asarray(getattr(b64, name), np.float64)
        b = np.asarray(getattr(bft, name), np.float64)
        scale = max(np.abs(a).max(), 1.0)
        # The f32 chain past the (compensated) transform carries ~1e-4
        # worst-entry relative error — identical to the established
        # compute_dtype=f32 mixed path (see the fast-vs-mixed check below).
        assert np.abs(a - b).max() / scale < 1e-3, name
    bmx = jacobian.residuals_and_jacobian(
        synth.state, synth.obs, synth.tau2, compute_dtype=jnp.float32
    )
    # And the fast path must be at least as accurate as the mixed path.
    for name in ("Jc", "Jp", "f"):
        a = np.asarray(getattr(b64, name), np.float64)
        m = np.asarray(getattr(bmx, name), np.float64)
        b = np.asarray(getattr(bft, name), np.float64)
        assert np.abs(a - b).max() <= np.abs(a - m).max() * 4.0 + 1e-7, name


def test_fast_energy_matches_f64(synth):
    fast = problem_mod.to_fast(synth.state)
    e64 = float(projection.energy(synth.state, synth.obs, synth.tau2))
    eft = float(projection.energy_fast(fast, synth.obs, synth.tau2))
    assert abs(e64 - eft) <= 1e-5 * max(abs(e64), 1.0)


def test_fast_state_roundtrip(synth):
    fast = problem_mod.to_fast(synth.state)
    back = problem_mod.from_fast(fast)
    np.testing.assert_allclose(
        np.asarray(back.points), np.asarray(synth.state.points), rtol=1e-14
    )
    np.testing.assert_array_equal(np.asarray(back.R), np.asarray(synth.state.R))


def test_apply_step_fast_matches(synth):
    fast = problem_mod.to_fast(synth.state)
    rng = np.random.default_rng(0)
    dxp = jnp.asarray(rng.standard_normal((synth.n_points, 3)) * 1e-3, jnp.float32)
    dxc = jnp.asarray(rng.standard_normal((synth.n_cameras, 9)) * 1e-3, jnp.float64)
    s64 = problem_mod.apply_step(synth.state, dxp.astype(jnp.float64), dxc)
    sft = problem_mod.from_fast(problem_mod.apply_step_fast(fast, dxp, dxc))
    np.testing.assert_allclose(
        np.asarray(sft.points), np.asarray(s64.points), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(sft.R), np.asarray(s64.R), rtol=1e-14)


@pytest.fixture(scope="module")
def synth_smooth():
    # inlier_threshold=2.0: no observation starts truncated, so the basin is
    # smooth and every drive converges deterministically to the noise floor
    # (the default tau=0.5 landscape is a ladder of truncation plateaus and
    # which rung LM lands on is chaotic in rounding noise — wrong fixture
    # for a convergence contract; see utils/synthetic.py).
    return make_synthetic_problem(
        n_cameras=5, n_points=40, obs_per_point=4, seed=11,
        inlier_threshold=2.0,
    )


@pytest.mark.parametrize("mode", ["cholesky", "qrchol"])
def test_df32_lm_converges(mode, synth_smooth):
    synth = synth_smooth
    cfg64 = lm.LMConfig(drive="jit", max_iter=40)
    cfgdf = lm.LMConfig(drive="jit", max_iter=40, geometry="df32")
    res64 = lm.minimize(synth, mode=mode, config=cfg64)
    resdf = lm.minimize(synth, mode=mode, config=cfgdf)
    e0 = float(projection.energy(synth.state, synth.obs, synth.tau2))
    assert res64.energy < 1e-3 * e0
    # df32 must reach the same noise-floor plateau as f64 (sub-percent).
    assert resdf.energy <= res64.energy * 1.01
    assert resdf.status in (
        lm.LMStatus.Success,
        lm.LMStatus.ExceededLambdaMax,  # "Success (Exceeded Maximum Lambda)"
        lm.LMStatus.MaxItersReached,
    )


def test_df32_host_drive(synth):
    cfg = lm.LMConfig(drive="host", max_iter=15, geometry="df32")
    res = lm.minimize(synth, mode="cholesky", config=cfg)
    e0 = float(projection.energy(synth.state, synth.obs, synth.tau2))
    assert res.energy < 0.5 * e0
    assert isinstance(res.state, problem_mod.BAState)


def test_df32_all_modes(synth):
    e0 = float(projection.energy(synth.state, synth.obs, synth.tau2))
    for mode in schur.MODES:
        cfg = lm.LMConfig(drive="jit", max_iter=30, geometry="df32")
        res = lm.minimize(synth, mode=mode, config=cfg)
        assert res.energy < 0.5 * e0, mode
