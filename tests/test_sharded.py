"""Distributed Schur tests on a virtual 8-device CPU mesh.

The N-device sharded path must match the single-device path numerically
(SURVEY.md section 4: 'N-device sharded Schur reduction is bit-compared with
the single-device path without a real pod').
"""

import jax
import numpy as np
import pytest

from bundleadjustment_benchmarks_tpu.parallel import sharded
from bundleadjustment_benchmarks_tpu.solvers import lm

from conftest import make_synthetic_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return sharded.make_mesh(8)


def test_shard_problem_layout(mesh8):
    problem = make_synthetic_problem(n_cameras=4, n_points=30, obs_per_point=3, seed=0)
    sp = sharded.shard_problem(problem, mesh8)
    assert sp.n_shards == 8
    # Total real observations preserved.
    w = np.asarray(sp.obs.weights)
    assert int(w.sum()) == problem.n_observations
    # All real points preserved in order.
    pts = np.asarray(sharded.unshard_points(sp, sp.state))
    np.testing.assert_array_equal(pts, np.asarray(problem.state.points))
    # Degree-banded local tables ride the shards (VERDICT r3 item 6): every
    # shard's bands share one shape, and each shard's table gathers exactly
    # its real observations (sentinel = obs_per_shard elsewhere).
    assert sp.pt_banded is not None and sp.cam_banded is not None
    d, ks = sp.n_shards, sp.obs_per_shard
    total = 0
    for t in sp.pt_banded.tables:
        tb = np.asarray(t).reshape(d, -1, t.shape[-1])
        total += int((tb != ks).sum())
    assert total == problem.n_observations
    assert np.asarray(sp.pt_banded.unperm).shape == (d * sp.points_per_shard,)
    assert sp.cam_banded.aux is not None


@pytest.mark.parametrize("mode", ["cholesky", "qrchol", "moreqr", "qrkit", "spqr"])
def test_sharded_prepare_matches_single(mesh8, mode):
    problem = make_synthetic_problem(n_cameras=4, n_points=30, obs_per_point=3, seed=1)
    sp = sharded.shard_problem(problem, mesh8)
    prepare, _ = sharded.make_sharded_kernels(sp, mesh8, mode)
    ctx_sh, energy_sh, lam0_sh = jax.jit(prepare)(sp.state)

    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare

    ctx, energy, lam0 = _prepare(problem.state, problem, mode)
    np.testing.assert_allclose(float(energy_sh), float(energy), rtol=1e-12)
    np.testing.assert_allclose(float(lam0_sh), float(lam0), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ctx_sh.U), np.asarray(ctx.U), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ctx_sh.g_cams), np.asarray(ctx.g_cams), rtol=1e-9, atol=1e-12
    )


@pytest.mark.parametrize("mode", ["cholesky", "qrchol", "moreqr", "qrkit", "spqr"])
def test_sharded_trial_matches_single(mesh8, mode):
    problem = make_synthetic_problem(n_cameras=4, n_points=30, obs_per_point=3, seed=2)
    sp = sharded.shard_problem(problem, mesh8)
    prepare, trial = sharded.make_sharded_kernels(sp, mesh8, mode)
    ctx_sh, energy_sh, _ = jax.jit(prepare)(sp.state)
    lam = 0.05
    x_sh, e_sh, rho_sh = jax.jit(trial)(ctx_sh, sp.state, lam)

    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare, _trial

    ctx, _, _ = _prepare(problem.state, problem, mode)
    x, e, rho = _trial(ctx, problem.state, lam, problem, mode)
    np.testing.assert_allclose(float(e_sh), float(e), rtol=1e-9)
    np.testing.assert_allclose(float(rho_sh), float(rho), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(sharded.unshard_points(sp, x_sh)),
        np.asarray(x.points),
        rtol=1e-7,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(x_sh.T), np.asarray(x.T), rtol=1e-7, atol=1e-12
    )


@pytest.mark.parametrize("mode", ["cholesky", "qrchol", "moreqr", "qrkit", "spqr"])
def test_sharded_trial_skewed_degrees(mesh8, mode):
    """Skewed problem: camera 0 observes EVERY point (so one camera's
    per-shard table row is full while others are nearly empty), plus
    uneven per-point degrees. Exercises padding imbalance in
    shard_problem and the banded/padded gather paths."""
    import numpy as np

    from bundleadjustment_benchmarks_tpu.utils.synthetic import (
        make_synthetic_problem as _make,
    )

    problem = _make(n_cameras=5, n_points=40, obs_per_point=2, seed=11)
    # Rebuild with camera 0 added to every point's observation list.
    from bundleadjustment_benchmarks_tpu.io.bal import BalDataset
    from bundleadjustment_benchmarks_tpu.models.problem import from_bal_dataset

    obs = problem.obs
    cam_idx = np.asarray(obs.cam_idx)
    pt_idx = np.asarray(obs.pt_idx)
    meas = np.asarray(obs.measurements)
    extra_pts = np.arange(40, dtype=np.int32)
    keep = cam_idx != 0
    cam_idx = np.concatenate([cam_idx[keep], np.zeros(40, np.int32)])
    pt_idx = np.concatenate([pt_idx[keep], extra_pts])
    st = problem.state
    # Synthesize measurements for the new rows by projecting current state.
    from bundleadjustment_benchmarks_tpu.ops import projection

    p0 = projection.project_affine(
        st.K[np.zeros(40, int)], st.R[np.zeros(40, int)],
        st.T[np.zeros(40, int)], st.k1[np.zeros(40, int)],
        st.k2[np.zeros(40, int)], st.points[extra_pts],
    )
    meas = np.concatenate([meas[keep], np.asarray(p0) + 0.01])
    order = np.argsort(pt_idx, kind="stable")
    import jax.numpy as jnp

    ds = BalDataset(
        cam_idx=cam_idx[order], pt_idx=pt_idx[order],
        measurements=meas[order],
        omega=np.zeros((5, 3)), translation=np.asarray(st.T),
        focal=-np.asarray(st.K[:, 0, 0]),
        k1=np.zeros(5), k2=np.zeros(5),
        points=np.asarray(st.points),
    )
    skew = from_bal_dataset(ds, dtype=jnp.float64)
    # Overwrite state pieces that from_bal_dataset re-derives from BAL
    # conventions (R from omega, K from focal, prescaled k1/k2) with the
    # originals so the sharded and single paths see identical geometry.
    import dataclasses

    skew = dataclasses.replace(
        skew,
        state=dataclasses.replace(
            skew.state, R=st.R, K=st.K, k1=st.k1, k2=st.k2
        ),
    )

    sp = sharded.shard_problem(skew, mesh8)
    prepare, trial = sharded.make_sharded_kernels(sp, mesh8, mode)
    ctx_sh, energy_sh, _ = jax.jit(prepare)(sp.state)
    lam = 0.05
    x_sh, e_sh, rho_sh = jax.jit(trial)(ctx_sh, sp.state, lam)

    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare, _trial

    ctx, energy, _ = _prepare(skew.state, skew, mode)
    x, e, rho = _trial(ctx, skew.state, lam, skew, mode)
    np.testing.assert_allclose(float(energy_sh), float(energy), rtol=1e-12)
    np.testing.assert_allclose(float(e_sh), float(e), rtol=1e-9)
    np.testing.assert_allclose(float(rho_sh), float(rho), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(sharded.unshard_points(sp, x_sh)),
        np.asarray(x.points), rtol=1e-7, atol=1e-10,
    )


@pytest.mark.parametrize("mode", ["cholesky", "qrchol", "moreqr", "qrkit", "spqr"])
def test_sharded_df32_matches_single_fast(mesh8, mode):
    """The df32/Pallas drive composed with the distributed Schur path
    (VERDICT round 1 item 4): sharded FastBAState, per-shard fused chain
    with the shard's valid count masking the padding suffix."""
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
    from bundleadjustment_benchmarks_tpu.solvers.lm import (
        _prepare_fast,
        _trial_fast,
    )

    # inlier_threshold=2.0: the smooth basin (conftest note) — the sharded
    # and single paths use equivalent-but-differently-ordered f32 reductions
    # (banded vs padded tables), and the rugged default-threshold landscape
    # amplifies that rounding noise into plateau jumps.
    problem = make_synthetic_problem(
        n_cameras=4, n_points=30, obs_per_point=3, seed=2, inlier_threshold=2.0
    )
    sp = sharded.shard_problem(problem, mesh8)
    prepare, trial = sharded.make_sharded_kernels(
        sp, mesh8, mode, matmul_dtype="float32", geometry="df32"
    )
    fast_sh = problem_mod.to_fast(sp.state)
    ctx_sh, energy_sh, lam0_sh = jax.jit(prepare)(fast_sh)

    fast = problem_mod.to_fast(problem.state)
    ctx, energy, lam0 = _prepare_fast(fast, problem, mode, "float32", pallas=True)
    np.testing.assert_allclose(float(energy_sh), float(energy), rtol=1e-9)
    np.testing.assert_allclose(float(lam0_sh), float(lam0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ctx_sh.U), np.asarray(ctx.U), rtol=1e-5, atol=1e-5
    )

    # Tolerances: the reduced camera system's conditioning multiplies the
    # f32 psum-vs-flat-sum rounding difference of S into the step (~1e-3
    # relative; measured). The EXACT distributed-reduction plumbing is
    # pinned by the f64 tests above at 1e-9; this test pins the df32
    # plumbing (valid-count masking — prepare energy at 1e-9 — fast state
    # specs, pallas-in-shard_map) at f32-honest tolerances.
    lam = 1.0
    x_sh, e_sh, rho_sh = jax.jit(trial)(ctx_sh, fast_sh, lam)
    x, e, rho = _trial_fast(ctx, fast, lam, problem, mode, "float32", pallas=True)
    np.testing.assert_allclose(float(e_sh), float(e), rtol=2e-3)
    assert float(e_sh) < float(energy_sh)  # the sharded step descends
    np.testing.assert_allclose(float(rho_sh), float(rho), rtol=2e-3)
    pts_sh = sharded.unshard_points(
        sp,
        problem_mod.BAState(
            K=x_sh.K, R=x_sh.R, T=x_sh.T, k1=x_sh.k1, k2=x_sh.k2,
            points=(x_sh.points.hi.astype(jnp.float64)
                    + x_sh.points.lo.astype(jnp.float64)).T,
        ),
    )
    pts = (x.points.hi.astype(jnp.float64) + x.points.lo.astype(jnp.float64)).T
    np.testing.assert_allclose(
        np.asarray(pts_sh), np.asarray(pts), rtol=5e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(x_sh.T), np.asarray(x.T), rtol=5e-3, atol=1e-6
    )


def test_sharded_df32_minimize_descends(mesh8):
    # inlier_threshold=2.0 for a smooth deterministic basin (conftest note);
    # f32 step noise compounds over iterations, so the check is that both
    # drives descend into the same basin, not identical trajectories.
    problem = make_synthetic_problem(
        n_cameras=4, n_points=24, obs_per_point=3, seed=3, inlier_threshold=2.0
    )
    sp = sharded.shard_problem(problem, mesh8)
    cfg = lm.LMConfig(drive="jit", max_iter=10, geometry="df32",
                      matmul_dtype="float32")
    res_sh = sharded.minimize_sharded(sp, mesh8, mode="cholesky", config=cfg)
    res = lm.minimize(problem, mode="cholesky", config=cfg)
    assert np.isfinite(res_sh.energy)
    # Both reach the measurement-noise floor (~72 obs * (5e-3)^2); exact
    # floor values differ in f32 trajectory noise.
    from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare_fast

    _, e0, _ = _prepare_fast(
        problem_mod.to_fast(problem.state), problem, "cholesky", "float32",
        pallas=True,
    )
    assert res_sh.energy < 0.02 * float(e0)
    assert res.energy < 0.02 * float(e0)


def test_sharded_checkpoint_metrics_resume(mesh8, tmp_path):
    """Checkpoint/metrics/resume under the sharded drive (VERDICT r3 item 7):
    the coordinator writes host-side; checkpoints hold the FULL unsharded
    state so they resume at any shard count."""
    import json

    from bundleadjustment_benchmarks_tpu.utils import checkpoint as ckpt

    problem = make_synthetic_problem(n_cameras=4, n_points=24, obs_per_point=3, seed=3)
    sp = sharded.shard_problem(problem, mesh8)
    ck = str(tmp_path / "sharded.ckpt.npz")
    mt = str(tmp_path / "sharded.metrics.jsonl")
    cfg = lm.LMConfig(drive="jit", max_iter=6)
    res = sharded.minimize_sharded(
        sp, mesh8, mode="cholesky", config=cfg,
        checkpoint_path=ck, checkpoint_every=2, metrics_path=mt,
    )
    # MaxItersReached reports max_iter+1 (the reference increments the
    # counter at the top of the stopping iteration without doing work).
    assert res.iterations == 7
    # Metrics JSONL: one record per trial, reference-shaped fields.
    recs = [json.loads(l) for l in open(mt)]
    assert len(recs) >= 6 and {"iter", "status", "f", "lambda"} <= set(recs[0])
    # Checkpoint: full unsharded state + LM meta.
    state, meta = ckpt.load_checkpoint(ck)
    assert state.points.shape == (problem.n_points, 3)
    assert meta["iteration"] in (4, 6)
    # Resume on a DIFFERENT shard count from the same checkpoint.
    import dataclasses as _dc

    mesh2 = sharded.make_mesh(2)
    sp2 = sharded.shard_problem(_dc.replace(problem, state=state), mesh2)
    res2 = sharded.minimize_sharded(
        sp2, mesh2, mode="cholesky",
        config=lm.LMConfig(drive="jit", max_iter=8), resume=meta,
    )
    assert res2.iterations == 9  # resumed at 6, ran 7..8, stopped at 9
    assert res2.energy <= res.energy * (1 + 1e-6)


def test_sharded_polish_two_phase(mesh8):
    """--polish under --shards (ADVICE r3): two-phase df32 + f64 drive runs
    distributed in both phases instead of being silently ignored."""
    problem = make_synthetic_problem(
        n_cameras=4, n_points=20, obs_per_point=3, seed=7,
        inlier_threshold=2.0,
    )
    sp = sharded.shard_problem(problem, mesh8)
    cfg = lm.LMConfig(drive="jit", max_iter=10, geometry="df32",
                      matmul_dtype="float32", polish_iters=4)
    res = sharded.minimize_sharded(sp, mesh8, mode="cholesky", config=cfg)
    plain = sharded.minimize_sharded(
        sp, mesh8, mode="cholesky",
        config=lm.LMConfig(drive="jit", max_iter=10, geometry="df32",
                           matmul_dtype="float32"),
    )
    # The polish phase ran (extra iterations) and lands at the same noise
    # floor (the fast phase stops at the looser polish_fast_tol, so the two
    # trajectories differ within floor-level noise).
    assert res.iterations > plain.iterations
    assert res.energy <= plain.energy * 1.01
    assert res.state.points.dtype == problem.state.points.dtype


def test_sharded_minimize_matches_single(mesh8):
    problem = make_synthetic_problem(n_cameras=4, n_points=24, obs_per_point=3, seed=3)
    sp = sharded.shard_problem(problem, mesh8)
    cfg = lm.LMConfig(drive="host", max_iter=8)
    res_sh = sharded.minimize_sharded(sp, mesh8, mode="cholesky", config=cfg)
    res = lm.minimize(problem, mode="cholesky", config=cfg)
    assert res_sh.iterations == res.iterations
    assert res_sh.fun_evals == res.fun_evals
    # psum vs segment_sum reduction order differs at the ulp level and the
    # gauge directions amplify it over iterations; energies agree closely.
    np.testing.assert_allclose(res_sh.energy, res.energy, rtol=1e-5)


def test_sharded_qrkit_distinct_from_spqr(mesh8):
    """Distributed qrkit is a genuinely distinct realization from spqr
    (VERDICT r4 item 2): qrkit carries the Moré-cached pair-form camera
    factorization (lambda-free reduced system cached per outer iteration,
    cheap per-trial re-damp — BAFunctor.h:98-102 +
    BacktrackLevMarqMore.h:287-328), while spqr re-factors per trial
    through the all-gathered distributed TSQR and caches nothing."""
    problem = make_synthetic_problem(n_cameras=4, n_points=30, obs_per_point=3, seed=5)
    sp = sharded.shard_problem(problem, mesh8)

    prep_qk, trial_qk = sharded.make_sharded_kernels(sp, mesh8, "qrkit")
    ctx_qk, _, _ = jax.jit(prep_qk)(sp.state)
    assert ctx_qk.qr_S0cam is not None and ctx_qk.qr_b0 is not None
    assert ctx_qk.fill_evals is not None
    assert ctx_qk.Jc_stacked is None  # no TSQR camera stacks cached

    prep_sp, _ = sharded.make_sharded_kernels(sp, mesh8, "spqr")
    ctx_sp, _, _ = jax.jit(prep_sp)(sp.state)
    assert ctx_sp.qr_S0cam is None  # spqr caches no camera factorization
    assert ctx_sp.Jc_stacked is not None  # per-trial TSQR inputs instead

    # And the cached system is consistent: at lam -> 0 the re-damp
    # correction vanishes, so S0 alone must reproduce the undamped reduced
    # camera system the chol path assembles.
    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare
    from bundleadjustment_benchmarks_tpu.solvers import schur
    import jax.numpy as jnp

    ctx_single, _, _ = _prepare(problem.state, problem, "cholesky")
    lam = 1e-13
    Linv = schur._point_factor_inv(ctx_single, lam, "cholesky",
                                   ctx_single.U.dtype)
    S_ref, _ = schur._reduced_system_chol(
        ctx_single, jnp.asarray(lam, ctx_single.U.dtype), problem,
        problem.n_cameras, problem.n_points, Linv, ctx_single.U.dtype,
    )
    S0 = np.asarray(ctx_qk.qr_S0cam)
    np.testing.assert_allclose(
        S0 + lam * np.eye(S0.shape[0]), np.asarray(S_ref),
        rtol=1e-6, atol=1e-8,
    )
