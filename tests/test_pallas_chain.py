"""Fused Pallas chain kernels vs the XLA planar fallback (interpret mode).

The kernels call the exact same planar_blocks_chain / planar_energy_df math
as the fallback (ops/pallas_chain.py docstring). On TPU, compiled-kernel vs
fallback output is bit-identical (verified on hardware). On CPU the
interpreter and the XLA-compiled fallback round differently (XLA CPU runs
with FMA contraction / excess precision; the interpreter evaluates op by
op), so these tests assert agreement to ~FMA-noise tolerance, not bitwise.
"""

import jax
import jax.numpy as jnp
import pytest

from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.ops import jacobian, pallas_chain, projection
from bundleadjustment_benchmarks_tpu.solvers import lm
from bundleadjustment_benchmarks_tpu.utils.synthetic import make_synthetic_problem


@pytest.fixture(scope="module")
def prob():
    # K = 37*5 = 185: deliberately NOT a tile multiple (exercises padding
    # and the energy validity mask).
    return make_synthetic_problem(
        n_cameras=5, n_points=37, obs_per_point=5, seed=3, dtype=jnp.float64
    )


@pytest.fixture(scope="module")
def fast(prob):
    return problem_mod.to_fast(prob.state)


def test_fused_blocks_energy_matches_fallback(prob, fast):
    ref = jacobian.residuals_and_jacobian_fast(fast, prob.obs, prob.tau2)
    e_ref = projection.compensated_square_sum(ref.f)
    blocks, e = pallas_chain.fused_blocks_energy(
        fast, prob.obs, prob.tau2, interpret=True
    )
    assert blocks.Jc.shape == ref.Jc.shape

    def close(a, b):
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1.0)
        return float(jnp.max(jnp.abs(a - b))) <= 2e-4 * float(scale)

    assert close(blocks.Jc, ref.Jc)
    assert close(blocks.Jp, ref.Jp)
    assert close(blocks.f, ref.f)
    assert abs(float(e) - float(e_ref)) <= 1e-5 * abs(float(e_ref))


def test_fused_energy_matches_fallback(prob, fast):
    e_ref = projection.energy_fast(fast, prob.obs, prob.tau2)
    e = pallas_chain.fused_energy(fast, prob.obs, prob.tau2, interpret=True)
    assert abs(float(e) - float(e_ref)) <= 1e-5 * abs(float(e_ref))


def test_prepare_fast_matches_fallback(prob, fast):
    """The full prepare step (fused chain -> Schur context) agrees between
    kernel and fallback. (LM *trajectory* comparisons are only meaningful on
    TPU, where the two paths are bit-identical and full runs stay locked —
    verified on hardware; on CPU interpret-vs-compiled FMA noise flips
    strict-decrease accept decisions.)"""
    ctx_ref, e_ref, lam_ref = lm._prepare_fast(
        fast, prob, "cholesky", "float32", pallas=False
    )
    ctx_pl, e_pl, lam_pl = lm._prepare_fast(
        fast, prob, "cholesky", "float32", pallas=True
    )

    def close(a, b, rtol=2e-4):
        scale = float(jnp.maximum(jnp.max(jnp.abs(b)), 1.0))
        return float(jnp.max(jnp.abs(a - b))) <= rtol * scale

    assert close(ctx_pl.U, ctx_ref.U)
    assert close(ctx_pl.V, ctx_ref.V)
    assert close(ctx_pl.W, ctx_ref.W)
    assert close(ctx_pl.g_cams, ctx_ref.g_cams)
    assert close(ctx_pl.g_pts, ctx_ref.g_pts)
    assert float(e_pl) == pytest.approx(float(e_ref), rel=1e-5)
    assert float(lam_pl) == pytest.approx(float(lam_ref), rel=1e-3)


def test_lm_with_pallas_converges(prob):
    cfg = lm.LMConfig(drive="jit", max_iter=8, matmul_dtype="float32",
                      geometry="df32", pallas=True)
    e0 = float(projection.energy(prob.state, prob.obs, prob.tau2))
    res = lm.minimize(prob, mode="cholesky", config=cfg)
    assert res.energy < 0.5 * e0


def test_padding_mask_excludes_fake_observations(prob, fast):
    """The energy mask must zero the padded tail: compare against a manually
    truncated-K run where the tail would otherwise contribute."""
    e_full = pallas_chain.fused_energy(fast, prob.obs, prob.tau2, interpret=True)
    # Same observations duplicated into the padded tail region would change
    # the sum if the mask failed; instead we check the sum equals the
    # per-observation psi total computed directly.
    f = projection.residuals(
        problem_mod.BAState(
            K=fast.K, R=fast.R, T=fast.T, k1=fast.k1, k2=fast.k2,
            points=fast.points.hi.T.astype(jnp.float64)
            + fast.points.lo.T.astype(jnp.float64),
        ),
        prob.obs,
        prob.tau2,
    )
    e_direct = float(jnp.sum(f * f))
    assert float(e_full) == pytest.approx(e_direct, rel=1e-5)
