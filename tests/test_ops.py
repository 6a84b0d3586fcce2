"""Kernel unit tests against closed-form / autodiff / XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from bundleadjustment_benchmarks_tpu.ops import linalg, projection, robust, rodrigues


class TestRodrigues:
    def test_exp_matches_scipy_rotation(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(0)
        w = rng.normal(scale=1.5, size=(16, 3))
        R = rodrigues.exp_rodrigues(jnp.asarray(w))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-13)

    def test_exp_orthonormal(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(64, 3)))
        R = rodrigues.exp_rodrigues(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_small_angle_behavior(self):
        # At exactly zero: exact identity (as the reference, MathUtils.h:72).
        np.testing.assert_array_equal(
            rodrigues.exp_rodrigues(jnp.zeros(3)), jnp.eye(3)
        )
        # Below the reference's 1e-6 cutoff we keep the true (Taylor)
        # rotation rather than truncating to identity — documented deviation.
        w = jnp.asarray([5e-7, 5e-7, 5e-7])
        R = rodrigues.exp_rodrigues(w)
        np.testing.assert_allclose(R, jnp.eye(3), atol=2e-6)
        assert float(jnp.abs(R - jnp.eye(3)).max()) > 1e-8  # not truncated

    def test_log_exp_roundtrip(self):
        rng = np.random.default_rng(2)
        w = rng.normal(scale=1.0, size=(32, 3))
        # log is only the exp inverse on |theta| < pi.
        norms = np.linalg.norm(w, axis=-1, keepdims=True)
        w = w * np.minimum(1.0, 3.0 / norms)
        w = jnp.asarray(w)
        R = rodrigues.exp_rodrigues(w)
        w_back = rodrigues.log_rodrigues(R)
        np.testing.assert_allclose(w_back, w, atol=1e-7)

    def test_log_identity_is_zero(self):
        np.testing.assert_array_equal(
            rodrigues.log_rodrigues(jnp.eye(3)), jnp.zeros(3)
        )

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(16, 3)))
        R = rodrigues.exp_rodrigues(w)
        q = rodrigues.quaternion_from_rotation_matrix(R)
        R2 = rodrigues.rotation_matrix_from_quaternion(q)
        np.testing.assert_allclose(R2, R, atol=1e-12)

    def test_exp_gradient_finite(self):
        # Grad through the small-angle guard must not NaN.
        g = jax.grad(lambda w: jnp.sum(rodrigues.exp_rodrigues(w)))(jnp.zeros(3))
        assert jnp.all(jnp.isfinite(g))


class TestRobust:
    def test_psi_values(self):
        tau2 = 0.25
        assert float(robust.psi(tau2, 0.0)) == 0.0
        assert float(robust.psi(tau2, 1.0)) == tau2 / 4  # truncated
        r2 = 0.1
        np.testing.assert_allclose(
            float(robust.psi(tau2, r2)), r2 * (2 - r2 / tau2) / 4
        )

    def test_residual_energy_equals_psi_sum(self):
        # sum(fvec^2) == sum(psi) (BAFunctor.h:160-178 scaling).
        rng = np.random.default_rng(0)
        r = jnp.asarray(rng.normal(scale=0.3, size=(100, 2)))
        tau2 = 0.25
        scaled = r * robust.robust_scale(tau2, r)[..., None]
        e1 = jnp.sum(scaled**2)
        e2 = jnp.sum(robust.psi(tau2, jnp.sum(r * r, axis=-1)))
        np.testing.assert_allclose(e1, e2, rtol=1e-12)

    def test_outer_derivative_matches_autodiff(self):
        tau2 = 0.25

        def robustified(r):
            return r * robust.robust_scale(tau2, r)

        rng = np.random.default_rng(1)
        # Away from the |r|=tau kink where the kernel is smooth.
        for scale in (0.05, 0.2, 2.0):
            r = jnp.asarray(rng.normal(scale=scale, size=2))
            J_auto = jax.jacfwd(robustified)(r)
            J_analytic = robust.robust_outer_derivative(tau2, r)
            np.testing.assert_allclose(J_analytic, J_auto, rtol=1e-6, atol=1e-10)


class TestProjection:
    def test_distortion_matches_reference_formula(self):
        xu = jnp.asarray([0.3, -0.2])
        k1, k2 = 0.1, 0.01
        r2 = float(xu @ xu)
        kr = 1 + k1 * r2 + k2 * r2 * r2
        np.testing.assert_allclose(
            projection.distort(jnp.asarray(k1), jnp.asarray(k2), xu), kr * xu
        )

    def test_distortion_jacobians_vs_autodiff(self):
        xu = jnp.asarray([0.3, -0.2])
        k1 = jnp.asarray(0.1)
        k2 = jnp.asarray(0.01)
        J_pt = jax.jacfwd(lambda x: projection.distort(k1, k2, x))(xu)
        np.testing.assert_allclose(
            projection.distort_jac_point(k1, k2, xu), J_pt, rtol=1e-12
        )
        J_k = jax.jacfwd(
            lambda ks: projection.distort(ks[0], ks[1], xu)
        )(jnp.stack([k1, k2]))
        np.testing.assert_allclose(
            projection.distort_jac_params(xu), J_k, rtol=1e-12
        )

    def test_project_affine_equals_project_for_bal_k(self):
        rng = np.random.default_rng(4)
        f = 500.0
        K = jnp.asarray(np.diag([-f, -f, 1.0]))
        R = rodrigues.exp_rodrigues(jnp.asarray(rng.normal(size=3) * 0.1))
        T = jnp.asarray([0.1, -0.2, 2.0])
        X = jnp.asarray(rng.normal(size=3) * 0.3)
        k1, k2 = jnp.asarray(1e-7), jnp.asarray(1e-13)
        p1 = projection.project(R, T, K[0, 0], k1, k2, X)
        p2 = projection.project_affine(K, R, T, k1, k2, X)
        np.testing.assert_allclose(p1, p2, rtol=1e-12)


class TestLinalg:
    def test_cholesky3x3(self):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(50, 3, 3))
        spd = jnp.asarray(A @ A.transpose(0, 2, 1) + 3 * np.eye(3))
        L = linalg.cholesky3x3(spd)
        np.testing.assert_allclose(L, jnp.linalg.cholesky(spd), rtol=1e-10)

    def test_inv_lower3x3(self):
        rng = np.random.default_rng(6)
        A = rng.normal(size=(20, 3, 3))
        spd = jnp.asarray(A @ A.transpose(0, 2, 1) + 3 * np.eye(3))
        L = linalg.cholesky3x3(spd)
        Linv = linalg.inv_lower3x3(L)
        eye = jnp.broadcast_to(jnp.eye(3), L.shape)
        np.testing.assert_allclose(Linv @ L, eye, atol=1e-10)

    def test_cho_solve3x3(self):
        rng = np.random.default_rng(7)
        A = rng.normal(size=(20, 3, 3))
        spd = jnp.asarray(A @ A.transpose(0, 2, 1) + 3 * np.eye(3))
        b = jnp.asarray(rng.normal(size=(20, 3)))
        L = linalg.cholesky3x3(spd)
        x = linalg.cho_solve3x3(L, b)
        np.testing.assert_allclose(
            jnp.einsum("mij,mj->mi", spd, x), b, rtol=1e-8, atol=1e-10
        )

    def test_mgs_qr3(self):
        rng = np.random.default_rng(8)
        A = jnp.asarray(rng.normal(size=(30, 11, 3)))
        Q, R = linalg.mgs_qr3(A)
        np.testing.assert_allclose(Q @ R[..., :, :], A, atol=1e-10)
        eye = jnp.broadcast_to(jnp.eye(3), (30, 3, 3))
        np.testing.assert_allclose(
            jnp.swapaxes(Q, -1, -2) @ Q, eye, atol=1e-10
        )
        # R^T R == A^T A (the damped point normal matrix identity).
        np.testing.assert_allclose(
            jnp.swapaxes(R, -1, -2) @ R,
            jnp.swapaxes(A, -1, -2) @ A,
            rtol=1e-8,
            atol=1e-10,
        )

    def test_mgs_qr3_zero_padded_rows(self):
        rng = np.random.default_rng(9)
        A = jnp.asarray(rng.normal(size=(7, 3)))
        Apad = jnp.concatenate([A, jnp.zeros((5, 3))], axis=0)
        _, R1 = linalg.mgs_qr3(A[None])
        _, R2 = linalg.mgs_qr3(Apad[None])
        np.testing.assert_allclose(R1, R2, atol=1e-12)

    def test_mgs_qr3_zero_deficient_rank2(self):
        """Rank-guarded MGS (qrkit's lambda-free point QR): a rank-2 block
        must produce an exactly-zero third Q column and R row, with Q's
        columns orthonormal-or-zero and R^T R == A^T A preserved."""
        rng = np.random.default_rng(12)
        base = rng.normal(size=(6, 2))
        mix = rng.normal(size=(2, 3))
        A = jnp.asarray(base @ mix)[None]  # (1, 6, 3) rank 2
        Q, R = linalg.mgs_qr3(A, zero_deficient=True)
        assert np.all(np.isfinite(np.asarray(Q)))
        np.testing.assert_allclose(np.asarray(Q[0, :, 2]), 0.0, atol=0)
        np.testing.assert_allclose(np.asarray(R[0, 2, :]), 0.0, atol=0)
        QtQ = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q)[0]
        np.testing.assert_allclose(QtQ[:2, :2], np.eye(2), atol=1e-12)
        np.testing.assert_allclose(
            jnp.swapaxes(R, -1, -2) @ R,
            jnp.swapaxes(A, -1, -2) @ A,
            rtol=1e-10, atol=1e-12,
        )

    def test_tsqr(self):
        rng = np.random.default_rng(10)
        A = jnp.asarray(rng.normal(size=(1000, 7)))
        R = linalg.tsqr(A, chunk=128)
        # R^T R == A^T A up to roundoff; signs may differ from direct QR.
        np.testing.assert_allclose(R.T @ R, A.T @ A, rtol=1e-10, atol=1e-10)

    def test_eigh3x3_sym(self):
        """Closed-form batched 3x3 eigh vs numpy on adversarial blocks."""
        rng = np.random.default_rng(11)
        G = rng.normal(size=(64, 3, 3))
        rand_sym = G @ np.swapaxes(G, -1, -2)
        v = rng.normal(size=(8, 3))
        rank1 = np.einsum("ni,nj->nij", v, v)
        cases = np.concatenate([
            rand_sym,
            rank1,
            rand_sym * 5e7,  # BA point-gram scale (NaN'd XLA eigh on TPU)
            np.zeros((2, 3, 3)),
            np.broadcast_to(np.eye(3) * 3.7, (2, 3, 3)),
            np.stack([np.diag([1.0, 1.0, 0.0]), np.diag([2.0, 1e-14, 0.0])]),
        ])
        evals, evecs = linalg.eigh3x3_sym(jnp.asarray(cases))
        evals, evecs = np.asarray(evals), np.asarray(evecs)
        scale = np.abs(cases).reshape(len(cases), -1).max(axis=1) + 1e-30
        # Eigenvalues vs LAPACK (ascending).
        ref = np.linalg.eigvalsh(cases)
        np.testing.assert_allclose(
            evals / scale[:, None], ref / scale[:, None], atol=1e-8
        )
        # Orthogonality and reconstruction.
        qtq = np.einsum("nji,njk->nik", evecs, evecs)
        np.testing.assert_allclose(
            qtq, np.broadcast_to(np.eye(3), qtq.shape), atol=1e-10
        )
        recon = np.einsum("nij,nj,nkj->nik", evecs, evals, evecs)
        np.testing.assert_allclose(
            recon / scale[:, None, None],
            cases / scale[:, None, None],
            atol=1e-7,
        )

    def test_eigh3x3_sym_matches_on_point_grams(self):
        """On real BA point grams (the moreqr context), Q f(E) Q^T must match
        LAPACK's to solver precision — the quantity the eig mode consumes."""
        import sys
        sys.path.insert(0, "tests")
        from conftest import make_synthetic_problem
        from bundleadjustment_benchmarks_tpu.ops import jacobian
        from bundleadjustment_benchmarks_tpu.solvers import schur

        p = make_synthetic_problem(n_cameras=5, n_points=40, obs_per_point=4, seed=2)
        blocks = jacobian.residuals_and_jacobian(p.state, p.obs, p.tau2)
        V, _ = schur.segment_gram_and_vec(blocks.Jp, blocks.f, p.pt_obs_idx)
        V = np.asarray(V)
        evals, evecs = linalg.eigh3x3_sym(jnp.asarray(V))
        evals = np.maximum(np.asarray(evals), 0.0)
        evecs = np.asarray(evecs)
        er, qr_ = np.linalg.eigh(V)
        er = np.maximum(er, 0.0)
        for lam in (1e-6, 1e-2, 10.0):
            ours = np.einsum("nij,nj,nkj->nik", evecs, 1.0 / (evals + lam), evecs)
            ref = np.einsum("nij,nj,nkj->nik", qr_, 1.0 / (er + lam), qr_)
            denom = np.abs(ref).max() + 1e-30
            np.testing.assert_allclose(ours / denom, ref / denom, atol=1e-9)
