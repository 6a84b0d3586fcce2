"""CPU reference-equivalent: numpy/scipy port of the reference CHOLESKY driver.

The reference repo publishes no benchmark numbers and its binaries cannot be
built here (SuiteSparse + the author's private Eigen fork + hard-coded Windows
paths, reference src/CMakeLists.txt:14-28), so this module provides the
measured baseline: a faithful vectorized numpy/scipy.sparse implementation of
the same algorithm the CHOLESKY binary runs —

  * robustified residuals + analytic sparse Jacobian (BAFunctor.h:147-297),
  * backtracking LM with Nielsen updates and flatline stop
    (BacktrackLevMarqCholesky.h:190-361),
  * sparse factorization of J^T J + lambda I per damping trial
    (SimplicialLDLT stand-in: scipy splu).

It is also an independent correctness oracle for the JAX implementation
(entirely separate code path: numpy loops-free vectorization + CSR).

Run:  python benchmarks/cpu_reference.py data.txt [--max-iter N] [--record]
``--record`` writes bench_baseline.json used by bench.py's vs_baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bundleadjustment_benchmarks_tpu.io import bal  # noqa: E402

TAU = 0.5
EPS = 1e-15


def rodrigues_np(w):
    """Batched Rodrigues exp map (reference MathUtils.h:66-82 semantics)."""
    w = np.atleast_2d(w)
    theta = np.linalg.norm(w, axis=-1)
    R = np.tile(np.eye(3), (len(w), 1, 1))
    big = theta > 1e-6
    if big.any():
        wb = w[big]
        tb = theta[big]
        J = np.zeros((len(wb), 3, 3))
        J[:, 0, 1], J[:, 0, 2] = -wb[:, 2], wb[:, 1]
        J[:, 1, 0], J[:, 1, 2] = wb[:, 2], -wb[:, 0]
        J[:, 2, 0], J[:, 2, 1] = -wb[:, 1], wb[:, 0]
        c1 = (np.sin(tb) / tb)[:, None, None]
        c2 = ((1 - np.cos(tb)) / tb**2)[:, None, None]
        R[big] = np.eye(3) + c1 * J + c2 * np.einsum("nij,njk->nik", J, J)
    return R


class State:
    def __init__(self, ds: bal.BalDataset):
        self.R = rodrigues_np(ds.omega)
        self.T = ds.translation.copy()
        self.f = -ds.focal  # K(0,0) = -f (bundle_adjustment_large.cpp:88-90)
        self.k1 = ds.k1 * ds.focal**2
        self.k2 = ds.k2 * ds.focal**4
        self.X = ds.points.copy()

    def copy(self):
        out = object.__new__(State)
        out.R, out.T, out.f = self.R.copy(), self.T.copy(), self.f.copy()
        out.k1, out.k2, out.X = self.k1.copy(), self.k2.copy(), self.X.copy()
        return out


def project(st: State, ci, pi):
    XX = np.einsum("kij,kj->ki", st.R[ci], st.X[pi]) + st.T[ci]
    xu = XX[:, :2] / XX[:, 2:3]
    r2 = np.sum(xu * xu, axis=1)
    kr = 1 + st.k1[ci] * r2 + st.k2[ci] * r2 * r2
    xd = kr[:, None] * xu
    return st.f[ci][:, None] * xd, XX, xu, xd


def residuals(st, ci, pi, meas):
    q, _, _, _ = project(st, ci, pi)
    r = q - meas
    rn2 = np.sum(r * r, axis=1)
    tau2 = TAU * TAU
    psi = np.where(rn2 < tau2, rn2 * (2 - rn2 / tau2) / 4, tau2 / 4)
    scale = np.sqrt(psi) / np.maximum(EPS, np.sqrt(rn2))
    return (r * scale[:, None]).reshape(-1)


def error_statistics(st, ci, pi, meas, avg_focal=1.0, threshold=TAU):
    """Reference Utils::showErrorStatistics (Utils.h:15-43), numpy."""
    q, _, _, _ = project(st, ci, pi)
    err = np.linalg.norm(avg_focal * (q - meas), axis=-1)
    inlier = err <= threshold
    n_inl = int(inlier.sum())
    return {
        "mean_reprojection_error": float(err.mean()),
        "inlier_mean_reprojection_error": float(err[inlier].mean())
        if n_inl
        else float("nan"),
        "n_inliers": n_inl,
        "n_observations": int(len(err)),
    }


def true_objective(st, ci, pi, meas, avg_focal=1.0, threshold=TAU):
    """Reference Utils::showObjective (Utils.h:45-68), numpy — including the
    quirk that the cubic kernel's r2 argument receives a NORM (Utils.h:61)."""
    q, _, _, _ = project(st, ci, pi)
    r = np.linalg.norm((avg_focal * avg_focal) * (q - meas), axis=-1)
    tau2 = threshold * threshold
    val = np.where(
        r < tau2,
        r * (3 - 3 * r / tau2 + (r / tau2) ** 2) / 6,
        tau2 / 6,
    )
    return float(val.sum())


def jacobian(st, ci, pi, meas, m, n):
    K = len(ci)
    q, XX, xu, xd = project(st, ci, pi)
    r = q - meas
    rn2 = np.sum(r * r, axis=1)
    tau2 = TAU * TAU
    W = np.maximum(0.0, 1 - rn2 / tau2)
    psi = np.where(rn2 < tau2, rn2 * (2 - rn2 / tau2) / 4, tau2 / 4)
    sqrt_psi = np.sqrt(psi)
    rsqrt_psi = 1 / np.maximum(EPS, sqrt_psi)
    rcp_r2 = 1 / np.maximum(EPS, rn2)
    rnorm = 1 / np.maximum(EPS, np.sqrt(rn2))
    rrt = r[:, :, None] * r[:, None, :] * rnorm[:, None, None]
    rI = np.sqrt(rn2)[:, None, None] * np.eye(2)
    outer = (W / 2 * rsqrt_psi)[:, None, None] * rrt + (
        sqrt_psi * rcp_r2
    )[:, None, None] * (rI - rrt)

    z = XX[:, 2]
    inv_z = 1 / z
    dxu = np.zeros((K, 2, 3))
    dxu[:, 0, 0] = inv_z
    dxu[:, 1, 1] = inv_z
    dxu[:, 0, 2] = -XX[:, 0] * inv_z**2
    dxu[:, 1, 2] = -XX[:, 1] * inv_z**2
    r2u = np.sum(xu * xu, axis=1)
    kr = 1 + st.k1[ci] * r2u + st.k2[ci] * r2u**2
    dkr = 2 * st.k1[ci] + 4 * st.k2[ci] * r2u
    dxd = np.zeros((K, 2, 2))
    dxd[:, 0, 0] = kr + xu[:, 0] ** 2 * dkr
    dxd[:, 0, 1] = xu[:, 0] * xu[:, 1] * dkr
    dxd[:, 1, 0] = dxd[:, 0, 1]
    dxd[:, 1, 1] = kr + xu[:, 1] ** 2 * dkr
    dp_dXX = st.f[ci][:, None, None] * np.einsum("kab,kbc->kac", dxd, dxu)

    v = XX - st.T[ci]  # = R X
    crossm = np.zeros((K, 3, 3))
    crossm[:, 0, 1], crossm[:, 0, 2] = v[:, 2], -v[:, 1]
    crossm[:, 1, 0], crossm[:, 1, 2] = -v[:, 2], v[:, 0]
    crossm[:, 2, 0], crossm[:, 2, 1] = v[:, 1], -v[:, 0]

    Jc = np.zeros((K, 2, 9))
    Jc[:, :, 0:3] = dp_dXX
    Jc[:, :, 3:6] = np.einsum("kab,kbc->kac", dp_dXX, crossm)
    Jc[:, :, 6] = xd
    dk = np.zeros((K, 2, 2))
    dk[:, 0, 0] = xu[:, 0] * r2u
    dk[:, 0, 1] = xu[:, 0] * r2u**2
    dk[:, 1, 0] = xu[:, 1] * r2u
    dk[:, 1, 1] = xu[:, 1] * r2u**2
    Jc[:, :, 7:9] = st.f[ci][:, None, None] * dk
    Jp = np.einsum("kab,kbc->kac", dp_dXX, st.R[ci])

    Jc = np.einsum("kab,kbc->kac", outer, Jc)
    Jp = np.einsum("kab,kbc->kac", outer, Jp)

    rows = np.repeat(np.arange(2 * K).reshape(K, 2), 12, axis=1).reshape(-1)
    cols_p = (3 * pi)[:, None] + np.arange(3)[None, :]
    cols_c = (3 * m + 9 * ci)[:, None] + np.arange(9)[None, :]
    cols = np.concatenate(
        [np.repeat(cols_c[:, None, :], 2, 1), np.repeat(cols_p[:, None, :], 2, 1)],
        axis=2,
    ).reshape(-1)
    vals = np.concatenate([Jc, Jp], axis=2).reshape(-1)
    return scipy.sparse.csr_matrix(
        (vals, (rows, cols)), shape=(2 * K, 3 * m + 9 * n)
    )


def apply_step(st: State, dx, m, n):
    out = st.copy()
    dxp = dx[: 3 * m].reshape(m, 3)
    dxc = dx[3 * m :].reshape(n, 9)
    out.X += dxp
    out.T += dxc[:, 0:3]
    dR = rodrigues_np(dxc[:, 3:6])
    out.R = np.einsum("nij,njk->nik", dR, st.R)
    out.f += dxc[:, 6]
    out.k1 += dxc[:, 7]
    out.k2 += dxc[:, 8]
    return out


def save_state(path, st, lam, lam_inc, hist, it, fun_evals):
    """Checkpoint the EXACT LM state (flatline runs on the big problems take
    hours at scipy speed; a resumed run continues the identical trajectory —
    hist indexing uses the absolute iteration counter, so it must be kept)."""
    np.savez(path, R=st.R, T=st.T, f=st.f, k1=st.k1, k2=st.k2, X=st.X,
             lam=lam, lam_inc=lam_inc, hist=np.asarray(hist),
             it=it, fun_evals=fun_evals)


def load_state(path, st):
    d = np.load(path)
    out = object.__new__(State)
    out.R, out.T, out.f = d["R"], d["T"], d["f"]
    out.k1, out.k2, out.X = d["k1"], d["k2"], d["X"]
    return (out, float(d["lam"]), float(d["lam_inc"]), list(d["hist"]),
            int(d["it"]), int(d["fun_evals"]))


def minimize(st, ci, pi, meas, m, n, max_iter=100, tol_fun=1e-8, verbose=False,
             trace=None, resume=None, save_state_path=None, save_every=50):
    """``trace``: optional list; appends (iter, energy_after_accept, lam)
    per accepted iteration — consumed by the JAX-vs-CPU parity tests and the
    flatline-campaign JSON record.

    ``resume``: (lam, lam_inc, hist, it, fun_evals) from load_state — the
    caller passes the loaded state as ``st``. ``save_state_path``: checkpoint
    the LM state there every ``save_every`` accepted iterations."""
    lam = 1e-3
    lam_inc = 2.0
    hist = [0.0, 0.0]
    it = 0
    fun_evals = 0
    if resume is not None:
        lam, lam_inc, hist, it, fun_evals = resume
    status = "Running"
    eye = scipy.sparse.identity(3 * m + 9 * n, format="csc")
    while True:
        it += 1
        if it > max_iter:
            status = "Maximum Iterations Reached"
            break
        f = residuals(st, ci, pi, meas)
        fun_evals += 1
        energy = float(f @ f)
        J = jacobian(st, ci, pi, meas, m, n)
        jtres = -J.T @ f
        jtj = (J.T @ J).tocsc()
        if it == 1:
            lam = 1e-12 * jtj.diagonal().max()
        stop_now = False
        while True:
            # MMD_AT_PLUS_A: symmetric-pattern fill-reducing ordering, the
            # closest splu analog to SimplicialLDLT's AMD permutation.
            lu = scipy.sparse.linalg.splu(
                jtj + lam * eye, permc_spec="MMD_AT_PLUS_A"
            )
            dx = lu.solve(jtres)
            st_test = apply_step(st, dx, m, n)
            f_t = residuals(st_test, ci, pi, meas)
            fun_evals += 1
            e_t = float(f_t @ f_t)
            if e_t < energy:
                rho = (energy - e_t) / float(dx @ (lam * dx + jtres))
                lam = max(lam * max(1 / 3, 1 - (2 * rho - 1) ** 3), 1e-10)
                lam_inc = 2.0
                energy = e_t
                hist[it % 2] = energy
                if trace is not None:
                    trace.append((it, energy, lam))
                if verbose:
                    print(f"{it:5d} Accepted {energy:.6g} rho={rho:.4g} lam={lam:.4g}",
                          flush=True)
                if save_state_path and it % save_every == 0:
                    # st_test is the accepted iterate the next outer
                    # iteration will start from (st = st_test below).
                    save_state(save_state_path, st_test, lam, lam_inc, hist,
                               it, fun_evals)
                break
            else:
                if lam > 1e10:
                    status = "Success (Exceeded Maximum Lambda)"
                    stop_now = True
                    break
                lam *= lam_inc
                lam_inc = lam_inc**1.5
        if stop_now:
            break
        if it > 2 and abs(energy - max(hist)) < tol_fun * energy:
            status = "Success (Energy Flatlined)"
            break
        st = st_test
    if save_state_path:
        # Terminal snapshot (st keeps the reference's discard-final-step
        # semantics on the flatline path): lets a capped run continue. On
        # the max-iter stop, iteration ``it`` never ran — rewind the counter
        # so the resumed run replays it (verified: resumed == straight run).
        it_done = it - 1 if status == "Maximum Iterations Reached" else it
        save_state(save_state_path, st, lam, lam_inc, hist, it_done, fun_evals)
    return st, status, it, fun_evals, energy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("problem", nargs="?",
                    default="/root/reference/data/problem-21-11315-pre.txt")
    ap.add_argument("--max-iter", type=int, default=25)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--json", default=None,
                    help="write trajectory + post-stats JSON to this path")
    ap.add_argument("--save-state", default=None,
                    help="checkpoint the LM state (npz) here every "
                    "--save-every accepted iterations")
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--resume-state", default=None,
                    help="resume the exact LM trajectory from this npz")
    ap.add_argument("--perturb", type=int, default=None, metavar="SEED",
                    help="perturb the initial points by 1e-10 relative noise "
                    "(given seed) — measures the robust-kernel plateau's "
                    "intrinsic flatline spread (the parity-budget rationale)")
    args = ap.parse_args()

    ds = bal.read_bal(args.problem)
    st = State(ds)
    if args.perturb is not None:
        rng = np.random.default_rng(args.perturb)
        st.X = st.X * (1.0 + 1e-10 * rng.standard_normal(st.X.shape))
    resume = None
    if args.resume_state:
        st, *resume_vals = load_state(args.resume_state, st)
        resume = tuple(resume_vals)
        print(f"resumed from {args.resume_state} at iteration {resume[3]}",
              flush=True)
    ci, pi, meas = ds.cam_idx, ds.pt_idx, ds.measurements
    m, n = ds.n_points, ds.n_cameras

    pre_stats = error_statistics(st, ci, pi, meas)
    pre_obj = true_objective(st, ci, pi, meas)
    print(f"pre: mean_err={pre_stats['mean_reprojection_error']:.9g} "
          f"inlier_err={pre_stats['inlier_mean_reprojection_error']:.9g} "
          f"({pre_stats['n_inliers']}/{pre_stats['n_observations']}) "
          f"true_obj={pre_obj:.9g}", flush=True)

    trace = []
    t0 = time.perf_counter()
    st, status, iters, fun_evals, energy = minimize(
        st, ci, pi, meas, m, n, max_iter=args.max_iter, tol_fun=args.tol,
        verbose=args.verbose, trace=trace, resume=resume,
        save_state_path=args.save_state, save_every=args.save_every,
    )
    wall = time.perf_counter() - t0
    iters_per_sec = iters / wall
    post_stats = error_statistics(st, ci, pi, meas)
    post_obj = true_objective(st, ci, pi, meas)
    print(f"status={status} iters={iters} funEvals={fun_evals} "
          f"energy={energy:.9g} wall={wall:.3f}s iters/s={iters_per_sec:.4f}")
    print(f"post: mean_err={post_stats['mean_reprojection_error']:.9g} "
          f"inlier_err={post_stats['inlier_mean_reprojection_error']:.9g} "
          f"({post_stats['n_inliers']}/{post_stats['n_observations']}) "
          f"true_obj={post_obj:.9g}")

    if args.json:
        with open(args.json, "w") as fp:
            json.dump({
                "problem": os.path.basename(args.problem),
                "solver": "cholesky (scipy splu port)",
                "status": status, "iterations": iters,
                "fun_evals": fun_evals, "energy": energy,
                "wall_s": wall,
                "pre": {**pre_stats, "true_objective": pre_obj},
                "post": {**post_stats, "true_objective": post_obj},
                "trace": [
                    {"iter": t_i, "energy": t_e, "lam": t_l}
                    for t_i, t_e, t_l in trace
                ],
            }, fp, indent=1)
        print(f"wrote {args.json}")

    if args.record:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_baseline.json")
        data = {}
        if os.path.exists(path):
            with open(path) as fp:
                data = json.load(fp)
        data["lm_iter_per_sec_problem21_cholesky"] = iters_per_sec
        data["_meta"] = {
            "source": "benchmarks/cpu_reference.py (scipy port of reference "
                      "CHOLESKY driver), CPU",
            "problem": os.path.basename(args.problem),
            "max_iter": args.max_iter,
        }
        with open(path, "w") as fp:
            json.dump(data, fp, indent=2)
        print(f"recorded baseline -> {path}")


if __name__ == "__main__":
    main()
