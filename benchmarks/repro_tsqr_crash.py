"""Minimal repro for the TPU-worker crash in the TSQR camera path.

Round 2's parity campaign died on the qrkit/f64 problem-21 row; round 3's
crash-isolated campaign pinned it: qrkit AND spqr (the two TSQR-camera-solver
modes) kill the TPU worker on problem-39 while all chol-camera modes pass,
and the same modes pass on problem-21. This script reruns the smallest
failing unit — one damping trial of the qrkit mode at problem-39 shapes —
then bisects: the chunked TSQR reduction alone, then a single jnp.linalg.qr
of one chunk, so the faulting kernel is identified even when the worker
crash destroys the Python backtrace.

RESOLVED in round 4 (docs/DESIGN.md section 6): qrkit caches its lambda-free
camera QR per outer iteration (schur._redamp_qr per trial) and spqr's f64
camera reduction runs in R-only CholeskyQR form (schur._spqr_gram_solve), so
no dispatch approaches the watchdog budget; the campaign records real f64
flatlines for both modes. This script is kept as the bisection harness for
any future long-dispatch regression. Note the 'reduce'/'qr' stages exercise
the row-Householder path that f64-on-TPU no longer uses by default (set
BA_F64_ROWQR=1 to force it through solve_damped).

Usage: python benchmarks/repro_tsqr_crash.py [--stage trial|reduce|qr|all]
                                             [--problem p39] [--chunk 512]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBLEMS = {
    "p21": "/root/reference/data/problem-21-11315-pre.txt",
    "p39": "/root/reference/data/problem-39-18060-pre.txt",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["trial", "reduce", "qr", "all"])
    ap.add_argument("--problem", default="p39")
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.ops import jacobian
    from bundleadjustment_benchmarks_tpu.solvers import schur

    problem = load_bal_problem(PROBLEMS[args.problem], dtype=jnp.float64)
    print(f"{args.problem}: N={problem.n_cameras} M={problem.n_points} "
          f"K={problem.n_observations} Lmax={problem.pt_obs_idx.shape[1]}",
          flush=True)

    blocks = jacobian.residuals_and_jacobian(
        problem.state, problem.obs, problem.tau2,
        compute_dtype=jnp.dtype("float32"),
    )
    ctx = schur.build_context(blocks, problem, "qrkit",
                              mm_dtype=jnp.dtype("float32"))
    lam = jnp.asarray(1e-6, jnp.float64)

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK ({time.perf_counter() - t0:.1f}s)", flush=True)

    if args.stage in ("qr", "all"):
        # One chunk's worth of a tall-skinny f32 QR (the TSQR work item).
        lmax = problem.pt_obs_idx.shape[1]
        rows = args.chunk * (2 * lmax + 3) + (9 * problem.n_cameras + 1)
        ncols = 9 * problem.n_cameras + 1
        a = jax.random.normal(jax.random.PRNGKey(0), (rows, ncols),
                              jnp.float32)
        run(f"single qr ({rows}x{ncols} f32)",
            lambda: jax.jit(lambda x: jnp.linalg.qr(x)[1])(a))

    if args.stage in ("reduce", "all"):
        Linv = schur._point_factor_inv(ctx, lam, "qrkit", ctx.U.dtype)
        run("camera_tsqr_reduce",
            lambda: jax.jit(
                lambda l: schur.camera_tsqr_reduce(
                    ctx, l, problem, Linv, args.chunk,
                    mm_dtype=jnp.dtype("float32"))
            )(lam))

    if args.stage in ("trial", "all"):
        run("solve_damped(qrkit)",
            lambda: jax.jit(
                lambda l: schur.solve_damped(
                    ctx, l, problem, "qrkit",
                    mm_dtype=jnp.dtype("float32"))
            )(lam))

    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
