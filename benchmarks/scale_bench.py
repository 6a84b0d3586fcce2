"""Per-mode timing at BAL scales (problem-21/39/126/257-like geometry).

Times prepare (residuals+Jacobian+context) and trial (damped solve + step +
energy) per solver mode on synthetic problems matching the BAL benchmark
configurations in BASELINE.json, on whatever accelerator jax provides.

Run:  python benchmarks/scale_bench.py [--modes cholesky,qrchol,...] [--scales 21,257]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: (n_cameras, n_points, ~obs_per_point) matching the BAL problems named in
#: BASELINE.json (K/M ratios of the real files).
SCALES = {
    "16": (16, 22106, 4),
    "21": (21, 11315, 3),
    "39": (39, 18060, 4),
    "126": (126, 40037, 4),
    "257": (257, 65132, 4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="cholesky,qrchol,moreqr,qrkit")
    ap.add_argument("--scales", default="21,257")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--f64", action="store_true", help="disable mixed precision")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp  # noqa: F401

    from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare, _trial
    from bundleadjustment_benchmarks_tpu.utils.synthetic import (
        make_synthetic_problem,
    )

    mm = None if args.f64 else "float32"
    platform = jax.devices()[0].platform
    print(f"platform={platform} matmul_dtype={mm}")

    for scale in args.scales.split(","):
        n, m, opp = SCALES[scale]
        problem = make_synthetic_problem(
            n_cameras=n, n_points=m, obs_per_point=opp, seed=0
        )
        k = problem.n_observations
        print(f"-- scale {scale}: N={n} M={m} K={k}")
        for mode in args.modes.split(","):
            try:
                ctx, e, lam0 = _prepare(problem.state, problem, mode, mm)
                jax.block_until_ready(ctx.U)
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    ctx, e, lam0 = _prepare(problem.state, problem, mode, mm)
                jax.block_until_ready(ctx.U)
                prep_ms = (time.perf_counter() - t0) / args.reps * 1e3

                out = _trial(ctx, problem.state, 1e-2, problem, mode, mm)
                jax.block_until_ready(out[1])
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    out = _trial(ctx, problem.state, 1e-2, problem, mode, mm)
                jax.block_until_ready(out[1])
                trial_ms = (time.perf_counter() - t0) / args.reps * 1e3
                e_t = float(out[1])
                print(
                    f"   {mode:9s} prepare={prep_ms:9.2f} ms  "
                    f"trial={trial_ms:9.2f} ms  e_test={e_t:.4g}"
                )
            except Exception as ex:  # noqa: BLE001 — report and continue
                print(f"   {mode:9s} FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
