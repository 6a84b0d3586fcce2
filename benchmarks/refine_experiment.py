"""df32 step-refinement experiment on real BAL data (VERDICT r4 item 5).

Runs the df32 speed drive to its flatline with and without per-trial
mixed-precision iterative refinement (LMConfig.refine_steps /
schur.refine_step) and prints the reference statistics side by side. The
synthetic-scale mechanics are pinned by
tests/test_mixed_precision.py::test_refine_step_mechanics_and_divergence
(the correction pass cannot contract against the f32-stored reduced
system: kappa(S) x f32 storage rounding > 1); this script records what
that means for the actual flatline basins the df32 drive lands in.

Usage: python benchmarks/refine_experiment.py [--problem PATH] [--mode M]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem",
                    default="/root/reference/data/problem-21-11315-pre.txt")
    ap.add_argument("--mode", default="cholesky")
    ap.add_argument("--max-iter", type=int, default=2000)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm
    from bundleadjustment_benchmarks_tpu.utils import stats as jstats

    problem = load_bal_problem(args.problem, dtype=jnp.float64)
    rows = []
    for refine in (0, 1):
        cfg = lm.LMConfig(
            drive="jit", max_iter=args.max_iter, matmul_dtype="float32",
            geometry="df32", refine_steps=refine,
        )
        t0 = time.perf_counter()
        res = lm.minimize(problem, mode=args.mode, config=cfg)
        jax.block_until_ready(res.state.points)
        wall = time.perf_counter() - t0
        st = jstats.error_statistics(res.state, problem.obs, 1.0, 0.5)
        obj = jstats.true_objective(res.state, problem.obs, 1.0, 0.5)
        row = {
            "refine_steps": refine,
            "status": lm.STATUS_STRINGS[res.status],
            "iterations": res.iterations,
            "fun_evals": res.fun_evals,
            "energy": float(res.energy),
            "wall_s": round(wall, 2),
            "inlier_mean_reprojection_error": float(
                st.inlier_mean_reprojection_error),
            "n_inliers": int(st.n_inliers),
            "true_objective": float(obj),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"problem": os.path.basename(args.problem),
                       "mode": args.mode, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
