"""Convergence-parity campaign: run every solver mode to the flatline stop.

Runs each (problem, mode, drive) combination of the TPU framework to the
reference's energy-flatline stopping rule
(/root/reference/src/Eigen_ext/BacktrackLevMarqCholesky.h:343-350) and records
final status, iteration count, energy, and the reference's post-run statistics
(/root/reference/src/Utils.h:15-68, printed by
/root/reference/src/bundle_adjustment_large.cpp:168-171) as JSON for comparison
against benchmarks/cpu_reference.py run to the same stop.

Usage: python benchmarks/parity_campaign.py [--problems p21,p39]
          [--modes cholesky,qrchol,...] [--drives df32,f64]
          [--max-iter N] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBLEMS = {
    "p21": "/root/reference/data/problem-21-11315-pre.txt",
    "p39": "/root/reference/data/problem-39-18060-pre.txt",
}


def run_one(problem_path, mode, drive, max_iter):
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm
    from bundleadjustment_benchmarks_tpu.utils import stats as jstats

    platform = jax.devices()[0].platform
    problem = load_bal_problem(problem_path, dtype=jnp.float64)
    if drive == "df32":
        cfg = lm.LMConfig(drive="jit", max_iter=max_iter,
                          matmul_dtype="float32", geometry="df32")
    elif drive == "f64":
        # True f64 arithmetic everywhere (XLA-emulated on TPU; slow but exact).
        cfg = lm.LMConfig(drive="jit", max_iter=max_iter)
    else:
        raise ValueError(drive)

    t0 = time.perf_counter()
    res = lm.minimize(problem, mode=mode, config=cfg)
    jax.block_until_ready(res.state.points)
    wall = time.perf_counter() - t0

    st = jstats.error_statistics(res.state, problem.obs, 1.0, 0.5)
    obj = jstats.true_objective(res.state, problem.obs, 1.0, 0.5)
    return {
        "problem": os.path.basename(problem_path),
        "mode": mode,
        "drive": drive,
        "platform": platform,
        "status": lm.STATUS_STRINGS[res.status],
        "iterations": res.iterations,
        "fun_evals": res.fun_evals,
        "energy": res.energy,
        "wall_s": round(wall, 3),
        "post": {
            "mean_reprojection_error": float(st.mean_reprojection_error),
            "inlier_mean_reprojection_error": float(
                st.inlier_mean_reprojection_error),
            "n_inliers": int(st.n_inliers),
            "n_observations": int(st.n_observations),
            "true_objective": float(obj),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", default="p21,p39")
    ap.add_argument("--modes",
                    default="cholesky,qrchol,qrkit,moreqr,spqr")
    ap.add_argument("--drives", default="df32")
    ap.add_argument("--max-iter", type=int, default=2000)
    ap.add_argument("--json", default="benchmarks/parity_campaign.json")
    args = ap.parse_args()

    rows = []
    for pkey in args.problems.split(","):
        for drive in args.drives.split(","):
            for mode in args.modes.split(","):
                row = run_one(PROBLEMS[pkey], mode, drive, args.max_iter)
                rows.append(row)
                print(json.dumps(row), flush=True)

    out = {"rows": rows}
    if args.json:
        prev = {}
        if os.path.exists(args.json):
            with open(args.json) as f:
                prev = json.load(f)
        seen = {(r["problem"], r["mode"], r["drive"]) for r in rows}
        merged = [r for r in prev.get("rows", [])
                  if (r["problem"], r["mode"], r["drive"]) not in seen] + rows
        with open(args.json, "w") as f:
            json.dump({"rows": merged}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
