"""Benchmark CLI mirroring the reference driver's UX.

Reference: /root/reference/src/bundle_adjustment_large.cpp:40-176 — parse BAL
file, print pre-stats, run the selected LM variant with wall-clock timing,
print post-stats. The reference's five compile-time binaries become one entry
point with a --solver flag (plus runtime dtype/driver options, replacing the
compile-time Scalar typedef of src/BATypeUtils.h:6-7).

Usage:
    python -m bundleadjustment_benchmarks_tpu.cli problem-21-11315-pre.txt \
        --solver cholesky --dtype f64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

RETURN_SUCCESS = 0
RETURN_WRONG_INPUT_PARAMS = 1
RETURN_WRONG_INPUT_FILE = 2

#: Reference constants (bundle_adjustment_large.cpp:35-36).
AVG_FOCAL_LENGTH = 1.0
INLIER_THRESHOLD = 0.5


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bundleadjustment_benchmarks_tpu",
        description="TPU-native bundle adjustment benchmarks (BAL problems).",
    )
    p.add_argument("problem", help="BAL sparse reconstruction file")
    p.add_argument(
        "--solver",
        default="cholesky",
        choices=["qrkit", "qrchol", "moreqr", "spqr", "cholesky"],
        help="inner linear solver strategy (the reference's five binaries)",
    )
    p.add_argument(
        "--dtype", default="f64", choices=["f32", "f64"], help="machine precision"
    )
    p.add_argument(
        "--geometry",
        default="state",
        choices=["state", "df32"],
        help="geometry arithmetic: 'state' = the state dtype; 'df32' = "
        "two-float compensated f32 (f64-quality transform with zero f64 ops "
        "on observation-sized data — the TPU performance path)",
    )
    p.add_argument(
        "--drive",
        default="host",
        choices=["host", "jit"],
        help="host = verbose per-iteration table (reference parity); "
        "jit = whole optimization in one XLA computation",
    )
    p.add_argument("--max-iters", type=int, default=1_000_000)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument(
        "--inlier-threshold", type=float, default=INLIER_THRESHOLD
    )
    p.add_argument("--quiet", action="store_true", help="suppress iteration table")
    p.add_argument(
        "--keep-final-step",
        action="store_true",
        help="disable the reference's discard-final-step-on-flatline quirk",
    )
    p.add_argument("--log-file", default="runtime_log.log")
    p.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace of the optimization to this directory",
    )
    p.add_argument(
        "--checkpoint",
        default=None,
        help="checkpoint file: resumed from if it exists, written every "
        "--checkpoint-every iterations (host drive only)",
    )
    p.add_argument("--checkpoint-every", type=int, default=25)
    p.add_argument(
        "--debug-nans",
        action="store_true",
        help="enable jax_debug_nans (fail fast on NaN in any kernel)",
    )
    p.add_argument(
        "--metrics",
        default=None,
        help="write per-iteration JSONL metrics to this file (host drive)",
    )
    return p


def main(argv=None) -> int:
    args_list = sys.argv[1:] if argv is None else argv
    try:
        args = build_parser().parse_args(args_list)
    except SystemExit as e:
        return RETURN_WRONG_INPUT_PARAMS if e.code else RETURN_SUCCESS

    import jax

    # Persistent compilation cache (first compiles in this environment go
    # through a slow remote helper; cache across CLI invocations).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # x64 always on. --dtype f64 = everything f64. --dtype f32 = MIXED
    # precision: state/geometry/small reductions stay f64 (BAL far-field
    # points make R X + T catastrophically cancel in f32 — pure f32 cannot
    # even evaluate the energy to pixel accuracy), while the big Schur
    # matmuls (the O(M N^2) FLOPs) run on the MXU in f32.
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm
    from bundleadjustment_benchmarks_tpu.utils import logger, stats

    log = logger.create_logger(args.log_file)
    log.log(logger.INFO, "Computation STARTED!")

    matmul_dtype = None if args.dtype == "f64" else "float32"
    try:
        problem = load_bal_problem(
            args.problem,
            dtype=jnp.float64,
            inlier_threshold=args.inlier_threshold,
            avg_focal_length=AVG_FOCAL_LENGTH,
        )
    except (OSError, ValueError) as e:
        print(f"Cannot open {args.problem}: {e}", file=sys.stderr)
        return RETURN_WRONG_INPUT_FILE

    print(
        f"N(cameras) = {problem.n_cameras}, M(points) = {problem.n_points},"
        f" K(measurements) = {problem.n_observations}"
    )

    stats.show_error_statistics(
        problem.state, problem.obs, AVG_FOCAL_LENGTH, args.inlier_threshold
    )
    stats.show_objective(
        problem.state, problem.obs, AVG_FOCAL_LENGTH, args.inlier_threshold
    )

    cfg = lm.LMConfig(
        tol_fun=args.tol,
        max_iter=args.max_iters,
        verbose=not args.quiet,
        drive=args.drive,
        discard_final_step=not args.keep_final_step,
        matmul_dtype=matmul_dtype,
        geometry=None if args.geometry == "state" else args.geometry,
    )
    def run():
        if (args.checkpoint or args.metrics) and args.drive == "host":
            import os as _os

            from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare, _trial
            from bundleadjustment_benchmarks_tpu.utils import checkpoint as ckpt

            state, resume = problem.state, None
            if args.checkpoint and _os.path.exists(args.checkpoint):
                state, resume = ckpt.load_checkpoint(args.checkpoint)
                print(f"Resuming from {args.checkpoint} "
                      f"(iteration {resume['iteration']})")
            prep = lambda s: _prepare(s, problem, args.solver, matmul_dtype)  # noqa: E731
            tri = lambda c, s, la: _trial(  # noqa: E731
                c, s, la, problem, args.solver, matmul_dtype
            )
            return lm.host_loop(
                state, prep, tri, cfg, resume=resume,
                checkpoint_every=args.checkpoint_every,
                checkpoint_path=args.checkpoint,
                metrics_path=args.metrics,
            )
        return lm.minimize(problem, mode=args.solver, config=cfg)

    begin = time.perf_counter()
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            result = run()
            jax.block_until_ready(result.state.points)
    else:
        result = run()
        jax.block_until_ready(result.state.points)
    elapsed = time.perf_counter() - begin
    print(f"lm.minimize(params) ... {elapsed:g}s")
    print(f"LM finished with status: {lm.STATUS_STRINGS[result.status]}")

    stats.show_error_statistics(
        result.state, problem.obs, AVG_FOCAL_LENGTH, args.inlier_threshold
    )
    stats.show_objective(
        result.state, problem.obs, AVG_FOCAL_LENGTH, args.inlier_threshold
    )

    log.log(logger.INFO, "Computation DONE!")
    return RETURN_SUCCESS


if __name__ == "__main__":
    sys.exit(main())
