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
        "--precision",
        default=None,
        choices=["f64", "mixed", "f32"],
        help="precision preset overriding --dtype/--geometry: 'f64' = "
        "everything f64 (reference Scalar=double); 'mixed' = f64 state + "
        "df32 geometry + f32 Schur matmuls (the TPU performance recipe); "
        "'f32' = PURE f32 everywhere, x64 disabled (reference Scalar=float "
        "— measurably fails to reach the f64 basin on BAL data; see "
        "BASELINE.md precision sweep)",
    )
    p.add_argument(
        "--shards",
        type=int,
        default=0,
        help="shard observations/points over this many devices "
        "(jax.sharding.Mesh + shard_map distributed Schur reduction); "
        "0 = single device. Needs >= that many JAX devices (real chips, "
        "or XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU)",
    )
    p.add_argument(
        "--drive",
        default="host",
        choices=["host", "jit"],
        help="host = verbose per-iteration table (reference parity); "
        "jit = whole optimization in one XLA computation",
    )
    p.add_argument("--max-iters", type=int, default=1_000_000)
    p.add_argument(
        "--polish",
        type=int,
        default=0,
        metavar="N",
        help="after a fast-geometry drive (--geometry df32 / --precision "
        "mixed) stops, continue up to N iterations in full f64 from its "
        "final iterate (two-phase drive: df32 descent speed, f64 plateau "
        "depth). Ignored for pure-f64 runs",
    )
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
        "--checkpoint-every iterations. Works in every drive, including "
        "--shards (sharded checkpoints store the full unsharded state, so "
        "they resume at any shard count)",
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
    # Honor JAX_PLATFORMS even when a site hook imported jax before us and
    # pinned a default backend (the env var is only read at first import).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # Precision model. Default (--dtype): x64 on; f64 = everything f64;
    # f32 = MIXED precision — state/geometry/small reductions stay f64 (BAL
    # far-field points make R X + T catastrophically cancel in f32 — pure
    # f32 cannot even evaluate the energy to pixel accuracy), while the big
    # Schur matmuls (the O(M N^2) FLOPs) run on the MXU in f32.
    # --precision overrides with three explicit sweep points (BASELINE.json
    # config 4): f64 / mixed (f64 state + df32 geometry + f32 matmuls) /
    # PURE f32 (x64 disabled — the reference's Scalar=float build).
    geometry = None if args.geometry == "state" else args.geometry
    state_dtype_name = "float64"
    if args.precision == "f32":
        jax.config.update("jax_enable_x64", False)
        matmul_dtype = None
        geometry = None
        state_dtype_name = "float32"
    else:
        jax.config.update("jax_enable_x64", True)
        if args.precision == "f64":
            matmul_dtype = None
            geometry = None
        elif args.precision == "mixed":
            matmul_dtype = "float32"
            geometry = "df32"
        else:
            matmul_dtype = None if args.dtype == "f64" else "float32"
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm
    from bundleadjustment_benchmarks_tpu.utils import logger, stats

    log = logger.create_logger(args.log_file)
    log.log(logger.INFO, "Computation STARTED!")

    try:
        problem = load_bal_problem(
            args.problem,
            dtype=jnp.dtype(state_dtype_name),
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
        geometry=geometry,
        polish_iters=args.polish,
    )

    if args.shards:
        # Validate up front so programmatic callers get a return code, not an
        # uncaught SystemExit (the documented `main() -> int` contract).
        if len(jax.devices()) < args.shards:
            print(
                f"--shards {args.shards} needs that many JAX devices; "
                f"found {len(jax.devices())} "
                "(hint: XLA_FLAGS=--xla_force_host_platform_device_count=N"
                " JAX_PLATFORMS=cpu for a virtual mesh)",
                file=sys.stderr,
            )
            return RETURN_WRONG_INPUT_PARAMS

    def run():
        if args.shards:
            from bundleadjustment_benchmarks_tpu.parallel import sharded
            import dataclasses as _dc

            # Checkpoints are layout-independent (full unsharded state;
            # sharded.minimize_sharded docstring): load BEFORE sharding and
            # re-shard from the restored state.
            shard_problem_in, resume = problem, None
            if args.checkpoint and os.path.exists(args.checkpoint):
                from bundleadjustment_benchmarks_tpu.utils import (
                    checkpoint as ckpt,
                )

                state, resume = ckpt.load_checkpoint(args.checkpoint)
                shard_problem_in = _dc.replace(problem, state=state)
                print(f"Resuming from {args.checkpoint} "
                      f"(iteration {resume['iteration']})")
            mesh = sharded.make_mesh(args.shards)
            sp = sharded.shard_problem(shard_problem_in, mesh)
            res = sharded.minimize_sharded(
                sp, mesh, mode=args.solver, config=cfg, resume=resume,
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every if args.checkpoint else 0,
                metrics_path=args.metrics,
            )
            full_state = _dc.replace(
                res.state, points=sharded.unshard_points(sp, res.state)
            )
            return res._replace(state=full_state)

        state, resume = problem.state, None
        if args.checkpoint and os.path.exists(args.checkpoint):
            from bundleadjustment_benchmarks_tpu.utils import checkpoint as ckpt

            state, resume = ckpt.load_checkpoint(args.checkpoint)
            print(f"Resuming from {args.checkpoint} "
                  f"(iteration {resume['iteration']})")
        return lm.minimize(
            problem, mode=args.solver, config=cfg, state=state, resume=resume,
            checkpoint_path=args.checkpoint,
            checkpoint_every=args.checkpoint_every if args.checkpoint else 0,
            metrics_path=args.metrics,
        )

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
