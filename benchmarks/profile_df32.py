"""Time the df32-drive LM kernels (the bench path) per part on the device.

Usage: python benchmarks/profile_df32.py [--scale 21|257|...] [--mode cholesky]
Times _prepare_fast / _trial_fast plus their sub-pieces.
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
from bundleadjustment_benchmarks_tpu.ops import jacobian, pallas_chain, projection
from bundleadjustment_benchmarks_tpu.solvers import lm, schur
from bundleadjustment_benchmarks_tpu.utils.synthetic import make_synthetic_problem

SCALES = {
    "16": (16, 22106, 4),
    "21": None,  # real file
    "39": (39, 18060, 4),
    "126": (126, 40037, 4),
    "257": (257, 65132, 4),
}


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="21")
    ap.add_argument("--mode", default="cholesky")
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    if args.scale == "21":
        problem = load_bal_problem(
            "/root/reference/data/problem-21-11315-pre.txt", dtype=jnp.float64
        )
    else:
        n, m, opp = SCALES[args.scale]
        problem = make_synthetic_problem(
            n_cameras=n, n_points=m, obs_per_point=opp, seed=0,
            dtype=jnp.float64,
        )
    mode = args.mode
    mm = "float32"
    use_pl = (not args.no_pallas) and pallas_chain.available()
    print("platform:", jax.devices()[0].platform, "pallas:", use_pl)
    print("N,M,K:", problem.n_cameras, problem.n_points,
          problem.obs.cam_idx.shape[0])

    fast = problem_mod.to_fast(problem.state)

    prep = jax.jit(lambda s: lm._prepare_fast(s, problem, mode, mm, pallas=use_pl))
    ctx, energy, lam0 = prep(fast)
    jax.block_until_ready(ctx.U)
    trial = jax.jit(
        lambda c, s, l: lm._trial_fast(c, s, l, problem, mode, mm, pallas=use_pl)
    )
    lam = jnp.float64(1e-3)
    xt, et, rs = trial(ctx, fast, lam)
    jax.block_until_ready(et)

    tp = bench("prepare_fast (jac+ctx+energy)", prep, fast)
    tt = bench("trial_fast (solve+step+energy)", trial, ctx, fast, lam)

    # Sub-pieces of prepare.
    if use_pl:
        jac = jax.jit(lambda s: pallas_chain.fused_blocks_energy(
            s, problem.obs, problem.tau2))
    else:
        jac = jax.jit(lambda s: jacobian.residuals_and_jacobian_fast(
            s, problem.obs, problem.tau2))
    bench("  blocks(+energy)", jac, fast)
    blocks = jac(fast)
    blocks = blocks[0] if isinstance(blocks, tuple) else blocks
    bctx = jax.jit(lambda b: schur.build_context(b, problem, mode,
                                                 mm_dtype=jnp.dtype(mm)))
    bench("  build_context", bctx, blocks)

    # Sub-pieces of trial.
    sd = jax.jit(lambda c, l: schur.solve_damped(c, l, problem, mode,
                                                 mm_dtype=jnp.dtype(mm)))
    bench("  solve_damped", sd, ctx, jnp.float32(1e-3))
    dxp, dxc = sd(ctx, jnp.float32(1e-3))
    ast = jax.jit(problem_mod.apply_step_fast)
    bench("  apply_step_fast", ast, fast, dxp, dxc)
    xt2 = ast(fast, dxp, dxc)
    if use_pl:
        en = jax.jit(lambda s: pallas_chain.fused_energy(s, problem.obs,
                                                         problem.tau2))
    else:
        en = jax.jit(lambda s: projection.energy_fast(s, problem.obs,
                                                      problem.tau2))
    bench("  energy", en, xt2)
    gd = jax.jit(lambda c, p, cc, l: schur.gradient_dot(c, p, cc, l))
    bench("  gradient_dot", gd, ctx, dxp, dxc, lam)
    print(f"{'TOTAL prepare+trial':34s} {(tp+tt)*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
