"""True device-time per hot-path piece: loop each piece inside ONE jit
(lax.scan over reps), so per-dispatch host/tunnel overhead vanishes.

Usage: python benchmarks/device_time.py [--scale 21] [--mode cholesky] [--reps 50]
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
from bundleadjustment_benchmarks_tpu.ops import pallas_chain, projection
from bundleadjustment_benchmarks_tpu.ops import jacobian as jac_mod
from bundleadjustment_benchmarks_tpu.solvers import lm, schur
from bundleadjustment_benchmarks_tpu.utils.synthetic import make_synthetic_problem

SCALES = {
    "16": (16, 22106, 4), "39": (39, 18060, 4),
    "126": (126, 40037, 4), "257": (257, 65132, 4),
}


def device_time(name, fn, arg, reps):
    """Time `fn` applied `reps` times sequentially inside one jit.

    fn must map arg -> arg-like (same structure) so iterations chain and
    cannot be collapsed by CSE/DCE.
    """
    @jax.jit
    def looped(a):
        def body(carry, _):
            return fn(carry), None
        out, _ = jax.lax.scan(body, a, None, length=reps)
        return out

    out = looped(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = looped(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:9.3f} ms/call")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="21")
    ap.add_argument("--mode", default="cholesky")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()
    reps = args.reps
    mode = args.mode
    mm = jnp.dtype("float32")

    if args.scale == "21":
        problem = load_bal_problem(
            "/root/reference/data/problem-21-11315-pre.txt", dtype=jnp.float64)
    else:
        n, m, opp = SCALES[args.scale]
        problem = make_synthetic_problem(
            n_cameras=n, n_points=m, obs_per_point=opp, seed=0,
            dtype=jnp.float64)
    use_pl = (not args.no_pallas) and pallas_chain.available()
    print("platform:", jax.devices()[0].platform, "pallas:", use_pl,
          "mode:", mode)
    print("N,M,K:", problem.n_cameras, problem.n_points,
          problem.obs.cam_idx.shape[0])

    fast = problem_mod.to_fast(problem.state)
    ctx, energy, lam0 = lm._prepare_fast(fast, problem, mode, "float32",
                                         pallas=use_pl)
    jax.block_until_ready(ctx.U)
    lam = jnp.float32(1e-3)

    # Chain perturbation through points' low word to keep iterations live.
    def chain_fast(f2, dxp, dxc):
        return problem_mod.apply_step_fast(
            f2, dxp * 1e-30, jax.tree_util.tree_map(lambda x: x * 1e-30, dxc)
            if not hasattr(dxc, "shape") else dxc * 1e-30)

    # 1. prepare: fast -> fast (perturb by g_pts-derived tiny step).
    def prep_loop(f2):
        c, e, l0 = lm._prepare_fast(f2, problem, mode, "float32", pallas=use_pl)
        return chain_fast(f2, c.g_pts, c.g_cams)
    device_time("prepare_fast", prep_loop, fast, reps)

    # 2. trial: chain through x_test.
    def trial_loop(f2):
        xt, et, rs = lm._trial_fast(ctx, f2, lam, problem, mode, "float32",
                                    pallas=use_pl)
        return jax.tree_util.tree_map(
            lambda a, b: a + 1e-30 * b,
            f2, xt) if type(xt) is type(f2) else xt
    device_time("trial_fast", trial_loop, fast, reps)

    # Sub-pieces. blocks chain: fast -> fast via f.
    def blocks_loop(f2):
        if use_pl:
            blocks, e = pallas_chain.fused_blocks_energy(
                f2, problem.obs, problem.tau2)
        else:
            blocks = jac_mod.residuals_and_jacobian_fast(
                f2, problem.obs, problem.tau2)
        d = jnp.sum(blocks.f) * 1e-30
        return jax.tree_util.tree_map(lambda a: a + d.astype(a.dtype), f2)
    device_time("  blocks(+energy)", blocks_loop, fast, reps)

    if use_pl:
        blocks, _ = pallas_chain.fused_blocks_energy(fast, problem.obs,
                                                     problem.tau2)
    else:
        blocks = jac_mod.residuals_and_jacobian_fast(fast, problem.obs,
                                                     problem.tau2)
    blocks = jax.block_until_ready(blocks)

    def ctx_loop(b):
        c = schur.build_context(b, problem, mode, mm_dtype=mm)
        d = (jnp.sum(c.U) * 1e-30).astype(b.f.dtype)
        return jac_mod.JacobianBlocks(Jc=b.Jc + d, Jp=b.Jp + d, f=b.f + d)
    device_time("  build_context", ctx_loop, blocks, reps)

    def solve_loop(l):
        dxp, dxc = schur.solve_damped(ctx, l, problem, mode, mm_dtype=mm)
        return l + jnp.sum(dxc).astype(l.dtype) * 1e-30
    device_time("  solve_damped", solve_loop, lam, reps)

    dxp, dxc = schur.solve_damped(ctx, lam, problem, mode, mm_dtype=mm)
    dxp, dxc = jax.block_until_ready((dxp, dxc))

    def step_energy_loop(f2):
        xt = problem_mod.apply_step_fast(f2, dxp, dxc)
        if use_pl:
            e = pallas_chain.fused_energy(xt, problem.obs, problem.tau2)
        else:
            e = projection.energy_fast(xt, problem.obs, problem.tau2)
        d = (e * 1e-30).astype(jnp.float32)
        return jax.tree_util.tree_map(lambda a: a + d.astype(a.dtype), f2)
    device_time("  apply_step+energy", step_energy_loop, fast, reps)

    # Gram only (inside solve_damped).
    Linv = schur._point_factor_inv(ctx, lam, mode, ctx.U.dtype)
    if Linv is not None:
        Linv = jax.block_until_ready(Linv)
        C = jnp.einsum("kij,kcj->kic", ctx.W, Linv[problem.obs.pt_idx])
        y = jnp.einsum("mij,mj->mi", Linv, ctx.g_pts)
        C, y = jax.block_until_ready((C, y))

        def gram_chunked_loop(c):
            S, b = schur._schur_gram_chunked(
                c, None, y, problem.obs.cam_idx, problem.pt_obs_idx,
                problem.n_cameras, mm)
            return c + (jnp.sum(S) * 1e-30).astype(c.dtype)
        device_time("  gram chunked", gram_chunked_loop, C.astype(mm), reps)

        if getattr(problem, "pairs", None) is not None:
            def gram_pairs_loop(c):
                S, b = schur._schur_gram(
                    c, None, y, problem, problem.n_cameras, mm)
                return c + (jnp.sum(S) * 1e-30).astype(c.dtype)
            device_time("  gram pairs", gram_pairs_loop, C.astype(mm), reps)


if __name__ == "__main__":
    main()
