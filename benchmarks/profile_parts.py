"""Time the LM hot-path pieces separately on the real device."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.ops import jacobian, projection
from bundleadjustment_benchmarks_tpu.solvers import schur

PROBLEM = "/root/reference/data/problem-21-11315-pre.txt"
problem = load_bal_problem(PROBLEM, dtype=jnp.float64)
mm = "float32"
state = problem.state
print("platform:", jax.devices()[0].platform)
print("N,M,K:", problem.n_cameras, problem.n_points, problem.obs.cam_idx.shape[0])
print("lmax(pt):", problem.pt_obs_idx.shape, "lmax(cam):", problem.cam_obs_idx.shape)

jac = jax.jit(lambda s: jacobian.residuals_and_jacobian(s, problem.obs, problem.tau2, compute_dtype=jnp.dtype(mm)))
blocks = jac(state); jax.block_until_ready(blocks.f)

bc = jax.jit(lambda b: schur.build_context(b, problem, "cholesky", mm_dtype=jnp.dtype(mm)))
ctx = bc(blocks); jax.block_until_ready(ctx.U)

sd = jax.jit(lambda c, lam: schur.solve_damped(c, lam, problem, "cholesky", mm_dtype=jnp.dtype(mm)))
dxp, dxc = sd(ctx, jnp.float64(1e-3)); jax.block_until_ready(dxc)

ap = jax.jit(lambda s, p, c: problem_mod.apply_step(s, p, c))
xt = ap(state, dxp, dxc); jax.block_until_ready(xt.T)

en = jax.jit(lambda s: projection.energy(s, problem.obs, problem.tau2, compute_dtype=jnp.dtype(mm)))
e = en(xt); jax.block_until_ready(e)


def bench(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.3f} ms")
    return dt

t1 = bench("residuals_and_jacobian", jac, state)
t2 = bench("build_context", bc, blocks)
t3 = bench("solve_damped", sd, ctx, jnp.float64(1e-3))
t4 = bench("apply_step", ap, state, dxp, dxc)
t5 = bench("energy", en, xt)
print(f"{'TOTAL (1 outer+1 trial)':30s} {(t1+t2+t3+t4+t5)*1e3:8.3f} ms")
