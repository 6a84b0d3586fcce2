"""Capture a jax.profiler trace of prepare+trial and print top HLO ops."""
import os, sys, glob
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_enable_x64", True)

from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.ops import jacobian, projection
from bundleadjustment_benchmarks_tpu.solvers import schur

problem = load_bal_problem("/root/reference/data/problem-21-11315-pre.txt", dtype=jnp.float64)
mm = jnp.dtype("float32")
state = problem.state

jac = jax.jit(lambda s: jacobian.residuals_and_jacobian(s, problem.obs, problem.tau2, compute_dtype=mm))
bc = jax.jit(lambda b: schur.build_context(b, problem, "cholesky", mm_dtype=mm))
sd = jax.jit(lambda c, lam: schur.solve_damped(c, lam, problem, "cholesky", mm_dtype=mm))
en = jax.jit(lambda s: projection.energy(s, problem.obs, problem.tau2, compute_dtype=mm))
ap = jax.jit(problem_mod.apply_step)

blocks = jac(state); ctx = bc(blocks)
dxp, dxc = sd(ctx, jnp.float64(1e-3)); xt = ap(state, dxp, dxc); e = en(xt)
jax.block_until_ready(e)

logdir = "/tmp/jax_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(5):
        blocks = jac(state)
        ctx = bc(blocks)
        dxp, dxc = sd(ctx, jnp.float64(1e-3))
        xt = ap(state, dxp, dxc)
        e = en(xt)
    jax.block_until_ready(e)

# Parse the xplane into op stats.
xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplane)
