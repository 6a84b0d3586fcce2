"""Fine-grained timing of the df32 prepare path (the round-2 bottleneck).

VERDICT round 1: prepare 2.3 ms vs trial 1.1 ms on problem-21 — dominated by
the lambda-independent WQ27 stack build + pair/camera-table gathers
(solvers/schur.py build_context). This script times each stage separately on
the real device to direct the optimization.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem, to_fast
from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.ops import jacobian, projection, pallas_chain, linalg
from bundleadjustment_benchmarks_tpu.solvers import schur, lm

PROBLEM = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/problem-21-11315-pre.txt"
problem = load_bal_problem(PROBLEM, dtype=jnp.float64)
mm = jnp.float32
fast = to_fast(problem.state)
obs = problem.obs
pairs = problem.pairs
print("platform:", jax.devices()[0].platform)
print("N,M,K:", problem.n_cameras, problem.n_points, obs.cam_idx.shape[0])
print("pairs: row_a", pairs.row_a.shape, "key_table", pairs.key_table.shape,
      "cam_obs", problem.cam_obs_idx.shape, "pt_obs", problem.pt_obs_idx.shape)


def bench(name, fn, *args, reps=30):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:38s} {dt*1e3:8.3f} ms")
    return out, dt


# ---- stage 1: fused pallas chain (blocks + energy)
blocks_energy, t_chain = bench(
    "pallas fused chain", lambda s: pallas_chain.fused_blocks_energy(s, obs, problem.tau2), fast)
blocks = blocks_energy[0]

Jc, Jp, f = blocks.Jc, blocks.Jp, blocks.f
k_obs = Jc.shape[0]
m = problem.n_points
n = problem.n_cameras
pt_idx = obs.pt_idx

# ---- stage 2: planar segment grams (U, gc / V, gp)
def grams(Jc, Jp, f):
    Jc_pl = Jc.reshape(k_obs, 18).T.reshape(2, 9, k_obs)
    Jp_pl = Jp.reshape(k_obs, 6).T.reshape(2, 3, k_obs)
    f_pl = f.T.reshape(2, 1, k_obs)
    M10 = schur.planar_segment_gram(jnp.concatenate([Jc_pl, f_pl], axis=1), problem.cam_obs_idx)
    M4 = schur.planar_segment_gram(jnp.concatenate([Jp_pl, f_pl], axis=1), problem.pt_obs_idx)
    return M10, M4
(M10, M4), t_gram = bench("planar segment grams", grams, Jc, Jp, f)
V = M4[:, :3, :3]
g_pts = -M4[:, :3, 3]

# ---- stage 3: W einsum
(W,), t_w = bench("W = Jc^T Jp einsum", lambda a, b: (jnp.einsum("kri,krj->kij", a, b),), Jc, Jp)

# ---- stage 4: eig of V
def eig(V):
    acc = jnp.float64
    ev, Q = linalg.eigh3x3_sym(V.astype(acc))
    return jnp.maximum(ev, 0.0).astype(V.dtype), Q.astype(V.dtype)
(evals, evecs), t_eig = bench("eigh3x3(V) f64", eig, V)

# ---- stage 5: WQ27 stack build
def wq27(W, evecs):
    W27 = W.reshape(k_obs, 27).T
    Qg = evecs.reshape(m, 9).T[:, pt_idx]
    return (jnp.stack([
        W27[3 * i] * Qg[c] + W27[3 * i + 1] * Qg[3 + c] + W27[3 * i + 2] * Qg[6 + c]
        for i in range(9) for c in range(3)
    ]).astype(mm),)
(WQ27,), t_wq = bench("WQ27 planar stack", wq27, W, evecs)

# ---- stage 6: the three gathers
def gathers(WQ27):
    WQ_ext = jnp.concatenate([WQ27, jnp.zeros((27, 1), mm)], axis=1)
    return WQ_ext[:, pairs.row_a], WQ_ext[:, pairs.row_b], WQ_ext[:, problem.cam_obs_idx]
(pA, pB, dG), t_gath = bench("pairA/pairB/diagG gathers", gathers, WQ27)

# ---- full prepare + trial for reference
cfg_pl = True
prep, t_prep = bench("FULL _prepare_fast", lambda s: lm._prepare_fast(s, problem, "cholesky", "float32", pallas=cfg_pl), fast)
ctx = prep[0]
_, t_trial = bench("FULL _trial_fast", lambda c, s, la: lm._trial_fast(c, s, la, problem, "cholesky", "float32", pallas=cfg_pl), ctx, fast, jnp.float64(1e-3))

print(f"sum of stages: {(t_chain+t_gram+t_w+t_eig+t_wq+t_gath)*1e3:.3f} ms  "
      f"(prepare measured {t_prep*1e3:.3f} ms)")
